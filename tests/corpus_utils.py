"""Synthetic tone-language corpus for integration tests (SURVEY.md §4:
sinusoid "audio" + toy alphabet). Each symbol of the alphabet is a pure
tone in a distinct frequency band; an utterance is the concatenation of
its symbols' tones, so CTC/attention models can genuinely learn the
mapping from audio to symbol sequences."""

from __future__ import annotations

import os

import numpy as np

from nabu_tpu.data import audio_io

RATE = 16000
TONE_SECONDS = 0.12
FREQS = {"a": 400.0, "b": 900.0, "c": 1800.0}
ALPHABET = sorted(FREQS)


def make_corpus(root: str, num_utts: int, seed: int = 0, min_len=2, max_len=6):
    """Write wavs + wav.scp + text; returns (scp_path, text_path)."""
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    scp_lines, text_lines = [], []
    for i in range(num_utts):
        n_sym = int(rng.integers(min_len, max_len + 1))
        syms = [ALPHABET[int(k)] for k in rng.integers(0, len(ALPHABET), n_sym)]
        pieces = []
        for s in syms:
            n = int(TONE_SECONDS * RATE)
            t = np.arange(n) / RATE
            tone = np.sin(2 * np.pi * FREQS[s] * t)
            env = np.minimum(1.0, np.minimum(t, t[::-1]) / 0.02)
            pieces.append(tone * env)
        sig = np.concatenate(pieces)
        sig = 8000.0 * sig + 50.0 * rng.standard_normal(len(sig))
        path = os.path.join(root, f"utt{i:04d}.wav")
        audio_io.write_wav(path, sig, RATE)
        scp_lines.append(f"utt{i:04d} {path}")
        text_lines.append(f"utt{i:04d} {' '.join(syms)}")
    scp = os.path.join(root, "wav.scp")
    text = os.path.join(root, "text")
    with open(scp, "w") as f:
        f.write("\n".join(scp_lines) + "\n")
    with open(text, "w") as f:
        f.write("\n".join(text_lines) + "\n")
    return scp, text


def write_recipe(recipe_dir: str, corpus_files: dict, model_lines: str,
                 trainer_lines: str, evaluator_extra: str = "",
                 recognizer_lines: str = "recognizer = ctc_greedy"):
    """Write a full recipe dir. corpus_files maps split -> (scp, text)."""
    os.makedirs(recipe_dir, exist_ok=True)
    db = []
    for split, (scp, text) in corpus_files.items():
        db.append(
            f"[{split}features]\n"
            f"datafile = {scp}\n"
            f"dir = {split}features\n"
            "processor = audio\nfeature = fbank\nnfilt = 10\n"
            "winlen = 0.025\nwinstep = 0.01\nnfft = 512\n"
        )
        db.append(
            f"[{split}targets]\n"
            f"datafile = {text}\n"
            f"dir = {split}targets\n"
            "processor = text\nalphabet = a b c\ntokenizer = word\n"
        )
    with open(os.path.join(recipe_dir, "database.conf"), "w") as f:
        f.write("\n".join(db))
    with open(os.path.join(recipe_dir, "model.cfg"), "w") as f:
        f.write(model_lines)
    with open(os.path.join(recipe_dir, "trainer.cfg"), "w") as f:
        f.write(trainer_lines)
    with open(os.path.join(recipe_dir, "validation_evaluator.cfg"), "w") as f:
        f.write(
            "[evaluator]\nevaluator = loss\n"
            "features = devfeatures\ntargets = devtargets\n"
            "batch_size = 8\nnum_buckets = 1\n" + evaluator_extra
        )
    with open(os.path.join(recipe_dir, "test_evaluator.cfg"), "w") as f:
        f.write(
            "[evaluator]\nevaluator = decoder\n"
            f"{recognizer_lines}\n"
            "features = devfeatures\ntargets = devtargets\n"
            "batch_size = 8\nnum_buckets = 1\n"
        )
    with open(os.path.join(recipe_dir, "recognizer.cfg"), "w") as f:
        f.write(
            f"[recognizer]\n{recognizer_lines}\n"
            "features = devfeatures\ntargets = devtargets\n"
            "batch_size = 8\nnum_buckets = 1\n"
        )
