"""Synthesize a demo corpus + recipe: try the whole framework with no
real data.

Each symbol of a small alphabet is a pure tone in a distinct frequency
band; an utterance is the concatenation of its symbols' tones (plus
noise), so CTC/attention models genuinely learn the audio->symbol
mapping. Writes train/dev/test splits as Kaldi-style ``wav.scp`` +
``text`` datafiles and a ready recipe directory, then prints the four
commands to run.

    python -m nabu_tpu.tools.synth_corpus --out /tmp/demo
    ./run data   --recipe=/tmp/demo/recipe --expdir=/tmp/demo/exp
    ./run train  --recipe=/tmp/demo/recipe --expdir=/tmp/demo/exp
    ./run test   --recipe=/tmp/demo/recipe --expdir=/tmp/demo/exp
    ./run decode --recipe=/tmp/demo/recipe --expdir=/tmp/demo/exp
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from nabu_tpu.data import audio_io

RATE = 16000
TONE_SECONDS = 0.12
FREQS = {
    "a": 400.0, "b": 700.0, "c": 1100.0, "d": 1600.0, "e": 2200.0,
}

MODEL_CFG = """[model]
compute_dtype = bfloat16

[encoder]
encoder = {encoder}
num_layers = 2
num_units = 128
use_pallas = true
{encoder_extra}
[decoder]
decoder = linear_ctc
loss = ctc
use_pallas = true
"""

TRAINER_CFG = """[trainer]
features = trainfeatures
targets = traintargets
batch_size = 16
num_buckets = 2
num_steps = {num_steps}
log_frequency = 50
learning_rate = 2e-3
valid_frequency = 0
"""


def make_split(root: str, num_utts: int, seed: int, alphabet,
               min_len=3, max_len=10):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    scp_lines, text_lines = [], []
    for i in range(num_utts):
        n_sym = int(rng.integers(min_len, max_len + 1))
        syms = [alphabet[int(k)]
                for k in rng.integers(0, len(alphabet), n_sym)]
        pieces = []
        for s in syms:
            n = int(TONE_SECONDS * RATE)
            t = np.arange(n) / RATE
            tone = np.sin(2 * np.pi * FREQS[s] * t)
            env = np.minimum(1.0, np.minimum(t, t[::-1]) / 0.02)
            pieces.append(tone * env)
        sig = np.concatenate(pieces)
        sig = 8000.0 * sig + 50.0 * rng.standard_normal(len(sig))
        path = os.path.join(root, f"utt{i:05d}.wav")
        audio_io.write_wav(path, sig, RATE)
        scp_lines.append(f"utt{i:05d} {path}")
        text_lines.append(f"utt{i:05d} {' '.join(syms)}")
    scp = os.path.join(root, "wav.scp")
    text = os.path.join(root, "text")
    with open(scp, "w") as f:
        f.write("\n".join(scp_lines) + "\n")
    with open(text, "w") as f:
        f.write("\n".join(text_lines) + "\n")
    return scp, text


def write_recipe(recipe_dir, splits, alphabet, encoder, num_steps):
    os.makedirs(recipe_dir, exist_ok=True)
    db = []
    for split, (scp, text) in splits.items():
        db.append(
            f"[{split}features]\n"
            f"datafile = {scp}\n"
            f"dir = {split}features\n"
            "processor = audio\nfeature = fbank\nnfilt = 40\n"
            "winlen = 0.025\nwinstep = 0.01\nnfft = 512\n"
        )
        db.append(
            f"[{split}targets]\n"
            f"datafile = {text}\n"
            f"dir = {split}targets\n"
            f"processor = text\nalphabet = {' '.join(alphabet)}\n"
            "tokenizer = word\n"
        )
    with open(os.path.join(recipe_dir, "database.conf"), "w") as f:
        f.write("\n".join(db))
    extra = (
        "num_heads = 4\nffn_dim = 512\nsubsample = 2\n"
        if encoder in ("transformer", "conformer") else ""
    )
    with open(os.path.join(recipe_dir, "model.cfg"), "w") as f:
        f.write(MODEL_CFG.format(encoder=encoder, encoder_extra=extra))
    with open(os.path.join(recipe_dir, "trainer.cfg"), "w") as f:
        f.write(TRAINER_CFG.format(num_steps=num_steps))
    for name, evaluator, split in (
        ("validation_evaluator", "loss", "dev"),
        ("test_evaluator", "decoder", "test"),
    ):
        with open(os.path.join(recipe_dir, f"{name}.cfg"), "w") as f:
            f.write(
                f"[evaluator]\nevaluator = {evaluator}\n"
                "recognizer = ctc_greedy\n"
                f"features = {split}features\n"
                f"targets = {split}targets\n"
                "batch_size = 16\nnum_buckets = 1\n"
            )
    with open(os.path.join(recipe_dir, "recognizer.cfg"), "w") as f:
        f.write(
            "[recognizer]\nrecognizer = ctc_beam\nbeam_width = 8\n"
            "nbest = 4\n"
            "features = testfeatures\ntargets = testtargets\n"
            "batch_size = 16\nnum_buckets = 1\n"
        )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="synth_corpus", description=__doc__)
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--num_train", type=int, default=256)
    p.add_argument("--num_dev", type=int, default=64)
    p.add_argument("--num_test", type=int, default=64)
    p.add_argument("--num_symbols", type=int, default=3,
                   help="alphabet size (2-5)")
    p.add_argument("--encoder", default="dblstm",
                   choices=["dblstm", "listener", "transformer",
                            "conformer"])
    p.add_argument("--num_steps", type=int, default=600)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    alphabet = sorted(FREQS)[: max(2, min(args.num_symbols, len(FREQS)))]
    splits = {
        "train": make_split(os.path.join(args.out, "train"),
                            args.num_train, args.seed, alphabet),
        "dev": make_split(os.path.join(args.out, "dev"),
                          args.num_dev, args.seed + 1, alphabet),
        "test": make_split(os.path.join(args.out, "test"),
                           args.num_test, args.seed + 2, alphabet),
    }
    recipe = os.path.join(args.out, "recipe")
    write_recipe(recipe, splits, alphabet, args.encoder, args.num_steps)
    expdir = os.path.join(args.out, "exp")
    print(f"corpus + recipe written under {args.out}. Next:")
    for cmd in ("data", "train", "test", "decode"):
        print(f"  ./run {cmd} --recipe={recipe} --expdir={expdir}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
