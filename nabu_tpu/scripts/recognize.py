"""`run recognize`: one-shot decoding of audio files (no data prep).

Beyond-parity serving-style command: takes wav/SPHERE paths (or a
Kaldi-style scp) straight on the command line, computes features with
the recipe's frontend, decodes with the recipe's recognizer against the
best-validated checkpoint, and prints ``utt_id hypothesis`` lines —
the "give me text for this file" path a deployment needs, without
writing a dataset.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from nabu_tpu.config import Recipe
from nabu_tpu.data.processors import (
    TextProcessor,
    make_processor,
    read_datafile,
)
from nabu_tpu.decoding.recognizers import build_recognizer
from nabu_tpu.models.model import build_model
from nabu_tpu.scripts.test import load_best_params

# decode-time padding bucket (frames): bounds jit compilations to one
# per occupied bucket instead of one per distinct chunk shape
_T_BUCKET = 512


def main(
    recipe_path: str,
    expdir: str,
    audio: List[str],
    batch_size: int = 8,
) -> List[Tuple[str, str]]:
    """``audio``: wav/sph paths, or a single ``*.scp`` datafile path.
    Returns (and prints) [(utt_id, hypothesis text)]."""
    recipe = Recipe(recipe_path)
    rconf = recipe.recognizer.section("recognizer")
    feat_conf = recipe.database.section(
        rconf.get("features", "testfeatures")
    )
    tgt_conf = recipe.database.section(rconf.get("targets", "testtargets"))

    audio_proc = make_processor(feat_conf)
    text_proc = TextProcessor(tgt_conf)

    # in-graph feature frontend (Pallas STFT+Mel on TPU): the decode
    # hot loop then contains no host DSP — audio IO aside, everything
    # from preemphasis to the hypothesis runs on the device. Falls back
    # to the host computers when the feature config isn't representable
    # in-graph or device_frontend = false.
    device_fe = None
    if rconf.getbool("device_frontend", True):
        from nabu_tpu.features.jax_frontend import DeviceFrontend

        device_fe = DeviceFrontend.make(feat_conf)

    # corpus-level CMVN (global_cmvn = true at prep): recognition of
    # raw files must apply the SAME stats training applied at load;
    # they live in the prepared feature dataset's metadata
    cmvn_stats = None
    if feat_conf.getbool("global_cmvn", False):
        from nabu_tpu.scripts.common import open_dataset

        meta = open_dataset(
            recipe, expdir, rconf.get("features", "testfeatures")
        ).metadata
        c = meta.get("cmvn")
        if not c:
            raise ValueError(
                "global_cmvn = true but the prepared dataset records no "
                "cmvn stats — re-run `run data`"
            )
        cmvn_stats = (
            np.asarray(c["mean"], np.float32),
            np.maximum(np.asarray(c["std"], np.float32), 1e-10),
        )
        if device_fe is not None:
            device_fe.set_normalization(*cmvn_stats)

    if len(audio) == 1 and audio[0].endswith(".scp"):
        entries = read_datafile(audio[0])
    else:
        entries = [
            (os.path.splitext(os.path.basename(p))[0], p) for p in audio
        ]

    feat_cache: dict = {}

    def features_of(value: str) -> np.ndarray:
        if value not in feat_cache:
            feat = audio_proc.process(value)
            if cmvn_stats is not None:
                feat = (feat - cmvn_stats[0]) / cmvn_stats[1]
            feat_cache[value] = feat
        return feat_cache[value]

    try:
        input_dim = audio_proc.computer.dim
    except NotImplementedError:
        # e.g. raw-frames features, whose dim depends on the sample
        # rate: probe the first file
        input_dim = features_of(entries[0][1]).shape[1]
    model = build_model(recipe.model, input_dim, text_proc.num_labels)
    params = load_best_params(expdir, model)
    recognizer = build_recognizer(rconf, model)

    from nabu_tpu.data import audio_io

    results: List[Tuple[str, str]] = []
    for start in range(0, len(entries), batch_size):
        chunk = entries[start: start + batch_size]
        out = None
        if device_fe is not None:
            loaded = [audio_io.load_audio(value) for _, value in chunk]
            rates = {rate for _, rate in loaded}
            if len(rates) == 1:  # mixed-rate chunks fall back to host
                feats_dev, flens = device_fe.batch_features(
                    [sig for sig, _ in loaded], rates.pop(),
                    batch_size, _T_BUCKET,
                )
                out = recognizer(params, feats_dev, flens)
        if out is None:
            feats = [features_of(value) for _, value in chunk]
            # pad T to a bucket edge and the batch to batch_size so the
            # jitted decode compiles once per bucket, not once per
            # chunk (the expdir contract: static padded shapes)
            T = max(f.shape[0] for f in feats)
            T = ((T + _T_BUCKET - 1) // _T_BUCKET) * _T_BUCKET
            batch = np.zeros(
                (batch_size, T, feats[0].shape[1]), np.float32
            )
            lengths = np.zeros((batch_size,), np.int32)
            for i, f in enumerate(feats):
                batch[i, : f.shape[0]] = f
                lengths[i] = f.shape[0]
            out = recognizer(params, batch, lengths)
        for i, (utt, _) in enumerate(chunk):
            text = text_proc.ids_to_text(out.best(i))
            print(f"{utt} {text}")
            results.append((utt, text))
    return results
