"""`run decode`: dump n-best hypotheses for a dataset.

Capability parity with nabu/scripts/decode.py (SURVEY.md §3.5): writes
per-utterance n-best transcriptions to <expdir>/decoded/ for downstream
rescoring.
"""

from __future__ import annotations

import os
import time

from nabu_tpu.config import Recipe
from nabu_tpu.decoding.recognizers import build_recognizer
from nabu_tpu.scripts.common import (
    ids_to_text,
    make_loader,
    model_from_recipe,
)
from nabu_tpu.scripts.test import load_best_params


def main(recipe_path: str, expdir: str) -> str:
    recipe = Recipe(recipe_path)
    rconf = recipe.recognizer.section("recognizer")
    model, tgt_meta = model_from_recipe(
        recipe, expdir, rconf["features"], rconf["targets"]
    )
    loader, _, _ = make_loader(
        recipe,
        expdir,
        rconf,
        batch_size=rconf.getint("batch_size", 16),
        num_buckets=rconf.getint("num_buckets", 2),
    )
    params = load_best_params(expdir, model)
    recognizer = build_recognizer(rconf, model)
    alphabet = tgt_meta["alphabet"]
    tokenizer = tgt_meta.get("tokenizer", "word")
    frame_shift = recipe.database.section(
        rconf["features"]
    ).getfloat("winstep", 0.01)

    out_dir = os.path.join(expdir, "decoded")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, "nbest.txt")
    # steady-state RTF: per-batch decode wall time and audio seconds,
    # with the slowest call per distinct batch shape dropped (that call
    # carries the jit compile — minutes through a remote compile
    # service, microseconds of actual decode)
    shape_times: dict = {}
    audio_total = 0.0
    with open(out_path, "w") as f:
        for batch in loader.epoch(0, shuffle=False):
            t0 = time.perf_counter()
            result = recognizer(
                params, batch.features, batch.feature_lengths
            )
            dt = time.perf_counter() - t0
            frames = float(
                batch.feature_lengths[batch.example_mask].sum()
            )
            audio_s = frames * frame_shift
            shape_times.setdefault(batch.features.shape, []).append(
                (dt, audio_s)
            )
            audio_total += audio_s
            for b, utt in enumerate(batch.utt_ids):
                if not batch.example_mask[b]:
                    continue
                for score, ids in result.nbest(b):
                    text = ids_to_text(ids, alphabet, tokenizer)
                    f.write(f"{utt} {score:.4f} {text}\n")
    steady_t = steady_audio = 0.0
    excluded = 0
    for calls in shape_times.values():
        if len(calls) == 1:
            # a shape decoded exactly once carries its compile in the
            # only sample — nothing steady-state to keep
            excluded += 1
            continue
        drop = max(range(len(calls)), key=lambda i: calls[i][0])
        kept = [c for i, c in enumerate(calls) if i != drop]
        steady_t += sum(t for t, _ in kept)
        steady_audio += sum(a for _, a in kept)
    if steady_audio > 0:
        note = (f", {excluded} single-call shapes excluded entirely"
                if excluded else "")
        print(f"[decode] steady-state RTF "
              f"{steady_t / steady_audio:.5f} "
              f"({steady_audio:.0f}s audio, compile calls "
              f"excluded{note})")
    elif shape_times:
        print(f"[decode] no steady-state RTF: every batch shape was "
              f"decoded exactly once ({excluded} shapes) — only the "
              f"compile-carrying calls exist; falling back to "
              f"wall-clock is the caller's job")
    print(f"[decode] wrote {out_path} ({audio_total:.0f}s audio)")
    return out_path
