"""`run decode`: dump n-best hypotheses for a dataset.

Capability parity with nabu/scripts/decode.py (SURVEY.md §3.5): writes
per-utterance n-best transcriptions to <expdir>/decoded/ for downstream
rescoring.
"""

from __future__ import annotations

import os

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

    out_dir = os.path.join(expdir, "decoded")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, "nbest.txt")
    with open(out_path, "w") as f:
        for batch in loader.epoch(0, shuffle=False):
            result = recognizer(
                params, batch.features, batch.feature_lengths
            )
            for b, utt in enumerate(batch.utt_ids):
                if not batch.example_mask[b]:
                    continue
                for score, ids in result.nbest(b):
                    text = ids_to_text(ids, alphabet, tokenizer)
                    f.write(f"{utt} {score:.4f} {text}\n")
    print(f"[decode] wrote {out_path}")
    return out_path
