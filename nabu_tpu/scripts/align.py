"""`run align`: CTC forced alignment of a dataset against its targets.

Beyond-parity command (the reference has no alignment story). Runs the
model's CTC head over a features+targets dataset pair and writes
CTM-style lines

    <utt> 1 <start_seconds> <duration_seconds> <token>

to <expdir>/aligned/align.ctm using decoding/align.py's batched
Viterbi. Frame times account for the feature winstep and the encoder's
actual subsampling (measured per utterance as
feature_frames / logit_frames).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from nabu_tpu.config import Conf, Recipe
from nabu_tpu.decoding.align import ctc_forced_align, segments_from_frames
from nabu_tpu.scripts.common import make_loader, model_from_recipe
from nabu_tpu.scripts.test import load_best_params


def main(
    recipe_path: str,
    expdir: str,
    features: str = None,
    targets: str = None,
    head: str = None,
) -> str:
    recipe = Recipe(recipe_path)
    rconf = recipe.recognizer.section("recognizer")
    features = features or rconf["features"]
    targets = targets or rconf["targets"]
    model, tgt_meta = model_from_recipe(recipe, expdir, features, targets)

    head = head or next(
        (
            name
            for name, dec in model.decoders.items()
            if hasattr(dec, "blank_id")
        ),
        None,
    )
    if head is None:
        raise ValueError(
            "forced alignment needs a CTC head (a decoder with a "
            "blank_id); this model has none"
        )
    blank_id = model.decoders[head].blank_id

    fconf = recipe.database.section(features)
    winstep = fconf.getfloat("winstep", 0.01)

    loader, _, _ = make_loader(
        recipe, expdir, Conf({"features": features, "targets": targets}),
        batch_size=rconf.getint("batch_size", 16),
        num_buckets=rconf.getint("num_buckets", 1),
    )
    params = load_best_params(expdir, model)
    alphabet = tgt_meta["alphabet"]

    @jax.jit
    def align_batch(feats, feat_lens, tgts, tgt_lens):
        outputs = model.apply(params, feats, feat_lens, heads=(head,))
        logits, logit_lengths = outputs[head]
        logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        frames, scores = ctc_forced_align(
            logprobs, logit_lengths, tgts, tgt_lens, blank_id
        )
        return frames, scores, logit_lengths

    out_dir = os.path.join(expdir, "aligned")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, "align.ctm")
    n = 0
    with open(out_path, "w") as f:
        for batch in loader.epoch(0, shuffle=False):
            frames, scores, logit_lengths = align_batch(
                jnp.asarray(batch.features),
                jnp.asarray(batch.feature_lengths),
                jnp.asarray(batch.targets),
                jnp.asarray(batch.target_lengths),
            )
            frames = jax.device_get(frames)
            logit_lengths = jax.device_get(logit_lengths)
            for b, utt in enumerate(batch.utt_ids):
                if not batch.example_mask[b]:
                    continue
                # seconds per OUTPUT frame: winstep * actual subsampling
                ll = max(int(logit_lengths[b]), 1)
                spf = winstep * float(batch.feature_lengths[b]) / ll
                for lab, t0, t1 in segments_from_frames(
                    frames[b], logit_lengths[b], blank_id
                ):
                    f.write(
                        f"{utt} 1 {t0 * spf:.3f} {(t1 - t0) * spf:.3f} "
                        f"{alphabet[lab]}\n"
                    )
                n += 1
    print(f"[align] wrote {out_path} ({n} utterances)")
    return out_path
