"""Mismatched-audio teacher-forcing probe: is the speller LISTENING?

The round-3 parity analysis rests on one measurement: an attention
decoder that rote-memorizes training transcripts shows high
teacher-forced accuracy even when every utterance is paired with the
WRONG audio (the text alone predicts the next token), while a decoder
that genuinely attends collapses under the same swap. Round 3 ran that
probe ad hoc and committed only its numbers; this tool makes it a
reproducible command (round-3 verdict Next #5):

    python tools/tf_probe.py --recipe <recipe> --expdir <expdir> \
        [--batches 10] [--platform cpu]

Reports teacher-forced token accuracy for the best checkpoint on
  - train batches, matched audio
  - the same train batches with features rolled one example within
    the batch (targets unchanged — every utterance gets wrong audio)
  - dev batches (held-out speakers), matched audio
and writes <expdir>/logs/tf_probe.json. Interpretation: matched >>
mismatched means attention carries information; matched ~= mismatched
means the decoder is reciting text (the memorization failure mode).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def probe(recipe_path: str, expdir: str, batches: int = 10):
    import jax
    import jax.numpy as jnp

    from nabu_tpu.config import Recipe
    from nabu_tpu.data.pipeline import batch_to_arrays
    from nabu_tpu.ops.losses import make_loss_computer
    from nabu_tpu.scripts.common import make_loader, model_from_recipe
    from nabu_tpu.scripts.test import load_best_params

    recipe = Recipe(recipe_path)
    tconf = recipe.trainer.section("trainer")
    model, _ = model_from_recipe(
        recipe, expdir, tconf["features"], tconf["targets"]
    )
    params = load_best_params(expdir, model)
    loss_fn = make_loss_computer(model)

    def tf_metrics(params, arrays):
        _, m = loss_fn(params, arrays, jax.random.PRNGKey(0), False)
        return {k: v for k, v in m.items() if "token_accuracy" in k}

    tf_metrics = jax.jit(tf_metrics)

    def roll_audio(arrays):
        """Wrong-audio batch: features shift one example, targets stay."""
        out = dict(arrays)
        out["features"] = jnp.roll(arrays["features"], 1, axis=0)
        out["feature_lengths"] = jnp.roll(
            arrays["feature_lengths"], 1, axis=0
        )
        return out

    def run(conf_features, conf_targets, batch_size, mismatch):
        from nabu_tpu.config import Conf

        conf = Conf(
            {"features": conf_features, "targets": conf_targets},
            "probe",
        )
        loader, _, _ = make_loader(
            recipe, expdir, conf, batch_size=batch_size, num_buckets=2
        )
        accs, n = [], 0
        for batch in loader.epoch(0, shuffle=False):
            arrays = batch_to_arrays(batch)
            if mismatch:
                arrays = roll_audio(arrays)
            m = tf_metrics(params, arrays)
            if not m:
                raise SystemExit(
                    "no token_accuracy metric — not an attention model?"
                )
            w = float(arrays["example_mask"].sum())
            accs.append((sum(float(v) for v in m.values()) / len(m), w))
            n += 1
            if n >= batches:
                break
        total_w = sum(w for _, w in accs)
        return sum(a * w for a, w in accs) / max(total_w, 1.0)

    batch_size = tconf.getint("batch_size", 16)
    vconf = recipe.validation_evaluator.section("evaluator")
    result = {
        "train_matched": run(
            tconf["features"], tconf["targets"], batch_size, False
        ),
        "train_mismatched_audio": run(
            tconf["features"], tconf["targets"], batch_size, True
        ),
        "dev_matched": run(
            vconf["features"], vconf["targets"], batch_size, False
        ),
        "batches": batches,
    }
    result["attention_gap"] = round(
        result["train_matched"] - result["train_mismatched_audio"], 4
    )
    result["verdict"] = (
        "listening" if result["attention_gap"] > 0.15
        else "memorizing" if result["train_matched"] > 0.5
        else "untrained"
    )
    return result


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tf_probe", description=__doc__)
    p.add_argument("--recipe", required=True)
    p.add_argument("--expdir", required=True)
    p.add_argument("--batches", type=int, default=10)
    p.add_argument("--platform", default=None,
                   help="cpu forces the CPU backend (set before jax use)")
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    result = probe(args.recipe, args.expdir, args.batches)
    line = json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                       for k, v in result.items()})
    print(line)
    os.makedirs(os.path.join(args.expdir, "logs"), exist_ok=True)
    with open(os.path.join(args.expdir, "logs", "tf_probe.json"),
              "w") as f:
        f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
