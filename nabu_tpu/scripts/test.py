"""`run test`: score the best-validated model on the test set.

Capability parity with nabu/scripts/test.py (SURVEY.md §3.4).
"""

from __future__ import annotations

import json
import os

from nabu_tpu.config import Recipe
from nabu_tpu.evaluators import build_evaluator
from nabu_tpu.scripts.common import make_loader, model_from_recipe
from nabu_tpu.training.checkpoints import CheckpointManager


def load_best_params(expdir: str, model):
    """Restore the best-on-dev params snapshot from expdir."""
    import jax

    mgr = CheckpointManager(os.path.join(expdir, "checkpoints"))
    template = {"params": model.init(jax.random.PRNGKey(0))}
    name = "best" if mgr.exists("best") else "latest"
    if not mgr.exists(name):
        raise FileNotFoundError(f"no checkpoint in {expdir}/checkpoints")
    return mgr.restore(name, template)["params"]


def main(recipe_path: str, expdir: str) -> float:
    recipe = Recipe(recipe_path)
    tconf = recipe.test_evaluator.section("evaluator")
    model, _ = model_from_recipe(
        recipe, expdir, tconf["features"], tconf["targets"]
    )
    loader, _, _ = make_loader(
        recipe,
        expdir,
        tconf,
        batch_size=tconf.getint("batch_size", 16),
        num_buckets=tconf.getint("num_buckets", 2),
    )
    params = load_best_params(expdir, model)
    evaluator = build_evaluator(tconf, model, loader)
    metric = evaluator.evaluate(params)
    result = {"metric": metric, "evaluator": tconf.get("evaluator", "loss")}
    with open(os.path.join(expdir, "test_result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(f"[test] {result['evaluator']} = {metric:.4f}")
    return metric
