"""`run train`: build model + loaders + evaluator + trainer, train.

Capability parity with nabu/scripts/train.py (SURVEY.md §3.2), minus the
parameter-server machinery: multi-host runs launch this same script once
per host (e.g. ``gcloud ... tpu-vm ssh --worker=all``) and
``jax.distributed.initialize`` forms the process group over DCN; the
mesh then spans all chips and GSPMD handles gradient psum over ICI.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from nabu_tpu.config import Recipe
from nabu_tpu.evaluators import build_evaluator
from nabu_tpu.parallel import make_mesh
from nabu_tpu.scripts.common import copy_recipe, make_loader, model_from_recipe
from nabu_tpu.training.trainer import build_trainer


def main(
    recipe_path: str,
    expdir: str,
    distributed: bool = False,
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    num_model_parallel: int = 1,
    num_expert_parallel: int = 1,
    num_pipeline: int = 1,
    num_seq_parallel: int = 1,
) -> dict:
    if distributed:
        if coordinator is None:
            # Cloud TPU pods auto-detect coordinator/process ids from
            # the TPU metadata: every worker just runs the same command
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_processes,
                process_id=process_id,
            )
    host_id = jax.process_index()
    num_hosts = jax.process_count()

    recipe = Recipe(recipe_path)
    os.makedirs(expdir, exist_ok=True)
    copy_recipe(recipe, expdir)

    trainer_conf = recipe.trainer.section("trainer")
    batch_size = trainer_conf.getint("batch_size", 16)
    num_buckets = trainer_conf.getint("num_buckets", 4)

    # persistent XLA compilation cache: with one jitted step per bucket
    # shape and 20-40 s TPU compiles, a resume/restart otherwise pays
    # the whole compile bill again (compilation_cache = false disables;
    # compilation_cache_dir overrides the location). Default ON for
    # accelerator backends only: XLA:CPU executable DEserialization has
    # been observed to segfault on cache hits, so CPU runs must opt in
    # explicitly with compilation_cache = true.
    cache_conf = trainer_conf.get("compilation_cache")
    if (
        trainer_conf.getbool("compilation_cache", True)
        if cache_conf is not None
        else jax.default_backend() != "cpu"
    ):
        cache_dir = trainer_conf.get(
            "compilation_cache_dir",
            os.path.join(expdir, "jax_cache"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    model, _ = model_from_recipe(
        recipe, expdir, trainer_conf["features"], trainer_conf["targets"]
    )
    loader, _, _ = make_loader(
        recipe,
        expdir,
        trainer_conf,
        batch_size=batch_size,
        num_buckets=num_buckets,
        seed=trainer_conf.getint("shuffle_seed", 0),
        host_id=host_id,
        num_hosts=num_hosts,
    )

    mesh = make_mesh(
        num_model=num_model_parallel,
        num_expert=num_expert_parallel,
        num_pipe=num_pipeline,
        num_seq=num_seq_parallel,
    )

    valid_fn = None
    if recipe.has("validation_evaluator"):
        vconf = recipe.validation_evaluator.section("evaluator")
        # dev set is host-sharded like the train set: each host scores
        # 1/num_hosts of it and the evaluator allgathers the counts, so
        # validation wall-clock scales down with hosts instead of every
        # process redundantly decoding the whole set
        vloader, _, _ = make_loader(
            recipe,
            expdir,
            vconf,
            batch_size=vconf.getint("batch_size", batch_size),
            num_buckets=vconf.getint("num_buckets", 2),
            host_id=host_id,
            num_hosts=num_hosts,
        )
        valid_fn = build_evaluator(vconf, model, vloader, mesh=mesh)
    trainer = build_trainer(
        trainer_conf, model, loader, expdir, valid_fn=valid_fn, mesh=mesh
    )
    result = trainer.train()
    print(
        f"[train] finished at step {result['step']}, "
        f"best metric {result['best_metric']:.4f}, "
        f"early stop: {result['stopped_early']}"
    )
    # explicit completion marker (chief only): downstream tooling (the
    # parity campaign's --resume) must distinguish "training finished"
    # from "training was killed mid-run" — a best checkpoint + metrics
    # exist in both cases, so their presence alone is not evidence
    if host_id == 0:
        import json

        marker = os.path.join(expdir, "logs", "train_complete.json")
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        with open(marker, "w") as f:
            json.dump({
                "step": result["step"],
                "best_metric": float(result["best_metric"]),
                "stopped_early": bool(result["stopped_early"]),
            }, f)
    return result
