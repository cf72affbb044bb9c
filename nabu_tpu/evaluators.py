"""Evaluators: dev-set loss and decode-based error rate.

Capability parity with nabu/neuralnetworks/evaluators/ (LossEvaluator,
DecoderEvaluator + evaluator_factory): an evaluator is built from a
validation/test evaluator config section and maps trained params to a
scalar metric (lower is better) — used for validation-driven early
stopping and for `run test` scoring.

Sharded evaluation (TPU-first): pass ``mesh`` to spread the work.

- Multi-host: give each host a host-sharded loader (scripts/train.py
  does) — every host evaluates only its own shard on its own local
  devices and the error/loss COUNTS are summed across hosts with one
  allgather, so dev-eval wall-clock is ~1/num_hosts and the returned
  metric is bit-identical on every process (single-brained early
  stopping needs that). The trainer mesh's model-parallel size is
  mirrored onto a local-device mesh so a model too big for one chip can
  still validate.
- Single-host: batches/params are placed on the mesh (data-parallel
  across local chips, model-parallel per the trainer's partition specs)
  and the metric equals the unsharded value exactly
  (tests/test_parallel.py::TestShardedEvaluators).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from nabu_tpu.config import Conf
from nabu_tpu.data.pipeline import BucketedLoader, batch_to_arrays
from nabu_tpu.decoding.recognizers import build_recognizer
from nabu_tpu.decoding.scorer import error_rate
from nabu_tpu.ops.losses import make_loss_computer
from nabu_tpu.parallel import mesh as mesh_lib
from nabu_tpu.registry import EVALUATORS


def _local_eval_mesh(mesh) -> Optional[jax.sharding.Mesh]:
    """The mesh evaluation actually runs on.

    Single-process: the trainer mesh itself. Multi-host: evaluation is
    per-host-independent (each host scores its own data shard), so
    mirror the model-parallel size onto THIS host's devices; if the
    local chips can't hold one model replica (model axis larger than
    the host), fall back to default placement — correctness over speed.
    """
    if mesh is None:
        return None
    if jax.process_count() == 1:
        return mesh
    local = jax.local_devices()
    num_model = mesh.shape.get(mesh_lib.MODEL_AXIS, 1)
    if num_model > len(local) or len(local) % num_model:
        return None
    return mesh_lib.make_mesh(
        num_model=num_model, devices=local
    )


def _place(mesh, tree, specs) -> dict:
    """device_put a pytree on an all-addressable (local) mesh."""
    return jax.tree.map(
        lambda x, s: jax.device_put(
            np.asarray(x), NamedSharding(mesh, s)
        ),
        tree,
        specs,
    )


def _allgather_sum(values: Tuple[float, ...]) -> Tuple[float, ...]:
    """Sum per-host scalars over all processes (collective; identical
    result everywhere). No-op single-process."""
    if jax.process_count() == 1:
        return values
    from jax.experimental import multihost_utils

    stacked = multihost_utils.process_allgather(
        np.asarray(values, np.float64)
    )  # [num_hosts, len(values)]
    return tuple(float(v) for v in stacked.sum(axis=0))


class Evaluator:
    def __init__(self, conf: Conf, model, loader: BucketedLoader,
                 mesh=None):
        self.conf = conf
        self.model = model
        self.loader = loader
        self.mesh = _local_eval_mesh(mesh)
        self._param_specs = None

    def _placed_params(self, params):
        if self.mesh is None:
            return params
        if self._param_specs is None:
            self._param_specs = mesh_lib.param_partition_specs(
                params,
                model_parallel_size=self.mesh.shape.get(
                    mesh_lib.MODEL_AXIS, 1
                ),
            )
        return _place(self.mesh, params, self._param_specs)

    def _placed_batch(self, arrays: dict) -> dict:
        if self.mesh is None:
            return arrays
        return _place(
            self.mesh,
            arrays,
            {k: P(mesh_lib.DATA_AXIS) if np.ndim(v) else P()
             for k, v in arrays.items()},
        )

    def evaluate(self, params) -> float:
        raise NotImplementedError

    def __call__(self, params) -> float:
        if self.mesh is not None:
            with mesh_lib.use_mesh(self.mesh):
                return self.evaluate(params)
        return self.evaluate(params)


@EVALUATORS.register("loss")
class LossEvaluator(Evaluator):
    """Mean loss over the dev set (reference: loss evaluator)."""

    def __init__(self, conf, model, loader, mesh=None):
        super().__init__(conf, model, loader, mesh)
        loss_fn = make_loss_computer(model)

        def eval_step(params, batch, rng):
            loss = loss_fn(params, batch, rng, False)[0]
            n = batch["example_mask"].sum()
            return loss * n, n

        self._eval_step = jax.jit(eval_step)

    def evaluate(self, params) -> float:
        params = self._placed_params(params)
        total = 0.0
        count = 0.0
        rng = jax.random.PRNGKey(0)
        for batch in self.loader.epoch(0, shuffle=False):
            arrays = self._placed_batch(batch_to_arrays(batch))
            loss_sum, n = self._eval_step(params, arrays, rng)
            total += float(loss_sum)
            count += float(n)
        total, count = _allgather_sum((total, count))
        return total / max(count, 1.0)


@EVALUATORS.register("decoder")
@EVALUATORS.register("error_rate")
class DecoderEvaluator(Evaluator):
    """Run a recognizer over the dev set, return token error rate
    (CER/PER/WER depending on the target unit — reference: decoder
    evaluator)."""

    def __init__(self, conf, model, loader, mesh=None):
        super().__init__(conf, model, loader, mesh)
        self.recognizer = build_recognizer(conf, model)

    def evaluate(self, params) -> float:
        params = self._placed_params(params)
        refs: List[List[int]] = []
        hyps: List[List[int]] = []
        for batch in self.loader.epoch(0, shuffle=False):
            feats, flens = batch.features, batch.feature_lengths
            if self.mesh is not None:
                placed = _place(
                    self.mesh,
                    {"f": feats, "l": flens},
                    {"f": P(mesh_lib.DATA_AXIS), "l": P(mesh_lib.DATA_AXIS)},
                )
                feats, flens = placed["f"], placed["l"]
            result = self.recognizer(params, feats, flens)
            for b in range(len(batch.utt_ids)):
                if not batch.example_mask[b]:
                    continue
                refs.append(
                    list(batch.targets[b, : batch.target_lengths[b]])
                )
                hyps.append(result.best(b))
        _, errors, tokens = error_rate(refs, hyps)
        errors, tokens = _allgather_sum((float(errors), float(tokens)))
        return errors / max(tokens, 1.0)


def build_evaluator(conf: Conf, model, loader, mesh=None) -> Evaluator:
    """Factory by conf['evaluator'] (reference: evaluator_factory.py)."""
    return EVALUATORS.build(
        conf.get("evaluator", "loss"), conf, model, loader, mesh=mesh
    )
