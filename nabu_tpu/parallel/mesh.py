"""Device mesh construction and sharding rules.

The mesh has two logical axes: ``data`` (batch / data parallel — psum
over ICI at the gradient reduction GSPMD inserts) and ``model`` (GSPMD
parameter sharding for larger-than-chip encoders, BASELINE.json:5).
Batches shard over ``data``; parameter partition rules walk the params
pytree by path and shard the large gate matrices over ``model``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
EXPERT_AXIS = "expert"
PIPE_AXIS = "pipe"
SEQ_AXIS = "seq"

_CURRENT_MESH: list = []


def make_mesh(
    num_data: Optional[int] = None,
    num_model: int = 1,
    num_expert: int = 1,
    num_pipe: int = 1,
    num_seq: int = 1,
    devices=None,
) -> Mesh:
    """Build a [data, (expert,) (pipe,) (seq,) model] mesh.

    model-axis neighbors are adjacent device ids so tensor-parallel
    collectives ride the fastest links; the seq axis (sequence
    parallelism — activations shard along time, attention all-gathers
    keys/values via GSPMD) and pipe axis (pipeline stages,
    parallel/pipeline.py) are next-innermost so their hops are
    near-neighbor; the expert axis (MoE expert parallelism — each
    group of devices holds a subset of the expert FFNs, tokens move
    via the collectives GSPMD inserts around the expert-choice
    gather/combine) sits between data and pipe. Size-1 optional axes
    are omitted so the common case stays a 2-axis [data, model] mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if num_data is None:
        num_data = n // (num_model * num_expert * num_pipe * num_seq)
    if num_data * num_model * num_expert * num_pipe * num_seq != n:
        raise ValueError(
            f"mesh {num_data}x{num_expert}x{num_pipe}x{num_seq}"
            f"x{num_model} != {n} devices"
        )
    sizes = [(DATA_AXIS, num_data)]
    if num_expert > 1:
        sizes.append((EXPERT_AXIS, num_expert))
    if num_pipe > 1:
        sizes.append((PIPE_AXIS, num_pipe))
    if num_seq > 1:
        sizes.append((SEQ_AXIS, num_seq))
    sizes.append((MODEL_AXIS, num_model))
    arr = np.asarray(devices).reshape([s for _, s in sizes])
    return Mesh(arr, tuple(name for name, _ in sizes))


def use_mesh(mesh: Mesh):
    """Context manager installing ``mesh`` as the process-wide current
    mesh (read by components that need it at trace time, e.g. the
    pipeline-parallel encoder path)."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        _CURRENT_MESH.append(mesh)
        try:
            yield mesh
        finally:
            _CURRENT_MESH.pop()

    return ctx()


def current_mesh() -> Optional[Mesh]:
    """The innermost mesh installed by :func:`use_mesh`, or None."""
    return _CURRENT_MESH[-1] if _CURRENT_MESH else None


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over data axis, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch dict onto the mesh, batch dim over 'data'.

    On a mesh with a 'seq' axis, the features' time dim additionally
    shards over 'seq' (sequence parallelism — the attention encoders
    keep activations time-sharded, see encoders.TransformerEncoder).

    Multi-host: every process passes its LOCAL batch (the loader's
    per-host shard) and the result is the GLOBAL array — process-local
    data concatenates along the data axis, so global batch =
    num_hosts * per-host batch.
    """
    multihost = jax.process_count() > 1
    has_seq = SEQ_AXIS in mesh.shape

    def put(key, x):
        x = np.asarray(x)
        if key == "features" and has_seq and x.ndim >= 3:
            spec = P(DATA_AXIS, SEQ_AXIS)
        elif x.ndim >= 1:
            spec = P(DATA_AXIS)
        else:
            spec = P()
        sharding = NamedSharding(mesh, spec)
        if multihost:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return {k: put(k, v) for k, v in batch.items()}


def param_partition_specs(
    params,
    model_parallel_size: int = 1,
    expert_parallel_size: int = 1,
    min_shard_size: int = 1 << 14,
):
    """PartitionSpec pytree for a params tree.

    Rules (by leaf path/shape):
      - LSTM/linear/attention kernels [in, out] (``wx``/``wh``/``w``/
        ``wqkv``): shard ``out`` over MODEL_AXIS (the 4H gate axis for
        LSTMs, the fused QKV axis for transformers — each shard
        computes its slice locally; GSPMD all-gathers as needed);
      - MoE expert stacks ``we1``/``we2`` [E, in, out] (or [L, E, in,
        out] under scan_layers): shard the E axis over EXPERT_AXIS —
        each device group holds a subset of experts;
      - embedding tables [vocab, dim]: replicated (vocabs are small in
        ASR);
      - biases and small leaves: replicated.
    Leaves whose element count is below ``min_shard_size`` stay
    replicated to avoid collective overhead on tiny tensors.
    """

    def spec_for(path, leaf) -> P:
        if leaf.ndim < 2 or leaf.size < min_shard_size:
            return P()
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in ("we1", "we2") and leaf.ndim >= 3:
            if (
                expert_parallel_size > 1
                and leaf.shape[-3] % expert_parallel_size == 0
            ):
                return P(*(
                    [None] * (leaf.ndim - 3) + [EXPERT_AXIS, None, None]
                ))
            return P()
        if model_parallel_size > 1 and leaf.shape[-1] % model_parallel_size:
            return P()
        if name in ("wx", "wh", "w", "wqkv"):
            # shard the LAST axis (the out/gate/fused-QKV dim) so the
            # same rule covers plain [in, out] kernels and layer-stacked
            # [L, in, out] leaves (scan_layers encoders)
            return P(*([None] * (leaf.ndim - 1) + [MODEL_AXIS]))
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(mesh: Mesh, params, specs=None):
    """Place params on the mesh according to partition specs.

    Multi-host: every process holds identical full params (same PRNG
    seed / restored checkpoint), so process-local placement yields the
    consistent global array.
    """
    if specs is None:
        specs = param_partition_specs(
            params,
            model_parallel_size=mesh.shape.get(MODEL_AXIS, 1),
            expert_parallel_size=mesh.shape.get(EXPERT_AXIS, 1),
        )
    multihost = jax.process_count() > 1

    def put(x, s):
        sharding = NamedSharding(mesh, s)
        if multihost:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            )
        return jax.device_put(x, sharding)

    return jax.tree.map(put, params, specs)


def fetch_to_host(tree):
    """Fetch a (possibly multi-host global) pytree to host numpy.

    Multi-host this is a COLLECTIVE: every process must call it at the
    same point (device_get of a global array allgathers under the hood,
    so a chief-only fetch would deadlock/crash the group). Callers that
    gate on is_chief must gate only the *use* of the result, not the
    fetch.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # tiled=True reassembles along existing dims (required for
        # global arrays); replicated arrays come back unchanged
        return jax.device_get(
            multihost_utils.process_allgather(tree, tiled=True)
        )
    return jax.device_get(tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh."""
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                NamedSharding(mesh, P()), np.asarray(x)
            ),
            tree,
        )
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
