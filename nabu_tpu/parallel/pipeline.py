"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

The reference framework has no pipelining (its only parallelism is
TF parameter-server data parallelism); this is a beyond-parity scaling
feature for encoders deeper than one chip's HBM/step budget.

TPU-native design: a homogeneous layer stack (the transformer/conformer
``scan_layers`` representation — every leaf stacked as [L, ...]) is
sharded over the ``pipe`` mesh axis, so each device group holds L/S
consecutive layers (one *stage*). The batch is split into M
microbatches which stream through the stages; activations hop stage to
stage with ``lax.ppermute`` over ICI (neighbor links only — the
cheapest possible collective). All devices run the same program: one
``lax.scan`` over M+S-1 ticks (the GPipe schedule), each tick running
the local stage on either a fresh microbatch (stage 0) or the
activation that just arrived from the previous stage. The whole thing
is differentiable — the transpose of ``ppermute`` is the reverse
``ppermute``, so ``jax.grad`` yields the standard backward pipeline
with no extra machinery.

Composition with other axes: ``shard_map`` is entered with
``axis_names={'pipe'}`` only, so the data/model/expert axes stay in
GSPMD "auto" mode — data-parallel batch sharding and tensor/expert
parameter sharding compose with pipelining untouched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

PIPE_AXIS = "pipe"


def pipeline_apply(mesh: Mesh, stage_fn, stage_params, x_mb, aux_mb):
    """Stream microbatches through layer stages sharded over 'pipe'.

    Args:
      mesh: mesh containing a ``pipe`` axis of size S.
      stage_fn: ``(params_chunk, x, aux) -> y`` — applies this stage's
        L/S layers to one microbatch. ``params_chunk`` leaves are the
        [L/S, ...] slices of ``stage_params``; ``x``/``y`` are
        [mb, ...] activations; ``aux`` is a pytree of per-microbatch
        side inputs (attention bias, masks, microbatch id) that travel
        through the pipeline alongside the activations.
      stage_params: pytree with every leaf stacked [L, ...]; L must be
        divisible by S (sharded over 'pipe' on dim 0).
      x_mb: [M, mb, ...] microbatched activations (M microbatches).
      aux_mb: pytree of [M, ...] per-microbatch side inputs. Leaves
        must be ppermute-able (numeric — cast bools to int/float).

    Returns:
      [M, mb, ...] outputs of the last stage, replicated over 'pipe'.
    """
    S = mesh.shape[PIPE_AXIS]
    M = x_mb.shape[0]
    perm = [(i, (i + 1) % S) for i in range(S)]

    # XLA:CPU's AllReducePromotion pass crashes (CHECK failure
    # "Invalid binary instruction opcode copy") when promoting bf16
    # all-reduces, and the shard_map transpose inserts one for the
    # replicated x_mb input. TPU reduces bf16 natively; on CPU keep
    # the pipeline boundary in f32 (tests/CI surface only).
    out_dtype = x_mb.dtype
    cpu = jax.default_backend() == "cpu"
    if cpu and x_mb.dtype == jnp.bfloat16:
        x_mb = x_mb.astype(jnp.float32)

        inner_stage_fn = stage_fn

        def stage_fn(params, x, aux):  # noqa: F811
            return inner_stage_fn(
                params, x.astype(out_dtype), aux
            ).astype(jnp.float32)

    def worker(params, x_mb, aux_mb):
        s = jax.lax.axis_index(PIPE_AXIS)
        first = s == 0
        last = s == S - 1
        buf = jnp.zeros_like(x_mb[0])
        aux_buf = jax.tree.map(lambda a: jnp.zeros_like(a[0]), aux_mb)
        outputs = jnp.zeros_like(x_mb)

        def tick(carry, t):
            buf, aux_buf, outputs = carry
            # stage 0 feeds microbatch t (clamped: late ticks redo the
            # last mb, masked out below); others take the arrival buffer
            m_in = jnp.clip(t, 0, M - 1)
            x0 = jax.lax.dynamic_index_in_dim(x_mb, m_in, 0, False)
            x_in = jnp.where(first, x0, buf)
            a_in = jax.tree.map(
                lambda a, b: jnp.where(
                    first, jax.lax.dynamic_index_in_dim(a, m_in, 0, False), b
                ),
                aux_mb, aux_buf,
            )
            y = stage_fn(params, x_in, a_in)
            # the last stage finishes microbatch t-(S-1) at tick t
            m_out = jnp.clip(t - (S - 1), 0, M - 1)
            write = last & (t >= S - 1)
            prev = jax.lax.dynamic_index_in_dim(outputs, m_out, 0, False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(write, y, prev), m_out, 0
            )
            # hop activations + their side inputs to the next stage
            buf = jax.lax.ppermute(y, PIPE_AXIS, perm)
            aux_buf = jax.tree.map(
                lambda a: jax.lax.ppermute(a, PIPE_AXIS, perm), a_in
            )
            return (buf, aux_buf, outputs), None

        (_, _, outputs), _ = jax.lax.scan(
            tick, (buf, aux_buf, outputs), jnp.arange(M + S - 1)
        )
        # only the last stage holds real outputs; replicate them
        outputs = jnp.where(last, outputs, jnp.zeros_like(outputs))
        return jax.lax.psum(outputs, PIPE_AXIS)

    out = jax.shard_map(
        worker,
        mesh=mesh,
        in_specs=(P(PIPE_AXIS), P(), P()),
        out_specs=P(),
        axis_names={PIPE_AXIS},
        check_vma=False,
    )(stage_params, x_mb, aux_mb)
    return out.astype(out_dtype)
