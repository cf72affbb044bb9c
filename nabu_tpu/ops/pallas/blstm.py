"""Fused bidirectional LSTM Pallas kernel.

Perf iteration on nabu_tpu.ops.pallas.lstm: both directions of a BLSTM
layer run in ONE kernel. Per sequential-grid step the kernel walks a
forward time block and the mirrored backward time block together, so
each loop iteration issues TWO independent gate matmuls (fw + bw) that
pipeline on the MXU and share the loop/control overhead that dominates
small-batch recurrences. Both directions' weights stay VMEM-resident
for the whole sequence.

The backward block mapping uses a separate BlockSpec index map
(block nb-1-j of the time-reversed padded input), so no host-side
flip-and-rescan is needed.

Forward-only for now (training backward falls back to two lstm.py
kernels or the XLA scan); used by decode paths and as the substrate for
the next backward-fusion iteration.

Oracle: nabu_tpu.models.core.blstm_apply.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nabu_tpu.ops.pallas import on_tpu

_VMEM_LIMIT = 100 * 1024 * 1024


def _blstm_kernel(
    xw_fw_ref,  # [BT, B, 4H] forward input projections, block j
    xw_bw_ref,  # [BT, B, 4H] reversed-time projections, block nb-1-j
    mask_fw_ref,  # [BT, B]
    mask_bw_ref,  # [BT, B]
    wh_fw_ref,  # [H, 4H]
    wh_bw_ref,  # [H, 4H]
    out_fw_ref,  # [BT, B, H]
    out_bw_ref,  # [BT, B, H] (in reversed time; host flips back)
    hf_s, cf_s, hb_s, cb_s,  # VMEM [B, H] carries
    *,
    block_t: int,
    forget_bias: float,
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        hf_s[:] = jnp.zeros_like(hf_s)
        cf_s[:] = jnp.zeros_like(cf_s)
        hb_s[:] = jnp.zeros_like(hb_s)
        cb_s[:] = jnp.zeros_like(cb_s)

    H = wh_fw_ref.shape[0]

    def cell(xw, h, c, wh, m):
        gates = xw + jnp.dot(h, wh, preferred_element_type=jnp.float32)
        gi = jax.nn.sigmoid(gates[:, :H])
        gf = jax.nn.sigmoid(gates[:, H : 2 * H] + forget_bias)
        gg = jnp.tanh(gates[:, 2 * H : 3 * H])
        go = jax.nn.sigmoid(gates[:, 3 * H :])
        c_new = gf * c + gi * gg
        h_new = go * jnp.tanh(c_new)
        h_next = jnp.where(m > 0.5, h_new, h)
        c_next = jnp.where(m > 0.5, c_new, c)
        return h_new, h_next, c_next

    def body(i, _):
        mf = mask_fw_ref[i][:, None]
        mb = mask_bw_ref[i][:, None]
        # two independent matmuls per iteration — MXU pipelines them
        h_new_f, hf, cf = cell(xw_fw_ref[i], hf_s[:], cf_s[:], wh_fw_ref[:], mf)
        h_new_b, hb, cb = cell(xw_bw_ref[i], hb_s[:], cb_s[:], wh_bw_ref[:], mb)
        hf_s[:] = hf
        cf_s[:] = cf
        hb_s[:] = hb
        cb_s[:] = cb
        out_fw_ref[i] = h_new_f * mf
        out_bw_ref[i] = h_new_b * mb
        return 0

    jax.lax.fori_loop(0, block_t, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("forget_bias", "interpret", "block_t"),
)
def blstm_fused_forward(
    params: dict,  # {"fw": {wx, wh, b}, "bw": {...}}
    x: jnp.ndarray,  # [B, T, D]
    lengths: jnp.ndarray,  # [B]
    forget_bias: float = 1.0,
    interpret: bool | None = None,
    block_t: int = 32,
) -> jnp.ndarray:
    """Fused BLSTM forward -> [B, T, 2H] (fw ++ bw)."""
    if interpret is None:
        interpret = not on_tpu()
    B, T, _ = x.shape
    H = params["fw"]["wh"].shape[0]
    H4 = 4 * H

    mask = (
        jnp.arange(T, dtype=lengths.dtype)[None, :] < lengths[:, None]
    ).astype(jnp.float32)
    xw_fw = (x @ params["fw"]["wx"] + params["fw"]["b"]).swapaxes(0, 1)
    x_rev = jnp.flip(x, axis=1)
    mask_rev = jnp.flip(mask, axis=1)
    xw_bw = (x_rev @ params["bw"]["wx"] + params["bw"]["b"]).swapaxes(0, 1)
    mask_t = mask.swapaxes(0, 1)
    mask_rev_t = mask_rev.swapaxes(0, 1)

    bt = min(block_t, T)
    pad = (-T) % bt

    def pad_t(a):
        if pad:
            return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
        return a

    xw_fw, xw_bw = pad_t(xw_fw), pad_t(xw_bw)
    mask_t, mask_rev_t = pad_t(mask_t), pad_t(mask_rev_t)
    Tp = xw_fw.shape[0]
    nb = Tp // bt

    out_fw, out_bw = pl.pallas_call(
        functools.partial(
            _blstm_kernel, block_t=bt, forget_bias=forget_bias
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bt, B, H4), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, B, H4), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, B), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, B), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, B, H), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, B, H), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, H), jnp.float32),
            jax.ShapeDtypeStruct((Tp, B, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(xw_fw, xw_bw, mask_t, mask_rev_t,
      params["fw"]["wh"], params["bw"]["wh"])

    fw = out_fw[:T].swapaxes(0, 1)  # [B, T, H]
    bw = jnp.flip(out_bw[:T].swapaxes(0, 1), axis=1)
    return jnp.concatenate([fw, bw], axis=-1)
