"""Fused Pallas LSTM sequence kernel with analytic backward pass.

Replaces the per-step XLA while-loop body of the lax.scan LSTM
(nabu_tpu.models.core.lstm_scan — itself the TPU re-design of the
reference's tf dynamic_rnn/cuDNN recurrence, SURVEY.md §2 table) with a
kernel that walks the whole sequence: the hidden-projection weights
live in VMEM for the entire scan (zero per-step HBM traffic for
weights), the gate matmul runs on the MXU, and the gate nonlinearities,
cell update and length mask are fused in registers.

The time axis is the sequential grid dimension in blocks of
``block_t`` rows: Pallas pipelines the next block's [block_t, B, 4H]
input projections into VMEM while the current block computes, and the
carried (h, c) live in scratch that persists across grid steps.

Memory discipline: the forward stores ONLY the post-step (h, c)
carries — gate activations are recomputed in the backward from the
stored carries (one extra MXU matmul per step in exchange for 3x less
HBM traffic and VMEM footprint, the right trade on a
bandwidth-limited chip). The backward walks the grid in reverse,
receives each block's entry carry via a precomputed boundary tensor,
and accumulates d(wh) into a VMEM-resident output block.

Input projections (x @ wx) stay outside as one large MXU matmul.
Oracle: nabu_tpu.models.core.lstm_scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nabu_tpu.ops.pallas import on_tpu

_VMEM_LIMIT = 100 * 1024 * 1024


def _fwd_kernel(
    xw_ref,  # [BT, B, 4H] input projections (+bias) for this time block
    mask_ref,  # [BT, B]
    wh_ref,  # [H, 4H]
    hc_ref,  # out [BT, B, 2H] post-mask carries after each step
    h_scratch,  # VMEM [B, H] carried h (persists across grid steps)
    c_scratch,  # VMEM [B, H]
    *,
    block_t: int,
    forget_bias: float,
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)
        c_scratch[:] = jnp.zeros_like(c_scratch)

    H = wh_ref.shape[0]

    def body(i, _):
        h = h_scratch[:]
        c = c_scratch[:]
        gates = xw_ref[i] + jnp.dot(
            h, wh_ref[:], preferred_element_type=jnp.float32
        )
        gi = jax.nn.sigmoid(gates[:, :H])
        gf = jax.nn.sigmoid(gates[:, H : 2 * H] + forget_bias)
        gg = jnp.tanh(gates[:, 2 * H : 3 * H])
        go = jax.nn.sigmoid(gates[:, 3 * H :])
        c_new = gf * c + gi * gg
        h_new = go * jnp.tanh(c_new)
        m = mask_ref[i][:, None]
        h_next = jnp.where(m > 0.5, h_new, h)
        c_next = jnp.where(m > 0.5, c_new, c)
        h_scratch[:] = h_next
        c_scratch[:] = c_next
        hc_ref[i] = jnp.concatenate([h_next, c_next], axis=-1)
        return 0

    jax.lax.fori_loop(0, block_t, body, 0)


def _bwd_kernel(
    xw_ref,  # [BT, B, 4H]
    mask_ref,  # [BT, B]
    wh_ref,  # [H, 4H]
    hc_ref,  # [BT, B, 2H]
    boundary_ref,  # [1, B, 2H] carries at entry of this block
    g_ref,  # [BT, B, H] dL/dh_out
    dxw_ref,  # out [BT, B, 4H]
    dwh_ref,  # out [H, 4H], same block every grid step (accumulates)
    dh_scratch,  # VMEM [B, H]
    dc_scratch,  # VMEM [B, H]
    *,
    block_t: int,
    forget_bias: float,
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_scratch[:] = jnp.zeros_like(dh_scratch)
        dc_scratch[:] = jnp.zeros_like(dc_scratch)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)

    H = wh_ref.shape[0]

    def body(k, _):
        i = block_t - 1 - k
        m = mask_ref[i][:, None]
        prev = jnp.where(
            i > 0, hc_ref[jnp.maximum(i - 1, 0)], boundary_ref[0]
        )
        h_prev = prev[:, :H]
        c_prev = prev[:, H:]
        # recompute the gate activations from the stored carries
        gates = xw_ref[i] + jnp.dot(
            h_prev, wh_ref[:], preferred_element_type=jnp.float32
        )
        gi = jax.nn.sigmoid(gates[:, :H])
        gf = jax.nn.sigmoid(gates[:, H : 2 * H] + forget_bias)
        gg = jnp.tanh(gates[:, 2 * H : 3 * H])
        go = jax.nn.sigmoid(gates[:, 3 * H :])
        c_t = hc_ref[i][:, H:]

        tanh_c = jnp.tanh(c_t)  # == tanh(c_new) wherever m is on
        dh_total = g_ref[i] * m + dh_scratch[:]
        dh_new = jnp.where(m > 0.5, dh_total, 0.0)
        dc_new = (
            jnp.where(m > 0.5, dc_scratch[:], 0.0)
            + dh_new * go * (1.0 - tanh_c * tanh_c)
        )
        dgi = dc_new * gg * gi * (1.0 - gi)
        dgf = dc_new * c_prev * gf * (1.0 - gf)
        dgg = dc_new * gi * (1.0 - gg * gg)
        dgo = dh_new * tanh_c * go * (1.0 - go)
        dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=-1)
        dxw_ref[i] = dgates
        dwh_ref[:] += jnp.dot(
            h_prev.T, dgates, preferred_element_type=jnp.float32
        )
        dh_prev = jnp.dot(
            dgates, wh_ref[:].T, preferred_element_type=jnp.float32
        )
        dh_scratch[:] = dh_prev + jnp.where(m > 0.5, 0.0, dh_total)
        dc_scratch[:] = dc_new * gf + jnp.where(
            m > 0.5, 0.0, dc_scratch[:]
        )
        return 0

    jax.lax.fori_loop(0, block_t, body, 0)


def _pad_time(x, bt):
    T = x.shape[0]
    pad = (-T) % bt
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def lstm_seq_pallas(
    xw, mask, wh, forget_bias=1.0, interpret=None, block_t=16
):
    """Masked LSTM over a full sequence via the fused kernel.

    xw [T, B, 4H] = x @ wx + b (time-major), mask [T, B] float 0/1,
    wh [H, 4H]. Returns masked hidden outputs [T, B, H].
    """
    out, _ = _fwd(xw, mask, wh, forget_bias, interpret, block_t)
    return out


def _fwd(xw, mask, wh, forget_bias, interpret, block_t):
    if interpret is None:
        interpret = not on_tpu()
    T, B, H4 = xw.shape
    H = H4 // 4
    bt = min(block_t, T)
    xw_p = _pad_time(xw, bt)
    mask_p = _pad_time(mask, bt)
    Tp = xw_p.shape[0]
    nb = Tp // bt

    hc = pl.pallas_call(
        functools.partial(_fwd_kernel, block_t=bt, forget_bias=forget_bias),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bt, B, H4), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, B), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, B, 2 * H), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, B, 2 * H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(xw_p, mask_p, wh)
    # masked hidden outputs: the post-mask carry h equals h_new where
    # the mask is on, and the output is defined as 0 where it is off
    h_out = hc[:T, :, :H] * mask[:, :, None]
    return h_out, (xw_p, mask_p, wh, hc, T, bt)


def _bwd(forget_bias, interpret, block_t, residuals, g):
    if interpret is None:
        interpret = not on_tpu()
    xw_p, mask_p, wh, hc, T, bt = residuals
    Tp, B, H2 = hc.shape
    H = H2 // 2
    H4 = 4 * H
    nb = Tp // bt
    g_p = _pad_time(g, bt)

    # entry carry of block j = post-step carry of the last row of block
    # j-1; block 0 enters with zeros
    boundary = jnp.concatenate(
        [jnp.zeros((1, B, H2), hc.dtype), hc[bt - 1 :: bt][: nb - 1]],
        axis=0,
    )  # [nb, B, 2H]

    dxw, dwh = pl.pallas_call(
        functools.partial(_bwd_kernel, block_t=bt, forget_bias=forget_bias),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bt, B, H4), lambda j: (nb - 1 - j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, B), lambda j: (nb - 1 - j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, B, H2), lambda j: (nb - 1 - j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H2), lambda j: (nb - 1 - j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, B, H), lambda j: (nb - 1 - j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, B, H4), lambda j: (nb - 1 - j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, H4), jnp.float32),
            jax.ShapeDtypeStruct((H, H4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(xw_p, mask_p, wh, hc, boundary, g_p)
    return dxw[:T], jnp.zeros((T, B), mask_p.dtype), dwh


lstm_seq_pallas.defvjp(_fwd, _bwd)


def lstm_scan_pallas(
    p, x, lengths, reverse=False, forget_bias=1.0, interpret=None,
    block_t=16,
):
    """Drop-in replacement for models.core.lstm_scan using the fused
    kernel. x [B, T, D] -> [B, T, H], in x's dtype.

    The kernel itself is float32 (this is the earlier single-direction
    iteration; the maintained mixed-precision kernels are in blstm.py),
    so non-f32 inputs are upcast around the custom-VJP boundary — the
    casts are differentiable, keeping cotangent dtypes consistent.
    """
    in_dtype = x.dtype
    B, T, _ = x.shape
    mask = (
        jnp.arange(T, dtype=lengths.dtype)[None, :] < lengths[:, None]
    )
    if reverse:
        x = jnp.flip(x, axis=1)
        mask = jnp.flip(mask, axis=1)
    xw = (x @ p["wx"] + p["b"]).swapaxes(0, 1)  # [T, B, 4H]
    mask_t = mask.swapaxes(0, 1).astype(jnp.float32)
    ys = lstm_seq_pallas(
        xw.astype(jnp.float32), mask_t,
        p["wh"].astype(jnp.float32), forget_bias, interpret, block_t,
    )
    ys = ys.swapaxes(0, 1).astype(in_dtype)
    if reverse:
        ys = jnp.flip(ys, axis=1)
    return ys
