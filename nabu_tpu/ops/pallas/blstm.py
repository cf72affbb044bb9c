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

Training uses the same trick in reverse: both directions' backward
passes walk their OWN time descending, which is the same mirrored-block
pattern, so one backward kernel advances fw-backward and bw-backward
together (two dgates computations, two d(wh) accumulations, two
carry-propagation matmuls per row) — see ``blstm_fused`` (custom VJP).

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


# ---------------------------------------------------------------------------
# trainable fused BLSTM: forward stores carries, fused dual-direction backward
# ---------------------------------------------------------------------------

def _fwd_train_kernel(
    xw_fw_ref, xw_bw_ref,  # [BT, B, 4H]
    mask_fw_ref, mask_bw_ref,  # [BT, B]
    wh_fw_ref, wh_bw_ref,  # [H, 4H]
    hc_fw_ref, hc_bw_ref,  # out [BT, B, 2H] post-mask carries
    hf_s, cf_s, hb_s, cb_s,
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
        return (
            jnp.where(m > 0.5, h_new, h),
            jnp.where(m > 0.5, c_new, c),
        )

    def body(i, _):
        mf = mask_fw_ref[i][:, None]
        mb = mask_bw_ref[i][:, None]
        hf, cf = cell(xw_fw_ref[i], hf_s[:], cf_s[:], wh_fw_ref[:], mf)
        hb, cb = cell(xw_bw_ref[i], hb_s[:], cb_s[:], wh_bw_ref[:], mb)
        hf_s[:] = hf
        cf_s[:] = cf
        hb_s[:] = hb
        cb_s[:] = cb
        hc_fw_ref[i] = jnp.concatenate([hf, cf], axis=-1)
        hc_bw_ref[i] = jnp.concatenate([hb, cb], axis=-1)
        return 0

    jax.lax.fori_loop(0, block_t, body, 0)


def _bwd_train_kernel(
    xw_fw_ref, xw_bw_ref,  # [BT, B, 4H] (blocks nb-1-j)
    mask_fw_ref, mask_bw_ref,  # [BT, B]
    wh_fw_ref, wh_bw_ref,  # [H, 4H]
    hc_fw_ref, hc_bw_ref,  # [BT, B, 2H]
    bnd_fw_ref, bnd_bw_ref,  # [1, B, 2H] block entry carries
    g_fw_ref, g_bw_ref,  # [BT, B, H] cotangents of masked outputs
    dxw_fw_ref, dxw_bw_ref,  # out [BT, B, 4H]
    dwh_fw_ref, dwh_bw_ref,  # out [H, 4H] accumulated
    dhf_s, dcf_s, dhb_s, dcb_s,
    *,
    block_t: int,
    forget_bias: float,
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dhf_s[:] = jnp.zeros_like(dhf_s)
        dcf_s[:] = jnp.zeros_like(dcf_s)
        dhb_s[:] = jnp.zeros_like(dhb_s)
        dcb_s[:] = jnp.zeros_like(dcb_s)
        dwh_fw_ref[:] = jnp.zeros_like(dwh_fw_ref)
        dwh_bw_ref[:] = jnp.zeros_like(dwh_bw_ref)

    H = wh_fw_ref.shape[0]

    def direction(i, xw_ref, mask_ref, wh_ref, hc_ref, bnd_ref, g_ref,
                  dxw_ref, dwh_ref, dh_s, dc_s):
        m = mask_ref[i][:, None]
        prev = jnp.where(
            i > 0, hc_ref[jnp.maximum(i - 1, 0)], bnd_ref[0]
        )
        h_prev = prev[:, :H]
        c_prev = prev[:, H:]
        gates = xw_ref[i] + jnp.dot(
            h_prev, wh_ref[:], preferred_element_type=jnp.float32
        )
        gi = jax.nn.sigmoid(gates[:, :H])
        gf = jax.nn.sigmoid(gates[:, H : 2 * H] + forget_bias)
        gg = jnp.tanh(gates[:, 2 * H : 3 * H])
        go = jax.nn.sigmoid(gates[:, 3 * H :])
        c_t = hc_ref[i][:, H:]
        tanh_c = jnp.tanh(c_t)
        dh_total = g_ref[i] * m + dh_s[:]
        dh_new = jnp.where(m > 0.5, dh_total, 0.0)
        dc_new = (
            jnp.where(m > 0.5, dc_s[:], 0.0)
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
        dh_s[:] = dh_prev + jnp.where(m > 0.5, 0.0, dh_total)
        dc_s[:] = dc_new * gf + jnp.where(m > 0.5, 0.0, dc_s[:])

    def body(k, _):
        i = block_t - 1 - k
        direction(i, xw_fw_ref, mask_fw_ref, wh_fw_ref, hc_fw_ref,
                  bnd_fw_ref, g_fw_ref, dxw_fw_ref, dwh_fw_ref,
                  dhf_s, dcf_s)
        direction(i, xw_bw_ref, mask_bw_ref, wh_bw_ref, hc_bw_ref,
                  bnd_bw_ref, g_bw_ref, dxw_bw_ref, dwh_bw_ref,
                  dhb_s, dcb_s)
        return 0

    jax.lax.fori_loop(0, block_t, body, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def blstm_seq_fused(
    xw_fw, xw_bw, mask_fw, mask_bw, wh_fw, wh_bw,
    forget_bias=1.0, interpret=None, block_t=32,
):
    """Trainable fused BLSTM recurrence over precomputed projections.

    All arrays time-major; the bw arrays are in the bw direction's own
    (flipped) time order. Returns (h_fw [T,B,H], h_bw [T,B,H]) masked
    outputs, bw in flipped order (caller un-flips and concatenates).
    """
    out, _ = _fused_fwd(
        xw_fw, xw_bw, mask_fw, mask_bw, wh_fw, wh_bw,
        forget_bias, interpret, block_t,
    )
    return out


def _fused_fwd(xw_fw, xw_bw, mask_fw, mask_bw, wh_fw, wh_bw,
               forget_bias, interpret, block_t):
    if interpret is None:
        interpret = not on_tpu()
    T, B, H4 = xw_fw.shape
    H = H4 // 4
    bt = min(block_t, T)
    pad = (-T) % bt

    def pad_t(a):
        if pad:
            return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
        return a

    xw_fw_p, xw_bw_p = pad_t(xw_fw), pad_t(xw_bw)
    mask_fw_p, mask_bw_p = pad_t(mask_fw), pad_t(mask_bw)
    Tp = xw_fw_p.shape[0]
    nb = Tp // bt

    hc_fw, hc_bw = pl.pallas_call(
        functools.partial(
            _fwd_train_kernel, block_t=bt, forget_bias=forget_bias
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
            pl.BlockSpec((bt, B, 2 * H), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, B, 2 * H), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, 2 * H), jnp.float32),
            jax.ShapeDtypeStruct((Tp, B, 2 * H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)] * 4,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xw_fw_p, xw_bw_p, mask_fw_p, mask_bw_p, wh_fw, wh_bw)

    h_fw = hc_fw[:T, :, :H] * mask_fw[:, :, None]
    h_bw = hc_bw[:T, :, :H] * mask_bw[:, :, None]
    residuals = (
        xw_fw_p, xw_bw_p, mask_fw_p, mask_bw_p, wh_fw, wh_bw,
        hc_fw, hc_bw, T, bt,
    )
    return (h_fw, h_bw), residuals


def _fused_bwd(forget_bias, interpret, block_t, residuals, g):
    if interpret is None:
        interpret = not on_tpu()
    (xw_fw_p, xw_bw_p, mask_fw_p, mask_bw_p, wh_fw, wh_bw,
     hc_fw, hc_bw, T, bt) = residuals
    g_fw, g_bw = g
    Tp, B, H2 = hc_fw.shape
    H = H2 // 2
    H4 = 4 * H
    nb = Tp // bt
    pad = Tp - T

    def pad_t(a):
        if pad:
            return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
        return a

    g_fw_p, g_bw_p = pad_t(g_fw), pad_t(g_bw)

    def boundary(hc):
        return jnp.concatenate(
            [jnp.zeros((1, B, H2), hc.dtype), hc[bt - 1 :: bt][: nb - 1]],
            axis=0,
        )

    bnd_fw, bnd_bw = boundary(hc_fw), boundary(hc_bw)

    rev = lambda j, nb=nb: (nb - 1 - j, 0, 0)
    rev2 = lambda j, nb=nb: (nb - 1 - j, 0)
    dxw_fw, dxw_bw, dwh_fw, dwh_bw = pl.pallas_call(
        functools.partial(
            _bwd_train_kernel, block_t=bt, forget_bias=forget_bias
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bt, B, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, B, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, B), rev2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, B), rev2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, B, H2), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, B, H2), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H2), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H2), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, B, H), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, B, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, B, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, H4), jnp.float32),
            jax.ShapeDtypeStruct((Tp, B, H4), jnp.float32),
            jax.ShapeDtypeStruct((H, H4), jnp.float32),
            jax.ShapeDtypeStruct((H, H4), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)] * 4,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xw_fw_p, xw_bw_p, mask_fw_p, mask_bw_p, wh_fw, wh_bw,
      hc_fw, hc_bw, bnd_fw, bnd_bw, g_fw_p, g_bw_p)

    zeros_mask = jnp.zeros((T, B), mask_fw_p.dtype)
    return (
        dxw_fw[:T], dxw_bw[:T], zeros_mask, zeros_mask, dwh_fw, dwh_bw
    )


blstm_seq_fused.defvjp(_fused_fwd, _fused_bwd)


def blstm_apply_fused(p, x, lengths, forget_bias=1.0, interpret=None,
                      block_t=32):
    """Trainable drop-in for models.core.blstm_apply via the fused
    dual-direction kernels. x [B, T, D] -> [B, T, 2H]."""
    B, T, _ = x.shape
    mask = (
        jnp.arange(T, dtype=lengths.dtype)[None, :] < lengths[:, None]
    ).astype(jnp.float32)
    xw_fw = (x @ p["fw"]["wx"] + p["fw"]["b"]).swapaxes(0, 1)
    x_rev = jnp.flip(x, axis=1)
    xw_bw = (x_rev @ p["bw"]["wx"] + p["bw"]["b"]).swapaxes(0, 1)
    mask_t = mask.swapaxes(0, 1)
    mask_rev_t = jnp.flip(mask, axis=1).swapaxes(0, 1)
    h_fw, h_bw = blstm_seq_fused(
        xw_fw, xw_bw, mask_t, mask_rev_t,
        p["fw"]["wh"], p["bw"]["wh"],
        forget_bias, interpret, block_t,
    )
    fw = h_fw.swapaxes(0, 1)
    bw = jnp.flip(h_bw.swapaxes(0, 1), axis=1)
    return jnp.concatenate([fw, bw], axis=-1)
