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
together. Per step only the serial-chain matmul (dgates @ wh.T) runs;
the gate recompute and the d(wh) accumulation are batched per time
block as full-M matmuls in VMEM — see ``blstm_seq_fused`` (custom VJP)
and the README performance model.

Mixed precision: everything follows the input dtype (the model's
compute_dtype). In bfloat16 the h carries, outputs, and both matmul
operands are bf16 — MXU-native rate — while gate pre-activations, cell
state c, and all backward accumulations (dwh, dh, dc) stay float32.

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


def _auto_block_t(block_t: int, T: int, B: int) -> int:
    """Time-block size capped so per-block VMEM buffers stay bounded as
    the batch grows (the [bt, B, 4H] blocks scale with B): keep
    bt * B <= 1024 and bt a multiple of 8 (mask-block tiling)."""
    bt = min(block_t, T, max(8, 1024 // max(B, 1)))
    return max(8, (bt // 8) * 8) if T >= 8 else min(bt, T)


def _cell(xw, h, c, wh, m, forget_bias, H):
    """One masked LSTM cell step; returns (h_out, h_next, c_next).

    h is in the compute dtype (matmul operand); gate math and c are
    float32. h_out/h_next are cast back to the compute dtype.
    """
    gates = xw.astype(jnp.float32) + jnp.dot(
        h, wh, preferred_element_type=jnp.float32
    )
    gi = jax.nn.sigmoid(gates[:, :H])
    gf = jax.nn.sigmoid(gates[:, H : 2 * H] + forget_bias)
    gg = jnp.tanh(gates[:, 2 * H : 3 * H])
    go = jax.nn.sigmoid(gates[:, 3 * H :])
    c_new = gf * c + gi * gg
    h_new = (go * jnp.tanh(c_new)).astype(h.dtype)
    h_next = jnp.where(m > 0.5, h_new, h)
    c_next = jnp.where(m > 0.5, c_new, c)
    return h_new, h_next, c_next


def _blstm_kernel(
    xw_fw_ref,  # [BT, B, 4H] forward input projections, block j
    xw_bw_ref,  # [BT, B, 4H] reversed-time projections, block nb-1-j
    mask_fw_ref,  # [BT, B]
    mask_bw_ref,  # [BT, B]
    wh_fw_ref,  # [H, 4H]
    wh_bw_ref,  # [H, 4H]
    out_fw_ref,  # [BT, B, H]
    out_bw_ref,  # [BT, B, H] (in reversed time; host flips back)
    hf_s, cf_s, hb_s, cb_s,  # VMEM carries: h in compute dtype, c f32
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

    def body(i, _):
        mf = mask_fw_ref[i][:, None]
        mb = mask_bw_ref[i][:, None]
        # two independent matmuls per iteration — MXU pipelines them
        h_new_f, hf, cf = _cell(
            xw_fw_ref[i], hf_s[:], cf_s[:], wh_fw_ref[:], mf,
            forget_bias, H,
        )
        h_new_b, hb, cb = _cell(
            xw_bw_ref[i], hb_s[:], cb_s[:], wh_bw_ref[:], mb,
            forget_bias, H,
        )
        hf_s[:] = hf
        cf_s[:] = cf
        hb_s[:] = hb
        cb_s[:] = cb
        out_fw_ref[i] = h_new_f * mf.astype(h_new_f.dtype)
        out_bw_ref[i] = h_new_b * mb.astype(h_new_b.dtype)
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
    """Fused BLSTM forward -> [B, T, 2H] (fw ++ bw), in x's dtype."""
    if interpret is None:
        interpret = not on_tpu()
    B, T, _ = x.shape
    H = params["fw"]["wh"].shape[0]
    H4 = 4 * H
    dt = x.dtype

    mask = (
        jnp.arange(T, dtype=lengths.dtype)[None, :] < lengths[:, None]
    ).astype(jnp.float32)
    xw_fw = (x @ params["fw"]["wx"] + params["fw"]["b"]).swapaxes(0, 1)
    x_rev = jnp.flip(x, axis=1)
    mask_rev = jnp.flip(mask, axis=1)
    xw_bw = (x_rev @ params["bw"]["wx"] + params["bw"]["b"]).swapaxes(0, 1)
    mask_t = mask.swapaxes(0, 1)
    mask_rev_t = mask_rev.swapaxes(0, 1)

    bt = _auto_block_t(block_t, T, B)
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
            jax.ShapeDtypeStruct((Tp, B, H), dt),
            jax.ShapeDtypeStruct((Tp, B, H), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), dt),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), dt),
            pltpu.VMEM((B, H), jnp.float32),
        ],
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
    h_fw_ref, h_bw_ref,  # out [BT, B, H] post-mask carries, compute dtype
    c_fw_ref, c_bw_ref,  # out [BT, B, H] post-mask cell states, f32
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

    def body(i, _):
        mf = mask_fw_ref[i][:, None]
        mb = mask_bw_ref[i][:, None]
        _, hf, cf = _cell(
            xw_fw_ref[i], hf_s[:], cf_s[:], wh_fw_ref[:], mf,
            forget_bias, H,
        )
        _, hb, cb = _cell(
            xw_bw_ref[i], hb_s[:], cb_s[:], wh_bw_ref[:], mb,
            forget_bias, H,
        )
        hf_s[:] = hf
        cf_s[:] = cf
        hb_s[:] = hb
        cb_s[:] = cb
        h_fw_ref[i] = hf
        h_bw_ref[i] = hb
        c_fw_ref[i] = cf
        c_bw_ref[i] = cb
        return 0

    jax.lax.fori_loop(0, block_t, body, 0)


def _bwd_train_kernel(
    xw_fw_ref, xw_bw_ref,  # [BT, B, 4H] (blocks nb-1-j)
    mask_fw_ref, mask_bw_ref,  # [BT, B]
    wh_fw_ref, wh_bw_ref,  # [H, 4H]
    h_fw_ref, h_bw_ref,  # [BT, B, H] compute dtype
    c_fw_ref, c_bw_ref,  # [BT, B, H] f32
    bhnd_fw_ref, bhnd_bw_ref,  # [1, B, H] block entry h carries
    bcnd_fw_ref, bcnd_bw_ref,  # [1, B, H] block entry c carries
    g_fw_ref, g_bw_ref,  # [BT, B, H] cotangents of masked outputs
    dxw_fw_ref, dxw_bw_ref,  # out [BT, B, 4H] compute dtype
    dwh_fw_ref, dwh_bw_ref,  # out [H, 4H] f32 accumulated over blocks
    dhf_s, dcf_s, dhb_s, dcb_s,  # [B, H] f32 carry scratches
    gates_fw_s, gates_bw_s,  # [BT, B, 4H] f32 scratch
    hprev_fw_s, hprev_bw_s,  # [BT, B, H] compute-dtype scratch
    *,
    block_t: int,
    forget_bias: float,
):
    """Only the serial-chain matmul (dgates @ wh.T) runs per step. The
    two off-chain matmuls are batched at BLOCK granularity in VMEM —
    one M=block_t*B full-utilization matmul each instead of block_t
    small-M weight-streaming matmuls, with no extra HBM traffic:

      gates  (pre-loop):  [BT*B, H] @ [H, 4H] from the stored carries
      dwh    (post-loop): [H, BT*B] @ [BT*B, 4H] over the dgates output
    """

    @pl.when(pl.program_id(0) == 0)
    def _():
        dhf_s[:] = jnp.zeros_like(dhf_s)
        dcf_s[:] = jnp.zeros_like(dcf_s)
        dhb_s[:] = jnp.zeros_like(dhb_s)
        dcb_s[:] = jnp.zeros_like(dcb_s)
        dwh_fw_ref[:] = jnp.zeros_like(dwh_fw_ref)
        dwh_bw_ref[:] = jnp.zeros_like(dwh_bw_ref)

    H = wh_fw_ref.shape[0]
    H4 = 4 * H
    cdt = dxw_fw_ref.dtype
    BT = block_t
    B = dhf_s.shape[0]

    def prep(xw_ref, wh_ref, h_ref, bhnd_ref, gates_s, hprev_s):
        # h_prev for every step of the block: block-entry carry then
        # the stored post-mask carries shifted by one
        hprev_s[0:1] = bhnd_ref[:]
        if BT > 1:
            hprev_s[1:] = h_ref[: BT - 1]
        hp = hprev_s[:].reshape(BT * B, H)
        gates = jnp.dot(hp, wh_ref[:], preferred_element_type=jnp.float32)
        gates_s[:] = (
            xw_ref[:].astype(jnp.float32) + gates.reshape(BT, B, H4)
        )

    prep(xw_fw_ref, wh_fw_ref, h_fw_ref, bhnd_fw_ref,
         gates_fw_s, hprev_fw_s)
    prep(xw_bw_ref, wh_bw_ref, h_bw_ref, bhnd_bw_ref,
         gates_bw_s, hprev_bw_s)

    def direction(i, gates_s, mask_ref, wh_ref, c_ref,
                  bcnd_ref, g_ref, dxw_ref, dh_s, dc_s):
        m = mask_ref[i][:, None]
        c_prev = jnp.where(i > 0, c_ref[jnp.maximum(i - 1, 0)], bcnd_ref[0])
        gates = gates_s[i]
        gi = jax.nn.sigmoid(gates[:, :H])
        gf = jax.nn.sigmoid(gates[:, H : 2 * H] + forget_bias)
        gg = jnp.tanh(gates[:, 2 * H : 3 * H])
        go = jax.nn.sigmoid(gates[:, 3 * H :])
        c_t = c_ref[i]
        tanh_c = jnp.tanh(c_t)
        dh_total = g_ref[i].astype(jnp.float32) * m + dh_s[:]
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
        dgates_c = dgates.astype(cdt)
        dxw_ref[i] = dgates_c
        dh_prev = jnp.dot(
            dgates_c, wh_ref[:].T, preferred_element_type=jnp.float32
        )
        dh_s[:] = dh_prev + jnp.where(m > 0.5, 0.0, dh_total)
        dc_s[:] = dc_new * gf + jnp.where(m > 0.5, 0.0, dc_s[:])

    def body(k, _):
        i = block_t - 1 - k
        direction(i, gates_fw_s, mask_fw_ref, wh_fw_ref,
                  c_fw_ref, bcnd_fw_ref, g_fw_ref,
                  dxw_fw_ref, dhf_s, dcf_s)
        direction(i, gates_bw_s, mask_bw_ref, wh_bw_ref,
                  c_bw_ref, bcnd_bw_ref, g_bw_ref,
                  dxw_bw_ref, dhb_s, dcb_s)
        return 0

    jax.lax.fori_loop(0, block_t, body, 0)

    def accum_dwh(hprev_s, dxw_ref, dwh_ref):
        hp = hprev_s[:].reshape(BT * B, H)
        dg = dxw_ref[:].reshape(BT * B, H4)
        dwh_ref[:] += jnp.dot(
            hp.T, dg, preferred_element_type=jnp.float32
        )

    accum_dwh(hprev_fw_s, dxw_fw_ref, dwh_fw_ref)
    accum_dwh(hprev_bw_s, dxw_bw_ref, dwh_bw_ref)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def blstm_seq_fused(
    xw_fw, xw_bw, mask_fw, mask_bw, wh_fw, wh_bw,
    forget_bias=1.0, interpret=None, block_t=32,
):
    """Trainable fused BLSTM recurrence over precomputed projections.

    All arrays time-major; the bw arrays are in the bw direction's own
    (flipped) time order. Returns (h_fw [T,B,H], h_bw [T,B,H]) masked
    outputs in xw's dtype, bw in flipped order (caller un-flips and
    concatenates).
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
    dt = xw_fw.dtype
    bt = _auto_block_t(block_t, T, B)
    pad = (-T) % bt

    def pad_t(a):
        if pad:
            return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
        return a

    xw_fw_p, xw_bw_p = pad_t(xw_fw), pad_t(xw_bw)
    mask_fw_p, mask_bw_p = pad_t(mask_fw), pad_t(mask_bw)
    Tp = xw_fw_p.shape[0]
    nb = Tp // bt

    h_fw, h_bw, c_fw, c_bw = pl.pallas_call(
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
            pl.BlockSpec((bt, B, H), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, B, H), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, B, H), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, B, H), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, H), dt),
            jax.ShapeDtypeStruct((Tp, B, H), dt),
            jax.ShapeDtypeStruct((Tp, B, H), jnp.float32),
            jax.ShapeDtypeStruct((Tp, B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), dt),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), dt),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xw_fw_p, xw_bw_p, mask_fw_p, mask_bw_p, wh_fw, wh_bw)

    mask_fw_c = mask_fw[:, :, None].astype(dt)
    mask_bw_c = mask_bw[:, :, None].astype(dt)
    out = (h_fw[:T] * mask_fw_c, h_bw[:T] * mask_bw_c)
    residuals = (
        xw_fw_p, xw_bw_p, mask_fw_p, mask_bw_p, wh_fw, wh_bw,
        h_fw, h_bw, c_fw, c_bw, T, bt,
    )
    return out, residuals


def _fused_bwd(forget_bias, interpret, block_t, residuals, g):
    """Backward: only the serial-chain matmul (dgates @ wh.T) runs per
    timestep; the gate recompute and the dwh accumulation are batched
    at block granularity INSIDE the kernel (see _bwd_train_kernel) —
    full-M MXU matmuls from VMEM with no extra HBM traffic, so the
    scheme wins at every batch size (earlier variants measured: per-
    step dwh accumulation lost ~16% at B=32; hoisting to a whole-T HBM
    einsum lost a few % at B=128 from the extra pass over h; streaming
    precomputed f32 gate preactivations from HBM was slower still).

    Exact: dgates is zero at masked/padded steps (dh_new and dc_new are
    mask-gated), so padded-tail terms of the dwh sum vanish, and the
    block gate recompute uses the same stored post-mask carries the
    per-step recompute used."""
    if interpret is None:
        interpret = not on_tpu()
    (xw_fw_p, xw_bw_p, mask_fw_p, mask_bw_p, wh_fw, wh_bw,
     h_fw, h_bw, c_fw, c_bw, T, bt) = residuals
    g_fw, g_bw = g
    Tp, B, H = h_fw.shape
    H4 = 4 * H
    dt = xw_fw_p.dtype
    nb = Tp // bt
    pad = Tp - T

    def pad_t(a):
        if pad:
            return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
        return a

    g_fw_p, g_bw_p = pad_t(g_fw), pad_t(g_bw)

    def boundary(a):
        return jnp.concatenate(
            [jnp.zeros((1, B, H), a.dtype), a[bt - 1 :: bt][: nb - 1]],
            axis=0,
        )

    bhnd_fw, bhnd_bw = boundary(h_fw), boundary(h_bw)
    bcnd_fw, bcnd_bw = boundary(c_fw), boundary(c_bw)

    rev = lambda j, nb=nb: (nb - 1 - j, 0, 0)
    rev2 = lambda j, nb=nb: (nb - 1 - j, 0)
    blk3 = lambda shape: pl.BlockSpec(shape, rev, memory_space=pltpu.VMEM)
    wh_spec = pl.BlockSpec((H, H4), lambda j: (0, 0),
                           memory_space=pltpu.VMEM)
    dxw_fw, dxw_bw, dwh_fw, dwh_bw = pl.pallas_call(
        functools.partial(
            _bwd_train_kernel, block_t=bt, forget_bias=forget_bias
        ),
        grid=(nb,),
        in_specs=[
            blk3((bt, B, H4)),
            blk3((bt, B, H4)),
            pl.BlockSpec((bt, B), rev2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, B), rev2, memory_space=pltpu.VMEM),
            wh_spec,
            wh_spec,
            blk3((bt, B, H)),
            blk3((bt, B, H)),
            blk3((bt, B, H)),
            blk3((bt, B, H)),
            blk3((1, B, H)),
            blk3((1, B, H)),
            blk3((1, B, H)),
            blk3((1, B, H)),
            blk3((bt, B, H)),
            blk3((bt, B, H)),
        ],
        out_specs=[
            blk3((bt, B, H4)),
            blk3((bt, B, H4)),
            wh_spec,
            wh_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, H4), dt),
            jax.ShapeDtypeStruct((Tp, B, H4), dt),
            jax.ShapeDtypeStruct((H, H4), jnp.float32),
            jax.ShapeDtypeStruct((H, H4), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((B, H), jnp.float32)] * 4
            + [pltpu.VMEM((bt, B, H4), jnp.float32)] * 2
            + [pltpu.VMEM((bt, B, H), dt)] * 2
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xw_fw_p, xw_bw_p, mask_fw_p, mask_bw_p, wh_fw, wh_bw,
      h_fw, h_bw, c_fw, c_bw, bhnd_fw, bhnd_bw, bcnd_fw, bcnd_bw,
      g_fw_p, g_bw_p)

    zeros_mask = jnp.zeros((T, B), mask_fw_p.dtype)
    return (
        dxw_fw[:T], dxw_bw[:T], zeros_mask, zeros_mask,
        dwh_fw.astype(wh_fw.dtype), dwh_bw.astype(wh_bw.dtype),
    )


blstm_seq_fused.defvjp(_fused_fwd, _fused_bwd)


def blstm_apply_fused(p, x, lengths, forget_bias=1.0, interpret=None,
                      block_t=32):
    """Trainable drop-in for models.core.blstm_apply via the fused
    dual-direction kernels. x [B, T, D] -> [B, T, 2H] in x's dtype."""
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
