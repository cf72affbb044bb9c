"""Fused Pallas RNN-T joint+loss kernel.

The unfused path (models/transducer.py + ops/transducer.py) materializes
the joint lattice twice per step in HBM: tanh activations [B, T, U+1, J]
(the largest tensor in the whole training step) and logits
[B, T, U+1, V], then streams both again in the backward pass. Here the
joint network and the lattice DP fuse into two kernels that walk time
frame by frame with everything per-frame resident in VMEM:

- forward: per frame t, compute hidden = tanh(enc_proj[t] + pred_proj)
  [B, U+1, J] and logits = hidden @ W_o + b_o [B, U+1, V] on the MXU,
  reduce to blank/emit log-probs, and advance the alpha row [B, U+1]
  with the same cumsum + prefix-logsumexp closed form as the oracle
  (ops/transducer.py) — lane-axis prefixes run as log2(U) masked-roll
  steps on the VPU. Only alpha and lp_blank rows ([T, B, U+1] f32, tiny)
  go to HBM.
- backward: walk t in reverse carrying the beta row, recompute the joint
  (no residuals beyond alpha), and emit the analytic gradient
  d(-ll)/dlogits = gb*(softmax - 1_blank) + ge*(softmax - 1_emit) with
  gb/ge the blank/emit transition occupancies; backprop through the
  tanh and the two projections on the fly, accumulating dpred_proj /
  dW_o / db_o in VMEM scratch across the whole scan and streaming
  denc_proj per frame.

HBM traffic drops from O(B*T*U*(J+V)) to O(B*T*(J+U)) — the lattice
never exists off-chip. Oracle: ops/transducer.transducer_loss applied
to the jnp joint (tested value- and gradient-exact in
tests/test_pallas_kernels.py::TestTransducerFused).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nabu_tpu.ops.pallas import on_tpu
from nabu_tpu.ops.transducer import NEG

_VMEM_LIMIT = 100 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _shift_right(x, k, fill):
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lanes >= k, pltpu.roll(x, k, axis=x.ndim - 1), fill)


def _shift_left(x, k, fill):
    L = x.shape[-1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(
        lanes < L - k, pltpu.roll(x, L - k, axis=x.ndim - 1), fill
    )


def _prefix_sum(x):
    """Inclusive prefix sum along lanes (log-step rolls)."""
    k = 1
    while k < x.shape[-1]:
        x = x + _shift_right(x, k, 0.0)
        k *= 2
    return x


def _prefix_lse(x):
    """Inclusive prefix logsumexp along lanes."""
    k = 1
    while k < x.shape[-1]:
        x = jnp.logaddexp(x, _shift_right(x, k, NEG * 4))
        k *= 2
    return x


def _suffix_lse(x):
    """Inclusive suffix (reverse prefix) logsumexp along lanes."""
    k = 1
    while k < x.shape[-1]:
        x = jnp.logaddexp(x, _shift_left(x, k, NEG * 4))
        k *= 2
    return x


def _joint_rows(encp_st, predp, w, b, onehot, umask, blank_id):
    """``st`` frames of the joint, BATCHED OFF THE DP CHAIN: returns
    (h [st,B,U1p,Jp] bf16, lp [st,B,U1p,Vp] f32, lp_blank [st,B,U1p],
    lp_emit [st,B,U1p]).

    Only the prefix-logsumexp alpha/beta recurrence is truly serial in
    the transducer; the joint (tanh + [.,Jp]x[Jp,Vp] matmul + softmax)
    per frame is not. Computing it per frame inside the DP loop
    serializes MXU work behind VPU work and runs the matmul at
    M = B*U1p; batching ``st`` frames runs one M = st*B*U1p matmul per
    sub-block with the DP loop consuming precomputed lp rows — the
    same block-batching that won +24% in the BLSTM backward
    (README performance model). Roofline (tools/roofline.py) measured
    the per-frame variant at ~16% of attainable with the gap exactly
    here."""
    st, B, Jp = encp_st.shape
    U1p = predp.shape[1]
    x = encp_st[:, :, None, :] + predp[None]  # [st, B, U1p, Jp]
    h = jnp.tanh(x)
    logits = jax.lax.dot_general(
        h.reshape(st * B * U1p, Jp), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b  # [st*B*U1p, Vp]; padded V lanes carry NEG bias
    m = jnp.max(logits, axis=-1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True))
    lp = (logits - lse).reshape(st, B, U1p, -1)
    lp_blank = lp[..., blank_id]
    lp_emit = jnp.where(
        umask[None] > 0.5, jnp.sum(lp * onehot[None], axis=-1), NEG
    )
    return h, lp, lp_blank, lp_emit


def _fwd_kernel(
    encp_ref,  # [bt, B, Jp] bf16 (time block)
    predp_ref,  # [B, U1p, Jp] bf16
    w_ref,  # [Jp, Vp] bf16
    b_ref,  # [1, Vp] f32 (NEG at padded V lanes)
    onehot_ref,  # [B, U1p, Vp] f32 target one-hots
    umask_ref,  # [B, U1p] f32 (1 while u < target_len)
    tlen_ref,  # [B, 1] f32
    alpha_out_ref,  # [bt, B, U1p] f32
    lpb_out_ref,  # [bt, B, U1p] f32
    alpha_s,  # VMEM [B, U1p] f32
    lpb_s,  # VMEM [B, U1p] f32
    lpb_sub_s,  # VMEM [sub_t, B, U1p] f32
    lpe_sub_s,  # VMEM [sub_t, B, U1p] f32
    *,
    block_t: int,
    blank_id: int,
    sub_t: int,
):
    j = pl.program_id(0)
    tlen = tlen_ref[:]  # [B, 1]

    @pl.when(j == 0)
    def _():
        # TPU VMEM scratch is uninitialized; lanes that never take a
        # valid step (tlen == 0 fill rows) must still emit finite
        # alphas or their (masked) nll could NaN-poison the loss sum
        alpha_s[:] = jnp.full_like(alpha_s, NEG)
        lpb_s[:] = jnp.zeros_like(lpb_s)

    def sub_body(s, _):
        base = s * sub_t
        # joint for sub_t frames in one batched matmul, off the chain.
        # The rows go through VMEM scratch: Mosaic supports dynamic
        # scalar indexing on REFS but not on loop values.
        _, _, lpb_sub, lpe_sub = _joint_rows(
            encp_ref[pl.ds(base, sub_t)], predp_ref[:], w_ref[:],
            b_ref[:], onehot_ref[:], umask_ref[:], blank_id,
        )
        lpb_sub_s[:] = lpb_sub
        lpe_sub_s[:] = lpe_sub

        def body(i, _):
            t = j * block_t + base + i
            lp_blank = lpb_sub_s[i]
            lp_emit = lpe_sub_s[i]
            # e[u] = lp_emit[u-1], e[0] = 0 (cumsum offset only)
            e = _shift_right(lp_emit, 1, 0.0)
            E = _prefix_sum(e)
            first = jnp.maximum(E, NEG)  # alpha at t = 0
            base_row = alpha_s[:] + lpb_s[:]
            trans = jnp.maximum(E + _prefix_lse(base_row - E), NEG)
            is_first = jnp.full(first.shape, t == 0, dtype=bool)
            new = jnp.where(is_first, first, trans)
            valid = tlen > t  # [B, 1] row mask; freeze finished lanes
            new = jnp.where(valid, new, alpha_s[:])
            new_lpb = jnp.where(valid, lp_blank, lpb_s[:])
            alpha_s[:] = new
            lpb_s[:] = new_lpb
            alpha_out_ref[base + i] = new
            lpb_out_ref[base + i] = new_lpb
            return 0

        jax.lax.fori_loop(0, sub_t, body, 0)
        return 0

    jax.lax.fori_loop(0, block_t // sub_t, sub_body, 0)


def _bwd_kernel(
    encp_ref,  # [bt, B, Jp] bf16 (reverse-ordered blocks)
    predp_ref,  # [B, U1p, Jp] bf16
    w_ref,  # [Jp, Vp] bf16
    b_ref,  # [1, Vp] f32
    onehot_ref,  # [B, U1p, Vp] f32
    umask_ref,  # [B, U1p] f32
    tlen_ref,  # [B, 1] f32
    beta_init_ref,  # [B, U1p] f32 (0 at u == target_len, NEG else)
    alpha_ref,  # [bt, B, U1p] f32
    gll_ref,  # [B, 1] f32: upstream grad / ll combo: g_b, and ll
    ll_ref,  # [B, 1] f32
    denc_out_ref,  # [bt, B, Jp] f32
    dpred_out_ref,  # [B, U1p, Jp] f32 (written every block, final wins)
    dw_out_ref,  # [Jp, Vp] f32
    db_out_ref,  # [B, Vp] f32 (per-sublane partial sums)
    beta_s,  # VMEM [B, U1p] f32
    dpred_s,  # VMEM [B, U1p, Jp] f32
    dw_s,  # VMEM [Jp, Vp] f32
    db_s,  # VMEM [B, Vp] f32
    lpb_sub_s,  # VMEM [sub_t, B, U1p] f32
    lpe_sub_s,  # VMEM [sub_t, B, U1p] f32
    gb_sub_s,  # VMEM [sub_t, B, U1p] f32
    ge_sub_s,  # VMEM [sub_t, B, U1p] f32
    *,
    block_t: int,
    blank_id: int,
    sub_t: int,
):
    j = pl.program_id(0)
    nprog = pl.num_programs(0)
    tlen = tlen_ref[:]  # [B, 1]
    ll = ll_ref[:]  # [B, 1]
    g = gll_ref[:]  # [B, 1] upstream gradient of the per-example nll

    @pl.when(j == 0)
    def _():
        beta_s[:] = jnp.full_like(beta_s, NEG)
        dpred_s[:] = jnp.zeros_like(dpred_s)
        dw_s[:] = jnp.zeros_like(dw_s)
        db_s[:] = jnp.zeros_like(db_s)

    B, U1p, Jp = predp_ref.shape

    def sub_body(sk, _):
        # sub-blocks walk backward through the time block
        base = (block_t // sub_t - 1 - sk) * sub_t
        # phase A (batched, off-chain): recompute the joint for sub_t
        # frames in one matmul
        h, lp, lpb_sub, lpe_sub = _joint_rows(
            encp_ref[pl.ds(base, sub_t)], predp_ref[:], w_ref[:],
            b_ref[:], onehot_ref[:], umask_ref[:], blank_id,
        )
        # rows through VMEM scratch: Mosaic supports dynamic scalar
        # indexing on REFS but not on loop values
        lpb_sub_s[:] = lpb_sub
        lpe_sub_s[:] = lpe_sub

        # phase B (serial): beta recurrence over the sub_t frames in
        # reverse, collecting the blank/emit occupancies per frame
        def body(k, _):
            i = sub_t - 1 - k
            t = (nprog - 1 - j) * block_t + base + i
            lp_blank = lpb_sub_s[i]
            lp_emit = lpe_sub_s[i]
            # beta[t+1] row: the carry, except the termination row at
            # the lane's final frame
            at_final = tlen - 1 <= t  # [B,1] (== valid t, < past)
            beta_next = jnp.where(at_final, beta_init_ref[:], beta_s[:])
            # closed-form reverse u-recurrence:
            # beta[u] = lse_{k>=u}( v[k] + sum_{j=u..k-1} e2[j] );
            # e2 is zeroed (not NEG) at invalid u — any path crossing
            # an invalid emission already dies through v[k>U_b] = NEG
            v = lp_blank + beta_next
            e2 = jnp.where(umask_ref[:] > 0.5, lp_emit, 0.0)
            S = _prefix_sum(_shift_right(e2, 1, 0.0))  # excl. prefix
            new_beta = jnp.maximum(-S + _suffix_lse(v + S), NEG)
            beta_shift = _shift_left(new_beta, 1, NEG)  # beta[t, u+1]

            alpha = alpha_ref[base + i]
            # transition occupancies (clamped exponents, masked past
            # length)
            t_ok = tlen > t  # [B, 1]
            gb = jnp.exp(
                jnp.minimum(alpha + lp_blank + beta_next - ll, 0.0)
            )
            ge = jnp.exp(
                jnp.minimum(alpha + lp_emit + beta_shift - ll, 0.0)
            )
            gb = jnp.where(t_ok, gb, 0.0) * g
            ge = jnp.where(t_ok, ge, 0.0) * g
            gb_sub_s[i] = gb
            ge_sub_s[i] = ge
            beta_s[:] = jnp.where(t_ok, new_beta, beta_s[:])
            return 0

        jax.lax.fori_loop(0, sub_t, body, 0)
        gb_sub = gb_sub_s[:]
        ge_sub = ge_sub_s[:]

        # phase C (batched): gradients for the whole sub-block.
        # dlogits = gb*(sm - 1_blank) + ge*(sm - 1_emit) [loss = -ll]
        sm = jnp.exp(lp)  # [sub_t, B, U1p, Vp]
        gsum = gb_sub + ge_sub  # [sub_t, B, U1p]
        lanes = jax.lax.broadcasted_iota(jnp.int32, sm.shape, 3)
        blank_onehot = (lanes == blank_id).astype(jnp.float32)
        dlogits = (
            gsum[..., None] * sm
            - gb_sub[..., None] * blank_onehot
            - ge_sub[..., None] * onehot_ref[:][None]
        )  # [sub_t, B, U1p, Vp] f32

        # backprop through the joint — one matmul pair per sub-block
        d2 = dlogits.reshape(sub_t * B * U1p, -1).astype(jnp.bfloat16)
        dh = jax.lax.dot_general(
            d2, w_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(sub_t, B, U1p, Jp)
        hf = h.astype(jnp.float32)
        dx = (1.0 - hf * hf) * dh  # [sub_t, B, U1p, Jp] f32
        denc_out_ref[pl.ds(base, sub_t)] = jnp.sum(dx, axis=2)
        dpred_s[:] = dpred_s[:] + jnp.sum(dx, axis=0)
        dw_s[:] = dw_s[:] + jax.lax.dot_general(
            h.reshape(sub_t * B * U1p, Jp), d2,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db_s[:] = db_s[:] + jnp.sum(dlogits, axis=(0, 2))
        return 0

    jax.lax.fori_loop(0, block_t // sub_t, sub_body, 0)
    dpred_out_ref[:] = dpred_s[:]
    dw_out_ref[:] = dw_s[:]
    db_out_ref[:] = db_s[:]


def _prepare(enc_proj, pred_proj, w_out, b_out, targets, target_lengths):
    """Pad every axis to TPU tiles; build one-hots and masks."""
    B, T, J = enc_proj.shape
    U1 = pred_proj.shape[1]
    V = w_out.shape[1]
    Jp, Vp, U1p = _round_up(J, 128), _round_up(V, 128), _round_up(U1, 128)
    Bp = _round_up(B, 8)

    cdt = jnp.bfloat16
    encp = jnp.zeros((T, Bp, Jp), cdt)
    encp = encp.at[:, :B, :J].set(enc_proj.swapaxes(0, 1).astype(cdt))
    predp = jnp.zeros((Bp, U1p, Jp), cdt)
    predp = predp.at[:B, :U1, :J].set(pred_proj.astype(cdt))
    w = jnp.zeros((Jp, Vp), cdt).at[:J, :V].set(w_out.astype(cdt))
    b = jnp.full((1, Vp), NEG, jnp.float32).at[0, :V].set(
        b_out.astype(jnp.float32)
    )

    U = U1 - 1
    tgt = jnp.zeros((Bp, U1p), jnp.int32)
    if U > 0:
        tgt = tgt.at[:B, :U].set(targets.astype(jnp.int32))
    onehot = jax.nn.one_hot(tgt, Vp, dtype=jnp.float32)
    umask = jnp.zeros((Bp, U1p), jnp.float32)
    umask = umask.at[:B].set(
        (
            jnp.arange(U1p)[None, :] < target_lengths[:, None]
        ).astype(jnp.float32)
    )
    return encp, predp, w, b, onehot, umask, Bp, U1p, Jp, Vp


def _effective_sub_t(sub_t: int, bt: int) -> int:
    """Largest divisor of bt that is <= sub_t (sub-blocks must tile
    the time block exactly)."""
    st = max(1, min(sub_t, bt))
    while bt % st:
        st -= 1
    return st


def _run_forward(encp, predp, w, b, onehot, umask, tlen, interpret,
                 block_t, blank_id, sub_t):
    T, Bp, Jp = encp.shape
    U1p = predp.shape[1]
    bt = min(block_t, T)
    pad = (-T) % bt
    encp_p = jnp.pad(encp, ((0, pad), (0, 0), (0, 0))) if pad else encp
    Tp = encp_p.shape[0]
    nb = Tp // bt

    alphas, lpbs = pl.pallas_call(
        functools.partial(_fwd_kernel, block_t=bt, blank_id=blank_id,
                          sub_t=_effective_sub_t(sub_t, bt)),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bt, Bp, Jp), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, U1p, Jp), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Jp, w.shape[1]), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b.shape[1]), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, U1p, onehot.shape[2]), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, U1p), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt, Bp, U1p), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, Bp, U1p), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Tp, Bp, U1p), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Bp, U1p), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Bp, U1p), jnp.float32),
            pltpu.VMEM((Bp, U1p), jnp.float32),
            pltpu.VMEM((_effective_sub_t(sub_t, bt), Bp, U1p),
                       jnp.float32),
            pltpu.VMEM((_effective_sub_t(sub_t, bt), Bp, U1p),
                       jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(encp_p, predp, w, b, onehot, umask, tlen)
    return alphas, lpbs, encp_p, nb, bt


def _fused_fwd(enc_proj, pred_proj, w_out, b_out, logit_lengths, targets,
               target_lengths, blank_id, interpret, block_t, sub_t):
    if interpret is None:
        interpret = not on_tpu()
    B, T, J = enc_proj.shape
    (encp, predp, w, b, onehot, umask,
     Bp, U1p, Jp, Vp) = _prepare(
        enc_proj, pred_proj, w_out, b_out, targets, target_lengths
    )
    tlen = jnp.zeros((Bp, 1), jnp.float32).at[:B, 0].set(
        logit_lengths.astype(jnp.float32)
    )
    alphas, lpbs, encp_p, nb, bt = _run_forward(
        encp, predp, w, b, onehot, umask, tlen, interpret, block_t,
        blank_id, sub_t,
    )
    # ll = alpha[t_last, U_b] + lp_blank[t_last, U_b]
    t_last = jnp.maximum(logit_lengths.astype(jnp.int32) - 1, 0)
    rows_a = alphas[t_last, jnp.arange(B)]  # [B, U1p]
    rows_b = lpbs[t_last, jnp.arange(B)]
    u_fin = target_lengths.astype(jnp.int32)[:, None]
    ll = (
        jnp.take_along_axis(rows_a, u_fin, axis=1)
        + jnp.take_along_axis(rows_b, u_fin, axis=1)
    )[:, 0]
    nll = -ll
    # residuals hold the ORIGINAL (unpadded) inputs — padding is cheap
    # to redo in the backward and static dims stay Python ints
    res = (
        enc_proj, pred_proj, w_out, b_out, logit_lengths, targets,
        target_lengths, alphas, ll,
    )
    return nll, res


def _fused_bwd(blank_id, interpret, block_t, sub_t, res, g):
    if interpret is None:
        interpret = not on_tpu()
    (enc_proj, pred_proj, w_out, b_out, logit_lengths, targets,
     target_lengths, alphas, ll) = res
    B, T, J = enc_proj.shape
    U1 = pred_proj.shape[1]
    V = w_out.shape[1]
    (encp, predp, w, b, onehot, umask,
     Bp, U1p, Jp, Vp) = _prepare(
        enc_proj, pred_proj, w_out, b_out, targets, target_lengths
    )
    tlen = jnp.zeros((Bp, 1), jnp.float32).at[:B, 0].set(
        logit_lengths.astype(jnp.float32)
    )
    bt = min(block_t, T)
    pad = (-T) % bt
    encp_p = jnp.pad(encp, ((0, pad), (0, 0), (0, 0))) if pad else encp
    nb = encp_p.shape[0] // bt

    beta_init = jnp.where(
        jnp.arange(U1p)[None, :]
        == jnp.pad(target_lengths.astype(jnp.int32), (0, Bp - B))[:, None],
        0.0,
        NEG,
    ).astype(jnp.float32)
    ll_pad = jnp.zeros((Bp, 1), jnp.float32).at[:B, 0].set(ll)
    g_pad = jnp.zeros((Bp, 1), jnp.float32).at[:B, 0].set(
        g.astype(jnp.float32)
    )
    # infeasible lattices (ll ~ NEG) get zero gradients
    g_pad = jnp.where(ll_pad > NEG / 2, g_pad, 0.0)

    denc, dpred, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, block_t=bt, blank_id=blank_id,
                          sub_t=_effective_sub_t(sub_t, bt)),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bt, Bp, Jp), lambda j, nb=nb: (nb - 1 - j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, U1p, Jp), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Jp, Vp), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, U1p, Vp), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, U1p), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, U1p), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, Bp, U1p), lambda j, nb=nb: (nb - 1 - j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt, Bp, Jp), lambda j, nb=nb: (nb - 1 - j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, U1p, Jp), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Jp, Vp), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, Vp), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb * bt, Bp, Jp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, U1p, Jp), jnp.float32),
            jax.ShapeDtypeStruct((Jp, Vp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Vp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Bp, U1p), jnp.float32),
            pltpu.VMEM((Bp, U1p, Jp), jnp.float32),
            pltpu.VMEM((Jp, Vp), jnp.float32),
            pltpu.VMEM((Bp, Vp), jnp.float32),
            pltpu.VMEM((_effective_sub_t(sub_t, bt), Bp, U1p),
                       jnp.float32),
            pltpu.VMEM((_effective_sub_t(sub_t, bt), Bp, U1p),
                       jnp.float32),
            pltpu.VMEM((_effective_sub_t(sub_t, bt), Bp, U1p),
                       jnp.float32),
            pltpu.VMEM((_effective_sub_t(sub_t, bt), Bp, U1p),
                       jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(encp_p, predp, w, b, onehot, umask, tlen, beta_init, alphas,
      g_pad, ll_pad)

    return (
        denc[:T, :B, :J].swapaxes(0, 1).astype(enc_proj.dtype),
        dpred[:B, :U1, :J].astype(pred_proj.dtype),
        dw[:J, :V].astype(w_out.dtype),
        jnp.sum(db, axis=0)[:V].astype(b_out.dtype),
        None,
        None,
        None,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _transducer_fused(enc_proj, pred_proj, w_out, b_out, logit_lengths,
                      targets, target_lengths, blank_id, interpret,
                      block_t, sub_t):
    nll, _ = _fused_fwd(
        enc_proj, pred_proj, w_out, b_out, logit_lengths, targets,
        target_lengths, blank_id, interpret, block_t, sub_t,
    )
    return nll


_transducer_fused.defvjp(_fused_fwd, _fused_bwd)


def transducer_loss_fused(
    enc_proj: jnp.ndarray,  # [B, T, J] (joint_enc @ encoded + bias)
    pred_proj: jnp.ndarray,  # [B, U+1, J] (joint_pred @ pred + bias)
    w_out: jnp.ndarray,  # [J, V] output projection
    b_out: jnp.ndarray,  # [V]
    logit_lengths: jnp.ndarray,  # [B]
    targets: jnp.ndarray,  # [B, U]
    target_lengths: jnp.ndarray,  # [B]
    blank_id: int | None = None,
    interpret: bool | None = None,
    block_t: int = 32,
    sub_t: int = 4,
) -> jnp.ndarray:
    """Per-example RNN-T NLL with the joint network fused into the
    lattice DP (no [B,T,U,V] or [B,T,U,J] tensors ever reach HBM).
    blank defaults to the last output index.

    ``sub_t`` batches the joint (tanh + output matmul + softmax) over
    that many frames per sub-block, off the serial DP chain — only the
    prefix-logsumexp recurrence stays per-frame. A/B on the chip
    (quiet host, B=32 T'=250 U=100 J=320 V=32, fwd+bwd, overhead
    subtracted): sub_t 1 -> 5.76 ms, 2 -> 5.64, 4 -> 5.41;
    block_t 64 + sub_t 8 -> 5.29 (kept at the safe 32/4 default —
    the tail of the gain is small and bigger blocks scale VMEM with
    B). The kernel is VPU-elementwise-bound after batching (softmax +
    emit-gather + dlogits passes over the padded V lanes), not
    matmul-serialization-bound; see BENCH_extra/roofline.json.

    The backward keeps a [B, U+1, J] f32 gradient accumulator plus
    sub_t frames of f32 intermediates fully VMEM-resident; configs
    whose working set would blow the VMEM budget (huge batch x long
    targets x wide joint) first shrink sub_t, then fall back to the
    rematerialized-lattice oracle path at trace time rather than
    failing to compile.
    """
    V = w_out.shape[1]
    if blank_id is None:
        blank_id = V - 1
    blank_id = blank_id % V

    B, _, J = enc_proj.shape
    U1 = pred_proj.shape[1]
    Bp, U1p = _round_up(B, 8), _round_up(U1, 128)
    Jp, Vp = _round_up(J, 128), _round_up(V, 128)

    def _est(st):
        # dominant backward working set, all [Bp,U1p,·]: dpred scratch
        # + dpred output + predp input (bf16) + one-hot table, plus
        # per-sub-block batched intermediates (h bf16, dx f32 — dh
        # fuses into it — and lp/sm/dlogits f32 over Vp lanes)
        return Bp * U1p * (
            Jp * (4 + 4 + 2) + Vp * 4
            + st * (Jp * (2 + 4) + Vp * 12)
        )

    sub_t = max(1, sub_t)
    while sub_t > 1 and _est(sub_t) > 80 * 1024 * 1024:
        sub_t //= 2
    if _est(sub_t) > 80 * 1024 * 1024:
        from nabu_tpu.ops.transducer import transducer_loss

        def lattice(e, p, w_, b_):
            hidden = jnp.tanh(e[:, :, None, :] + p[:, None, :, :])
            return jax.lax.dot_general(
                hidden, w_,
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b_

        logits = jax.checkpoint(lattice)(enc_proj, pred_proj, w_out, b_out)
        return transducer_loss(
            logits, logit_lengths, targets, target_lengths, blank_id
        )

    return _transducer_fused(
        enc_proj, pred_proj, w_out, b_out, logit_lengths, targets,
        target_lengths, blank_id, interpret, block_t, sub_t,
    )
