"""Batch-vectorized Pallas CTC kernels (v2 of ops/pallas/ctc.py).

The v1 kernel runs one grid program per batch element, serializing
B x T tiny DP steps. Here the whole batch advances together: alpha /
beta live as [B, S] tiles (batch on sublanes, extended labels on
lanes), each kernel walks T in pipelined time blocks, and the DP's
shifts/logsumexp are [B, S] vector ops — a T-step loop instead of
B x T. Per-example lengths become elementwise row masks.

Forward kernel streams alpha rows to HBM; the log-likelihood gather
happens in plain JAX between the kernels; the backward kernel walks
time in reverse (boundary lp rows precomputed per block) and emits
posteriors. The custom VJP reuses the same closed-form gradient as v1.

Oracle: nabu_tpu.ops.ctc.ctc_loss.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nabu_tpu.ops.ctc import CTC_NLL_CLAMP, extended_labels
from nabu_tpu.ops.masking import NEG_INF
from nabu_tpu.ops.pallas import on_tpu

_VMEM_LIMIT = 100 * 1024 * 1024


def _shift_right_lanes(x, k):
    S = x.shape[-1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lanes >= k, pltpu.roll(x, k, axis=x.ndim - 1), NEG_INF)


def _shift_left_lanes(x, k):
    S = x.shape[-1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(
        lanes < S - k, pltpu.roll(x, S - k, axis=x.ndim - 1), NEG_INF
    )


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.where(m > NEG_INF / 2, m, 0.0)
    out = m_safe + jnp.log(
        jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    )
    return jnp.where(m > NEG_INF / 2, out, NEG_INF)


def _fwd_kernel(
    lp_ref,  # [BT, B, S] logprobs at extended labels (time block)
    skip_ref,  # [1, B, S] skip-transition mask (1.0 allowed)
    tlen_ref,  # [B, 1] VMEM float: logit lengths
    init_ref,  # [1, B, S]: t=0 init mask (0.0 at start states, NEG_INF)
    alpha_out_ref,  # [BT, B, S]
    alpha_s,  # VMEM [B, S] carry
    *,
    block_t: int,
):
    skip = skip_ref[0] > 0.5  # [B, S]
    tlen = tlen_ref[:]  # [B, 1]
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        alpha_s[:] = jnp.full_like(alpha_s, NEG_INF)

    def body(i, _):
        t = j * block_t + i
        lp_t = lp_ref[i]  # [B, S]
        alpha = alpha_s[:]
        s1 = _shift_right_lanes(alpha, 1)
        s2 = jnp.where(skip, _shift_right_lanes(alpha, 2), NEG_INF)
        trans = _lse3(alpha, s1, s2) + lp_t
        first = init_ref[0] + lp_t
        # broadcast the scalar predicate (scalar-where trips lowering)
        is_first = jnp.full(lp_t.shape, t == 0, dtype=bool)
        new = jnp.where(is_first, first, trans)
        valid = (t < tlen).astype(jnp.float32)  # [B, 1]
        new = jnp.where(valid > 0.5, new, alpha)
        alpha_s[:] = new
        alpha_out_ref[i] = new
        return 0

    jax.lax.fori_loop(0, block_t, body, 0)


def _bwd_kernel(
    lp_ref,  # [BT, B, S] (time block, reverse-ordered blocks)
    lp_next_ref,  # [1, B, S] first row of the NEXT time block
    skip_ref,  # [1, B, S]
    tlen_ref,  # [B, 1]
    beta_init_ref,  # [1, B, S]
    alpha_ref,  # [BT, B, S]
    ll_ref,  # [B, 1] VMEM
    post_out_ref,  # [BT, B, S]
    beta_s,  # VMEM [B, S]
    *,
    block_t: int,
):
    skip = skip_ref[0] > 0.5
    tlen = tlen_ref[:]  # [B, 1]
    ll = ll_ref[:]  # [B, 1]
    j = pl.program_id(0)
    nprog = pl.num_programs(0)

    @pl.when(j == 0)
    def _():
        beta_s[:] = beta_init_ref[0]

    def body(k, _):
        i = block_t - 1 - k
        t = (nprog - 1 - j) * block_t + i
        lp_next = jnp.where(
            i + 1 < block_t,
            lp_ref[jnp.minimum(i + 1, block_t - 1)],
            lp_next_ref[0],
        )
        beta = beta_s[:]
        v = beta + lp_next
        s1 = _shift_left_lanes(v, 1)
        s2 = _shift_left_lanes(jnp.where(skip, v, NEG_INF), 2)
        trans = _lse3(v, s1, s2)
        is_final = (t == tlen - 1).astype(jnp.float32)  # [B, 1] row mask
        past = (t > tlen - 1).astype(jnp.float32)
        keep = jnp.maximum(is_final, past)
        new_beta = jnp.where(keep > 0.5, beta, trans)
        gamma = alpha_ref[i] + new_beta - ll
        post = jnp.where(
            (t <= tlen - 1), jnp.exp(jnp.minimum(gamma, 0.0)), 0.0
        )
        post_out_ref[i] = post
        beta_s[:] = new_beta
        return 0

    jax.lax.fori_loop(0, block_t, body, 0)


def _prepare(logprobs, labels, blank_id):
    B, T, V = logprobs.shape
    ext = extended_labels(labels, blank_id)
    S = ext.shape[1]
    s_pad = (-S) % 128
    ext_p = jnp.pad(ext, ((0, 0), (0, s_pad)), constant_values=blank_id)
    Sp = S + s_pad
    lp_ext = jnp.take_along_axis(
        logprobs, ext_p[:, None, :].astype(jnp.int32), axis=2
    ).swapaxes(0, 1)  # [T, B, Sp]
    prev2 = jnp.pad(ext_p[:, :-2], ((0, 0), (2, 0)), constant_values=-1)
    can_skip = (
        (ext_p != blank_id) & (ext_p != prev2)
    ).astype(jnp.float32)[None]  # [1, B, Sp]
    return lp_ext, can_skip, ext_p, Sp


def _ctc_forward(logprobs, logit_lengths, labels, label_lengths, blank_id,
                 interpret, block_t=64):
    B, T, V = logprobs.shape
    lp_ext, can_skip, ext_p, Sp = _prepare(logprobs, labels, blank_id)
    lanes = jnp.arange(Sp)[None, :]
    l_len = label_lengths[:, None]
    init_mask = jnp.where(
        (lanes == 0) | ((lanes == 1) & (l_len > 0)), 0.0, NEG_INF
    )[None]  # [1, B, Sp]
    tlen = logit_lengths.astype(jnp.float32)[:, None]

    bt = min(block_t, T)
    pad = (-T) % bt
    lp_p = (
        jnp.pad(lp_ext, ((0, pad), (0, 0), (0, 0))) if pad else lp_ext
    )
    Tp = lp_p.shape[0]
    nb = Tp // bt

    alphas = pl.pallas_call(
        functools.partial(_fwd_kernel, block_t=bt),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bt, B, Sp), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, Sp), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, Sp), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, B, Sp), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, B, Sp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, Sp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(lp_p, can_skip, tlen, init_mask)

    # log-likelihood gather in plain JAX
    t_last = jnp.maximum(logit_lengths - 1, 0)
    alpha_T = alphas[t_last, jnp.arange(B)]  # [B, Sp]
    a_blank = jnp.take_along_axis(
        alpha_T, (2 * label_lengths)[:, None].astype(jnp.int32), axis=1
    )[:, 0]
    a_label = jnp.take_along_axis(
        alpha_T,
        jnp.maximum(2 * label_lengths - 1, 0)[:, None].astype(jnp.int32),
        axis=1,
    )[:, 0]
    a_label = jnp.where(label_lengths > 0, a_label, NEG_INF)
    # infeasible alignments clamp to a sane finite NLL (ops/ctc.py
    # convention: CTC_NLL_CLAMP, zero gradient via the _bwd gate)
    ll = jnp.maximum(jnp.logaddexp(a_blank, a_label), -CTC_NLL_CLAMP)

    # backward / posteriors
    beta_init = jnp.where(
        (lanes == 2 * l_len) | ((lanes == 2 * l_len - 1) & (l_len > 0)),
        0.0,
        NEG_INF,
    )[None]
    # first lp row of each block's successor (time order), zeros for last
    lp_next_rows = jnp.concatenate(
        [lp_p[bt::bt], jnp.zeros((1, B, Sp), lp_p.dtype)], axis=0
    )  # [nb, B, Sp]

    posts = pl.pallas_call(
        functools.partial(_bwd_kernel, block_t=bt),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bt, B, Sp), lambda j, nb=nb: (nb - 1 - j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, Sp), lambda j, nb=nb: (nb - 1 - j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, Sp), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, Sp), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, B, Sp), lambda j, nb=nb: (nb - 1 - j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, B, Sp), lambda j, nb=nb: (nb - 1 - j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, B, Sp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, Sp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(lp_p, lp_next_rows, can_skip, tlen, beta_init, alphas, ll[:, None])

    return ll, posts[:T].swapaxes(0, 1), ext_p  # posts back to [B, T, Sp]


def _fwd(logits, logit_lengths, labels, label_lengths, blank_id, interpret):
    if interpret is None:
        interpret = not on_tpu()
    B, T, V = logits.shape
    if blank_id is None:
        blank_id = V - 1
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ll, post, ext_p = _ctc_forward(
        logprobs, logit_lengths, labels, label_lengths, blank_id, interpret
    )
    return -ll, (logprobs, logit_lengths, post, ext_p, ll)


def _bwd(blank_id, interpret, residuals, g):
    logprobs, logit_lengths, post, ext_p, ll = residuals
    B, T, V = logprobs.shape
    onehot = jax.nn.one_hot(ext_p, V, dtype=post.dtype)
    post_vocab = jnp.einsum("bts,bsv->btv", post, onehot)
    time_mask = (
        jnp.arange(T)[None, :] < logit_lengths[:, None]
    )[..., None]
    # the clamp in _ctc_forward maps every infeasible example to exactly
    # -CTC_NLL_CLAMP; real alignments that deep into the tail are
    # clamped too, so gating here keeps fwd/bwd consistent
    feasible = (ll > -CTC_NLL_CLAMP + 1.0)[:, None, None]
    dlogits = jnp.where(
        time_mask & feasible, jnp.exp(logprobs) - post_vocab, 0.0
    )
    return dlogits * g[:, None, None], None, None, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def ctc_loss_pallas_batched(
    logits,
    logit_lengths,
    labels,
    label_lengths,
    blank_id: int | None = None,
    interpret: bool | None = None,
):
    """Per-example CTC NLL via the batch-vectorized kernels."""
    loss, _ = _fwd(
        logits, logit_lengths, labels, label_lengths, blank_id, interpret
    )
    return loss


ctc_loss_pallas_batched.defvjp(_fwd, _bwd)
