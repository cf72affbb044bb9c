"""Fused Pallas CTC forward-backward kernel with analytic gradient.

Replaces the reference's C++ CTCLossOp (tf.nn.ctc_loss — SURVEY.md §2
native-components table; BASELINE.json:5 "fused Pallas CTC
forward-backward kernel"). One kernel program per batch element runs
the whole log-space DP in VMEM: the forward pass streams alpha rows
into the output buffer, the backward pass walks beta in registers and
rewrites each row in place as the posterior exp(alpha+beta-ll) — the
[T, S] buffer is written twice and read once, all on-chip.

The gradient is the classic CTC closed form
  dL/dlogits[t] = softmax(logits[t]) - scatter_s(posterior[t, s])
applied via a batched one-hot contraction (MXU) in the custom VJP, so
no autodiff through the DP is ever traced.

Oracle: nabu_tpu.ops.ctc.ctc_loss (pure JAX, itself tested against
optax and brute-force enumeration).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nabu_tpu.ops.ctc import extended_labels
from nabu_tpu.ops.masking import NEG_INF
from nabu_tpu.ops.pallas import on_tpu


def _shift_right(x, k):
    """[1, S] -> values shifted right k lanes, NEG_INF fill."""
    S = x.shape[-1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    return jnp.where(lanes >= k, pltpu.roll(x, k, axis=1), NEG_INF)


def _shift_left(x, k):
    # pltpu.roll only accepts non-negative shifts: left-by-k == right-by-(S-k)
    S = x.shape[-1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    return jnp.where(lanes < S - k, pltpu.roll(x, S - k, axis=1), NEG_INF)


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.where(m > NEG_INF / 2, m, 0.0)
    out = m_safe + jnp.log(
        jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    )
    return jnp.where(m > NEG_INF / 2, out, NEG_INF)


def _select_lane(row, idx):
    """row [1, S], idx scalar -> row[0, idx] via masked max."""
    S = row.shape[-1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    return jnp.max(jnp.where(lanes == idx, row, NEG_INF))


def _ctc_kernel(
    len_ref,  # SMEM [1, 1] int32: logit length
    lablen_ref,  # SMEM [1, 1] int32: label length
    lp_ref,  # VMEM [1, T, S]: logprobs gathered at extended labels
    skip_ref,  # VMEM [1, 1, S]: 1.0 where skip transition allowed
    post_ref,  # VMEM out [1, T, S]: posteriors (temp: alpha rows)
    ll_ref,  # SMEM out [1, 1]: log likelihood
):
    T = lp_ref.shape[1]
    b = pl.program_id(0)
    t_len = len_ref[b, 0]
    l_len = lablen_ref[b, 0]
    skip = skip_ref[0, 0, :][None, :] > 0.5  # [1, S]
    S = lp_ref.shape[2]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)

    # -- forward: stream alpha rows into post_ref ------------------------
    lp0 = lp_ref[0, 0, :][None, :]
    alpha0 = jnp.where(
        (lanes == 0) | ((lanes == 1) & (l_len > 0)), lp0, NEG_INF
    )
    post_ref[0, 0, :] = alpha0[0]

    def fwd_body(t, alpha):
        lp_t = lp_ref[0, t, :][None, :]
        s1 = _shift_right(alpha, 1)
        s2 = jnp.where(skip, _shift_right(alpha, 2), NEG_INF)
        new = _lse3(alpha, s1, s2) + lp_t
        new = jnp.where(t < t_len, new, alpha)
        post_ref[0, t, :] = new[0]
        return new

    jax.lax.fori_loop(1, T, fwd_body, alpha0)

    # -- log likelihood from the final valid row -------------------------
    t_last = jnp.maximum(t_len - 1, 0)
    final_row = post_ref[0, t_last, :][None, :]
    a_blank = _select_lane(final_row, 2 * l_len)
    a_label = jnp.where(
        l_len > 0, _select_lane(final_row, 2 * l_len - 1), NEG_INF
    )
    ll = jnp.maximum(jnp.logaddexp(a_blank, a_label), NEG_INF * 0.5)
    ll_ref[b, 0] = ll

    # -- backward: beta in registers, rewrite rows as posteriors ---------
    beta_init = jnp.where(
        (lanes == 2 * l_len) | ((lanes == 2 * l_len - 1) & (l_len > 0)),
        0.0,
        NEG_INF,
    )

    def bwd_body(j, beta):
        t = T - 1 - j
        alpha_t = post_ref[0, t, :][None, :]
        # beta transition from t+1 (clamped read; result unused at the
        # final/padded rows)
        lp_next = lp_ref[0, jnp.minimum(t + 1, T - 1), :][None, :]
        v = beta + lp_next
        s1 = _shift_left(v, 1)
        s2 = _shift_left(jnp.where(skip, v, NEG_INF), 2)
        trans = _lse3(v, s1, s2)
        new_beta = jnp.where(t >= t_len - 1, beta, trans)
        gamma = alpha_t + new_beta - ll
        post = jnp.where(
            t <= t_len - 1, jnp.exp(jnp.minimum(gamma, 0.0)), 0.0
        )
        post_ref[0, t, :] = post[0]
        return new_beta

    jax.lax.fori_loop(0, T, bwd_body, beta_init)


def _ctc_forward_call(
    logprobs, logit_lengths, labels, label_lengths, blank_id, interpret
):
    """Run the kernel. Returns (ll [B], posteriors [B, T, Sp], ext_p)."""
    B, T, V = logprobs.shape
    ext = extended_labels(labels, blank_id)
    S = ext.shape[1]
    s_pad = (-S) % 128
    ext_p = jnp.pad(ext, ((0, 0), (0, s_pad)), constant_values=blank_id)
    Sp = S + s_pad

    lp_ext = jnp.take_along_axis(
        logprobs, ext_p[:, None, :].astype(jnp.int32), axis=2
    )  # [B, T, Sp]
    prev2 = jnp.pad(ext_p[:, :-2], ((0, 0), (2, 0)), constant_values=-1)
    can_skip = ((ext_p != blank_id) & (ext_p != prev2)).astype(jnp.float32)

    post, ll = pl.pallas_call(
        _ctc_kernel,
        grid=(B,),
        in_specs=[
            # whole [B, 1] scalar arrays live in SMEM; the kernel indexes
            # them by program_id (per-block SMEM slicing is unsupported)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, T, Sp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, Sp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, T, Sp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, Sp), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        logit_lengths.astype(jnp.int32).reshape(B, 1),
        label_lengths.astype(jnp.int32).reshape(B, 1),
        lp_ext,
        can_skip[:, None, :],
    )
    return ll[:, 0], post, ext_p


def _ctc_fwd(logits, logit_lengths, labels, label_lengths, blank_id,
             interpret):
    if interpret is None:
        interpret = not on_tpu()
    B, T, V = logits.shape
    if blank_id is None:
        blank_id = V - 1
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ll, post, ext_p = _ctc_forward_call(
        logprobs, logit_lengths, labels, label_lengths, blank_id, interpret
    )
    residuals = (logprobs, logit_lengths, post, ext_p, ll)
    return -ll, residuals


def _ctc_bwd(blank_id, interpret, residuals, g):
    logprobs, logit_lengths, post, ext_p, ll = residuals
    B, T, V = logprobs.shape
    # scatter posteriors from extended-label positions to the vocab via
    # a batched one-hot contraction (MXU)
    onehot = jax.nn.one_hot(ext_p, V, dtype=post.dtype)  # [B, Sp, V]
    post_vocab = jnp.einsum("bts,bsv->btv", post, onehot)
    time_mask = (
        jnp.arange(T)[None, :] < logit_lengths[:, None]
    )[..., None]
    # impossible alignments (clamped ll) get zero gradient, matching the
    # pure-JAX oracle's clamp
    feasible = (ll > NEG_INF * 0.4)[:, None, None]
    dlogits = jnp.where(
        time_mask & feasible, jnp.exp(logprobs) - post_vocab, 0.0
    )
    dlogits = dlogits * g[:, None, None]
    return dlogits, None, None, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def ctc_loss_pallas(
    logits,  # [B, T, V]
    logit_lengths,
    labels,  # [B, L]
    label_lengths,
    blank_id: int | None = None,
    interpret: bool | None = None,
):
    """Per-example CTC negative log likelihood via the fused kernel.

    Drop-in for nabu_tpu.ops.ctc.ctc_loss.
    """
    loss, _ = _ctc_fwd(
        logits, logit_lengths, labels, label_lengths, blank_id, interpret
    )
    return loss


ctc_loss_pallas.defvjp(_ctc_fwd, _ctc_bwd)
