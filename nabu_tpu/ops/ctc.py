"""CTC loss: numerically stable log-space forward algorithm in pure JAX.

Capability parity with the reference's CTC loss computer (tf.nn.ctc_loss
over sparse targets built with dense_sequence_to_sparse). Here targets
stay densely padded; static shapes throughout (SURVEY.md §7 hard part 1).
This is the oracle for the fused Pallas kernel in
nabu_tpu.ops.pallas.ctc_batched; gradients come from autodiff through the scan
(the Pallas path uses the alpha-beta posterior formula).

Blank convention: configurable ``blank_id``; the framework's CTC head
uses blank = num_labels (last index, TF convention), so label ids never
shift.

Infeasible alignments (logit_len < label_len + required blanks between
adjacent repeats — possible after ``max_target_length`` truncation or
pyramid subsampling) get a CLAMPED per-example NLL of ``CTC_NLL_CLAMP``
with zero gradient, so one poisoned example cannot destroy the loss
metric or dominate the clipped gradient direction. ``ctc_feasible``
exposes the exact feasibility predicate so loss computers can zero such
examples out and report an ``ctc_infeasible_frac`` metric.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nabu_tpu.ops.masking import NEG_INF, sequence_mask

# Per-example NLL ceiling. Any real alignment's NLL is O(T * log V);
# this bound is far above every benchmark config yet keeps an
# infeasible example's contribution finite and its gradient zero.
CTC_NLL_CLAMP = 1.0e4


def ctc_feasible(
    logit_lengths: jnp.ndarray,  # [B]
    labels: jnp.ndarray,  # [B, L]
    label_lengths: jnp.ndarray,  # [B]
) -> jnp.ndarray:
    """[B] bool: a CTC alignment exists.

    Feasible iff logit_len >= label_len + (# adjacent repeated labels),
    since each repeat needs a mandatory blank between its frames.
    """
    L = labels.shape[1]
    valid = jnp.arange(L)[None, :] < label_lengths[:, None]
    rep = (labels[:, 1:] == labels[:, :-1]) & valid[:, 1:] & valid[:, :-1]
    need = label_lengths + rep.sum(axis=1).astype(label_lengths.dtype)
    return logit_lengths >= need


def _logaddexp3(a, b, c):
    return jnp.logaddexp(jnp.logaddexp(a, b), c)


def extended_labels(labels: jnp.ndarray, blank_id: int) -> jnp.ndarray:
    """[B, L] -> blank-interleaved [B, 2L+1]: blank l0 blank l1 ... blank."""
    B, L = labels.shape
    ext = jnp.full((B, 2 * L + 1), blank_id, labels.dtype)
    return ext.at[:, 1::2].set(labels)


def ctc_forward_log_alpha(
    logprobs: jnp.ndarray,  # [B, T, V]
    logit_lengths: jnp.ndarray,  # [B]
    labels: jnp.ndarray,  # [B, L]
    blank_id: int,
):
    """Run the forward DP. Returns (log alpha over time [T, B, S], ext)."""
    B, T, V = logprobs.shape
    ext = extended_labels(labels, blank_id)  # [B, S]
    S = ext.shape[1]

    # lp_ext[b, t, s] = logprobs[b, t, ext[b, s]]
    lp_ext = jnp.take_along_axis(
        logprobs, ext[:, None, :].astype(jnp.int32), axis=2
    )  # [B, T, S]

    # skip transition allowed into odd (label) positions whose label
    # differs from the label two back
    prev2 = jnp.pad(ext[:, :-2], ((0, 0), (2, 0)), constant_values=-1)
    can_skip = (ext != blank_id) & (ext != prev2)  # [B, S]

    neg = jnp.full((B, S), NEG_INF, logprobs.dtype)
    alpha0 = neg.at[:, 0].set(lp_ext[:, 0, 0])
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(S > 1, lp_ext[:, 0, jnp.minimum(1, S - 1)], NEG_INF)
    )

    time_mask = sequence_mask(logit_lengths, T)  # [B, T]
    lp_t = jnp.swapaxes(lp_ext, 0, 1)  # [T, B, S]
    tm_t = jnp.swapaxes(time_mask, 0, 1)  # [T, B]

    def step(alpha, inp):
        lp, valid = inp  # [B, S], [B]
        shift1 = jnp.pad(
            alpha[:, :-1], ((0, 0), (1, 0)), constant_values=NEG_INF
        )
        shift2 = jnp.pad(
            alpha[:, :-2], ((0, 0), (2, 0)), constant_values=NEG_INF
        )
        shift2 = jnp.where(can_skip, shift2, NEG_INF)
        new = _logaddexp3(alpha, shift1, shift2) + lp
        new = jnp.where(valid[:, None], new, alpha)
        return new, new

    _, alphas = jax.lax.scan(step, alpha0, (lp_t[1:], tm_t[1:]))
    alphas = jnp.concatenate([alpha0[None], alphas], axis=0)  # [T, B, S]
    return alphas, ext


def ctc_loss(
    logits: jnp.ndarray,  # [B, T, V]
    logit_lengths: jnp.ndarray,  # [B]
    labels: jnp.ndarray,  # [B, L]
    label_lengths: jnp.ndarray,  # [B]
    blank_id: int | None = None,
) -> jnp.ndarray:
    """Per-example negative log likelihood, [B].

    Requires logit_lengths >= 1. Examples whose alignment is impossible
    (see ``ctc_feasible``) get a clamped loss of ``CTC_NLL_CLAMP`` with
    zero gradient rather than an astronomically large finite value.
    """
    B, T, V = logits.shape
    if blank_id is None:
        blank_id = V - 1
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    alphas, _ = ctc_forward_log_alpha(
        logprobs, logit_lengths, labels, blank_id
    )
    # alpha at each example's final valid frame
    t_last = jnp.maximum(logit_lengths - 1, 0)
    alpha_T = alphas[t_last, jnp.arange(B)]  # [B, S]
    s_last = 2 * label_lengths  # final blank position
    a_blank = jnp.take_along_axis(
        alpha_T, s_last[:, None].astype(jnp.int32), axis=1
    )[:, 0]
    s_label = jnp.maximum(2 * label_lengths - 1, 0)
    a_label = jnp.take_along_axis(
        alpha_T, s_label[:, None].astype(jnp.int32), axis=1
    )[:, 0]
    a_label = jnp.where(label_lengths > 0, a_label, NEG_INF)
    ll = jnp.logaddexp(a_blank, a_label)
    # max() stops gradient flow whenever the clamp binds
    return -jnp.maximum(ll, -CTC_NLL_CLAMP)


def ctc_greedy_collapse(
    frame_ids: jnp.ndarray,  # [B, T] argmax frame labels
    logit_lengths: jnp.ndarray,  # [B]
    blank_id: int,
):
    """Collapse repeats then remove blanks; static-shape output.

    Returns (collapsed [B, T] padded with blank_id at the tail,
    collapsed lengths [B]).
    """
    B, T = frame_ids.shape
    time_mask = sequence_mask(logit_lengths, T)
    prev = jnp.pad(
        frame_ids[:, :-1], ((0, 0), (1, 0)), constant_values=-1
    )
    keep = (frame_ids != prev) & (frame_ids != blank_id) & time_mask
    # stable compaction: position of each kept symbol in the output
    pos = jnp.cumsum(keep, axis=1) - 1  # [B, T]
    out_len = keep.sum(axis=1).astype(jnp.int32)
    out = jnp.full((B, T), blank_id, frame_ids.dtype)
    b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
    # dropped frames scatter out of bounds and are discarded by mode="drop"
    scatter_pos = jnp.where(keep, pos, T)
    out = out.at[b_idx, scatter_pos].set(frame_ids, mode="drop")
    return out, out_len
