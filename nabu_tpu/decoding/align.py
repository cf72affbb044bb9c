"""CTC forced alignment: Viterbi over the blank-expanded label lattice.

Beyond-parity subsystem (the reference decodes and scores but cannot
say WHEN each token was spoken). Given the CTC head's frame log-probs
and the ground-truth (or hypothesized) label sequence, this finds the
maximum-probability frame<->label alignment — the standard
2U+1-state CTC Viterbi (blank, y1, blank, ..., yU, blank with
stay / advance-1 / skip-blank-2 transitions; the skip is forbidden
into a blank or a repeated label, mirroring the forward recursion of
ops/ctc.py).

TPU-native design: the forward pass is one ``lax.scan`` over T with
fixed-shape [B, S] scores and int8 backpointers (no per-utterance
graphs); the backtrace is a second (reversed) scan. Variable lengths
are handled by freezing the DP past ``logit_lengths`` and gathering
each sequence's own final state, so one compiled program serves a
whole padded batch.

``run align`` (scripts/align.py) drives this over a recipe's dataset
and writes CTM-style ``utt channel start dur token`` lines with times
in seconds (frame index * winstep * any encoder subsampling).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from nabu_tpu.ops.masking import NEG_INF


def _expand(targets: jnp.ndarray, blank_id: int) -> jnp.ndarray:
    """[B, U] labels -> [B, 2U+1] blank-interleaved state symbols."""
    B, U = targets.shape
    z = jnp.full((B, 2 * U + 1), blank_id, targets.dtype)
    return z.at[:, 1::2].set(targets)


def ctc_forced_align(
    logprobs: jnp.ndarray,  # [B, T, V] frame log-probs (post log_softmax)
    logit_lengths: jnp.ndarray,  # [B]
    targets: jnp.ndarray,  # [B, U] label ids (padded arbitrarily)
    target_lengths: jnp.ndarray,  # [B]
    blank_id: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Most-probable CTC alignment per sequence.

    Returns ``(frame_labels [B, T] int32, scores [B] float32)`` where
    ``frame_labels[b, t]`` is the emitted symbol (label id or blank) at
    frame t of the Viterbi path, valid for ``t < logit_lengths[b]``
    (blank past the end), and ``scores`` is the path log-probability.
    """
    logprobs = logprobs.astype(jnp.float32)
    B, T, V = logprobs.shape
    U = targets.shape[1]
    S = 2 * U + 1
    z = _expand(targets.astype(jnp.int32), blank_id)  # [B, S]
    s_len = 2 * target_lengths.astype(jnp.int32) + 1  # [B]

    # skip (s-2 -> s) allowed only into a non-blank that differs from
    # the label two states back
    prev2 = jnp.pad(z[:, :-2], ((0, 0), (2, 0)), constant_values=-1)
    can_skip = (jnp.arange(S)[None, :] % 2 == 1) & (z != prev2)  # [B, S]
    in_seq = jnp.arange(S)[None, :] < s_len[:, None]  # [B, S]

    emit = jnp.take_along_axis(
        jnp.swapaxes(logprobs, 0, 1), z[None, :, :], axis=2
    )  # [T, B, S]: log p_t(z_s)

    init = jnp.where(
        (jnp.arange(S)[None, :] < 2) & in_seq, emit[0], NEG_INF
    )  # only states 0 (blank) and 1 (y1) may start

    def step(carry, inp):
        delta = carry  # [B, S]
        em, t = inp
        stay = delta
        adv = jnp.pad(
            delta[:, :-1], ((0, 0), (1, 0)), constant_values=NEG_INF
        )
        skip = jnp.where(
            can_skip,
            jnp.pad(delta[:, :-2], ((0, 0), (2, 0)),
                    constant_values=NEG_INF),
            NEG_INF,
        )
        stacked = jnp.stack([stay, adv, skip], axis=0)  # [3, B, S]
        choice = jnp.argmax(stacked, axis=0).astype(jnp.int8)
        best = jnp.max(stacked, axis=0)
        new = jnp.where(in_seq, best + em, NEG_INF)
        # frozen past each sequence's end: carry delta, record "stay"
        valid = (t < logit_lengths)[:, None]
        return (
            jnp.where(valid, new, delta),
            jnp.where(valid, choice, jnp.int8(0)),
        )

    delta, choices = jax.lax.scan(
        step, init, (emit[1:], jnp.arange(1, T))
    )  # choices [T-1, B, S]

    # final state: the better of 2U (last blank) and 2U-1 (last label)
    last_blank = s_len - 1
    last_label = jnp.maximum(s_len - 2, 0)
    fb = jnp.take_along_axis(delta, last_blank[:, None], axis=1)[:, 0]
    fl = jnp.take_along_axis(delta, last_label[:, None], axis=1)[:, 0]
    final_s = jnp.where(fb >= fl, last_blank, last_label)  # [B]
    scores = jnp.maximum(fb, fl)

    # backtrace: s_{t-1} = s_t - choice_t(s_t); padded frames recorded
    # choice 0 so the state is carried backwards unchanged through them
    def back(s, ch):
        c = jnp.take_along_axis(ch, s[:, None], axis=1)[:, 0]
        return s - c.astype(jnp.int32), s

    s0, states = jax.lax.scan(back, final_s, choices, reverse=True)
    states = jnp.concatenate(
        [s0[None, :], states], axis=0
    )  # [T, B] state index per frame
    frame_labels = jnp.take_along_axis(
        z, jnp.swapaxes(states, 0, 1), axis=1
    )  # [B, T]
    t_ids = jnp.arange(T)[None, :]
    frame_labels = jnp.where(
        t_ids < logit_lengths[:, None], frame_labels, blank_id
    )
    return frame_labels.astype(jnp.int32), scores


def segments_from_frames(
    frame_labels, length, blank_id
) -> list:
    """Host-side: collapse a frame-label row into
    ``(label, start_frame, end_frame_exclusive)`` segments (consecutive
    equal non-blank frames = one segment, CTC semantics)."""
    segs = []
    prev = blank_id
    start = 0
    for t in range(int(length)):
        lab = int(frame_labels[t])
        if lab != prev:
            if prev != blank_id:
                segs.append((prev, start, t))
            start = t
            prev = lab
    if prev != blank_id:
        segs.append((prev, start, int(length)))
    return segs
