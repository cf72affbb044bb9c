"""RNN-T decoding: batched greedy search, jit-compiled, static shapes.

Beyond-parity recognizer for the transducer head (models/transducer.py).
Classic RNN-T greedy (Graves 2012 §3.1): at each encoder frame, emit
argmax symbols — stepping the prediction network after each — until the
joint outputs blank (or a per-frame symbol budget runs out), then
advance to the next frame.

TPU-first shape discipline: the frame loop is a ``lax.scan`` over T with
the per-frame emission loop unrolled ``max_symbols`` times (a static
bound, so the whole search is one fixed-shape program — no per-utterance
graphs). Emitted tokens are collected as a [B, T*max_symbols] buffer
with a validity mask and left-packed afterwards by a stable argsort —
the same static-shape compaction idiom as the CTC greedy collapse.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from nabu_tpu.decoding.beam import _gather_beams
from nabu_tpu.ops.masking import sequence_mask


def transducer_greedy_search(
    decoder,
    params: dict,
    encoded: jnp.ndarray,  # [B, T, D]
    enc_lengths: jnp.ndarray,  # [B]
    max_symbols: int = 4,
    init_carry=None,
    return_carry: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (ids [B, T*max_symbols], lengths [B], scores [B]).

    ``scores`` is the log-probability of the greedy alignment (every
    emitted symbol plus every consumed blank, at valid frames).

    ``init_carry``/``return_carry`` expose the running decode state
    (pred vector, prediction-net state, score) so a STREAMING caller can
    greedy-decode chunk by chunk with byte-identical results to one
    offline pass (decoding/streaming.py).
    """
    B, T, _ = encoded.shape
    enc_proj = decoder.precompute(params, encoded)  # [B, T, J]
    enc_mask = sequence_mask(enc_lengths, T)  # [B, T]
    blank = decoder.blank_id

    if init_carry is None:
        state0 = decoder.pred_init_state(B, encoded.dtype)
        pred0, state0 = decoder.pred_step(
            params, jnp.full((B,), decoder.sos_id, jnp.int32), state0
        )
        init_carry = (pred0, state0, jnp.zeros((B,), jnp.float32))

    def frame_step(carry, inp):
        pred_vec, state, score = carry
        enc_t, valid = inp  # [B, J], [B]
        frame_open = valid  # lanes still allowed to act this frame
        toks = []
        tok_valid = []
        for _ in range(max_symbols):
            logits = decoder.joint_step(params, enc_t, pred_vec)
            logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            best = jnp.argmax(logprobs, axis=-1).astype(jnp.int32)
            best_lp = jnp.take_along_axis(
                logprobs, best[:, None], axis=1
            )[:, 0]
            is_blank = best == blank
            emit = frame_open & ~is_blank
            # acting lanes score their choice (blank or emission) once
            score = score + jnp.where(frame_open, best_lp, 0.0)
            new_pred, new_state = decoder.pred_step(params, best, state)
            pred_vec = jnp.where(emit[:, None], new_pred, pred_vec)
            state = jax.tree.map(
                lambda n, o: jnp.where(emit[:, None], n, o),
                new_state,
                state,
            )
            toks.append(jnp.where(emit, best, blank))
            tok_valid.append(emit)
            # a blank closes the frame; emitting keeps it open
            frame_open = emit
        return (pred_vec, state, score), (
            jnp.stack(toks, axis=-1),  # [B, K]
            jnp.stack(tok_valid, axis=-1),  # [B, K]
        )

    enc_proj_t = jnp.swapaxes(enc_proj, 0, 1)  # [T, B, J]
    mask_t = jnp.swapaxes(enc_mask, 0, 1)  # [T, B]
    carry, (toks, valid) = jax.lax.scan(
        frame_step, init_carry, (enc_proj_t, mask_t)
    )
    scores = carry[2]
    # [T, B, K] -> [B, T*K], frame-major order
    toks = jnp.swapaxes(toks, 0, 1).reshape(B, T * max_symbols)
    valid = jnp.swapaxes(valid, 0, 1).reshape(B, T * max_symbols)
    # left-pack the emitted symbols (stable sort keeps emission order)
    order = jnp.argsort(~valid, axis=1, stable=True)
    ids = jnp.take_along_axis(toks, order, axis=1)
    lengths = valid.sum(axis=1).astype(jnp.int32)
    if return_carry:
        return ids, lengths, scores, carry
    return ids, lengths, scores


def transducer_beam_search(
    decoder,
    params: dict,
    encoded: jnp.ndarray,  # [B, T, D]
    enc_lengths: jnp.ndarray,  # [B]
    beam_width: int = 4,
    max_symbols: int = 4,
    length_norm_power: float = 0.0,
    lm=None,
    lm_weight: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched time-synchronous alignment-path beam search.

    ``lm`` (decoding.lm.DenseLM) enables shallow fusion on EMISSIONS
    only — blank moves carry no LM cost, so the LM shapes which labels
    are hypothesized, not when the frames advance.

    Keeps the ``beam_width`` best ALIGNMENT PATHS (a hypothesis' score is
    the probability of its single best blank/emission path, not the sum
    over paths — no equal-prefix merging, the standard TPU-friendly
    simplification; with beam_width >= the number of feasible paths it
    is exact max-path decoding, tested against brute force). Frame
    semantics mirror the greedy search: per encoder frame each open
    hypothesis either emits (staying open, <= max_symbols times) or
    takes blank (closing the frame); closed hypotheses carry over
    unchanged. Everything is fixed-shape: beam state lives as
    [B, W, ...] device arrays and each expansion is one top_k over
    W * (V+1) candidates (noop + V joint actions).

    Returns (seqs [B, W, T*max_symbols], lengths [B, W], scores [B, W]),
    hypotheses sorted best-first. ``length_norm_power`` only changes the
    RANKING key (score / max(len, 1)^power); the returned scores are
    always raw path log-probs, like every other recognizer.
    """
    B, T, _ = encoded.shape
    W = beam_width
    enc_proj = decoder.precompute(params, encoded)  # [B, T, J]
    enc_mask = sequence_mask(enc_lengths, T)
    blank = decoder.blank_id
    L = T * max_symbols
    NEG = -1e30

    def flat_pred_step(ids_bw, state_bw):
        """pred_step over a flattened [B*W] beam."""
        vec, state = decoder.pred_step(
            params,
            ids_bw.reshape(B * W),
            jax.tree.map(
                lambda x: x.reshape((B * W,) + x.shape[2:]), state_bw
            ),
        )
        return (
            vec.reshape(B, W, -1),
            jax.tree.map(
                lambda x: x.reshape((B, W) + x.shape[1:]), state
            ),
        )

    # init: hypothesis 0 live, the rest parked at -inf
    state0 = decoder.pred_init_state(B * W, encoded.dtype)
    pred0, state0 = decoder.pred_step(
        params, jnp.full((B * W,), decoder.sos_id, jnp.int32), state0
    )
    pred0 = pred0.reshape(B, W, -1)
    state0 = jax.tree.map(
        lambda x: x.reshape((B, W) + x.shape[1:]), state0
    )
    carry0 = dict(
        pred=pred0,
        state=state0,
        score=jnp.where(
            jnp.arange(W)[None, :] == 0, 0.0, NEG
        ) * jnp.ones((B, 1)),
        seqs=jnp.full((B, W, L), blank, jnp.int32),
        lens=jnp.zeros((B, W), jnp.int32),
    )
    fuse = lm is not None and lm_weight != 0.0
    if fuse:
        carry0["lm_state"] = lm.init_state((B, W))

    def frame_step(carry, inp):
        enc_t, valid = inp  # [B, J], [B]
        open_ = valid[:, None] & jnp.ones((B, W), bool)  # all open if valid
        for _ in range(max_symbols):
            logits = decoder.joint_step(
                params,
                jnp.repeat(enc_t[:, None, :], W, axis=1).reshape(B * W, -1),
                carry["pred"].reshape(B * W, -1),
            ).reshape(B, W, -1)
            nV = logits.shape[-1]
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            if fuse:
                # fusion on emissions; the blank column stays AM-only
                lm_lp = lm.logprobs(carry["lm_state"])  # [B, W, Vlm]
                lp = lp.at[..., :blank].add(
                    lm_weight * lm_lp[..., :blank]
                )
            # candidates [B, W, 1 + nV]: col 0 = noop, col 1+v = action v
            # (at an invalid frame open_ is False everywhere, so every
            # hypothesis noops and the beam passes through unchanged)
            noop = jnp.where(open_, NEG, 0.0) + carry["score"]
            acts = jnp.where(open_[..., None], lp, NEG) + carry["score"][..., None]
            cand = jnp.concatenate([noop[..., None], acts], axis=-1)
            flat = cand.reshape(B, W * (1 + nV))
            top_score, top_idx = jax.lax.top_k(flat, W)  # sorted desc
            parent = top_idx // (1 + nV)  # [B, W]
            action = top_idx % (1 + nV)  # 0 = noop, else v+1
            tok = (action - 1).astype(jnp.int32)
            is_emit = (action >= 1) & (tok != blank)
            # gather parent state (shared beam-reindexing helper)
            pred, state, seqs, lens = (
                _gather_beams(carry["pred"], parent),
                _gather_beams(carry["state"], parent),
                _gather_beams(carry["seqs"], parent),
                _gather_beams(carry["lens"], parent),
            )
            open_ = is_emit  # blank and noop both close the frame
            # append emitted tokens at position lens
            pos = jnp.arange(L)[None, None, :]
            seqs = jnp.where(
                is_emit[..., None] & (pos == lens[..., None]),
                jnp.clip(tok, 0)[..., None],
                seqs,
            )
            lens = lens + is_emit.astype(jnp.int32)
            # step the prediction net for emitting hypotheses
            new_pred, new_state = flat_pred_step(jnp.clip(tok, 0), state)
            pred = jnp.where(is_emit[..., None], new_pred, pred)
            state = jax.tree.map(
                lambda n, o: jnp.where(
                    is_emit.reshape((B, W) + (1,) * (n.ndim - 2)), n, o
                ),
                new_state,
                state,
            )
            carry_new = dict(
                pred=pred, state=state, score=top_score, seqs=seqs,
                lens=lens,
            )
            if fuse:
                from nabu_tpu.decoding.lm import state_where

                lm_state = _gather_beams(carry["lm_state"], parent)
                carry_new["lm_state"] = state_where(
                    is_emit, lm.step(lm_state, jnp.clip(tok, 0)), lm_state
                )
            carry = carry_new
        return carry, None

    enc_proj_t = jnp.swapaxes(enc_proj, 0, 1)  # [T, B, J]
    mask_t = jnp.swapaxes(enc_mask, 0, 1)  # [T, B]
    carry, _ = jax.lax.scan(frame_step, carry0, (enc_proj_t, mask_t))

    # rank by normalized score but return RAW path log-probs — the same
    # score contract as attention_beam_search and the other recognizers
    scores = carry["score"]
    if length_norm_power > 0.0:
        norm = jnp.maximum(carry["lens"].astype(jnp.float32), 1.0)
        rank_key = scores / norm**length_norm_power
    else:
        rank_key = scores
    order = jnp.argsort(-rank_key, axis=1)
    return (
        _gather_beams(carry["seqs"], order),
        jnp.take_along_axis(carry["lens"], order, axis=1),
        jnp.take_along_axis(scores, order, axis=1),
    )
