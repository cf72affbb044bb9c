"""Batched CTC prefix beam search, jit-compiled with fixed-shape state.

Capability parity with the reference's CTC decode
(tf.nn.ctc_beam_search_decoder, a C++ per-utterance op) re-designed as a
tensor program (BASELINE.json:5; PAPERS.md GPU/vectorized CTC-decoding
lines): beams are ``[B, W, Lmax]`` prefixes with separate blank /
non-blank log-probabilities (Hannun-style prefix beam search). Each
frame expands every beam with {stay, extend-with-c} candidates
vectorized over the vocab, merges equal prefixes via rolling-hash
sort + segment-logsumexp, and keeps the top W — all inside jit, no
host round-trips.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from nabu_tpu.ops.masking import NEG_INF

# rolling-hash constants (int32 wraparound multiplication; two
# independent hashes make collisions vanishingly unlikely). Python
# ints on purpose: a module-level jnp scalar becomes a closed-over
# jaxpr CONSTANT in every trace that uses it, and XLA may fold such
# consts differently per input shape — jax 0.9's C++ fast-path jit
# cache then dispatches an executable with a mismatched kept-argument
# set ("Execution supplied 16 buffers but compiled program expected
# 19") on the second call of the second compiled shape. Keeping the
# traced closure constant-free sidesteps the bug; a regression test
# drives the exact two-bucket call sequence (tests/test_beam.py).


def _segment_logsumexp_sorted(values: jnp.ndarray, segment_start: jnp.ndarray):
    """Log-sum-exp within runs of equal keys in a sorted array.

    values, segment_start: [B, C] with segment_start True at each run
    head. Returns an array where each run head holds the run's logsumexp
    and all other positions are NEG_INF.

    Stability: sums are anchored at the per-row max, so contributions
    more than float32's exp range (~88 nats) below the row's best
    candidate underflow to NEG_INF — such prefixes can never reach the
    top-W anyway.
    """
    B, C = values.shape
    seg_id = jnp.cumsum(segment_start.astype(jnp.int32), axis=-1) - 1
    row_max = jnp.max(values, axis=-1, keepdims=True)
    row_max = jnp.where(row_max > NEG_INF / 2, row_max, 0.0)
    expv = jnp.where(
        values > NEG_INF / 2, jnp.exp(values - row_max), 0.0
    )
    totals = jax.vmap(
        lambda e, s: jax.ops.segment_sum(e, s, num_segments=C)
    )(expv, seg_id)  # [B, C] (run totals at run index)
    run_total = jnp.take_along_axis(totals, seg_id, axis=-1)
    return jnp.where(
        segment_start & (run_total > 0),
        jnp.log(jnp.maximum(run_total, 1e-38)) + row_max,
        NEG_INF,
    )


def ctc_prefix_beam_search(
    logprobs: jnp.ndarray,  # [B, T, V] log-softmax output, blank included
    logit_lengths: jnp.ndarray,  # [B]
    beam_width: int,
    blank_id: int,
    max_label_len: int | None = None,
    lm=None,
    lm_weight: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (seqs [B, W, Lmax], lengths [B, W], scores [B, W]) sorted
    best-first; scores are total log P(prefix) = logaddexp(p_b, p_nb).

    ``lm`` (decoding.lm.DenseLM over label ids, boundary last) enables
    shallow fusion: each prefix EXTENSION adds ``lm_weight *
    log p_lm(tok | prefix)``; stay/blank moves add nothing, so merged
    equal prefixes carry identical LM terms and the merge stays exact."""
    B, T, V = logprobs.shape
    W = beam_width
    Lmax = max_label_len or T
    fuse = lm is not None and lm_weight != 0.0

    init = {
        # beam 0 = empty prefix (p_b=0); others dead
        "seqs": jnp.zeros((B, W, Lmax), jnp.int32),
        "lengths": jnp.zeros((B, W), jnp.int32),
        "pb": jnp.full((B, W), NEG_INF).at[:, 0].set(0.0),
        "pnb": jnp.full((B, W), NEG_INF),
        # unique per-slot hash for dead beams so they never merge
        "hash": -jnp.arange(1, W + 1, dtype=jnp.int32)[None, :].repeat(B, 0),
        "hash2": -jnp.arange(1, W + 1, dtype=jnp.int32)[None, :].repeat(B, 0),
        "last": jnp.full((B, W), -1, jnp.int32),
    }
    # the empty prefix of beam 0 gets the canonical empty hash (0)
    init["hash"] = init["hash"].at[:, 0].set(0)
    init["hash2"] = init["hash2"].at[:, 0].set(0)
    if fuse:
        init["lm"] = lm.init_state((B, W))

    # [V-1] vocab ids with blank removed — built from an in-graph iota
    # (a `jnp.array([...])` literal here would be another closed-over
    # constant; see the note on hash constants above)
    _ids = jnp.arange(V - 1, dtype=jnp.int32)
    nonblank_ids = jnp.where(_ids >= blank_id, _ids + 1, _ids)

    def step(state, inp):
        lp, valid = inp  # lp [B, V], valid [B]
        pb, pnb = state["pb"], state["pnb"]
        ptot = jnp.logaddexp(pb, pnb)  # [B, W]
        last = state["last"]

        lp_blank = lp[:, blank_id][:, None]  # [B, 1]
        lp_tok = lp[:, nonblank_ids]  # [B, V-1]

        # --- stay candidates (prefix unchanged) --------------------------
        stay_pb = ptot + lp_blank  # blank extension
        lp_last = jnp.where(
            last >= 0,
            jnp.take_along_axis(lp, jnp.maximum(last, 0), axis=-1),
            NEG_INF,
        )  # [B, W] — gather per beam, no [B, W, V] materialization
        stay_pnb = pnb + lp_last  # repeat last symbol (merges into prefix)

        # --- extension candidates [B, W, V-1] ----------------------------
        is_last = nonblank_ids[None, None, :] == last[..., None]
        base = jnp.where(is_last, pb[..., None], ptot[..., None])
        ext_pnb = base + lp_tok[:, None, :]
        if fuse:
            lm_lp = lm.logprobs(state["lm"])  # [B, W, Vlm]
            ext_pnb = ext_pnb + lm_weight * lm_lp[:, :, nonblank_ids]
        ext_pb = jnp.full_like(ext_pnb, NEG_INF)

        # candidate tensors: C = W * V  (V-1 extensions + 1 stay per beam)
        full = jnp.concatenate(
            [ext_pnb, stay_pnb[..., None]], axis=-1
        )  # [B, W, V]
        full_pb = jnp.concatenate(
            [ext_pb, stay_pb[..., None]], axis=-1
        )
        # hashes: extended = h * M + (tok + 1); stay = h
        h = state["hash"][..., None]
        h2 = state["hash2"][..., None]
        tok32 = (nonblank_ids + 1).astype(jnp.int32)[None, None, :]
        ext_h = h * 1000003 + tok32
        ext_h2 = h2 * 8191 + tok32
        cand_h = jnp.concatenate([ext_h, h], axis=-1)  # [B, W, V]
        cand_h2 = jnp.concatenate([ext_h2, h2], axis=-1)
        # parent/token bookkeeping
        cand_parent = jnp.broadcast_to(
            jnp.arange(W, dtype=jnp.int32)[None, :, None], (B, W, V)
        )
        cand_tok = jnp.concatenate(
            [
                jnp.broadcast_to(nonblank_ids[None, None, :], (B, W, V - 1)),
                jnp.full((B, W, 1), -1, jnp.int32),  # stay marker
            ],
            axis=-1,
        )

        C = W * V
        flat = lambda x: x.reshape(B, C)
        cand_h, cand_h2 = flat(cand_h), flat(cand_h2)
        cand_pb, cand_pnb = flat(full_pb), flat(full)
        cand_parent, cand_tok = flat(cand_parent), flat(cand_tok)

        # --- merge equal prefixes: sort by hash, segment-logsumexp -------
        order = jnp.argsort(cand_h, axis=-1)
        take = lambda x: jnp.take_along_axis(x, order, axis=-1)
        cand_h, cand_h2 = take(cand_h), take(cand_h2)
        cand_pb, cand_pnb = take(cand_pb), take(cand_pnb)
        cand_parent, cand_tok = take(cand_parent), take(cand_tok)

        prev_h = jnp.pad(
            cand_h[..., :-1], ((0, 0), (1, 0)), constant_values=-(2**31) + 1
        )
        prev_h2 = jnp.pad(
            cand_h2[..., :-1], ((0, 0), (1, 0)), constant_values=-(2**31) + 1
        )
        seg_start = (cand_h != prev_h) | (cand_h2 != prev_h2)
        m_pb = _segment_logsumexp_sorted(cand_pb, seg_start)
        m_pnb = _segment_logsumexp_sorted(cand_pnb, seg_start)
        total = jnp.logaddexp(m_pb, m_pnb)  # NEG_INF off segment heads

        # --- top-W candidates -------------------------------------------
        top_total, top_idx = jax.lax.top_k(total, W)
        g = lambda x: jnp.take_along_axis(x, top_idx, axis=-1)
        new_pb, new_pnb = g(m_pb), g(m_pnb)
        new_h, new_h2 = g(cand_h), g(cand_h2)
        parent, tok = g(cand_parent), g(cand_tok)

        # --- materialize prefixes ---------------------------------------
        old_seqs = jnp.take_along_axis(
            state["seqs"], parent[..., None], axis=1
        )
        old_len = jnp.take_along_axis(state["lengths"], parent, axis=1)
        old_last = jnp.take_along_axis(last, parent, axis=1)
        is_ext = tok >= 0
        # at capacity (old_len == Lmax) the stored prefix truncates: do
        # NOT overwrite its last token with later extensions (scoring
        # stays exact via the hashes; only storage is truncated)
        can_write = is_ext & (old_len < Lmax)
        write_pos = jnp.minimum(old_len, Lmax - 1)
        onehot = (
            jnp.arange(Lmax)[None, None, :] == write_pos[..., None]
        )
        new_seqs = jnp.where(
            can_write[..., None] & onehot, tok[..., None], old_seqs
        )
        new_len = jnp.where(
            is_ext & (old_len < Lmax), old_len + 1, old_len
        )
        new_last = jnp.where(is_ext, tok, old_last)

        # dead slots (NEG_INF total) keep unique negative hashes
        slot = jnp.arange(1, W + 1, dtype=jnp.int32)[None, :]
        dead = top_total < NEG_INF / 2
        new_h = jnp.where(dead, -slot, new_h)
        new_h2 = jnp.where(dead, -slot, new_h2)

        new_state = {
            "seqs": new_seqs,
            "lengths": new_len,
            "pb": new_pb,
            "pnb": new_pnb,
            "hash": new_h,
            "hash2": new_h2,
            "last": new_last,
        }
        if fuse:
            # the LM state is a deterministic function of the prefix,
            # so stepping AFTER selection from the chosen (parent, tok)
            # is exact — merged equal prefixes would have produced the
            # identical state — and never materializes [B, W, V]
            # candidate states (required for pytree neural-LM states)
            from nabu_tpu.decoding.lm import state_where

            parent_lm = jax.tree.map(
                lambda x: jnp.take_along_axis(
                    x,
                    parent.reshape(parent.shape + (1,) * (x.ndim - 2)),
                    axis=1,
                ),
                state["lm"],
            )
            new_state["lm"] = state_where(
                is_ext,
                lm.step(parent_lm, jnp.maximum(tok, 0)),
                parent_lm,
            )
        # frames past logit_length leave the state untouched
        keep = lambda new, old: jnp.where(
            valid.reshape((B,) + (1,) * (new.ndim - 1)), new, old
        )
        return jax.tree.map(keep, new_state, state), None

    lp_t = jnp.swapaxes(logprobs, 0, 1)  # [T, B, V]
    valid_t = (
        jnp.arange(T)[:, None] < logit_lengths[None, :]
    )  # [T, B]
    final, _ = jax.lax.scan(step, init, (lp_t, valid_t))

    scores = jnp.logaddexp(final["pb"], final["pnb"])
    ranked = jnp.argsort(-scores, axis=1)
    seqs = jnp.take_along_axis(final["seqs"], ranked[..., None], axis=1)
    lengths = jnp.take_along_axis(final["lengths"], ranked, axis=1)
    scores = jnp.take_along_axis(scores, ranked, axis=1)
    return seqs, lengths, scores
