"""Batched attention beam search, jit-compiled with fixed-shape beam
state in device memory.

Capability parity with the reference's beam-search machinery
(nabu/neuralnetworks/components/beam_search_decoder.py +
decoders/beam_search_decoder.py: a tf.while_loop over speller.step with
beam pruning). TPU-first re-design (BASELINE.json:5, PAPERS.md
vectorized-beam-search): no per-utterance graphs — the whole beam is a
``[B, W, ...]`` tensor program; the decoder state rides along flattened
to ``[B*W, ...]``; each step is one batched ``step()`` call + a top-k
over ``W*V`` candidates; the loop is a ``lax.while_loop`` that exits
early when every beam is finished.

Scoring: sum of token log-probs; finished beams stop accumulating and
are ranked by score / length^alpha (``length_norm_power``), matching
common LAS beam-search conventions.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from nabu_tpu.ops.masking import NEG_INF, sequence_mask


def _gather_beams(tree, beam_idx: jnp.ndarray):
    """Reindex the beam axis (axis 1) of every [B, W, ...] leaf."""
    return jax.tree.map(
        lambda x: jnp.take_along_axis(
            x,
            beam_idx.reshape(beam_idx.shape + (1,) * (x.ndim - 2)).astype(
                jnp.int32
            ),
            axis=1,
        ),
        tree,
    )


def attention_beam_search(
    decoder,
    dparams,
    encoded: jnp.ndarray,  # [B, T, D]
    enc_lengths: jnp.ndarray,  # [B]
    beam_width: int,
    max_steps: int,
    length_norm_power: float = 0.0,
    eos_bonus: float = 0.0,
    lm=None,
    lm_weight: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (seqs [B, W, max_steps], lengths [B, W], scores [B, W]),
    beams sorted best-first by length-normalized score. ``decoder`` is a
    Speller-like object with step()/init_state()/sos_id/eos_id.

    ``lm`` (a decoding.lm.DenseLM over the same vocab, eos included)
    enables shallow fusion: every candidate token's score gains
    ``lm_weight * log p_lm(token | history)``; the LM context rides the
    beam as one int32 per hypothesis."""
    B, T, D = encoded.shape
    W = beam_width
    V = decoder.output_dim
    eos = decoder.eos_id

    # encoder outputs / masks / attention keys are SHARED across the
    # beam (never tiled W-fold into HBM): decoder.step broadcasts a
    # [B*W]-hypothesis query over the [B]-utterance encoding, mapping
    # hypothesis w of utterance b to row b*W + w — exactly this file's
    # flattening order
    enc_mask = sequence_mask(enc_lengths, T)  # [B, T]
    # attention keys are step-invariant: project once, not per step
    enc_keys = (
        decoder.precompute(dparams, encoded)
        if hasattr(decoder, "precompute") else None
    )

    # initial state: only beam 0 is live, others start at -inf
    init_scores = jnp.full((B, W), NEG_INF, jnp.float32).at[:, 0].set(0.0)
    init = {
        "seqs": jnp.zeros((B, W, max_steps), jnp.int32),
        "scores": init_scores,
        "finished": jnp.zeros((B, W), bool),
        "lengths": jnp.zeros((B, W), jnp.int32),
        "prev": jnp.full((B, W), decoder.sos_id, jnp.int32),
        "state": jax.tree.map(
            lambda x: x.reshape((B, W) + x.shape[1:]),
            decoder.init_state(B * W, encoded.dtype, enc_frames=T),
        ),
        "t": jnp.int32(0),
    }
    fuse = lm is not None and lm_weight != 0.0
    if fuse:
        init["lm_state"] = lm.init_state((B, W))

    def cond(s):
        return (s["t"] < max_steps) & ~jnp.all(s["finished"])

    def body(s):
        t = s["t"]
        flat_state = jax.tree.map(
            lambda x: x.reshape((B * W,) + x.shape[2:]), s["state"]
        )
        logits, new_state = decoder.step(
            dparams,
            s["prev"].reshape(B * W),
            flat_state,
            encoded,
            enc_mask,
            keys=enc_keys,
        )
        new_state.pop("attn_weights", None)
        new_state = jax.tree.map(
            lambda x: x.reshape((B, W) + x.shape[1:]), new_state
        )
        # score in float32 regardless of the model compute dtype
        logprobs = jax.nn.log_softmax(
            logits.reshape(B, W, V).astype(jnp.float32), axis=-1
        )
        if eos_bonus:
            logprobs = logprobs.at[..., eos].add(eos_bonus)
        if fuse:
            logprobs = logprobs + lm_weight * lm.logprobs(s["lm_state"])

        # finished beams may only "extend" with eos at zero cost
        frozen = jnp.full((B, W, V), NEG_INF).at[..., eos].set(0.0)
        cand = s["scores"][..., None] + jnp.where(
            s["finished"][..., None], frozen, logprobs
        )  # [B, W, V]

        top_scores, top_flat = jax.lax.top_k(cand.reshape(B, W * V), W)
        parent = (top_flat // V).astype(jnp.int32)  # [B, W]
        token = (top_flat % V).astype(jnp.int32)

        seqs = _gather_beams(s["seqs"], parent)
        lengths = _gather_beams(s["lengths"], parent)
        finished = _gather_beams(s["finished"], parent)
        state = _gather_beams(new_state, parent)

        # write the token at position t for live beams
        write = ~finished
        onehot_t = jax.nn.one_hot(t, max_steps, dtype=bool)  # [max_steps]
        seqs = jnp.where(
            write[..., None] & onehot_t[None, None, :],
            token[..., None],
            seqs,
        )
        lengths = jnp.where(
            write & (token != eos), lengths + 1, lengths
        )
        new = {
            "seqs": seqs,
            "scores": top_scores,
            "finished": finished | (token == eos),
            "lengths": lengths,
            "prev": token,
            "state": state,
            "t": t + 1,
        }
        if fuse:
            # context advances only while the hypothesis is live (the
            # state may be a pytree — neural LM — hence state_where)
            from nabu_tpu.decoding.lm import state_where

            lm_state = _gather_beams(s["lm_state"], parent)
            new["lm_state"] = state_where(
                finished, lm_state, lm.step(lm_state, token)
            )
        return new

    final = jax.lax.while_loop(cond, body, init)

    # rank by length-normalized score (eos excluded from length);
    # finished hypotheses outrank unfinished ones, whose scores lack the
    # final eos term
    norm = jnp.maximum(final["lengths"], 1).astype(jnp.float32) ** (
        length_norm_power
    )
    rank_key = final["scores"] / norm + jnp.where(
        final["finished"], 0.0, NEG_INF / 2
    )
    ranked = jnp.argsort(-rank_key, axis=1)
    seqs = _gather_beams(final["seqs"], ranked)
    lengths = jnp.take_along_axis(final["lengths"], ranked, axis=1)
    scores = jnp.take_along_axis(final["scores"], ranked, axis=1)
    return seqs, lengths, scores
