"""One-pass joint CTC/attention beam search (hybrid decoding).

Beyond-parity decoder for the multi-head joint CTC/attention model
(BASELINE config 5): instead of decoding with one head and ignoring the
other, every beam expansion is scored with

    (1 - ctc_weight) * log P_att(c | g) + ctc_weight * dPsi_ctc(g, c)
    [+ lm_weight * log P_lm(c | g)]

where dPsi is the incremental CTC PREFIX log-probability (Watanabe et
al., "Hybrid CTC/Attention Architecture for End-to-End Speech
Recognition": the probability that the CTC output STARTS WITH g+c,
computed with the gamma^n/gamma^b forward recurrences). The attention
decoder proposes and orders candidates; the CTC head vetoes hypotheses
whose alignments the audio cannot support — the standard fix for
attention's deletion/looping failure modes.

TPU-first shape discipline: the scorer state rides the beam as two
[B, W, T] log arrays (gamma^n / gamma^b over frames for each
hypothesis); scoring one expansion step runs ONE lax.scan over T for
all B*W*K candidates at once (K = att-pruned candidate set, so the
[B, W, K, T] gather stays small). Everything else mirrors
beam.attention_beam_search (fixed-shape state, finished-beam freezing,
one top_k per step).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from nabu_tpu.decoding.beam import _gather_beams
from nabu_tpu.ops.masking import NEG_INF, sequence_mask


def _init_ctc_state(ctc_lp: jnp.ndarray, enc_mask: jnp.ndarray,
                    blank_id: int, W: int):
    """Scorer state of the EMPTY prefix: gamma^n = -inf, gamma^b[t] =
    sum of blank log-probs through t (emit nothing)."""
    B, T, _ = ctc_lp.shape
    r_b = jnp.cumsum(
        jnp.where(enc_mask, ctc_lp[:, :, blank_id], 0.0), axis=1
    )
    r_b = jnp.where(enc_mask, r_b, NEG_INF)  # dead past the length
    r_n = jnp.full((B, T), NEG_INF)
    tile = lambda x: jnp.repeat(x[:, None], W, axis=1)  # [B, W, T]
    return {
        "r_n": tile(r_n),
        "r_b": tile(r_b),
        "psi": jnp.zeros((B, W)),  # log prefix-prob of the hypothesis
        "last": jnp.full((B, W), -1, jnp.int32),
    }


def _ctc_extend(state, cand, ctc_lp, enc_mask, blank_id):
    """Score K candidate extensions per hypothesis.

    state: parent scorer state; cand [B, W, K] token ids (non-eos).
    Returns (psi_new [B, W, K], r_n_new, r_b_new [B, W, K, T]).
    """
    B, W, K = cand.shape
    T = ctc_lp.shape[1]
    # xs[b,w,k,t] = log p_t(c); gather [B, T, W*K] directly (no
    # [B, W, K, T, V] blow-up), NEG past the utterance length
    xs = jnp.take_along_axis(
        ctc_lp, cand.reshape(B, 1, W * K).astype(jnp.int32), axis=2
    )  # [B, T, W*K]
    xs = jnp.moveaxis(xs, 1, -1).reshape(B, W, K, T)
    xs = jnp.where(enc_mask[:, None, None, :], xs, NEG_INF)
    lp_blank = jnp.where(
        enc_mask, ctc_lp[:, :, blank_id], NEG_INF
    )[:, None, None, :]  # [B, 1, 1, T]

    # phi_t = gamma^b_t(g) (+ gamma^n_t(g) unless c repeats last(g))
    repeat = cand == state["last"][..., None]  # [B, W, K]
    phi = jnp.logaddexp(
        state["r_b"][:, :, None, :],
        jnp.where(
            repeat[..., None], NEG_INF, state["r_n"][:, :, None, :]
        ),
    )  # [B, W, K, T]

    # time-major scan over T; one step updates all B*W*K candidates
    xs_t = jnp.moveaxis(xs, -1, 0)  # [T, B, W, K]
    phi_t = jnp.moveaxis(phi, -1, 0)
    blank_t = jnp.moveaxis(
        jnp.broadcast_to(lp_blank, phi.shape), -1, 0
    )

    def step(carry, inp):
        r_n, r_b, psi = carry  # [B, W, K] each
        x, ph_prev, bl = inp  # x = xs[t], ph_prev = phi[t-1], bl = blank[t]
        new_r_n = x + jnp.logaddexp(r_n, ph_prev)
        new_r_b = bl + jnp.logaddexp(r_b, r_n)
        psi = jnp.logaddexp(psi, ph_prev + x)
        return (new_r_n, new_r_b, psi), (new_r_n, new_r_b)

    # t = 0: phi_{-1} = 0 for the empty parent (start-of-output), else
    # NEG — encoded by prepending a boundary phi row
    is_empty = (state["last"] < 0)[..., None]  # [B, W, 1]
    phi_boundary = jnp.where(is_empty, 0.0, NEG_INF) * jnp.ones((B, W, K))
    phi_shifted = jnp.concatenate(
        [phi_boundary[None], phi_t[:-1]], axis=0
    )
    init = (
        jnp.full((B, W, K), NEG_INF),
        jnp.full((B, W, K), NEG_INF),
        jnp.full((B, W, K), NEG_INF),
    )
    (_, _, psi), (r_n_t, r_b_t) = jax.lax.scan(
        step, init, (xs_t, phi_shifted, blank_t)
    )
    return psi, jnp.moveaxis(r_n_t, 0, -1), jnp.moveaxis(r_b_t, 0, -1)


def joint_ctc_att_beam_search(
    decoder,
    dparams,
    encoded: jnp.ndarray,  # [B, T, D]
    enc_lengths: jnp.ndarray,  # [B]
    ctc_logprobs: jnp.ndarray,  # [B, T, V] log-softmax of the CTC head
    beam_width: int,
    max_steps: int,
    ctc_weight: float = 0.3,
    pre_beam: int = 0,  # att-candidate pruning before CTC scoring
    length_norm_power: float = 0.0,
    blank_id: int | None = None,
    lm=None,
    lm_weight: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (seqs [B, W, max_steps], lengths, scores) best-first.

    ``decoder`` is the Speller head (step/init_state/sos_id/eos_id);
    the CTC head enters only through its frame log-probs. With
    ``ctc_weight = 0`` this reduces exactly to attention_beam_search's
    ranking; scores are the combined (1-w)*att + w*ctc totals (raw —
    length_norm_power only re-ranks).
    """
    B, T, D = encoded.shape
    W = beam_width
    V = decoder.output_dim
    eos = decoder.eos_id
    if blank_id is None:
        blank_id = ctc_logprobs.shape[-1] - 1
    # non-eos candidates that get CTC-scored per step; the default
    # follows the usual pre-beam convention (~1.5x the beam) so the
    # [B, W, K, T] scorer arrays stay small even for subword vocabs
    K = min(pre_beam or max(int(1.5 * W), 2), V - 1)
    aw, cw = 1.0 - ctc_weight, ctc_weight

    # encoder outputs / masks / attention keys shared across the beam
    # (not tiled W-fold): decoder.step broadcasts the [B*W] query over
    # the [B] encoding (see decoding/beam.py and Speller._attend)
    enc_mask = sequence_mask(enc_lengths, T)
    enc_keys = (
        decoder.precompute(dparams, encoded)
        if hasattr(decoder, "precompute") else None
    )
    fuse = lm is not None and lm_weight != 0.0

    init_scores = jnp.full((B, W), NEG_INF).at[:, 0].set(0.0)
    state = {
        "seqs": jnp.zeros((B, W, max_steps), jnp.int32),
        "scores": init_scores,
        "finished": jnp.zeros((B, W), bool),
        "lengths": jnp.zeros((B, W), jnp.int32),
        "prev": jnp.full((B, W), decoder.sos_id, jnp.int32),
        "att": jax.tree.map(
            lambda x: x.reshape((B, W) + x.shape[1:]),
            decoder.init_state(B * W, encoded.dtype, enc_frames=T),
        ),
        "ctc": _init_ctc_state(ctc_logprobs, enc_mask, blank_id, W),
        "t": jnp.int32(0),
    }
    if fuse:
        state["lm_state"] = lm.init_state((B, W))

    # full-utterance CTC log-prob of each hypothesis as COMPLETE output
    # (used when the candidate is eos): logaddexp of gamma at t = len-1
    t_last = jnp.maximum(enc_lengths.astype(jnp.int32) - 1, 0)

    def full_ctc(ctc_state):
        g = lambda r: jnp.take_along_axis(
            r, t_last[:, None, None], axis=2
        )[..., 0]  # [B, W]
        return jnp.logaddexp(g(ctc_state["r_n"]), g(ctc_state["r_b"]))

    def cond(s):
        return (s["t"] < max_steps) & ~jnp.all(s["finished"])

    def body(s):
        t = s["t"]
        flat_att = jax.tree.map(
            lambda x: x.reshape((B * W,) + x.shape[2:]), s["att"]
        )
        logits, new_att = decoder.step(
            dparams, s["prev"].reshape(B * W), flat_att, encoded,
            enc_mask, keys=enc_keys,
        )
        new_att.pop("attn_weights", None)
        new_att = jax.tree.map(
            lambda x: x.reshape((B, W) + x.shape[1:]), new_att
        )
        att_lp = jax.nn.log_softmax(
            logits.reshape(B, W, V).astype(jnp.float32), axis=-1
        )
        # LM fusion stays UNSCALED (the documented formula and the
        # other fused beams' convention) — fold it into a separate
        # proposal array so the (1-w) attention weight never touches it
        lm_lp = (
            lm_weight * lm.logprobs(s["lm_state"]) if fuse else None
        )

        # --- candidate pruning by combined proposal (non-eos) ----------
        proposal = att_lp if lm_lp is None else att_lp + lm_lp
        noneos_lp = proposal.at[..., eos].set(NEG_INF)
        _, cand = jax.lax.top_k(noneos_lp, K)  # [B, W, K]
        cand = cand.astype(jnp.int32)
        top_att = jnp.take_along_axis(att_lp, cand, axis=-1)
        top_lm = (
            jnp.take_along_axis(lm_lp, cand, axis=-1)
            if lm_lp is not None else 0.0
        )

        # --- CTC prefix scores for the pruned candidates ---------------
        psi_new, r_n_new, r_b_new = _ctc_extend(
            s["ctc"], cand, ctc_logprobs, enc_mask, blank_id
        )
        d_psi = psi_new - s["ctc"]["psi"][..., None]  # [B, W, K]

        # --- combined candidate matrix [B, W, K+1] (last col = eos) ----
        step_tok = aw * top_att + cw * d_psi + top_lm
        d_eos = full_ctc(s["ctc"]) - s["ctc"]["psi"]  # [B, W]
        step_eos = aw * att_lp[..., eos] + cw * d_eos
        if lm_lp is not None:
            step_eos = step_eos + lm_lp[..., eos]
        cand_scores = jnp.concatenate(
            [step_tok, step_eos[..., None]], axis=-1
        ) + s["scores"][..., None]
        # finished beams only extend with a zero-cost eos
        frozen = jnp.full((B, W, K + 1), NEG_INF).at[..., K].set(0.0)
        cand_scores = jnp.where(
            s["finished"][..., None],
            frozen + s["scores"][..., None],
            cand_scores,
        )

        top_scores, top_flat = jax.lax.top_k(
            cand_scores.reshape(B, W * (K + 1)), W
        )
        parent = (top_flat // (K + 1)).astype(jnp.int32)
        slot = (top_flat % (K + 1)).astype(jnp.int32)
        is_eos = slot == K
        token = jnp.where(
            is_eos,
            eos,
            jnp.take_along_axis(
                _gather_beams(cand, parent), slot[..., None], axis=2
            )[..., 0],
        )

        # gather parent state
        seqs = _gather_beams(s["seqs"], parent)
        lengths = _gather_beams(s["lengths"], parent)
        finished = _gather_beams(s["finished"], parent)
        att = _gather_beams(new_att, parent)
        # CTC scorer state: non-eos picks adopt the extension arrays
        pick = lambda x: jnp.take_along_axis(
            _gather_beams(x, parent), slot[..., None, None] % K, axis=2
        )[:, :, 0]  # [B, W, T]
        keep_r_n = _gather_beams(s["ctc"]["r_n"], parent)
        keep_r_b = _gather_beams(s["ctc"]["r_b"], parent)
        adopt = (~is_eos & ~finished)[..., None]
        ctc = {
            "r_n": jnp.where(adopt, pick(r_n_new), keep_r_n),
            "r_b": jnp.where(adopt, pick(r_b_new), keep_r_b),
            "psi": jnp.where(
                is_eos | finished,
                _gather_beams(s["ctc"]["psi"], parent),
                jnp.take_along_axis(
                    _gather_beams(psi_new, parent),
                    (slot % K)[..., None], axis=2,
                )[..., 0],
            ),
            "last": jnp.where(
                is_eos | finished,
                _gather_beams(s["ctc"]["last"], parent),
                token,
            ),
        }

        write = ~finished
        onehot_t = jax.nn.one_hot(t, max_steps, dtype=bool)
        seqs = jnp.where(
            write[..., None] & onehot_t[None, None, :],
            token[..., None], seqs,
        )
        lengths = jnp.where(write & ~is_eos, lengths + 1, lengths)
        new = {
            "seqs": seqs,
            "scores": top_scores,
            "finished": finished | is_eos,
            "lengths": lengths,
            "prev": token,
            "att": att,
            "ctc": ctc,
            "t": t + 1,
        }
        if fuse:
            from nabu_tpu.decoding.lm import state_where

            lm_state = _gather_beams(s["lm_state"], parent)
            new["lm_state"] = state_where(
                finished, lm_state, lm.step(lm_state, token)
            )
        return new

    final = jax.lax.while_loop(cond, body, state)
    norm = jnp.maximum(final["lengths"], 1).astype(jnp.float32) ** (
        length_norm_power
    )
    rank_key = final["scores"] / norm + jnp.where(
        final["finished"], 0.0, NEG_INF / 2
    )
    order = jnp.argsort(-rank_key, axis=1)
    return (
        _gather_beams(final["seqs"], order),
        jnp.take_along_axis(final["lengths"], order, axis=1),
        jnp.take_along_axis(final["scores"], order, axis=1),
    )
