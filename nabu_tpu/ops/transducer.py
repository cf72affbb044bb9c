"""RNN-T (transducer) loss: log-space lattice forward in pure JAX.

Beyond-parity addition: the reference (vrenkens/nabu) has no transducer
models — its families are CTC and attention (LAS). RNN-T is the third
classic end-to-end ASR family (Graves 2012, "Sequence Transduction with
Recurrent Neural Networks") and the streaming-friendly one, so the
framework ships it alongside CTC/attention behind the same head/loss
registries.

TPU-first design notes
----------------------
The forward variable ``alpha[t, u]`` obeys

    alpha[t, u] = logaddexp(alpha[t-1, u] + blank[t-1, u],
                            alpha[t,   u-1] + emit[t, u-1])

which is sequential in BOTH t and u if evaluated naively (T*U dependent
steps — hostile to a machine that wants wide vector work per step).
Here the u-recurrence is closed out per time step: with
``base[u] = alpha[t-1, u] + blank[t-1, u]`` and ``e[u] = emit[t, u-1]``,

    alpha[t, u] = logsumexp_{k<=u}( base[k] + sum_{j=k+1..u} e[j] )
                = E[u] + cumlogsumexp(base - E)[u],   E = cumsum(e)

so one ``lax.scan`` over T does a fully-vectorised [B, U+1] update per
step (cumsum + cumlogsumexp on the VPU), instead of a T*U-step double
scan. Gradients come from autodiff of this scan; the d(logits) it yields
equals the classic occupancy formula (tested against brute-force
enumeration of all alignments in tests/test_transducer.py).

Padding: emit log-probs at u >= target_length are masked to a large
negative finite value (NOT -inf: E picks up the mask via cumsum and
``base - E`` would form inf - inf = nan on the padded tail). Masked
lanes only need to stay ~1e9 below real scores, which survives f32.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG = -1e9  # "log zero" that is safe under cumsum/cumlogsumexp in f32


def _lattice_logprobs(
    logits: jnp.ndarray,  # [B, T, U+1, V] float
    targets: jnp.ndarray,  # [B, U] int
    target_lengths: jnp.ndarray,  # [B]
    blank_id: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split the joint lattice into blank/emit log-probs.

    Returns (lp_blank [B, T, U+1], lp_emit [B, T, U]); emit positions at
    u >= target_length are masked to NEG.

    HBM discipline: the (possibly bf16) lattice is upcast inside this
    one log_softmax — the Model container deliberately skips its usual
    f32 output cast for 4-D lattices, which measured ~2% faster
    end-to-end than cast-then-log_softmax. (A logsumexp+gather variant
    that avoids materializing the log-probs array entirely was measured
    ~3% SLOWER on TPU — the split reduce+gather consumers fuse worse
    than one log_softmax pass — so this keeps the single
    materialization.)
    """
    logits32 = logits.astype(jnp.float32)  # fused into each consumer
    logprobs = jax.nn.log_softmax(logits32, axis=-1)
    lp_blank = logprobs[..., blank_id]
    U = targets.shape[1]
    tgt = targets[:, None, :, None].astype(jnp.int32)  # [B, 1, U, 1]
    tgt = jnp.broadcast_to(tgt, (targets.shape[0], logits.shape[1], U, 1))
    lp_emit = jnp.take_along_axis(
        logprobs[:, :, :U, :], tgt, axis=-1
    )[..., 0]  # [B, T, U]
    u_mask = jnp.arange(U)[None, None, :] < target_lengths[:, None, None]
    lp_emit = jnp.where(u_mask, lp_emit, NEG)
    return lp_blank, lp_emit


def transducer_loss(
    logits: jnp.ndarray,  # [B, T, U+1, V] joint lattice (V includes blank)
    logit_lengths: jnp.ndarray,  # [B] valid encoder frames
    targets: jnp.ndarray,  # [B, U] label ids (no blank)
    target_lengths: jnp.ndarray,  # [B]
    blank_id: Optional[int] = None,
) -> jnp.ndarray:
    """Per-example RNN-T negative log likelihood, shape [B].

    ``logits[b, t, u]`` scores the next output after consuming encoder
    frames 0..t and emitting the first u target labels. blank defaults
    to the last index (the framework's CTC convention).
    """
    B, T, Up1, V = logits.shape
    if blank_id is None:
        blank_id = V - 1
    blank_id = blank_id % V
    lp_blank, lp_emit = _lattice_logprobs(
        logits, targets, target_lengths, blank_id
    )

    # alpha at t=0: only emissions from frame 0 reach (0, u)
    alpha0 = jnp.concatenate(
        [
            jnp.zeros((B, 1), jnp.float32),
            jnp.cumsum(lp_emit[:, 0, :], axis=-1),
        ],
        axis=-1,
    )  # [B, U+1]
    alpha0 = jnp.maximum(alpha0, NEG)

    # the path ends by emitting blank from (t = T_b - 1, u = U_b)
    u_final = target_lengths[:, None].astype(jnp.int32)  # [B, 1]

    # scan over t = 1..T-1; inputs are blank lps at t-1 and emit lps at t
    lp_blank_tm1 = jnp.swapaxes(lp_blank[:, :-1, :], 0, 1)  # [T-1, B, U+1]
    lp_emit_t = jnp.swapaxes(lp_emit[:, 1:, :], 0, 1)  # [T-1, B, U]

    def scan_step(alpha, inp):
        lp_b_prev, lp_e_t = inp
        base = alpha + lp_b_prev
        e = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.float32), lp_e_t], axis=-1
        )
        E = jnp.cumsum(e, axis=-1)
        new_alpha = E + jax.lax.cumlogsumexp(base - E, axis=1)
        new_alpha = jnp.maximum(new_alpha, NEG)
        return new_alpha, new_alpha

    _, alphas_rest = jax.lax.scan(
        scan_step, alpha0, (lp_blank_tm1, lp_emit_t)
    )  # [T-1, B, U+1]
    alphas = jnp.concatenate(
        [alpha0[None], alphas_rest], axis=0
    )  # [T, B, U+1]

    # ll[t] = alpha[t, U_b] + blank(t, U_b); answer is at t = T_b - 1
    a_end = jnp.take_along_axis(
        alphas, u_final.T[..., None].astype(jnp.int32), axis=2
    )[..., 0]  # [T, B]
    b_end = jnp.take_along_axis(
        lp_blank, u_final[:, None, :], axis=2
    )[..., 0]  # [B, T]
    ll_t = a_end.T + b_end  # [B, T]
    t_final = jnp.clip(logit_lengths.astype(jnp.int32) - 1, 0, T - 1)
    ll = jnp.take_along_axis(ll_t, t_final[:, None], axis=1)[:, 0]
    return -ll
