"""MWER (minimum word error rate) sequence training.

Beyond-parity subsystem: discriminative fine-tuning that optimizes the
metric we actually report (token error rate) instead of teacher-forced
likelihood (Prabhavalkar et al. 2018, "Minimum Word Error Rate
Training for Attention-based Sequence-to-Sequence Models").

Per step, for each utterance:

1. decode an N-best list with the existing batched attention beam
   search (non-differentiable: integer outputs of a while_loop over
   stop-gradient params),
2. re-score every hypothesis teacher-forced (differentiable: one
   batched ``dec.apply`` over B*N sequences sharing one encoder pass),
3. count token edit errors of each hypothesis against the reference
   IN-GRAPH (vectorized Levenshtein: a ``lax.scan`` over hypothesis
   positions whose insertion recurrence — a running-min chain along the
   reference axis — is closed out per step with one ``cummin``, so the
   whole DP is O(L) cheap vector steps, not O(L*U) scalar ones),
4. loss = sum_n p̂_n (W_n − W̄): p̂ renormalized over the N-best,
   W̄ the mean error rate over the list (the standard variance-reducing
   baseline).

The usual cross-entropy interpolation (``mwer_ce_weight``) and all
other configured heads (e.g. a CTC head of a joint model) train from
the SAME differentiable encoder pass, so an MWER step costs two encoder
passes total (one inside the no-grad search, one with gradients).

Enabled by ``[trainer] mwer = true`` — trainer.py swaps its loss
computer for ``make_mwer_loss_computer``. Keys: ``mwer_beam`` (N,
default 4), ``mwer_ce_weight`` (default 0.01), ``mwer_head`` (default:
the first autoregressive head), ``mwer_extra_steps`` (decode budget
beyond the reference length, default 4).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from nabu_tpu.config import Conf


def token_edit_distance(
    hyps: jnp.ndarray,  # [B, L] int
    hyp_lengths: jnp.ndarray,  # [B]
    refs: jnp.ndarray,  # [B, U] int
    ref_lengths: jnp.ndarray,  # [B]
) -> jnp.ndarray:
    """Batched Levenshtein distance (substitution/insert/delete cost 1)
    between padded id sequences; returns [B] int32."""
    B, L = hyps.shape
    U = refs.shape[1]
    j = jnp.arange(U + 1)

    # row[j] = d(hyp[:i], ref[:j]); row 0 = j (delete all of ref prefix)
    row0 = jnp.broadcast_to(j, (B, U + 1)).astype(jnp.int32)

    def step(row, inp):
        tok, i = inp  # tok [B], i scalar (1-based hyp position)
        sub = (tok[:, None] != refs).astype(jnp.int32)  # [B, U]
        # base[j] = min(row[j] + 1, row[j-1] + sub_j) for j >= 1
        base = jnp.minimum(row[:, 1:] + 1, row[:, :-1] + sub)
        base = jnp.concatenate(
            [jnp.full((B, 1), i, jnp.int32), base], axis=1
        )  # j = 0: i deletions
        # close the insertion chain new[j] = min(base[j], new[j-1]+1):
        # new[j] = j + cummin_{k<=j}(base[k] - k)
        new = jax.lax.cummin(base - j, axis=1) + j
        # freeze rows past each hypothesis's length
        live = (i <= hyp_lengths)[:, None]
        return jnp.where(live, new, row), None

    toks = jnp.swapaxes(hyps, 0, 1).astype(jnp.int32)  # [L, B]
    row, _ = jax.lax.scan(step, row0, (toks, jnp.arange(1, L + 1)))
    return jnp.take_along_axis(
        row, ref_lengths[:, None].astype(jnp.int32), axis=1
    )[:, 0]


def make_mwer_loss_computer(model, conf: Conf) -> Callable:
    """Loss computer (same contract as ops.losses.make_loss_computer)
    implementing MWER over the model's attention head."""
    from nabu_tpu.decoding.beam import attention_beam_search
    from nabu_tpu.ops.losses import LOSSES

    head = conf.get("mwer_head") or next(
        (
            name
            for name, dec in model.decoders.items()
            if hasattr(dec, "step") and hasattr(dec, "init_state")
        ),
        None,
    )
    if head is None:
        raise ValueError(
            "MWER needs an autoregressive (speller) head to decode "
            "N-best lists from; this model has none"
        )
    dec = model.decoders[head]
    N = conf.getint("mwer_beam", 4)
    ce_weight = conf.getfloat("mwer_ce_weight", 0.01)
    extra = conf.getint("mwer_extra_steps", 4)

    # the interpolated CE / auxiliary-head losses reuse the model's
    # configured per-head specs
    head_specs = {}
    for name in model.decoders:
        loss_name, weight = model.head_loss(name)
        head_specs[name] = (
            LOSSES.get(loss_name),
            weight,
            model.head_confs[name].getfloat("label_smoothing", 0.0),
            getattr(model.decoders[name], "blank_id", None),
            model.head_confs[name].getbool("use_pallas", False),
        )

    def loss_fn(params, batch, rng, train: bool):
        feats = batch["features"]
        flens = batch["feature_lengths"]
        tgts = batch["targets"]
        tlens = batch["target_lengths"]
        emask = batch["example_mask"].astype(jnp.float32)
        B, U = tgts.shape
        max_steps = U + extra

        # 1. N-best decode, gradient-free
        sg = jax.lax.stop_gradient(params)
        enc_sg, enc_lens_sg = model.encode(sg, feats, flens, train=False)
        seqs, hyp_lens, _ = attention_beam_search(
            dec,
            model._cast_in(sg["decoders"][head]),
            enc_sg,
            enc_lens_sg,
            beam_width=N,
            max_steps=max_steps,
        )  # [B, N, max_steps], [B, N]

        # 2. differentiable teacher-forced re-scoring over one shared
        # encoder pass (also feeds the CE/auxiliary-head losses)
        rng_enc, rng_dec = jax.random.split(rng)
        encoded, enc_lens = model.encode(
            params, feats, flens, train=train, rng=rng_enc
        )
        enc_t = jnp.repeat(encoded, N, axis=0)
        enc_lens_t = jnp.repeat(enc_lens, N, axis=0)
        hyp = seqs.reshape(B * N, max_steps)
        hyp_len_flat = hyp_lens.reshape(B * N)
        dparams = model._cast_in(params["decoders"][head])
        logits, _ = dec.apply(
            dparams, enc_t, enc_lens_t, hyp, hyp_len_flat
        )  # [B*N, max_steps+1, V]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # token at position t: hyp_t for t < len, eos at t == len
        pos = jnp.arange(max_steps + 1)[None, :]
        tok = jnp.concatenate(
            [hyp, jnp.full((B * N, 1), dec.eos_id, hyp.dtype)], axis=1
        )
        tok = jnp.where(
            pos == hyp_len_flat[:, None], dec.eos_id, tok
        )
        tok_lp = jnp.take_along_axis(logp, tok[..., None], axis=-1)[..., 0]
        seq_logp = jnp.sum(
            jnp.where(pos <= hyp_len_flat[:, None], tok_lp, 0.0), axis=1
        ).reshape(B, N)

        # 3. in-graph token errors vs the reference
        errs = token_edit_distance(
            hyp, hyp_len_flat,
            jnp.repeat(tgts, N, axis=0), jnp.repeat(tlens, N, axis=0),
        ).reshape(B, N).astype(jnp.float32)

        # 4. expected relative risk over the renormalized N-best
        p_hat = jax.nn.softmax(seq_logp, axis=1)
        w_bar = jnp.mean(errs, axis=1, keepdims=True)
        per_utt = jnp.sum(p_hat * (errs - w_bar), axis=1)
        denom = jnp.maximum(emask.sum(), 1.0)
        mwer = jnp.sum(per_utt * emask) / denom

        total = mwer
        metrics: Dict[str, jnp.ndarray] = {
            "loss/mwer": mwer,
            "mwer/expected_errors": jnp.sum(
                jnp.sum(p_hat * errs, axis=1) * emask
            ) / denom,
            "mwer/oracle_errors": jnp.sum(
                jnp.min(errs, axis=1) * emask
            ) / denom,
        }

        # 5. CE interpolation + auxiliary heads, from the same encoder
        if ce_weight != 0.0:
            for name, (
                fn, weight, smoothing, blank_id, use_pallas
            ) in head_specs.items():
                rng_dec, sub = jax.random.split(rng_dec)
                with jax.named_scope(f"decoder_{name}"):
                    hlogits, hlens = model.decoders[name].apply(
                        model._cast_in(params["decoders"][name]),
                        encoded, enc_lens,
                        targets=tgts, target_lengths=tlens,
                        train=train, rng=sub,
                    )
                    if not isinstance(hlogits, dict) and hlogits.ndim < 4:
                        hlogits = hlogits.astype(jnp.float32)
                loss, m = fn(
                    hlogits, hlens, tgts, tlens, batch["example_mask"],
                    label_smoothing=smoothing, blank_id=blank_id,
                    use_pallas=use_pallas,
                )
                total = total + ce_weight * weight * loss
                metrics[f"loss/{name}"] = loss
                for k, v in m.items():
                    metrics[f"{name}/{k}"] = v
        metrics["loss"] = total
        return total, metrics

    return loss_fn
