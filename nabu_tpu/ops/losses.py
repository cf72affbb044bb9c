"""Loss computers: CTC and label-smoothed cross-entropy, plus the
weighted multi-head (joint CTC/attention) combination.

Capability parity with the reference's loss computers (CTC via
tf.nn.ctc_loss, sequence CE with appended <eos> and label smoothing —
SURVEY.md §2 loss rows, BASELINE.json:5). Every loss masks padding by
sequence length and fill examples by ``example_mask``, and reduces to a
mean over real target tokens (CE) or real examples (CTC).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from nabu_tpu.ops import ctc as ctc_ops
from nabu_tpu.registry import LOSSES


@LOSSES.register("ctc")
def ctc_loss_fn(
    logits: jnp.ndarray,  # [B, T, V+1]
    logit_lengths: jnp.ndarray,
    targets: jnp.ndarray,  # [B, L]
    target_lengths: jnp.ndarray,
    example_mask: jnp.ndarray,  # [B] float
    label_smoothing: float = 0.0,
    blank_id: int | None = None,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Mean per-example CTC negative log likelihood. ``use_pallas``
    switches to the fused forward-backward kernel
    (nabu_tpu.ops.pallas.ctc_batched).

    Examples with no feasible alignment (target longer than the logit
    sequence allows — truncation/subsampling artifacts) are excluded
    from the loss mean entirely and counted in ``ctc_infeasible_frac``,
    so a poisoned batch trains on its healthy examples.
    """
    del label_smoothing  # not applicable to CTC
    feasible = ctc_ops.ctc_feasible(
        logit_lengths, targets, target_lengths
    ).astype(example_mask.dtype)
    if use_pallas:
        from nabu_tpu.ops.pallas.ctc_batched import (
            ctc_loss_pallas_batched as ctc_loss_pallas,
        )

        nll = ctc_loss_pallas(
            logits, logit_lengths, targets, target_lengths,
            blank_id if blank_id is not None else logits.shape[-1] - 1,
            None,
        )
    else:
        nll = ctc_ops.ctc_loss(
            logits, logit_lengths, targets, target_lengths, blank_id
        )  # [B]
    real = jnp.maximum(example_mask.sum(), 1.0)
    mask = example_mask * feasible
    denom = jnp.maximum(mask.sum(), 1.0)
    loss = jnp.sum(nll * mask) / denom
    frames = jnp.maximum(jnp.sum(logit_lengths * mask), 1.0)
    return loss, {
        "ctc_nll_per_frame": jnp.sum(nll * mask) / frames,
        "ctc_infeasible_frac": jnp.sum(
            example_mask * (1.0 - feasible)
        ) / real,
    }


@LOSSES.register("cross_entropy")
@LOSSES.register("ce")
def cross_entropy_loss_fn(
    logits: jnp.ndarray,  # [B, L+1, V+1] (speller output incl. eos step)
    logit_lengths: jnp.ndarray,  # [B] == target_lengths + 1
    targets: jnp.ndarray,  # [B, L] (no eos)
    target_lengths: jnp.ndarray,
    example_mask: jnp.ndarray,
    label_smoothing: float = 0.0,
    blank_id=None,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    del use_pallas  # CE has no kernel variant
    """Label-smoothed sequence CE with <eos> appended at target_lengths.

    Token mean over real (non-pad, non-fill) positions, eos included.
    """
    del blank_id
    B, Lp1, V = logits.shape
    eos_id = V - 1
    # extend targets with eos at position target_lengths
    pad_tgt = jnp.pad(targets, ((0, 0), (0, Lp1 - targets.shape[1])))
    pos = jnp.arange(Lp1)[None, :]
    tgt_ext = jnp.where(pos == target_lengths[:, None], eos_id, pad_tgt)
    valid = (pos <= target_lengths[:, None]) & (
        example_mask[:, None] > 0
    )  # [B, L+1]

    logprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(
        logprobs, tgt_ext[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(logprobs, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth

    denom = jnp.maximum(valid.sum(), 1)
    loss = jnp.sum(jnp.where(valid, nll, 0.0)) / denom
    acc = jnp.sum(
        jnp.where(valid, (jnp.argmax(logits, -1) == tgt_ext), False)
    ) / denom
    return loss, {"token_accuracy": acc}


@LOSSES.register("transducer")
@LOSSES.register("rnnt")
def transducer_loss_fn(
    logits: jnp.ndarray,  # [B, T, U+1, V+1] joint lattice
    logit_lengths: jnp.ndarray,  # [B] valid encoder frames
    targets: jnp.ndarray,  # [B, U]
    target_lengths: jnp.ndarray,
    example_mask: jnp.ndarray,
    label_smoothing: float = 0.0,
    blank_id: int | None = None,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Mean per-example RNN-T negative log likelihood (ops/transducer.py).

    Beyond-parity loss for the transducer head (models/transducer.py).
    With ``use_pallas`` the head emits a projection dict instead of the
    lattice and the fused Pallas joint+loss kernel
    (ops/pallas/transducer.py) computes the NLL without the
    [B, T, U+1, V+1] tensor ever reaching HBM."""
    del label_smoothing, use_pallas
    if isinstance(logits, dict):  # fused-kernel projection handle
        from nabu_tpu.ops.pallas.transducer import transducer_loss_fused

        nll = transducer_loss_fused(
            logits["enc_proj"],
            logits["pred_proj"],
            logits["w_out"],
            logits["b_out"],
            logit_lengths,
            targets,
            target_lengths,
            blank_id,
        )
    else:
        from nabu_tpu.ops.transducer import transducer_loss

        nll = transducer_loss(
            logits, logit_lengths, targets, target_lengths, blank_id
        )  # [B]
    denom = jnp.maximum(example_mask.sum(), 1.0)
    loss = jnp.sum(nll * example_mask) / denom
    frames = jnp.maximum(jnp.sum(logit_lengths * example_mask), 1.0)
    return loss, {
        "transducer_nll_per_frame": jnp.sum(nll * example_mask) / frames
    }


def make_loss_computer(model) -> Callable:
    """Build the multi-head weighted loss for a Model.

    Returns ``loss_fn(params, batch, rng, train) -> (scalar, metrics)``
    where batch is the dict from pipeline.batch_to_arrays. Head weights
    and loss types come from each head's config section (joint
    CTC/attention = two heads over the shared encoder).
    """

    head_specs = {}
    for name in model.decoders:
        loss_name, weight = model.head_loss(name)
        blank_id = getattr(model.decoders[name], "blank_id", None)
        smoothing = model.head_confs[name].getfloat("label_smoothing", 0.0)
        use_pallas = model.head_confs[name].getbool("use_pallas", False)
        head_specs[name] = (
            LOSSES.get(loss_name),
            weight,
            smoothing,
            blank_id,
            use_pallas,
        )

    def loss_fn(params, batch, rng, train: bool):
        outputs = model.apply(
            params,
            batch["features"],
            batch["feature_lengths"],
            targets=batch.get("targets"),
            target_lengths=batch.get("target_lengths"),
            train=train,
            rng=rng,
        )
        total = 0.0
        metrics: Dict[str, jnp.ndarray] = {}
        for name, (
            fn, weight, smoothing, blank_id, use_pallas
        ) in head_specs.items():
            logits, logit_lengths = outputs[name]
            loss, m = fn(
                logits,
                logit_lengths,
                batch["targets"],
                batch["target_lengths"],
                batch["example_mask"],
                label_smoothing=smoothing,
                blank_id=blank_id,
                use_pallas=use_pallas,
            )
            total = total + weight * loss
            metrics[f"loss/{name}"] = loss
            for k, v in m.items():
                metrics[f"{name}/{k}"] = v
        metrics["loss"] = total
        return total, metrics

    return loss_fn
