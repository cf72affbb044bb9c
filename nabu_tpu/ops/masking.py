"""Sequence masking utilities.

Capability parity with the reference's padded-batch handling
(nabu/neuralnetworks/components/ops.py: dense_sequence_to_sparse,
seq2nonseq/nonseq2seq): in a functional XLA design there is no sparse
conversion — everything stays densely padded and ops mask by length.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1.0e30


def sequence_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """[B] int lengths -> [B, maxlen] bool validity mask."""
    pos = jnp.arange(maxlen, dtype=lengths.dtype)[None, :]
    return pos < lengths[:, None]


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of values where mask, safe for empty masks."""
    mask = mask.astype(values.dtype)
    total = jnp.sum(values * mask)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    return total / count


def mask_logits(logits: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Set masked-out positions to a large negative (pre-softmax)."""
    return jnp.where(mask, logits, NEG_INF)
