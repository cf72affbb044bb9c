"""In-graph training-time augmentation: SpecAugment.

Beyond-parity addition (the reference has no augmentation): masks
random frequency bands and time spans of the [B, T, F] feature batch
inside the jitted train step (Park et al., 2019, "SpecAugment"). All
shapes are static — masks are arange comparisons, so XLA fuses the
whole thing into the input cast with no extra HBM traffic.

Configured in ``[model]``::

    spec_augment = true
    spec_freq_masks = 2     # number of frequency masks
    spec_freq_width = 10    # max bins per frequency mask
    spec_time_masks = 2     # number of time masks
    spec_time_width = 50    # max frames per time mask
    spec_time_ratio = 0.2   # cap: max fraction of the utterance length

Masked positions are set to 0.0 (features are CMVN-normalized log-mel,
so zero is the per-channel mean).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def parse_spec_augment_conf(conf) -> dict | None:
    """[model] section -> static SpecAugment params (None if disabled)."""
    if conf is None or not conf.getbool("spec_augment", False):
        return None
    return {
        "freq_masks": conf.getint("spec_freq_masks", 2),
        "freq_width": conf.getint("spec_freq_width", 10),
        "time_masks": conf.getint("spec_time_masks", 2),
        "time_width": conf.getint("spec_time_width", 50),
        "time_ratio": conf.getfloat("spec_time_ratio", 0.2),
    }


def spec_augment(
    rng,
    features: jnp.ndarray,  # [B, T, F]
    lengths: jnp.ndarray,  # [B]
    freq_masks: int = 2,
    freq_width: int = 10,
    time_masks: int = 2,
    time_width: int = 50,
    time_ratio: float = 0.2,
) -> jnp.ndarray:
    """Apply SpecAugment masks; returns features with masked regions 0."""
    B, T, F = features.shape
    keep = jnp.ones((B, T, F), jnp.bool_)
    t_pos = jnp.arange(T)[None, :, None]  # broadcast [B, T, F]
    f_pos = jnp.arange(F)[None, None, :]

    # Park et al.: sample the mask width first, THEN the start uniform
    # over [0, dim - w] — start and width must not be independent, or
    # the last bins/frames are never masked and a width cap > dim lets
    # one mask zero the whole axis.
    fw = min(freq_width, F - 1)
    for i in range(freq_masks):
        k_w, k_s, rng = jax.random.split(rng, 3)
        w = jax.random.randint(k_w, (B, 1, 1), 0, fw + 1)
        u_s = jax.random.uniform(k_s, (B, 1, 1))
        start = (u_s * (F - w + 1).astype(jnp.float32)).astype(jnp.int32)
        keep &= ~((f_pos >= start) & (f_pos < start + w))

    max_t = jnp.maximum(
        jnp.minimum(
            jnp.int32(time_width),
            (time_ratio * lengths.astype(jnp.float32)).astype(jnp.int32),
        ),
        0,
    )[:, None, None]  # [B,1,1] per-utterance width cap
    for i in range(time_masks):
        k_w, k_s, rng = jax.random.split(rng, 3)
        u_w = jax.random.uniform(k_w, (B, 1, 1))
        w = (u_w * (max_t + 1).astype(jnp.float32)).astype(jnp.int32)
        u_s = jax.random.uniform(k_s, (B, 1, 1))
        span = jnp.maximum(
            lengths[:, None, None].astype(jnp.int32) - w + 1, 1
        )
        start = (u_s * span.astype(jnp.float32)).astype(jnp.int32)
        keep &= ~((t_pos >= start) & (t_pos < start + w))

    return jnp.where(keep, features, jnp.zeros((), features.dtype))
