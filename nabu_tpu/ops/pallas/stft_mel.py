"""Fused Pallas STFT + Mel filterbank kernel.

Replaces the reference's host-side numpy feature extraction
(nabu/processing/feature_computers/) with an on-device fused kernel
(BASELINE.json:5 "Pallas STFT+filterbank kernel"): windowing, DFT (as
two MXU matmuls against precomputed cos/sin matrices — the TPU-native
formulation of an rFFT), power spectrum, Mel projection and log are all
fused in VMEM, so the [N, W] frames block is read from HBM once and
only the [N, M] log-mel output is written back.

Oracle: nabu_tpu.features.jax_frontend.log_mel_spectrogram (pure jnp),
itself golden-tested against the numpy computers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nabu_tpu.ops.pallas import on_tpu


def _stft_mel_kernel(
    frames_ref,  # [TN, W] raw frames block
    window_ref,  # [1, W]
    cos_ref,  # [W, K]
    sin_ref,  # [W, K]
    mel_ref,  # [K, M]
    out_ref,  # [TN, M]
    *,
    inv_nfft: float,
):
    win = frames_ref[:] * window_ref[0, :][None, :]
    re = jnp.dot(win, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(win, sin_ref[:], preferred_element_type=jnp.float32)
    power = (re * re + im * im) * inv_nfft
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log(jnp.maximum(mel, 1e-30))


@functools.partial(jax.jit, static_argnames=("nfft", "interpret", "block_n"))
def stft_mel_pallas(
    frames: jnp.ndarray,  # [N, W] un-windowed frames
    window: jnp.ndarray,  # [W]
    dft_cos: jnp.ndarray,  # [W, K]
    dft_sin: jnp.ndarray,  # [W, K]
    mel: jnp.ndarray,  # [K, M]
    nfft: int,
    interpret: bool | None = None,
    block_n: int = 256,
) -> jnp.ndarray:
    """[N, W] frames -> [N, M] log-mel, fused on device."""
    if interpret is None:
        interpret = not on_tpu()
    N, W = frames.shape
    K = dft_cos.shape[1]
    M = mel.shape[1]
    block_n = min(block_n, max(8, N))
    n_pad = (-N) % block_n
    if n_pad:
        frames = jnp.pad(frames, ((0, n_pad), (0, 0)))
    grid = (frames.shape[0] // block_n,)

    out = pl.pallas_call(
        functools.partial(_stft_mel_kernel, inv_nfft=1.0 / nfft),
        out_shape=jax.ShapeDtypeStruct((frames.shape[0], M), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_n, W), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_n, M), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(frames, window[None, :], dft_cos, dft_sin, mel)
    return out[:N]
