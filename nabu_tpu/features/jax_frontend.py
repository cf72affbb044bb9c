"""Device-side (in-graph) feature extraction: batched STFT + log-Mel.

TPU-first design: instead of an FFT (poorly supported / non-MXU on TPU),
the spectrum is computed as two matmuls with precomputed DFT cos/sin
matrices — frames [N, W] @ dft [W, K] — which maps the entire frontend
(framing gather -> window -> DFT matmul -> power -> mel matmul -> log)
onto the MXU. This is the oracle-and-fallback for the fused Pallas
kernel in nabu_tpu.ops.pallas.stft_mel; both are golden-tested against
the numpy computers in nabu_tpu.features.computers.

Reference capability anchor: nabu/processing/feature_computers/ (numpy,
host-side only — the reference has no in-graph frontend at all).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from nabu_tpu.features import sigproc


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["window", "dft_cos", "dft_sin", "mel"],
    meta_fields=["frame_len", "frame_step", "nfft", "preemph"],
)
@dataclasses.dataclass(frozen=True)
class FrontendParams:
    """Non-trainable frontend constants, precomputed on host.

    Array fields are pytree leaves; the scalar framing parameters are
    static metadata (they affect shapes under jit).
    """

    window: jnp.ndarray  # [frame_len]
    dft_cos: jnp.ndarray  # [frame_len, nfft//2+1]
    dft_sin: jnp.ndarray  # [frame_len, nfft//2+1]
    mel: jnp.ndarray  # [nfft//2+1, nfilt]
    frame_len: int
    frame_step: int
    nfft: int
    preemph: float


def make_frontend_params(
    rate: float,
    winlen: float = 0.025,
    winstep: float = 0.010,
    nfft: int = 512,
    nfilt: int = 40,
    window: str = "hamming",
    preemph: float = 0.97,
    lowfreq: float = 0.0,
    highfreq: float | None = None,
) -> FrontendParams:
    frame_len = int(round(winlen * rate))
    frame_step = int(round(winstep * rate))
    k = nfft // 2 + 1
    n = np.arange(frame_len)[:, None]  # frames are zero-padded to nfft
    freqs = np.arange(k)[None, :]
    ang = 2.0 * np.pi * n * freqs / nfft
    return FrontendParams(
        window=jnp.asarray(sigproc.window(frame_len, window)),
        dft_cos=jnp.asarray(np.cos(ang), dtype=jnp.float32),
        dft_sin=jnp.asarray(-np.sin(ang), dtype=jnp.float32),
        mel=jnp.asarray(
            sigproc.get_filterbanks(nfilt, nfft, rate, lowfreq, highfreq).T
        ),
        frame_len=frame_len,
        frame_step=frame_step,
        nfft=nfft,
        preemph=preemph,
    )


def num_frames(num_samples: int, frame_len: int, frame_step: int) -> int:
    if num_samples <= frame_len:
        return 1
    return 1 + int(np.ceil((num_samples - frame_len) / frame_step))


def frame_signal(
    signal: jnp.ndarray, frame_len: int, frame_step: int, n_frames: int
) -> jnp.ndarray:
    """[S] -> [n_frames, frame_len] via gather (static n_frames)."""
    pad_len = (n_frames - 1) * frame_step + frame_len
    padded = jnp.pad(signal, (0, max(0, pad_len - signal.shape[0])))[:pad_len]
    idx = (
        jnp.arange(frame_len)[None, :]
        + jnp.arange(n_frames)[:, None] * frame_step
    )
    return padded[idx]


@functools.partial(jax.jit, static_argnames=("n_frames", "use_pallas"))
def log_mel_spectrogram(
    fp: FrontendParams,
    signal: jnp.ndarray,
    n_frames: int,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """One utterance [S] -> log-mel features [n_frames, nfilt]."""
    sig = jnp.asarray(signal, jnp.float32)
    if fp.preemph:
        sig = jnp.concatenate([sig[:1], sig[1:] - fp.preemph * sig[:-1]])
    frames = frame_signal(sig, fp.frame_len, fp.frame_step, n_frames)
    if use_pallas:
        from nabu_tpu.ops.pallas.stft_mel import stft_mel_pallas

        return stft_mel_pallas(
            frames, fp.window, fp.dft_cos, fp.dft_sin, fp.mel, fp.nfft
        )
    win = frames * fp.window[None, :]
    re = win @ fp.dft_cos
    im = win @ fp.dft_sin
    power = (re * re + im * im) * (1.0 / fp.nfft)
    mel_energies = power @ fp.mel
    return jnp.log(jnp.maximum(mel_energies, 1e-30))


def batched_log_mel(
    fp: FrontendParams,
    signals: jnp.ndarray,  # [B, S] zero-padded
    n_frames: int,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """[B, S] -> [B, n_frames, nfilt]."""
    return jax.vmap(
        lambda s: log_mel_spectrogram(fp, s, n_frames, use_pallas)
    )(signals)
