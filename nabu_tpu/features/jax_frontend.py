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
    # rfft(x, nfft) TRUNCATES frames longer than nfft (numpy semantics,
    # matched by the host powspec oracle): samples past nfft contribute
    # nothing, so zero their DFT rows
    trunc = (n < nfft).astype(np.float32)
    return FrontendParams(
        window=jnp.asarray(sigproc.window(frame_len, window)),
        dft_cos=jnp.asarray(np.cos(ang) * trunc, dtype=jnp.float32),
        dft_sin=jnp.asarray(-np.sin(ang) * trunc, dtype=jnp.float32),
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


# ---------------------------------------------------------------------------
# serving frontend: a database.conf [features] section, in-graph
# ---------------------------------------------------------------------------

def _delta_clip(feat: jnp.ndarray, lens: jnp.ndarray, n: int = 2):
    """Per-utterance delta with edge handling at the TRUE length.

    Matches sigproc.delta on the unpadded utterance: out[t] =
    sum_i i * feat[clip(t+i, 0, len-1)] / (2 * sum i^2).
    """
    T = feat.shape[1]
    t = jnp.arange(T)[None, :]
    denom = 2.0 * sum(i * i for i in range(1, n + 1))
    acc = jnp.zeros_like(feat)
    for i in range(-n, n + 1):
        if i == 0:
            continue
        idx = jnp.clip(t + i, 0, jnp.maximum(lens - 1, 0)[:, None])
        acc = acc + i * jnp.take_along_axis(feat, idx[..., None], axis=1)
    return acc / denom


def _cmvn_masked(feat: jnp.ndarray, lens: jnp.ndarray):
    """Per-utterance mean/variance normalization over the true frames
    (matches sigproc.cmvn on the unpadded utterance)."""
    T = feat.shape[1]
    mask = (jnp.arange(T)[None, :] < lens[:, None])[..., None]
    cnt = jnp.maximum(lens, 1).astype(feat.dtype)[:, None, None]
    mean = jnp.sum(jnp.where(mask, feat, 0.0), 1, keepdims=True) / cnt
    centered = feat - mean
    std = jnp.sqrt(
        jnp.sum(jnp.where(mask, centered * centered, 0.0), 1,
                keepdims=True) / cnt
    )
    return jnp.where(mask, centered / jnp.maximum(std, 1e-10), 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("n_frames", "energy", "dynamic", "mvn", "use_pallas"),
)
def _device_features(
    fp: FrontendParams,
    dct,  # [numcep, nfilt] or None (fbank)
    lift,  # [numcep] or None
    signals: jnp.ndarray,  # [B, S] zero-padded float32
    slens: jnp.ndarray,  # [B] true sample counts
    n_frames: int,
    norm,  # None | (mean [dim], std [dim]): corpus/speaker CMVN stats
    *,
    energy: bool,
    dynamic: str,
    mvn: bool,
    use_pallas: bool,
) -> jnp.ndarray:
    """The whole feature pipeline of features/computers.py in one jitted
    graph: preemphasis -> framing -> (Pallas) STFT+Mel [-> DCT+lifter]
    [-> +energy] [-> +deltas] [-> CMVN]. Frames past each utterance's
    true frame count are zeros (masked downstream by feature_lengths).
    """
    B, S = signals.shape
    pos = jnp.arange(S)[None, :]
    if fp.preemph:
        pre = jnp.concatenate(
            [signals[:, :1], signals[:, 1:] - fp.preemph * signals[:, :-1]],
            axis=1,
        )
    else:
        pre = signals
    # the host path preemphasizes the UNPADDED signal then zero-pads:
    # zero everything past the true length so frames match exactly
    pre = jnp.where(pos < slens[:, None], pre, 0.0)
    frames = jax.vmap(
        lambda s: frame_signal(s, fp.frame_len, fp.frame_step, n_frames)
    )(pre)  # [B, NF, W]
    flat = frames.reshape(B * n_frames, fp.frame_len)
    if use_pallas:
        from nabu_tpu.ops.pallas.stft_mel import stft_mel_pallas

        base = stft_mel_pallas(
            flat, fp.window, fp.dft_cos, fp.dft_sin, fp.mel, fp.nfft
        )
    else:
        win = flat * fp.window[None, :]
        re = win @ fp.dft_cos
        im = win @ fp.dft_sin
        base = jnp.log(jnp.maximum(
            ((re * re + im * im) * (1.0 / fp.nfft)) @ fp.mel, 1e-30
        ))
    if dct is not None:
        base = base @ dct.T
        if lift is not None:
            base = base * lift[None, :]
    feat = base.reshape(B, n_frames, -1)
    if energy:
        e = jnp.log(
            jnp.maximum(jnp.sum(flat * flat, axis=-1), 1e-30)
        ).reshape(B, n_frames, 1)
        feat = jnp.concatenate([e, feat], axis=-1)
    flens = jnp.where(
        slens <= fp.frame_len,
        1,
        1 + jnp.ceil(
            (slens - fp.frame_len) / fp.frame_step
        ).astype(jnp.int32),
    )
    if dynamic not in ("nodelta", "none", ""):
        d1 = _delta_clip(feat, flens)
        if dynamic == "delta":
            feat = jnp.concatenate([feat, d1], axis=-1)
        elif dynamic in ("ddelta", "deltadelta", "delta-delta"):
            feat = jnp.concatenate(
                [feat, d1, _delta_clip(d1, flens)], axis=-1
            )
    if mvn:
        feat = _cmvn_masked(feat, flens)
    if norm is not None:
        mean, std = norm
        t_mask = (
            jnp.arange(n_frames)[None, :] < flens[:, None]
        )[..., None]
        feat = jnp.where(
            t_mask, (feat - mean[None, None]) / std[None, None], 0.0
        )
    return feat


class DeviceFrontend:
    """In-graph feature extraction for the serving/recognize hot path.

    Built from a database.conf ``[features]`` section when its options
    are exactly representable in-graph (``make`` returns None otherwise
    and callers fall back to the host computers). Covers the full
    surface the committed recipes use: ``feature = fbank | mfcc`` with
    ``include_energy``, ``dynamic = delta | ddelta`` and per-utterance
    CMVN (``mvn``). On TPU the STFT+Mel runs as the fused Pallas kernel
    (BASELINE.json:5 — the production decode path computes features on
    the chip; no host DSP in the hot loop).
    """

    def __init__(self, sec):
        from nabu_tpu.features.computers import make_feature_computer

        self.computer = make_feature_computer(sec)
        self.feature = sec.get("feature", "fbank")
        self._consts_cache = {}
        self._norm = None

    def set_normalization(self, mean, std) -> None:
        """Apply corpus-level CMVN stats (from `run data`) in-graph
        after feature computation — the serving-side counterpart of the
        loader's global_cmvn application."""
        self._norm = (
            jnp.asarray(mean, jnp.float32),
            jnp.maximum(jnp.asarray(std, jnp.float32), 1e-10),
        )

    @classmethod
    def make(cls, sec) -> "DeviceFrontend | None":
        if sec.get("processor", "audio") not in (
            "audio", "audio_processor"
        ):
            return None
        if sec.get("feature", "fbank") not in ("fbank", "mfcc"):
            return None
        fe = cls(sec)
        if (fe.computer.dynamic or "nodelta").lower() not in (
            "nodelta", "none", "", "delta", "ddelta", "deltadelta",
            "delta-delta",
        ):
            return None
        return fe

    @property
    def dim(self) -> int:
        return self.computer.dim

    def _consts(self, rate: float):
        if rate not in self._consts_cache:
            c = self.computer
            fp = make_frontend_params(
                rate, c.winlen, c.winstep, c.nfft,
                getattr(c, "nfilt", 40), c.window, c.preemph,
                getattr(c, "lowfreq", 0.0),
                getattr(c, "highfreq", None),
            )
            dct = lift = None
            if self.feature == "mfcc":
                dct = jnp.asarray(
                    sigproc.dct_matrix(c.numcep, c.nfilt), jnp.float32
                )
                if c.ceplifter > 0:
                    n = np.arange(c.numcep)
                    lift = jnp.asarray(
                        1.0 + (c.ceplifter / 2.0)
                        * np.sin(np.pi * n / c.ceplifter),
                        jnp.float32,
                    )
            self._consts_cache[rate] = (fp, dct, lift)
        return self._consts_cache[rate]

    def frame_geometry(self, rate: float):
        fp, _, _ = self._consts(rate)
        return fp.frame_len, fp.frame_step

    def __call__(self, signals, sample_lengths, rate: float,
                 use_pallas: bool | None = None):
        """[B, S] zero-padded signals + true sample counts ->
        (features [B, NF, dim] device array, frame lengths [B] numpy).
        One jit compilation per padded S (bucket S at the call site)."""
        fp, dct, lift = self._consts(rate)
        if use_pallas is None:
            from nabu_tpu.ops.pallas import on_tpu

            use_pallas = on_tpu()
        nf = num_frames(signals.shape[1], fp.frame_len, fp.frame_step)
        c = self.computer
        feats = _device_features(
            fp, dct, lift,
            jnp.asarray(signals, jnp.float32),
            jnp.asarray(sample_lengths, jnp.int32),
            nf,
            self._norm,
            energy=c.include_energy,
            dynamic=(c.dynamic or "nodelta").lower(),
            mvn=c.mvn,
            use_pallas=use_pallas,
        )
        slen = np.asarray(sample_lengths)
        flens = np.where(
            slen <= fp.frame_len,
            1,
            1 + np.ceil(
                (slen - fp.frame_len) / fp.frame_step
            ).astype(np.int64),
        ).astype(np.int32)
        return feats, flens

    def batch_features(self, signals, rate: float, batch_rows: int,
                       t_bucket: int = 512):
        """Pad a list of same-rate 1-D signals into one [batch_rows, S]
        array (S bucketed so the jitted frontend+decode compile once per
        bucket) and run the in-graph frontend. Rows past len(signals)
        are zero fill. Returns (features device array [batch_rows, NF,
        dim], frame lengths [batch_rows] numpy, fill rows get 1)."""
        frame_len, frame_step = self.frame_geometry(rate)
        s_bucket = (t_bucket - 1) * frame_step + frame_len
        S = max(len(s) for s in signals)
        S = ((S + s_bucket - 1) // s_bucket) * s_bucket
        batch = np.zeros((batch_rows, S), np.float32)
        slens = np.ones((batch_rows,), np.int32)
        for i, s in enumerate(signals):
            batch[i, : len(s)] = s
            slens[i] = len(s)
        return self(batch, slens, rate)
