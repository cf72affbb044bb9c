"""Golden tests for feature extraction (SURVEY.md §4: fbank/MFCC vs
python_speech_features-style numpy reference)."""

import numpy as np
import pytest

from nabu_tpu.config import Conf
from nabu_tpu.features import make_feature_computer, sigproc


def _sig(n=16000, rate=16000.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    return (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1330 * t)
        + 0.01 * rng.standard_normal(n)
    ).astype(np.float32)


class TestSigproc:
    def test_preemphasis(self):
        x = np.array([1.0, 2.0, 3.0], dtype=np.float32)
        y = sigproc.preemphasis(x, 0.5)
        np.testing.assert_allclose(y, [1.0, 1.5, 2.0])

    def test_framesig_shapes(self):
        frames = sigproc.framesig(np.zeros(1000, np.float32), 400, 160)
        # 1 + ceil((1000-400)/160) = 1 + 4 = 5
        assert frames.shape == (5, 400)

    def test_framesig_short_signal(self):
        frames = sigproc.framesig(np.ones(100, np.float32), 400, 160)
        assert frames.shape == (1, 400)
        assert frames[0, :100].sum() == 100
        assert frames[0, 100:].sum() == 0

    def test_framesig_values(self):
        x = np.arange(10, dtype=np.float32)
        frames = sigproc.framesig(x, 4, 2)
        np.testing.assert_allclose(frames[0], [0, 1, 2, 3])
        np.testing.assert_allclose(frames[1], [2, 3, 4, 5])

    def test_powspec_matches_fft(self):
        frames = sigproc.framesig(_sig(), 400, 160)
        ps = sigproc.powspec(frames, 512)
        ref = (1.0 / 512) * np.abs(np.fft.rfft(frames, 512)) ** 2
        np.testing.assert_allclose(ps, ref, rtol=1e-4, atol=1e-6)

    def test_mel_roundtrip(self):
        hz = np.array([0.0, 300.0, 8000.0])
        np.testing.assert_allclose(sigproc.mel2hz(sigproc.hz2mel(hz)), hz,
                                   rtol=1e-10)

    def test_filterbank_rows_nonzero(self):
        fb = sigproc.get_filterbanks(40, 512, 16000)
        assert fb.shape == (40, 257)
        assert (fb.sum(axis=1) > 0).all()
        assert (fb >= 0).all() and (fb <= 1).all()

    def test_dct_orthonormal(self):
        d = sigproc.dct_matrix(40, 40)
        np.testing.assert_allclose(d @ d.T, np.eye(40), atol=1e-5)

    def test_delta_of_constant_is_zero(self):
        feat = np.ones((20, 5), np.float32)
        np.testing.assert_allclose(sigproc.delta(feat), 0.0, atol=1e-7)

    def test_delta_of_ramp(self):
        feat = np.arange(30, dtype=np.float32)[:, None]
        d = sigproc.delta(feat, n=2)
        # interior slope of a unit ramp is 1
        np.testing.assert_allclose(d[5:-5, 0], 1.0, atol=1e-5)


class TestComputers:
    def test_fbank_shape_and_dim(self):
        conf = Conf({"feature": "fbank", "nfilt": "40"})
        fc = make_feature_computer(conf)
        feat = fc(_sig(), 16000.0)
        assert feat.shape[1] == 40 == fc.dim
        assert feat.shape[0] == 99  # 1 + ceil((16000-400)/160)
        assert np.isfinite(feat).all()

    def test_fbank_energy_and_deltas(self):
        conf = Conf({
            "feature": "fbank", "nfilt": "23",
            "include_energy": "true", "dynamic": "ddelta",
        })
        fc = make_feature_computer(conf)
        feat = fc(_sig(), 16000.0)
        assert feat.shape[1] == 72 == fc.dim  # (23+1)*3

    def test_mfcc_shape(self):
        conf = Conf({"feature": "mfcc", "numcep": "13", "nfilt": "26"})
        fc = make_feature_computer(conf)
        feat = fc(_sig(), 16000.0)
        assert feat.shape[1] == 13 == fc.dim
        assert np.isfinite(feat).all()

    def test_mfcc_matches_manual_pipeline(self):
        """MFCC == lifter(dct(log fbank)) computed by hand."""
        conf = Conf({
            "feature": "mfcc", "numcep": "13", "nfilt": "26",
            "preemph": "0.97", "window": "hamming",
        })
        fc = make_feature_computer(conf)
        sig = _sig()
        feat = fc(sig, 16000.0)

        emph = sigproc.preemphasis(sig, 0.97)
        frames = sigproc.framesig(emph, 400, 160)
        frames = frames * sigproc.window(400, "hamming")[None]
        pspec = sigproc.powspec(frames, 512)
        fb = sigproc.get_filterbanks(26, 512, 16000.0)
        logfb = np.log(np.maximum(pspec @ fb.T, 1e-30))
        cep = logfb @ sigproc.dct_matrix(13, 26).T
        ref = sigproc.lifter(cep, 22)
        np.testing.assert_allclose(feat, ref, rtol=1e-4, atol=1e-4)

    def test_mvn(self):
        conf = Conf({"feature": "fbank", "mvn": "true"})
        fc = make_feature_computer(conf)
        feat = fc(_sig(), 16000.0)
        np.testing.assert_allclose(feat.mean(axis=0), 0.0, atol=1e-4)
        np.testing.assert_allclose(feat.std(axis=0), 1.0, atol=1e-3)

    def test_frames_computer(self):
        conf = Conf({"feature": "frames", "preemph": "0", "window": "none"})
        fc = make_feature_computer(conf)
        sig = _sig()
        feat = fc(sig, 16000.0)
        assert feat.shape == (99, 400)
        np.testing.assert_allclose(feat[0], sig[:400], atol=1e-6)


class TestJaxFrontend:
    def test_matches_numpy_fbank(self):
        import jax.numpy as jnp

        from nabu_tpu.features import jax_frontend as jf

        conf = Conf({"feature": "fbank", "nfilt": "40", "preemph": "0.97"})
        fc = make_feature_computer(conf)
        sig = _sig()
        ref = fc(sig, 16000.0)

        fp = jf.make_frontend_params(16000.0, nfilt=40, preemph=0.97)
        nf = jf.num_frames(len(sig), fp.frame_len, fp.frame_step)
        assert nf == ref.shape[0]
        got = jf.log_mel_spectrogram(fp, jnp.asarray(sig), nf)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)

    def test_batched(self):
        import jax.numpy as jnp

        from nabu_tpu.features import jax_frontend as jf

        fp = jf.make_frontend_params(16000.0, nfilt=40)
        sigs = np.stack([_sig(seed=i) for i in range(3)])
        out = jf.batched_log_mel(fp, jnp.asarray(sigs), 99)
        assert out.shape == (3, 99, 40)


class TestNativeFbank:
    """Native C++ one-pass fbank vs the numpy oracle path."""

    def _pair(self, **extra):
        base = {"feature": "fbank", "nfilt": "40"}
        base.update(extra)
        nat = make_feature_computer(Conf(base))
        ref = make_feature_computer(Conf({**base, "use_native": "false"}))
        return nat, ref

    @pytest.mark.parametrize("extra", [
        {},
        {"include_energy": "true"},
        {"dynamic": "ddelta", "mvn": "true"},
        {"window": "povey", "preemph": "0.0"},
        {"winlen": "0.032", "winstep": "0.016"},
    ])
    def test_matches_numpy_oracle(self, extra):
        from nabu_tpu import native

        if not native.available():
            pytest.skip("native library unavailable")
        nat, ref = self._pair(**extra)
        rng = np.random.default_rng(0)
        sig = (rng.standard_normal(16000) * 0.1).astype(np.float32)
        a, b = nat(sig, 16000.0), ref(sig, 16000.0)
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=5e-3)

    def test_short_signal(self):
        from nabu_tpu import native

        if not native.available():
            pytest.skip("native library unavailable")
        nat, ref = self._pair()
        sig = np.ones(100, np.float32)  # shorter than one frame
        a, b = nat(sig, 16000.0), ref(sig, 16000.0)
        assert a.shape == b.shape == (1, 40)
        np.testing.assert_allclose(a, b, atol=5e-3)

    def test_non_pow2_nfft_falls_back(self):
        nat, ref = self._pair(nfft="400")
        sig = np.sin(np.arange(8000, dtype=np.float32) * 0.03)
        np.testing.assert_allclose(
            nat(sig, 16000.0), ref(sig, 16000.0), atol=1e-6
        )
