"""DeviceFrontend (in-graph serving features) vs the host computers:
the device path must reproduce the host features exactly through the
whole option surface (energy, deltas, CMVN, MFCC), including padded
batches with per-utterance true lengths."""

import jax
import numpy as np
import pytest

from nabu_tpu.config import Conf
from nabu_tpu.features.computers import make_feature_computer
from nabu_tpu.features.jax_frontend import DeviceFrontend

RATE = 16000.0


def _signals(seed=0, n=3):
    rng = np.random.default_rng(seed)
    lens = [5200, 16000, 9333][:n]
    sigs = [
        (rng.standard_normal(L) * 1000).astype(np.float32) for L in lens
    ]
    return sigs


def _pad_batch(sigs):
    S = max(len(s) for s in sigs)
    S = ((S + 1599) // 1600) * 1600  # arbitrary sample bucket
    batch = np.zeros((len(sigs), S), np.float32)
    lens = np.zeros((len(sigs),), np.int32)
    for i, s in enumerate(sigs):
        batch[i, : len(s)] = s
        lens[i] = len(s)
    return batch, lens


CASES = [
    {"feature": "fbank", "nfilt": "12", "use_native": "false"},
    {"feature": "fbank", "nfilt": "12", "include_energy": "true",
     "dynamic": "delta", "use_native": "false"},
    {"feature": "fbank", "nfilt": "10", "dynamic": "ddelta",
     "mvn": "true", "use_native": "false"},
    {"feature": "mfcc", "nfilt": "20", "numcep": "13",
     "use_native": "false"},
    {"feature": "mfcc", "nfilt": "20", "numcep": "13", "dynamic": "delta",
     "mvn": "true", "include_energy": "true", "use_native": "false"},
]


class TestDeviceFrontend:
    @pytest.mark.parametrize("case", CASES)
    def test_matches_host_computer(self, case):
        sec = Conf(dict(case, winlen="0.025", winstep="0.01",
                        nfft="256"), "features")
        fe = DeviceFrontend.make(sec)
        assert fe is not None
        host = make_feature_computer(sec)
        sigs = _signals()
        batch, lens = _pad_batch(sigs)
        feats, flens = fe(batch, lens, RATE, use_pallas=False)
        feats = np.asarray(feats)
        assert feats.shape[-1] == host.dim == fe.dim
        for i, s in enumerate(sigs):
            ref = host(s, RATE)
            assert flens[i] == ref.shape[0]
            np.testing.assert_allclose(
                feats[i, : flens[i]], ref, rtol=1e-3, atol=1e-3,
                err_msg=str(case),
            )

    def test_pallas_path_matches_xla(self):
        sec = Conf({"feature": "fbank", "nfilt": "12", "winlen": "0.025",
                    "winstep": "0.01", "nfft": "256",
                    "use_native": "false"}, "features")
        fe = DeviceFrontend.make(sec)
        sigs = _signals(seed=4)
        batch, lens = _pad_batch(sigs)
        a, _ = fe(batch, lens, RATE, use_pallas=False)
        b, _ = fe(batch, lens, RATE, use_pallas=True)  # interpret on CPU
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3
        )

    def test_unsupported_falls_back(self):
        assert DeviceFrontend.make(
            Conf({"feature": "frames"}, "features")
        ) is None
        assert DeviceFrontend.make(
            Conf({"feature": "spec"}, "features")
        ) is None
