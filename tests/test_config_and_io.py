"""Coverage for the config system, audio I/O (incl. NIST SPHERE), and
storage edge cases."""

import os

import numpy as np
import pytest

from nabu_tpu.config import (
    Conf,
    ConfigFile,
    Recipe,
    apply_sweep_overrides,
    parse_sweep_file,
)
from nabu_tpu.data import audio_io


class TestConf:
    def test_typed_getters(self):
        c = Conf({
            "i": "42", "f": "2.5", "bt": "true", "bf": "no",
            "lst": "a b, c", "ints": "1 2 3", "lit": "[1, 'x']",
        })
        assert c.getint("i") == 42
        assert c.getfloat("f") == 2.5
        assert c.getbool("bt") is True
        assert c.getbool("bf") is False
        assert c.getlist("lst") == ["a", "b", "c"]
        assert c.getintlist("ints") == [1, 2, 3]
        assert c.getliteral("lit") == [1, "x"]
        assert c.getint("missing", 7) == 7
        with pytest.raises(KeyError):
            c["missing"]
        with pytest.raises(ValueError):
            Conf({"x": "maybe"}).getbool("x")

    def test_inline_comments_and_case(self, tmp_path):
        p = tmp_path / "t.cfg"
        p.write_text("[Sec]\nKey = value  # comment\n")
        f = ConfigFile.read(str(p))
        assert f.section("Sec")["Key"] == "value"

    def test_sweep_parse_and_apply(self, tmp_path):
        sweep = tmp_path / "s.cfg"
        sweep.write_text(
            "model/encoder/num_units 8\n\n"
            "# comment separates blocks too\n"
            "model/encoder/num_units 16\n"
            "trainer/trainer/lr 0.1\n"
        )
        blocks = parse_sweep_file(str(sweep))
        assert len(blocks) == 2
        assert blocks[1]["trainer/trainer/lr"] == "0.1"

        rdir = tmp_path / "recipe"
        rdir.mkdir()
        (rdir / "model.cfg").write_text("[encoder]\nnum_units = 4\n")
        (rdir / "trainer.cfg").write_text("[trainer]\nlr = 1.0\n")
        r = Recipe(str(rdir))
        apply_sweep_overrides(r, blocks[1])
        assert r.model.section("encoder").getint("num_units") == 16
        assert r.trainer.section("trainer").getfloat("lr") == 0.1
        with pytest.raises(ValueError):
            apply_sweep_overrides(r, {"bad_key": "1"})


def _write_sphere(path, sig, rate=16000):
    """Minimal NIST SPHERE writer for the reader test."""
    body = np.asarray(sig, dtype="<i2").tobytes()
    header = (
        "NIST_1A\n   1024\n"
        f"sample_rate -i {rate}\n"
        "channel_count -i 1\n"
        "sample_n_bytes -i 2\n"
        "sample_byte_format -s2 01\n"
        "sample_coding -s3 pcm\n"
        "end_head\n"
    ).encode()
    with open(path, "wb") as f:
        f.write(header.ljust(1024, b" "))
        f.write(body)


class TestAudioIO:
    def test_wav_roundtrip(self, tmp_path):
        sig = (np.sin(np.arange(800) / 10) * 8000).astype(np.int16)
        p = str(tmp_path / "a.wav")
        audio_io.write_wav(p, sig, 16000)
        got, rate = audio_io.load_audio(p)
        assert rate == 16000
        np.testing.assert_allclose(got, sig, atol=1)

    def test_sphere(self, tmp_path):
        sig = (np.sin(np.arange(500) / 5) * 1000).astype(np.int16)
        p = str(tmp_path / "a.sph")
        _write_sphere(p, sig)
        got, rate = audio_io.load_audio(p)
        assert rate == 16000.0
        np.testing.assert_allclose(got, sig, atol=1)

    def test_unknown_format(self, tmp_path):
        p = str(tmp_path / "x.bin")
        open(p, "wb").write(b"garbagegarbage")
        with pytest.raises(ValueError, match="unrecognized audio format"):
            audio_io.load_audio(p)


class TestStorage:
    def test_multi_shard_rollover(self, tmp_path):
        from nabu_tpu.data.storage import ShardWriter, ShardedDataset

        w = ShardWriter(str(tmp_path / "d"), max_shard_bytes=1000)
        arrays = {}
        rng = np.random.default_rng(0)
        for i in range(10):
            a = rng.standard_normal((20, 5)).astype(np.float32)  # 400 B
            arrays[f"u{i}"] = a
            w.write(f"u{i}", a)
        w.close()
        shards = [
            f for f in os.listdir(tmp_path / "d") if f.startswith("shard")
        ]
        assert len(shards) > 1  # rolled over
        ds = ShardedDataset(str(tmp_path / "d"))
        for utt, a in arrays.items():
            np.testing.assert_array_equal(ds[utt], a)

    def test_evaluator_loss_matches_direct(self, tmp_path):
        """LossEvaluator == manual mean over the dev set."""
        import jax

        from nabu_tpu.config import Conf, ConfigFile
        from nabu_tpu.data.pipeline import BucketedLoader, batch_to_arrays
        from nabu_tpu.data.storage import ShardWriter, ShardedDataset
        from nabu_tpu.evaluators import build_evaluator
        from nabu_tpu.models.model import build_model
        from nabu_tpu.ops.losses import make_loss_computer

        rng = np.random.default_rng(1)
        fw = ShardWriter(str(tmp_path / "f"))
        tw = ShardWriter(str(tmp_path / "t"))
        for i in range(8):
            fw.write(f"u{i}", rng.standard_normal((12, 6)).astype(np.float32))
            tw.write(f"u{i}", rng.integers(0, 4, 3).astype(np.int32))
        fw.close()
        tw.close({"num_labels": 4})
        feats = ShardedDataset(str(tmp_path / "f"))
        tgts = ShardedDataset(str(tmp_path / "t"))
        loader = BucketedLoader(feats, tgts, batch_size=4, num_buckets=1)

        cfg = ConfigFile({
            "encoder": Conf({"encoder": "dnn", "num_units": "8"}, "encoder"),
            "decoder": Conf({"decoder": "linear_ctc", "loss": "ctc"},
                            "decoder"),
        })
        model = build_model(cfg, 6, 4)
        params = model.init(jax.random.PRNGKey(0))
        ev = build_evaluator(Conf({"evaluator": "loss"}), model, loader)
        got = ev(params)

        loss_fn = make_loss_computer(model)
        total, count = 0.0, 0
        for b in loader.epoch(0, shuffle=False):
            l, _ = loss_fn(
                params, batch_to_arrays(b), jax.random.PRNGKey(0), False
            )
            n = int(b.example_mask.sum())
            total += float(l) * n
            count += n
        assert got == pytest.approx(total / count, rel=1e-6)
