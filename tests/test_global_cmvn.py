"""Corpus/speaker-level CMVN: stats accumulated at `run data`, applied
at load by the BucketedLoader, and carried through recognize/serving
(round-1 verdict Missing #4; reference anchor: CMVN stats at prep,
SURVEY.md §2 dynamic-features row)."""

import numpy as np
import pytest

from tests.corpus_utils import make_corpus, write_recipe

MODEL_CFG = """[encoder]
encoder = dnn
num_layers = 1
num_units = 16

[decoder]
decoder = linear_ctc
loss = ctc
"""

TRAINER_CFG = """[trainer]
trainer = standard
features = trainfeatures
targets = traintargets
batch_size = 8
num_buckets = 1
num_steps = 4
learning_rate = 1e-3
valid_frequency = 0
log_frequency = 2
"""


def _add_global_cmvn(recipe_dir, speaker_sep=None):
    path = f"{recipe_dir}/database.conf"
    text = open(path).read()
    extra = "global_cmvn = true\n"
    if speaker_sep:
        extra += f"cmvn_speaker_separator = {speaker_sep}\n"
    text = text.replace("feature = fbank\n", "feature = fbank\n" + extra)
    open(path, "w").write(text)


class TestPrepStats:
    def test_stats_recorded_and_correct(self, tmp_path):
        from nabu_tpu.data.storage import ShardedDataset
        from nabu_tpu.scripts import data as data_script

        corpus = {"train": make_corpus(str(tmp_path / "c"), 6, seed=5)}
        recipe = str(tmp_path / "recipe")
        write_recipe(recipe, corpus, MODEL_CFG, TRAINER_CFG)
        expdir = str(tmp_path / "exp")
        data_script.main(recipe, expdir)

        ds = ShardedDataset(f"{expdir}/data/trainfeatures")
        stats = ds.metadata["cmvn"]
        allf = np.concatenate([f for _, f in ds], axis=0)
        np.testing.assert_allclose(
            stats["mean"], allf.mean(axis=0), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            stats["std"], allf.std(axis=0), rtol=1e-3, atol=1e-4
        )
        assert stats["frames"] == allf.shape[0]
        # stats recorded but NOT applied without the flag
        assert "apply_global_cmvn" not in ds.metadata

    def test_loader_applies_global_stats(self, tmp_path):
        from nabu_tpu.data.pipeline import BucketedLoader
        from nabu_tpu.data.storage import ShardedDataset
        from nabu_tpu.scripts import data as data_script

        corpus = {"train": make_corpus(str(tmp_path / "c"), 6, seed=6)}
        recipe = str(tmp_path / "recipe")
        write_recipe(recipe, corpus, MODEL_CFG, TRAINER_CFG)
        _add_global_cmvn(recipe)
        expdir = str(tmp_path / "exp")
        data_script.main(recipe, expdir)

        feats = ShardedDataset(f"{expdir}/data/trainfeatures")
        tgts = ShardedDataset(f"{expdir}/data/traintargets")
        assert feats.metadata["apply_global_cmvn"]
        mean = np.asarray(feats.metadata["cmvn"]["mean"], np.float32)
        std = np.asarray(feats.metadata["cmvn"]["std"], np.float32)
        loader = BucketedLoader(feats, tgts, batch_size=3, num_buckets=1)
        batch = next(iter(loader.epoch(0, shuffle=False)))
        for k in range(3):
            if not batch.example_mask[k]:
                continue
            raw = feats[batch.utt_ids[k]]
            L = batch.feature_lengths[k]
            np.testing.assert_allclose(
                batch.features[k, :L], (raw[:L] - mean) / std,
                rtol=1e-4, atol=1e-5,
            )

    def test_speaker_stats_applied(self, tmp_path):
        from nabu_tpu.data.pipeline import BucketedLoader
        from nabu_tpu.data.storage import ShardedDataset
        from nabu_tpu.scripts import data as data_script

        corpus = {"train": make_corpus(str(tmp_path / "c"), 6, seed=7)}
        recipe = str(tmp_path / "recipe")
        write_recipe(recipe, corpus, MODEL_CFG, TRAINER_CFG)
        # corpus utt ids are "utt0000" ...; separator "t" yields
        # speaker "u" for all — keeps the test corpus simple while
        # exercising the speaker lookup path
        _add_global_cmvn(recipe, speaker_sep="t")
        expdir = str(tmp_path / "exp")
        data_script.main(recipe, expdir)

        feats = ShardedDataset(f"{expdir}/data/trainfeatures")
        tgts = ShardedDataset(f"{expdir}/data/traintargets")
        spk = feats.metadata["cmvn"]["speakers"]
        assert set(spk) == {"u"}
        mean = np.asarray(spk["u"]["mean"], np.float32)
        std = np.asarray(spk["u"]["std"], np.float32)
        loader = BucketedLoader(feats, tgts, batch_size=3, num_buckets=1)
        batch = next(iter(loader.epoch(0, shuffle=False)))
        k = int(np.argmax(batch.example_mask))
        raw = feats[batch.utt_ids[k]]
        L = batch.feature_lengths[k]
        np.testing.assert_allclose(
            batch.features[k, :L], (raw[:L] - mean) / std,
            rtol=1e-4, atol=1e-5,
        )


class TestCMVNServing:
    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        from nabu_tpu.scripts import data as data_script
        from nabu_tpu.scripts import train as train_script

        root = tmp_path_factory.mktemp("cmvn_serving")
        corpus = {
            "train": make_corpus(str(root / "train"), 10, seed=40),
            "dev": make_corpus(str(root / "dev"), 4, seed=41),
        }
        recipe = str(root / "recipe")
        write_recipe(recipe, corpus, MODEL_CFG, TRAINER_CFG)
        _add_global_cmvn(recipe)
        expdir = str(root / "exp")
        data_script.main(recipe, expdir)
        train_script.main(recipe, expdir)
        return root, recipe, expdir, corpus

    def test_recognize_device_equals_host_with_cmvn(self, trained):
        import nabu_tpu.features.jax_frontend as jf
        from nabu_tpu.scripts import recognize

        root, recipe, expdir, corpus = trained
        scp, _ = corpus["dev"]
        paths = [l.split(None, 1)[1] for l in open(scp).read().splitlines()][:3]
        dev = recognize.main(recipe, expdir, paths)
        orig = jf.DeviceFrontend.make.__func__
        jf.DeviceFrontend.make = classmethod(lambda cls, sec: None)
        try:
            host = recognize.main(recipe, expdir, paths)
        finally:
            jf.DeviceFrontend.make = classmethod(orig)
        assert dev == host

    def test_export_freezes_stats(self, trained):
        import json
        import os

        from nabu_tpu.serving import export_model, load_exported

        root, recipe, expdir, corpus = trained
        out = export_model(recipe, expdir, str(root / "art"))
        manifest = json.load(open(os.path.join(out, "manifest.json")))
        assert "cmvn" in manifest
        exported = load_exported(out)
        assert exported.cmvn is not None
        scp, _ = corpus["dev"]
        path = open(scp).read().splitlines()[0].split(None, 1)[1]
        text = exported.recognize(path)
        assert isinstance(text, str)
