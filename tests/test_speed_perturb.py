"""3-way speed perturbation at data prep: resampling math, id
replication, feature/target pairing through the loader."""

import numpy as np

from nabu_tpu.data.processors import resample_speed


class TestResample:
    def test_identity(self):
        sig = np.random.RandomState(0).randn(1000).astype(np.float32)
        out = resample_speed(sig, 1.0)
        np.testing.assert_allclose(out, sig)

    def test_duration_scales_inverse(self):
        sig = np.zeros(16000, np.float32)
        assert abs(len(resample_speed(sig, 0.9)) - 16000 / 0.9) <= 1
        assert abs(len(resample_speed(sig, 1.1)) - 16000 / 1.1) <= 1

    def test_pitch_scales_with_factor(self):
        """A 400 Hz tone played at 1.1x speed peaks near 440 Hz."""
        rate = 16000
        t = np.arange(rate) / rate
        sig = np.sin(2 * np.pi * 400.0 * t).astype(np.float32)
        for f in (0.9, 1.1):
            out = resample_speed(sig, f)
            spec = np.abs(np.fft.rfft(out))
            peak_hz = np.argmax(spec) * rate / len(out)
            assert abs(peak_hz - 400.0 * f) < 5.0, (f, peak_hz)


class TestDataPrep:
    def test_replicates_and_pairs(self, tmp_path):
        from tests.corpus_utils import make_corpus, write_recipe
        from nabu_tpu.config import Recipe
        from nabu_tpu.data.pipeline import BucketedLoader
        from nabu_tpu.scripts import data as data_script
        from nabu_tpu.scripts.common import open_dataset

        root = tmp_path
        corpus = {"train": make_corpus(str(root / "train"), 4, seed=80)}
        recipe = str(root / "recipe")
        write_recipe(
            recipe, corpus,
            "[model]\n", "[trainer]\n",
        )
        # patch speed_perturb into BOTH train sections
        db = open(f"{recipe}/database.conf").read()
        db = db.replace(
            "processor = audio",
            "processor = audio\nspeed_perturb = 0.9 1.0 1.1",
        ).replace(
            "processor = text",
            "processor = text\nspeed_perturb = 0.9 1.0 1.1",
        )
        open(f"{recipe}/database.conf", "w").write(db)

        expdir = str(root / "exp")
        data_script.main(recipe, expdir)
        rec = Recipe(recipe)
        feats = open_dataset(rec, expdir, "trainfeatures")
        tgts = open_dataset(rec, expdir, "traintargets")
        assert feats.metadata["num_utts"] == 12  # 4 utts x 3 factors
        assert tgts.metadata["num_utts"] == 12

        utts = set(feats.utt_ids)
        assert "utt0000" in utts
        assert "utt0000#sp0.9" in utts and "utt0000#sp1.1" in utts

        # slow copy is longer, fast copy shorter; labels identical
        base = feats["utt0000"].shape[0]
        assert feats["utt0000#sp0.9"].shape[0] > base
        assert feats["utt0000#sp1.1"].shape[0] < base
        np.testing.assert_array_equal(
            tgts["utt0000#sp0.9"], tgts["utt0000"]
        )

        # the loader pairs every perturbed copy without id errors
        loader = BucketedLoader(
            feats, tgts, batch_size=4, num_buckets=1
        )
        seen = set()
        for batch in loader.epoch(0, shuffle=False):
            for b, utt in enumerate(batch.utt_ids):
                if batch.example_mask[b]:
                    seen.add(utt)
        assert seen == utts

    def test_multiworker_matches_single(self, tmp_path):
        from tests.corpus_utils import make_corpus, write_recipe
        from nabu_tpu.config import Recipe
        from nabu_tpu.scripts import data as data_script
        from nabu_tpu.scripts.common import open_dataset

        root = tmp_path
        corpus = {"train": make_corpus(str(root / "train"), 3, seed=81)}
        recipe = str(root / "recipe")
        write_recipe(recipe, corpus, "[model]\n", "[trainer]\n")
        db = open(f"{recipe}/database.conf").read()
        db = db.replace(
            "processor = audio",
            "processor = audio\nspeed_perturb = 0.9 1.0 1.1",
        )
        open(f"{recipe}/database.conf", "w").write(db)

        e1, e2 = str(root / "exp1"), str(root / "exp2")
        data_script.main(recipe, e1)
        data_script.main(recipe, e2, num_workers=2)
        rec = Recipe(recipe)
        d1 = open_dataset(rec, e1, "trainfeatures")
        d2 = open_dataset(rec, e2, "trainfeatures")
        assert sorted(d1.utt_ids) == sorted(d2.utt_ids)
        for utt in d1.utt_ids:
            np.testing.assert_allclose(d1[utt], d2[utt])
