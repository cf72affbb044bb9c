"""BPE subword tokenization tests: hand-verified merges, roundtrip,
processor integration, and the run bpe script + data prep."""

import os

import numpy as np
import pytest

from nabu_tpu.config import Conf
from nabu_tpu.data.bpe import EOW, UNK, BPEModel
from nabu_tpu.data.processors import TextProcessor


class TestBPEModel:
    def test_merges_match_hand_computation(self):
        # words: "ab" x2, "abc" x1 -> symbols (a, b</w>) and (a, b, c</w>)
        model = BPEModel.train(["ab ab", "abc"], vocab_size=50)
        # only (a, b</w>) repeats (count 2); everything else is singleton
        assert model.merges == [("a", "b" + EOW)]
        assert model.vocab == [
            "a", "b", "b" + EOW, "c" + EOW, "ab" + EOW, UNK
        ]

    def test_encode_decode_roundtrip(self):
        model = BPEModel.train(["ab ab", "abc"], vocab_size=50)
        toks = model.encode("ab abc")
        assert toks == ["ab" + EOW, "a", "b", "c" + EOW]
        assert BPEModel.decode(toks) == "ab abc"

    def test_vocab_size_cap(self):
        texts = ["hello hello world world hello world"] * 3
        small = BPEModel.train(texts, vocab_size=12)
        big = BPEModel.train(texts, vocab_size=60)
        assert len(small.vocab) <= 12
        assert len(big.vocab) > len(small.vocab)
        # encoding with more merges yields fewer tokens
        assert len(big.encode("hello world")) <= len(
            small.encode("hello world")
        )

    def test_save_load_roundtrip(self, tmp_path):
        model = BPEModel.train(["ab ab abc"], vocab_size=50)
        path = str(tmp_path / "bpe.json")
        model.save(path)
        model2 = BPEModel.load(path)
        assert model2.merges == model.merges
        assert model2.vocab == model.vocab
        assert model2.encode("ab abc") == model.encode("ab abc")

    def test_empty_corpus_raises(self):
        with pytest.raises(ValueError):
            BPEModel.train(["   ", ""], vocab_size=10)


class TestProcessorIntegration:
    def _model_path(self, tmp_path):
        model = BPEModel.train(
            ["the cat sat", "the cat", "sat the"], vocab_size=40
        )
        path = str(tmp_path / "bpe.json")
        model.save(path)
        return path, model

    def test_process_and_ids_to_text(self, tmp_path):
        path, model = self._model_path(tmp_path)
        proc = TextProcessor(Conf({
            "tokenizer": "bpe", "bpe_model": path,
        }))
        assert proc.alphabet == model.vocab
        ids = proc.process("the cat sat")
        assert ids.dtype == np.int32 and len(ids) > 0
        assert proc.ids_to_text(ids) == "the cat sat"

    def test_unknown_chars_map_to_unk(self, tmp_path):
        path, model = self._model_path(tmp_path)
        proc = TextProcessor(Conf({
            "tokenizer": "bpe", "bpe_model": path,
        }))
        ids = proc.process("zzz")
        unk_id = proc.alphabet.index(UNK)
        assert all(i == unk_id for i in ids) and len(ids) > 0

    def test_requires_model_path(self):
        with pytest.raises(ValueError, match="bpe_model"):
            TextProcessor(Conf({"tokenizer": "bpe"}))


class TestScript:
    def test_run_bpe_then_data_prep(self, tmp_path):
        """Train via the script, then drive data prep with subword
        targets through the real pipeline."""
        from tests.corpus_utils import make_corpus, write_recipe
        from nabu_tpu.scripts import bpe as bpe_script
        from nabu_tpu.scripts import data as data_script
        from nabu_tpu.data.storage import ShardedDataset

        corpus = {
            "train": make_corpus(str(tmp_path / "train"), 10, seed=60),
            "dev": make_corpus(str(tmp_path / "dev"), 4, seed=61),
        }
        recipe = str(tmp_path / "recipe")
        write_recipe(recipe, corpus, "[model]\n", "[trainer]\n")
        expdir = str(tmp_path / "exp")

        path = bpe_script.main(recipe, expdir, vocab_size=30)
        assert os.path.exists(path)

        # switch the targets sections to BPE and prep
        db = os.path.join(recipe, "database.conf")
        text = open(db).read().replace(
            "processor = text\nalphabet = a b c\ntokenizer = word",
            f"processor = text\ntokenizer = bpe\nbpe_model = {path}",
        )
        open(db, "w").write(text)
        data_script.main(recipe, expdir)

        ds = ShardedDataset(os.path.join(expdir, "data", "traintargets"))
        model = BPEModel.load(path)
        assert ds.metadata["alphabet"] == model.vocab
        assert ds.metadata["tokenizer"] == "bpe"
        ids = ds[0]
        assert len(ids) > 0
        # every id decodes back into the a/b/c tone alphabet
        text = BPEModel.decode([model.vocab[i] for i in ids])
        assert set(text.replace(" ", "")) <= set("abc")
