"""N-gram LM tests: Witten-Bell math vs hand computation, dense-state
transitions, shallow fusion exactness in all three beam searches
(vs brute force / independent references), and the run lm / run rescore
scripts."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nabu_tpu.decoding.lm import DenseLM, NgramLM, rescore_nbest


class TestNgramLM:
    def test_bigram_matches_hand_computation(self):
        # sequences [0], [0], [1]; V=3 with boundary id 2
        lm = NgramLM.train([[0], [0], [1]], vocab=3, order=2)
        p = np.exp(lm.table)  # [3, 3] rows = context id
        # unigram WB: c=[2,1,3], N=6, T=3 -> p1 = [3,2,4]/9
        p1 = np.array([3, 2, 4]) / 9.0
        # ctx boundary: counts [2,1,0], N=3, T=2
        np.testing.assert_allclose(
            p[2], (np.array([2, 1, 0]) + 2 * p1) / 5.0, atol=1e-7
        )
        # ctx 0: counts [0,0,2], N=2, T=1
        np.testing.assert_allclose(
            p[0], (np.array([0, 0, 2]) + p1) / 3.0, atol=1e-7
        )
        # ctx 1: counts [0,0,1], N=1, T=1
        np.testing.assert_allclose(
            p[1], (np.array([0, 0, 1]) + p1) / 2.0, atol=1e-7
        )

    def test_rows_are_distributions(self):
        rng = np.random.RandomState(0)
        seqs = [list(rng.randint(0, 4, rng.randint(1, 8))) for _ in range(30)]
        for order in (1, 2, 3):
            lm = NgramLM.train(seqs, vocab=5, order=order)
            rows = np.exp(lm.table).sum(axis=1)
            np.testing.assert_allclose(rows, 1.0, atol=1e-6)
            assert np.isfinite(lm.table).all()  # no zero probabilities

    def test_logprob_matches_table_walk(self):
        lm = NgramLM.train([[0, 1, 0], [1, 1]], vocab=3, order=3)
        seq = [0, 1, 1]
        V, b = 3, 2
        ctx = (b, b)
        total = 0.0
        for tok in seq + [b]:
            idx = ctx[0] * V + ctx[1]
            total += lm.table[idx, tok]
            ctx = (ctx[1], tok)
        assert abs(lm.logprob(seq) - total) < 1e-5

    def test_save_load_roundtrip(self, tmp_path):
        lm = NgramLM.train([[0, 1], [1]], vocab=3, order=2)
        path = str(tmp_path / "lm.npz")
        lm.save(path)
        lm2 = NgramLM.load(path)
        np.testing.assert_array_equal(lm.table, lm2.table)
        assert (lm2.order, lm2.vocab) == (2, 3)

    def test_dense_state_transitions(self):
        lm = NgramLM.train([[0, 1, 0]], vocab=3, order=3)
        d = lm.dense()
        # boundary context (2,2) -> index 8
        s = d.init_state((2,))
        np.testing.assert_array_equal(np.asarray(s), [8, 8])
        s = d.step(s, jnp.asarray([0, 1]))  # (2,0), (2,1)
        np.testing.assert_array_equal(np.asarray(s), [6, 7])
        s = d.step(s, jnp.asarray([1, 1]))  # (0,1), (1,1)
        np.testing.assert_array_equal(np.asarray(s), [1, 4])
        lp = d.logprobs(s)
        np.testing.assert_allclose(
            np.asarray(lp), lm.table[[1, 4]], atol=1e-7
        )


def _train_toy_lm(vocab, order=2, seed=0):
    rng = np.random.RandomState(seed)
    seqs = [
        list(rng.randint(0, vocab - 1, rng.randint(1, 6)))
        for _ in range(40)
    ]
    return NgramLM.train(seqs, vocab=vocab, order=order)


class TestAttentionFusion:
    def _tiny_speller(self, num_labels=2):
        import nabu_tpu.models  # noqa: F401
        from nabu_tpu.config import Conf
        from nabu_tpu.registry import DECODERS

        conf = Conf({
            "decoder": "speller", "num_layers": "1", "num_units": "8",
            "embed_dim": "4",
        })
        dec = DECODERS.build("speller", conf, 6, num_labels)
        return dec, dec.init(jax.random.PRNGKey(0))

    def test_wide_beam_fused_is_exact(self):
        """Fused beam top-1 == argmax over ALL finished sequences of
        am + w * lm (enumerated)."""
        from nabu_tpu.decoding.beam import attention_beam_search
        from nabu_tpu.ops.masking import sequence_mask

        dec, params = self._tiny_speller(num_labels=2)  # V=3 with eos=2
        lm = _train_toy_lm(vocab=3, order=2)
        dense = lm.dense()
        w = 0.7
        rng = np.random.RandomState(1)
        encoded = jnp.asarray(rng.randn(1, 4, 6).astype(np.float32))
        enc_len = jnp.asarray([4], np.int32)
        max_steps = 3

        def am_score(tokens):
            """Teacher-forced chain score of tokens + eos."""
            state = dec.init_state(1)
            state.pop("attn_weights", None)
            enc_mask = sequence_mask(enc_len, 4)
            prev = jnp.asarray([dec.sos_id], jnp.int32)
            total = 0.0
            for tok in list(tokens) + [dec.eos_id]:
                logits, state = dec.step(
                    params, prev, state, encoded, enc_mask
                )
                state.pop("attn_weights", None)
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                total += float(lp[0, tok])
                prev = jnp.asarray([tok], jnp.int32)
            return total

        # all sequences with <= max_steps - 1 labels (last step is eos)
        from itertools import product

        best_score, best_seq = -np.inf, None
        for n in range(0, max_steps):
            for seq in product([0, 1], repeat=n):
                s = am_score(seq) + w * lm.logprob(list(seq))
                if s > best_score:
                    best_score, best_seq = s, list(seq)

        seqs, lengths, scores = attention_beam_search(
            dec, params, encoded, enc_len, beam_width=16,
            max_steps=max_steps, lm=dense, lm_weight=w,
        )
        got = list(np.asarray(seqs)[0, 0, : int(lengths[0, 0])])
        assert got == best_seq, (got, best_seq)
        assert abs(float(scores[0, 0]) - best_score) < 1e-4


class TestCTCFusion:
    def _python_prefix_beam_lm(self, lp, W, blank, lm, w):
        """Independent Hannun-style prefix beam with LM-on-extension."""
        beams = {(): (0.0, -np.inf)}  # prefix -> (pb, pnb) logs
        for t in range(lp.shape[0]):
            new = {}

            def add(prefix, pb, pnb):
                opb, opnb = new.get(prefix, (-np.inf, -np.inf))
                new[prefix] = (np.logaddexp(opb, pb), np.logaddexp(opnb, pnb))

            for prefix, (pb, pnb) in beams.items():
                ptot = np.logaddexp(pb, pnb)
                add(prefix, ptot + lp[t, blank], -np.inf)  # blank
                if prefix:
                    add(prefix, -np.inf, pnb + lp[t, prefix[-1]])  # repeat
                for v in range(lp.shape[1]):
                    if v == blank:
                        continue
                    base = pb if prefix and v == prefix[-1] else ptot
                    lm_term = w * lm.logprob(list(prefix) + [v],
                                             include_eos=False) - \
                        w * lm.logprob(list(prefix), include_eos=False)
                    add(prefix + (v,), -np.inf, base + lp[t, v] + lm_term)
            beams = dict(
                sorted(
                    new.items(),
                    key=lambda kv: -np.logaddexp(*kv[1]),
                )[:W]
            )
        ranked = sorted(
            beams.items(), key=lambda kv: -np.logaddexp(*kv[1])
        )
        return [
            (list(k), float(np.logaddexp(*v))) for k, v in ranked
        ]

    def test_matches_python_reference(self):
        from nabu_tpu.decoding.ctc_beam import ctc_prefix_beam_search

        V, blank = 4, 3  # labels 0..2, blank last; lm vocab 4
        lm = _train_toy_lm(vocab=V, order=2, seed=3)
        w = 0.5
        rng = np.random.RandomState(4)
        logits = rng.randn(1, 5, V).astype(np.float32) * 1.5
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))[0]

        W = 16  # wide enough that pruning never differs on this size
        ref = self._python_prefix_beam_lm(lp, W, blank, lm, w)
        seqs, lengths, scores = ctc_prefix_beam_search(
            jnp.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1)),
            jnp.asarray([5], np.int32), beam_width=W, blank_id=blank,
            lm=lm.dense(), lm_weight=w,
        )
        got = list(np.asarray(seqs)[0, 0, : int(lengths[0, 0])])
        assert got == ref[0][0], (got, ref[0][0])
        assert abs(float(scores[0, 0]) - ref[0][1]) < 1e-3


class TestTransducerFusion:
    def test_wide_beam_fused_is_exact(self):
        import nabu_tpu.models  # noqa: F401
        from nabu_tpu.config import Conf
        from nabu_tpu.decoding.transducer import transducer_beam_search
        from nabu_tpu.registry import DECODERS

        conf = Conf({
            "decoder": "rnnt", "num_layers": "1", "num_units": "8",
            "embed_dim": "4", "joint_units": "6",
        })
        dec = DECODERS.build("rnnt", conf, 4, 3)  # V=3 labels + blank
        params = dec.init(jax.random.PRNGKey(2))
        lm = _train_toy_lm(vocab=4, order=2, seed=5)
        w = 0.8
        rng = np.random.RandomState(6)
        T, K = 2, 2
        enc = (rng.randn(1, T, 4) * 2).astype(np.float32)

        # brute force: enumerate alignment paths with the LM term
        # (emission logprob, no eos) folded into each emission
        enc_proj = np.asarray(dec.precompute(params, jnp.asarray(enc)))

        def pred(prev, state):
            vec, st = dec.pred_step(
                params, jnp.asarray([prev], jnp.int32), state
            )
            return vec, st

        def joint_lp(t, vec):
            logits = dec.joint_step(
                params, jnp.asarray(enc_proj[None, 0, t]), vec
            )
            return np.asarray(
                jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            )[0]

        blank = dec.blank_id
        best = [(-np.inf, [])]
        vec0, st0 = pred(dec.sos_id, dec.pred_init_state(1))

        def rec(t, k, vec, st, acc, toks, lm_state):
            if t == T:
                if acc > best[0][0]:
                    best[0] = (acc, list(toks))
                return
            lp = joint_lp(t, vec)
            rec(t + 1, 0, vec, st, acc + lp[blank], toks, lm_state)
            if k < K:
                for v in range(blank):
                    nvec, nst = pred(v, st)
                    lm_term = w * float(lm.table[lm_state, v])
                    nxt_lm = v  # order-2 LM: context = last token
                    nacc = acc + lp[v] + lm_term
                    if k + 1 == K:
                        rec(t + 1, 0, nvec, nst, nacc, toks + [v], nxt_lm)
                    else:
                        rec(t, k + 1, nvec, nst, nacc, toks + [v], nxt_lm)

        rec(0, 0, vec0, st0, 0.0, [], lm._boundary_state())

        seqs, lens, scores = transducer_beam_search(
            dec, params, jnp.asarray(enc), jnp.asarray([T], np.int32),
            beam_width=64, max_symbols=K, lm=lm.dense(), lm_weight=w,
        )
        got = list(np.asarray(seqs)[0, 0, : int(lens[0, 0])])
        assert got == best[0][1], (got, best[0][1])
        assert abs(float(scores[0, 0]) - best[0][0]) < 1e-4


class TestRescore:
    def test_reorders_by_combined_score(self):
        lm = NgramLM.train([[0, 1]] * 10, vocab=3, order=2)
        # hyp A [0,1] is LM-favored; hyp B [1,0] has better AM
        entries = [
            ("utt1", -2.0, [1, 0]),
            ("utt1", -2.5, [0, 1]),
            ("utt2", -1.0, [0, 1]),
        ]
        out = rescore_nbest(entries, lm, lm_weight=5.0)
        assert [e[0] for e in out] == ["utt1", "utt1", "utt2"]
        assert out[0][2] == [0, 1]  # LM flipped the order
        out0 = rescore_nbest(entries, lm, lm_weight=0.0)
        assert out0[0][2] == [1, 0]  # weight 0 keeps AM order

    def test_scripts_end_to_end(self, tmp_path):
        """run lm + run rescore over a synthetic recipe + nbest file."""
        from tests.corpus_utils import make_corpus, write_recipe
        from nabu_tpu.scripts import lm as lm_script
        from nabu_tpu.scripts import rescore as rescore_script

        root = tmp_path
        corpus = {
            "train": make_corpus(str(root / "train"), 12, seed=40),
            "dev": make_corpus(str(root / "dev"), 4, seed=41),
        }
        recipe = str(root / "recipe")
        write_recipe(recipe, corpus, "[model]\n", "[trainer]\n")
        expdir = str(root / "exp")
        lm_path = lm_script.main(recipe, expdir, order=2)
        assert os.path.exists(lm_path)

        os.makedirs(os.path.join(expdir, "decoded"), exist_ok=True)
        with open(os.path.join(expdir, "decoded", "nbest.txt"), "w") as f:
            f.write("utt0 -1.0 a b\nutt0 -1.1 b a\nutt1 -0.5 c\n")
        out = rescore_script.main(
            recipe, expdir, lm_path=lm_path, lm_weight=0.5
        )
        lines = open(out).read().strip().splitlines()
        assert len(lines) == 3
        assert lines[0].startswith("utt0") and lines[2].startswith("utt1")
        # scores include the LM term (differ from the AM-only input)
        assert float(lines[2].split()[1]) != -0.5


class TestReviewFixes:
    def test_empty_corpus_raises(self):
        with pytest.raises(ValueError):
            NgramLM.train([], vocab=4, order=2)

    def test_greedy_recognizer_rejects_lm_config(self):
        import nabu_tpu.models  # noqa: F401
        from nabu_tpu.config import Conf, ConfigFile
        from nabu_tpu.decoding.recognizers import build_recognizer
        from nabu_tpu.models.model import build_model

        cfg = ConfigFile({
            "encoder": Conf({"encoder": "dnn", "num_units": "8"},
                            "encoder"),
            "decoder": Conf({"decoder": "linear_ctc"}, "decoder"),
        })
        model = build_model(cfg, input_dim=4, num_labels=3)
        with pytest.raises(ValueError, match="fusion"):
            build_recognizer(
                Conf({"recognizer": "ctc_greedy",
                      "lm_path": "/nonexistent.npz",
                      "lm_weight": "0.3"}), model,
            )

    def test_beam_recognizer_rejects_vocab_mismatch(self, tmp_path):
        import nabu_tpu.models  # noqa: F401
        from nabu_tpu.config import Conf, ConfigFile
        from nabu_tpu.decoding.recognizers import build_recognizer
        from nabu_tpu.models.model import build_model

        lm = NgramLM.train([[0, 1]], vocab=3, order=2)  # 2-label LM
        path = str(tmp_path / "lm.npz")
        lm.save(path)
        cfg = ConfigFile({
            "encoder": Conf({"encoder": "dnn", "num_units": "8"},
                            "encoder"),
            "decoder": Conf({"decoder": "linear_ctc"}, "decoder"),
        })
        model = build_model(cfg, input_dim=4, num_labels=5)  # 5 labels
        with pytest.raises(ValueError, match="vocab"):
            build_recognizer(
                Conf({"recognizer": "ctc_beam", "lm_path": path,
                      "lm_weight": "0.3"}), model,
            )

    def test_rescore_text_roundtrip_multichar_tokens(self):
        from nabu_tpu.config import Conf
        from nabu_tpu.data.processors import TextProcessor
        from nabu_tpu.scripts.common import ids_to_text
        from nabu_tpu.scripts.rescore import _text_to_ids

        proc = TextProcessor(Conf({
            "alphabet": "<space> <unk> a b", "tokenizer": "char",
        }))
        ids = [2, 0, 1, 3, 2]  # "a <space> <unk> b a"
        text = ids_to_text(ids, proc.alphabet, "char")
        assert text == "a <unk>ba"
        got = _text_to_ids(proc, "char", text)
        assert got == ids, (got, ids)
