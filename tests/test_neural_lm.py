"""Neural (LSTM) LM: training, scoring, persistence, and exact shallow
fusion in the attention / CTC-prefix / transducer beam searches.

The fusion tests mirror tests/test_lm.py's n-gram exactness harnesses
with the RnnLM swapped in: the beams must treat the pytree LM state
exactly like the scalar n-gram context (gather over the beam axis,
freeze on finished/stay)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nabu_tpu.decoding.neural_lm import RnnLM


def _toy_corpus(rng, n=60):
    """Skewed bigram-ish language over labels {0, 1, 2}: 0 is almost
    always followed by 1, sequences end after 2."""
    seqs = []
    for _ in range(n):
        seq = []
        tok = int(rng.randint(0, 2))
        for _ in range(int(rng.randint(2, 7))):
            seq.append(tok)
            tok = 1 if tok == 0 else int(rng.randint(0, 3))
            if tok == 2:
                seq.append(2)
                break
        seqs.append(seq)
    return seqs


def _train_toy_rnnlm(vocab=4, seed=0, num_steps=200):
    rng = np.random.RandomState(seed)
    # ids >= vocab-1 would collide with the boundary id: the corpus's
    # "2"-ender becomes an implicit </s> for a vocab-3 (2-label) LM
    seqs = [[t for t in s if t < vocab - 1] for s in _toy_corpus(rng)]
    seqs = [s for s in seqs if s]
    return (
        RnnLM.train(
            seqs, vocab, num_units=16, embed_dim=8,
            num_steps=num_steps, batch_size=32, seed=seed,
        ),
        seqs,
    )


class TestRnnLM:
    def test_training_lowers_perplexity(self):
        lm, seqs = _train_toy_rnnlm()
        untrained = RnnLM.create(4, num_units=16, embed_dim=8, seed=0)
        assert lm.perplexity(seqs) < untrained.perplexity(seqs)
        # the corpus is far from uniform: a trained LM must beat it
        assert lm.perplexity(seqs) < 4.0

    def test_dense_logp_rows_are_distributions(self):
        lm, _ = _train_toy_rnnlm(num_steps=20)
        dense = lm.dense()
        state = dense.init_state((2, 3))
        lp = dense.logprobs(state)
        assert lp.shape == (2, 3, 4)
        np.testing.assert_allclose(
            np.asarray(jnp.exp(lp).sum(-1)), 1.0, rtol=1e-5
        )
        state = dense.step(state, jnp.ones((2, 3), jnp.int32))
        np.testing.assert_allclose(
            np.asarray(jnp.exp(dense.logprobs(state)).sum(-1)),
            1.0, rtol=1e-5,
        )

    def test_step_chain_matches_batched_scoring(self):
        """Stepping dense() token by token accumulates exactly the
        batched seq_logprobs score (fusion and rescoring agree)."""
        lm, _ = _train_toy_rnnlm(num_steps=30)
        dense = lm.dense()
        seq = [0, 1, 1, 2]
        state = dense.init_state((1,))
        total = 0.0
        for tok in seq + [lm.boundary]:
            total += float(dense.logprobs(state)[0, tok])
            state = dense.step(state, jnp.asarray([tok], jnp.int32))
        np.testing.assert_allclose(
            total, float(lm.seq_logprobs([seq])[0]), rtol=1e-5
        )
        np.testing.assert_allclose(
            total - float(dense.logprobs(state)[0, lm.boundary])
            + float(dense.logprobs(state)[0, lm.boundary]),
            float(lm.logprob(seq)), rtol=1e-5,
        )
        # include_eos=False drops exactly the final </s> term
        prefix_lp = float(lm.seq_logprobs([seq], include_eos=False)[0])
        assert prefix_lp > float(lm.logprob(seq))

    def test_save_load_roundtrip(self, tmp_path):
        lm, seqs = _train_toy_rnnlm(num_steps=20)
        path = str(tmp_path / "lm_rnn.npz")
        lm.save(path)
        back = RnnLM.load(path)
        assert (back.vocab, back.num_layers, back.num_units) == (
            lm.vocab, lm.num_layers, lm.num_units,
        )
        np.testing.assert_allclose(
            back.seq_logprobs(seqs[:5]), lm.seq_logprobs(seqs[:5]),
            rtol=1e-6,
        )

    def test_load_lm_dispatches_by_kind(self, tmp_path):
        from nabu_tpu.decoding.lm import NgramLM, load_dense_lm, load_lm
        from nabu_tpu.decoding.neural_lm import DenseRnnLM

        lm, _ = _train_toy_rnnlm(num_steps=5)
        rnn_path = str(tmp_path / "rnn.npz")
        lm.save(rnn_path)
        ng = NgramLM.train([[0, 1], [1, 0]], vocab=3, order=2)
        ng_path = str(tmp_path / "ng.npz")
        ng.save(ng_path)
        assert isinstance(load_lm(rnn_path), RnnLM)
        assert isinstance(load_lm(ng_path), NgramLM)
        assert isinstance(load_dense_lm(rnn_path), DenseRnnLM)

    def test_empty_corpus_raises(self):
        with pytest.raises(ValueError):
            RnnLM.train([], vocab=4)


class TestAttentionFusionRnn:
    def test_wide_beam_fused_is_exact(self):
        """Fused beam top-1 == argmax over ALL finished sequences of
        am + w * lm_rnn (enumerated)."""
        import nabu_tpu.models  # noqa: F401
        from nabu_tpu.config import Conf
        from nabu_tpu.decoding.beam import attention_beam_search
        from nabu_tpu.ops.masking import sequence_mask
        from nabu_tpu.registry import DECODERS

        conf = Conf({
            "decoder": "speller", "num_layers": "1", "num_units": "8",
            "embed_dim": "4",
        })
        dec = DECODERS.build("speller", conf, 6, 2)  # V=3 with eos=2
        params = dec.init(jax.random.PRNGKey(0))
        lm, _ = _train_toy_rnnlm(vocab=3, seed=1, num_steps=60)
        w = 0.7
        rng = np.random.RandomState(1)
        encoded = jnp.asarray(rng.randn(1, 4, 6).astype(np.float32))
        enc_len = jnp.asarray([4], np.int32)
        max_steps = 3

        def am_score(tokens):
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

        from itertools import product

        best_score, best_seq = -np.inf, None
        for n in range(0, max_steps):
            for seq in product([0, 1], repeat=n):
                s = am_score(seq) + w * lm.logprob(list(seq))
                if s > best_score:
                    best_score, best_seq = s, list(seq)

        seqs, lengths, scores = attention_beam_search(
            dec, params, encoded, enc_len, beam_width=16,
            max_steps=max_steps, lm=lm.dense(), lm_weight=w,
        )
        got = list(np.asarray(seqs)[0, 0, : int(lengths[0, 0])])
        assert got == best_seq, (got, best_seq)
        assert abs(float(scores[0, 0]) - best_score) < 1e-4


class TestCTCFusionRnn:
    def test_matches_python_reference(self):
        """Device prefix beam fused with the RNN LM == the independent
        Hannun-style python beam using lm.logprob increments."""
        from tests.test_lm import TestCTCFusion
        from nabu_tpu.decoding.ctc_beam import ctc_prefix_beam_search

        V, blank = 4, 3
        lm, _ = _train_toy_rnnlm(vocab=V, seed=3, num_steps=60)
        w = 0.5
        rng = np.random.RandomState(4)
        logits = rng.randn(1, 5, V).astype(np.float32) * 1.5
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))[0]

        W = 16
        ref = TestCTCFusion()._python_prefix_beam_lm(lp, W, blank, lm, w)
        seqs, lengths, scores = ctc_prefix_beam_search(
            jnp.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1)),
            jnp.asarray([5], np.int32), beam_width=W, blank_id=blank,
            lm=lm.dense(), lm_weight=w,
        )
        got = list(np.asarray(seqs)[0, 0, : int(lengths[0, 0])])
        assert got == ref[0][0], (got, ref[0][0])
        assert abs(float(scores[0, 0]) - ref[0][1]) < 1e-3


class TestTransducerFusionRnn:
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
        lm, _ = _train_toy_rnnlm(vocab=4, seed=5, num_steps=60)
        w = 0.8
        rng = np.random.RandomState(6)
        T, K = 2, 2
        enc = (rng.randn(1, T, 4) * 2).astype(np.float32)
        enc_proj = np.asarray(dec.precompute(params, jnp.asarray(enc)))

        def pred(prev, state):
            return dec.pred_step(
                params, jnp.asarray([prev], jnp.int32), state
            )

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

        # pre-score every possible label prefix in ONE batched device
        # call (the enumeration below would otherwise make hundreds of
        # tiny eager calls — slow, and heavy compile churn for the
        # environment's fragile XLA:CPU)
        from itertools import product

        all_prefixes = [[]]
        for L in range(1, T * K + 1):
            all_prefixes += [
                list(p) for p in product(range(blank), repeat=L)
            ]
        scores_table = lm.seq_logprobs(all_prefixes, include_eos=False)
        lp_table = {
            tuple(p): float(s)
            for p, s in zip(all_prefixes, scores_table)
        }

        def lm_inc(prefix, v):
            """log P_lm(v | prefix), no eos (emission fusion term)."""
            return lp_table[tuple(prefix) + (v,)] - lp_table[tuple(prefix)]

        def rec(t, k, vec, st, acc, toks):
            if t == T:
                if acc > best[0][0]:
                    best[0] = (acc, list(toks))
                return
            lp = joint_lp(t, vec)
            rec(t + 1, 0, vec, st, acc + lp[blank], toks)
            if k < K:
                for v in range(blank):
                    nvec, nst = pred(v, st)
                    nacc = acc + lp[v] + w * lm_inc(toks, v)
                    if k + 1 == K:
                        rec(t + 1, 0, nvec, nst, nacc, toks + [v])
                    else:
                        rec(t, k + 1, nvec, nst, nacc, toks + [v])

        rec(0, 0, vec0, st0, 0.0, [])

        seqs, lens, scores = transducer_beam_search(
            dec, params, jnp.asarray(enc), jnp.asarray([T], np.int32),
            beam_width=64, max_symbols=K, lm=lm.dense(), lm_weight=w,
        )
        got = list(np.asarray(seqs)[0, 0, : int(lens[0, 0])])
        assert got == best[0][1], (got, best[0][1])
        assert abs(float(scores[0, 0]) - best[0][0]) < 1e-4


class TestScriptsRnn:
    def test_run_lm_rnn_and_rescore_end_to_end(self, tmp_path):
        """run lm --type rnn + run rescore (auto-discovers lm_rnn.npz)."""
        import os

        from tests.corpus_utils import make_corpus, write_recipe
        from nabu_tpu.scripts import lm as lm_script
        from nabu_tpu.scripts import rescore as rescore_script

        root = tmp_path
        corpus = {
            "train": make_corpus(str(root / "train"), 12, seed=50),
            "dev": make_corpus(str(root / "dev"), 4, seed=51),
        }
        recipe = str(root / "recipe")
        write_recipe(recipe, corpus, "[model]\n", "[trainer]\n")
        expdir = str(root / "exp")
        lm_path = lm_script.main(
            recipe, expdir, lm_type="rnn", num_units=16, embed_dim=8,
            num_steps=30, batch_size=8,
        )
        assert lm_path.endswith("lm_rnn.npz") and os.path.exists(lm_path)

        os.makedirs(os.path.join(expdir, "decoded"), exist_ok=True)
        with open(os.path.join(expdir, "decoded", "nbest.txt"), "w") as f:
            f.write("utt0 -1.0 a b\nutt0 -1.1 b a\nutt1 -0.5 c\n")
        # no lm_path: rescore discovers expdir/lm/lm_rnn.npz by itself
        out = rescore_script.main(recipe, expdir, lm_weight=0.5)
        lines = open(out).read().strip().splitlines()
        assert len(lines) == 3
        assert lines[0].startswith("utt0") and lines[2].startswith("utt1")
        assert float(lines[2].split()[1]) != -0.5


class TestRescoreRnn:
    def test_batched_rescore_matches_per_sequence(self):
        from nabu_tpu.decoding.lm import rescore_nbest

        lm, _ = _train_toy_rnnlm(num_steps=30)
        entries = [
            ("utt1", -2.0, [1, 0]),
            ("utt1", -2.5, [0, 1]),
            ("utt2", -1.0, [0, 1, 1]),
        ]
        out = rescore_nbest(entries, lm, lm_weight=1.0)
        for utt, score, ids in out:
            am = next(a for u, a, i in entries if u == utt and i == ids)
            np.testing.assert_allclose(
                score, am + lm.logprob(ids), rtol=1e-6
            )
        out0 = rescore_nbest(entries, lm, lm_weight=0.0)
        assert out0[0][2] == [1, 0]  # weight 0 keeps AM order
