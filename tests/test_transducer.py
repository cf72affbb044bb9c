"""RNN-T (transducer) family tests: loss vs brute-force alignment
enumeration, gradient checks, head consistency (pred_step == scan),
greedy-search logic vs an independent python reference, and an
end-to-end train/test run on the tone corpus."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nabu_tpu.ops.transducer import transducer_loss


def brute_force_nll(logits, targets, T_b, U_b, blank):
    """Enumerate every monotone alignment (exponential; tiny shapes)."""
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    total = [-np.inf]

    def rec(t, u, acc):
        if t == T_b - 1 and u == U_b:
            total[0] = np.logaddexp(total[0], acc + lp[t, u, blank])
        if u < U_b:
            rec(t, u + 1, acc + lp[t, u, targets[u]])
        if t < T_b - 1:
            rec(t + 1, u, acc + lp[t, u, blank])

    rec(0, 0, 0.0)
    return -total[0]


class TestTransducerLoss:
    def _case(self, seed=0, B=3, T=5, U=3, V=4):
        rng = np.random.RandomState(seed)
        logits = rng.randn(B, T, U + 1, V).astype(np.float32)
        targets = rng.randint(0, V - 1, (B, U)).astype(np.int32)
        tlen = rng.randint(0, U + 1, (B,)).astype(np.int32)
        llen = rng.randint(1, T + 1, (B,)).astype(np.int32)
        # RNN-T needs T_b >= 1; any (T_b, U_b) combo is legal since the
        # lattice allows multiple emissions per frame
        return logits, targets, tlen, llen

    def test_matches_brute_force(self):
        logits, targets, tlen, llen = self._case()
        blank = logits.shape[-1] - 1
        nll = transducer_loss(
            jnp.asarray(logits), jnp.asarray(llen), jnp.asarray(targets),
            jnp.asarray(tlen),
        )
        for b in range(logits.shape[0]):
            ref = brute_force_nll(
                logits[b], targets[b], int(llen[b]), int(tlen[b]), blank
            )
            assert abs(float(nll[b]) - ref) < 1e-4, (b, float(nll[b]), ref)

    def test_gradient_matches_numeric(self):
        logits, targets, tlen, llen = self._case(seed=1, B=2, T=4, U=2)

        def f(lg):
            return transducer_loss(
                lg, jnp.asarray(llen), jnp.asarray(targets),
                jnp.asarray(tlen),
            ).sum()

        g = np.asarray(jax.grad(f)(jnp.asarray(logits)))
        assert np.isfinite(g).all()
        eps = 1e-3
        rng = np.random.RandomState(2)
        for _ in range(6):
            idx = tuple(rng.randint(0, s) for s in logits.shape)
            lp, lm = logits.copy(), logits.copy()
            lp[idx] += eps
            lm[idx] -= eps
            num = (float(f(jnp.asarray(lp))) - float(f(jnp.asarray(lm)))) / (
                2 * eps
            )
            assert abs(g[idx] - num) < 2e-3, (idx, g[idx], num)

    def test_padding_invariance(self):
        logits, targets, tlen, llen = self._case(seed=3)
        nll = transducer_loss(
            jnp.asarray(logits), jnp.asarray(llen), jnp.asarray(targets),
            jnp.asarray(tlen),
        )
        # pad T and U with garbage; lengths unchanged
        rng = np.random.RandomState(4)
        B, T, Up1, V = logits.shape
        big = rng.randn(B, T + 3, Up1 + 2, V).astype(np.float32) * 5
        big[:, :T, :Up1, :] = logits
        tgt_big = np.concatenate(
            [targets, rng.randint(0, V - 1, (B, 2)).astype(np.int32)], axis=1
        )
        nll_pad = transducer_loss(
            jnp.asarray(big), jnp.asarray(llen), jnp.asarray(tgt_big),
            jnp.asarray(tlen),
        )
        np.testing.assert_allclose(
            np.asarray(nll), np.asarray(nll_pad), rtol=1e-5, atol=1e-5
        )

    def test_perfect_model_low_loss(self):
        # a lattice that puts ~all mass on the correct next symbol
        B, T, U, V = 1, 4, 2, 4
        targets = np.array([[0, 1]], np.int32)
        logits = np.zeros((B, T, U + 1, V), np.float32)
        # emit 0 then 1 at frame 0, then blanks along u=U
        logits[0, 0, 0, 0] = 30.0
        logits[0, 0, 1, 1] = 30.0
        logits[0, :, 2, V - 1] = 30.0
        nll = transducer_loss(
            jnp.asarray(logits), jnp.asarray([T], np.int32),
            jnp.asarray(targets), jnp.asarray([U], np.int32),
        )
        assert float(nll[0]) < 1e-3


class TestTransducerHead:
    def _build(self, V=5):
        import nabu_tpu.models  # noqa: F401 (registers decoders)
        from nabu_tpu.config import Conf
        from nabu_tpu.registry import DECODERS

        conf = Conf(
            {
                "decoder": "rnnt",
                "num_layers": "2",
                "num_units": "16",
                "embed_dim": "8",
                "joint_units": "12",
            }
        )
        dec = DECODERS.build("rnnt", conf, 10, V)
        params = dec.init(jax.random.PRNGKey(0))
        return dec, params

    def test_lattice_shapes_and_blank(self):
        dec, params = self._build(V=5)
        B, T, U = 2, 6, 3
        rng = np.random.RandomState(0)
        encoded = jnp.asarray(rng.randn(B, T, 10).astype(np.float32))
        enc_len = jnp.asarray([6, 4], np.int32)
        targets = jnp.asarray(rng.randint(0, 5, (B, U)), jnp.int32)
        tgt_len = jnp.asarray([3, 2], np.int32)
        logits, lengths = dec.apply(
            params, encoded, enc_len, targets, tgt_len
        )
        assert logits.shape == (B, T, U + 1, 6)
        assert dec.blank_id == 5
        np.testing.assert_array_equal(np.asarray(lengths), [6, 4])

    def test_remat_matches_plain(self):
        dec, params = self._build()
        dec2, _ = self._build()
        dec2.remat = False
        rng = np.random.RandomState(1)
        encoded = jnp.asarray(rng.randn(2, 5, 10).astype(np.float32))
        enc_len = jnp.asarray([5, 5], np.int32)
        targets = jnp.asarray(rng.randint(0, 5, (2, 3)), jnp.int32)
        tgt_len = jnp.asarray([3, 3], np.int32)
        a, _ = dec.apply(params, encoded, enc_len, targets, tgt_len)
        b, _ = dec2.apply(params, encoded, enc_len, targets, tgt_len)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_pred_step_matches_scan(self):
        dec, params = self._build()
        B, U = 3, 4
        rng = np.random.RandomState(2)
        targets = jnp.asarray(rng.randint(0, 5, (B, U)), jnp.int32)
        tgt_len = jnp.full((B,), U, jnp.int32)
        seq = dec._pred_sequence(params, targets, tgt_len)  # [B, U+1, P]

        state = dec.pred_init_state(B)
        prev = jnp.full((B,), dec.sos_id, jnp.int32)
        outs = []
        for u in range(U + 1):
            vec, state = dec.pred_step(params, prev, state)
            outs.append(vec)
            if u < U:
                prev = targets[:, u]
        step_seq = jnp.stack(outs, axis=1)
        np.testing.assert_allclose(
            np.asarray(seq), np.asarray(step_seq), atol=1e-5
        )

    def test_joint_step_matches_lattice(self):
        dec, params = self._build()
        B, T, U = 2, 4, 2
        rng = np.random.RandomState(3)
        encoded = jnp.asarray(rng.randn(B, T, 10).astype(np.float32))
        enc_len = jnp.full((B,), T, jnp.int32)
        targets = jnp.asarray(rng.randint(0, 5, (B, U)), jnp.int32)
        tgt_len = jnp.full((B,), U, jnp.int32)
        lattice, _ = dec.apply(params, encoded, enc_len, targets, tgt_len)

        enc_proj = dec.precompute(params, encoded)
        pred = dec._pred_sequence(params, targets, tgt_len)
        for t in range(T):
            for u in range(U + 1):
                pv = pred[:, u, :]
                step_logits = dec.joint_step(params, enc_proj[:, t], pv)
                np.testing.assert_allclose(
                    np.asarray(lattice[:, t, u]),
                    np.asarray(step_logits),
                    atol=1e-5,
                )


class _StubTransducer:
    """Duck-typed transducer head with a scripted joint: at frame t it
    emits the lane's next planned token while fewer than cum_plan[t]
    tokens have been emitted in total, else blank. The prediction state
    is the emitted-token count, so search behavior (budget capping,
    blank frame-closing, packing) is fully predictable."""

    def __init__(self, tokens, cum_plan, V):
        self.tokens = jnp.asarray(tokens)  # [B, N] planned token ids
        self.cum_plan = np.asarray(cum_plan)  # [T] cumulative targets
        self.blank_id = V - 1
        self.sos_id = V - 1
        self.V = V

    def precompute(self, params, encoded):
        return encoded  # [B, T, J]; enc[..., 0] carries cum_plan[t]

    def pred_init_state(self, B, dtype=jnp.float32):
        return [jnp.full((B, 1), -1.0, jnp.float32)]

    def pred_step(self, params, ids, state):
        c = state[0] + 1.0  # counts pred-net steps; first is <s>
        return c, [c]

    def joint_step(self, params, enc_t, pred_vec):
        n_emitted = pred_vec[:, 0]  # [B]
        quota = enc_t[:, 0]  # cum_plan[t]
        idx = jnp.clip(n_emitted.astype(jnp.int32), 0,
                       self.tokens.shape[1] - 1)
        tok = jnp.take_along_axis(self.tokens, idx[:, None], axis=1)[:, 0]
        choose = jnp.where(n_emitted < quota, tok, self.blank_id)
        return jax.nn.one_hot(choose, self.V) * 10.0


def _reference_greedy(stub, enc, enc_lengths, max_symbols):
    """Independent python-loop RNN-T greedy (the spec, not the impl)."""
    B, T, _ = enc.shape
    out, scores = [], []
    for b in range(B):
        state = [np.full((1, 1), -1.0, np.float32)]
        vec, state = np.asarray(
            stub.pred_step(None, None, [jnp.asarray(state[0])])[0]
        ), None
        count = float(vec[0, 0])
        toks, score = [], 0.0
        for t in range(int(enc_lengths[b])):
            for _ in range(max_symbols):
                quota = float(enc[b, t, 0])
                n = count
                logits = np.full((stub.V,), 0.0)
                if n < quota:
                    tok = int(np.asarray(stub.tokens)[b, min(int(n),
                              stub.tokens.shape[1] - 1)])
                else:
                    tok = stub.blank_id
                logits[tok] = 10.0
                lp = logits - np.log(np.sum(np.exp(logits)))
                score += lp[tok]
                if tok == stub.blank_id:
                    break
                toks.append(tok)
                count += 1.0
        out.append(toks)
        scores.append(score)
    return out, scores


class TestGreedySearch:
    def test_matches_reference(self):
        from nabu_tpu.decoding.transducer import transducer_greedy_search

        V = 5
        B, T = 3, 5
        plan = np.array([2, 0, 1, 3, 0])  # symbols per frame (lane-shared)
        cum = np.cumsum(plan).astype(np.float32)
        rng = np.random.RandomState(0)
        tokens = rng.randint(0, V - 1, (B, 16))
        enc = np.zeros((B, T, 4), np.float32)
        enc[:, :, 0] = cum[None, :]
        enc_lengths = np.array([5, 3, 1], np.int32)
        stub = _StubTransducer(tokens, cum, V)

        ids, lengths, scores = transducer_greedy_search(
            stub, {}, jnp.asarray(enc), jnp.asarray(enc_lengths),
            max_symbols=2,  # frame 3 wants 3 — budget must cap it
        )
        ref_out, ref_scores = _reference_greedy(
            stub, enc, enc_lengths, max_symbols=2
        )
        for b in range(B):
            L = int(lengths[b])
            assert list(np.asarray(ids)[b, :L]) == ref_out[b], b
            assert abs(float(scores[b]) - ref_scores[b]) < 1e-4, b


class TestBeamSearch:
    def _tiny_model(self, V=3, D=4, seed=0):
        import nabu_tpu.models  # noqa: F401
        from nabu_tpu.config import Conf
        from nabu_tpu.registry import DECODERS

        conf = Conf(
            {"decoder": "rnnt", "num_layers": "1", "num_units": "8",
             "embed_dim": "4", "joint_units": "6"}
        )
        dec = DECODERS.build("rnnt", conf, D, V)
        params = dec.init(jax.random.PRNGKey(seed))
        return dec, params

    def _brute_force_best_path(self, dec, params, enc, enc_len, K):
        """Enumerate every alignment path (emit <= K per frame, blank or
        budget closes a frame); return the best (score, tokens)."""
        enc_proj = np.asarray(dec.precompute(params, jnp.asarray(enc)))

        def pred(prev, state):
            vec, st = dec.pred_step(
                params, jnp.asarray([prev], jnp.int32),
                [(jnp.asarray(h), jnp.asarray(c)) for h, c in state],
            )
            return np.asarray(vec), [
                (np.asarray(h), np.asarray(c)) for h, c in st
            ]

        def joint_lp(t, vec):
            logits = dec.joint_step(
                params, jnp.asarray(enc_proj[None, 0, t]),
                jnp.asarray(vec),
            )
            return np.asarray(
                jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            )[0]

        blank = dec.blank_id
        best = [(-np.inf, [])]
        vec0, st0 = pred(dec.sos_id, dec.pred_init_state(1))

        # per frame: emit up to K symbols (the K-th forces a free
        # advance, no blank score) or take blank to close the frame
        def rec2(t, k, vec, st, acc, toks):
            if t == enc_len:
                if acc > best[0][0]:
                    best[0] = (acc, list(toks))
                return
            lp = joint_lp(t, vec)
            rec2(t + 1, 0, vec, st, acc + lp[blank], toks)
            if k < K:
                for v in range(len(lp)):
                    if v == blank:
                        continue
                    nvec, nst = pred(v, st)
                    if k + 1 == K:
                        rec2(t + 1, 0, nvec, nst, acc + lp[v], toks + [v])
                    else:
                        rec2(t, k + 1, nvec, nst, acc + lp[v], toks + [v])

        rec2(0, 0, vec0, st0, 0.0, [])
        return best[0]

    def test_wide_beam_is_exact(self):
        from nabu_tpu.decoding.transducer import transducer_beam_search

        dec, params = self._tiny_model()
        rng = np.random.RandomState(5)
        T, D, K = 2, 4, 2
        enc = (rng.randn(1, T, D) * 2).astype(np.float32)
        ref_score, ref_toks = self._brute_force_best_path(
            dec, params, enc, T, K
        )
        seqs, lens, scores = transducer_beam_search(
            dec, params, jnp.asarray(enc),
            jnp.asarray([T], np.int32), beam_width=64, max_symbols=K,
        )
        got = list(np.asarray(seqs)[0, 0, : int(lens[0, 0])])
        assert got == ref_toks, (got, ref_toks)
        assert abs(float(scores[0, 0]) - ref_score) < 1e-4

    def test_beam_one_equals_greedy(self):
        from nabu_tpu.decoding.transducer import (
            transducer_beam_search,
            transducer_greedy_search,
        )

        dec, params = self._tiny_model(V=5, D=6, seed=7)
        rng = np.random.RandomState(8)
        B, T = 3, 6
        enc = (rng.randn(B, T, 6) * 2).astype(np.float32)
        enc_len = jnp.asarray([6, 4, 2], np.int32)
        g_ids, g_len, g_scores = transducer_greedy_search(
            dec, params, jnp.asarray(enc), enc_len, max_symbols=3
        )
        b_ids, b_len, b_scores = transducer_beam_search(
            dec, params, jnp.asarray(enc), enc_len, beam_width=1,
            max_symbols=3,
        )
        for b in range(B):
            L = int(g_len[b])
            assert int(b_len[b, 0]) == L
            assert list(np.asarray(b_ids)[b, 0, :L]) == list(
                np.asarray(g_ids)[b, :L]
            )
            assert abs(float(b_scores[b, 0]) - float(g_scores[b])) < 1e-4

    def test_length_norm_changes_ranking_not_scores(self):
        """length_norm_power re-ranks but returned scores stay raw."""
        from nabu_tpu.decoding.transducer import transducer_beam_search

        dec, params = self._tiny_model(V=4, D=5, seed=11)
        rng = np.random.RandomState(12)
        enc = (rng.randn(2, 4, 5) * 2).astype(np.float32)
        lens = jnp.asarray([4, 3], np.int32)
        s_raw = transducer_beam_search(
            dec, params, jnp.asarray(enc), lens, beam_width=4,
            max_symbols=2,
        )
        s_norm = transducer_beam_search(
            dec, params, jnp.asarray(enc), lens, beam_width=4,
            max_symbols=2, length_norm_power=1.0,
        )
        # same multiset of raw path scores, possibly re-ranked
        np.testing.assert_allclose(
            np.sort(np.asarray(s_raw[2]), axis=1),
            np.sort(np.asarray(s_norm[2]), axis=1),
            atol=1e-5,
        )

    def test_distinct_first_order(self):
        from nabu_tpu.decoding.recognizers import _distinct_first_order

        seqs = np.array([[[1, 2, 0], [1, 2, 9], [3, 0, 0], [1, 2, 0]]])
        lengths = np.array([[2, 2, 1, 3]])
        order = _distinct_first_order(seqs, lengths)
        # slot 1 duplicates slot 0 ([1,2]); slot 3 is distinct ([1,2,0])
        assert list(order[0]) == [0, 2, 3, 1]

    def test_nbest_sorted_and_distinct_scores(self):
        from nabu_tpu.decoding.transducer import transducer_beam_search

        dec, params = self._tiny_model(V=4, D=5, seed=9)
        rng = np.random.RandomState(10)
        enc = (rng.randn(2, 4, 5) * 2).astype(np.float32)
        _, _, scores = transducer_beam_search(
            dec, params, jnp.asarray(enc),
            jnp.asarray([4, 3], np.int32), beam_width=4, max_symbols=2,
        )
        s = np.asarray(scores)
        assert (np.diff(s, axis=1) <= 1e-6).all(), s


MODEL_CFG = """[model]

[encoder]
encoder = listener
num_layers = 1
num_units = 32

[decoder]
decoder = rnnt
num_layers = 1
num_units = 32
embed_dim = 16
joint_units = 32
"""

TRAINER_CFG = """[trainer]
trainer = standard
features = trainfeatures
targets = traintargets
batch_size = 8
num_buckets = 2
num_steps = 600
learning_rate = 4e-3
valid_frequency = 150
log_frequency = 50
num_tries = 8
"""

RECOGNIZER = """recognizer = transducer_greedy
max_symbols = 3"""


@pytest.fixture(scope="module")
def trained_rnnt(tmp_path_factory):
    from tests.corpus_utils import make_corpus, write_recipe

    root = tmp_path_factory.mktemp("rnnt_e2e")
    corpus = {
        "train": make_corpus(str(root / "train"), 72, seed=30, min_len=3,
                             max_len=6),
        "dev": make_corpus(str(root / "dev"), 12, seed=31, min_len=3,
                           max_len=6),
    }
    recipe = str(root / "recipe")
    write_recipe(
        recipe, corpus, MODEL_CFG, TRAINER_CFG,
        recognizer_lines=RECOGNIZER,
    )
    expdir = str(root / "exp")

    from nabu_tpu.scripts import data as data_script
    from nabu_tpu.scripts import train as train_script

    data_script.main(recipe, expdir)
    result = train_script.main(recipe, expdir)
    return root, recipe, expdir, result


class TestTransducerE2E:
    def test_loss_decreases_and_decodes(self, trained_rnnt):
        root, recipe, expdir, _ = trained_rnnt
        from nabu_tpu.scripts import test as test_script

        error_rate = test_script.main(recipe, expdir)
        assert error_rate < 0.2, error_rate
