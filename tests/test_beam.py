"""Beam search tests (SURVEY.md §4: beam search vs brute-force
enumeration on tiny vocab/length; CTC prefix beam vs a trusted
dict-based numpy reference)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nabu_tpu.decoding.beam import attention_beam_search
from nabu_tpu.decoding.ctc_beam import ctc_prefix_beam_search


# ---------------------------------------------------------------------------
# trusted numpy reference: Hannun-style prefix beam search with dicts
# ---------------------------------------------------------------------------

def np_prefix_beam(logprobs, beam_width, blank):
    """logprobs [T, V] numpy. Returns list of (prefix tuple, logp)."""

    def lse(*xs):
        xs = [x for x in xs if x > -1e29]
        if not xs:
            return -np.inf
        m = max(xs)
        return m + np.log(sum(np.exp(x - m) for x in xs))

    beams = {(): (0.0, -np.inf)}  # prefix -> (p_blank, p_nonblank)
    for t in range(logprobs.shape[0]):
        new = {}

        def add(prefix, pb, pnb):
            opb, opnb = new.get(prefix, (-np.inf, -np.inf))
            new[prefix] = (lse(opb, pb), lse(opnb, pnb))

        for prefix, (pb, pnb) in beams.items():
            ptot = lse(pb, pnb)
            # blank
            add(prefix, ptot + logprobs[t, blank], -np.inf)
            # repeat last (stays in same prefix, via pnb)
            if prefix:
                add(prefix, -np.inf, pnb + logprobs[t, prefix[-1]])
            for c in range(logprobs.shape[1]):
                if c == blank:
                    continue
                if prefix and c == prefix[-1]:
                    add(prefix + (c,), -np.inf, pb + logprobs[t, c])
                else:
                    add(prefix + (c,), -np.inf, ptot + logprobs[t, c])
        beams = dict(
            sorted(
                new.items(), key=lambda kv: -lse(*kv[1])
            )[:beam_width]
        )
    return sorted(
        ((p, lse(*v)) for p, v in beams.items()), key=lambda kv: -kv[1]
    )


class TestCTCPrefixBeam:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_numpy_reference(self, seed):
        rng = np.random.default_rng(seed)
        T, V, W = 6, 4, 4
        blank = V - 1
        logits = rng.standard_normal((1, T, V)).astype(np.float32) * 2
        logprobs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
        seqs, lengths, scores = ctc_prefix_beam_search(
            jnp.asarray(logprobs), jnp.array([T]), W, blank
        )
        ref = np_prefix_beam(logprobs[0], W, blank)
        got_best = tuple(np.asarray(seqs)[0, 0, : int(lengths[0, 0])])
        assert got_best == ref[0][0], (got_best, ref[:2])
        np.testing.assert_allclose(float(scores[0, 0]), ref[0][1], rtol=1e-3)
        # full beam contents match (as sets of prefixes with scores)
        got = {
            tuple(np.asarray(seqs)[0, n, : int(lengths[0, n])]): float(
                scores[0, n]
            )
            for n in range(W)
            if float(scores[0, n]) > -1e29
        }
        for prefix, score in ref:
            assert prefix in got, (prefix, got)
            np.testing.assert_allclose(got[prefix], score, rtol=1e-3)

    def test_batched_matches_single(self):
        rng = np.random.default_rng(7)
        T, V, W, B = 5, 5, 3, 3
        blank = V - 1
        logprobs = np.asarray(
            jax.nn.log_softmax(
                jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32)),
                -1,
            )
        )
        lengths_in = np.array([5, 3, 1], np.int32)
        seqs, lengths, scores = ctc_prefix_beam_search(
            jnp.asarray(logprobs), jnp.asarray(lengths_in), W, blank
        )
        for b in range(B):
            ref = np_prefix_beam(logprobs[b, : lengths_in[b]], W, blank)
            got_best = tuple(np.asarray(seqs)[b, 0, : int(lengths[b, 0])])
            assert got_best == ref[0][0]
            np.testing.assert_allclose(
                float(scores[b, 0]), ref[0][1], rtol=1e-3
            )

    def test_beats_or_ties_greedy(self):
        """Prefix-beam best path probability >= greedy collapse path."""
        from nabu_tpu.ops.ctc import ctc_greedy_collapse

        rng = np.random.default_rng(11)
        T, V, W = 10, 6, 8
        blank = V - 1
        logprobs = np.asarray(
            jax.nn.log_softmax(
                jnp.asarray(rng.standard_normal((1, T, V)).astype(np.float32) * 3),
                -1,
            )
        )
        seqs, lengths, scores = ctc_prefix_beam_search(
            jnp.asarray(logprobs), jnp.array([T]), W, blank
        )
        frame_ids = jnp.argmax(jnp.asarray(logprobs), -1)
        g_ids, g_len = ctc_greedy_collapse(frame_ids, jnp.array([T]), blank)
        # score the greedy label sequence by full marginalization
        from nabu_tpu.ops.ctc import ctc_loss

        greedy_nll = ctc_loss(
            jnp.asarray(logprobs),  # already log-softmax; softmax is idempotent-ish
            jnp.array([T]),
            g_ids[:, : max(int(g_len[0]), 1)],
            g_len,
            blank_id=blank,
        )
        # compare total sequence probabilities
        beam_nll = ctc_loss(
            jnp.asarray(logprobs),
            jnp.array([T]),
            seqs[:, 0, : max(int(lengths[0, 0]), 1)],
            lengths[:, 0],
            blank_id=blank,
        )
        assert float(beam_nll[0]) <= float(greedy_nll[0]) + 1e-3


# ---------------------------------------------------------------------------
# attention beam search on a deterministic toy decoder
# ---------------------------------------------------------------------------

class ToyDecoder:
    """Table-driven autoregressive decoder: logits depend only on the
    previous token, enabling exact brute-force scoring."""

    def __init__(self, table):
        # table [V, V]: row prev -> next-token logits; sos uses row of eos id
        self.table = jnp.asarray(table, jnp.float32)
        self.output_dim = table.shape[1]
        self.sos_id = table.shape[0] - 1
        self.eos_id = table.shape[0] - 1

    def init_state(self, batch, dtype=jnp.float32, enc_frames=None):
        return {"dummy": jnp.zeros((batch, 1), dtype)}

    def step(self, params, prev_ids, state, encoded, enc_mask, keys=None):
        logits = self.table[prev_ids]
        return logits, dict(state)


def brute_force_best(table, max_len, length_norm_power=0.0):
    """Enumerate all sequences up to max_len; return best (seq, score)."""
    V = table.shape[1]
    eos = V - 1
    logsm = np.asarray(jax.nn.log_softmax(jnp.asarray(table), -1))
    best = None
    for L in range(0, max_len):
        for seq in itertools.product(range(V - 1), repeat=L):
            prev = eos  # sos
            score = 0.0
            for s in seq:
                score += logsm[prev, s]
                prev = s
            score += logsm[prev, eos]  # terminate
            norm = max(L, 1) ** length_norm_power
            key = score / norm
            if best is None or key > best[0]:
                best = (key, seq, score)
    return best


class TestAttentionBeam:
    def _run(self, table, W, max_steps, **kw):
        dec = ToyDecoder(table)
        encoded = jnp.zeros((1, 3, 2))
        enc_len = jnp.array([3])
        return dec, attention_beam_search(
            dec, {}, encoded, enc_len, beam_width=W, max_steps=max_steps, **kw
        )

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_wide_beam_finds_optimum(self, seed):
        rng = np.random.default_rng(seed)
        V = 4
        table = rng.standard_normal((V, V)).astype(np.float32) * 2
        dec, (seqs, lengths, scores) = self._run(table, W=40, max_steps=4)
        _, ref_seq, ref_score = brute_force_best(table, max_len=4)
        got = tuple(np.asarray(seqs)[0, 0, : int(lengths[0, 0])])
        assert got == ref_seq, (got, ref_seq)
        np.testing.assert_allclose(float(scores[0, 0]), ref_score, rtol=1e-4)

    def test_beam1_equals_greedy(self):
        rng = np.random.default_rng(5)
        V = 5
        table = rng.standard_normal((V, V)).astype(np.float32)
        dec, (seqs, lengths, scores) = self._run(table, W=1, max_steps=6)
        # manual greedy rollout
        logsm = np.asarray(jax.nn.log_softmax(jnp.asarray(table), -1))
        prev, out = V - 1, []
        for _ in range(6):
            nxt = int(np.argmax(logsm[prev]))
            if nxt == V - 1:
                break
            out.append(nxt)
            prev = nxt
        got = list(np.asarray(seqs)[0, 0, : int(lengths[0, 0])])
        assert got == out

    def test_finished_beams_frozen(self):
        """A beam that hits eos keeps its score while others continue."""
        # token 0 then eos is overwhelmingly likely -> everything finishes
        V = 3
        table = np.full((V, V), -10.0, np.float32)
        table[V - 1, 0] = 10.0  # sos -> 0
        table[0, V - 1] = 10.0  # 0 -> eos
        dec, (seqs, lengths, scores) = self._run(table, W=3, max_steps=5)
        assert tuple(np.asarray(seqs)[0, 0, : int(lengths[0, 0])]) == (0,)
        # score ~ 2 * log(almost 1) ~ 0
        assert float(scores[0, 0]) > -0.1

    def test_length_norm_prefers_longer(self):
        """With strong length normalization, longer sequences win rank."""
        rng = np.random.default_rng(9)
        V = 4
        table = rng.standard_normal((V, V)).astype(np.float32)
        dec, (s0, l0, sc0) = self._run(table, W=16, max_steps=4)
        dec, (s1, l1, sc1) = self._run(
            table, W=16, max_steps=4, length_norm_power=1.0
        )
        ref = brute_force_best(table, max_len=4, length_norm_power=1.0)
        got = tuple(np.asarray(s1)[0, 0, : int(l1[0, 0])])
        assert got == ref[1], (got, ref[1])


class TestBeamRecognizers:
    """Recognizer-level smoke tests over a real (untrained) model."""

    def _model(self):
        from nabu_tpu.config import Conf, ConfigFile
        from nabu_tpu.models.model import build_model

        cfg = ConfigFile({
            "model": Conf({"decoders": "att ctc"}, "model"),
            "encoder": Conf(
                {"encoder": "dblstm", "num_layers": "1", "num_units": "8"},
                "encoder",
            ),
            "att": Conf({"decoder": "speller", "num_units": "8"}, "att"),
            "ctc": Conf({"decoder": "linear_ctc"}, "ctc"),
        })
        model = build_model(cfg, input_dim=6, num_labels=4)
        return model, model.init(jax.random.PRNGKey(0))

    def test_attention_beam_recognizer(self):
        from nabu_tpu.config import Conf
        from nabu_tpu.decoding.recognizers import build_recognizer

        model, params = self._model()
        rec = build_recognizer(
            Conf({
                "recognizer": "attention_beam", "head": "att",
                "beam_width": "4", "nbest": "2", "max_steps": "6",
            }),
            model,
        )
        feats = np.random.default_rng(0).standard_normal((2, 12, 6)).astype(
            np.float32
        )
        out = rec(params, feats, np.array([12, 7]))
        assert out.ids.shape == (2, 2, 6)
        assert (out.scores[:, 0] >= out.scores[:, 1] - 1e-5).all()

    def test_ctc_beam_recognizer(self):
        from nabu_tpu.config import Conf
        from nabu_tpu.decoding.recognizers import build_recognizer

        model, params = self._model()
        rec = build_recognizer(
            Conf({
                "recognizer": "ctc_beam", "head": "ctc",
                "beam_width": "4", "nbest": "2",
            }),
            model,
        )
        feats = np.random.default_rng(1).standard_normal((2, 12, 6)).astype(
            np.float32
        )
        out = rec(params, feats, np.array([12, 7]))
        assert out.ids.shape[:2] == (2, 2)
        # all symbols within label alphabet (no blanks inside lengths)
        for b in range(2):
            ids = out.ids[b, 0, : out.lengths[b, 0]]
            assert ((ids >= 0) & (ids < 4)).all()


class TestTransformerDecoderBeam:
    """The transformer decoder rides the same beam machinery as the
    Speller (its KV caches are just more state leaves): wide beam must
    find the enumeration optimum, and the recognizer path must work."""

    def _model(self):
        from nabu_tpu.config import Conf, ConfigFile
        from nabu_tpu.models.model import build_model

        cfg = ConfigFile({
            "encoder": Conf(
                {"encoder": "dblstm", "num_layers": "1", "num_units": "8"},
                "encoder",
            ),
            "decoder": Conf({
                "decoder": "transformer", "num_layers": "1",
                "num_units": "8", "num_heads": "2", "ffn_dim": "16",
            }, "decoder"),
        })
        model = build_model(cfg, input_dim=6, num_labels=3)
        return model, model.init(jax.random.PRNGKey(5))

    def test_wide_beam_finds_enumeration_optimum(self):
        from nabu_tpu.ops.masking import sequence_mask

        model, params = self._model()
        dec = model.decoders["decoder"]
        dparams = params["decoders"]["decoder"]
        rng = np.random.default_rng(7)
        feats = jnp.asarray(rng.standard_normal((1, 8, 6)), jnp.float32)
        flen = jnp.array([8], jnp.int32)
        encoded, enc_len = model.encode(params, feats, flen)
        T = encoded.shape[1]
        mask = sequence_mask(enc_len, T)
        max_steps = 3
        V = dec.output_dim
        eos = dec.eos_id

        def score_seq(seq):
            """sum log p(tokens) + log p(eos | seq) via step()."""
            state = dec.init_state(1, encoded.dtype, enc_frames=T)
            prev = jnp.array([dec.sos_id], jnp.int32)
            total = 0.0
            for tok in list(seq) + [eos]:
                logits, state = dec.step(
                    dparams, prev, state, encoded, mask
                )
                lp = jax.nn.log_softmax(
                    logits.astype(jnp.float32), -1
                )[0, tok]
                total += float(lp)
                prev = jnp.array([tok], jnp.int32)
                if tok == eos:
                    break
            return total

        best_score, best_seq = -np.inf, ()
        for n in range(max_steps + 1):
            for seq in itertools.product(range(dec.num_labels), repeat=n):
                sc = score_seq(seq)
                if sc > best_score:
                    best_score, best_seq = sc, seq

        seqs, lengths, scores = attention_beam_search(
            dec, dparams, encoded, enc_len,
            beam_width=32, max_steps=max_steps,
        )
        got = tuple(
            int(x) for x in np.asarray(seqs[0, 0][: int(lengths[0, 0])])
        )
        assert got == best_seq, (got, best_seq)
        np.testing.assert_allclose(
            float(scores[0, 0]), best_score, rtol=1e-4, atol=1e-4
        )

    def test_recognizer_path(self):
        from nabu_tpu.config import Conf
        from nabu_tpu.decoding.recognizers import build_recognizer

        model, params = self._model()
        rec = build_recognizer(
            Conf({
                "recognizer": "attention_beam", "head": "decoder",
                "beam_width": "4", "nbest": "2", "max_steps": "6",
            }),
            model,
        )
        feats = np.random.default_rng(8).standard_normal(
            (2, 12, 6)
        ).astype(np.float32)
        out = rec(params, feats, np.array([12, 7]))
        assert out.ids.shape == (2, 2, 6)
        assert (out.scores[:, 0] >= out.scores[:, 1] - 1e-5).all()


class TestBf16Decode:
    """Regression: bf16 compute_dtype must not break the autoregressive
    decoders (beam/greedy states mix model-cast and raw params)."""

    def _model(self):
        from nabu_tpu.config import Conf, ConfigFile
        from nabu_tpu.models.model import build_model

        cfg = ConfigFile({
            "model": Conf({"compute_dtype": "bfloat16"}, "model"),
            "encoder": Conf({
                "encoder": "dnn", "num_layers": "1", "num_units": "16",
            }, "encoder"),
            "decoder": Conf({
                "decoder": "speller", "num_layers": "1",
                "num_units": "16", "embed_dim": "8",
            }, "decoder"),
        })
        return build_model(cfg, input_dim=6, num_labels=5)

    @pytest.mark.parametrize("recog", ["attention_beam", "attention_greedy"])
    def test_decodes_finite(self, recog):
        from nabu_tpu.config import Conf
        from nabu_tpu.decoding.recognizers import build_recognizer

        model = self._model()
        params = model.init(jax.random.PRNGKey(0))
        rec = build_recognizer(
            Conf({"recognizer": recog, "beam_width": "3",
                  "max_steps": "7"}, "recognizer"),
            model,
        )
        feats = np.random.default_rng(0).standard_normal(
            (2, 9, 6)
        ).astype(np.float32)
        out = rec(params, feats, np.asarray([9, 5], np.int32))
        assert out.ids.shape[0] == 2
        assert np.isfinite(out.scores).all()


def test_ctc_beam_truncates_at_max_label_len():
    """Regression: when a prefix reaches max_label_len, later extensions
    must not overwrite the stored last token — output is the first
    max_label_len labels of the decoded sequence."""
    import jax.numpy as jnp

    from nabu_tpu.decoding.ctc_beam import ctc_prefix_beam_search

    V, blank = 4, 3  # tokens 0..2 + blank
    # force emission 0, blank, 1, blank, 2 (blanks separate tokens)
    seq = [0, blank, 1, blank, 2]
    logits = np.full((1, len(seq), V), -10.0, np.float32)
    for t, s in enumerate(seq):
        logits[0, t, s] = 0.0
    logprobs = jnp.asarray(logits) - jnp.asarray(
        np.log(np.exp(logits).sum(-1, keepdims=True))
    )
    lengths = jnp.array([len(seq)], jnp.int32)

    full = ctc_prefix_beam_search(logprobs, lengths, 4, blank,
                                  max_label_len=8)
    seqs, lens, scores = full[0], full[1], full[2]
    best = list(np.asarray(seqs)[0, 0, : int(np.asarray(lens)[0, 0])])
    assert best == [0, 1, 2]

    trunc = ctc_prefix_beam_search(logprobs, lengths, 4, blank,
                                   max_label_len=2)
    seqs, lens = trunc[0], trunc[1]
    best = list(np.asarray(seqs)[0, 0, : int(np.asarray(lens)[0, 0])])
    assert best == [0, 1], best  # first two labels, not [0, 2]


def test_ctc_beam_trace_is_constant_free():
    """Regression: the beam-search closure must produce ZERO jaxpr
    constants. Module-level jnp scalars / jnp.array literals become
    closed-over constants that XLA folds differently per input shape;
    jax 0.9's C++ fast-path jit cache then dispatches an executable
    whose kept-argument set belongs to the other shape ("Execution
    supplied 16 buffers but compiled program expected 19") on the
    second call of the second compiled bucket shape — which broke
    `run test` over a 2-bucket loader on CPU and TPU alike."""
    for T in (7, 11):  # two bucket shapes
        jaxpr = jax.make_jaxpr(
            lambda lp, ll: ctc_prefix_beam_search(
                lp, ll, beam_width=3, blank_id=4
            )
        )(jnp.zeros((2, T, 5)), jnp.full((2,), T, jnp.int32))
        assert not jaxpr.consts, (T, jaxpr.consts)

    # and the failing dispatch pattern itself: two shapes, each
    # executed twice through one jitted function
    fn = jax.jit(
        lambda lp, ll: ctc_prefix_beam_search(
            lp, ll, beam_width=3, blank_id=4
        )
    )
    rng = np.random.default_rng(0)
    for T in (7, 7, 11, 11):
        lp = jnp.asarray(
            rng.standard_normal((2, T, 5)).astype(np.float32)
        )
        out = fn(jax.nn.log_softmax(lp, -1),
                 jnp.full((2,), T, jnp.int32))
        jax.block_until_ready(out)
