"""One-pass joint CTC/attention beam search tests: reduction to the
pure attention beam at ctc_weight=0, exactness vs brute-force
enumeration of (1-w)*att + w*ctc_full at wide beam, batched variable
lengths, and the recognizer wiring over a multi-head model."""

from itertools import product

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import nabu_tpu.models  # noqa: F401 (registers)
from nabu_tpu.config import Conf, ConfigFile
from nabu_tpu.decoding.beam import attention_beam_search
from nabu_tpu.decoding.joint import joint_ctc_att_beam_search
from nabu_tpu.ops.ctc import ctc_loss
from nabu_tpu.ops.masking import sequence_mask
from nabu_tpu.registry import DECODERS


def _tiny_speller(num_labels=2, D=6, seed=0):
    dec = DECODERS.build(
        "speller",
        Conf({"decoder": "speller", "num_layers": "1", "num_units": "8",
              "embed_dim": "4"}),
        D, num_labels,
    )
    return dec, dec.init(jax.random.PRNGKey(seed))


def _att_chain_score(dec, params, encoded, enc_len, tokens):
    state = dec.init_state(1)
    state.pop("attn_weights", None)
    mask = sequence_mask(enc_len, encoded.shape[1])
    prev = jnp.asarray([dec.sos_id], jnp.int32)
    total = 0.0
    for tok in list(tokens) + [dec.eos_id]:
        logits, state = dec.step(params, prev, state, encoded, mask)
        state.pop("attn_weights", None)
        total += float(
            jax.nn.log_softmax(logits.astype(jnp.float32), -1)[0, tok]
        )
        prev = jnp.asarray([tok], jnp.int32)
    return total


def _ctc_full_score(ctc_lp, enc_len, tokens):
    tgt = np.zeros((1, max(len(tokens), 1)), np.int32)
    if tokens:
        tgt[0, : len(tokens)] = tokens
    nll = ctc_loss(
        ctc_lp, enc_len, jnp.asarray(tgt),
        jnp.asarray([len(tokens)], np.int32),
    )
    return -float(nll[0])


class TestJointBeam:
    def _setup(self, seed=1, T=4, num_labels=2):
        dec, params = _tiny_speller(num_labels=num_labels)
        rng = np.random.RandomState(seed)
        encoded = jnp.asarray(rng.randn(1, T, 6).astype(np.float32))
        enc_len = jnp.asarray([T], np.int32)
        ctc_lp = jnp.asarray(
            jax.nn.log_softmax(
                jnp.asarray(rng.randn(1, T, num_labels + 1)
                            .astype(np.float32)), -1,
            )
        )
        return dec, params, encoded, enc_len, ctc_lp

    def test_zero_ctc_weight_equals_attention_beam(self):
        dec, params, encoded, enc_len, ctc_lp = self._setup()
        s0 = joint_ctc_att_beam_search(
            dec, params, encoded, enc_len, ctc_lp, beam_width=8,
            max_steps=3, ctc_weight=0.0,
        )
        sa = attention_beam_search(
            dec, params, encoded, enc_len, beam_width=8, max_steps=3
        )
        for i in range(3):
            l0, la = int(s0[1][0, i]), int(sa[1][0, i])
            assert l0 == la
            assert list(np.asarray(s0[0])[0, i, :l0]) == list(
                np.asarray(sa[0])[0, i, :la]
            )
            assert abs(float(s0[2][0, i]) - float(sa[2][0, i])) < 1e-4

    def test_wide_beam_is_exact(self):
        dec, params, encoded, enc_len, ctc_lp = self._setup(seed=2)
        w, max_steps = 0.4, 3
        best, best_seq = -np.inf, None
        for n in range(0, max_steps):
            for seq in product(range(2), repeat=n):
                s = (1 - w) * _att_chain_score(
                    dec, params, encoded, enc_len, seq
                ) + w * _ctc_full_score(ctc_lp, enc_len, list(seq))
                if s > best:
                    best, best_seq = s, list(seq)
        seqs, lens, scores = joint_ctc_att_beam_search(
            dec, params, encoded, enc_len, ctc_lp, beam_width=16,
            max_steps=max_steps, ctc_weight=w,
        )
        got = list(np.asarray(seqs)[0, 0, : int(lens[0, 0])])
        assert got == best_seq, (got, best_seq)
        assert abs(float(scores[0, 0]) - best) < 1e-4

    def test_lm_fusion_is_unscaled(self):
        """With ctc_weight=0 the joint search + LM must equal the
        attention beam + LM exactly — i.e. the LM term is NOT scaled by
        (1 - ctc_weight)."""
        from nabu_tpu.decoding.lm import NgramLM

        dec, params, encoded, enc_len, ctc_lp = self._setup(seed=5)
        rng = np.random.RandomState(6)
        lm = NgramLM.train(
            [list(rng.randint(0, 2, rng.randint(1, 5))) for _ in range(30)],
            vocab=3, order=2,
        ).dense()
        s0 = joint_ctc_att_beam_search(
            dec, params, encoded, enc_len, ctc_lp, beam_width=8,
            max_steps=3, ctc_weight=0.0, lm=lm, lm_weight=0.6,
            pre_beam=2,
        )
        sa = attention_beam_search(
            dec, params, encoded, enc_len, beam_width=8, max_steps=3,
            lm=lm, lm_weight=0.6,
        )
        l0, la = int(s0[1][0, 0]), int(sa[1][0, 0])
        assert l0 == la
        assert list(np.asarray(s0[0])[0, 0, :l0]) == list(
            np.asarray(sa[0])[0, 0, :la]
        )
        assert abs(float(s0[2][0, 0]) - float(sa[2][0, 0])) < 1e-4

    def test_batched_variable_lengths_match_single(self):
        dec, params = _tiny_speller(num_labels=3)
        rng = np.random.RandomState(3)
        B, T = 3, 5
        encoded = jnp.asarray(rng.randn(B, T, 6).astype(np.float32))
        enc_len = jnp.asarray([5, 3, 2], np.int32)
        ctc_lp = jnp.asarray(
            jax.nn.log_softmax(
                jnp.asarray(rng.randn(B, T, 4).astype(np.float32)), -1
            )
        )
        batched = joint_ctc_att_beam_search(
            dec, params, encoded, enc_len, ctc_lp, beam_width=4,
            max_steps=4, ctc_weight=0.5,
        )
        for b in range(B):
            single = joint_ctc_att_beam_search(
                dec, params, encoded[b: b + 1, : int(enc_len[b])],
                enc_len[b: b + 1],
                ctc_lp[b: b + 1, : int(enc_len[b])],
                beam_width=4, max_steps=4, ctc_weight=0.5,
            )
            lb = int(batched[1][b, 0])
            ls = int(single[1][0, 0])
            assert lb == ls, b
            assert list(np.asarray(batched[0])[b, 0, :lb]) == list(
                np.asarray(single[0])[0, 0, :ls]
            ), b
            assert abs(
                float(batched[2][b, 0]) - float(single[2][0, 0])
            ) < 1e-3, b

    def test_recognizer_wiring(self):
        from nabu_tpu.decoding.recognizers import build_recognizer
        from nabu_tpu.models.model import build_model

        cfg = ConfigFile({
            "model": Conf({"decoders": "att ctc"}, "model"),
            "encoder": Conf({
                "encoder": "listener", "num_layers": "1",
                "num_units": "16",
            }, "encoder"),
            "att": Conf({
                "decoder": "speller", "num_units": "16",
                "embed_dim": "8", "loss": "cross_entropy",
            }, "att"),
            "ctc": Conf({"decoder": "linear_ctc", "loss": "ctc"}, "ctc"),
        })
        model = build_model(cfg, input_dim=8, num_labels=4)
        params = model.init(jax.random.PRNGKey(0))
        rec = build_recognizer(
            Conf({"recognizer": "joint_beam", "beam_width": "4",
                  "ctc_weight": "0.3", "nbest": "2"}),
            model,
        )
        assert rec.head == "att" and rec.ctc_head == "ctc"
        rng = np.random.RandomState(4)
        out = rec(
            params,
            rng.randn(2, 12, 8).astype(np.float32),
            np.asarray([12, 8], np.int32),
        )
        assert out.ids.shape[1] == 2  # nbest
        assert np.isfinite(out.scores).all()

    def test_recognizer_requires_both_heads(self):
        from nabu_tpu.decoding.recognizers import build_recognizer
        from nabu_tpu.models.model import build_model

        cfg = ConfigFile({
            "encoder": Conf({"encoder": "dnn", "num_units": "8"},
                            "encoder"),
            "decoder": Conf({"decoder": "linear_ctc"}, "decoder"),
        })
        model = build_model(cfg, input_dim=4, num_labels=3)
        with pytest.raises(ValueError, match="attention head"):
            build_recognizer(Conf({"recognizer": "joint_beam"}), model)


class TestAttentionRescoring:
    def _model(self):
        from nabu_tpu.models.model import build_model

        cfg = ConfigFile({
            "model": Conf({"decoders": "att ctc"}, "model"),
            "encoder": Conf({
                "encoder": "listener", "num_layers": "1",
                "num_units": "16",
            }, "encoder"),
            "att": Conf({
                "decoder": "speller", "num_units": "16",
                "embed_dim": "8", "loss": "cross_entropy",
            }, "att"),
            "ctc": Conf({"decoder": "linear_ctc", "loss": "ctc"}, "ctc"),
        })
        model = build_model(cfg, input_dim=8, num_labels=4)
        return model, model.init(jax.random.PRNGKey(0))

    def test_ctc_weight_one_keeps_ctc_order(self):
        from nabu_tpu.decoding.recognizers import build_recognizer

        model, params = self._model()
        rng = np.random.RandomState(7)
        feats = rng.randn(2, 12, 8).astype(np.float32)
        lens = np.asarray([12, 9], np.int32)
        ctc_only = build_recognizer(
            Conf({"recognizer": "ctc_beam", "head": "ctc",
                  "beam_width": "4", "nbest": "4"}), model,
        )(params, feats, lens)
        resc = build_recognizer(
            Conf({"recognizer": "attention_rescoring", "beam_width": "4",
                  "nbest": "4", "ctc_weight": "1.0"}), model,
        )(params, feats, lens)
        for b in range(2):
            assert resc.best(b) == ctc_only.best(b), b

    def test_att_scores_match_chain(self):
        """The batched teacher-forced rescoring equals per-hypothesis
        chain scoring with the speller step API."""
        from nabu_tpu.decoding.recognizers import build_recognizer

        model, params = self._model()
        rng = np.random.RandomState(8)
        feats = rng.randn(1, 10, 8).astype(np.float32)
        lens = np.asarray([10], np.int32)
        rec = build_recognizer(
            Conf({"recognizer": "attention_rescoring", "beam_width": "3",
                  "nbest": "3", "ctc_weight": "0.0"}), model,
        )
        out = rec(params, feats, lens)

        encoded, enc_len = model.encode(
            params, jnp.asarray(feats), jnp.asarray(lens)
        )
        dec = model.decoders["att"]
        dparams = model._cast_in(params["decoders"]["att"])
        for n in range(3):
            hyp = list(out.ids[0, n, : out.lengths[0, n]])
            ref = _att_chain_score(dec, dparams, encoded, enc_len, hyp)
            assert abs(float(out.scores[0, n]) - ref) < 1e-3, (n, hyp)

