"""Tests for core model components: masked LSTM scan vs numpy oracle,
BLSTM padding correctness, pyramid stack, encoders, speller consistency
(SURVEY.md §4: LSTM scan vs flax-free numpy cell)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nabu_tpu.config import Conf
from nabu_tpu.models import core
from nabu_tpu.models.decoders import build_decoder
from nabu_tpu.models.encoders import build_encoder


def np_lstm(x, wx, wh, b, forget_bias=1.0):
    """Per-sequence numpy LSTM oracle, x [T, D]."""
    H = wh.shape[0]
    h = np.zeros(H)
    c = np.zeros(H)
    out = []
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    for t in range(x.shape[0]):
        gates = x[t] @ wx + h @ wh + b
        i, f, g, o = np.split(gates, 4)
        c = sig(f + forget_bias) * c + sig(i) * np.tanh(g)
        h = sig(o) * np.tanh(c)
        out.append(h.copy())
    return np.stack(out) if out else np.zeros((0, H))


class TestLSTM:
    def setup_method(self, method):
        key = jax.random.PRNGKey(0)
        self.p = core.lstm_init(key, 5, 7)
        rng = np.random.default_rng(0)
        self.x = rng.standard_normal((3, 10, 5)).astype(np.float32)
        self.lengths = np.array([10, 6, 1], dtype=np.int32)

    def test_forward_matches_numpy(self):
        ys = core.lstm_scan(self.p, jnp.asarray(self.x), jnp.asarray(self.lengths))
        wx, wh, b = map(np.asarray, (self.p["wx"], self.p["wh"], self.p["b"]))
        for bidx in range(3):
            L = self.lengths[bidx]
            ref = np_lstm(self.x[bidx, :L], wx, wh, b)
            np.testing.assert_allclose(
                np.asarray(ys[bidx, :L]), ref, rtol=1e-4, atol=1e-5
            )
            # padding outputs are exactly zero
            np.testing.assert_array_equal(np.asarray(ys[bidx, L:]), 0.0)

    def test_backward_matches_numpy_on_reversed(self):
        ys = core.lstm_scan(
            self.p, jnp.asarray(self.x), jnp.asarray(self.lengths), reverse=True
        )
        wx, wh, b = map(np.asarray, (self.p["wx"], self.p["wh"], self.p["b"]))
        for bidx in range(3):
            L = self.lengths[bidx]
            ref = np_lstm(self.x[bidx, :L][::-1], wx, wh, b)[::-1]
            np.testing.assert_allclose(
                np.asarray(ys[bidx, :L]), ref, rtol=1e-4, atol=1e-5
            )
            np.testing.assert_array_equal(np.asarray(ys[bidx, L:]), 0.0)

    def test_padding_invariance(self):
        """Extra padding frames must not change valid outputs."""
        ys1 = core.lstm_scan(self.p, jnp.asarray(self.x), jnp.asarray(self.lengths))
        x_pad = np.concatenate(
            [self.x, np.full((3, 4, 5), 9.9, np.float32)], axis=1
        )
        ys2 = core.lstm_scan(self.p, jnp.asarray(x_pad), jnp.asarray(self.lengths))
        np.testing.assert_allclose(
            np.asarray(ys1), np.asarray(ys2[:, :10]), rtol=1e-5, atol=1e-6
        )


class TestPyramid:
    def test_even(self):
        x = jnp.arange(24, dtype=jnp.float32).reshape(1, 4, 6)
        y, l = core.pyramid_stack(x, jnp.array([4]))
        assert y.shape == (1, 2, 12)
        assert int(l[0]) == 2
        np.testing.assert_array_equal(
            np.asarray(y[0, 0]), np.arange(12, dtype=np.float32)
        )

    def test_odd(self):
        x = jnp.ones((2, 5, 3))
        y, l = core.pyramid_stack(x, jnp.array([5, 3]))
        assert y.shape == (2, 3, 6)
        np.testing.assert_array_equal(np.asarray(l), [3, 2])


class TestEncoders:
    @pytest.mark.parametrize("name,out_dim_mult,subsample", [
        ("dblstm", 2, 1), ("listener", 2, 8), ("dnn", 1, 1),
    ])
    def test_shapes(self, name, out_dim_mult, subsample):
        conf = Conf({"encoder": name, "num_layers": "3", "num_units": "16"})
        enc = build_encoder(conf, input_dim=8)
        params = enc.init(jax.random.PRNGKey(0))
        x = jnp.ones((2, 24, 8))
        lengths = jnp.array([24, 17])
        y, ly = jax.jit(enc.apply)(params, x, lengths)
        assert y.shape[0] == 2
        assert y.shape[1] == 24 // subsample
        assert y.shape[2] == enc.output_dim == 16 * out_dim_mult
        expected = np.array([24, 17])
        for _ in range(3 if name == "listener" else 0):
            expected = (expected + 1) // 2
        np.testing.assert_array_equal(np.asarray(ly), expected)


class TestSpeller:
    def setup_method(self, method):
        conf = Conf({
            "decoder": "speller", "num_layers": "2", "num_units": "12",
            "embed_dim": "6", "attention_units": "10",
        })
        self.dec = build_decoder(conf, encoder_dim=14, num_labels=5)
        self.params = self.dec.init(jax.random.PRNGKey(1))
        rng = np.random.default_rng(1)
        self.encoded = jnp.asarray(
            rng.standard_normal((2, 7, 14)).astype(np.float32)
        )
        self.enc_len = jnp.array([7, 4])
        self.targets = jnp.array([[1, 2, 3, 0], [4, 0, 0, 0]], jnp.int32)
        self.tgt_len = jnp.array([4, 1])

    def test_apply_shapes(self):
        logits, ll = self.dec.apply(
            self.params, self.encoded, self.enc_len,
            self.targets, self.tgt_len,
        )
        assert logits.shape == (2, 5, 6)  # [B, L+1, V+1]
        np.testing.assert_array_equal(np.asarray(ll), [5, 2])

    def test_apply_matches_step_loop(self):
        """Teacher-forced scan must equal a manual step loop."""
        from nabu_tpu.ops.masking import sequence_mask

        logits, _ = self.dec.apply(
            self.params, self.encoded, self.enc_len,
            self.targets, self.tgt_len,
        )
        enc_mask = sequence_mask(self.enc_len, 7)
        state = self.dec.init_state(2)
        prev = jnp.full((2,), self.dec.sos_id, jnp.int32)
        outs = []
        for t in range(5):
            step_logits, state = self.dec.step(
                self.params, prev, state, self.encoded, enc_mask
            )
            state.pop("attn_weights", None)
            outs.append(step_logits)
            prev = self.targets[:, t] if t < 4 else prev
        ref = jnp.stack(outs, axis=1)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

    def test_scheduled_sampling_changes_outputs(self):
        self.dec.sample_prob = 1.0
        logits_sampled, _ = self.dec.apply(
            self.params, self.encoded, self.enc_len,
            self.targets, self.tgt_len, train=True,
            rng=jax.random.PRNGKey(3),
        )
        self.dec.sample_prob = 0.0
        logits_tf, _ = self.dec.apply(
            self.params, self.encoded, self.enc_len,
            self.targets, self.tgt_len, train=True,
            rng=jax.random.PRNGKey(3),
        )
        # step 0 identical (both feed sos), later steps differ
        np.testing.assert_allclose(
            np.asarray(logits_sampled[:, 0]), np.asarray(logits_tf[:, 0]),
            rtol=1e-5, atol=1e-5,
        )
        assert not np.allclose(
            np.asarray(logits_sampled[:, 1:]), np.asarray(logits_tf[:, 1:])
        )

    def test_attention_masked(self):
        """Attention must ignore encoder frames beyond enc_len."""
        enc2 = self.encoded.at[1, 4:].set(99.0)
        l1, _ = self.dec.apply(
            self.params, self.encoded, self.enc_len,
            self.targets, self.tgt_len,
        )
        l2, _ = self.dec.apply(
            self.params, enc2, self.enc_len, self.targets, self.tgt_len
        )
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5
        )


class TestLocationAttention:
    """Location-aware (Chorowski) attention: the additive score also
    sees the previous step's attention weights through a 1-D conv."""

    def _speller(self):
        conf = Conf({
            "decoder": "speller", "num_layers": "1", "num_units": "12",
            "embed_dim": "6", "attention_units": "10",
            "attention": "location", "location_filters": "4",
            "location_width": "3",
        })
        dec = build_decoder(conf, encoder_dim=14, num_labels=5)
        return dec, dec.init(jax.random.PRNGKey(2))

    def test_apply_matches_step_loop(self):
        from nabu_tpu.ops.masking import sequence_mask

        dec, params = self._speller()
        rng = np.random.default_rng(3)
        encoded = jnp.asarray(
            rng.standard_normal((2, 7, 14)).astype(np.float32)
        )
        enc_len = jnp.array([7, 4])
        targets = jnp.array([[1, 2, 3, 0], [4, 0, 0, 0]], jnp.int32)
        logits, _ = dec.apply(
            params, encoded, enc_len, targets, jnp.array([4, 1])
        )
        enc_mask = sequence_mask(enc_len, 7)
        state = dec.init_state(2, enc_frames=7)
        prev = jnp.full((2,), dec.sos_id, jnp.int32)
        outs = []
        for t in range(5):
            step_logits, state = dec.step(
                params, prev, state, encoded, enc_mask
            )
            state.pop("attn_weights", None)
            outs.append(step_logits)
            prev = targets[:, t] if t < 4 else prev
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(jnp.stack(outs, axis=1)),
            rtol=1e-5, atol=1e-5,
        )

    def test_prev_weights_change_scores(self):
        """The location term must actually condition on the previous
        attention distribution (bahdanau would be invariant)."""
        from nabu_tpu.ops.masking import sequence_mask

        dec, params = self._speller()
        rng = np.random.default_rng(4)
        encoded = jnp.asarray(
            rng.standard_normal((1, 6, 14)).astype(np.float32)
        )
        enc_mask = sequence_mask(jnp.array([6]), 6)
        state = dec.init_state(1, enc_frames=6)
        prev = jnp.full((1,), dec.sos_id, jnp.int32)
        l1, _ = dec.step(params, prev, state, encoded, enc_mask)
        state2 = dict(state)
        state2["attn_prev"] = jnp.asarray([[0.0, 0.0, 1.0, 0.0, 0.0, 0.0]])
        l2, _ = dec.step(params, prev, state2, encoded, enc_mask)
        assert not np.allclose(np.asarray(l1), np.asarray(l2))

    def test_attention_masked(self):
        dec, params = self._speller()
        rng = np.random.default_rng(5)
        encoded = jnp.asarray(
            rng.standard_normal((2, 7, 14)).astype(np.float32)
        )
        enc_len = jnp.array([7, 4])
        targets = jnp.array([[1, 2], [3, 4]], jnp.int32)
        tgt_len = jnp.array([2, 2])
        l1, _ = dec.apply(
            params, encoded, enc_len, targets, tgt_len
        )
        l2, _ = dec.apply(
            params, encoded.at[1, 4:].set(99.0), enc_len, targets, tgt_len
        )
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5
        )

    def test_beam_search_is_exact(self):
        """Wide beam over a location-attention speller == brute-force
        enumeration (the attn_prev state must ride the beam correctly
        through gather/reshape)."""
        from itertools import product

        from nabu_tpu.decoding.beam import attention_beam_search
        from nabu_tpu.ops.masking import sequence_mask

        conf = Conf({
            "decoder": "speller", "num_layers": "1", "num_units": "8",
            "embed_dim": "4", "attention": "location",
            "location_filters": "3", "location_width": "3",
        })
        dec = build_decoder(conf, encoder_dim=6, num_labels=2)
        params = dec.init(jax.random.PRNGKey(7))
        rng = np.random.default_rng(8)
        encoded = jnp.asarray(
            rng.standard_normal((1, 4, 6)).astype(np.float32)
        )
        enc_len = jnp.asarray([4], np.int32)
        max_steps = 3

        def am_score(tokens):
            enc_mask = sequence_mask(enc_len, 4)
            state = dec.init_state(1, enc_frames=4)
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

        best_score, best_seq = -np.inf, None
        for n in range(0, max_steps):
            for seq in product([0, 1], repeat=n):
                s = am_score(seq)  # raw: length_norm_power defaults 0
                if s > best_score:
                    best_score, best_seq = s, list(seq)

        seqs, lengths, scores = attention_beam_search(
            dec, params, encoded, enc_len, beam_width=16,
            max_steps=max_steps,
        )
        got = list(np.asarray(seqs)[0, 0, : int(lengths[0, 0])])
        assert got == best_seq, (got, best_seq)


class TestModelContainer:
    def test_joint_model(self):
        from nabu_tpu.config import Conf, ConfigFile
        from nabu_tpu.models.model import build_model

        cfg = ConfigFile({
            "model": Conf({"decoders": "att ctc"}, "model"),
            "encoder": Conf({
                "encoder": "listener", "num_layers": "1", "num_units": "8",
            }, "encoder"),
            "att": Conf({
                "decoder": "speller", "num_units": "8", "loss_weight": "0.7",
            }, "att"),
            "ctc": Conf({
                "decoder": "linear_ctc", "loss_weight": "0.3",
            }, "ctc"),
        })
        model = build_model(cfg, input_dim=6, num_labels=4)
        params = model.init(jax.random.PRNGKey(0))
        out = model.apply(
            params,
            jnp.ones((2, 12, 6)),
            jnp.array([12, 8]),
            targets=jnp.array([[1, 2], [3, 0]], jnp.int32),
            target_lengths=jnp.array([2, 1]),
        )
        att_logits, att_len = out["att"]
        ctc_logits, ctc_len = out["ctc"]
        assert att_logits.shape == (2, 3, 5)
        assert ctc_logits.shape == (2, 6, 5)  # one pyramid layer: T/2
        np.testing.assert_array_equal(np.asarray(ctc_len), [6, 4])
        assert model.head_loss("att") == ("cross_entropy", 0.7)
        assert model.head_loss("ctc") == ("ctc", 0.3)


class TestComputeOptions:
    def _cfg(self, extra_model=None, extra_enc=None):
        from nabu_tpu.config import Conf, ConfigFile

        enc = {"encoder": "dblstm", "num_layers": "2", "num_units": "16"}
        enc.update(extra_enc or {})
        sections = {
            "encoder": Conf(enc, "encoder"),
            "decoder": Conf({"decoder": "linear_ctc", "loss": "ctc"},
                            "decoder"),
        }
        if extra_model:
            sections["model"] = Conf(extra_model, "model")
        return ConfigFile(sections)

    def _batch(self):
        rng = np.random.default_rng(0)
        return (
            jnp.asarray(rng.standard_normal((2, 20, 8)).astype(np.float32)),
            jnp.array([20, 14]),
            jnp.asarray(rng.integers(0, 4, (2, 4)).astype(np.int32)),
            jnp.array([4, 2]),
        )

    def test_bfloat16_compute(self):
        from nabu_tpu.models.model import build_model

        feats, flen, tgts, tlen = self._batch()
        m32 = build_model(self._cfg(), 8, 4)
        mbf = build_model(
            self._cfg(extra_model={"compute_dtype": "bfloat16"}), 8, 4
        )
        params = m32.init(jax.random.PRNGKey(0))
        (l32, _), = [m32.apply(params, feats, flen, tgts, tlen)["decoder"]]
        (lbf, _), = [mbf.apply(params, feats, flen, tgts, tlen)["decoder"]]
        assert lbf.dtype == jnp.float32  # logits cast back for losses
        # bf16 forward approximates f32 within bf16 tolerance
        np.testing.assert_allclose(
            np.asarray(lbf), np.asarray(l32), rtol=0.1, atol=0.1
        )

    def test_remat_matches(self):
        from nabu_tpu.models.model import build_model
        from nabu_tpu.ops.losses import make_loss_computer

        feats, flen, tgts, tlen = self._batch()
        batch = {
            "features": feats, "feature_lengths": flen,
            "targets": tgts, "target_lengths": tlen,
            "example_mask": jnp.ones((2,)),
        }
        m = build_model(self._cfg(), 8, 4)
        mr = build_model(self._cfg(extra_enc={"remat": "true"}), 8, 4)
        params = m.init(jax.random.PRNGKey(0))
        rng = jax.random.PRNGKey(1)
        l1, g1 = jax.value_and_grad(
            lambda p: make_loss_computer(m)(p, batch, rng, True)[0]
        )(params)
        l2, g2 = jax.value_and_grad(
            lambda p: make_loss_computer(mr)(p, batch, rng, True)[0]
        )(params)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )


class TestLayerNormLSTM:
    """Layer-norm LSTM cell variant (reference: rnn_cell.py layer-norm
    wrappers)."""

    def test_matches_manual_cell(self):
        import jax

        key = jax.random.PRNGKey(0)
        p = core.lstm_init(key, 6, 5, layer_norm=True)
        # non-trivial gains so LN params matter
        p["ln_h_g"] = p["ln_h_g"] * 1.3
        p["ln_c_b"] = p["ln_c_b"] + 0.1
        x = np.asarray(
            jax.random.normal(jax.random.PRNGKey(1), (3, 4, 6))
        )
        lengths = jnp.asarray([4, 4, 4])
        got = np.asarray(core.lstm_scan(p, jnp.asarray(x), lengths))

        def ln(v, g, b=0.0):
            mu = v.mean(-1, keepdims=True)
            var = ((v - mu) ** 2).mean(-1, keepdims=True)
            return (v - mu) / np.sqrt(var + 1e-5) * np.asarray(g) + b

        wx, wh, b = map(np.asarray, (p["wx"], p["wh"], p["b"]))
        h = np.zeros((3, 5)); c = np.zeros((3, 5))
        for t in range(4):
            gates = ln(x[:, t] @ wx, p["ln_x_g"]) + b + ln(
                h @ wh, p["ln_h_g"]
            )
            i, f, g, o = np.split(gates, 4, axis=-1)
            sig = lambda v: 1.0 / (1.0 + np.exp(-v))
            c = sig(f + 1.0) * c + sig(i) * np.tanh(g)
            c_out = ln(c, p["ln_c_g"], np.asarray(p["ln_c_b"]))
            h = sig(o) * np.tanh(c_out)
            np.testing.assert_allclose(got[:, t], h, rtol=2e-4, atol=2e-4)

    def test_encoder_layer_norm_config(self):
        import jax

        from nabu_tpu.config import Conf
        from nabu_tpu.models.encoders import build_encoder

        enc = build_encoder(
            Conf({"encoder": "dblstm", "num_layers": "2",
                  "num_units": "8", "layer_norm": "true"}), 6
        )
        params = enc.init(jax.random.PRNGKey(0))
        assert "ln_x_g" in params["layer_0"]["fw"]
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 5, 6)),
            jnp.float32,
        )
        out, lens = enc.apply(params, x, jnp.asarray([5, 3]))
        assert out.shape == (2, 5, 16)
        assert np.isfinite(np.asarray(out)).all()
        # padding invariance still holds with LN
        x2 = x.at[1, 3:].set(99.0)
        out2, _ = enc.apply(params, x2, jnp.asarray([5, 3]))
        np.testing.assert_allclose(
            np.asarray(out[1, :3]), np.asarray(out2[1, :3]),
            rtol=1e-5, atol=1e-5,
        )


class TestTransformerEncoder:
    """Beyond-parity transformer encoder: shapes, masking, subsample,
    grads, and end-to-end learnability with a CTC head."""

    def _build(self, **over):
        from nabu_tpu.config import Conf
        from nabu_tpu.models.encoders import build_encoder

        conf = {"encoder": "transformer", "num_layers": "2",
                "num_units": "16", "num_heads": "2", "ffn_dim": "32"}
        conf.update({k: str(v) for k, v in over.items()})
        return build_encoder(Conf(conf, "encoder"), input_dim=6)

    def test_shapes_and_subsample(self):
        enc = self._build(subsample=4)
        params = enc.init(jax.random.PRNGKey(0))
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((3, 21, 6)),
            jnp.float32,
        )
        lengths = jnp.array([21, 10, 3], jnp.int32)
        out, out_len = enc.apply(params, x, lengths)
        assert out.shape == (3, 6, 16)  # ceil(ceil(21/2)/2) = 6
        np.testing.assert_array_equal(
            np.asarray(out_len), [6, 3, 1]
        )

    def test_padding_invariance(self):
        """Extra padding frames must not change valid outputs (masked
        attention + masked output contract)."""
        enc = self._build()
        params = enc.init(jax.random.PRNGKey(1))
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 12, 6)), jnp.float32)
        lengths = jnp.array([12, 7], jnp.int32)
        out1, _ = enc.apply(params, x, lengths)
        x_pad = jnp.pad(x, ((0, 0), (0, 9), (0, 0)))
        out2, _ = enc.apply(params, x_pad, lengths)
        np.testing.assert_allclose(
            np.asarray(out2[:, :12]), np.asarray(out1),
            rtol=2e-5, atol=2e-6,
        )
        # padded positions are zeroed
        assert float(jnp.abs(out2[0, 12:]).max()) == 0.0
        assert float(jnp.abs(out2[1, 7:]).max()) == 0.0

    def test_grads_finite_with_remat_and_dropout(self):
        enc = self._build(remat=True, dropout=0.1)
        params = enc.init(jax.random.PRNGKey(2))
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((2, 10, 6)),
            jnp.float32,
        )
        lengths = jnp.array([10, 6], jnp.int32)

        @jax.jit
        def loss(p, key):
            out, _ = enc.apply(p, x, lengths, train=True, rng=key)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(params, jax.random.PRNGKey(3))
        for leaf in jax.tree.leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()

    def test_learns_with_ctc_head(self):
        """Tiny transformer-CTC learns a deterministic mapping."""
        import optax

        from nabu_tpu.config import Conf, ConfigFile
        from nabu_tpu.models.model import build_model
        from nabu_tpu.ops.losses import make_loss_computer

        cfg = ConfigFile({
            "encoder": Conf({
                "encoder": "transformer", "num_layers": "2",
                "num_units": "32", "num_heads": "4", "ffn_dim": "64",
            }, "encoder"),
            "decoder": Conf({"decoder": "linear_ctc", "loss": "ctc"},
                            "decoder"),
        })
        model = build_model(cfg, 8, 3)
        loss_fn = make_loss_computer(model)
        params = model.init(jax.random.PRNGKey(0))
        tx = optax.adam(3e-3)
        opt = tx.init(params)

        # features: one-hot bursts encoding the target symbols
        rng = np.random.default_rng(0)
        B, T, L = 8, 24, 3
        tgts = rng.integers(0, 3, (B, L)).astype(np.int32)
        feats = np.zeros((B, T, 8), np.float32)
        for b in range(B):
            for i, s in enumerate(tgts[b]):
                feats[b, 8 * i : 8 * i + 8, s] = 1.0
        batch = {
            "features": jnp.asarray(feats),
            "feature_lengths": jnp.full((B,), T, jnp.int32),
            "targets": jnp.asarray(tgts),
            "target_lengths": jnp.full((B,), L, jnp.int32),
            "example_mask": jnp.ones((B,), jnp.float32),
        }

        @jax.jit
        def step(params, opt, key):
            (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, key, True
            )
            up, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, up), opt, l

        first = None
        for i in range(150):
            params, opt, l = step(params, opt, jax.random.PRNGKey(i))
            if first is None:
                first = float(l)
        assert float(l) < 0.3 * first, (first, float(l))


class TestConformerEncoder:
    """Conformer (conv-augmented transformer) beyond-parity encoder."""

    def _build(self, **over):
        from nabu_tpu.config import Conf
        from nabu_tpu.models.encoders import build_encoder

        conf = {"encoder": "conformer", "num_layers": "2",
                "num_units": "16", "num_heads": "2", "ffn_dim": "32",
                "kernel_size": "5"}
        conf.update({k: str(v) for k, v in over.items()})
        return build_encoder(Conf(conf, "encoder"), input_dim=6)

    def test_shapes(self):
        enc = self._build(subsample=2)
        params = enc.init(jax.random.PRNGKey(0))
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 15, 6)),
            jnp.float32,
        )
        lengths = jnp.array([15, 8], jnp.int32)
        out, out_len = enc.apply(params, x, lengths)
        assert out.shape == (2, 8, 16)
        np.testing.assert_array_equal(np.asarray(out_len), [8, 4])

    def test_padding_invariance(self):
        """Valid outputs unchanged under extra padding: masked
        attention + zeroed conv inputs keep padding out of reach."""
        enc = self._build()
        params = enc.init(jax.random.PRNGKey(1))
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 12, 6)), jnp.float32)
        lengths = jnp.array([12, 7], jnp.int32)
        out1, _ = enc.apply(params, x, lengths)
        x_pad = jnp.pad(x, ((0, 0), (0, 9), (0, 0)))
        out2, _ = enc.apply(params, x_pad, lengths)
        np.testing.assert_allclose(
            np.asarray(out2[:, :12]), np.asarray(out1),
            rtol=2e-5, atol=2e-6,
        )
        assert float(jnp.abs(out2[1, 7:]).max()) == 0.0

    def test_grads_finite_with_remat_and_dropout(self):
        enc = self._build(remat=True, dropout=0.1)
        params = enc.init(jax.random.PRNGKey(2))
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((2, 10, 6)),
            jnp.float32,
        )
        lengths = jnp.array([10, 6], jnp.int32)

        @jax.jit
        def loss(p, key):
            out, _ = enc.apply(p, x, lengths, train=True, rng=key)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(params, jax.random.PRNGKey(3))
        for leaf in jax.tree.leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()


class TestTransformerDecoder:
    """Beyond-parity transformer attention decoder: the parallel
    teacher-forced pass must equal the KV-cached autoregressive step
    loop exactly; encoder padding must not leak; it must compose in
    the model container (CE loss, grads)."""

    def _dec(self, **over):
        from nabu_tpu.config import Conf
        from nabu_tpu.models.decoders import build_decoder

        conf = {"decoder": "transformer", "num_layers": "2",
                "num_units": "16", "num_heads": "2", "ffn_dim": "32"}
        conf.update({k: str(v) for k, v in over.items()})
        return build_decoder(Conf(conf, "d"), encoder_dim=12,
                             num_labels=5)

    def _data(self, B=3, T=9, D=12, L=4, seed=0):
        rng = np.random.default_rng(seed)
        enc = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
        enc_len = jnp.array([9, 6, 4], jnp.int32)[:B]
        tgt = jnp.asarray(rng.integers(0, 5, (B, L)), jnp.int32)
        tgt_len = jnp.array([4, 3, 2], jnp.int32)[:B]
        return enc, enc_len, tgt, tgt_len

    def test_parallel_equals_step_loop(self):
        from nabu_tpu.ops.masking import sequence_mask

        dec = self._dec()
        params = dec.init(jax.random.PRNGKey(0))
        enc, enc_len, tgt, tgt_len = self._data()
        B, T = enc.shape[:2]
        L = tgt.shape[1]
        logits_par, ll = dec.apply(params, enc, enc_len, tgt, tgt_len)
        assert logits_par.shape == (B, L + 1, 6)
        np.testing.assert_array_equal(np.asarray(ll), np.asarray(tgt_len) + 1)

        mask = sequence_mask(enc_len, T)
        keys = dec.precompute(params, enc)
        state = dec.init_state(B, enc.dtype, enc_frames=T)
        inputs = jnp.concatenate(
            [jnp.full((B, 1), dec.sos_id, jnp.int32), tgt], 1
        )
        outs = []
        for t in range(L + 1):
            lg, state = dec.step(
                params, inputs[:, t], state, enc, mask, keys=keys
            )
            outs.append(lg)
        np.testing.assert_allclose(
            np.asarray(logits_par), np.asarray(jnp.stack(outs, 1)),
            rtol=1e-5, atol=2e-6,
        )

    def test_encoder_padding_cannot_leak(self):
        dec = self._dec()
        params = dec.init(jax.random.PRNGKey(1))
        enc, enc_len, tgt, tgt_len = self._data(seed=1)
        l1, _ = dec.apply(params, enc, enc_len, tgt, tgt_len)
        enc2 = np.asarray(enc).copy()
        enc2[1, 6:] = 50.0  # beyond enc_len[1]=6
        enc2[2, 4:] = -50.0
        l2, _ = dec.apply(params, jnp.asarray(enc2), enc_len, tgt, tgt_len)
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-6
        )

    def test_composes_in_container_with_joint_ctc(self):
        from nabu_tpu.config import Conf, ConfigFile
        from nabu_tpu.models.model import build_model
        from nabu_tpu.ops.losses import make_loss_computer

        cfg = ConfigFile({
            "model": Conf({"decoders": "att ctc"}, "model"),
            "encoder": Conf({
                "encoder": "transformer", "num_layers": "2",
                "num_units": "16", "num_heads": "2", "ffn_dim": "32",
            }, "encoder"),
            "att": Conf({
                "decoder": "transformer", "num_layers": "2",
                "num_units": "16", "num_heads": "2", "ffn_dim": "32",
                "loss": "cross_entropy", "label_smoothing": "0.1",
                "loss_weight": "0.7", "dropout": "0.1",
            }, "att"),
            "ctc": Conf({
                "decoder": "linear_ctc", "loss": "ctc",
                "loss_weight": "0.3",
            }, "ctc"),
        })
        model = build_model(cfg, input_dim=6, num_labels=5)
        loss_fn = make_loss_computer(model)
        params = model.init(jax.random.PRNGKey(2))
        rng = np.random.default_rng(2)
        batch = {
            "features": jnp.asarray(
                rng.standard_normal((2, 12, 6)), jnp.float32
            ),
            "feature_lengths": jnp.array([12, 8], jnp.int32),
            "targets": jnp.asarray(rng.integers(0, 5, (2, 4)), jnp.int32),
            "target_lengths": jnp.array([4, 2], jnp.int32),
            "example_mask": jnp.ones((2,), jnp.float32),
        }
        (loss, _), grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch, jax.random.PRNGKey(3), True),
            has_aux=True,
        )(params)
        assert np.isfinite(float(loss))
        for leaf in jax.tree.leaves(grads):
            assert np.isfinite(np.asarray(leaf)).all()


class TestMoE:
    """Expert-choice mixture-of-experts FFN (moe_experts > 0): exact
    reduction to the dense FFN at E=1/full capacity, brute-force
    routing reference, padding invariance, and conformer composition."""

    def _build(self, encoder="transformer", **over):
        from nabu_tpu.config import Conf
        from nabu_tpu.models.encoders import build_encoder

        conf = {"encoder": encoder, "num_layers": "2",
                "num_units": "16", "num_heads": "2", "ffn_dim": "32"}
        if encoder == "conformer":
            conf["kernel_size"] = "5"
        conf.update({k: str(v) for k, v in over.items()})
        return build_encoder(Conf(conf, "encoder"), input_dim=6)

    def test_single_expert_full_capacity_equals_dense(self):
        """E=1 with capacity >= tokens is exactly the dense FFN (the
        one-expert softmax gate is exactly 1, every token is routed)."""
        import copy

        moe = self._build(moe_experts=1, moe_capacity=1.0)
        dense = self._build()
        p_moe = moe.init(jax.random.PRNGKey(0))
        p_dense = copy.deepcopy(p_moe)
        for i in range(2):
            blk = p_dense[f"block_{i}"]
            for name in ("wg", "we1", "be1", "we2", "be2"):
                blk.pop(name)
            src = p_moe[f"block_{i}"]
            blk["ffn1"] = {"w": src["we1"][0], "b": src["be1"][0]}
            blk["ffn2"] = {"w": src["we2"][0], "b": src["be2"][0]}
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 9, 6)), jnp.float32)
        lengths = jnp.array([9, 5], jnp.int32)
        out_moe, _ = moe.apply(p_moe, x, lengths)
        out_dense, _ = dense.apply(p_dense, x, lengths)
        np.testing.assert_allclose(
            np.asarray(out_moe), np.asarray(out_dense),
            rtol=1e-5, atol=1e-6,
        )

    def test_matches_bruteforce_reference(self):
        """_moe_ffn == per-expert python loop (same top-C selection,
        gating, and scatter-add combine)."""
        enc = self._build(moe_experts=4, moe_capacity=1.5)
        params = enc.init(jax.random.PRNGKey(1))
        p = params["block_0"]
        rng = np.random.default_rng(1)
        B, T, d = 2, 7, 16
        y = jnp.asarray(rng.standard_normal((B, T, d)), jnp.float32)
        valid = jnp.asarray(
            np.arange(T)[None, :] < np.array([[7], [4]])
        )
        got = np.asarray(enc._moe_ffn(p, y, valid))

        S, E = B * T, 4
        C = min(S, -(-int(1.5 * S) // E))
        yt = np.asarray(y).reshape(S, d)
        scores = np.asarray(
            jax.nn.softmax(jnp.asarray(yt) @ p["wg"], axis=-1)
        ).copy()
        scores[~np.asarray(valid).reshape(S)] = 0.0
        want = np.zeros((S, d), np.float32)
        for e in range(E):
            order = np.argsort(-scores[:, e], kind="stable")[:C]
            for i in order:
                h = np.asarray(
                    jax.nn.gelu(yt[i] @ p["we1"][e] + p["be1"][e])
                )
                want[i] += scores[i, e] * np.asarray(
                    h @ p["we2"][e] + p["be2"][e]
                )
        np.testing.assert_allclose(
            got.reshape(S, d), want, rtol=2e-4, atol=2e-5
        )

    def test_padded_values_cannot_leak(self):
        """Padded frames carry zero router weight, so their VALUES
        cannot reach valid outputs. (Unlike the dense encoders, adding
        MORE padding is not invariant: expert-choice capacity is
        computed from the padded token count, so routing — like batch
        norm — legitimately depends on batch composition.)"""
        enc = self._build(moe_experts=4, moe_capacity=2.0)
        params = enc.init(jax.random.PRNGKey(2))
        rng = np.random.default_rng(2)
        x = np.asarray(rng.standard_normal((2, 12, 6)), np.float32)
        lengths = jnp.array([12, 7], jnp.int32)
        out1, _ = enc.apply(params, jnp.asarray(x), lengths)
        x2 = x.copy()
        x2[1, 7:] = 100.0 * rng.standard_normal((5, 6))
        out2, _ = enc.apply(params, jnp.asarray(x2), lengths)
        np.testing.assert_allclose(
            np.asarray(out2[:, :7]), np.asarray(out1[:, :7]),
            rtol=2e-5, atol=2e-6,
        )
        np.testing.assert_allclose(
            np.asarray(out2[0]), np.asarray(out1[0]),
            rtol=2e-5, atol=2e-6,
        )

    def test_conformer_moe_grads_finite(self):
        """Conformer with the second macaron FFN as MoE: trains."""
        enc = self._build(
            encoder="conformer", moe_experts=2, dropout=0.1
        )
        params = enc.init(jax.random.PRNGKey(3))
        x = jnp.asarray(
            np.random.default_rng(3).standard_normal((2, 10, 6)),
            jnp.float32,
        )
        lengths = jnp.array([10, 6], jnp.int32)

        @jax.jit
        def loss(p, key):
            out, _ = enc.apply(p, x, lengths, train=True, rng=key)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(params, jax.random.PRNGKey(4))
        for leaf in jax.tree.leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()
        # router + experts receive gradient
        assert float(
            jnp.abs(jax.tree.leaves(g["block_0"]["wg"])[0]).max()
        ) > 0.0
        assert float(jnp.abs(g["block_0"]["we1"]).max()) > 0.0

    def test_scan_layers_moe_matches_unrolled(self):
        """MoE blocks are homogeneous, so scan_layers composes."""
        a = self._build(moe_experts=2, scan_layers=False)
        b = self._build(moe_experts=2, scan_layers=True)
        params = a.init(jax.random.PRNGKey(5))
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((2, 8, 6)), jnp.float32)
        lengths = jnp.array([8, 5], jnp.int32)
        out_a, _ = a.apply(params, x, lengths)
        out_b, _ = b.apply(params, x, lengths)
        np.testing.assert_allclose(
            np.asarray(out_a), np.asarray(out_b), rtol=1e-5, atol=1e-6
        )


class TestScanLayers:
    """scan_layers = true runs the block stack as one lax.scan over
    stacked per-layer params (one traced block instead of num_layers
    copies in the HLO). Values and grads must match the unrolled loop;
    the stored param layout is unchanged."""

    def _pair(self, encoder, **over):
        from nabu_tpu.config import Conf
        from nabu_tpu.models.encoders import build_encoder

        conf = {"encoder": encoder, "num_layers": "3",
                "num_units": "16", "num_heads": "2", "ffn_dim": "32"}
        if encoder == "conformer":
            conf["kernel_size"] = "5"
        conf.update({k: str(v) for k, v in over.items()})
        loop = build_encoder(Conf(conf, "encoder"), input_dim=6)
        conf["scan_layers"] = "true"
        scan = build_encoder(Conf(conf, "encoder"), input_dim=6)
        return loop, scan

    @pytest.mark.parametrize("encoder", ["transformer", "conformer"])
    def test_matches_unrolled(self, encoder):
        loop, scan = self._pair(encoder)
        params = loop.init(jax.random.PRNGKey(0))
        # same param layout: the scan stack is formed in-graph
        assert set(params) == set(scan.init(jax.random.PRNGKey(0)))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 11, 6)), jnp.float32)
        lengths = jnp.array([11, 7], jnp.int32)
        out_l, len_l = loop.apply(params, x, lengths)
        out_s, len_s = scan.apply(params, x, lengths)
        np.testing.assert_array_equal(np.asarray(len_l), np.asarray(len_s))
        np.testing.assert_allclose(
            np.asarray(out_s), np.asarray(out_l), rtol=1e-6, atol=1e-6
        )

    @pytest.mark.parametrize("encoder", ["transformer", "conformer"])
    def test_grads_match_unrolled(self, encoder):
        loop, scan = self._pair(encoder)
        params = loop.init(jax.random.PRNGKey(1))
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 9, 6)), jnp.float32)
        lengths = jnp.array([9, 5], jnp.int32)

        def loss(enc):
            def f(p):
                out, _ = enc.apply(p, x, lengths)
                return jnp.sum(out ** 2)
            return f

        g_l = jax.jit(jax.grad(loss(loop)))(params)
        g_s = jax.jit(jax.grad(loss(scan)))(params)
        for a, b in zip(jax.tree.leaves(g_l), jax.tree.leaves(g_s)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-5, atol=5e-6
            )

    def test_with_remat_and_dropout_runs(self):
        _, scan = self._pair("conformer", remat=True, dropout=0.1)
        params = scan.init(jax.random.PRNGKey(2))
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((2, 10, 6)),
            jnp.float32,
        )
        lengths = jnp.array([10, 6], jnp.int32)

        @jax.jit
        def loss(p, key):
            out, _ = scan.apply(p, x, lengths, train=True, rng=key)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(params, jax.random.PRNGKey(3))
        for leaf in jax.tree.leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()

    def test_stacked_leaf_partition_specs_shard_last_axis(self):
        """The GSPMD rule shards the out axis whether a kernel leaf is
        [in, out] or layer-stacked [L, in, out]."""
        from jax.sharding import PartitionSpec as P

        from nabu_tpu.parallel import mesh as mesh_lib

        params = {
            "block": {"wqkv": jnp.zeros((16, 48))},
            "stacked": {"wqkv": jnp.zeros((3, 16, 48))},
        }
        specs = mesh_lib.param_partition_specs(
            params, model_parallel_size=2, min_shard_size=1
        )
        assert specs["block"]["wqkv"] == P(None, mesh_lib.MODEL_AXIS)
        assert specs["stacked"]["wqkv"] == P(
            None, None, mesh_lib.MODEL_AXIS
        )


def test_transformer_joint_ctc_attention_composes():
    """The new encoder families compose with the multi-head container
    (joint CTC/attention over a transformer encoder)."""
    from nabu_tpu.config import Conf, ConfigFile
    from nabu_tpu.models.model import build_model
    from nabu_tpu.ops.losses import make_loss_computer

    cfg = ConfigFile({
        "model": Conf({"decoders": "att ctc"}, "model"),
        "encoder": Conf({
            "encoder": "conformer", "num_layers": "2",
            "num_units": "16", "num_heads": "2", "ffn_dim": "32",
            "kernel_size": "5", "subsample": "2",
        }, "encoder"),
        "att": Conf({"decoder": "speller", "num_units": "16",
                     "embed_dim": "8", "loss": "cross_entropy",
                     "loss_weight": "0.7"}, "att"),
        "ctc": Conf({"decoder": "linear_ctc", "loss": "ctc",
                     "loss_weight": "0.3"}, "ctc"),
    })
    model = build_model(cfg, 6, 4)
    loss_fn = make_loss_computer(model)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {
        "features": jnp.asarray(
            rng.standard_normal((2, 20, 6)).astype(np.float32)),
        "feature_lengths": jnp.array([20, 12], jnp.int32),
        "targets": jnp.asarray(rng.integers(0, 4, (2, 4)), jnp.int32),
        "target_lengths": jnp.array([4, 3], jnp.int32),
        "example_mask": jnp.ones((2,), jnp.float32),
    }
    (loss, metrics), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params, batch, jax.random.PRNGKey(1), True)
    assert np.isfinite(float(loss))
    assert "loss/att" in metrics and "loss/ctc" in metrics
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
