"""Golden tests for the Pallas kernels against their pure-JAX oracles
(interpret mode on CPU; the same code compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestSTFTMel:
    def test_matches_jnp_frontend(self):
        from nabu_tpu.features import jax_frontend as jf
        from nabu_tpu.ops.pallas.stft_mel import stft_mel_pallas

        fp = jf.make_frontend_params(16000.0, nfilt=40)
        rng = np.random.default_rng(0)
        sig = rng.standard_normal(16000).astype(np.float32)
        frames = jf.frame_signal(
            jnp.asarray(sig), fp.frame_len, fp.frame_step, 99
        )
        win = frames * fp.window[None, :]
        re = win @ fp.dft_cos
        im = win @ fp.dft_sin
        ref = jnp.log(
            jnp.maximum(((re * re + im * im) / fp.nfft) @ fp.mel, 1e-30)
        )
        got = stft_mel_pallas(
            frames, fp.window, fp.dft_cos, fp.dft_sin, fp.mel, fp.nfft,
            interpret=True, block_n=32,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3
        )

    def test_nonmultiple_block(self):
        """Frame counts not divisible by the block are padded+sliced."""
        from nabu_tpu.features import jax_frontend as jf
        from nabu_tpu.ops.pallas.stft_mel import stft_mel_pallas

        fp = jf.make_frontend_params(16000.0, nfilt=23)
        rng = np.random.default_rng(1)
        frames = jnp.asarray(
            rng.standard_normal((37, fp.frame_len)).astype(np.float32)
        )
        got = stft_mel_pallas(
            frames, fp.window, fp.dft_cos, fp.dft_sin, fp.mel, fp.nfft,
            interpret=True, block_n=16,
        )
        assert got.shape == (37, 23)
        assert np.isfinite(np.asarray(got)).all()


class TestCTCPallas:
    """Edge cases of the fused batched CTC kernel (the per-example v1
    kernel was removed; ctc_batched is the only Pallas CTC path)."""

    def test_empty_label(self):
        from nabu_tpu.ops.ctc import ctc_loss
        from nabu_tpu.ops.pallas.ctc_batched import ctc_loss_pallas_batched

        rng = np.random.default_rng(5)
        logits = rng.standard_normal((1, 6, 4)).astype(np.float32)
        ref = ctc_loss(
            jnp.asarray(logits), jnp.array([6]),
            jnp.zeros((1, 2), jnp.int32), jnp.array([0]),
        )
        got = ctc_loss_pallas_batched(
            jnp.asarray(logits), jnp.array([6]),
            jnp.zeros((1, 2), jnp.int32), jnp.array([0]), 3, True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4
        )

    def test_impossible_alignment_clamped_zero_grad(self):
        from nabu_tpu.ops.ctc import CTC_NLL_CLAMP
        from nabu_tpu.ops.pallas.ctc_batched import ctc_loss_pallas_batched

        logits = jnp.zeros((1, 2, 5))
        loss = ctc_loss_pallas_batched(
            logits, jnp.array([2]),
            jnp.array([[0, 1, 2]]), jnp.array([3]), 4, True,
        )
        np.testing.assert_allclose(float(loss[0]), CTC_NLL_CLAMP)
        g = jax.grad(
            lambda lg: ctc_loss_pallas_batched(
                lg, jnp.array([2]), jnp.array([[0, 1, 2]]),
                jnp.array([3]), 4, True,
            ).sum()
        )(logits)
        np.testing.assert_array_equal(np.asarray(g), 0.0)


class TestLSTMPallas:
    def _setup(self, seed=0, B=3, T=11, D=5, H=7):
        from nabu_tpu.models import core

        key = jax.random.PRNGKey(seed)
        p = core.lstm_init(key, D, H)
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
        lengths = jnp.asarray(
            rng.integers(1, T + 1, size=(B,)).astype(np.int32)
        )
        return p, x, lengths

    @pytest.mark.parametrize("reverse", [False, True])
    def test_forward_matches_scan(self, reverse):
        from nabu_tpu.models import core
        from nabu_tpu.ops.pallas.lstm import lstm_scan_pallas

        p, x, lengths = self._setup()
        ref = core.lstm_scan(p, x, lengths, reverse=reverse)
        got = lstm_scan_pallas(
            p, x, lengths, reverse=reverse, interpret=True, block_t=4
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
        )

    def test_grad_matches_scan(self):
        from nabu_tpu.models import core
        from nabu_tpu.ops.pallas.lstm import lstm_scan_pallas

        p, x, lengths = self._setup(seed=3)

        def loss_ref(p, x):
            return (core.lstm_scan(p, x, lengths) ** 2).sum()

        def loss_pal(p, x):
            return (
                lstm_scan_pallas(p, x, lengths, interpret=True, block_t=4)
                ** 2
            ).sum()

        (gp_ref, gx_ref) = jax.grad(loss_ref, argnums=(0, 1))(p, x)
        (gp_got, gx_got) = jax.grad(loss_pal, argnums=(0, 1))(p, x)
        np.testing.assert_allclose(
            np.asarray(gx_got), np.asarray(gx_ref), rtol=1e-3, atol=1e-4
        )
        for k in ("wx", "wh", "b"):
            np.testing.assert_allclose(
                np.asarray(gp_got[k]), np.asarray(gp_ref[k]),
                rtol=1e-3, atol=1e-4, err_msg=k,
            )

    def test_block_boundary_correctness(self):
        """block_t smaller than T exercises the boundary-carry path."""
        from nabu_tpu.models import core
        from nabu_tpu.ops.pallas.lstm import lstm_scan_pallas

        p, x, lengths = self._setup(seed=5, T=13)
        ref = core.lstm_scan(p, x, lengths)
        for bt in (1, 3, 13):
            got = lstm_scan_pallas(
                p, x, lengths, interpret=True, block_t=bt
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5,
                err_msg=f"block_t={bt}",
            )


class TestBLSTMFused:
    def test_matches_blstm_apply(self):
        from nabu_tpu.models import core
        from nabu_tpu.ops.pallas.blstm import blstm_fused_forward

        key = jax.random.PRNGKey(2)
        p = core.blstm_init(key, 5, 7)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((3, 13, 5)).astype(np.float32))
        lengths = jnp.array([13, 9, 2])
        ref = core.blstm_apply(p, x, lengths)
        got = blstm_fused_forward(p, x, lengths, interpret=True, block_t=4)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
        )


class TestCTCBatched:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_loss_and_grad_match_oracle(self, seed):
        from nabu_tpu.ops.ctc import ctc_loss
        from nabu_tpu.ops.pallas.ctc_batched import ctc_loss_pallas_batched

        rng = np.random.default_rng(seed)
        B, T, V, L = 3, 17, 6, 4
        logits = rng.standard_normal((B, T, V)).astype(np.float32)
        labels = rng.integers(0, V - 1, size=(B, L)).astype(np.int32)
        logit_len = rng.integers(L + 2, T + 1, size=(B,)).astype(np.int32)
        label_len = rng.integers(0, L + 1, size=(B,)).astype(np.int32)

        ref = ctc_loss(
            jnp.asarray(logits), jnp.asarray(logit_len),
            jnp.asarray(labels), jnp.asarray(label_len),
        )
        got = ctc_loss_pallas_batched(
            jnp.asarray(logits), jnp.asarray(logit_len),
            jnp.asarray(labels), jnp.asarray(label_len), V - 1, True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

        g_ref = jax.grad(
            lambda lg: ctc_loss(
                lg, jnp.asarray(logit_len), jnp.asarray(labels),
                jnp.asarray(label_len),
            ).sum()
        )(jnp.asarray(logits))
        g_got = jax.grad(
            lambda lg: ctc_loss_pallas_batched(
                lg, jnp.asarray(logit_len), jnp.asarray(labels),
                jnp.asarray(label_len), V - 1, True,
            ).sum()
        )(jnp.asarray(logits))
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_ref), rtol=1e-3, atol=1e-4
        )

    def test_trainable_fused_grads_match(self):
        from nabu_tpu.models import core
        from nabu_tpu.ops.pallas.blstm import blstm_apply_fused

        key = jax.random.PRNGKey(4)
        p = core.blstm_init(key, 5, 7)
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((3, 13, 5)).astype(np.float32))
        lengths = jnp.array([13, 9, 2])

        def loss_ref(p, x):
            return (core.blstm_apply(p, x, lengths) ** 2).sum()

        def loss_fused(p, x):
            return (
                blstm_apply_fused(p, x, lengths, interpret=True, block_t=4)
                ** 2
            ).sum()

        np.testing.assert_allclose(
            float(loss_fused(p, x)), float(loss_ref(p, x)), rtol=1e-5
        )
        gr = jax.grad(loss_ref, argnums=(0, 1))(p, x)
        gf = jax.grad(loss_fused, argnums=(0, 1))(p, x)
        for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gf)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4
            )

    def test_trainable_fused_grads_match_tiny_block(self):
        """Degenerate block sizes (BT=1, T not a block multiple) still
        produce oracle-matching gradients — exercises the block-entry
        carry path and the static BT>1 branch of the batched gate
        recompute."""
        import nabu_tpu.ops.pallas.blstm as blstm_mod
        from nabu_tpu.models import core

        key = jax.random.PRNGKey(11)
        p = core.blstm_init(key, 5, 7)
        rng = np.random.default_rng(11)
        for T, bt in ((1, 1), (3, 1), (13, 5)):
            x = jnp.asarray(
                rng.standard_normal((3, T, 5)).astype(np.float32)
            )
            lengths = jnp.array([T, max(T - 1, 1), 1])

            def loss_ref(p, x):
                return (core.blstm_apply(p, x, lengths) ** 2).sum()

            def loss_fused(p, x):
                return (
                    blstm_mod.blstm_apply_fused(
                        p, x, lengths, interpret=True, block_t=bt
                    ) ** 2
                ).sum()

            gr = jax.grad(loss_ref, argnums=(0, 1))(p, x)
            gf = jax.grad(loss_fused, argnums=(0, 1))(p, x)
            for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gf)):
                np.testing.assert_allclose(
                    np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4
                )


def test_lstm_scan_pallas_bf16_inputs():
    """The single-direction fused LSTM accepts bf16 inputs (upcast
    around the f32 kernel) and returns grads in the input dtypes."""
    from nabu_tpu.models import core
    from nabu_tpu.ops.pallas.lstm import lstm_scan_pallas

    key = jax.random.PRNGKey(5)
    p32 = core.lstm_init(key, 5, 6)
    p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p32)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 9, 5)),
        jnp.bfloat16,
    )
    lengths = jnp.array([9, 4])

    def loss(p, x):
        return (
            lstm_scan_pallas(p, x, lengths, interpret=True, block_t=4)
            .astype(jnp.float32) ** 2
        ).sum()

    out = lstm_scan_pallas(p, x, lengths, interpret=True, block_t=4)
    assert out.dtype == jnp.bfloat16
    gp, gx = jax.grad(loss, argnums=(0, 1))(p, x)
    assert gx.dtype == jnp.bfloat16
    for leaf in jax.tree.leaves(gp):
        assert leaf.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(leaf, np.float32)).all()


class TestTransducerFused:
    """Fused joint+loss kernel vs the oracle joint (bf16 operands, the
    kernel's compute dtype) + ops/transducer.transducer_loss."""

    def _case(self, seed=0, B=3, T=7, U=4, J=16, V=5):
        rng = np.random.RandomState(seed)
        enc_proj = (rng.randn(B, T, J) * 0.5).astype(np.float32)
        pred_proj = (rng.randn(B, U + 1, J) * 0.5).astype(np.float32)
        w = (rng.randn(J, V) * 0.3).astype(np.float32)
        b = (rng.randn(V) * 0.1).astype(np.float32)
        targets = rng.randint(0, V - 1, (B, U)).astype(np.int32)
        tlen = rng.randint(0, U + 1, (B,)).astype(np.int32)
        llen = rng.randint(1, T + 1, (B,)).astype(np.int32)
        return enc_proj, pred_proj, w, b, targets, tlen, llen

    @staticmethod
    def _oracle(enc_proj, pred_proj, w, b, targets, tlen, llen):
        from nabu_tpu.ops.transducer import transducer_loss

        bf = jnp.bfloat16
        hidden = jnp.tanh(
            enc_proj.astype(bf)[:, :, None, :]
            + pred_proj.astype(bf)[:, None, :, :]
        )
        logits = jax.lax.dot_general(
            hidden, w.astype(bf),
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b
        return transducer_loss(
            logits, jnp.asarray(llen), jnp.asarray(targets),
            jnp.asarray(tlen),
        )

    def test_matches_oracle(self):
        from nabu_tpu.ops.pallas.transducer import transducer_loss_fused

        for seed in (0, 1, 2):
            args = [jnp.asarray(a) for a in self._case(seed)]
            ref = self._oracle(*args)
            got = transducer_loss_fused(
                args[0], args[1], args[2], args[3],
                args[6], args[4], args[5],
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
            )

    def test_gradients_match_oracle(self):
        from nabu_tpu.ops.pallas.transducer import transducer_loss_fused

        enc_proj, pred_proj, w, b, targets, tlen, llen = self._case(3)
        args = (jnp.asarray(enc_proj), jnp.asarray(pred_proj),
                jnp.asarray(w), jnp.asarray(b))

        def f_ref(e, p, w_, b_):
            return self._oracle(e, p, w_, b_, targets, tlen, llen).sum()

        def f_got(e, p, w_, b_):
            return transducer_loss_fused(
                e, p, w_, b_, jnp.asarray(llen), jnp.asarray(targets),
                jnp.asarray(tlen),
            ).sum()

        gr = jax.grad(f_ref, argnums=(0, 1, 2, 3))(*args)
        gg = jax.grad(f_got, argnums=(0, 1, 2, 3))(*args)
        for name, a, c in zip(("denc", "dpred", "dw", "db"), gr, gg):
            scale = float(jnp.max(jnp.abs(a))) + 1e-6
            err = float(jnp.max(jnp.abs(a - c)))
            # both sides run the joint in bf16 but differ in reduction
            # order; grads agree to bf16-accumulation tolerance
            assert err / scale < 2e-2, (name, err, scale)

    def test_head_loss_integration(self):
        """rnnt head with use_pallas through make_loss_computer equals
        the unfused head (same params) to bf16 tolerance, with grads."""
        import nabu_tpu.models  # noqa: F401
        from nabu_tpu.config import Conf, ConfigFile
        from nabu_tpu.models.model import build_model
        from nabu_tpu.ops.losses import make_loss_computer

        def build(use_pallas):
            cfg = ConfigFile({
                "model": Conf({"compute_dtype": "bfloat16"}, "model"),
                "encoder": Conf({
                    "encoder": "dnn", "num_layers": "1",
                    "num_units": "16",
                }, "encoder"),
                "decoder": Conf({
                    "decoder": "rnnt", "num_units": "12",
                    "embed_dim": "8", "joint_units": "16",
                    "use_pallas": str(use_pallas).lower(),
                }, "decoder"),
            })
            model = build_model(cfg, input_dim=10, num_labels=6)
            return model, make_loss_computer(model)

        rng = np.random.RandomState(5)
        batch = {
            "features": rng.randn(4, 9, 10).astype(np.float32),
            "feature_lengths": np.array([9, 7, 5, 9], np.int32),
            "targets": rng.randint(0, 6, (4, 5)).astype(np.int32),
            "target_lengths": np.array([5, 3, 2, 0], np.int32),
            "example_mask": np.array([1.0, 1.0, 1.0, 0.0], np.float32),
        }
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        key = jax.random.PRNGKey(0)

        m0, loss0 = build(False)
        m1, loss1 = build(True)
        params = m0.init(jax.random.PRNGKey(1))

        l0, g0 = jax.value_and_grad(
            lambda p: loss0(p, batch, key, False)[0]
        )(params)
        l1, g1 = jax.value_and_grad(
            lambda p: loss1(p, batch, key, False)[0]
        )(params)
        np.testing.assert_allclose(float(l0), float(l1), rtol=2e-3,
                                   atol=2e-3)
        for a, c in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=5e-2, atol=5e-3
            )


class TestTransducerFusedEdgeCases:
    def test_zero_length_lanes_stay_finite(self):
        """Fill rows (logit_length 0, target_length 0) must produce a
        finite (maskable) nll, not scratch garbage."""
        from nabu_tpu.ops.pallas.transducer import transducer_loss_fused

        rng = np.random.RandomState(0)
        B, T, U, J, V = 4, 5, 3, 8, 4
        args = (
            jnp.asarray(rng.randn(B, T, J).astype(np.float32)),
            jnp.asarray(rng.randn(B, U + 1, J).astype(np.float32)),
            jnp.asarray(rng.randn(J, V).astype(np.float32)),
            jnp.asarray(rng.randn(V).astype(np.float32)),
        )
        llen = jnp.asarray([5, 0, 3, 0], np.int32)
        tlen = jnp.asarray([3, 0, 1, 0], np.int32)
        tgt = jnp.asarray(rng.randint(0, V - 1, (B, U)), jnp.int32)
        nll = transducer_loss_fused(*args, llen, tgt, tlen)
        assert bool(jnp.isfinite(nll).all()), np.asarray(nll)
        g = jax.grad(
            lambda e: transducer_loss_fused(
                e, args[1], args[2], args[3], llen, tgt, tlen
            )[0]  # grad through a real lane only
        )(args[0])
        assert bool(jnp.isfinite(g).all())

    def test_vmem_fallback_matches_oracle(self):
        """Shapes beyond the VMEM budget fall back to the oracle path."""
        from nabu_tpu.ops.pallas.transducer import transducer_loss_fused
        from nabu_tpu.ops.transducer import transducer_loss

        rng = np.random.RandomState(1)
        B, T, U, J, V = 8, 2, 3, 5120, 4  # J blows the estimate
        enc = (rng.randn(B, T, J) * 0.05).astype(np.float32)
        pred = (rng.randn(B, U + 1, J) * 0.05).astype(np.float32)
        w = (rng.randn(J, V) * 0.02).astype(np.float32)
        b = rng.randn(V).astype(np.float32)
        tgt = rng.randint(0, V - 1, (B, U)).astype(np.int32)
        llen = np.full((B,), T, np.int32)
        tlen = np.full((B,), U, np.int32)
        got = transducer_loss_fused(
            jnp.asarray(enc), jnp.asarray(pred), jnp.asarray(w),
            jnp.asarray(b), jnp.asarray(llen), jnp.asarray(tgt),
            jnp.asarray(tlen),
        )
        hidden = jnp.tanh(
            jnp.asarray(enc)[:, :, None, :] + jnp.asarray(pred)[:, None]
        )
        logits = hidden @ jnp.asarray(w) + jnp.asarray(b)
        ref = transducer_loss(
            logits, jnp.asarray(llen), jnp.asarray(tgt), jnp.asarray(tlen)
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


class TestTransducerSubBlock:
    """sub_t (frames of joint batched off the DP chain) is a pure
    scheduling knob: every value must produce identical losses AND
    gradients — the math is unchanged, only the matmul granularity."""

    def test_sub_t_values_agree(self):
        import jax
        import jax.numpy as jnp

        from nabu_tpu.ops.pallas.transducer import transducer_loss_fused

        case = TestTransducerFused()._case(seed=3, B=3, T=9, U=4,
                                           J=16, V=5)
        enc, pred, w, b, targets, tlen, llen = (
            jnp.asarray(a) for a in case
        )

        def loss(sub_t):
            def f(enc, pred, w):
                return transducer_loss_fused(
                    enc, pred, w, b, llen, targets, tlen,
                    block_t=4, sub_t=sub_t,
                ).sum()

            return jax.value_and_grad(f, argnums=(0, 1, 2))(enc, pred, w)

        ref_l, ref_g = loss(1)
        for st in (2, 3, 4):  # 3 exercises the divisor fallback
            got_l, got_g = loss(st)
            np.testing.assert_allclose(
                np.asarray(got_l), np.asarray(ref_l), rtol=1e-6
            )
            for a, bb in zip(ref_g, got_g):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(bb), rtol=1e-5, atol=1e-6
                )
