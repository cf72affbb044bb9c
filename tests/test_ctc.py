"""CTC loss tests: against optax's ctc_loss oracle, a brute-force path
enumeration on tiny cases, gradient sanity, and greedy collapse
(SURVEY.md §4: CTC loss/grad vs a pure-numpy DP reference)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nabu_tpu.ops import ctc as ctc_ops


def brute_force_ctc(logprobs, labels, blank):
    """Sum over all alignments by enumeration. logprobs [T, V], labels [L]."""
    T, V = logprobs.shape
    total = -np.inf
    for path in itertools.product(range(V), repeat=T):
        # collapse path
        collapsed = []
        prev = None
        for s in path:
            if s != prev and s != blank:
                collapsed.append(s)
            prev = s
        if collapsed == list(labels):
            lp = sum(logprobs[t, s] for t, s in enumerate(path))
            total = np.logaddexp(total, lp)
    return -total


class TestCTCLoss:
    def test_matches_brute_force(self):
        rng = np.random.default_rng(0)
        T, V, L = 4, 3, 2
        logits = rng.standard_normal((1, T, V)).astype(np.float32)
        labels = np.array([[0, 1]], dtype=np.int32)
        blank = V - 1
        loss = ctc_ops.ctc_loss(
            jnp.asarray(logits), jnp.array([T]), jnp.asarray(labels),
            jnp.array([L]), blank_id=blank,
        )
        logprobs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits[0])))
        ref = brute_force_ctc(logprobs, [0, 1], blank)
        np.testing.assert_allclose(float(loss[0]), ref, rtol=1e-4)

    def test_matches_optax(self):
        rng = np.random.default_rng(1)
        B, T, V, L = 3, 12, 6, 5
        logits = rng.standard_normal((B, T, V)).astype(np.float32)
        labels = rng.integers(1, V - 1, size=(B, L)).astype(np.int32)
        logit_len = np.array([12, 9, 7], np.int32)
        label_len = np.array([5, 3, 1], np.int32)

        # optax convention: blank_id=0, paddings arrays
        logit_pad = (np.arange(T)[None] >= logit_len[:, None]).astype(np.float32)
        label_pad = (np.arange(L)[None] >= label_len[:, None]).astype(np.float32)
        ref = optax.ctc_loss(
            jnp.asarray(logits), jnp.asarray(logit_pad),
            jnp.asarray(labels), jnp.asarray(label_pad), blank_id=0,
        )
        got = ctc_ops.ctc_loss(
            jnp.asarray(logits), jnp.asarray(logit_len),
            jnp.asarray(labels), jnp.asarray(label_len), blank_id=0,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_grad_matches_optax(self):
        rng = np.random.default_rng(2)
        B, T, V, L = 2, 8, 5, 3
        logits = rng.standard_normal((B, T, V)).astype(np.float32)
        labels = rng.integers(1, V, size=(B, L)).astype(np.int32)
        logit_len = np.array([8, 6], np.int32)
        label_len = np.array([3, 2], np.int32)
        logit_pad = (np.arange(T)[None] >= logit_len[:, None]).astype(np.float32)
        label_pad = (np.arange(L)[None] >= label_len[:, None]).astype(np.float32)

        g_ref = jax.grad(
            lambda lg: optax.ctc_loss(
                lg, jnp.asarray(logit_pad), jnp.asarray(labels),
                jnp.asarray(label_pad), blank_id=0,
            ).sum()
        )(jnp.asarray(logits))
        g_got = jax.grad(
            lambda lg: ctc_ops.ctc_loss(
                lg, jnp.asarray(logit_len), jnp.asarray(labels),
                jnp.asarray(label_len), blank_id=0,
            ).sum()
        )(jnp.asarray(logits))
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   rtol=1e-3, atol=1e-4)

    def test_blank_last_convention(self):
        """blank=V-1 (framework default) agrees with optax after remap."""
        rng = np.random.default_rng(3)
        B, T, V, L = 2, 10, 4, 3
        logits = rng.standard_normal((B, T, V)).astype(np.float32)
        labels = rng.integers(0, V - 1, size=(B, L)).astype(np.int32)
        logit_len = np.array([10, 8], np.int32)
        label_len = np.array([3, 2], np.int32)
        got = ctc_ops.ctc_loss(
            jnp.asarray(logits), jnp.asarray(logit_len),
            jnp.asarray(labels), jnp.asarray(label_len),
        )  # default blank = V-1
        # remap: move blank channel to 0, shift labels +1
        logits_r = np.concatenate([logits[..., -1:], logits[..., :-1]], -1)
        labels_r = labels + 1
        logit_pad = (np.arange(T)[None] >= logit_len[:, None]).astype(np.float32)
        label_pad = (np.arange(L)[None] >= label_len[:, None]).astype(np.float32)
        ref = optax.ctc_loss(
            jnp.asarray(logits_r), jnp.asarray(logit_pad),
            jnp.asarray(labels_r), jnp.asarray(label_pad), blank_id=0,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_impossible_alignment_clamped(self):
        """label_len > logit_len gives exactly CTC_NLL_CLAMP, zero grad."""
        logits = jnp.zeros((1, 2, 4))

        def loss_fn(lg):
            return ctc_ops.ctc_loss(
                lg, jnp.array([2]), jnp.array([[0, 1, 2]]), jnp.array([3])
            ).sum()

        loss, grad = jax.value_and_grad(loss_fn)(logits)
        np.testing.assert_allclose(float(loss), ctc_ops.CTC_NLL_CLAMP)
        np.testing.assert_array_equal(np.asarray(grad), 0.0)

    def test_feasibility_predicate(self):
        """T >= L + #adjacent-repeats, padding positions ignored."""
        labels = jnp.array(
            [[1, 1, 2, 0], [1, 2, 3, 0], [1, 1, 1, 1], [5, 5, 5, 5]],
            jnp.int32,
        )
        label_len = jnp.array([3, 3, 3, 0])
        # needs: 3+1=4, 3+0=3, 3+2=5, 0
        got = ctc_ops.ctc_feasible(
            jnp.array([4, 3, 4, 1]), labels, label_len
        )
        np.testing.assert_array_equal(
            np.asarray(got), [True, True, False, True]
        )
        got = ctc_ops.ctc_feasible(
            jnp.array([3, 2, 5, 0]), labels, label_len
        )
        np.testing.assert_array_equal(
            np.asarray(got), [False, False, True, True]
        )

    def test_poisoned_batch_trains_on_healthy_examples(self):
        """The loss computer drops infeasible examples from the mean and
        reports their fraction; loss stays O(100) and grads stay finite
        (VERDICT round 1, Weak #3)."""
        from nabu_tpu.ops.losses import ctc_loss_fn

        rng = np.random.default_rng(7)
        logits = jnp.asarray(
            rng.standard_normal((3, 6, 5)).astype(np.float32)
        )
        targets = jnp.array(
            [[1, 2, 0, 0, 0, 0, 0, 0],
             [0, 1, 2, 3, 0, 1, 2, 3],  # 8 labels in 6 frames: infeasible
             [2, 3, 0, 0, 0, 0, 0, 0]],
            jnp.int32,
        )
        target_len = jnp.array([2, 8, 2])
        logit_len = jnp.array([6, 6, 6])
        mask = jnp.array([1.0, 1.0, 1.0])

        def total(lg):
            loss, metrics = ctc_loss_fn(
                lg, logit_len, targets, target_len, mask
            )
            return loss, metrics

        (loss, metrics), grad = jax.value_and_grad(
            total, has_aux=True
        )(logits)
        assert float(loss) < 100.0
        np.testing.assert_allclose(
            float(metrics["ctc_infeasible_frac"]), 1.0 / 3.0, rtol=1e-6
        )
        assert np.isfinite(np.asarray(grad)).all()
        # healthy-only batch gives the identical loss
        loss_h, _ = ctc_loss_fn(
            logits, logit_len, targets, target_len,
            jnp.array([1.0, 0.0, 1.0]),
        )
        np.testing.assert_allclose(float(loss), float(loss_h), rtol=1e-6)

    def test_empty_label(self):
        """Empty label sequence: loss = -sum log P(blank)."""
        rng = np.random.default_rng(4)
        logits = rng.standard_normal((1, 5, 3)).astype(np.float32)
        loss = ctc_ops.ctc_loss(
            jnp.asarray(logits), jnp.array([5]),
            jnp.zeros((1, 2), jnp.int32), jnp.array([0]), blank_id=2,
        )
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits[0])))
        ref = -lp[:, 2].sum()
        np.testing.assert_allclose(float(loss[0]), ref, rtol=1e-4)


class TestGreedyCollapse:
    def test_basic(self):
        frames = jnp.array([[2, 0, 0, 4, 1, 1, 4, 4]], jnp.int32)  # blank=4
        out, out_len = ctc_ops.ctc_greedy_collapse(
            frames, jnp.array([8]), blank_id=4
        )
        assert int(out_len[0]) == 3
        np.testing.assert_array_equal(np.asarray(out[0, :3]), [2, 0, 1])
        np.testing.assert_array_equal(np.asarray(out[0, 3:]), 4)

    def test_respects_length(self):
        frames = jnp.array([[1, 2, 3, 3, 2]], jnp.int32)
        out, out_len = ctc_ops.ctc_greedy_collapse(
            frames, jnp.array([2]), blank_id=0
        )
        assert int(out_len[0]) == 2
        np.testing.assert_array_equal(np.asarray(out[0, :2]), [1, 2])

    def test_all_kept(self):
        frames = jnp.array([[1, 2, 3]], jnp.int32)
        out, out_len = ctc_ops.ctc_greedy_collapse(
            frames, jnp.array([3]), blank_id=0
        )
        assert int(out_len[0]) == 3
        np.testing.assert_array_equal(np.asarray(out[0]), [1, 2, 3])


class TestCrossEntropy:
    def test_perfect_prediction_low_loss(self):
        from nabu_tpu.ops.losses import cross_entropy_loss_fn

        targets = jnp.array([[1, 2], [0, 0]], jnp.int32)
        tgt_len = jnp.array([2, 1])
        V = 4  # 3 labels + eos
        # build logits that put all mass on the extended target
        logits = np.full((2, 3, V), -20.0, np.float32)
        ext = [[1, 2, 3], [0, 3, 0]]  # eos=3 appended
        for b in range(2):
            for t in range(3):
                logits[b, t, ext[b][t]] = 20.0
        loss, metrics = cross_entropy_loss_fn(
            jnp.asarray(logits), tgt_len + 1, targets, tgt_len,
            jnp.array([1.0, 1.0]),
        )
        assert float(loss) < 1e-3
        assert float(metrics["token_accuracy"]) == 1.0

    def test_label_smoothing_increases_loss(self):
        from nabu_tpu.ops.losses import cross_entropy_loss_fn

        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.standard_normal((2, 4, 5)).astype(np.float32))
        targets = jnp.array([[1, 2, 3], [2, 0, 0]], jnp.int32)
        tgt_len = jnp.array([3, 1])
        mask = jnp.array([1.0, 1.0])
        l0, _ = cross_entropy_loss_fn(logits, tgt_len + 1, targets, tgt_len, mask)
        l1, _ = cross_entropy_loss_fn(
            logits, tgt_len + 1, targets, tgt_len, mask, label_smoothing=0.1
        )
        assert float(l1) != float(l0)

    def test_fill_examples_ignored(self):
        from nabu_tpu.ops.losses import cross_entropy_loss_fn

        rng = np.random.default_rng(1)
        logits = jnp.asarray(rng.standard_normal((2, 4, 5)).astype(np.float32))
        targets = jnp.array([[1, 2, 3], [2, 2, 2]], jnp.int32)
        tgt_len = jnp.array([3, 3])
        l_both, _ = cross_entropy_loss_fn(
            logits, tgt_len + 1, targets, tgt_len, jnp.array([1.0, 0.0])
        )
        l_first, _ = cross_entropy_loss_fn(
            logits[:1], tgt_len[:1] + 1, targets[:1], tgt_len[:1],
            jnp.array([1.0]),
        )
        np.testing.assert_allclose(float(l_both), float(l_first), rtol=1e-5)
