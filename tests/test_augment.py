"""SpecAugment (nabu_tpu/ops/augment.py): mask geometry, train-only
application, jit/grad compatibility."""

import jax
import jax.numpy as jnp
import numpy as np

from nabu_tpu.ops.augment import spec_augment


def test_mask_geometry_and_bounds():
    B, T, F = 4, 60, 20
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    # avoid exact zeros in the input so masked == zero is unambiguous
    feats = jnp.where(jnp.abs(feats) < 1e-3, 1.0, feats)
    lengths = jnp.array([60, 50, 40, 30], jnp.int32)

    out = spec_augment(
        jax.random.PRNGKey(3), feats, lengths,
        freq_masks=1, freq_width=4, time_masks=1, time_width=10,
        time_ratio=0.5,
    )
    out = np.asarray(out)
    for b in range(B):
        zero_f = np.where((out[b] == 0).all(axis=0))[0]  # fully-zero bins
        assert len(zero_f) <= 4, "freq mask wider than freq_width"
        if len(zero_f) > 1:
            assert np.all(np.diff(zero_f) == 1), "freq mask contiguous"
        zero_t = np.where((out[b] == 0).all(axis=1))[0]
        assert len(zero_t) <= min(10, int(0.5 * int(lengths[b])))
        if len(zero_t):
            # the time mask starts within the real utterance
            assert zero_t[0] < int(lengths[b])
    # unmasked positions untouched
    mask = out == 0
    np.testing.assert_array_equal(
        out[~mask], np.asarray(feats)[~mask]
    )


def test_deterministic_per_key():
    feats = jnp.ones((2, 30, 12))
    lengths = jnp.array([30, 20], jnp.int32)
    a = spec_augment(jax.random.PRNGKey(7), feats, lengths)
    b = spec_augment(jax.random.PRNGKey(7), feats, lengths)
    c = spec_augment(jax.random.PRNGKey(8), feats, lengths)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_model_applies_only_in_training():
    from nabu_tpu.config import Conf, ConfigFile
    from nabu_tpu.models.model import build_model

    cfg = ConfigFile({
        "model": Conf({
            "spec_augment": "true",
            "spec_freq_masks": "2",
            "spec_time_masks": "2",
        }, "model"),
        "encoder": Conf({"encoder": "dnn", "num_units": "8",
                         "num_layers": "1"}, "encoder"),
        "decoder": Conf({"decoder": "linear_ctc", "loss": "ctc"},
                        "decoder"),
    })
    model = build_model(cfg, 12, 4)
    assert model.spec_augment is not None
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, 40, 12)).astype(np.float32))
    lengths = jnp.array([40, 30], jnp.int32)

    # eval: deterministic, no masking influence — two different rngs agree
    e1 = model.apply(params, feats, lengths, train=False,
                     rng=jax.random.PRNGKey(1))["decoder"][0]
    e2 = model.apply(params, feats, lengths, train=False,
                     rng=jax.random.PRNGKey(2))["decoder"][0]
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    # train: different rngs give different logits (masks differ)
    t1 = model.apply(params, feats, lengths, train=True,
                     rng=jax.random.PRNGKey(1))["decoder"][0]
    t2 = model.apply(params, feats, lengths, train=True,
                     rng=jax.random.PRNGKey(2))["decoder"][0]
    assert not np.array_equal(np.asarray(t1), np.asarray(t2))


def test_jit_and_grad():
    """Gradients flow through the augmented train step (loss finite)."""
    from nabu_tpu.config import Conf, ConfigFile
    from nabu_tpu.models.model import build_model
    from nabu_tpu.ops.losses import make_loss_computer

    cfg = ConfigFile({
        "model": Conf({"spec_augment": "true"}, "model"),
        "encoder": Conf({"encoder": "dnn", "num_units": "8"}, "encoder"),
        "decoder": Conf({"decoder": "linear_ctc", "loss": "ctc"},
                        "decoder"),
    })
    model = build_model(cfg, 10, 4)
    loss_fn = make_loss_computer(model)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {
        "features": jnp.asarray(
            rng.standard_normal((2, 30, 10)).astype(np.float32)
        ),
        "feature_lengths": jnp.array([30, 25], jnp.int32),
        "targets": jnp.asarray(rng.integers(0, 4, (2, 5)), jnp.int32),
        "target_lengths": jnp.array([5, 3], jnp.int32),
        "example_mask": jnp.ones((2,), jnp.float32),
    }

    @jax.jit
    def step(params, batch, key):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key, True
        )
        return loss, grads

    loss, grads = step(params, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(loss))
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(g * g) for g in jax.tree.leaves(grads)))
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_mask_start_covers_full_axis():
    """Regression: width is sampled first, start uniform over
    [0, dim - w] — the LAST frequency bin and the final real frame must
    be maskable (an independent start capped at dim - max_width left
    them permanently unmasked)."""
    B, T, F = 8, 40, 12
    feats = jnp.ones((B, T, F))
    lengths = jnp.full((B,), T, jnp.int32)
    last_bin_hit = last_frame_hit = False
    for seed in range(40):
        out = np.asarray(spec_augment(
            jax.random.PRNGKey(seed), feats, lengths,
            freq_masks=1, freq_width=4, time_masks=1, time_width=8,
            time_ratio=1.0,
        ))
        if (out[:, :, -1] == 0).any():
            last_bin_hit = True
        if (out[:, -1, :] == 0).any():
            last_frame_hit = True
        if last_bin_hit and last_frame_hit:
            break
    assert last_bin_hit, "last frequency bin never masked"
    assert last_frame_hit, "last frame never masked"


def test_freq_width_capped_by_num_bins():
    """freq_width >= F must not let one mask zero the whole spectrum."""
    B, T, F = 4, 20, 6
    feats = jnp.ones((B, T, F))
    lengths = jnp.full((B,), T, jnp.int32)
    for seed in range(20):
        out = np.asarray(spec_augment(
            jax.random.PRNGKey(seed), feats, lengths,
            freq_masks=1, freq_width=10,  # wider than F
            time_masks=0,
        ))
        zero_bins = (out == 0).all(axis=(0, 1)).sum()
        assert zero_bins < F, "a single freq mask wiped the spectrum"
