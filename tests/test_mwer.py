"""MWER sequence training: in-graph edit distance vs python
Levenshtein, loss value vs a hand computation from the model's own
scores, gradient direction, and one real trainer step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nabu_tpu.ops.mwer import make_mwer_loss_computer, token_edit_distance


def _levenshtein(a, b):
    d = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        prev = d[0]
        d[0] = i
        for j, y in enumerate(b, 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                   prev + (x != y))
    return d[len(b)]


class TestEditDistance:
    @pytest.mark.parametrize("seed", range(5))
    def test_matches_python(self, seed):
        rng = np.random.RandomState(seed)
        B, L, U, V = 6, 9, 7, 4
        hyp_lens = rng.randint(0, L + 1, B)
        ref_lens = rng.randint(0, U + 1, B)
        hyps = rng.randint(0, V, (B, L))
        refs = rng.randint(0, V, (B, U))
        got = token_edit_distance(
            jnp.asarray(hyps, jnp.int32), jnp.asarray(hyp_lens, jnp.int32),
            jnp.asarray(refs, jnp.int32), jnp.asarray(ref_lens, jnp.int32),
        )
        for b in range(B):
            want = _levenshtein(
                list(hyps[b, : hyp_lens[b]]), list(refs[b, : ref_lens[b]])
            )
            assert int(got[b]) == want, (b, int(got[b]), want)

    def test_padding_beyond_lengths_is_ignored(self):
        a = token_edit_distance(
            jnp.asarray([[1, 2, 9, 9]], jnp.int32), jnp.asarray([2]),
            jnp.asarray([[1, 2, 7]], jnp.int32), jnp.asarray([2]),
        )
        assert int(a[0]) == 0


def _tiny_model():
    import nabu_tpu.models  # noqa: F401
    from nabu_tpu.config import Conf, ConfigFile
    from nabu_tpu.models.model import build_model

    cfg = ConfigFile({
        "model": Conf({"decoders": "att"}, "model"),
        "encoder": Conf({
            "encoder": "dnn", "num_units": "12",
        }, "encoder"),
        "att": Conf({
            "decoder": "speller", "num_layers": "1", "num_units": "10",
            "embed_dim": "5", "loss": "cross_entropy",
        }, "att"),
    })
    return build_model(cfg, input_dim=4, num_labels=3)


def _batch(rng, B=2, T=6, U=3):
    tgts = rng.randint(0, 3, (B, U)).astype(np.int32)
    return {
        "features": jnp.asarray(
            rng.randn(B, T, 4).astype(np.float32)
        ),
        "feature_lengths": jnp.asarray([T, T - 2], np.int32),
        "targets": jnp.asarray(tgts),
        "target_lengths": jnp.asarray([U, U - 1], np.int32),
        "example_mask": jnp.asarray([True, True]),
    }


class TestMWERLoss:
    def test_loss_matches_hand_computation(self):
        """loss == sum_n softmax(score)_n * (err_n - mean err), using
        the beam's own hypotheses re-scored by hand."""
        from nabu_tpu.config import Conf
        from nabu_tpu.decoding.beam import attention_beam_search
        from nabu_tpu.ops.masking import sequence_mask

        model = _tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        rng = np.random.RandomState(1)
        batch = _batch(rng)
        N = 3
        conf = Conf({
            "mwer": "true", "mwer_beam": str(N),
            "mwer_ce_weight": "0.0", "mwer_extra_steps": "2",
        })
        loss_fn = make_mwer_loss_computer(model, conf)
        loss, metrics = loss_fn(
            params, batch, jax.random.PRNGKey(0), train=False
        )

        # reproduce by hand
        dec = model.decoders["att"]
        encoded, enc_lens = model.encode(
            params, batch["features"], batch["feature_lengths"]
        )
        seqs, lens, _ = attention_beam_search(
            dec, params["decoders"]["att"], encoded, enc_lens,
            beam_width=N, max_steps=batch["targets"].shape[1] + 2,
        )
        B = 2
        expected = 0.0
        for b in range(B):
            scores, errs = [], []
            for n in range(N):
                hyp = list(np.asarray(seqs)[b, n, : int(lens[b, n])])
                # teacher-forced score of hyp + eos via step loop
                state = dec.init_state(1)
                state.pop("attn_weights", None)
                prev = jnp.asarray([dec.sos_id], jnp.int32)
                enc_b = encoded[b : b + 1]
                mask_b = sequence_mask(enc_lens[b : b + 1],
                                       encoded.shape[1])
                total = 0.0
                for tok in hyp + [dec.eos_id]:
                    logits, state = dec.step(
                        params["decoders"]["att"], prev, state, enc_b,
                        mask_b,
                    )
                    state.pop("attn_weights", None)
                    lp = jax.nn.log_softmax(
                        logits.astype(jnp.float32), -1
                    )
                    total += float(lp[0, tok])
                    prev = jnp.asarray([tok], jnp.int32)
                scores.append(total)
                ref = list(
                    np.asarray(batch["targets"])[
                        b, : int(batch["target_lengths"][b])
                    ]
                )
                errs.append(float(_levenshtein(hyp, ref)))
            p = np.exp(scores - np.max(scores))
            p = p / p.sum()
            expected += float(np.sum(p * (np.asarray(errs)
                                          - np.mean(errs))))
        expected /= B
        np.testing.assert_allclose(float(loss), expected, atol=1e-4)
        assert np.isfinite(float(metrics["mwer/expected_errors"]))

    def test_gradient_reduces_expected_errors(self):
        """A few SGD steps on the MWER loss lower the expected token
        errors under the model (the REINFORCE-style gradient works)."""
        from nabu_tpu.config import Conf

        model = _tiny_model()
        params = model.init(jax.random.PRNGKey(2))
        rng = np.random.RandomState(3)
        batch = _batch(rng)
        conf = Conf({
            "mwer": "true", "mwer_beam": "3", "mwer_ce_weight": "0.0",
        })
        loss_fn = make_mwer_loss_computer(model, conf)

        @jax.jit
        def step(p):
            (l, m), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, batch, jax.random.PRNGKey(0), False
            )
            return jax.tree.map(lambda a, b: a - 0.5 * b, p, g), m

        _, m0 = step(params)
        p = params
        for _ in range(8):
            p, m = step(p)
        assert float(m["mwer/expected_errors"]) < float(
            m0["mwer/expected_errors"]
        )

    def test_ce_interpolation_adds_head_loss(self):
        from nabu_tpu.config import Conf

        model = _tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        batch = _batch(np.random.RandomState(1))
        base = make_mwer_loss_computer(
            model, Conf({"mwer": "true", "mwer_ce_weight": "0.0"})
        )(params, batch, jax.random.PRNGKey(0), False)
        interp = make_mwer_loss_computer(
            model, Conf({"mwer": "true", "mwer_ce_weight": "0.5"})
        )(params, batch, jax.random.PRNGKey(0), False)
        assert "loss/att" in interp[1]
        np.testing.assert_allclose(
            float(interp[0]),
            float(base[0]) + 0.5 * float(interp[1]["loss/att"]),
            rtol=1e-5, atol=1e-6,
        )

    def test_trainer_runs_mwer_step(self, tmp_path):
        """[trainer] mwer = true drives real train steps end-to-end."""
        from tests.corpus_utils import make_corpus, write_recipe
        from nabu_tpu.scripts import data as data_script
        from nabu_tpu.scripts import train as train_script

        root = tmp_path
        corpus = {
            "train": make_corpus(str(root / "train"), 8, seed=70),
            "dev": make_corpus(str(root / "dev"), 4, seed=71),
        }
        recipe = str(root / "recipe")
        write_recipe(
            recipe, corpus,
            "[model]\n\n[encoder]\nencoder = dnn\nnum_units = 16\n\n"
            "[decoder]\ndecoder = speller\nnum_layers = 1\n"
            "num_units = 16\nembed_dim = 8\nloss = cross_entropy\n",
            "[trainer]\nfeatures = trainfeatures\ntargets = traintargets\n"
            "batch_size = 8\nnum_buckets = 1\nnum_steps = 2\n"
            "valid_frequency = 0\nlearning_rate = 1e-3\n"
            "log_frequency = 1\n"
            "mwer = true\nmwer_beam = 2\nmwer_ce_weight = 0.1\n",
        )
        expdir = str(root / "exp")
        data_script.main(recipe, expdir)
        state = train_script.main(recipe, expdir)
        assert state is not None
        import json
        import os

        lines = [
            json.loads(line)
            for line in open(
                os.path.join(expdir, "logs", "metrics.jsonl")
            )
        ]
        train_lines = [l for l in lines if "train/loss/mwer" in l]
        assert train_lines, "no MWER metrics logged"
        assert np.isfinite(train_lines[-1]["train/loss/mwer"])
