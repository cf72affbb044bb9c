"""Trainer unit tests: synchronous gradient aggregation
(numbatches_to_aggregate — the reference's SyncReplicasOptimizer
capability in nabu/neuralnetworks/trainers/trainer.py)."""

import numpy as np
import pytest


def _make_loader(tmp_path, n=8):
    """Loader whose every batch is identical (all utterances equal)."""
    from nabu_tpu.data.pipeline import BucketedLoader
    from nabu_tpu.data.storage import ShardWriter, ShardedDataset

    rng = np.random.default_rng(7)
    feat = rng.standard_normal((12, 6)).astype(np.float32)
    tgt = rng.integers(0, 4, 3).astype(np.int32)
    fw = ShardWriter(str(tmp_path / "f"))
    tw = ShardWriter(str(tmp_path / "t"))
    for i in range(n):
        fw.write(f"u{i}", feat)
        tw.write(f"u{i}", tgt)
    fw.close()
    tw.close({"num_labels": 4})
    return BucketedLoader(
        ShardedDataset(str(tmp_path / "f")),
        ShardedDataset(str(tmp_path / "t")),
        batch_size=4,
        num_buckets=1,
    )


def _train_one(tmp_path, name, aggregate):
    import jax

    from nabu_tpu.config import Conf, ConfigFile
    from nabu_tpu.models.model import build_model
    from nabu_tpu.training.trainer import Trainer

    cfg = ConfigFile({
        "encoder": Conf({"encoder": "dnn", "num_units": "8"}, "encoder"),
        "decoder": Conf({"decoder": "linear_ctc", "loss": "ctc"},
                        "decoder"),
    })
    model = build_model(cfg, 6, 4)
    tconf = Conf({
        "num_steps": "1",
        "numbatches_to_aggregate": str(aggregate),
        "log_frequency": "1",
        "learning_rate": "1e-2",
    }, "trainer")
    from nabu_tpu.parallel import mesh as mesh_lib

    loader = _make_loader(tmp_path / name)
    # batch of 4 is not divisible over the 8-device test mesh: run on a
    # single-device mesh (sharding equivalence is tests/test_parallel.py)
    mesh = mesh_lib.make_mesh(devices=jax.devices()[:1])
    trainer = Trainer(tconf, model, loader, str(tmp_path / f"exp_{name}"),
                      mesh=mesh)
    result = trainer.train(rng_seed=0)
    return jax.device_get(result["params"]), result


def test_aggregate_identical_batches_matches_plain_step(tmp_path):
    """Averaging grads over 2 identical micro-batches == one plain step."""
    import jax

    p_plain, r_plain = _train_one(tmp_path, "plain", aggregate=1)
    p_agg, r_agg = _train_one(tmp_path, "agg", aggregate=2)
    assert r_plain["step"] == 1 and r_agg["step"] == 1
    flat_p, _ = jax.tree_util.tree_flatten(p_plain)
    flat_a, _ = jax.tree_util.tree_flatten(p_agg)
    assert len(flat_p) == len(flat_a)
    for a, b in zip(flat_p, flat_a):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_aggregate_metrics_logged(tmp_path):
    """With aggregation, one metrics entry per optimizer step and the
    logged loss is the micro-batch mean."""
    import json
    import os

    _, result = _train_one(tmp_path, "metrics", aggregate=2)
    logs = os.path.join(str(tmp_path / "exp_metrics"), "logs",
                        "metrics.jsonl")
    lines = [json.loads(l) for l in open(logs)]
    steps = [l["step"] for l in lines if "train/loss" in l]
    assert steps == [1]
    loss = [l["train/loss"] for l in lines if "train/loss" in l][0]
    assert np.isfinite(loss) and loss > 0


def test_prefetch_propagates_producer_errors():
    """An exception in the prefetch producer thread must surface in the
    consumer (a swallowed error would make the train loop see an empty
    epoch and spin forever)."""
    from nabu_tpu.data.pipeline import prefetch

    def gen():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_async_checkpoint_roundtrip(tmp_path):
    """Async save returns immediately; the checkpoint is finalized and
    readable at the next checkpoint operation (exists/restore)."""
    import numpy as np

    from nabu_tpu.training.checkpoints import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ck"), use_async=True)
    state = {
        "params": {"w": np.arange(12.0).reshape(3, 4)},
        "step": np.int64(7),
    }
    mgr.save_latest(state)
    # second save must finalize the first before reusing the tmp dir
    state2 = {
        "params": {"w": 2.0 * np.arange(12.0).reshape(3, 4)},
        "step": np.int64(9),
    }
    mgr.save_latest(state2)
    assert mgr.exists("latest")
    out = mgr.restore(
        "latest", {"params": {"w": np.zeros((3, 4))}, "step": np.int64(0)}
    )
    np.testing.assert_allclose(out["params"]["w"], state2["params"]["w"])
    assert int(out["step"]) == 9
    mgr.wait_until_finished()


def test_trainer_async_checkpoint_resume(tmp_path):
    """Training with async_checkpoint=true leaves a durable 'latest'
    that a resumed run continues from."""
    import jax

    from nabu_tpu.config import Conf, ConfigFile
    from nabu_tpu.models.model import build_model
    from nabu_tpu.parallel import mesh as mesh_lib
    from nabu_tpu.training.trainer import Trainer

    cfg = ConfigFile({
        "encoder": Conf({"encoder": "dnn", "num_units": "8"}, "encoder"),
        "decoder": Conf({"decoder": "linear_ctc", "loss": "ctc"},
                        "decoder"),
    })
    mesh = mesh_lib.make_mesh(devices=jax.devices()[:1])
    loader = _make_loader(tmp_path / "d")
    expdir = str(tmp_path / "exp")

    def run(num_steps, resume):
        tconf = Conf({
            "num_steps": str(num_steps),
            "log_frequency": "1",
            "ckpt_frequency": "1",
            "async_checkpoint": "true",
            "resume": str(resume).lower(),
            "learning_rate": "1e-2",
        }, "trainer")
        model = build_model(cfg, 6, 4)
        t = Trainer(tconf, model, loader, expdir, mesh=mesh)
        return t.train(rng_seed=0)

    r1 = run(2, resume=False)
    assert r1["step"] == 2
    r2 = run(4, resume=True)
    assert r2["step"] == 4  # continued from step 2, not from scratch


def test_early_stopping_backoff_and_restore(tmp_path):
    """Reference parity (nabu trainer retry loop): each validation
    without improvement restores the best checkpoint, backs off the LR
    by lr_backoff_factor, and training stops after num_tries."""
    import jax
    import numpy as np

    from nabu_tpu.config import Conf, ConfigFile
    from nabu_tpu.models.model import build_model
    from nabu_tpu.parallel import mesh as mesh_lib
    from nabu_tpu.training.checkpoints import CheckpointManager
    from nabu_tpu.training.trainer import Trainer

    cfg = ConfigFile({
        "encoder": Conf({"encoder": "dnn", "num_units": "8"}, "encoder"),
        "decoder": Conf({"decoder": "linear_ctc", "loss": "ctc"},
                        "decoder"),
    })
    model = build_model(cfg, 6, 4)
    tconf = Conf({
        "num_steps": "100",
        "valid_frequency": "1",
        "num_tries": "2",
        "lr_backoff_factor": "0.5",
        "log_frequency": "1",
        "learning_rate": "1e-2",
    }, "trainer")
    metrics = iter([1.0, 2.0, 3.0, 4.0, 5.0])  # worsens after the first

    mesh = mesh_lib.make_mesh(devices=jax.devices()[:1])
    expdir = str(tmp_path / "exp")
    trainer = Trainer(
        tconf, model, _make_loader(tmp_path / "d"), expdir,
        valid_fn=lambda params: next(metrics), mesh=mesh,
    )
    result = trainer.train(rng_seed=0)

    assert result["stopped_early"] is True
    assert result["best_metric"] == 1.0
    assert result["step"] == 3  # best at 1, two failed tries, stop

    ck = CheckpointManager(f"{expdir}/checkpoints")
    best = ck.restore("best", {"metric": np.float32(0),
                               "step": np.int64(0)})
    assert float(best["metric"]) == 1.0 and int(best["step"]) == 1
    latest = ck.restore("latest", {"lr_scale": np.float32(0),
                                   "tries": np.int64(0)})
    assert float(latest["lr_scale"]) == 0.25  # two backoffs of 0.5
    assert int(latest["tries"]) == 2


def test_backoff_warmup_suspends_early_stopping(tmp_path):
    """backoff_warmup_steps: non-improving validations inside the
    grace period neither count tries nor back off / restore (attention
    models plateau at high validation loss until alignment breaks
    through — an eager backoff loop restores a pre-alignment model),
    while best-tracking still runs. After the warmup the committed
    retry semantics resume unchanged."""
    import jax

    from nabu_tpu.config import Conf, ConfigFile
    from nabu_tpu.models.model import build_model
    from nabu_tpu.parallel import mesh as mesh_lib
    from nabu_tpu.training.trainer import Trainer

    cfg = ConfigFile({
        "encoder": Conf({"encoder": "dnn", "num_units": "8"}, "encoder"),
        "decoder": Conf({"decoder": "linear_ctc", "loss": "ctc"},
                        "decoder"),
    })
    tconf = Conf({
        "num_steps": "10",
        "valid_frequency": "1",
        "num_tries": "2",
        "lr_backoff_factor": "0.5",
        "backoff_warmup_steps": "6",
        "log_frequency": "1",
        "learning_rate": "1e-2",
    }, "trainer")
    # plateau through the warmup (steps 1-6 worsen after the first),
    # breakthrough at 7, worsening again at 8+
    metrics = iter([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 0.5, 7.0, 8.0])

    mesh = mesh_lib.make_mesh(devices=jax.devices()[:1])
    model = build_model(cfg, 6, 4)
    trainer = Trainer(
        tconf, model, _make_loader(tmp_path / "d"),
        str(tmp_path / "exp"),
        valid_fn=lambda params: next(metrics), mesh=mesh,
    )
    result = trainer.train(rng_seed=0)

    # without the warmup this run would have stopped at step 3 with
    # best 1.0 (see test_early_stopping_backoff_and_restore); instead
    # it survives the plateau, records the step-7 breakthrough, and
    # only then spends its two tries
    assert result["stopped_early"] is True
    assert result["best_metric"] == 0.5
    assert result["step"] == 9  # best at 7, two failed tries, stop


def test_aggregation_spans_epoch_boundary(tmp_path):
    """numbatches_to_aggregate larger than an epoch: micro-batches
    accumulate across the epoch boundary and the optimizer still steps
    (the reference aggregated across whatever batches arrived)."""
    import jax

    from nabu_tpu.config import Conf, ConfigFile
    from nabu_tpu.models.model import build_model
    from nabu_tpu.parallel import mesh as mesh_lib
    from nabu_tpu.training.trainer import Trainer

    cfg = ConfigFile({
        "encoder": Conf({"encoder": "dnn", "num_units": "8"}, "encoder"),
        "decoder": Conf({"decoder": "linear_ctc", "loss": "ctc"},
                        "decoder"),
    })
    model = build_model(cfg, 6, 4)
    # loader: 8 utts / batch 4 = 2 batches per epoch; aggregate 4
    loader = _make_loader(tmp_path / "d")
    tconf = Conf({
        "num_steps": "2",
        "numbatches_to_aggregate": "4",
        "log_frequency": "1",
        "learning_rate": "1e-2",
    }, "trainer")
    mesh = mesh_lib.make_mesh(devices=jax.devices()[:1])
    trainer = Trainer(tconf, model, loader, str(tmp_path / "exp"),
                      mesh=mesh)
    result = trainer.train(rng_seed=0)
    # 2 optimizer steps = 8 micro-batches = 4 epochs of data
    assert result["step"] == 2


def test_resume_mid_epoch_with_aggregation_matches_uninterrupted(tmp_path):
    """Non-divisible num_batches/num_aggregate: resuming from a
    checkpoint must consume exactly the remaining micro-batch stream —
    final params equal an uninterrupted run's (regression for the
    resume fast-forward, which previously skipped or replayed data)."""
    import jax
    import numpy as np

    from nabu_tpu.config import Conf, ConfigFile
    from nabu_tpu.models.model import build_model
    from nabu_tpu.parallel import mesh as mesh_lib
    from nabu_tpu.training.trainer import Trainer

    cfg = ConfigFile({
        "encoder": Conf({"encoder": "dnn", "num_units": "8"}, "encoder"),
        "decoder": Conf({"decoder": "linear_ctc", "loss": "ctc"},
                        "decoder"),
    })
    # 12 utts / batch 4 = 3 batches per epoch, aggregate 2: steps do NOT
    # align with epochs (step 1 = batches 0,1; step 2 = batch 2 + epoch
    # 1's batch 0; ...)
    mesh = mesh_lib.make_mesh(devices=jax.devices()[:1])

    def run(name, stop_at, then_resume_to=None):
        loader = _make_loader(tmp_path / f"d_{name}", n=12)
        expdir = str(tmp_path / f"exp_{name}")

        def make(num_steps, resume):
            tconf = Conf({
                "num_steps": str(num_steps),
                "numbatches_to_aggregate": "2",
                "log_frequency": "1",
                "ckpt_frequency": "1",
                "learning_rate": "1e-2",
                "resume": str(resume).lower(),
            }, "trainer")
            model = build_model(cfg, 6, 4)
            return Trainer(tconf, model, loader, expdir, mesh=mesh)

        result = make(stop_at, resume=False).train(rng_seed=0)
        if then_resume_to is not None:
            result = make(then_resume_to, resume=True).train(rng_seed=0)
        return jax.device_get(result["params"])

    p_straight = run("straight", stop_at=4)
    p_resumed = run("resumed", stop_at=1, then_resume_to=4)
    for a, b in zip(jax.tree.leaves(p_straight), jax.tree.leaves(p_resumed)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def _train_ema(tmp_path, name, ema_decay, num_steps=3, valid_fn=None):
    import jax

    from nabu_tpu.config import Conf, ConfigFile
    from nabu_tpu.models.model import build_model
    from nabu_tpu.parallel import mesh as mesh_lib
    from nabu_tpu.training.trainer import Trainer

    cfg = ConfigFile({
        "encoder": Conf({"encoder": "dnn", "num_units": "8"}, "encoder"),
        "decoder": Conf({"decoder": "linear_ctc", "loss": "ctc"},
                        "decoder"),
    })
    model = build_model(cfg, 6, 4)
    tconf = Conf({
        "num_steps": str(num_steps),
        "log_frequency": "1",
        "learning_rate": "1e-2",
        "ema_decay": str(ema_decay),
        "valid_frequency": "1" if valid_fn else "0",
        # constant valid metrics would otherwise trigger restore-best
        "early_stopping": "false",
    }, "trainer")
    loader = _make_loader(tmp_path / name)
    mesh = mesh_lib.make_mesh(devices=jax.devices()[:1])
    trainer = Trainer(
        tconf, model, loader, str(tmp_path / f"exp_{name}"),
        mesh=mesh, valid_fn=valid_fn,
    )
    result = trainer.train(rng_seed=0)
    return model, trainer, result


class TestEMA:
    def test_decay_one_keeps_initial_weights(self, tmp_path):
        """ema_decay = 1.0: validation always sees the INITIAL params."""
        import jax

        seen = []
        model, trainer, _ = _train_ema(
            tmp_path, "ema1", 1.0,
            valid_fn=lambda p: seen.append(jax.device_get(p)) or 1.0,
        )
        init = model.init(jax.random.PRNGKey(0))
        for leaf_a, leaf_b in zip(
            jax.tree.leaves(seen[0]), jax.tree.leaves(init)
        ):
            np.testing.assert_allclose(
                np.asarray(leaf_a), np.asarray(leaf_b), atol=1e-7
            )

    def test_decay_zero_tracks_raw_params(self, tmp_path):
        """ema_decay -> 0 means EMA == current params each step, so the
        validated weights equal the final trained weights."""
        import jax

        seen = []
        model, trainer, result = _train_ema(
            tmp_path, "ema0", 1e-9,
            valid_fn=lambda p: seen.append(jax.device_get(p)) or 1.0,
        )
        final = jax.device_get(result["params"])
        for leaf_a, leaf_b in zip(
            jax.tree.leaves(seen[-1]), jax.tree.leaves(final)
        ):
            np.testing.assert_allclose(
                np.asarray(leaf_a), np.asarray(leaf_b),
                rtol=1e-5, atol=1e-6,
            )

    def test_best_checkpoint_holds_ema_and_raw(self, tmp_path):
        import jax

        model, trainer, _ = _train_ema(
            tmp_path, "emab", 0.5, valid_fn=lambda p: 1.0,
        )
        template = {
            "params": model.init(jax.random.PRNGKey(0)),
            "raw_params": model.init(jax.random.PRNGKey(0)),
            "opt_state": trainer.tx.init(
                model.init(jax.random.PRNGKey(0))
            ),
            "step": np.int64(0),
            "metric": np.float32(0),
        }
        best = trainer.ckpt.restore("best", template)
        # EMA (validated) params differ from the raw training params
        diffs = [
            float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
            for a, b in zip(
                jax.tree.leaves(best["params"]),
                jax.tree.leaves(best["raw_params"]),
            )
        ]
        assert max(diffs) > 1e-6

    def test_resume_roundtrips_ema_state(self, tmp_path):
        import jax

        model, trainer, _ = _train_ema(tmp_path, "emar", 0.9)
        state = trainer.init_state(0)
        state = trainer.ckpt.restore("latest", state)
        assert "ema_params" in state
        # EMA after 3 steps differs from both init and raw params
        init = model.init(jax.random.PRNGKey(0))
        d_init = max(
            float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
            for a, b in zip(
                jax.tree.leaves(state["ema_params"]),
                jax.tree.leaves(init),
            )
        )
        d_raw = max(
            float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
            for a, b in zip(
                jax.tree.leaves(state["ema_params"]),
                jax.tree.leaves(state["params"]),
            )
        )
        assert d_init > 1e-7 and d_raw > 1e-7


class TestSortagrad:
    def _varlen_loader(self, tmp_path, n=12):
        from nabu_tpu.data.pipeline import BucketedLoader
        from nabu_tpu.data.storage import ShardWriter, ShardedDataset

        rng = np.random.default_rng(11)
        fw = ShardWriter(str(tmp_path / "f"))
        tw = ShardWriter(str(tmp_path / "t"))
        # write in a scrambled length order so sortedness is earned
        lens = rng.permutation(np.arange(5, 5 + n))
        for i, L in enumerate(lens):
            fw.write(f"u{i}", rng.standard_normal((int(L), 6)).astype(np.float32))
            tw.write(f"u{i}", rng.integers(0, 4, 3).astype(np.int32))
        fw.close()
        tw.close({"num_labels": 4})
        return BucketedLoader(
            ShardedDataset(str(tmp_path / "f")),
            ShardedDataset(str(tmp_path / "t")),
            batch_size=3,
            num_buckets=3,
        )

    def test_unshuffled_epoch_is_length_ascending(self, tmp_path):
        """The sortagrad curriculum = epoch 0 unshuffled: batches come
        out in nondecreasing utterance-length order."""
        loader = self._varlen_loader(tmp_path)
        prev = 0
        for batch in loader.epoch(0, shuffle=False):
            valid = np.asarray(batch.example_mask).astype(bool)
            longest = int(np.asarray(batch.feature_lengths)[valid].max())
            assert longest >= prev
            prev = longest

    def test_trainer_flag_trains(self, tmp_path):
        import jax

        from nabu_tpu.config import Conf, ConfigFile
        from nabu_tpu.models.model import build_model
        from nabu_tpu.parallel import mesh as mesh_lib
        from nabu_tpu.training.trainer import Trainer

        cfg = ConfigFile({
            "encoder": Conf({"encoder": "dnn", "num_units": "8"},
                            "encoder"),
            "decoder": Conf({"decoder": "linear_ctc", "loss": "ctc"},
                            "decoder"),
        })
        model = build_model(cfg, 6, 4)
        tconf = Conf({
            "num_steps": "3", "log_frequency": "1",
            "learning_rate": "1e-2", "sortagrad": "true",
        }, "trainer")
        loader = self._varlen_loader(tmp_path / "data")
        mesh = mesh_lib.make_mesh(devices=jax.devices()[:1])
        trainer = Trainer(
            tconf, model, loader, str(tmp_path / "exp"), mesh=mesh
        )
        assert trainer.sortagrad
        result = trainer.train(rng_seed=0)
        assert result["step"] == 3
