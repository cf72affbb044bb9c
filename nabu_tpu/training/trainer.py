"""Trainer: jitted data-parallel train step, LR schedule, validation-
driven early stopping with restore-best + LR backoff, checkpointing.

Capability parity with nabu/neuralnetworks/trainers/trainer.py: Adam (or
SGD/AdamW) with gradient clipping, exponential LR decay, periodic
validation, early stopping with ``num_tries`` retries that restore the
best checkpoint and back off the learning rate (the reference's
retry/backoff loop is part of parity — SURVEY.md §2 trainer row),
``resume`` from expdir and warm-start from a pretrained model.

TPU-first: one jitted train step per bucket shape; batches are placed
with a ``data``-axis NamedSharding and params with GSPMD partition
specs, so the same step function runs single-chip or across a pod slice
with psum-over-ICI gradient reduction inserted by XLA.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nabu_tpu.config import Conf
from nabu_tpu.data.pipeline import BucketedLoader, batch_to_arrays
from nabu_tpu.ops.losses import make_loss_computer
from nabu_tpu.parallel import mesh as mesh_lib
from nabu_tpu.registry import TRAINERS
from nabu_tpu.training.checkpoints import CheckpointManager, warm_start
from nabu_tpu.training.metrics import MetricWriter


def build_optimizer(conf: Conf) -> optax.GradientTransformation:
    """Gradient transformation producing (-lr_t * direction) updates.

    The runtime LR backoff multiplier is applied separately in the train
    step so it can change without re-jitting.
    """
    clip = conf.getfloat("clip_grad_norm", 5.0)
    base_lr = conf.getfloat("learning_rate", 1e-3)
    decay = conf.getfloat("learning_rate_decay", 1.0)
    decay_steps = conf.getint("decay_steps", 1000)
    warmup = conf.getint("warmup_steps", 0)
    name = conf.get("optimizer", "adam").lower()

    def schedule(step):
        lr = base_lr * (decay ** (step / decay_steps))
        if warmup > 0:
            lr = lr * jnp.minimum(1.0, (step + 1) / warmup)
        return -lr

    if name == "adam":
        direction = optax.scale_by_adam()
    elif name == "adamw":
        direction = optax.chain(
            optax.scale_by_adam(),
            optax.add_decayed_weights(conf.getfloat("weight_decay", 1e-2)),
        )
    elif name == "sgd":
        mom = conf.getfloat("momentum", 0.0)
        direction = (
            optax.trace(decay=mom) if mom else optax.identity()
        )
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    parts = []
    if clip > 0:
        parts.append(optax.clip_by_global_norm(clip))
    parts.append(direction)
    parts.append(optax.scale_by_schedule(schedule))
    return optax.chain(*parts)


@TRAINERS.register("standard")
class Trainer:
    """Drives training of a Model over a BucketedLoader."""

    def __init__(
        self,
        conf: Conf,
        model,
        loader: BucketedLoader,
        expdir: str,
        valid_fn: Optional[Callable] = None,
        mesh=None,
        loss_fn: Optional[Callable] = None,
    ):
        self.conf = conf
        self.model = model
        self.loader = loader
        self.expdir = expdir
        self.valid_fn = valid_fn
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()

        # synchronous gradient aggregation over k consecutive batches
        # before one optimizer step (the reference's SyncReplicasOptimizer
        # numbatches_to_aggregate in nabu/neuralnetworks/trainers/
        # trainer.py). Here it is plain on-device gradient accumulation:
        # the data-parallel psum is already synchronous, so aggregation
        # only scales the effective batch.
        self.num_aggregate = max(1, conf.getint("numbatches_to_aggregate", 1))

        if loader.num_batches() == 0:
            raise ValueError(
                "loader yields zero batches (dataset smaller than "
                "num_hosts * batch_size in every bucket?) — training "
                "would spin forever"
            )
        self.num_steps = conf.getint("num_steps", 0)
        if not self.num_steps:
            # aggregation may span epoch boundaries, so num_epochs means
            # epochs of DATA: total micro-batches / batches-per-step
            # (floor leaves at most one partial step of data unused)
            epochs = conf.getint("num_epochs", 10)
            self.num_steps = max(
                epochs * loader.num_batches() // self.num_aggregate, 1
            )
        self.valid_frequency = conf.getint("valid_frequency", 0)
        self.log_frequency = conf.getint("log_frequency", 10)
        self.ckpt_frequency = conf.getint("ckpt_frequency", 0)
        self.num_tries = conf.getint("num_tries", 3)
        self.lr_backoff = conf.getfloat("lr_backoff_factor", 0.5)
        self.early_stopping = conf.getbool("early_stopping", True)
        # grace period for the restore-best/backoff/early-stop
        # machinery: validations before this step still track+save the
        # best model, but a non-improvement neither restores best, nor
        # backs off the LR, nor counts a try. Attention models plateau
        # at high validation loss until alignment breaks through
        # (observed ~5,000 steps on the hard proxy corpus); without a
        # grace period the backoff loop collapses the LR during the
        # plateau and early stopping restores a pre-alignment model
        # moments before the breakthrough.
        self.backoff_warmup = conf.getint("backoff_warmup_steps", 0)
        # sortagrad (ESPnet-style curriculum): present the FIRST epoch
        # in ascending utterance-length order — short, easy utterances
        # stabilize early CTC/attention alignment — then shuffle as
        # usual. The loader's within-bucket order is already
        # length-ascending (indices derive from a global length sort),
        # so the curriculum is exactly `shuffle=False` on epoch 0.
        self.sortagrad = conf.getbool("sortagrad", False)
        self.frame_shift = conf.getfloat("frame_shift", 0.01)
        # aux subsystems (SURVEY.md §5): profiling + NaN guard. The
        # reference had TensorBoard summaries only; here a config flag
        # captures a jax.profiler trace of steps [profile_start,
        # profile_stop) into expdir/profile (viewable in Perfetto /
        # TensorBoard), and check_numerics aborts on non-finite loss.
        self.profile_start = conf.getint("profile_start", 0)
        self.profile_stop = conf.getint("profile_stop", 0)
        self.check_numerics = conf.getbool("check_numerics", True)
        # ema_decay > 0 keeps an exponential moving average of the
        # weights (Polyak averaging — the standard ASR eval trick):
        # validation and the "best" checkpoint use the EMA params, so
        # run test/decode automatically score the averaged model; the
        # raw training params ride along for restore-best/backoff
        self.ema_decay = conf.getfloat("ema_decay", 0.0)

        self.tx = build_optimizer(conf)
        if loss_fn is None:
            if conf.getbool("mwer", False):
                # MWER sequence training (beyond parity): N-best decode
                # + expected-token-error loss — see ops/mwer.py
                from nabu_tpu.ops.mwer import make_mwer_loss_computer

                loss_fn = make_mwer_loss_computer(model, conf)
            else:
                loss_fn = make_loss_computer(model)
        self.loss_fn = loss_fn
        # multi-host: only the chief writes metrics/checkpoints (the
        # reference's is_chief=task_index==0 MonitoredTrainingSession
        # contract); every host runs the (host-sharded, collective)
        # validation, then the chief's metric is broadcast so stop/
        # backoff decisions are made exactly once (see _train)
        self.is_chief = jax.process_index() == 0
        # async_checkpoint = true backgrounds the rolling "latest" disk
        # write so the step loop never stalls on IO (finalized before
        # any restore/exists and at the end of training)
        self.ckpt = CheckpointManager(
            f"{expdir}/checkpoints",
            use_async=conf.getbool("async_checkpoint", False),
        )
        self.writer = (
            MetricWriter(f"{expdir}/logs") if self.is_chief else None
        )

        self._train_step = jax.jit(self._step_impl, donate_argnums=(0, 1))
        # aggregation path (num_aggregate > 1): grads-only step per
        # micro-batch (one compile per bucket shape, like _train_step),
        # one jitted on-device (grads, metrics) tree accumulation, and
        # one shape-independent apply
        self._grad_step = jax.jit(self._grad_impl)
        self._accum_add = jax.jit(
            lambda acc, new: jax.tree.map(jnp.add, acc, new),
            donate_argnums=(0,),
        )
        self._apply_step = jax.jit(self._apply_impl, donate_argnums=(0, 1, 2))
        d = self.ema_decay
        self._ema_step = jax.jit(
            lambda ema, p: jax.tree.map(
                lambda e, q: d * e + (1.0 - d) * q, ema, p
            ),
            donate_argnums=(0,),
        )

    # -- one optimizer step ----------------------------------------------
    def _apply_grads(self, params, opt_state, grads, lr_scale):
        """Shared optimizer tail: update -> lr_scale -> apply.

        The single place that defines apply semantics, so plain and
        aggregated (numbatches_to_aggregate > 1) steps cannot drift."""
        updates, opt_state = self.tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, optax.global_norm(grads)

    def _step_impl(self, params, opt_state, batch, rng, lr_scale):
        (loss, metrics), grads = jax.value_and_grad(
            self.loss_fn, has_aux=True
        )(params, batch, rng, True)
        params, opt_state, gnorm = self._apply_grads(
            params, opt_state, grads, lr_scale
        )
        metrics["grad_norm"] = gnorm
        return params, opt_state, metrics

    def _grad_impl(self, params, batch, rng):
        (_, metrics), grads = jax.value_and_grad(
            self.loss_fn, has_aux=True
        )(params, batch, rng, True)
        return grads, metrics

    def _apply_impl(self, params, opt_state, grads, lr_scale):
        # average (not sum) over the aggregated batches — same semantics
        # as the reference's synchronous replica aggregation
        grads = jax.tree.map(lambda g: g / self.num_aggregate, grads)
        return self._apply_grads(params, opt_state, grads, lr_scale)

    # -- state helpers ---------------------------------------------------
    def init_state(self, rng_seed: int = 0) -> Dict:
        params = self.model.init(jax.random.PRNGKey(rng_seed))
        pretrained = self.conf.get("pretrained_dir")
        if pretrained:
            params = warm_start(
                params,
                pretrained,
                self.conf.get("pretrained_subtree"),
            )
        opt_state = self.tx.init(params)
        state = {
            "params": params,
            "opt_state": opt_state,
            "step": np.int64(0),
            "lr_scale": np.float32(1.0),
            "best_metric": np.float32(np.inf),
            "tries": np.int64(0),
        }
        if self.ema_decay > 0.0:
            state["ema_params"] = jax.tree.map(np.copy, params)
        return state

    # -- main loop -------------------------------------------------------
    def train(self, rng_seed: int = 0) -> Dict:
        # install the mesh for components that read it at trace time
        # (pipeline-parallel / sequence-parallel encoder paths)
        with mesh_lib.use_mesh(self.mesh):
            return self._train(rng_seed)

    def _train(self, rng_seed: int = 0) -> Dict:
        state = self.init_state(rng_seed)
        if self.conf.getbool("resume", False) and self.ckpt.exists("latest"):
            state = self.ckpt.restore("latest", state)

        specs = mesh_lib.param_partition_specs(
            state["params"],
            model_parallel_size=self.mesh.shape[mesh_lib.MODEL_AXIS],
            expert_parallel_size=self.mesh.shape.get(
                mesh_lib.EXPERT_AXIS, 1
            ),
        )
        params = mesh_lib.shard_params(self.mesh, state["params"], specs)
        # optimizer moments mirror the params tree (same leaf names), so
        # the same path-based rules shard them consistently
        opt_specs = mesh_lib.param_partition_specs(
            state["opt_state"],
            model_parallel_size=self.mesh.shape[mesh_lib.MODEL_AXIS],
            expert_parallel_size=self.mesh.shape.get(
                mesh_lib.EXPERT_AXIS, 1
            ),
        )
        opt_state = mesh_lib.shard_params(
            self.mesh, state["opt_state"], opt_specs
        )
        ema = (
            mesh_lib.shard_params(self.mesh, state["ema_params"], specs)
            if self.ema_decay > 0.0
            else None
        )
        step = int(state["step"])
        lr_scale = float(state["lr_scale"])
        best_metric = float(state["best_metric"])
        tries = int(state["tries"])
        base_rng = jax.random.PRNGKey(1234 + rng_seed)

        # resume fast-forward in MICRO-batches: the step loop consumes a
        # continuous batch stream (aggregation may span epochs), so the
        # exact position after `step` optimizer steps is step*k batches
        num_batches = max(self.loader.num_batches(), 1)
        micro_total = step * self.num_aggregate
        epoch = micro_total // num_batches
        skip = micro_total % num_batches
        accum = None  # pending gradient sum (num_aggregate > 1)
        tracing = False  # a jax.profiler trace window is open
        msum = None  # pending metric sums
        micro = 0  # micro-batches accumulated so far
        stop = False
        t_last = time.time()
        frames_since_log = 0

        # startup + first-step progress (stderr): the first train step
        # includes jit compilation (20-40 s per bucket through a remote
        # compile service) — without these lines a hung backend is
        # indistinguishable from a slow compile
        n_params = sum(
            int(np.prod(x.shape)) for x in jax.tree.leaves(params)
        )
        print(
            f"[trainer] start: platform={jax.devices()[0].platform} "
            f"devices={len(jax.devices())} params={n_params:,} "
            f"step={step}/{self.num_steps} batches/epoch={num_batches}",
            flush=True,
        )
        t_first = time.time()
        first_logged = False

        from nabu_tpu.data.pipeline import prefetch

        # ship features to the device in the model's compute dtype:
        # the encoder casts them on arrival anyway (model._cast_in),
        # so a bf16 model sees bit-identical values while the
        # host->device transfer halves. On the tunneled dev TPU this
        # matters doubly: the axon client LEAKS the staging buffer of
        # every device_put (~1x the transferred bytes per step,
        # measured; a 20k-step B=64 run was OOM-killed at 127 GB host
        # RSS), so halving the bytes doubles the step budget a
        # process survives.
        feat_dt = (
            self.model.compute_dtype
            if getattr(self.model, "compute_dtype", None) is not None
            and jnp.dtype(self.model.compute_dtype) != jnp.float32
            else None
        )

        def device_stream(epoch_idx: int, skip_n: int):
            """Sharded, device-resident batches; the (async) transfer of
            batch N+1 runs in the prefetch thread while the device
            executes step N. ``skip_n`` skips schedule entries before
            assembly (free resume fast-forward)."""
            for batch in self.loader.epoch(
                epoch_idx,
                shuffle=not (self.sortagrad and epoch_idx == 0),
                skip=skip_n,
            ):
                host = batch_to_arrays(batch)
                if feat_dt is not None:
                    host["features"] = host["features"].astype(feat_dt)
                arrays = mesh_lib.shard_batch(self.mesh, host)
                yield arrays, batch.num_audio_frames

        while not stop and step < self.num_steps:
            for arrays, num_audio_frames in prefetch(
                device_stream(epoch, skip)
            ):
                if step >= self.num_steps:
                    break
                if (
                    self.profile_stop
                    and step == self.profile_start
                    and micro == 0
                    and not tracing
                ):
                    jax.profiler.start_trace(f"{self.expdir}/profile")
                    tracing = True
                frames_since_log += num_audio_frames
                if self.num_aggregate == 1:
                    rng = jax.random.fold_in(base_rng, step)
                    params, opt_state, metrics = self._train_step(
                        params, opt_state, arrays, rng,
                        jnp.float32(lr_scale),
                    )
                else:
                    rng = jax.random.fold_in(
                        base_rng, step * self.num_aggregate + micro
                    )
                    grads, gmetrics = self._grad_step(params, arrays, rng)
                    if accum is None:
                        accum, msum = grads, gmetrics
                    else:
                        # one jitted call for the whole (grads, metrics)
                        # tree: per-leaf jnp dispatch costs ms each on
                        # high-latency links (CLAUDE.md)
                        accum, msum = self._accum_add(
                            (accum, msum), (grads, gmetrics)
                        )
                    micro += 1
                    if micro < self.num_aggregate:
                        continue
                    params, opt_state, gnorm = self._apply_step(
                        params, opt_state, accum, jnp.float32(lr_scale)
                    )
                    metrics = jax.tree.map(
                        lambda v: v / self.num_aggregate, msum
                    )
                    metrics["grad_norm"] = gnorm
                    accum, msum, micro = None, None, 0
                if ema is not None:
                    ema = self._ema_step(ema, params)
                step += 1
                if not first_logged:
                    # force completion: a scalar fetch blocks until the
                    # step really ran (block_until_ready does not block
                    # on all remote backends — CLAUDE.md)
                    float(jax.device_get(metrics["loss"]))
                    print(
                        f"[trainer] first step done in "
                        f"{time.time() - t_first:.1f}s (includes jit "
                        f"compile)",
                        flush=True,
                    )
                    first_logged = True
                if tracing and step >= self.profile_stop:
                    jax.profiler.stop_trace()
                    tracing = False

                if step % self.log_frequency == 0 or step == self.num_steps:
                    metrics = jax.device_get(metrics)
                    if self.check_numerics and not np.isfinite(
                        metrics["loss"]
                    ):
                        self._save_latest(
                            params, opt_state, step, lr_scale,
                            best_metric, tries, ema,
                        )
                        self.ckpt.wait_until_finished()
                        raise FloatingPointError(
                            f"non-finite loss {metrics['loss']} at step "
                            f"{step}; state saved to {self.expdir}"
                        )
                    now = time.time()
                    audio_s = frames_since_log * self.frame_shift
                    scalars = {k: float(v) for k, v in metrics.items()}
                    scalars["lr_scale"] = lr_scale
                    scalars["audio_s_per_s"] = audio_s / max(
                        now - t_last, 1e-9
                    )
                    if self.writer:
                        self.writer.write(step, scalars, prefix="train/")
                    t_last = now
                    frames_since_log = 0

                if self.ckpt_frequency and step % self.ckpt_frequency == 0:
                    self._save_latest(
                        params, opt_state, step, lr_scale, best_metric,
                        tries, ema,
                    )

                if (
                    self.valid_frequency
                    and self.valid_fn is not None
                    and step % self.valid_frequency == 0
                ):
                    # validate the EMA weights when averaging is on —
                    # "best" then holds the averaged model that test/
                    # decode load, with the raw weights alongside for
                    # restore-best backoff
                    valid_params = mesh_lib.fetch_to_host(
                        ema if ema is not None else params
                    )
                    metric = float(self.valid_fn(valid_params))
                    if jax.process_count() > 1:
                        # single-brained early stopping: every stop/
                        # restore/backoff decision below derives from
                        # the CHIEF's metric, broadcast to all hosts.
                        # Without this, a one-ULP cross-host difference
                        # in a locally computed metric could land on
                        # opposite sides of best_metric and desynchronize
                        # the control flow (one host restores best /
                        # breaks the loop, the others don't -> the next
                        # collective deadlocks). The reference's
                        # chief-driven MonitoredTrainingSession had this
                        # property structurally.
                        from jax.experimental import multihost_utils

                        metric = float(
                            multihost_utils.broadcast_one_to_all(
                                np.float32(metric)
                            )
                        )
                    if self.writer:
                        self.writer.write(
                            step, {"metric": metric}, prefix="valid/"
                        )
                    if metric < best_metric:
                        best_metric = metric
                        tries = 0
                        host_opt = mesh_lib.fetch_to_host(opt_state)
                        best_state = {
                            "params": valid_params,
                            "opt_state": host_opt,
                            "step": np.int64(step),
                            "metric": np.float32(metric),
                        }
                        if ema is not None:
                            best_state["raw_params"] = (
                                mesh_lib.fetch_to_host(params)
                            )
                        self.ckpt.save_best(best_state)
                    elif self.early_stopping and step > self.backoff_warmup:
                        tries += 1
                        if self.ckpt.exists("best"):
                            # the live (possibly sharded, multi-host)
                            # arrays serve as the restore TEMPLATE —
                            # orbax reads shape/dtype only, so no
                            # device_get of non-addressable globals
                            template = {
                                "params": params,
                                "opt_state": opt_state,
                                "step": np.int64(0),
                                "metric": np.float32(0),
                            }
                            if ema is not None:
                                template["raw_params"] = params
                            best = self.ckpt.restore("best", template)
                            raw = best.get("raw_params", best["params"])
                            params = mesh_lib.shard_params(
                                self.mesh, raw, specs
                            )
                            opt_state = mesh_lib.shard_params(
                                self.mesh, best["opt_state"], opt_specs
                            )
                            if ema is not None:
                                ema = mesh_lib.shard_params(
                                    self.mesh, best["params"], specs
                                )
                        lr_scale *= self.lr_backoff
                        if self.writer:
                            self.writer.write(
                                step,
                                {"tries": tries, "lr_scale": lr_scale},
                                prefix="early_stop/",
                            )
                        if tries >= self.num_tries:
                            stop = True
                            break
            epoch += 1
            skip = 0  # resume fast-forward applies to the first epoch only

        if tracing:
            # training ended inside the profile window (early stop /
            # num_steps): finalize so the trace is not lost
            jax.profiler.stop_trace()
        self._save_latest(
            params, opt_state, step, lr_scale, best_metric, tries, ema
        )
        if not self.ckpt.exists("best"):
            # no "best" can only mean validation never ran (no valid_fn,
            # valid_frequency 0, or num_steps < valid_frequency — the
            # first validation always beats the initial inf): the final
            # model (EMA when averaging) doubles as best so test/decode
            # have something sensible to load
            host_params = mesh_lib.fetch_to_host(
                ema if ema is not None else params
            )
            host_opt = mesh_lib.fetch_to_host(opt_state)
            best_state = {
                "params": host_params,
                "opt_state": host_opt,
                "step": np.int64(step),
                "metric": np.float32(np.inf),
            }
            if ema is not None:
                best_state["raw_params"] = mesh_lib.fetch_to_host(params)
            self.ckpt.save_best(best_state)
        self.ckpt.wait_until_finished()
        if self.writer:
            self.writer.close()
        return {
            "params": params,
            "step": step,
            "best_metric": best_metric,
            "stopped_early": stop,
        }

    def _save_latest(self, params, opt_state, step, lr_scale, best, tries,
                     ema=None):
        # both the fetch and the orbax save are collective: every host
        # participates, orbax writes from the primary
        host_params = mesh_lib.fetch_to_host(params)
        host_opt = mesh_lib.fetch_to_host(opt_state)
        state = {
            "params": host_params,
            "opt_state": host_opt,
            "step": np.int64(step),
            "lr_scale": np.float32(lr_scale),
            "best_metric": np.float32(best),
            "tries": np.int64(tries),
        }
        if ema is not None:
            state["ema_params"] = mesh_lib.fetch_to_host(ema)
        self.ckpt.save_latest(state)


def build_trainer(conf: Conf, *args, **kwargs) -> Trainer:
    """Factory by conf['trainer'] (reference: trainer_factory)."""
    return TRAINERS.build(conf.get("trainer", "standard"), conf, *args, **kwargs)
