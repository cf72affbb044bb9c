"""Encoders: DBLSTM, pyramidal Listener, DNN.

Capability parity with nabu/neuralnetworks/models/ed_encoders/
(dblstm.py, listener.py, dnn.py + ed_encoder.py base/factory). Each
encoder maps ``(features [B, T, F], lengths) -> (encoded [B, T', D],
lengths')`` and is selected by the ``[encoder]`` config section.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from nabu_tpu.config import Conf
from nabu_tpu.models import core
from nabu_tpu.registry import ENCODERS


def _maybe_remat(remat: bool, impl: str):
    """Per-layer BLSTM apply, optionally rematerialized: with
    ``remat = true`` in the encoder section, layer activations are
    recomputed in the backward pass instead of stored — trading FLOPs
    for HBM (deep encoders on long utterances)."""
    import functools

    fn = functools.partial(core.blstm_apply, impl=impl)
    if remat:
        return jax.checkpoint(fn)
    return fn


class Encoder:
    """Base encoder: hyperparams from an [encoder] config section."""

    def __init__(self, conf: Conf, input_dim: int):
        self.conf = conf
        self.input_dim = input_dim
        self.output_dim: int = 0  # set by subclasses

    def init(self, key) -> dict:
        raise NotImplementedError

    def apply(
        self,
        params: dict,
        features: jnp.ndarray,
        lengths: jnp.ndarray,
        train: bool = False,
        rng=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        raise NotImplementedError


@ENCODERS.register("dblstm")
class DBLSTM(Encoder):
    """Deep bidirectional LSTM, no subsampling (the CTC workhorse;
    reference: ed_encoders/dblstm.py).

    ``bidirectional = false`` builds a forward-only stack — the
    streaming-capable variant (no lookahead): it additionally exposes
    ``stream_init``/``stream_step`` so audio can be encoded chunk by
    chunk with the LSTM carries threaded through, numerically equal to
    one offline pass (decoding/streaming.py drives this, paired with
    the RNN-T head)."""

    def __init__(self, conf: Conf, input_dim: int):
        super().__init__(conf, input_dim)
        self.num_layers = conf.getint("num_layers", 2)
        self.num_units = conf.getint("num_units", 128)
        self.dropout = conf.getfloat("dropout", 0.0)
        self.bidirectional = conf.getbool("bidirectional", True)
        # the fused Pallas kernel is dual-direction; the forward-only
        # stack always uses the scan cell
        self.impl = (
            "pallas"
            if conf.getbool("use_pallas", False) and self.bidirectional
            else "scan"
        )
        self.remat = conf.getbool("remat", False)
        self.layer_norm = conf.getbool("layer_norm", False)
        self.output_dim = (2 if self.bidirectional else 1) * self.num_units

    def init(self, key) -> dict:
        params = {}
        in_dim = self.input_dim
        for i, k in enumerate(jax.random.split(key, self.num_layers)):
            if self.bidirectional:
                params[f"layer_{i}"] = core.blstm_init(
                    k, in_dim, self.num_units, self.layer_norm
                )
            else:
                params[f"layer_{i}"] = core.lstm_init(
                    k, in_dim, self.num_units, self.layer_norm
                )
            in_dim = self.output_dim
        return params

    def apply(self, params, features, lengths, train=False, rng=None):
        if self.bidirectional:
            layer_fn = _maybe_remat(self.remat, self.impl)
        else:
            layer_fn = core.lstm_scan
            if self.remat:
                layer_fn = jax.checkpoint(layer_fn)
        x = features
        for i in range(self.num_layers):
            x = layer_fn(params[f"layer_{i}"], x, lengths)
            if train and self.dropout > 0 and rng is not None:
                rng, sub = jax.random.split(rng)
                x = core.dropout(sub, x, self.dropout, train)
        return x, lengths

    # -- streaming (forward-only stacks) ----------------------------------
    def stream_init(self, batch: int, dtype=jnp.float32):
        """Per-layer (h, c) carries for a chunked encode."""
        if self.bidirectional:
            raise ValueError("streaming needs bidirectional = false")
        return [
            (
                jnp.zeros((batch, self.num_units), dtype),
                jnp.zeros((batch, self.num_units), dtype),
            )
            for _ in range(self.num_layers)
        ]

    def stream_step(self, params, chunk, lengths, state):
        """Encode one chunk: ([B, C, F], valid lengths, carries) ->
        ([B, C, D], carries). Frames past ``lengths`` output zeros and
        leave the carries untouched."""
        if self.bidirectional:
            raise ValueError("streaming needs bidirectional = false")
        x = chunk
        new_state = []
        for i in range(self.num_layers):
            x, carry = core.lstm_scan(
                params[f"layer_{i}"], x, lengths,
                init_carry=state[i], return_carry=True,
            )
            new_state.append(carry)
        return x, new_state


@ENCODERS.register("listener")
class Listener(Encoder):
    """Pyramidal BLSTM stack — the LAS "Listen" encoder (reference:
    ed_encoders/listener.py). Each of the ``num_layers`` upper layers
    halves the time resolution with a pyramid stack."""

    def __init__(self, conf: Conf, input_dim: int):
        super().__init__(conf, input_dim)
        self.num_layers = conf.getint("num_layers", 3)
        self.num_units = conf.getint("num_units", 256)
        self.dropout = conf.getfloat("dropout", 0.0)
        self.impl = "pallas" if conf.getbool("use_pallas", False) else "scan"
        self.remat = conf.getbool("remat", False)
        self.layer_norm = conf.getbool("layer_norm", False)
        self.output_dim = 2 * self.num_units

    def init(self, key) -> dict:
        params = {}
        keys = jax.random.split(key, self.num_layers + 1)
        params["bottom"] = core.blstm_init(
            keys[0], self.input_dim, self.num_units, self.layer_norm
        )
        in_dim = 4 * self.num_units  # pyramid-stacked pairs of 2U outputs
        for i in range(self.num_layers):
            params[f"pyramid_{i}"] = core.blstm_init(
                keys[i + 1], in_dim, self.num_units, self.layer_norm
            )
        return params

    def apply(self, params, features, lengths, train=False, rng=None):
        def _dropout(x, rng):
            if train and self.dropout > 0 and rng is not None:
                rng, sub = jax.random.split(rng)
                return core.dropout(sub, x, self.dropout, train), rng
            return x, rng

        layer_fn = _maybe_remat(self.remat, self.impl)
        x = layer_fn(params["bottom"], features, lengths)
        x, rng = _dropout(x, rng)
        for i in range(self.num_layers):
            x, lengths = core.pyramid_stack(x, lengths)
            x = layer_fn(params[f"pyramid_{i}"], x, lengths)
            x, rng = _dropout(x, rng)
        return x, lengths


@ENCODERS.register("dnn")
class DNN(Encoder):
    """Per-frame feed-forward encoder (reference: ed_encoders/dnn.py)."""

    def __init__(self, conf: Conf, input_dim: int):
        super().__init__(conf, input_dim)
        self.num_layers = conf.getint("num_layers", 2)
        self.num_units = conf.getint("num_units", 256)
        self.dropout = conf.getfloat("dropout", 0.0)
        self.activation = conf.get("activation", "relu")
        self.output_dim = self.num_units

    def init(self, key) -> dict:
        params = {}
        in_dim = self.input_dim
        for i, k in enumerate(jax.random.split(key, self.num_layers)):
            params[f"layer_{i}"] = core.linear_init(k, in_dim, self.num_units)
            in_dim = self.num_units
        return params

    def apply(self, params, features, lengths, train=False, rng=None):
        act = getattr(jax.nn, self.activation)
        x = features
        for i in range(self.num_layers):
            x = act(core.linear_apply(params[f"layer_{i}"], x))
            if train and self.dropout > 0 and rng is not None:
                rng, sub = jax.random.split(rng)
                x = core.dropout(sub, x, self.dropout, train)
        return x, lengths


def _sinusoidal_pe(T: int, d: int, dtype) -> jnp.ndarray:
    """Standard sinusoidal position encoding [T, d]."""
    pos = jnp.arange(T, dtype=jnp.float32)[:, None]
    dim = jnp.arange(0, d, 2, dtype=jnp.float32)[None, :]
    angle = pos / jnp.power(10000.0, dim / d)
    pe = jnp.zeros((T, d), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angle))
    pe = pe.at[:, 1::2].set(jnp.cos(angle[:, : (d // 2)]))
    return pe.astype(dtype)


@ENCODERS.register("transformer")
class TransformerEncoder(Encoder):
    """Self-attention encoder (beyond reference parity — the reference
    predates transformers). TPU-first rationale: every op is a large
    batched matmul on the MXU with NO sequential dependency chain, so
    unlike the recurrence-bound BLSTM family its step time is compute-
    bound and scales with chip FLOPs, not with per-timestep latency.

    Config: ``num_layers`` (6), ``num_units`` (model dim, 256),
    ``num_heads`` (4), ``ffn_dim`` (4*num_units), ``dropout``,
    ``subsample`` (1|2|4|8: pyramid-stack factor applied before the
    blocks, reusing the Listener's time reduction), ``remat``
    (rematerialize each block in the backward pass), ``scan_layers``
    (run the homogeneous block stack as one ``lax.scan`` over stacked
    per-layer params: the block body is traced and compiled ONCE
    instead of ``num_layers`` times, shrinking the HLO and compile time
    roughly by the depth — numerics identical to the unrolled loop;
    param/checkpoint layout unchanged, the stack is formed in-graph).

    Pipeline parallelism (beyond parity): ``pipeline_stages = S`` (>1)
    shards the block stack S-ways over the mesh 'pipe' axis and streams
    ``pipeline_microbatches`` (default 2*S) microbatches through the
    stages with the GPipe ppermute schedule (parallel/pipeline.py);
    needs make_mesh(num_pipe=S) installed via parallel.mesh.use_mesh.

    Mixture-of-experts option (beyond parity): ``moe_experts = E`` (>0)
    replaces every block's dense FFN with E expert FFNs under
    **expert-choice routing** (each expert picks its top-C tokens,
    Zhou et al. 2022) — no auxiliary load-balancing loss is needed
    because every expert processes exactly C tokens by construction,
    and capacity/shapes are static, so the whole layer is three batched
    einsums + one gather/scatter: MXU-friendly and GSPMD-shardable over
    an ``expert`` mesh axis (see parallel/mesh.py EXPERT_AXIS).
    ``moe_capacity`` (default 2.0) is the average number of expert
    slots per token: C = ceil(moe_capacity * tokens / E).

    Pre-LN blocks, sinusoidal positions, length-masked softmax.
    """

    def __init__(self, conf: Conf, input_dim: int):
        super().__init__(conf, input_dim)
        self.num_layers = conf.getint("num_layers", 6)
        self.d = conf.getint("num_units", 256)
        self.num_heads = conf.getint("num_heads", 4)
        if self.d % self.num_heads:
            raise ValueError(
                f"num_units {self.d} not divisible by num_heads "
                f"{self.num_heads}"
            )
        self.ffn_dim = conf.getint("ffn_dim", 4 * self.d)
        self.dropout = conf.getfloat("dropout", 0.0)
        self.subsample = conf.getint("subsample", 1)
        if self.subsample not in (1, 2, 4, 8):
            raise ValueError("subsample must be 1, 2, 4 or 8")
        self.remat = conf.getbool("remat", False)
        self.scan_layers = conf.getbool("scan_layers", False)
        self.moe_experts = conf.getint("moe_experts", 0)
        self.moe_capacity = conf.getfloat("moe_capacity", 2.0)
        self.pipeline_stages = conf.getint("pipeline_stages", 0)
        self.pipeline_microbatches = conf.getint(
            "pipeline_microbatches", 0
        )
        if self.pipeline_stages > 1 and (
            self.num_layers % self.pipeline_stages
        ):
            raise ValueError(
                f"num_layers {self.num_layers} not divisible by "
                f"pipeline_stages {self.pipeline_stages}"
            )
        self.output_dim = self.d

    def init(self, key) -> dict:
        n_stack = self.subsample.bit_length() - 1
        in_dim = self.input_dim * self.subsample
        keys = jax.random.split(key, 1 + 5 * self.num_layers)
        params = {"in_proj": core.linear_init(keys[0], in_dim, self.d)}
        k = 1
        for i in range(self.num_layers):
            params[f"block_{i}"] = {
                "ln1_g": jnp.ones((self.d,)),
                "ln1_b": jnp.zeros((self.d,)),
                "wqkv": core.glorot(keys[k], (self.d, 3 * self.d)),
                "wo": core.linear_init(keys[k + 1], self.d, self.d),
                "ln2_g": jnp.ones((self.d,)),
                "ln2_b": jnp.zeros((self.d,)),
            }
            if self.moe_experts > 0:
                params[f"block_{i}"].update(self._moe_init(
                    keys[k + 2], keys[k + 3]
                ))
            else:
                params[f"block_{i}"].update({
                    "ffn1": core.linear_init(
                        keys[k + 2], self.d, self.ffn_dim
                    ),
                    "ffn2": core.linear_init(
                        keys[k + 3], self.ffn_dim, self.d
                    ),
                })
            k += 5
        params["ln_out_g"] = jnp.ones((self.d,))
        params["ln_out_b"] = jnp.zeros((self.d,))
        del n_stack
        return params

    def _moe_init(self, k1, k2) -> dict:
        """Router + expert-stacked FFN weights. Leaf names ``we1``/
        ``we2`` are the EXPERT_AXIS partition-rule hooks (mesh.py)."""
        E, d, f = self.moe_experts, self.d, self.ffn_dim
        return {
            "wg": core.glorot(jax.random.fold_in(k1, 1), (d, E)),
            "we1": core.glorot(k1, (E, d, f)),
            "be1": jnp.zeros((E, f), jnp.float32),
            "we2": core.glorot(k2, (E, f, d)),
            "be2": jnp.zeros((E, d), jnp.float32),
        }

    def _moe_ffn(self, p, y, valid):
        """Expert-choice MoE FFN on pre-normed y [B, T, d].

        Every expert takes its top-C tokens across the whole flattened
        batch (C static), computes a dense FFN on them in one batched
        einsum, and the weighted results scatter-add back to token
        positions. Unselected tokens pass through the residual only.
        Padded tokens get router weight 0 so experts prefer real frames
        (and contribute nothing even if slots outnumber real tokens).
        """
        B, T, d = y.shape
        E = self.moe_experts
        S = B * T
        C = min(S, -(-int(self.moe_capacity * S) // E))  # ceil, static
        yt = y.reshape(S, d)
        # router in f32; softmax over experts per token (expert-choice)
        logits = (yt @ p["wg"].astype(y.dtype)).astype(jnp.float32)
        scores = jax.nn.softmax(logits, axis=-1)
        scores = jnp.where(valid.reshape(S, 1), scores, 0.0)
        gate, idx = jax.lax.top_k(scores.T, C)  # [E, C] each
        xe = jnp.take(yt, idx, axis=0)  # [E, C, d]
        h = jax.nn.gelu(
            jnp.einsum("ecd,edf->ecf", xe, p["we1"].astype(y.dtype))
            + p["be1"].astype(y.dtype)[:, None, :]
        )
        out = (
            jnp.einsum("ecf,efd->ecd", h, p["we2"].astype(y.dtype))
            + p["be2"].astype(y.dtype)[:, None, :]
        )
        out = out * gate.astype(y.dtype)[..., None]
        combined = jnp.zeros((S, d), y.dtype).at[idx.reshape(-1)].add(
            out.reshape(-1, d)
        )
        return combined.reshape(B, T, d)

    def _mhsa(self, p, y, bias):
        """Length-masked multi-head self-attention on pre-normed y."""
        B, T, d = y.shape
        nh = self.num_heads
        hd = d // nh
        qkv = y @ p["wqkv"]  # [B, T, 3d]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k,
            preferred_element_type=jnp.float32,
        ) / jnp.sqrt(jnp.asarray(hd, jnp.float32))
        weights = jax.nn.softmax(scores + bias, axis=-1).astype(y.dtype)
        att = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        att = att.transpose(0, 2, 1, 3).reshape(B, T, d)
        return core.linear_apply(p["wo"], att)

    @staticmethod
    def _drop(x, rate, train, rng):
        if train and rate > 0 and rng is not None:
            _, sub = jax.random.split(rng)
            return core.dropout(sub, x, rate, train)
        return x

    def _block(self, p, x, bias, valid, rate, train, rng):
        r1, r2 = (
            jax.random.split(rng) if rng is not None else (None, None)
        )
        y = core.layer_norm(x, p["ln1_g"], p["ln1_b"])
        x = x + self._drop(self._mhsa(p, y, bias), rate, train, r1)
        y = core.layer_norm(x, p["ln2_g"], p["ln2_b"])
        if self.moe_experts > 0:
            y = self._moe_ffn(p, y, valid)
        else:
            y = jax.nn.gelu(y @ p["ffn1"]["w"] + p["ffn1"]["b"])
            y = core.linear_apply(p["ffn2"], y)
        return x + self._drop(y, rate, train, r2)

    @staticmethod
    def _seq_shard(x):
        """Pin [B, T, d] activations to (data, seq) sharding when the
        current mesh has a 'seq' axis (sequence parallelism): LN/FFN/
        residual work stays time-sharded; GSPMD all-gathers keys and
        values only where attention genuinely needs every frame."""
        from nabu_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.current_mesh()
        if mesh is not None and mesh_lib.SEQ_AXIS in mesh.shape:
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.lax.with_sharding_constraint(
                x,
                NamedSharding(
                    mesh, P(mesh_lib.DATA_AXIS, mesh_lib.SEQ_AXIS, None)
                ),
            )
        return x

    def apply(self, params, features, lengths, train=False, rng=None):
        x = features
        for _ in range(self.subsample.bit_length() - 1):
            x, lengths = core.pyramid_stack(x, lengths)
        B, T, _ = x.shape
        x = core.linear_apply(params["in_proj"], x)
        x = x + _sinusoidal_pe(T, self.d, x.dtype)[None]
        x = self._seq_shard(x)
        # [B, 1, 1, T] additive attention bias: -inf at padded keys
        valid = (
            jnp.arange(T, dtype=lengths.dtype)[None, :] < lengths[:, None]
        )
        bias = jnp.where(valid, 0.0, -1e9)[:, None, None, :].astype(
            jnp.float32
        )
        rate = self.dropout

        def block(p, x, bias, valid, sub, _rate=rate, _train=train):
            # rate/train closed over (static): they gate python-level
            # dropout branches and must not become tracers under remat
            return self._seq_shard(
                self._block(p, x, bias, valid, _rate, _train, sub)
            )

        if self.remat:
            block = jax.checkpoint(block)
        if self.pipeline_stages > 1:
            x = self._pipelined_blocks(params, x, bias, valid, rng, block)
        elif self.scan_layers:
            # one traced block, scanned over the stacked per-layer
            # params (formed in-graph so the stored layout stays
            # per-layer). bias/valid are loop-invariant closures.
            blocks = [
                params[f"block_{i}"] for i in range(self.num_layers)
            ]
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
            keys = (
                jax.random.split(rng, self.num_layers)
                if rng is not None
                else jnp.zeros((self.num_layers, 2), jnp.uint32)
            )
            has_rng = rng is not None

            def body(x, inp):
                p, sub = inp
                return block(p, x, bias, valid, sub if has_rng else None), None

            x, _ = jax.lax.scan(body, x, (stacked, keys))
        else:
            for i in range(self.num_layers):
                if rng is not None:
                    rng, sub = jax.random.split(rng)
                else:
                    sub = None
                with jax.named_scope(f"block_{i}"):
                    x = block(params[f"block_{i}"], x, bias, valid, sub)
        x = core.layer_norm(x, params["ln_out_g"], params["ln_out_b"])
        # zero padded frames (same contract as the recurrent encoders)
        return x * valid[:, :, None].astype(x.dtype), lengths

    def _pipelined_blocks(self, params, x, bias, valid, rng, block):
        """Run the block stack pipelined over the mesh 'pipe' axis
        (``pipeline_stages = S``): layers shard S-ways, the batch
        splits into ``pipeline_microbatches`` (default 2*S) microbatches
        streaming through the stages — see parallel/pipeline.py. Needs
        the trainer's mesh installed via parallel.mesh.use_mesh."""
        from nabu_tpu.parallel import mesh as mesh_lib
        from nabu_tpu.parallel.pipeline import PIPE_AXIS, pipeline_apply

        mesh = mesh_lib.current_mesh()
        if mesh is None or PIPE_AXIS not in mesh.shape:
            raise ValueError(
                "pipeline_stages > 1 requires a current mesh with a "
                "'pipe' axis (make_mesh(num_pipe=S) + mesh.use_mesh)"
            )
        S = mesh.shape[PIPE_AXIS]
        if S != self.pipeline_stages:
            raise ValueError(
                f"pipeline_stages {self.pipeline_stages} != mesh pipe "
                f"axis {S}"
            )
        B = x.shape[0]
        M = self.pipeline_microbatches or 2 * S
        if B % M:
            raise ValueError(
                f"batch {B} not divisible by {M} microbatches"
            )
        blocks = [params[f"block_{i}"] for i in range(self.num_layers)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
        keys = (
            jax.random.split(rng, self.num_layers)
            if rng is not None
            else jnp.zeros((self.num_layers, 2), jnp.uint32)
        )
        has_rng = rng is not None

        def mb(a):
            return a.reshape(M, B // M, *a.shape[1:])

        x_mb = mb(x)
        aux_mb = {
            "bias": mb(bias),
            # bools don't ppermute; ride as int32
            "valid": mb(valid.astype(jnp.int32)),
            "mbid": jnp.arange(M, dtype=jnp.uint32),
        }

        def stage_fn(pk, x, aux):
            p_chunk, key_chunk = pk
            bias_ = aux["bias"]
            valid_ = aux["valid"].astype(bool)

            def body(x, inp):
                p, key = inp
                # distinct dropout streams per (layer, microbatch)
                sub = (
                    jax.random.fold_in(key, aux["mbid"])
                    if has_rng else None
                )
                return block(p, x, bias_, valid_, sub), None

            x, _ = jax.lax.scan(body, x, (p_chunk, key_chunk))
            return x

        out = pipeline_apply(
            mesh, stage_fn, (stacked, keys), x_mb, aux_mb
        )
        return out.reshape(B, *x.shape[1:])


@ENCODERS.register("conformer")
class ConformerEncoder(TransformerEncoder):
    """Conformer block encoder (beyond parity): macaron half-step FFNs
    around masked MHSA plus a depthwise-convolution module
    (pointwise->GLU->depthwise(SAME)->norm->swish->pointwise), the
    conv-augmented transformer that is the modern ASR encoder standard.
    Extra config: ``kernel_size`` (15) for the depthwise conv. Uses
    layer norm in the conv module instead of batch norm (no cross-batch
    state; TPU-friendly). Padded frames are zeroed before the conv so
    padding never leaks into valid positions beyond the kernel's reach
    of real frames.
    """

    def __init__(self, conf: Conf, input_dim: int):
        super().__init__(conf, input_dim)
        self.kernel_size = conf.getint("kernel_size", 15)

    def init(self, key) -> dict:
        params = super().init(key)
        d, f = self.d, self.ffn_dim
        keys = jax.random.split(
            jax.random.fold_in(key, 1), 4 * self.num_layers
        )
        k = 0
        for i in range(self.num_layers):
            blk = params[f"block_{i}"]
            # macaron second FFN + conv module on top of the base block.
            # With MoE enabled the base init made the block's FFN the
            # expert layer (used as the SECOND macaron FFN here), so add
            # a dense FIRST macaron FFN; otherwise add the dense second.
            blk["ln_ff2_g"] = jnp.ones((d,))
            blk["ln_ff2_b"] = jnp.zeros((d,))
            if self.moe_experts > 0:
                blk["ffn1"] = core.linear_init(keys[k], d, f)
                blk["ffn2"] = core.linear_init(keys[k + 1], f, d)
            else:
                blk["ff2_1"] = core.linear_init(keys[k], d, f)
                blk["ff2_2"] = core.linear_init(keys[k + 1], f, d)
            blk["ln_conv_g"] = jnp.ones((d,))
            blk["ln_conv_b"] = jnp.zeros((d,))
            blk["pw1"] = core.linear_init(keys[k + 2], d, 2 * d)
            blk["dw"] = core.uniform_scale(
                jax.random.fold_in(keys[k + 2], 7),
                (self.kernel_size, d),
                1.0 / jnp.sqrt(jnp.asarray(self.kernel_size * 1.0)),
            )
            blk["ln_dw_g"] = jnp.ones((d,))
            blk["ln_dw_b"] = jnp.zeros((d,))
            blk["pw2"] = core.linear_init(keys[k + 3], d, d)
            k += 4
        return params

    def _conv_module(self, p, x, valid):
        y = core.layer_norm(x, p["ln_conv_g"], p["ln_conv_b"])
        # zero padding before the conv: a SAME window must see zeros,
        # not garbage, where it overlaps padded frames
        y = y * valid[:, :, None].astype(y.dtype)
        y = core.linear_apply(p["pw1"], y)  # [B, T, 2d]
        a, b = jnp.split(y, 2, axis=-1)
        y = a * jax.nn.sigmoid(b)  # GLU
        w = p["dw"].astype(y.dtype)[:, None, :]  # [K, 1, d]
        y = jax.lax.conv_general_dilated(
            y, w, window_strides=(1,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=y.shape[-1],
        )
        y = core.layer_norm(y, p["ln_dw_g"], p["ln_dw_b"])
        y = y * jax.nn.sigmoid(y)  # swish
        return core.linear_apply(p["pw2"], y)

    def _ffn(self, x, ln_g, ln_b, p1, p2):
        y = core.layer_norm(x, ln_g, ln_b)
        y = jax.nn.gelu(y @ p1["w"] + p1["b"])
        return core.linear_apply(p2, y)

    def _block(self, p, x, bias, valid, rate, train, rng):
        r1, r2, r3, r4 = (
            jax.random.split(rng, 4) if rng is not None
            else (None,) * 4
        )
        # macaron: half-step FFN - MHSA - conv - half-step FFN
        y = self._ffn(x, p["ln2_g"], p["ln2_b"], p["ffn1"], p["ffn2"])
        x = x + 0.5 * self._drop(y, rate, train, r1)
        y = core.layer_norm(x, p["ln1_g"], p["ln1_b"])
        x = x + self._drop(self._mhsa(p, y, bias), rate, train, r2)
        x = x + self._drop(
            self._conv_module(p, x, valid), rate, train, r3
        )
        if self.moe_experts > 0:
            y = core.layer_norm(x, p["ln_ff2_g"], p["ln_ff2_b"])
            y = self._moe_ffn(p, y, valid)
        else:
            y = self._ffn(x, p["ln_ff2_g"], p["ln_ff2_b"], p["ff2_1"],
                          p["ff2_2"])
        return x + 0.5 * self._drop(y, rate, train, r4)


def build_encoder(conf: Conf, input_dim: int) -> Encoder:
    """Factory by conf['encoder'] (reference: ed_encoder_factory.py)."""
    return ENCODERS.build(conf.get("encoder", "dblstm"), conf, input_dim)
