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
    reference: ed_encoders/dblstm.py)."""

    def __init__(self, conf: Conf, input_dim: int):
        super().__init__(conf, input_dim)
        self.num_layers = conf.getint("num_layers", 2)
        self.num_units = conf.getint("num_units", 128)
        self.dropout = conf.getfloat("dropout", 0.0)
        self.impl = "pallas" if conf.getbool("use_pallas", False) else "scan"
        self.remat = conf.getbool("remat", False)
        self.layer_norm = conf.getbool("layer_norm", False)
        self.output_dim = 2 * self.num_units

    def init(self, key) -> dict:
        params = {}
        in_dim = self.input_dim
        for i, k in enumerate(jax.random.split(key, self.num_layers)):
            params[f"layer_{i}"] = core.blstm_init(
                k, in_dim, self.num_units, self.layer_norm
            )
            in_dim = 2 * self.num_units
        return params

    def apply(self, params, features, lengths, train=False, rng=None):
        layer_fn = _maybe_remat(self.remat, self.impl)
        x = features
        for i in range(self.num_layers):
            x = layer_fn(params[f"layer_{i}"], x, lengths)
            if train and self.dropout > 0 and rng is not None:
                rng, sub = jax.random.split(rng)
                x = core.dropout(sub, x, self.dropout, train)
        return x, lengths


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


def build_encoder(conf: Conf, input_dim: int) -> Encoder:
    """Factory by conf['encoder'] (reference: ed_encoder_factory.py)."""
    return ENCODERS.build(conf.get("encoder", "dblstm"), conf, input_dim)
