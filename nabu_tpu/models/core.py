"""Core neural building blocks: Linear, Embedding, LSTM scan, BLSTM,
pyramid stack, dropout.

Capability parity with nabu/neuralnetworks/components/ (layer.py:
Linear/BLSTMLayer/PBLSTMLayer, rnn_cell.py, ops.py: pyramid_stack),
re-designed TPU-first:

- the LSTM input projection for ALL timesteps is one large matmul
  (maps onto the MXU) done outside the recurrence; only the [H, 4H]
  hidden matmul lives inside ``lax.scan``;
- variable lengths are handled by mask-gated state updates, so reversed
  (backward) scans over padded batches are correct without per-sequence
  reversal: padding frames leave the carried state untouched;
- an optional fused Pallas cell (nabu_tpu.ops.pallas.lstm) replaces the
  scan body on TPU.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


Params = Dict[str, jnp.ndarray]


# -- initializers ----------------------------------------------------------

def glorot(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[-2], shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def uniform_scale(key, shape, scale, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -scale, scale)


# -- linear / embedding ----------------------------------------------------

def linear_init(key, in_dim: int, out_dim: int) -> Params:
    return {
        "w": glorot(key, (in_dim, out_dim)),
        "b": jnp.zeros((out_dim,), jnp.float32),
    }


def linear_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


def embedding_init(key, vocab: int, dim: int) -> Params:
    return {"table": jax.random.normal(key, (vocab, dim)) * 0.02}


def embedding_apply(p: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(p["table"], ids, axis=0)


# -- dropout ---------------------------------------------------------------

def dropout(key, x: jnp.ndarray, rate: float, train: bool) -> jnp.ndarray:
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# -- LSTM ------------------------------------------------------------------

def lstm_init(
    key, in_dim: int, hidden: int, layer_norm: bool = False
) -> Params:
    """One LSTM direction. Gate order along the 4H axis: i, f, g, o.

    ``layer_norm=True`` adds the gains/biases of the layer-norm LSTM
    variant (lstm_ln_cell)."""
    k1, k2 = jax.random.split(key)
    p = {
        "wx": glorot(k1, (in_dim, 4 * hidden)),
        "wh": glorot(k2, (hidden, 4 * hidden)),
        "b": jnp.zeros((4 * hidden,), jnp.float32),
    }
    if layer_norm:
        p["ln_x_g"] = jnp.ones((4 * hidden,), jnp.float32)
        p["ln_h_g"] = jnp.ones((4 * hidden,), jnp.float32)
        p["ln_c_g"] = jnp.ones((hidden,), jnp.float32)
        p["ln_c_b"] = jnp.zeros((hidden,), jnp.float32)
    return p


def lstm_cell(
    xw_t: jnp.ndarray,  # [B, 4H] precomputed x @ wx (+ b)
    h: jnp.ndarray,  # [B, H]
    c: jnp.ndarray,  # [B, H]
    wh: jnp.ndarray,  # [H, 4H]
    forget_bias: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    gates = xw_t + h @ wh
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f + forget_bias) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def layer_norm(
    x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray | None = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Layer norm over the last axis with learned gain (and bias)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps) * g
    return y + b if b is not None else y


def lstm_ln_cell(
    xw_ln_t: jnp.ndarray,  # [B, 4H] layer-normed x projection (+ b)
    h: jnp.ndarray,
    c: jnp.ndarray,
    p: Params,  # needs wh, ln_h_g, ln_c_g, ln_c_b
    forget_bias: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Layer-norm LSTM cell (Ba et al. 2016): separate LN on the x and
    h projections, LN on the cell state before the output tanh.
    Reference capability: rnn_cell.py layer-norm wrappers."""
    gates = xw_ln_t + layer_norm(h @ p["wh"], p["ln_h_g"])
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f + forget_bias) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    c_out = layer_norm(c_new, p["ln_c_g"], p["ln_c_b"])
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_out)
    return h_new, c_new


def lstm_scan(
    p: Params,
    x: jnp.ndarray,  # [B, T, D]
    lengths: jnp.ndarray,  # [B]
    reverse: bool = False,
    forget_bias: float = 1.0,
    unroll: int = 8,
    init_carry: Tuple[jnp.ndarray, jnp.ndarray] | None = None,
    return_carry: bool = False,
):
    """Unidirectional masked LSTM over a padded batch -> [B, T, H].

    For ``reverse=True`` the padded array is flipped wholesale; the mask
    gate keeps the carried state at its initial zeros through the leading
    padding, which is exactly the state the backward pass of a
    per-sequence reversal would have.

    ``init_carry``/``return_carry`` (forward direction only) expose the
    (h, c) state so chunked STREAMING runs are exact: feeding a sequence
    in chunks with the carry threaded through equals one full scan —
    the mask gate freezes the carry at each lane's last valid frame, so
    a partially-filled chunk hands the right state to the next one.
    """
    B, T, _ = x.shape
    H = p["wh"].shape[0]
    mask = (
        jnp.arange(T, dtype=lengths.dtype)[None, :] < lengths[:, None]
    )  # [B, T]
    if reverse:
        x = jnp.flip(x, axis=1)
        mask = jnp.flip(mask, axis=1)

    # one big MXU matmul for every timestep's input projection; for the
    # layer-norm variant its LN is also batched outside the recurrence
    ln = "ln_x_g" in p
    if ln:
        xw = layer_norm(x @ p["wx"], p["ln_x_g"]) + p["b"]
    else:
        xw = x @ p["wx"] + p["b"]  # [B, T, 4H]
    xw = jnp.swapaxes(xw, 0, 1)  # [T, B, 4H] time-major for scan
    mask_t = jnp.swapaxes(mask, 0, 1)[..., None]  # [T, B, 1]

    def step(carry, inp):
        h, c = carry
        xw_t, m = inp
        if ln:
            h_new, c_new = lstm_ln_cell(xw_t, h, c, p, forget_bias)
        else:
            h_new, c_new = lstm_cell(xw_t, h, c, p["wh"], forget_bias)
        h = jnp.where(m, h_new, h)
        c = jnp.where(m, c_new, c)
        return (h, c), h * m

    if init_carry is None:
        init_carry = (
            jnp.zeros((B, H), x.dtype),
            jnp.zeros((B, H), x.dtype),
        )
    elif reverse:
        raise ValueError("init_carry only supports the forward direction")
    carry, ys = jax.lax.scan(step, init_carry, (xw, mask_t), unroll=unroll)
    ys = jnp.swapaxes(ys, 0, 1)  # [B, T, H]
    if reverse:
        ys = jnp.flip(ys, axis=1)
    return (ys, carry) if return_carry else ys


def blstm_init(
    key, in_dim: int, hidden: int, layer_norm: bool = False
) -> Params:
    kf, kb = jax.random.split(key)
    return {
        "fw": lstm_init(kf, in_dim, hidden, layer_norm),
        "bw": lstm_init(kb, in_dim, hidden, layer_norm),
    }


def blstm_apply(
    p: Params,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    unroll: int = 8,
    impl: str = "scan",
) -> jnp.ndarray:
    """Bidirectional LSTM -> [B, T, 2H] (fw ++ bw).

    impl="pallas" runs the fused dual-direction Pallas kernel
    (nabu_tpu.ops.pallas.blstm) instead of the lax.scan cell.
    """
    if impl == "pallas" and "ln_x_g" not in p["fw"]:
        # the fused kernel has no layer-norm variant; LN falls back to
        # the scan path
        from nabu_tpu.ops.pallas.blstm import blstm_apply_fused

        return blstm_apply_fused(p, x, lengths)
    fw = lstm_scan(p["fw"], x, lengths, reverse=False, unroll=unroll)
    bw = lstm_scan(p["bw"], x, lengths, reverse=True, unroll=unroll)
    return jnp.concatenate([fw, bw], axis=-1)


# -- pyramid stack ---------------------------------------------------------

def pyramid_stack(
    x: jnp.ndarray, lengths: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Concatenate adjacent frame pairs: [B, T, D] -> [B, ceil(T/2), 2D].

    Reference: ops.pyramid_stack in nabu components — halves the time
    resolution between Listener layers. New length = ceil(len / 2).
    """
    B, T, D = x.shape
    if T % 2:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))
        T += 1
    x = x.reshape(B, T // 2, 2 * D)
    return x, (lengths + 1) // 2
