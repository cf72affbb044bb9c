"""RNN-T (transducer) decoder head: prediction network + joint network.

Beyond-parity model family (the reference vrenkens/nabu covers CTC and
attention only; see ops/transducer.py for why RNN-T is included). The
head plugs into the same ``[decoder]``-section registry and multi-head
Model container as the CTC and Speller heads:

- training ``apply`` returns the full joint lattice
  ``logits [B, T, U+1, V+1]`` with ``logit_lengths = enc_lengths`` —
  exactly what ``loss = transducer`` (ops/losses.py) consumes;
- decode-time recognizers (decoding/transducer.py) drive the exposed
  ``pred_step`` / ``joint_step`` pieces frame by frame, which is what
  makes RNN-T the streaming-friendly family.

TPU-first notes: the prediction net is the same masked ``lax.scan``
LSTM as the encoders (input projection hoisted to one MXU matmul); the
joint broadcasts two precomputed projections (enc [B,T,J] + pred
[B,U+1,J]) into the lattice, so the only 4-D math is one tanh and one
[J, V+1] matmul, optionally rematerialized (``remat = true``, default)
so the [B,T,U+1,J] tanh activations are recomputed in the backward pass
instead of living in HBM.

Label-id conventions match the CTC head (models/decoders.py): targets
in [0, num_labels); blank = num_labels (last index). The prediction-net
start symbol reuses embedding row num_labels (blank is never fed as an
input, so the row is free).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from nabu_tpu.config import Conf
from nabu_tpu.models import core
from nabu_tpu.models.decoders import Decoder
from nabu_tpu.ops.masking import sequence_mask
from nabu_tpu.registry import DECODERS

PredState = List[Tuple[jnp.ndarray, jnp.ndarray]]


@DECODERS.register("rnnt")
@DECODERS.register("transducer")
class TransducerDecoder(Decoder):
    """Prediction LSTM stack + additive-tanh joint network (Graves 2012)."""

    default_loss = "transducer"

    def __init__(self, conf: Conf, encoder_dim: int, num_labels: int):
        super().__init__(conf, encoder_dim, num_labels)
        self.num_layers = conf.getint("num_layers", 1)
        self.num_units = conf.getint("num_units", 256)
        self.embed_dim = conf.getint("embed_dim", self.num_units)
        self.joint_dim = conf.getint("joint_units", self.num_units)
        self.remat = conf.getbool("remat", True)
        # use_pallas: train-time apply() emits the projection pytree the
        # fused joint+loss kernel (ops/pallas/transducer.py) consumes
        # instead of the materialized lattice
        self.use_pallas = conf.getbool("use_pallas", False)
        self.blank_id = self.num_labels
        self.sos_id = self.num_labels  # embedding row, never emitted

    # -- params ----------------------------------------------------------
    def init(self, key) -> dict:
        keys = jax.random.split(key, self.num_layers + 4)
        params: Dict[str, dict] = {
            "embed": core.embedding_init(
                keys[0], self.output_dim, self.embed_dim
            )
        }
        in_dim = self.embed_dim
        for i in range(self.num_layers):
            params[f"lstm_{i}"] = core.lstm_init(
                keys[i + 1], in_dim, self.num_units
            )
            in_dim = self.num_units
        params["joint_enc"] = core.linear_init(
            keys[-3], self.encoder_dim, self.joint_dim
        )
        params["joint_pred"] = core.linear_init(
            keys[-2], self.num_units, self.joint_dim
        )
        params["out"] = core.linear_init(
            keys[-1], self.joint_dim, self.output_dim
        )
        return params

    # -- prediction network ------------------------------------------------
    def pred_init_state(self, batch: int, dtype=jnp.float32) -> PredState:
        return [
            (
                jnp.zeros((batch, self.num_units), dtype),
                jnp.zeros((batch, self.num_units), dtype),
            )
            for _ in range(self.num_layers)
        ]

    def pred_step(
        self, params: dict, prev_ids: jnp.ndarray, state: PredState
    ) -> Tuple[jnp.ndarray, PredState]:
        """One prediction-net step: prev label id [B] -> ([B, P], state).

        Must stay numerically identical to the lax.scan path in
        ``_pred_sequence`` (tested step==scan in tests/test_transducer.py).
        """
        x = core.embedding_apply(params["embed"], prev_ids)
        new_state: PredState = []
        for i in range(self.num_layers):
            h, c = state[i]
            p = params[f"lstm_{i}"]
            xw = x @ p["wx"] + p["b"]
            h, c = core.lstm_cell(xw, h, c, p["wh"])
            new_state.append((h, c))
            x = h
        return x, new_state

    def _pred_sequence(
        self,
        params: dict,
        targets: jnp.ndarray,  # [B, U]
        target_lengths: jnp.ndarray,  # [B]
    ) -> jnp.ndarray:
        """Teacher-forced prediction net over [<s>; targets] -> [B, U+1, P]."""
        B, U = targets.shape
        sos = jnp.full((B, 1), self.sos_id, targets.dtype)
        inputs = jnp.concatenate([sos, targets], axis=1)  # [B, U+1]
        x = core.embedding_apply(params["embed"], inputs)
        for i in range(self.num_layers):
            x = core.lstm_scan(
                params[f"lstm_{i}"], x, target_lengths + 1
            )
        return x

    # -- joint network ------------------------------------------------------
    def joint_step(
        self, params: dict, enc_proj_t: jnp.ndarray, pred_vec: jnp.ndarray
    ) -> jnp.ndarray:
        """Joint over one (frame, prediction) pair.

        ``enc_proj_t`` [B, J] is a frame of the precomputed encoder
        projection (``precompute``); ``pred_vec`` [B, P] comes from
        ``pred_step``. Returns logits [B, V+1].
        """
        hidden = jnp.tanh(
            enc_proj_t + core.linear_apply(params["joint_pred"], pred_vec)
        )
        return core.linear_apply(params["out"], hidden)

    def precompute(self, params: dict, encoded: jnp.ndarray) -> jnp.ndarray:
        """Step-invariant encoder projection [B, T, J] for decode loops."""
        return core.linear_apply(params["joint_enc"], encoded)

    # -- teacher-forced training pass ---------------------------------------
    def apply(
        self,
        params: dict,
        encoded: jnp.ndarray,  # [B, T, D]
        enc_lengths: jnp.ndarray,  # [B]
        targets: jnp.ndarray,  # [B, U]
        target_lengths: jnp.ndarray,  # [B]
        train: bool = False,
        rng=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (lattice logits [B, T, U+1, V+1], enc_lengths).

        With ``use_pallas = true`` the lattice is never materialized:
        the return value is instead a dict of the two joint projections
        + output weights, which ``loss = transducer`` hands to the fused
        Pallas joint+loss kernel (the loss registry's ``use_pallas``
        flag comes from this same config section, so the pair always
        agrees)."""
        del train, rng
        pred = self._pred_sequence(params, targets, target_lengths)
        # zero padded frames so masked-lane garbage can't reach the loss
        enc_mask = sequence_mask(enc_lengths, encoded.shape[1])
        encoded = encoded * enc_mask[..., None].astype(encoded.dtype)
        enc_proj = core.linear_apply(params["joint_enc"], encoded)
        pred_proj = core.linear_apply(params["joint_pred"], pred)

        if self.use_pallas:
            return {
                "enc_proj": enc_proj,
                "pred_proj": pred_proj,
                "w_out": params["out"]["w"],
                "b_out": params["out"]["b"],
            }, enc_lengths

        def lattice(out_p, e, p):
            hidden = jnp.tanh(e[:, :, None, :] + p[:, None, :, :])
            return core.linear_apply(out_p, hidden)

        if self.remat:
            lattice = jax.checkpoint(lattice)
        return lattice(params["out"], enc_proj, pred_proj), enc_lengths
