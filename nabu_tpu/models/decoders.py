"""Model-side decoders: attention Speller and linear CTC head.

Capability parity with nabu/neuralnetworks/models/ed_decoders/
(speller.py, the linear/DNN CTC head, ed_decoder.py base/factory):
a decoder exposes a teacher-forced ``apply`` for training and, for
autoregressive decoders, a single-step ``step`` + ``init_state`` used
by the jit-compiled batched beam search.

Label-id conventions (documented parity choice, SURVEY.md §7 hard
part 6): targets are in ``[0, num_labels)``; the Speller uses one extra
id ``num_labels`` as both <sos> (input-side) and <eos> (output-side),
so its vocab is ``num_labels + 1``; the CTC head also emits
``num_labels + 1`` logits with blank = ``num_labels`` (last index, the
TF/reference convention — label ids never shift).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from nabu_tpu.config import Conf
from nabu_tpu.models import core
from nabu_tpu.ops.masking import mask_logits, sequence_mask
from nabu_tpu.registry import DECODERS


class Decoder:
    """Base decoder built from a config section.

    ``default_loss`` is the loss the head trains with when its config
    section has no ``loss`` key (consulted by Model.head_loss).
    """

    default_loss = "cross_entropy"

    def __init__(self, conf: Conf, encoder_dim: int, num_labels: int):
        self.conf = conf
        self.encoder_dim = encoder_dim
        self.num_labels = num_labels
        self.output_dim = num_labels + 1

    def init(self, key) -> dict:
        raise NotImplementedError


@DECODERS.register("linear_ctc")
@DECODERS.register("ctc")
class LinearCTC(Decoder):
    """Per-frame projection of encoder output to label+blank posteriors —
    the "decoder" of CTC models (reference: ed_decoders linear/DNN
    decoder). blank = num_labels (last)."""

    default_loss = "ctc"

    def __init__(self, conf: Conf, encoder_dim: int, num_labels: int):
        super().__init__(conf, encoder_dim, num_labels)
        self.hidden = conf.getint("num_units", 0)
        self.blank_id = self.num_labels

    def init(self, key) -> dict:
        if self.hidden:
            k1, k2 = jax.random.split(key)
            return {
                "hidden": core.linear_init(k1, self.encoder_dim, self.hidden),
                "out": core.linear_init(k2, self.hidden, self.output_dim),
            }
        return {"out": core.linear_init(key, self.encoder_dim, self.output_dim)}

    def apply(
        self,
        params: dict,
        encoded: jnp.ndarray,  # [B, T, D]
        enc_lengths: jnp.ndarray,
        targets=None,
        target_lengths=None,
        train: bool = False,
        rng=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = encoded
        if self.hidden:
            x = jax.nn.relu(core.linear_apply(params["hidden"], x))
        return core.linear_apply(params["out"], x), enc_lengths


@DECODERS.register("speller")
class Speller(Decoder):
    """LAS attention decoder (reference: ed_decoders/speller.py).

    Per step: x_t = [embed(prev_label); context_{t-1}] -> LSTM stack ->
    attention over encoded -> logits = W_o [h_top; context_t]. Training
    uses teacher forcing with scheduled sampling (probability
    ``sample_prob`` of feeding the model's own argmax instead of the
    ground truth).

    ``attention`` selects the scorer: ``bahdanau`` (additive, default),
    ``dot`` (scaled dot product), or ``location`` (location-aware,
    Chorowski et al. 2015: the additive score also sees the PREVIOUS
    step's attention weights through a 1-D conv — ``location_filters``
    channels of width ``location_width`` — which biases the search
    toward monotonic moves and prevents the attend-twice/skip failure
    modes on long utterances). Location attention carries the previous
    weights in the decode state (``attn_prev`` [B, T]), so
    ``init_state`` needs ``enc_frames``.
    """

    def __init__(self, conf: Conf, encoder_dim: int, num_labels: int):
        super().__init__(conf, encoder_dim, num_labels)
        self.num_layers = conf.getint("num_layers", 1)
        self.num_units = conf.getint("num_units", 256)
        self.embed_dim = conf.getint("embed_dim", self.num_units)
        self.attn_dim = conf.getint("attention_units", self.num_units)
        self.attention = conf.get("attention", "bahdanau")
        if self.attention not in ("bahdanau", "dot", "location"):
            raise ValueError(
                f"unknown attention {self.attention!r} "
                "(bahdanau|dot|location)"
            )
        self.loc_filters = conf.getint("location_filters", 10)
        self.loc_width = conf.getint("location_width", 11)
        self.sample_prob = conf.getfloat("sample_prob", 0.0)
        self.dropout = conf.getfloat("dropout", 0.0)
        self.sos_id = self.num_labels
        self.eos_id = self.num_labels

    # -- params ----------------------------------------------------------
    def init(self, key) -> dict:
        keys = jax.random.split(key, self.num_layers + 7)
        params: Dict[str, dict] = {
            "embed": core.embedding_init(
                keys[0], self.output_dim, self.embed_dim
            )
        }
        in_dim = self.embed_dim + self.encoder_dim
        for i in range(self.num_layers):
            params[f"lstm_{i}"] = core.lstm_init(
                keys[i + 1], in_dim, self.num_units
            )
            in_dim = self.num_units
        params["attn_enc"] = core.linear_init(
            keys[-4], self.encoder_dim, self.attn_dim
        )
        params["attn_state"] = core.linear_init(
            keys[-3], self.num_units, self.attn_dim
        )
        params["attn_v"] = {
            "v": core.glorot(keys[-2], (self.attn_dim, 1))
        }
        if self.attention == "location":
            params["attn_loc"] = {
                "conv": core.glorot(
                    keys[-6], (self.loc_width, 1, self.loc_filters)
                ),
                "proj": core.linear_init(
                    keys[-5], self.loc_filters, self.attn_dim
                ),
            }
        params["out"] = core.linear_init(
            keys[-1], self.num_units + self.encoder_dim, self.output_dim
        )
        return params

    # -- state -----------------------------------------------------------
    def init_state(
        self, batch: int, dtype=jnp.float32, enc_frames: int = None
    ) -> dict:
        state = {
            "lstm": [
                (
                    jnp.zeros((batch, self.num_units), dtype),
                    jnp.zeros((batch, self.num_units), dtype),
                )
                for _ in range(self.num_layers)
            ],
            "context": jnp.zeros((batch, self.encoder_dim), dtype),
        }
        if self.attention == "location":
            if enc_frames is None:
                raise ValueError(
                    "location attention carries the previous attention "
                    "weights in the decode state: pass "
                    "init_state(..., enc_frames=T)"
                )
            state["attn_prev"] = jnp.zeros((batch, enc_frames), dtype)
        return state

    # -- attention -------------------------------------------------------
    def _attend(self, params, h_top, keys, encoded, enc_mask,
                prev_weights=None):
        """keys = precomputed W_enc @ encoded [Be, T, A].

        Beam sharing: the query batch Bq may be an integer multiple
        W = Bq / Be of the encoder batch Be (a [B, W] beam flattened to
        B*W hypotheses over one encoding per utterance). encoded / keys
        / enc_mask then stay at [Be, ...] — never tiled W-fold into HBM
        — and the score/context einsums carry the beam on a separate
        axis. Hypothesis w of utterance b must sit at row b * W + w.
        """
        Bq = h_top.shape[0]
        Be = encoded.shape[0]
        W = Bq // Be
        q = core.linear_apply(params["attn_state"], h_top)  # [Bq, A]
        if self.attention == "dot":
            scale = jnp.sqrt(jnp.asarray(self.attn_dim, h_top.dtype))
            if W == 1:
                scores = jnp.einsum("bta,ba->bt", keys, q) / scale
            else:
                scores = jnp.einsum(
                    "bta,bwa->bwt", keys, q.reshape(Be, W, -1)
                ) / scale  # [Be, W, T]
        else:  # bahdanau / location
            if W == 1:
                e = keys + q[:, None, :]  # [Be, T, A]
            else:
                e = keys[:, None] + q.reshape(Be, W, 1, -1)  # [Be,W,T,A]
            if self.attention == "location":
                # 1-D conv over the previous step's attention weights
                # (per hypothesis): [Bq, T, 1] -> [Bq, T, F]
                f = jax.lax.conv_general_dilated(
                    prev_weights[..., None].astype(e.dtype),
                    params["attn_loc"]["conv"].astype(e.dtype),
                    window_strides=(1,),
                    padding="SAME",
                    dimension_numbers=("NWC", "WIO", "NWC"),
                )
                loc = core.linear_apply(params["attn_loc"]["proj"], f)
                e = e + (loc if W == 1 else loc.reshape(Be, W, *loc.shape[1:]))
            scores = jnp.squeeze(
                jnp.tanh(e) @ params["attn_v"]["v"], -1
            )  # [Be, T] or [Be, W, T]
        if W == 1:
            weights = jax.nn.softmax(
                mask_logits(scores, enc_mask), axis=-1
            )
            context = jnp.einsum("bt,btd->bd", weights, encoded)
            return context, weights
        weights = jax.nn.softmax(
            mask_logits(scores, enc_mask[:, None, :]), axis=-1
        )  # [Be, W, T]
        context = jnp.einsum("bwt,btd->bwd", weights, encoded)
        return (
            context.reshape(Bq, -1),
            weights.reshape(Bq, -1),
        )

    def precompute(self, params, encoded):
        """Step-invariant attention keys (W_enc @ encoded), computed
        once outside a decode loop and passed to every step()."""
        return core.linear_apply(params["attn_enc"], encoded)

    # -- one autoregressive step ----------------------------------------
    def step(
        self,
        params: dict,
        prev_ids: jnp.ndarray,  # [B] int32
        state: dict,
        encoded: jnp.ndarray,  # [B, T, D]
        enc_mask: jnp.ndarray,  # [B, T]
        keys: jnp.ndarray = None,  # optional precomputed attn keys
    ) -> Tuple[jnp.ndarray, dict]:
        if keys is None:
            keys = core.linear_apply(params["attn_enc"], encoded)
        emb = core.embedding_apply(params["embed"], prev_ids)
        x = jnp.concatenate([emb, state["context"]], axis=-1)
        new_lstm = []
        for i in range(self.num_layers):
            h, c = state["lstm"][i]
            p = params[f"lstm_{i}"]
            xw = x @ p["wx"] + p["b"]
            h, c = core.lstm_cell(xw, h, c, p["wh"])
            new_lstm.append((h, c))
            x = h
        context, weights = self._attend(
            params, x, keys, encoded, enc_mask,
            prev_weights=state.get("attn_prev"),
        )
        logits = core.linear_apply(
            params["out"], jnp.concatenate([x, context], axis=-1)
        )
        new_state = {"lstm": new_lstm, "context": context,
                     "attn_weights": weights}
        if self.attention == "location":
            new_state["attn_prev"] = weights
        return logits, new_state

    # -- teacher-forced training pass ------------------------------------
    def apply(
        self,
        params: dict,
        encoded: jnp.ndarray,  # [B, T, D]
        enc_lengths: jnp.ndarray,  # [B]
        targets: jnp.ndarray,  # [B, L]
        target_lengths: jnp.ndarray,  # [B]
        train: bool = False,
        rng=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (logits [B, L+1, V+1], logit_lengths = target_lengths+1).

        Step t consumes target t-1 (or its own argmax under scheduled
        sampling) and must predict target t; step L predicts <eos>.
        """
        B, L = targets.shape
        T = encoded.shape[1]
        enc_mask = sequence_mask(enc_lengths, T)
        keys = core.linear_apply(params["attn_enc"], encoded)
        sos = jnp.full((B, 1), self.sos_id, targets.dtype)
        inputs = jnp.concatenate([sos, targets], axis=1)  # [B, L+1]
        state0 = self.init_state(B, encoded.dtype, enc_frames=T)
        state0.pop("attn_weights", None)
        sample_prob = self.sample_prob if train else 0.0
        if rng is None:
            rng = jax.random.PRNGKey(0)

        def scan_step(carry, inp):
            state, prev_pred = carry
            gt_prev, step_key = inp
            if sample_prob > 0.0:
                use_sampled = jax.random.bernoulli(
                    step_key, sample_prob, (B,)
                )
                prev_ids = jnp.where(use_sampled, prev_pred, gt_prev)
            else:
                prev_ids = gt_prev
            logits, new_state = self.step(
                params, prev_ids, state, encoded, enc_mask, keys
            )
            new_state.pop("attn_weights", None)
            return (new_state, jnp.argmax(logits, -1).astype(targets.dtype)), logits

        step_keys = jax.random.split(rng, L + 1)
        inputs_t = jnp.swapaxes(inputs, 0, 1)  # [L+1, B]
        (_, _), logits = jax.lax.scan(
            scan_step,
            (state0, jnp.full((B,), self.sos_id, targets.dtype)),
            (inputs_t, step_keys),
        )
        logits = jnp.swapaxes(logits, 0, 1)  # [B, L+1, V+1]
        return logits, target_lengths + 1


@DECODERS.register("transformer")
class TransformerDecoder(Decoder):
    """Transformer attention decoder (beyond parity — the reference's
    only attention decoder is the LSTM Speller). TPU-first rationale:
    training is ONE parallel pass over all label positions (causal
    self-attention + cross-attention over the encoder), so unlike the
    speller's lax.scan there is no sequential dependency chain at all —
    every op is a large batched MXU matmul over [B, L] tokens.

    Decoding exposes the same ``step``/``init_state``/``precompute``
    contract as the Speller, so every existing search (attention beam,
    joint CTC/attention, MWER's in-graph n-best, rescoring) works
    unchanged: the state carries per-layer self-attention KV caches
    [B, cap, d] (cap = encoder frames — an output longer than the
    encoder's frame count is impossible in ASR) plus the position.
    ``precompute`` projects the per-layer cross-attention K/V once.

    Config: ``num_layers`` (4), ``num_units`` (256), ``num_heads``
    (4), ``ffn_dim`` (4*num_units), ``dropout``. Pre-LN blocks.
    Scheduled sampling does not apply (training is parallel, not
    autoregressive); label smoothing lives in the loss as usual.
    """

    def __init__(self, conf: Conf, encoder_dim: int, num_labels: int):
        super().__init__(conf, encoder_dim, num_labels)
        self.num_layers = conf.getint("num_layers", 4)
        self.d = conf.getint("num_units", 256)
        self.num_heads = conf.getint("num_heads", 4)
        if self.d % self.num_heads:
            raise ValueError(
                f"num_units {self.d} not divisible by num_heads "
                f"{self.num_heads}"
            )
        self.ffn_dim = conf.getint("ffn_dim", 4 * self.d)
        self.dropout = conf.getfloat("dropout", 0.0)
        self.sos_id = self.num_labels
        self.eos_id = self.num_labels

    def init(self, key) -> dict:
        keys = jax.random.split(key, 6 * self.num_layers + 2)
        d, f = self.d, self.ffn_dim
        params: Dict[str, dict] = {
            "embed": core.embedding_init(keys[0], self.output_dim, d)
        }
        k = 1
        for i in range(self.num_layers):
            params[f"block_{i}"] = {
                "ln1_g": jnp.ones((d,)), "ln1_b": jnp.zeros((d,)),
                "wqkv": core.glorot(keys[k], (d, 3 * d)),
                "wo": core.linear_init(keys[k + 1], d, d),
                "ln2_g": jnp.ones((d,)), "ln2_b": jnp.zeros((d,)),
                "wq_x": core.glorot(keys[k + 2], (d, d)),
                "wkv_enc": core.glorot(
                    keys[k + 3], (self.encoder_dim, 2 * d)
                ),
                "wo_x": core.linear_init(keys[k + 4], d, d),
                "ln3_g": jnp.ones((d,)), "ln3_b": jnp.zeros((d,)),
                "ffn1": core.linear_init(keys[k + 5], d, f),
                "ffn2": core.linear_init(
                    jax.random.fold_in(keys[k + 5], 1), f, d
                ),
            }
            k += 6
        params["ln_out_g"] = jnp.ones((d,))
        params["ln_out_b"] = jnp.zeros((d,))
        params["out"] = core.linear_init(keys[-1], d, self.output_dim)
        return params

    # -- pieces ------------------------------------------------------------
    def _heads(self, x, B, n):
        """[B, n, d] -> [B, H, n, hd]."""
        hd = self.d // self.num_heads
        return x.reshape(B, n, self.num_heads, hd).transpose(0, 2, 1, 3)

    def _merge(self, x, B, n):
        return x.transpose(0, 2, 1, 3).reshape(B, n, self.d)

    def _mha(self, q, k, v, bias):
        """q [B,H,n,hd] x k/v [B,H,m,hd]; bias broadcastable to
        [B,H,n,m]. f32 scores/softmax (TPU numerics contract)."""
        hd = q.shape[-1]
        scores = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.asarray(hd, jnp.float32))
        w = jax.nn.softmax(scores + bias, axis=-1).astype(v.dtype)
        return jnp.einsum("bhnm,bhmd->bhnd", w, v)

    def _cross_kv(self, p, encoded):
        """Per-layer cross-attention K/V projections of the encoder."""
        B, T, _ = encoded.shape
        kv = encoded @ p["wkv_enc"]  # [B, T, 2d]
        k, v = jnp.split(kv, 2, axis=-1)
        return self._heads(k, B, T), self._heads(v, B, T)

    def precompute(self, params, encoded):
        return {
            f"block_{i}": self._cross_kv(params[f"block_{i}"], encoded)
            for i in range(self.num_layers)
        }

    def _block(self, p, x, self_bias, cross_kv, cross_bias,
               self_kv=None):
        """One decoder block on x [B, n, d]. ``self_kv`` overrides the
        self-attention keys/values (the step path passes the cache);
        the parallel path derives them from x itself."""
        B, n, _ = x.shape
        y = core.layer_norm(x, p["ln1_g"], p["ln1_b"])
        qkv = y @ p["wqkv"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = self._heads(q, B, n)
        if self_kv is None:
            k, v = self._heads(k, B, n), self._heads(v, B, n)
        else:
            k, v = self_kv
        att = self._merge(self._mha(q, k, v, self_bias), B, n)
        x = x + core.linear_apply(p["wo"], att)
        y = core.layer_norm(x, p["ln2_g"], p["ln2_b"])
        q = self._heads(y @ p["wq_x"], B, n)
        ck, cv = cross_kv
        Be = ck.shape[0]
        if Be != B:
            # beam-shared encoder: B = Be * W hypotheses attend over one
            # un-tiled encoding per utterance. Only the step path (n=1)
            # lands here; fold the W beams into the query-position axis.
            W = B // Be
            q = q.reshape(Be, W, self.num_heads, 1, -1)
            q = q.transpose(0, 2, 1, 3, 4).reshape(
                Be, self.num_heads, W, -1
            )
            att = self._mha(q, ck, cv, cross_bias)  # [Be, H, W, hd]
            att = att.reshape(Be, self.num_heads, W, 1, -1)
            att = att.transpose(0, 2, 1, 3, 4).reshape(
                B, self.num_heads, 1, -1
            )
            att = self._merge(att, B, n)
        else:
            att = self._merge(self._mha(q, ck, cv, cross_bias), B, n)
        x = x + core.linear_apply(p["wo_x"], att)
        y = core.layer_norm(x, p["ln3_g"], p["ln3_b"])
        y = jax.nn.gelu(y @ p["ffn1"]["w"] + p["ffn1"]["b"])
        return x + core.linear_apply(p["ffn2"], y)

    # -- state / step (beam-search contract) --------------------------------
    def init_state(
        self, batch: int, dtype=jnp.float32, enc_frames: int = None
    ) -> dict:
        if enc_frames is None:
            raise ValueError(
                "the transformer decoder sizes its KV cache from the "
                "encoder: pass init_state(..., enc_frames=T)"
            )
        hd = self.d // self.num_heads
        cap = enc_frames
        state = {"pos": jnp.zeros((batch,), jnp.int32)}
        for i in range(self.num_layers):
            state[f"k_{i}"] = jnp.zeros(
                (batch, self.num_heads, cap, hd), dtype
            )
            state[f"v_{i}"] = jnp.zeros(
                (batch, self.num_heads, cap, hd), dtype
            )
        return state

    def step(
        self,
        params: dict,
        prev_ids: jnp.ndarray,  # [B] int32
        state: dict,
        encoded: jnp.ndarray,  # [B, T, D]
        enc_mask: jnp.ndarray,  # [B, T]
        keys=None,  # optional precomputed cross K/V pytree
    ) -> Tuple[jnp.ndarray, dict]:
        if keys is None:
            keys = self.precompute(params, encoded)
        B = prev_ids.shape[0]
        cap = state["k_0"].shape[2]
        pos = state["pos"][0]  # all hypotheses advance in lockstep
        x = core.embedding_apply(params["embed"], prev_ids)[:, None, :]
        x = x * jnp.sqrt(jnp.asarray(self.d, x.dtype))
        x = x + _sinusoidal_pe_at(pos, self.d, x.dtype)[None, None, :]
        x = x.astype(encoded.dtype)
        # self-attention sees cache slots [0..pos] (pos = this token)
        slot_ok = (
            jnp.arange(cap) <= pos
        )  # [cap]
        self_bias = jnp.where(slot_ok, 0.0, -1e9).astype(jnp.float32)[
            None, None, None, :
        ]
        cross_bias = jnp.where(enc_mask, 0.0, -1e9).astype(jnp.float32)[
            :, None, None, :
        ]
        new_state = {"pos": state["pos"] + 1}
        for i in range(self.num_layers):
            p = params[f"block_{i}"]
            # compute this token's self K/V from the pre-normed input
            y = core.layer_norm(x, p["ln1_g"], p["ln1_b"])
            qkv = y @ p["wqkv"]
            _, k_new, v_new = jnp.split(qkv, 3, axis=-1)
            k_cache = jax.lax.dynamic_update_slice(
                state[f"k_{i}"], self._heads(k_new, B, 1),
                (0, 0, pos, 0),
            )
            v_cache = jax.lax.dynamic_update_slice(
                state[f"v_{i}"], self._heads(v_new, B, 1),
                (0, 0, pos, 0),
            )
            new_state[f"k_{i}"] = k_cache
            new_state[f"v_{i}"] = v_cache
            x = self._block(
                p, x, self_bias, keys[f"block_{i}"], cross_bias,
                self_kv=(k_cache, v_cache),
            )
        x = core.layer_norm(x, params["ln_out_g"], params["ln_out_b"])
        logits = core.linear_apply(params["out"], x)[:, 0, :]
        return logits, new_state

    # -- teacher-forced training pass ---------------------------------------
    def apply(
        self,
        params: dict,
        encoded: jnp.ndarray,  # [B, T, D]
        enc_lengths: jnp.ndarray,  # [B]
        targets: jnp.ndarray,  # [B, L]
        target_lengths: jnp.ndarray,  # [B]
        train: bool = False,
        rng=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (logits [B, L+1, V+1], logit_lengths): one parallel
        pass — position t attends causally over inputs [sos; targets]
        up to t and predicts target t (position L predicts <eos>)."""
        B, L = targets.shape
        T = encoded.shape[1]
        n = L + 1
        sos = jnp.full((B, 1), self.sos_id, targets.dtype)
        inputs = jnp.concatenate([sos, targets], axis=1)  # [B, n]
        x = core.embedding_apply(params["embed"], inputs)
        x = x * jnp.sqrt(jnp.asarray(self.d, x.dtype))
        x = (x + _sinusoidal_pe_rows(n, self.d, x.dtype)[None]).astype(
            encoded.dtype
        )
        causal = jnp.tril(jnp.ones((n, n), bool))
        self_bias = jnp.where(causal, 0.0, -1e9).astype(jnp.float32)[
            None, None, :, :
        ]
        enc_mask = sequence_mask(enc_lengths, T)
        cross_bias = jnp.where(enc_mask, 0.0, -1e9).astype(jnp.float32)[
            :, None, None, :
        ]
        drop = train and self.dropout > 0.0 and rng is not None
        for i in range(self.num_layers):
            p = params[f"block_{i}"]
            cross_kv = self._cross_kv(p, encoded)
            x = self._block(p, x, self_bias, cross_kv, cross_bias)
            if drop:
                rng, sub = jax.random.split(rng)
                x = core.dropout(sub, x, self.dropout, train)
        x = core.layer_norm(x, params["ln_out_g"], params["ln_out_b"])
        logits = core.linear_apply(params["out"], x)
        return logits, target_lengths + 1


def _sinusoidal_pe_rows(n: int, d: int, dtype) -> jnp.ndarray:
    """Sinusoidal positions [n, d] (same formula as the encoders')."""
    from nabu_tpu.models.encoders import _sinusoidal_pe

    return _sinusoidal_pe(n, d, dtype)


def _sinusoidal_pe_at(pos, d: int, dtype) -> jnp.ndarray:
    """One sinusoidal position row [d] at a traced position."""
    dim = jnp.arange(0, d, 2, dtype=jnp.float32)[None, :]
    angle = pos.astype(jnp.float32) / jnp.power(10000.0, dim / d)
    pe = jnp.zeros((1, d), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angle))
    pe = pe.at[:, 1::2].set(jnp.cos(angle[:, : (d // 2)]))
    return pe[0].astype(dtype)


def build_decoder(conf: Conf, encoder_dim: int, num_labels: int) -> Decoder:
    """Factory by conf['decoder'] (reference: ed_decoder_factory.py)."""
    return DECODERS.build(
        conf.get("decoder", "linear_ctc"), conf, encoder_dim, num_labels
    )
