"""Recognizers: batched jit-compiled decoders over trained models.

Capability parity with nabu/neuralnetworks/decoders/ (max_decoder.py,
ctc_decoder.py, beam_search_decoder.py + decoder.py/decoder_factory.py).
Every recognizer maps ``(params, features, feature_lengths) -> Nbest``
with all heavy work inside jit and beam state held as fixed-shape device
arrays (no per-utterance graphs — BASELINE.json:5). Beam searches live
in nabu_tpu.decoding.beam (attention) and ctc_beam (CTC prefix).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nabu_tpu.config import Conf
from nabu_tpu.ops import ctc as ctc_ops
from nabu_tpu.ops.masking import NEG_INF, sequence_mask
from nabu_tpu.registry import RECOGNIZERS


@dataclasses.dataclass
class Nbest:
    """Decode result: ids [B, N, L], lengths [B, N], scores [B, N]."""

    ids: np.ndarray
    lengths: np.ndarray
    scores: np.ndarray

    def best(self, b: int) -> List[int]:
        return list(self.ids[b, 0, : self.lengths[b, 0]])

    def nbest(self, b: int):
        return [
            (float(self.scores[b, n]), list(self.ids[b, n, : self.lengths[b, n]]))
            for n in range(self.ids.shape[1])
        ]


class Recognizer:
    """Base recognizer built from a recognizer.cfg section.

    Beam recognizers accept ``lm_path`` (an NgramLM or neural RnnLM
    .npz — dispatched by file contents — trained with
    ``run lm``) + ``lm_weight`` for shallow fusion; configuring them on
    a recognizer without fusion support is an error, not a silent
    no-op.
    """

    supports_lm_fusion = False

    def __init__(self, conf: Conf, model, head: Optional[str] = None):
        self.conf = conf
        self.model = model
        self.head = head or conf.get("head") or next(iter(model.decoders))
        self.decoder = model.decoders[self.head]
        self.lm = None
        self.lm_weight = conf.getfloat("lm_weight", 0.0)
        lm_path = conf.get("lm_path")
        if lm_path and self.lm_weight != 0.0:
            if not self.supports_lm_fusion:
                raise ValueError(
                    f"recognizer {type(self).__name__} does not support "
                    "LM shallow fusion (lm_path/lm_weight); use a beam "
                    "recognizer or `run rescore`"
                )
            from nabu_tpu.decoding.lm import load_dense_lm

            self.lm = load_dense_lm(lm_path)
            if self.lm.vocab != self.decoder.output_dim:
                raise ValueError(
                    f"LM vocab {self.lm.vocab} != model output vocab "
                    f"{self.decoder.output_dim} — the LM must be "
                    "trained on this recipe's alphabet (`run lm`)"
                )

    def __call__(self, params, features, feature_lengths) -> Nbest:
        raise NotImplementedError


@RECOGNIZERS.register("ctc_greedy")
@RECOGNIZERS.register("max")
class CTCGreedyRecognizer(Recognizer):
    """Per-frame argmax + CTC collapse (reference: max_decoder.py /
    greedy path of ctc_decoder.py)."""

    def __init__(self, conf, model, head=None):
        super().__init__(conf, model, head)
        if not hasattr(self.decoder, "blank_id"):
            raise ValueError(
                f"head {self.head!r} ({type(self.decoder).__name__}) is "
                "not a frame-synchronous CTC head — point this "
                "recognizer at the CTC head (`head = ctc`) or use an "
                "attention/transducer recognizer"
            )
        self.blank_id = self.decoder.blank_id
        self._decode = jax.jit(self._decode_impl)

    def _decode_impl(self, params, features, feature_lengths):
        outputs = self.model.apply(
            params, features, feature_lengths, heads=(self.head,)
        )
        logits, logit_lengths = outputs[self.head]
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        frame_ids = jnp.argmax(logprobs, axis=-1)
        score = jnp.sum(
            jnp.max(logprobs, axis=-1)
            * sequence_mask(logit_lengths, logits.shape[1]),
            axis=-1,
        )
        ids, lengths = ctc_ops.ctc_greedy_collapse(
            frame_ids, logit_lengths, self.blank_id
        )
        return ids, lengths, score

    def __call__(self, params, features, feature_lengths) -> Nbest:
        ids, lengths, scores = self._decode(
            params, jnp.asarray(features), jnp.asarray(feature_lengths)
        )
        return Nbest(
            ids=np.asarray(ids)[:, None, :],
            lengths=np.asarray(lengths)[:, None],
            scores=np.asarray(scores)[:, None],
        )


@RECOGNIZERS.register("attention_greedy")
class AttentionGreedyRecognizer(Recognizer):
    """Autoregressive argmax decode of an attention Speller head."""

    def __init__(self, conf, model, head=None):
        super().__init__(conf, model, head)
        if not hasattr(self.decoder, "step"):
            raise ValueError(
                f"head {self.head!r} is not autoregressive"
            )
        self.max_steps = conf.getint("max_steps", 0)
        self.length_ratio = conf.getfloat("max_length_ratio", 1.0)
        self._decode = jax.jit(self._decode_impl)

    def _decode_impl(self, params, features, feature_lengths):
        encoded, enc_lengths = self.model.encode(
            params, features, feature_lengths
        )
        B, T, _ = encoded.shape
        dec = self.decoder
        # cast like Model.apply so step dtypes match the bf16 state
        dparams = self.model._cast_in(params["decoders"][self.head])
        enc_mask = sequence_mask(enc_lengths, T)
        max_steps = self.max_steps or max(
            int(T * self.length_ratio), 8
        )
        keys = (
            dec.precompute(dparams, encoded)
            if hasattr(dec, "precompute") else None
        )

        def step_fn(carry, _):
            prev, state, finished, score = carry
            logits, new_state = dec.step(
                dparams, prev, state, encoded, enc_mask, keys=keys
            )
            new_state.pop("attn_weights", None)
            # score in float32 regardless of compute dtype
            logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            nxt = jnp.argmax(logprobs, -1).astype(jnp.int32)
            step_score = jnp.take_along_axis(
                logprobs, nxt[:, None], axis=1
            )[:, 0]
            score = score + jnp.where(finished, 0.0, step_score)
            out = jnp.where(finished, dec.eos_id, nxt)
            finished = finished | (nxt == dec.eos_id)
            return (out, new_state, finished, score), out

        init = (
            jnp.full((B,), dec.sos_id, jnp.int32),
            dec.init_state(B, encoded.dtype, enc_frames=T),
            jnp.zeros((B,), bool),
            jnp.zeros((B,), jnp.float32),
        )
        (_, _, _, scores), ids = jax.lax.scan(
            step_fn, init, None, length=max_steps
        )
        ids = jnp.swapaxes(ids, 0, 1)  # [B, max_steps]
        is_eos = ids == dec.eos_id
        lengths = jnp.where(
            is_eos.any(axis=1),
            jnp.argmax(is_eos, axis=1),
            ids.shape[1],
        ).astype(jnp.int32)
        return ids, lengths, scores

    def __call__(self, params, features, feature_lengths) -> Nbest:
        ids, lengths, scores = self._decode(
            params, jnp.asarray(features), jnp.asarray(feature_lengths)
        )
        return Nbest(
            ids=np.asarray(ids)[:, None, :],
            lengths=np.asarray(lengths)[:, None],
            scores=np.asarray(scores)[:, None],
        )


@RECOGNIZERS.register("attention_beam")
@RECOGNIZERS.register("beam")
class AttentionBeamRecognizer(Recognizer):
    """Batched attention beam search (reference:
    decoders/beam_search_decoder.py). conf: beam_width, nbest,
    max_steps / max_length_ratio, length_norm_power, eos_bonus."""

    supports_lm_fusion = True

    def __init__(self, conf, model, head=None):
        super().__init__(conf, model, head)
        if not hasattr(self.decoder, "step"):
            raise ValueError(f"head {self.head!r} is not autoregressive")
        self.beam_width = conf.getint("beam_width", 4)
        self.nbest = min(conf.getint("nbest", 1), self.beam_width)
        self.max_steps = conf.getint("max_steps", 0)
        self.length_ratio = conf.getfloat("max_length_ratio", 1.0)
        self.length_norm_power = conf.getfloat("length_norm_power", 0.0)
        self.eos_bonus = conf.getfloat("eos_bonus", 0.0)
        self._decode = jax.jit(self._decode_impl)

    def _decode_impl(self, params, features, feature_lengths):
        from nabu_tpu.decoding.beam import attention_beam_search

        encoded, enc_lengths = self.model.encode(
            params, features, feature_lengths
        )
        max_steps = self.max_steps or max(
            int(encoded.shape[1] * self.length_ratio), 8
        )
        return attention_beam_search(
            self.decoder,
            self.model._cast_in(params["decoders"][self.head]),
            encoded,
            enc_lengths,
            beam_width=self.beam_width,
            max_steps=max_steps,
            length_norm_power=self.length_norm_power,
            eos_bonus=self.eos_bonus,
            lm=self.lm,
            lm_weight=self.lm_weight,
        )

    def __call__(self, params, features, feature_lengths) -> Nbest:
        seqs, lengths, scores = self._decode(
            params, jnp.asarray(features), jnp.asarray(feature_lengths)
        )
        n = self.nbest
        return Nbest(
            ids=np.asarray(seqs)[:, :n],
            lengths=np.asarray(lengths)[:, :n],
            scores=np.asarray(scores)[:, :n],
        )


@RECOGNIZERS.register("ctc_beam")
class CTCBeamRecognizer(Recognizer):
    """Batched CTC prefix beam search (reference: ctc_decoder.py).
    conf: beam_width, nbest, max_label_len."""

    supports_lm_fusion = True

    def __init__(self, conf, model, head=None):
        super().__init__(conf, model, head)
        if not hasattr(self.decoder, "blank_id"):
            raise ValueError(
                f"head {self.head!r} ({type(self.decoder).__name__}) is "
                "not a frame-synchronous CTC head — point this "
                "recognizer at the CTC head (`head = ctc`) or use an "
                "attention/transducer recognizer"
            )
        self.blank_id = self.decoder.blank_id
        self.beam_width = conf.getint("beam_width", 4)
        self.nbest = min(conf.getint("nbest", 1), self.beam_width)
        self.max_label_len = conf.getint("max_label_len", 0)
        self._decode = jax.jit(self._decode_impl)

    def _decode_impl(self, params, features, feature_lengths):
        from nabu_tpu.decoding.ctc_beam import ctc_prefix_beam_search

        outputs = self.model.apply(
            params, features, feature_lengths, heads=(self.head,)
        )
        logits, logit_lengths = outputs[self.head]
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        return ctc_prefix_beam_search(
            logprobs,
            logit_lengths,
            beam_width=self.beam_width,
            blank_id=self.blank_id,
            max_label_len=self.max_label_len or None,
            lm=self.lm,
            lm_weight=self.lm_weight,
        )

    def __call__(self, params, features, feature_lengths) -> Nbest:
        seqs, lengths, scores = self._decode(
            params, jnp.asarray(features), jnp.asarray(feature_lengths)
        )
        n = self.nbest
        return Nbest(
            ids=np.asarray(seqs)[:, :n],
            lengths=np.asarray(lengths)[:, :n],
            scores=np.asarray(scores)[:, :n],
        )


@RECOGNIZERS.register("transducer_greedy")
@RECOGNIZERS.register("rnnt_greedy")
class TransducerGreedyRecognizer(Recognizer):
    """Batched RNN-T greedy search over a transducer head (beyond-parity;
    decoding/transducer.py). conf: max_symbols (per-frame emission
    budget, default 4), max_label_len (output cap)."""

    def __init__(self, conf, model, head=None):
        super().__init__(conf, model, head)
        if not hasattr(self.decoder, "joint_step"):
            raise ValueError(
                f"head {self.head!r} is not a transducer head"
            )
        self.max_symbols = conf.getint("max_symbols", 4)
        self.max_label_len = conf.getint("max_label_len", 0)
        self._decode = jax.jit(self._decode_impl)

    def _decode_impl(self, params, features, feature_lengths):
        from nabu_tpu.decoding.transducer import transducer_greedy_search

        encoded, enc_lengths = self.model.encode(
            params, features, feature_lengths
        )
        return transducer_greedy_search(
            self.decoder,
            self.model._cast_in(params["decoders"][self.head]),
            encoded,
            enc_lengths,
            max_symbols=self.max_symbols,
        )

    def __call__(self, params, features, feature_lengths) -> Nbest:
        ids, lengths, scores = self._decode(
            params, jnp.asarray(features), jnp.asarray(feature_lengths)
        )
        ids, lengths = np.asarray(ids), np.asarray(lengths)
        if self.max_label_len and ids.shape[1] > self.max_label_len:
            ids = ids[:, : self.max_label_len]
            lengths = np.minimum(lengths, self.max_label_len)
        return Nbest(
            ids=ids[:, None, :],
            lengths=lengths[:, None],
            scores=np.asarray(scores)[:, None],
        )


def _distinct_first_order(seqs: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Per-row beam reordering that moves duplicate label sequences
    behind the distinct ones (stable within each group).

    An alignment-path beam (transducer_beam_search) can hold the same
    label sequence in several slots via different blank placements;
    slicing its top-n as "n-best" would then under-deliver distinct
    hypotheses. Returns order [B, W] of slot indices.
    """
    B, W = lengths.shape
    order = np.empty((B, W), np.int64)
    for b in range(B):
        seen, distinct, dups = set(), [], []
        for w in range(W):
            key = tuple(seqs[b, w, : lengths[b, w]])
            (dups if key in seen else distinct).append(w)
            seen.add(key)
        order[b] = distinct + dups
    return order


@RECOGNIZERS.register("transducer_beam")
@RECOGNIZERS.register("rnnt_beam")
class TransducerBeamRecognizer(Recognizer):
    """Batched time-synchronous RNN-T beam search (beyond-parity;
    decoding/transducer.py). conf: beam_width, nbest, max_symbols,
    length_norm_power, max_label_len."""

    supports_lm_fusion = True

    def __init__(self, conf, model, head=None):
        super().__init__(conf, model, head)
        if not hasattr(self.decoder, "joint_step"):
            raise ValueError(
                f"head {self.head!r} is not a transducer head"
            )
        self.beam_width = conf.getint("beam_width", 4)
        self.nbest = min(conf.getint("nbest", 1), self.beam_width)
        self.max_symbols = conf.getint("max_symbols", 4)
        self.length_norm_power = conf.getfloat("length_norm_power", 0.0)
        self.max_label_len = conf.getint("max_label_len", 0)
        self._decode = jax.jit(self._decode_impl)

    def _decode_impl(self, params, features, feature_lengths):
        from nabu_tpu.decoding.transducer import transducer_beam_search

        encoded, enc_lengths = self.model.encode(
            params, features, feature_lengths
        )
        return transducer_beam_search(
            self.decoder,
            self.model._cast_in(params["decoders"][self.head]),
            encoded,
            enc_lengths,
            beam_width=self.beam_width,
            max_symbols=self.max_symbols,
            length_norm_power=self.length_norm_power,
            lm=self.lm,
            lm_weight=self.lm_weight,
        )

    def __call__(self, params, features, feature_lengths) -> Nbest:
        seqs, lengths, scores = self._decode(
            params, jnp.asarray(features), jnp.asarray(feature_lengths)
        )
        seqs, lengths, scores = (
            np.asarray(seqs), np.asarray(lengths), np.asarray(scores)
        )
        take = _distinct_first_order(seqs, lengths)[:, : self.nbest]
        seqs = np.take_along_axis(seqs, take[..., None], axis=1)
        lengths = np.take_along_axis(lengths, take, axis=1)
        scores = np.take_along_axis(scores, take, axis=1)
        if self.max_label_len and seqs.shape[2] > self.max_label_len:
            seqs = seqs[:, :, : self.max_label_len]
            lengths = np.minimum(lengths, self.max_label_len)
        return Nbest(ids=seqs, lengths=lengths, scores=scores)


@RECOGNIZERS.register("transducer_streaming")
@RECOGNIZERS.register("rnnt_streaming")
class TransducerStreamingRecognizer(Recognizer):
    """Chunked streaming RNN-T greedy decode (decoding/streaming.py),
    exposed as a batch recognizer so `run test`/`run decode` can drive
    the streaming path; output equals transducer_greedy exactly (the
    forward-only encoder has no lookahead). conf: chunk_frames,
    max_symbols."""

    def __init__(self, conf, model, head=None):
        super().__init__(conf, model, head)
        from nabu_tpu.decoding.streaming import StreamingTransducer

        self.streamer = StreamingTransducer(
            model,
            head=self.head,
            chunk_frames=conf.getint("chunk_frames", 32),
            max_symbols=conf.getint("max_symbols", 4),
        )

    def __call__(self, params, features, feature_lengths) -> Nbest:
        feats = jnp.asarray(features)
        lengths = jnp.asarray(feature_lengths, jnp.int32)
        B, T, _ = feats.shape
        C = self.streamer.chunk_frames
        Tpad = max(((T + C - 1) // C) * C, C)
        feats = jnp.pad(feats, ((0, 0), (0, Tpad - T), (0, 0)))
        state = self.streamer.start(params, batch=B)
        toks = [[] for _ in range(B)]
        for c0 in range(0, Tpad, C):
            valid = jnp.clip(lengths - c0, 0, C)
            new, state = self.streamer.feed(
                params, state, feats[:, c0:c0 + C], valid
            )
            for b in range(B):
                toks[b].extend(new[b])
        scores = np.asarray(state["dec"][2])
        L = max(max((len(t) for t in toks), default=1), 1)
        ids = np.zeros((B, 1, L), np.int64)
        lens = np.zeros((B, 1), np.int64)
        for b, t in enumerate(toks):
            ids[b, 0, : len(t)] = t
            lens[b, 0] = len(t)
        return Nbest(ids=ids, lengths=lens, scores=scores[:, None])


@RECOGNIZERS.register("joint_ctc_att_beam")
@RECOGNIZERS.register("joint_beam")
class JointCTCAttBeamRecognizer(Recognizer):
    """One-pass hybrid CTC/attention beam search over a multi-head
    model (decoding/joint.py — beyond-parity; the proper decoder for
    the joint CTC/attention flagship). conf: att_head, ctc_head,
    ctc_weight, beam_width, nbest, pre_beam, max_steps /
    max_length_ratio, length_norm_power, lm_path/lm_weight."""

    supports_lm_fusion = True

    def __init__(self, conf, model, head=None):
        att_head = head or conf.get("att_head") or conf.get("head")
        att = att_head or next(
            (n for n, d in model.decoders.items() if hasattr(d, "step")),
            None,
        )
        if att is None or not hasattr(model.decoders[att], "step"):
            raise ValueError("joint decoding needs an attention head")
        super().__init__(conf, model, att)
        ctc = conf.get("ctc_head") or next(
            (n for n, d in model.decoders.items()
             if getattr(d, "default_loss", None) == "ctc"),
            None,
        )
        if ctc is None:
            raise ValueError("joint decoding needs a CTC head")
        self.ctc_head = ctc
        self.ctc_decoder = model.decoders[ctc]
        self.ctc_weight = conf.getfloat("ctc_weight", 0.3)
        self.beam_width = conf.getint("beam_width", 4)
        self.nbest = min(conf.getint("nbest", 1), self.beam_width)
        self.pre_beam = conf.getint("pre_beam", 0)
        self.max_steps = conf.getint("max_steps", 0)
        self.length_ratio = conf.getfloat("max_length_ratio", 1.0)
        self.length_norm_power = conf.getfloat("length_norm_power", 0.0)
        self._decode = jax.jit(self._decode_impl)

    def _decode_impl(self, params, features, feature_lengths):
        from nabu_tpu.decoding.joint import joint_ctc_att_beam_search

        encoded, enc_lengths = self.model.encode(
            params, features, feature_lengths
        )
        ctc_logits, _ = self.model.decoders[self.ctc_head].apply(
            self.model._cast_in(params["decoders"][self.ctc_head]),
            encoded, enc_lengths,
        )
        ctc_lp = jax.nn.log_softmax(
            ctc_logits.astype(jnp.float32), axis=-1
        )
        max_steps = self.max_steps or max(
            int(encoded.shape[1] * self.length_ratio), 8
        )
        return joint_ctc_att_beam_search(
            self.decoder,
            self.model._cast_in(params["decoders"][self.head]),
            encoded,
            enc_lengths,
            ctc_lp,
            beam_width=self.beam_width,
            max_steps=max_steps,
            ctc_weight=self.ctc_weight,
            pre_beam=self.pre_beam,
            length_norm_power=self.length_norm_power,
            blank_id=getattr(
                self.ctc_decoder, "blank_id", ctc_lp.shape[-1] - 1
            ),
            lm=self.lm,
            lm_weight=self.lm_weight,
        )

    def __call__(self, params, features, feature_lengths) -> Nbest:
        seqs, lengths, scores = self._decode(
            params, jnp.asarray(features), jnp.asarray(feature_lengths)
        )
        n = self.nbest
        return Nbest(
            ids=np.asarray(seqs)[:, :n],
            lengths=np.asarray(lengths)[:, :n],
            scores=np.asarray(scores)[:, :n],
        )


@RECOGNIZERS.register("attention_rescoring")
@RECOGNIZERS.register("ctc_att_rescoring")
class AttentionRescoringRecognizer(Recognizer):
    """Two-pass decoding over a multi-head model (beyond-parity,
    WeNet-style): pass 1 decodes an n-best list with the CTC prefix
    beam; pass 2 scores every hypothesis with the attention decoder
    teacher-forced in ONE batched call ([B*W] hypotheses at once) and
    re-ranks by ctc_weight * ctc + (1 - ctc_weight) * attention.
    Cheaper than the one-pass joint beam (no per-step CTC scorer state)
    while still letting both heads vote. conf: beam_width, nbest,
    ctc_weight, att_head, ctc_head, max_label_len."""

    def __init__(self, conf, model, head=None):
        att = head or conf.get("att_head") or conf.get("head") or next(
            (n for n, d in model.decoders.items() if hasattr(d, "step")),
            None,
        )
        if att is None or not hasattr(model.decoders[att], "step"):
            raise ValueError("attention rescoring needs an attention head")
        super().__init__(conf, model, att)
        ctc = conf.get("ctc_head") or next(
            (n for n, d in model.decoders.items()
             if getattr(d, "default_loss", None) == "ctc"),
            None,
        )
        if ctc is None:
            raise ValueError("attention rescoring needs a CTC head")
        self.ctc_head = ctc
        self.blank_id = getattr(
            model.decoders[ctc], "blank_id",
            model.decoders[ctc].output_dim - 1,
        )
        self.ctc_weight = conf.getfloat("ctc_weight", 0.5)
        self.beam_width = conf.getint("beam_width", 8)
        self.nbest = min(conf.getint("nbest", 1), self.beam_width)
        self.max_label_len = conf.getint("max_label_len", 0)
        self._decode = jax.jit(self._decode_impl)

    def _decode_impl(self, params, features, feature_lengths):
        from nabu_tpu.decoding.ctc_beam import ctc_prefix_beam_search

        encoded, enc_lengths = self.model.encode(
            params, features, feature_lengths
        )
        ctc_logits, logit_lengths = self.model.decoders[
            self.ctc_head
        ].apply(
            self.model._cast_in(params["decoders"][self.ctc_head]),
            encoded, enc_lengths,
        )
        logprobs = jax.nn.log_softmax(
            ctc_logits.astype(jnp.float32), axis=-1
        )
        seqs, lengths, ctc_scores = ctc_prefix_beam_search(
            logprobs, logit_lengths,
            beam_width=self.beam_width, blank_id=self.blank_id,
            max_label_len=self.max_label_len or None,
        )  # [B, W, L], [B, W], [B, W]

        # pass 2: teacher-forced attention score of every hypothesis
        B, W, L = seqs.shape
        dec = self.decoder
        dparams = self.model._cast_in(params["decoders"][self.head])
        enc_rep = jnp.repeat(encoded, W, axis=0)
        len_rep = jnp.repeat(enc_lengths, W, axis=0)
        hyp = seqs.reshape(B * W, L)
        hyp_len = lengths.reshape(B * W)
        logits, _ = dec.apply(
            dparams, enc_rep, len_rep, hyp, hyp_len
        )  # [B*W, L+1, V] — step t predicts hyp[t], step len predicts eos
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = jnp.concatenate(
            [hyp, jnp.zeros((B * W, 1), hyp.dtype)], axis=1
        )
        pos = jnp.arange(L + 1)[None, :]
        tgt = jnp.where(pos == hyp_len[:, None], dec.eos_id, tgt)
        tok_lp = jnp.take_along_axis(
            lp, tgt[..., None].astype(jnp.int32), axis=-1
        )[..., 0]
        att_scores = jnp.sum(
            jnp.where(pos <= hyp_len[:, None], tok_lp, 0.0), axis=1
        ).reshape(B, W)

        combined = (
            self.ctc_weight * ctc_scores
            + (1.0 - self.ctc_weight) * att_scores
        )
        # dead CTC slots stay dead
        combined = jnp.where(
            ctc_scores < NEG_INF / 2, NEG_INF, combined
        )
        order = jnp.argsort(-combined, axis=1)
        take = lambda x: jnp.take_along_axis(x, order, axis=1)
        return (
            jnp.take_along_axis(seqs, order[..., None], axis=1),
            take(lengths),
            take(combined),
        )

    def __call__(self, params, features, feature_lengths) -> Nbest:
        seqs, lengths, scores = self._decode(
            params, jnp.asarray(features), jnp.asarray(feature_lengths)
        )
        n = self.nbest
        return Nbest(
            ids=np.asarray(seqs)[:, :n],
            lengths=np.asarray(lengths)[:, :n],
            scores=np.asarray(scores)[:, :n],
        )


def build_recognizer(conf: Conf, model) -> Recognizer:
    """Factory by conf['recognizer'] (reference: decoder_factory.py)."""
    return RECOGNIZERS.build(conf.get("recognizer", "ctc_greedy"), conf, model)
