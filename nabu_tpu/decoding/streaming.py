"""Streaming (chunked, incremental) RNN-T inference.

Beyond-parity capability: the transducer family is the streaming ASR
architecture, and this module makes that real — audio features are fed
chunk by chunk and label hypotheses come back incrementally, with the
encoder LSTM carries and the prediction-network state threaded between
chunks. Because a forward-only encoder has no lookahead and the greedy
search is frame-local, the concatenated streaming output is
NUMERICALLY IDENTICAL to offline decoding of the whole utterance
(tested in tests/test_streaming.py).

Requirements: an encoder with ``stream_init``/``stream_step`` (the
DBLSTM stack with ``bidirectional = false``) and a transducer head.
The per-chunk program is one fixed-shape jit: chunk size is a static
shape, so a session compiles once and every ``feed`` is a single device
dispatch — the latency profile streaming deployments need. A final
partial chunk is padded by the caller and masked via ``num_valid``
(masked frames leave every carry untouched).

Typical use::

    streamer = StreamingTransducer(model, chunk_frames=32)
    state = streamer.start(params, batch=1)
    for chunk, n in feature_chunks:          # [1, 32, F], valid count
        toks, state = streamer.feed(params, state, chunk, n)
        consume(toks[0])                     # incremental hypotheses
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class StreamingTransducer:
    """Chunked greedy RNN-T decoding over a forward-only encoder."""

    def __init__(self, model, head=None, chunk_frames: int = 32,
                 max_symbols: int = 4):
        self.model = model
        self.head = head or next(iter(model.decoders))
        self.decoder = model.decoders[self.head]
        self.encoder = model.encoder
        if not hasattr(self.encoder, "stream_step") or getattr(
            self.encoder, "bidirectional", True
        ):
            raise ValueError(
                "streaming needs a forward-only encoder "
                "(dblstm with bidirectional = false)"
            )
        if not hasattr(self.decoder, "joint_step"):
            raise ValueError(f"head {self.head!r} is not a transducer head")
        self.chunk_frames = chunk_frames
        self.max_symbols = max_symbols
        self._step = jax.jit(self._step_impl)

    def start(self, params, batch: int = 1):
        """Fresh stream state (encoder carries + decode carry)."""
        dtype = self.model.compute_dtype
        enc_state = self.encoder.stream_init(batch, dtype)
        dparams = self.model._cast_in(params["decoders"][self.head])
        pred_state = self.decoder.pred_init_state(batch, dtype)
        pred0, pred_state = self.decoder.pred_step(
            dparams, jnp.full((batch,), self.decoder.sos_id, jnp.int32),
            pred_state,
        )
        return {
            "enc": enc_state,
            "dec": (pred0, pred_state, jnp.zeros((batch,), jnp.float32)),
        }

    def _step_impl(self, params, state, chunk, num_valid):
        from nabu_tpu.decoding.transducer import transducer_greedy_search

        enc_params = self.model._cast_in(params["encoder"])
        dparams = self.model._cast_in(params["decoders"][self.head])
        chunk = self.model._cast_in(chunk)
        encoded, enc_state = self.encoder.stream_step(
            enc_params, chunk, num_valid, state["enc"]
        )
        ids, lengths, scores, dec = transducer_greedy_search(
            self.decoder, dparams, encoded, num_valid,
            max_symbols=self.max_symbols,
            init_carry=state["dec"], return_carry=True,
        )
        return ids, lengths, scores, {"enc": enc_state, "dec": dec}

    def feed(
        self, params, state, chunk, num_valid=None
    ) -> Tuple[List[List[int]], dict]:
        """Process one chunk [B, chunk_frames, F]; returns the NEW
        tokens per lane and the updated stream state. ``num_valid`` [B]
        masks a padded final chunk (default: all frames valid)."""
        chunk = jnp.asarray(chunk)
        B = chunk.shape[0]
        if chunk.shape[1] != self.chunk_frames:
            raise ValueError(
                f"chunk must have {self.chunk_frames} frames "
                f"(pad the last one and pass num_valid)"
            )
        if num_valid is None:
            num_valid = jnp.full((B,), self.chunk_frames, jnp.int32)
        ids, lengths, _, state = self._step(
            params, state, chunk, jnp.asarray(num_valid, jnp.int32)
        )
        ids, lengths = np.asarray(ids), np.asarray(lengths)
        return [list(ids[b, : lengths[b]]) for b in range(B)], state
