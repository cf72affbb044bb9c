"""Streaming RNN-T tests: chunked encoding and incremental greedy
decoding must equal the offline pass exactly (no lookahead in the
forward-only encoder, frame-local greedy search)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import nabu_tpu.models  # noqa: F401 (registers)
from nabu_tpu.config import Conf, ConfigFile
from nabu_tpu.models.model import build_model


def _streaming_model(input_dim=8, num_labels=4):
    cfg = ConfigFile({
        "encoder": Conf({
            "encoder": "dblstm", "num_layers": "2", "num_units": "12",
            "bidirectional": "false",
        }, "encoder"),
        "decoder": Conf({
            "decoder": "rnnt", "num_units": "10", "embed_dim": "6",
            "joint_units": "8",
        }, "decoder"),
    })
    model = build_model(cfg, input_dim=input_dim, num_labels=num_labels)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


class TestUnidirectionalEncoder:
    def test_output_dim_and_shapes(self):
        model, params = _streaming_model()
        assert model.encoder.output_dim == 12
        x = jnp.asarray(np.random.RandomState(0).randn(2, 9, 8), jnp.float32)
        out, lens = model.encoder.apply(params["encoder"], x,
                                        jnp.asarray([9, 5], np.int32))
        assert out.shape == (2, 9, 12)

    def test_chunked_equals_full(self):
        model, params = _streaming_model()
        enc = model.encoder
        rng = np.random.RandomState(1)
        B, T, F = 2, 12, 8
        x = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
        lengths = jnp.asarray([12, 7], np.int32)
        full, _ = enc.apply(params["encoder"], x, lengths)

        state = enc.stream_init(B)
        chunks = []
        C = 4
        for c0 in range(0, T, C):
            valid = jnp.clip(lengths - c0, 0, C)
            out, state = enc.stream_step(
                params["encoder"], x[:, c0:c0 + C], valid, state
            )
            chunks.append(out)
        streamed = jnp.concatenate(chunks, axis=1)
        np.testing.assert_allclose(
            np.asarray(streamed), np.asarray(full), atol=1e-5
        )

    def test_bidirectional_rejects_streaming(self):
        cfg = ConfigFile({
            "encoder": Conf({"encoder": "dblstm", "num_units": "8"},
                            "encoder"),
            "decoder": Conf({"decoder": "rnnt", "num_units": "8"},
                            "decoder"),
        })
        model = build_model(cfg, input_dim=4, num_labels=3)
        from nabu_tpu.decoding.streaming import StreamingTransducer

        with pytest.raises(ValueError):
            StreamingTransducer(model)


class TestStreamingTransducer:
    def test_streaming_equals_offline(self):
        from nabu_tpu.decoding.streaming import StreamingTransducer
        from nabu_tpu.decoding.transducer import transducer_greedy_search

        model, params = _streaming_model()
        rng = np.random.RandomState(2)
        B, T, F, C = 3, 22, 8, 8
        feats = jnp.asarray((rng.randn(B, T, F) * 1.5).astype(np.float32))
        lengths = jnp.asarray([22, 15, 9], np.int32)

        # offline
        encoded, enc_lens = model.encode(params, feats, lengths)
        off_ids, off_len, off_scores = transducer_greedy_search(
            model.decoders["decoder"],
            model._cast_in(params["decoders"]["decoder"]),
            encoded, enc_lens, max_symbols=3,
        )

        # streaming: pad to a whole number of chunks, mask the tail
        streamer = StreamingTransducer(
            model, chunk_frames=C, max_symbols=3
        )
        state = streamer.start(params, batch=B)
        Tpad = ((T + C - 1) // C) * C
        fpad = jnp.pad(feats, ((0, 0), (0, Tpad - T), (0, 0)))
        got = [[] for _ in range(B)]
        for c0 in range(0, Tpad, C):
            valid = jnp.clip(lengths - c0, 0, C)
            toks, state = streamer.feed(
                params, state, fpad[:, c0:c0 + C], valid
            )
            for b in range(B):
                got[b].extend(toks[b])
        final_scores = np.asarray(state["dec"][2])

        for b in range(B):
            want = list(np.asarray(off_ids)[b, : int(off_len[b])])
            assert got[b] == want, (b, got[b], want)
            assert abs(final_scores[b] - float(off_scores[b])) < 1e-4

    def test_streaming_recognizer_equals_greedy_recognizer(self):
        from nabu_tpu.decoding.recognizers import build_recognizer

        model, params = _streaming_model()
        rng = np.random.RandomState(4)
        feats = (rng.randn(2, 19, 8) * 1.5).astype(np.float32)
        lengths = np.asarray([19, 11], np.int32)
        greedy = build_recognizer(
            Conf({"recognizer": "transducer_greedy", "max_symbols": "3"}),
            model,
        )
        stream = build_recognizer(
            Conf({"recognizer": "transducer_streaming",
                  "chunk_frames": "7", "max_symbols": "3"}),
            model,
        )
        ref = greedy(params, feats, lengths)
        got = stream(params, feats, lengths)
        for b in range(2):
            assert got.best(b) == ref.best(b), b
            assert abs(
                float(got.scores[b, 0]) - float(ref.scores[b, 0])
            ) < 1e-4

    def test_incremental_prefix_property(self):
        """Tokens arrive monotonically: feeding chunk k never rewrites
        earlier output (guaranteed by construction; asserted anyway)."""
        from nabu_tpu.decoding.streaming import StreamingTransducer

        model, params = _streaming_model()
        rng = np.random.RandomState(3)
        B, C, F = 1, 6, 8
        streamer = StreamingTransducer(model, chunk_frames=C)
        state = streamer.start(params, batch=B)
        history = []
        for _ in range(4):
            chunk = jnp.asarray(rng.randn(B, C, F).astype(np.float32))
            toks, state = streamer.feed(params, state, chunk)
            history.extend(toks[0])
        # nothing here can shrink or mutate; just sanity-check types
        assert all(isinstance(t, (int, np.integer)) for t in history)
