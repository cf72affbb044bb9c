"""CTC forced alignment: Viterbi vs brute-force path enumeration,
batch-padding invariance, segment extraction, and the `run align`
script end-to-end."""

from itertools import product

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nabu_tpu.decoding.align import ctc_forced_align, segments_from_frames


def _collapse(path, blank):
    out = []
    prev = blank
    for p in path:
        if p != blank and p != prev:
            out.append(p)
        prev = p
    return out


def _brute_force(logprobs, target, blank):
    """Max-logprob frame path whose CTC collapse equals target."""
    T, V = logprobs.shape
    best_score, best_path = -np.inf, None
    for path in product(range(V), repeat=T):
        if _collapse(path, blank) != list(target):
            continue
        s = sum(logprobs[t, path[t]] for t in range(T))
        if s > best_score:
            best_score, best_path = s, list(path)
    return best_score, best_path


class TestViterbi:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_brute_force(self, seed):
        rng = np.random.RandomState(seed)
        T, V, blank = 5, 3, 2
        lp = np.asarray(
            jax.nn.log_softmax(
                jnp.asarray(rng.randn(1, T, V).astype(np.float32) * 2), -1
            )
        )
        target = [0, 1] if seed % 2 == 0 else [1, 1]
        ref_score, ref_path = _brute_force(lp[0], target, blank)

        frames, scores = ctc_forced_align(
            jnp.asarray(lp),
            jnp.asarray([T], np.int32),
            jnp.asarray([target], np.int32),
            jnp.asarray([len(target)], np.int32),
            blank,
        )
        np.testing.assert_allclose(float(scores[0]), ref_score, rtol=1e-5)
        assert list(np.asarray(frames)[0]) == ref_path

    def test_repeated_label_needs_blank_between(self):
        """Aligning [a, a] forces a blank frame between the two runs."""
        T, V, blank = 4, 2, 1
        lp = np.log(np.full((1, T, V), 0.5, np.float32))
        frames, _ = ctc_forced_align(
            jnp.asarray(lp), jnp.asarray([T], np.int32),
            jnp.asarray([[0, 0]], np.int32), jnp.asarray([2], np.int32),
            blank,
        )
        path = list(np.asarray(frames)[0])
        assert _collapse(path, blank) == [0, 0]
        first_end = path.index(0) + path[path.index(0):].index(blank)
        assert blank in path[first_end:]

    def test_batch_padding_invariance(self):
        """Each row of a ragged batch == the same row aligned alone."""
        rng = np.random.RandomState(7)
        V, blank = 4, 3
        lens = [6, 3]
        tgts = [[0, 1, 2], [2, 1]]
        T, U = max(lens), max(len(t) for t in tgts)
        lp = np.asarray(
            jax.nn.log_softmax(
                jnp.asarray(rng.randn(2, T, V).astype(np.float32) * 2), -1
            )
        )
        tgt_pad = np.zeros((2, U), np.int32)
        for i, t in enumerate(tgts):
            tgt_pad[i, : len(t)] = t
        frames, scores = ctc_forced_align(
            jnp.asarray(lp), jnp.asarray(lens, np.int32),
            jnp.asarray(tgt_pad),
            jnp.asarray([len(t) for t in tgts], np.int32), blank,
        )
        for i in range(2):
            fi, si = ctc_forced_align(
                jnp.asarray(lp[i : i + 1, : lens[i]]),
                jnp.asarray([lens[i]], np.int32),
                jnp.asarray([tgts[i]], np.int32),
                jnp.asarray([len(tgts[i])], np.int32),
                blank,
            )
            np.testing.assert_allclose(
                float(scores[i]), float(si[0]), rtol=1e-5
            )
            assert (
                list(np.asarray(frames)[i][: lens[i]])
                == list(np.asarray(fi)[0])
            )
            # padded frames are blank
            assert all(
                x == blank for x in np.asarray(frames)[i][lens[i]:]
            )

    def test_alignment_collapses_to_target(self):
        rng = np.random.RandomState(11)
        V, blank, T = 5, 4, 12
        lp = np.asarray(
            jax.nn.log_softmax(
                jnp.asarray(rng.randn(3, T, V).astype(np.float32)), -1
            )
        )
        tgts = np.asarray([[0, 1, 2], [3, 3, 0], [2, 2, 2]], np.int32)
        frames, scores = ctc_forced_align(
            jnp.asarray(lp), jnp.asarray([T] * 3, np.int32),
            jnp.asarray(tgts), jnp.asarray([3, 3, 3], np.int32), blank,
        )
        for i in range(3):
            assert _collapse(list(np.asarray(frames)[i]), blank) == list(
                tgts[i]
            )
            assert np.isfinite(float(scores[i]))


class TestSegments:
    def test_segments_from_frames(self):
        blank = 9
        row = np.asarray([9, 9, 0, 0, 9, 1, 1, 1, 9, 1])
        segs = segments_from_frames(row, 10, blank)
        assert segs == [(0, 2, 4), (1, 5, 8), (1, 9, 10)]
        # truncation by length
        assert segments_from_frames(row, 4, blank) == [(0, 2, 4)]
        assert segments_from_frames(row, 0, blank) == []


class TestAlignScript:
    def test_run_align_end_to_end(self, tmp_path):
        """Train a tiny CTC model on the synthetic corpus, then `run
        align` writes a CTM whose tokens equal each utterance's
        transcription in order."""
        from tests.corpus_utils import make_corpus, write_recipe
        from nabu_tpu.scripts import align as align_script
        from nabu_tpu.scripts import data as data_script
        from nabu_tpu.scripts import train as train_script

        root = tmp_path
        corpus = {
            "train": make_corpus(str(root / "train"), 12, seed=60),
            "dev": make_corpus(str(root / "dev"), 4, seed=61),
        }
        recipe = str(root / "recipe")
        write_recipe(
            recipe, corpus,
            "[model]\n\n[encoder]\nencoder = dnn\nnum_units = 32\n\n"
            "[decoder]\ndecoder = linear_ctc\nloss = ctc\n",
            "[trainer]\nfeatures = trainfeatures\ntargets = traintargets\n"
            "batch_size = 8\nnum_buckets = 1\nnum_steps = 3\n"
            "valid_frequency = 0\nlearning_rate = 1e-3\n",
        )
        expdir = str(root / "exp")
        data_script.main(recipe, expdir)
        train_script.main(recipe, expdir)
        out = align_script.main(recipe, expdir)

        import os

        assert os.path.exists(out)
        # group CTM rows by utt; tokens in time order == the transcript
        rows = {}
        for line in open(out):
            utt, _, start, dur, tok = line.split()
            rows.setdefault(utt, []).append((float(start), tok))
            assert float(dur) > 0.0
        text = {
            line.split()[0]: line.split()[1:]
            for line in open(corpus["dev"][1])
        }
        assert rows, "empty CTM"
        for utt, pairs in rows.items():
            toks = [t for _, t in sorted(pairs)]
            assert toks == text[utt], (utt, toks, text[utt])
