"""Scorer tests: numpy edit distance oracle vs the native C++ library,
CER/WER computation."""

import numpy as np
import pytest

from nabu_tpu.decoding import scorer


class TestEditDistance:
    @pytest.mark.parametrize("ref,hyp,want", [
        ([], [], 0),
        ([1, 2, 3], [1, 2, 3], 0),
        ([1, 2, 3], [], 3),
        ([], [1, 2], 2),
        ([1, 2, 3], [1, 3], 1),  # deletion
        ([1, 3], [1, 2, 3], 1),  # insertion
        ([1, 2, 3], [1, 9, 3], 1),  # substitution
        ([1, 2, 3, 4], [4, 3, 2, 1], 4),
    ])
    def test_known_values(self, ref, hyp, want):
        assert scorer.edit_distance(ref, hyp) == want

    def test_native_matches_numpy(self):
        from nabu_tpu import native

        if not native.available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(0)
        refs, hyps = [], []
        for _ in range(50):
            refs.append(list(rng.integers(0, 10, rng.integers(0, 30))))
            hyps.append(list(rng.integers(0, 10, rng.integers(0, 30))))
        per_pair, total = native.edit_distance_batch(refs, hyps)
        ref_dists = [scorer.edit_distance(r, h) for r, h in zip(refs, hyps)]
        np.testing.assert_array_equal(per_pair, ref_dists)
        assert total == sum(ref_dists)

    def test_error_rate(self):
        rate, errors, tokens = scorer.error_rate(
            [[1, 2, 3], [4, 5]], [[1, 2, 3], [4, 9]]
        )
        assert errors == 1 and tokens == 5
        assert rate == pytest.approx(0.2)

    def test_wer_cer_from_texts(self):
        assert scorer.wer_from_texts(["a b c"], ["a b c"]) == 0.0
        assert scorer.wer_from_texts(["a b c"], ["a x c"]) == pytest.approx(
            1 / 3
        )
        assert scorer.cer_from_texts(["abc"], ["axc"]) == pytest.approx(1 / 3)
