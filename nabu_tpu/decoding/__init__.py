"""Inference-side decoding (reference layer L7:
nabu/neuralnetworks/decoders/): greedy/max, CTC prefix beam search and
attention beam search, all batched and jit-compiled with beam state in
device memory (BASELINE.json:5), plus error-rate scoring."""

from nabu_tpu.decoding import recognizers as _recognizers  # noqa: F401
from nabu_tpu.decoding.recognizers import build_recognizer  # noqa: F401
