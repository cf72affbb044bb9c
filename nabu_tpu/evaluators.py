"""Evaluators: dev-set loss and decode-based error rate.

Capability parity with nabu/neuralnetworks/evaluators/ (LossEvaluator,
DecoderEvaluator + evaluator_factory): an evaluator is built from a
validation/test evaluator config section and maps trained params to a
scalar metric (lower is better) — used for validation-driven early
stopping and for `run test` scoring.
"""

from __future__ import annotations

from typing import List

import jax

from nabu_tpu.config import Conf
from nabu_tpu.data.pipeline import BucketedLoader, batch_to_arrays
from nabu_tpu.decoding.recognizers import build_recognizer
from nabu_tpu.decoding.scorer import error_rate
from nabu_tpu.ops.losses import make_loss_computer
from nabu_tpu.registry import EVALUATORS


class Evaluator:
    def __init__(self, conf: Conf, model, loader: BucketedLoader):
        self.conf = conf
        self.model = model
        self.loader = loader

    def evaluate(self, params) -> float:
        raise NotImplementedError

    def __call__(self, params) -> float:
        return self.evaluate(params)


@EVALUATORS.register("loss")
class LossEvaluator(Evaluator):
    """Mean loss over the dev set (reference: loss evaluator)."""

    def __init__(self, conf, model, loader):
        super().__init__(conf, model, loader)
        loss_fn = make_loss_computer(model)
        self._eval_step = jax.jit(
            lambda params, batch, rng: loss_fn(params, batch, rng, False)[0]
        )

    def evaluate(self, params) -> float:
        total = 0.0
        count = 0
        rng = jax.random.PRNGKey(0)
        for batch in self.loader.epoch(0, shuffle=False):
            loss = self._eval_step(params, batch_to_arrays(batch), rng)
            n = int(batch.example_mask.sum())
            total += float(loss) * n
            count += n
        return total / max(count, 1)


@EVALUATORS.register("decoder")
@EVALUATORS.register("error_rate")
class DecoderEvaluator(Evaluator):
    """Run a recognizer over the dev set, return token error rate
    (CER/PER/WER depending on the target unit — reference: decoder
    evaluator)."""

    def __init__(self, conf, model, loader):
        super().__init__(conf, model, loader)
        self.recognizer = build_recognizer(conf, model)

    def evaluate(self, params) -> float:
        refs: List[List[int]] = []
        hyps: List[List[int]] = []
        for batch in self.loader.epoch(0, shuffle=False):
            result = self.recognizer(
                params, batch.features, batch.feature_lengths
            )
            for b in range(len(batch.utt_ids)):
                if not batch.example_mask[b]:
                    continue
                refs.append(
                    list(batch.targets[b, : batch.target_lengths[b]])
                )
                hyps.append(result.best(b))
        rate, _, _ = error_rate(refs, hyps)
        return rate


def build_evaluator(conf: Conf, model, loader) -> Evaluator:
    """Factory by conf['evaluator'] (reference: evaluator_factory.py)."""
    return EVALUATORS.build(conf.get("evaluator", "loss"), conf, model, loader)
