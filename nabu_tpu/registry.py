"""Component registries.

The reference uses an abstract-base-class + ``*_factory.py`` pair for every
pluggable concept (feature computers, processors, encoders, decoders,
trainers, losses, evaluators, recognizers — see SURVEY.md §1 "pervasive
design idiom"). Here that capability is a single registry utility: each
component kind owns a ``Registry`` and classes self-register under the
config-visible name with a decorator.
"""

from __future__ import annotations

from typing import Callable, Dict, TypeVar

T = TypeVar("T")


class Registry:
    """A name -> class map for one pluggable component kind."""

    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, type] = {}

    def register(self, name: str) -> Callable[[T], T]:
        def deco(cls: T) -> T:
            key = name.lower()
            if key in self._entries:
                raise ValueError(
                    f"duplicate {self.kind} registration: {name!r}"
                )
            self._entries[key] = cls
            return cls

        return deco

    def get(self, name: str) -> type:
        key = str(name).lower()
        if key not in self._entries:
            raise KeyError(
                f"unknown {self.kind} {name!r}; available: "
                f"{sorted(self._entries)}"
            )
        return self._entries[key]

    def build(self, name: str, *args, **kwargs):
        return self.get(name)(*args, **kwargs)

    def names(self):
        return sorted(self._entries)


# One registry per pluggable concept in the reference.
FEATURE_COMPUTERS = Registry("feature computer")
PROCESSORS = Registry("processor")
TARGET_NORMALIZERS = Registry("target normalizer")
ENCODERS = Registry("encoder")
DECODERS = Registry("decoder")  # model-side decoders (speller, ctc head)
MODELS = Registry("model")
LOSSES = Registry("loss computer")
TRAINERS = Registry("trainer")
EVALUATORS = Registry("evaluator")
RECOGNIZERS = Registry("recognizer")  # inference-side decoders
