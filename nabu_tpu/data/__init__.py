"""Data preparation, storage and input pipeline (reference layers L2-L3:
nabu/processing/processors/, tfwriters/, tfreaders/, input_pipeline.py)."""

from nabu_tpu.data import processors as _processors  # noqa: F401 (registers)
