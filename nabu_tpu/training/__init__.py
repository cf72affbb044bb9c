"""Training (reference layer L6: nabu/neuralnetworks/trainers/)."""

from nabu_tpu.training.trainer import Trainer, build_trainer  # noqa: F401
