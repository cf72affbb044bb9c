"""Graph ops and losses (reference: nabu/neuralnetworks/components/ops.py
and the loss computers)."""
