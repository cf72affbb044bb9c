"""nabu_tpu — a TPU-native end-to-end ASR framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference framework (vrenkens/nabu, a TF1-era end-to-end ASR toolkit):
Kaldi-style feature extraction, recipe-driven data preparation, bucketed
padded input pipelines, DBLSTM / pyramidal-Listener encoders with
attention-Speller and CTC heads, CTC + label-smoothed cross-entropy
training with validation-driven early stopping and LR backoff, and
jit-compiled batched greedy / CTC-prefix-beam / attention-beam decoding.

Capability map vs the reference (paths are reference-repo-relative; the
reference mount was empty at build time — see SURVEY.md §0 — so anchors
are public-repo paths, not file:line):

- nabu/processing/feature_computers/  -> nabu_tpu.features
- nabu/processing/processors/, tfwriters/, tfreaders/, input_pipeline.py
                                      -> nabu_tpu.data
- nabu/neuralnetworks/components/, models/ -> nabu_tpu.models
- CTC / cross-entropy loss computers  -> nabu_tpu.ops
- nabu/neuralnetworks/trainers/       -> nabu_tpu.training
- nabu/neuralnetworks/decoders/, evaluators/ -> nabu_tpu.decoding,
                                                nabu_tpu.evaluators
- nabu/computing/ (PS/gRPC clusters)  -> nabu_tpu.parallel (mesh/pjit/psum)
- nabu/scripts/ + run dispatcher      -> nabu_tpu.scripts + nabu_tpu.cli
"""

__version__ = "0.1.0"
