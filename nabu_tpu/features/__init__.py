"""Feature extraction (reference layer L1, nabu/processing/feature_computers/).

``sigproc`` holds the numpy signal-processing primitives (framing,
pre-emphasis, windowing, spectra); ``computers`` holds the config-driven
feature computers (fbank, mfcc, frames, spec); ``jax_frontend`` is the
device-side JAX/Pallas STFT+Mel path used in-graph, golden-tested against
the numpy computers.
"""

from nabu_tpu.features import computers as _computers  # noqa: F401  (registers)
from nabu_tpu.features.computers import make_feature_computer  # noqa: F401
