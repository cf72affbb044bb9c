"""Pallas TPU kernels — the framework's native compute tier.

The reference's performance-critical kernels are TensorFlow's C++/CUDA
ops (SURVEY.md §2 native-components table); on TPU the native tier is
Pallas (BASELINE.json:5 names the STFT+filterbank, LSTM-scan and CTC
kernels explicitly). Every kernel here has a pure-JAX oracle in the
main ops/models modules and is golden-tested against it; kernels run in
interpret mode off-TPU so the test suite stays hardware-independent.
"""

import jax


def on_tpu() -> bool:
    """True when the default backend is a real TPU (compiled kernels)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
