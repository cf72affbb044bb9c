"""Model components (reference layers L4-L5:
nabu/neuralnetworks/components/ and models/).

Models are functional pytree modules: a component object holds only
hyperparameters; ``init(key) -> params`` builds a nested-dict pytree and
``apply(params, ...)`` is pure, so the whole stack jits, vmaps, shards
(pjit partition rules walk the params dict) and differentiates.
"""

from nabu_tpu.models import encoders as _encoders  # noqa: F401 (registers)
from nabu_tpu.models import decoders as _decoders  # noqa: F401 (registers)
from nabu_tpu.models import transducer as _transducer  # noqa: F401 (registers)
from nabu_tpu.models.model import Model, build_model  # noqa: F401
