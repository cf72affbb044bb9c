"""Distributed execution (replaces reference layer L8, nabu/computing/:
the TF1 gRPC parameter-server runtime + HTCondor/SSH deployment glue).

TPU-native design: no parameter servers — one process per host joins a
``jax.distributed`` group over DCN; a ``jax.sharding.Mesh`` spans all
chips; gradients synchronize with psum over ICI (GSPMD inserts the
collectives from sharding annotations); larger-than-chip models shard
parameters over the ``model`` mesh axis via partition rules.
"""

from nabu_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    param_partition_specs,
    shard_batch,
    shard_params,
)
