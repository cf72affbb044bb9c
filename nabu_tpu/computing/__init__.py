"""Cluster deployment glue (reference layer L8: nabu/computing/ with
its HTCondor submit files and static-SSH launcher).

On TPU there are no parameter servers to place: every host runs the
SAME ``run train --distributed`` command and ``jax.distributed`` forms
the group over DCN. This package provides the launchers:

- ``ssh_cluster``: parallel-SSH launch over a machine-list file (the
  reference's nabu/computing/static equivalent), plus cleanup;
- TPU pod slices: launch via
  ``gcloud compute tpus tpu-vm ssh <tpu> --worker=all --command=...``
  (each worker infers its process_id from the TPU metadata, so plain
  ``run train --distributed`` with no explicit ids works there — see
  scripts/train.py: jax.distributed.initialize() with no args
  auto-detects on Cloud TPU).
"""
