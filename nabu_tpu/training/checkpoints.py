"""Checkpointing: latest/best separation, resume, warm-start.

Capability parity with the reference trainer's tf.train.Saver behavior
(periodic saves via MonitoredTrainingSession, a separately kept
best-validated model, ``resume_training``, and the LoadAtBegin
warm-start hook — SURVEY.md §5 checkpoint/resume). Built on orbax:
``latest/`` holds the rolling training state (params, opt_state, step,
lr_scale, ...); ``best/`` holds the best-on-dev snapshot. Each
top-level state key is its own orbax sub-checkpoint, so restoring a
subset (e.g. params only, for test/decode or warm-start) needs no
full-tree template.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

LATEST = "latest"
BEST = "best"


def _is_scalar(value) -> bool:
    if isinstance(value, (int, float, np.number)):
        return True
    return hasattr(value, "shape") and getattr(value, "ndim", None) == 0


class CheckpointManager:
    """``use_async=True`` backgrounds the disk write (orbax
    AsyncCheckpointer): ``save`` returns after the host-side copy and
    training proceeds while the write completes; the atomic rename into
    place is deferred to the next checkpoint operation (or an explicit
    ``wait_until_finished``). The reference's tf.train.Saver always
    blocked the session — SURVEY.md §5 names async checkpointing as
    this framework's recovery-story upgrade."""

    def __init__(self, directory: str, use_async: bool = False):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self._use_async = use_async
        self._async_ckptr = (
            ocp.AsyncCheckpointer(ocp.CompositeCheckpointHandler())
            if use_async
            else None
        )
        self._pending = None  # (tmp, path, name) of an in-flight save

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def _barrier(self, tag: str) -> None:
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(tag)

    def _finalize_pending(self) -> None:
        """Wait for an in-flight async save and atomically publish it."""
        if self._pending is None:
            return
        tmp, path, name = self._pending
        self._pending = None
        self._async_ckptr.wait_until_finished()
        if jax.process_index() == 0:
            if os.path.exists(path):
                shutil.rmtree(path)
            os.replace(tmp, path)
        self._barrier(f"ckpt_post_{name}")

    def wait_until_finished(self) -> None:
        """Block until any in-flight async save is durable and visible."""
        self._finalize_pending()

    def save(self, name: str, state: Dict[str, Any]) -> None:
        """Atomically save a dict of pytrees, one sub-checkpoint per key.

        Multi-host: orbax's save is collective, so EVERY process must
        call this with the same (host-local numpy) state; orbax lets the
        primary do the writing and barriers internally. The final
        atomic rename is primary-only, with a group barrier around it
        (shared-filesystem expdir assumed, as with the reference's
        shared expdir contract).
        """
        self._finalize_pending()
        primary = jax.process_index() == 0
        path = self._path(name)
        tmp = path + ".tmp"
        if primary and os.path.exists(tmp):
            shutil.rmtree(tmp)
        self._barrier(f"ckpt_pre_{name}")
        # wrap scalars so every sub-checkpoint is a pytree of arrays
        trees = {
            key: {"value": np.asarray(v)} if _is_scalar(v) else v
            for key, v in state.items()
        }
        if self._use_async:
            self._async_ckptr.save(
                tmp,
                args=ocp.args.Composite(**{
                    k: ocp.args.StandardSave(t) for k, t in trees.items()
                }),
            )
            self._pending = (tmp, path, name)
            return
        for key, tree in trees.items():
            self._ckptr.save(os.path.join(tmp, key), tree)
        self._ckptr.wait_until_finished()
        if primary:
            if os.path.exists(path):
                shutil.rmtree(path)
            os.replace(tmp, path)
        self._barrier(f"ckpt_post_{name}")

    def exists(self, name: str) -> bool:
        self._finalize_pending()
        return os.path.isdir(self._path(name))

    def restore(self, name: str, template: Dict[str, Any]) -> Dict[str, Any]:
        """Restore the keys present in ``template`` (partial by design)."""
        self._finalize_pending()
        out = {}
        for key, value in template.items():
            sub = os.path.join(self._path(name), key)
            if not os.path.isdir(sub):
                out[key] = value  # key absent in checkpoint: keep template
                continue
            if _is_scalar(value):
                arr = np.asarray(value)
                restored = self._ckptr.restore(
                    sub,
                    {"value": jax.ShapeDtypeStruct(arr.shape, arr.dtype)},
                )
                out[key] = restored["value"]
            else:
                abstract = jax.tree.map(
                    lambda x: ocp.utils.to_shape_dtype_struct(x)
                    if hasattr(x, "shape")
                    else x,
                    value,
                )
                out[key] = self._ckptr.restore(sub, abstract)
        return out

    def save_latest(self, state):
        self.save(LATEST, state)

    def save_best(self, state):
        self.save(BEST, state)


def warm_start(params, pretrained_dir: str, subtree: Optional[str] = None):
    """Load pretrained params (reference LoadAtBegin hook): overwrite
    matching leaves of ``params`` from a ``best`` checkpoint at
    ``pretrained_dir``; ``subtree`` restricts to e.g. 'encoder'."""
    mgr = CheckpointManager(pretrained_dir)
    name = BEST if mgr.exists(BEST) else LATEST
    loaded = mgr.restore(name, {"params": params})["params"]
    if subtree is None:
        return loaded
    out = dict(params)
    out[subtree] = loaded[subtree]
    return out
