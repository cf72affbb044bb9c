"""Native (C++) components, loaded via ctypes.

The reference framework has no first-party native code (its kernels are
TensorFlow's); here the TPU compute path's native tier is Pallas
(nabu_tpu.ops.pallas) and this package holds the HOST-side native
pieces — currently the edit-distance scorer used by the decoder
evaluators' hot loop. The library is built lazily with g++ on first
import; every entry point has a pure-numpy fallback, so the framework
works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libnabu_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["bash", os.path.join(_DIR, "build.sh")],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.edit_distance_i32.restype = ctypes.c_int64
        lib.edit_distance_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.edit_distance_batch_i32.restype = ctypes.c_int64
        lib.edit_distance_batch_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.fbank_num_frames.restype = ctypes.c_int64
        lib.fbank_num_frames.argtypes = [ctypes.c_int64] * 3
        lib.fbank_f32.restype = ctypes.c_int32
        lib.fbank_f32.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_float, f32p, f32p, ctypes.c_int64,
            ctypes.c_int32, f32p,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _pack(seqs: List[Sequence[int]]) -> Tuple[np.ndarray, np.ndarray]:
    offsets = np.zeros(len(seqs) + 1, dtype=np.int64)
    for i, s in enumerate(seqs):
        offsets[i + 1] = offsets[i] + len(s)
    flat = np.empty(offsets[-1], dtype=np.int32)
    for i, s in enumerate(seqs):
        flat[offsets[i] : offsets[i + 1]] = np.asarray(s, dtype=np.int32)
    return flat, offsets


def edit_distance_batch(
    refs: List[Sequence[int]], hyps: List[Sequence[int]]
) -> Tuple[np.ndarray, int]:
    """Per-pair edit distances + total, via the native library.

    Raises RuntimeError if the library is unavailable — callers should
    check available() and fall back to the numpy scorer.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    rflat, roff = _pack(refs)
    hflat, hoff = _pack(hyps)
    out = np.zeros(len(refs), dtype=np.int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    total = lib.edit_distance_batch_i32(
        rflat.ctypes.data_as(i32p),
        roff.ctypes.data_as(i64p),
        hflat.ctypes.data_as(i32p),
        hoff.ctypes.data_as(i64p),
        len(refs),
        out.ctypes.data_as(i64p),
    )
    return out, int(total)


def fbank(
    signal: np.ndarray,
    frame_len: int,
    frame_step: int,
    nfft: int,
    preemph: float,
    win: np.ndarray,
    fb: np.ndarray,
    include_energy: bool = False,
) -> np.ndarray:
    """Log-mel fbank features via the native one-pass pipeline.

    ``win`` [frame_len] and ``fb`` [nfilt, nfft//2+1] come from
    features.sigproc so the geometry matches the numpy oracle exactly.
    Requires power-of-two nfft; raises RuntimeError if the library is
    unavailable or arguments are unsupported — callers fall back to the
    numpy path.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    signal = np.ascontiguousarray(signal, dtype=np.float32)
    win = np.ascontiguousarray(win, dtype=np.float32)
    fb = np.ascontiguousarray(fb, dtype=np.float32)
    nfilt = fb.shape[0]
    num_frames = lib.fbank_num_frames(len(signal), frame_len, frame_step)
    dim = nfilt + (1 if include_energy else 0)
    out = np.empty((num_frames, dim), dtype=np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    rc = lib.fbank_f32(
        signal.ctypes.data_as(f32p), len(signal), frame_len, frame_step,
        nfft, preemph, win.ctypes.data_as(f32p),
        fb.ctypes.data_as(f32p), nfilt,
        1 if include_energy else 0, out.ctypes.data_as(f32p),
    )
    if rc != 0:
        raise RuntimeError(f"native fbank unsupported arguments (rc={rc})")
    return out
