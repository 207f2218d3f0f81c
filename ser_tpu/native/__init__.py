"""Native host data-path: C padded-batch assembly with a numpy fallback.

Builds ``collate.c`` into a shared object on first import (cc -O3) and
exposes ``pad_time_major`` / ``pad_batch_first`` via ctypes. If no compiler
is available the module reports ``AVAILABLE = False`` and callers fall back
to the numpy path in ``ser_tpu.data.collate``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "collate.c")
_SO = os.path.join(_DIR, "_collate.so")

AVAILABLE = False
_lib = None


def _build():
    cmd = ["cc", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, AVAILABLE
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        _lib = ctypes.CDLL(_SO)
        _lib.pad_time_major.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p,
        ]
        _lib.pad_batch_first_f32.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
        ]
        _lib.pad_batch_first_i32.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
        ]
        AVAILABLE = True
    except Exception:
        AVAILABLE = False


_load()


def _ptrs(arrays):
    return (ctypes.c_void_p * len(arrays))(
        *[a.ctypes.data_as(ctypes.c_void_p) for a in arrays])


def pad_time_major(arrays, L: int, B: int) -> np.ndarray:
    """Ragged [T_b, D] float32 arrays -> zero-padded [L, B, D]."""
    arrays = [np.ascontiguousarray(a, dtype=np.float32) for a in arrays]
    D = arrays[0].shape[1]
    lens = np.asarray([a.shape[0] for a in arrays], dtype=np.int32)
    out = np.empty((L, B, D), dtype=np.float32)  # C writes every byte once
    _lib.pad_time_major(
        _ptrs(arrays),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(arrays), B, D, L, out.ctypes.data_as(ctypes.c_void_p))
    return out


def pad_batch_first(arrays, L: int, B: int, dtype=np.float32) -> np.ndarray:
    """Ragged [T_b] rows -> zero-padded [B, L] (float32 or int32)."""
    dtype = np.dtype(dtype)
    arrays = [np.ascontiguousarray(a, dtype=dtype) for a in arrays]
    lens = np.asarray([a.shape[0] for a in arrays], dtype=np.int32)
    out = np.zeros((B, L), dtype=dtype)
    fn = (_lib.pad_batch_first_f32 if dtype == np.float32
          else _lib.pad_batch_first_i32)
    fn(_ptrs(arrays),
       lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
       len(arrays), L, out.ctypes.data_as(ctypes.c_void_p))
    return out
