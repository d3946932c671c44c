"""ctypes bindings for the native C++ data-path ops (native/mmedema_native.cpp).

Builds the shared library on first use (``make`` in ``native/``); every
function has a numpy fallback so the framework runs without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmmedema_native.so")
_lib = None


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def load_native(build: bool = True):
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build:
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception as e:  # pragma: no cover
            print(f"[native] build failed ({e}); numpy fallback in use")
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.densify_events.restype = None
    lib.gather_windows.restype = None
    lib.decode_jpeg_batch.restype = None
    try:
        lib.decode_jpeg_batch_u8.restype = None
    except AttributeError:   # stale .so predating the u8 cache path
        pass
    _lib = lib
    return lib


def densify_events_native(offsets: np.ndarray, slot_idx: np.ndarray,
                          values: np.ndarray, counts: np.ndarray,
                          means: np.ndarray, stds: np.ndarray,
                          max_len: int, count_clip: int = 15,
                          n_threads: int = 4) -> Optional[np.ndarray]:
    lib = load_native()
    if lib is None:
        return None
    n_stays = len(offsets) - 1
    V = values.shape[1]
    out = np.empty((n_stays, max_len, 2 * V), np.float32)
    values = np.ascontiguousarray(values, np.float32)
    counts = np.ascontiguousarray(counts, np.int32)
    lib.densify_events(
        _i64p(np.ascontiguousarray(offsets, np.int64)),
        ctypes.c_int64(n_stays),
        _i32p(np.ascontiguousarray(slot_idx, np.int32)),
        _f32p(values), _i32p(counts), ctypes.c_int64(len(slot_idx)),
        ctypes.c_int32(V),
        _f32p(np.ascontiguousarray(means, np.float32)),
        _f32p(np.ascontiguousarray(stds, np.float32)),
        ctypes.c_int32(max_len), ctypes.c_int32(count_clip),
        _f32p(out), ctypes.c_int32(n_threads))
    return out


def gather_windows_native(grid: np.ndarray, stay_rows: np.ndarray,
                          slot_end: np.ndarray, T: int,
                          n_threads: int = 4) -> Optional[np.ndarray]:
    lib = load_native()
    if lib is None:
        return None
    S, L, C = grid.shape
    B = len(stay_rows)
    out = np.empty((B, T, C), np.float32)
    lib.gather_windows(
        _f32p(np.ascontiguousarray(grid, np.float32)), ctypes.c_int64(S),
        ctypes.c_int32(L), ctypes.c_int32(C),
        _i32p(np.ascontiguousarray(stay_rows, np.int32)),
        _i32p(np.ascontiguousarray(slot_end, np.int32)),
        ctypes.c_int32(T), ctypes.c_int64(B), _f32p(out),
        ctypes.c_int32(n_threads))
    return out


def decode_jpeg_batch_native(blobs: list, side: int, mean, std,
                             n_threads: int = 4
                             ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """list of JPEG byte strings → ([N, side, side, 3] float32, status)."""
    lib = load_native()
    if lib is None:
        return None
    offsets = np.zeros(len(blobs) + 1, np.int64)
    for i, b in enumerate(blobs):
        offsets[i + 1] = offsets[i] + len(b)
    blob = np.frombuffer(b"".join(blobs), np.uint8)
    out = np.zeros((len(blobs), side, side, 3), np.float32)
    status = np.zeros(len(blobs), np.int32)
    lib.decode_jpeg_batch(
        blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _i64p(offsets), ctypes.c_int64(len(blobs)), ctypes.c_int32(side),
        _f32p(np.asarray(mean, np.float32)),
        _f32p(np.asarray(std, np.float32)),
        _f32p(out), _i32p(status), ctypes.c_int32(n_threads))
    return out, status


def decode_jpeg_batch_u8_native(blobs: list, side: int, n_threads: int = 4
                                ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """list of JPEG byte strings → ([N, side, side, 3] uint8, status) —
    the decode-once cache-fill path (no normalization; device normalizes)."""
    lib = load_native()
    if lib is None or not hasattr(lib, "decode_jpeg_batch_u8"):
        return None
    offsets = np.zeros(len(blobs) + 1, np.int64)
    for i, b in enumerate(blobs):
        offsets[i + 1] = offsets[i] + len(b)
    blob = np.frombuffer(b"".join(blobs), np.uint8)
    out = np.zeros((len(blobs), side, side, 3), np.uint8)
    status = np.zeros(len(blobs), np.int32)
    lib.decode_jpeg_batch_u8(
        blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _i64p(offsets), ctypes.c_int64(len(blobs)), ctypes.c_int32(side),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _i32p(status), ctypes.c_int32(n_threads))
    return out, status
