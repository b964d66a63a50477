"""ctypes bindings for the C++ window-sampler (csrc/window_sampler.cpp).

The reference assembles training batches through torch DataLoader worker
processes (per-window python ``__getitem__`` + pickling + IPC,
/root/reference/utils/load_data.py:174). Here batch assembly is one
multithreaded C++ pass over the in-RAM episode arrays; this module loads
``libwindow_sampler.so`` via ctypes (no pybind11 in the image) and falls
back to equivalent numpy when the library is not built.

Public API (used by ``dataset.WindowDataset.batch``):
  available() -> bool
  gather_windows(src, starts, seq_len, step) -> (B, seq_len, *src.shape[1:])
      float32 sources are copied; uint8 sources are converted to float32
      and scaled by 1/255 (raw image frames).
  normalize_positions(pos, stat_min, stat_max) -> (pos_norm, translations)
      per-window position normalization with reference semantics
      (/root/reference/utils/load_data.py:85-89): min-max to [-1, 1],
      subtract the window's first frame, divide by 2.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_N_THREADS = min(8, os.cpu_count() or 1)

_lib = None
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SO_CANDIDATES = (
    os.path.join(_REPO_ROOT, "csrc", "libwindow_sampler.so"),
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "libwindow_sampler.so"),
)
for _path in _SO_CANDIDATES:
    if os.path.exists(_path):
        try:
            _lib = ctypes.CDLL(_path)
            break
        except OSError:
            _lib = None

if _lib is not None:
    _i64 = ctypes.c_int64
    _lib.gather_windows_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), _i64,
        ctypes.POINTER(_i64), _i64, _i64, _i64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    _lib.gather_windows_f32.restype = None
    _lib.gather_windows_u8_to_f32.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), _i64,
        ctypes.POINTER(_i64), _i64, _i64, _i64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    _lib.gather_windows_u8_to_f32.restype = None
    _lib.normalize_positions_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), _i64, _i64,
        ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    _lib.normalize_positions_f32.restype = None


def available() -> bool:
    """True when the compiled library was found and loaded."""
    return _lib is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def gather_windows(src: np.ndarray, starts: np.ndarray, seq_len: int,
                   step: int) -> np.ndarray:
    """Gather B strided windows: rows start, start+step, ... from src.

    src is (T, ...); returns float32 (B, seq_len, *src.shape[1:]).
    uint8 sources are scaled by 1/255 during the copy.
    """
    src = np.ascontiguousarray(src)
    starts = np.ascontiguousarray(starts, np.int64)
    batch = int(starts.shape[0])
    trailing = src.shape[1:]
    feat = int(np.prod(trailing)) if trailing else 1
    out = np.empty((batch, seq_len) + trailing, np.float32)

    if _lib is None:
        for b, s in enumerate(starts):
            w = src[s: s + seq_len * step: step]
            out[b] = (w.astype(np.float32) / 255.0
                      if src.dtype == np.uint8 else w)
        return out

    flat_src = src.reshape(src.shape[0], feat) if src.ndim != 2 else src
    flat_src = np.ascontiguousarray(flat_src)
    if src.dtype == np.uint8:
        _lib.gather_windows_u8_to_f32(
            _ptr(flat_src, ctypes.c_uint8), feat, _ptr(starts, ctypes.c_int64),
            batch, seq_len, step, _ptr(out, ctypes.c_float), _N_THREADS)
    else:
        if flat_src.dtype != np.float32:
            flat_src = flat_src.astype(np.float32)
        _lib.gather_windows_f32(
            _ptr(flat_src, ctypes.c_float), feat, _ptr(starts, ctypes.c_int64),
            batch, seq_len, step, _ptr(out, ctypes.c_float), _N_THREADS)
    return out


def normalize_positions(pos: np.ndarray, stat_min: float, stat_max: float):
    """Reference per-window position normalization, batched.

    pos: (B, seq_len, 2) raw positions. Returns (normalized, translations)
    where translations (B, 2) are the removed first-frame vectors in
    [-1, 1] space (needed to unnormalize predictions back to world frame).
    """
    # copy: the C kernel normalizes in place into its input buffer, so a
    # fresh array keeps both paths' semantics identical (the caller's array
    # is never mutated)
    pos = np.array(pos, np.float32, copy=True, order="C")
    batch, seq_len = int(pos.shape[0]), int(pos.shape[1])
    trans = np.empty((batch, 2), np.float32)

    if _lib is None:
        rng = (stat_max - stat_min) or 1.0
        sn = (pos - stat_min) / rng * 2.0 - 1.0
        trans[:] = sn[:, 0]
        return ((sn - trans[:, None, :]) / 2.0).astype(np.float32), trans

    _lib.normalize_positions_f32(
        _ptr(pos, ctypes.c_float), batch, seq_len,
        ctypes.c_float(stat_min), ctypes.c_float(stat_max),
        _ptr(trans, ctypes.c_float), _N_THREADS)
    return pos, trans
