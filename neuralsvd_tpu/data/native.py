"""ctypes bindings for the native host-side data path (csrc/).

The C++ pair sampler replaces the per-batch Python loop of the class
-balanced CDK loader (reference: examples/cdk/sketchy/data.py:72-89) — at
batch 4096 the Python loop costs milliseconds between device steps; the
native fill is microseconds.  Auto-builds with g++ on first use (no
pybind11 in the image — plain C ABI + ctypes); callers fall back to the
Python path when no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "csrc",
                    "pair_sampler.cpp")
_LIB_DIR = os.path.join(os.path.dirname(__file__), "..", "csrc", "build")
_LIB = os.path.join(_LIB_DIR, "libpair_sampler.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    os.makedirs(_LIB_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) and not _build():
            _build_failed = True
            return None
        lib = ctypes.CDLL(_LIB)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.sample_pairs.argtypes = [
            i32p, i32p, i32p, i32p,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_uint64, ctypes.c_uint64,
            i32p, i32p, i32p]
        lib.sample_pairs.restype = None
        lib.gather_rows_f32.argtypes = [
            f32p, i32p, ctypes.c_int32, ctypes.c_int32, f32p]
        lib.gather_rows_f32.restype = None
        _lib = lib
        return _lib


def _as_i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class NativePairSampler:
    """Class-balanced pair sampler backed by the C++ kernel.

    Construct from {class: [indices]} dicts for the two sides; call
    ``sample(batch_size, counter)`` -> (sketch_idx, photo_idx, cls) int32
    arrays.  Deterministic in (seed, counter).
    """

    def __init__(self, sketch_idx_per_class: dict, photo_idx_per_class: dict,
                 classes, seed: int = 0):
        self.classes = list(classes)
        self.seed = seed
        self._lib = get_lib()
        if self._lib is None:
            raise RuntimeError("native pair sampler unavailable (no g++)")

        def pack(idx_per_class):
            offsets = np.zeros(len(self.classes) + 1, np.int32)
            flat = []
            for i, c in enumerate(self.classes):
                members = idx_per_class.get(c, [])
                flat.extend(members)
                offsets[i + 1] = offsets[i] + len(members)
            return offsets, np.asarray(flat, np.int32)

        self.sk_off, self.sk_flat = pack(sketch_idx_per_class)
        self.ph_off, self.ph_flat = pack(photo_idx_per_class)

    def sample(self, batch_size: int, counter: int):
        out_sk = np.empty(batch_size, np.int32)
        out_ph = np.empty(batch_size, np.int32)
        out_cls = np.empty(batch_size, np.int32)
        self._lib.sample_pairs(
            _as_i32p(self.sk_off), _as_i32p(self.sk_flat),
            _as_i32p(self.ph_off), _as_i32p(self.ph_flat),
            ctypes.c_int32(len(self.classes)), ctypes.c_int32(batch_size),
            ctypes.c_uint64(self.seed), ctypes.c_uint64(counter),
            _as_i32p(out_sk), _as_i32p(out_ph), _as_i32p(out_cls))
        return out_sk, out_ph, out_cls


def gather_rows(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Native row gather (float32 2-D src); numpy fallback otherwise."""
    lib = get_lib()
    src = np.ascontiguousarray(src, np.float32)
    idx = np.ascontiguousarray(idx, np.int32)
    if lib is None or src.ndim != 2:
        return src[idx]
    out = np.empty((idx.shape[0], src.shape[1]), np.float32)
    lib.gather_rows_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), _as_i32p(idx),
        ctypes.c_int32(idx.shape[0]), ctypes.c_int32(src.shape[1]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
