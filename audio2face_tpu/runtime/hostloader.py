"""Native host data-loading runtime: ctypes bindings + device prefetcher.

The C++ kernels (csrc/hostloader.cpp) replace the reference's 8 DataLoader
worker processes (train.py:39) for the host hot path — threaded fragment
gather + int16 normalization and vertex-row gather — and the ``Prefetcher``
overlaps batch assembly and host->device transfer with device compute
(double buffering). Falls back to vectorized numpy when the native library
is unavailable (no toolchain); outputs are bit-identical either way.
"""

from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading
from typing import Callable, Iterator, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "hostloader.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_libhostloader.so")
_lib = None
_lib_tried = False


def _build() -> Optional[str]:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC, "-pthread"],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB_PATH
    except Exception:
        return None


def _load():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    # The .so is never committed (it is host-specific); build from the
    # checked-in source on first use, and rebuild whenever the source is
    # newer than the binary. A packaged install may ship the .so without
    # csrc/ (load it as-is), and a failed rebuild falls back to the stale
    # binary rather than abandoning a working library.
    lib_exists = os.path.exists(_LIB_PATH)
    src_exists = os.path.exists(_SRC)
    fresh = lib_exists and (
        not src_exists
        or os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)
    )
    path = _LIB_PATH if fresh else _build()
    if path is None and lib_exists:
        path = _LIB_PATH  # stale but functional beats the numpy fallback
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.a2f_fragment_batch_i16.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.a2f_gather_rows_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        assert lib.a2f_runtime_version() == 1
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def _default_threads() -> int:
    return min(8, os.cpu_count() or 1)


def fragment_batch_i16(
    audio: np.ndarray, starts: np.ndarray, window: int, n_threads: Optional[int] = None
) -> np.ndarray:
    """Gather fragments [start, start+window) from an int16 clip, normalized
    to float32; out-of-range samples are zero. ``starts`` may be negative."""
    audio = np.ascontiguousarray(audio, dtype=np.int16)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    n = len(starts)
    lib = _load()
    if lib is None:
        idx = starts[:, None] + np.arange(window)[None, :]
        valid = (idx >= 0) & (idx < len(audio))
        out = np.where(valid, audio[np.clip(idx, 0, len(audio) - 1)], 0)
        return (out / 32768.0).astype(np.float32)
    out = np.empty((n, window), np.float32)
    lib.a2f_fragment_batch_i16(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        ctypes.c_int64(len(audio)),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n), ctypes.c_int64(window),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(n_threads or _default_threads()),
    )
    return out


def gather_rows_f32(
    src: np.ndarray, indices: np.ndarray, n_threads: Optional[int] = None
) -> np.ndarray:
    """out[i] = src[indices[i]] for a 2-D+ float32 source (e.g. the mmapped
    (N, 5023, 3) vertex array) — threaded copies pull straight from the
    page cache."""
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    lib = _load()
    if lib is None or src.dtype != np.float32 or not src.flags.c_contiguous:
        return np.ascontiguousarray(src[indices], dtype=np.float32)
    row_elems = int(np.prod(src.shape[1:]))
    out = np.empty((len(indices),) + src.shape[1:], np.float32)
    lib.a2f_gather_rows_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(indices)), ctypes.c_int64(row_elems),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(n_threads or _default_threads()),
    )
    return out


class Prefetcher:
    """Double-buffered iterator: assembles the next host batch (and optionally
    device_puts it) on a background thread while the device runs the current
    step — the TPU-idiomatic replacement for DataLoader worker processes."""

    def __init__(
        self,
        iterator: Iterator,
        transform: Optional[Callable] = None,
        depth: int = 2,
    ):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._transform = transform
        self._err: Optional[BaseException] = None

        def worker():
            try:
                for item in iterator:
                    if self._transform is not None:
                        item = self._transform(item)
                    self._q.put(item)
            except BaseException as e:  # propagate into the consumer
                self._err = e
            finally:
                self._q.put(_SENTINEL)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


_SENTINEL = object()
