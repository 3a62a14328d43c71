"""ctypes bindings for the native WAV decoder + threaded prefetch loader.

The C++ library (``native/wavio.cc``) decodes RIFF/WAVE to mono float32 with
the GIL released, so a plain Python thread pool achieves parallel disk
decode while the TPU computes — the framework's native replacement for the
reference's libsndfile dependency. Falls back to scipy when the shared
library isn't built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libwavio.so"))

_lib = None
_lib_tried = False


def _load_lib(build: bool = True):
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH) and build:
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.wav_read_f32.restype = ctypes.c_long
    lib.wav_read_f32.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.wav_read_batch_f32.restype = ctypes.c_long
    lib.wav_read_batch_f32.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def read_wav(path: str, max_len: Optional[int] = None) -> np.ndarray:
    """Decode one WAV to mono float32 (native if available, scipy else)."""
    lib = _load_lib()
    if lib is None:
        from scipy.io import wavfile

        _, wav = wavfile.read(path)
        if wav.ndim > 1:
            wav = wav.mean(axis=1)
        if wav.dtype == np.int16:
            wav = wav.astype(np.float32) / 32768.0
        elif wav.dtype == np.int32:
            wav = wav.astype(np.float32) / 2147483648.0
        else:
            wav = wav.astype(np.float32)
        return wav[:max_len] if max_len else wav

    sr = ctypes.c_int(0)
    n = lib.wav_read_f32(path.encode(), None, 0, ctypes.byref(sr))
    if n < 0:
        raise IOError(f"wav_read_f32({path}) failed with code {n}")
    if max_len is not None:
        n = min(n, max_len)
    out = np.empty(n, np.float32)
    got = lib.wav_read_f32(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, ctypes.byref(sr),
    )
    if got < 0:
        raise IOError(f"wav_read_f32({path}) failed with code {got}")
    return out[:got]


def read_wav_batch(paths: Sequence[str], seg_len: int) -> np.ndarray:
    """Decode a batch of WAVs into a (n, seg_len) float32 array (native)."""
    lib = _load_lib()
    if lib is None:
        out = np.zeros((len(paths), seg_len), np.float32)
        for i, p in enumerate(paths):
            w = read_wav(p, seg_len)
            out[i, : len(w)] = w
        return out
    out = np.zeros((len(paths), seg_len), np.float32)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    lib.wav_read_batch_f32(
        arr, len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), seg_len,
    )
    return out


class PrefetchLoader:
    """Background-thread batch prefetcher (double-buffered queue).

    Wraps any batch iterator factory; decode/augment runs on host threads
    while the accelerator consumes the previous batch — the equivalent of
    the reference's ``num_workers=8`` DataLoader (``train.py:47``).
    """

    def __init__(self, batch_iter_factory, depth: int = 2):
        self.factory = batch_iter_factory
        self.depth = depth

    def __iter__(self) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        sentinel = object()

        def worker():
            try:
                for batch in self.factory():
                    q.put(batch)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
