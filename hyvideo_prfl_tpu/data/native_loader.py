"""ctypes bindings for the native C++ latent-cache loader.

`native/latent_loader.cpp`: mmap .npy parsing + a worker-thread prefetch
ring, emitting samples in submission order. This is the TPU-native
equivalent of the reference's native data path (decord C++ decode inside
DataLoader worker processes, SURVEY.md 2.9) for the latent-cache training
regime, where the host bottleneck is many .npy reads.

Falls back silently when the shared library hasn't been built
(native/build.sh); `NativePrefetcher.available()` reports which path is
active.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

_DTYPES = {0: np.float32, 1: np.float16, 2: np.int64, 3: np.uint8,
           4: np.float64}

_LIB = None
_LIB_TRIED = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    so = os.path.join(here, "native", "liblatentloader.so")
    if not os.path.exists(so):
        return None
    lib = ctypes.CDLL(so)
    lib.ll_open.restype = ctypes.c_void_p
    lib.ll_open.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                            ctypes.c_int, ctypes.c_int]
    lib.ll_next.restype = ctypes.c_int
    lib.ll_next.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_void_p),
                            ctypes.POINTER(ctypes.c_longlong),
                            ctypes.POINTER(ctypes.c_int),
                            ctypes.POINTER(ctypes.c_int)]
    lib.ll_release.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ll_error.restype = ctypes.c_char_p
    lib.ll_error.argtypes = [ctypes.c_void_p]
    lib.ll_close.argtypes = [ctypes.c_void_p]
    try:  # streaming API (absent in pre-round-2 builds of the .so)
        lib.ll_open_stream.restype = ctypes.c_void_p
        lib.ll_open_stream.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.ll_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    except AttributeError:
        pass
    _LIB = lib
    return lib


def _fetch_slot(lib, h, data, shape, ndim, dtype):
    """One ll_next call -> (copied array | None on stream end)."""
    slot = lib.ll_next(h, ctypes.byref(data), shape, ctypes.byref(ndim),
                       ctypes.byref(dtype))
    if slot == -1:
        return None
    if slot == -2:
        raise IOError(lib.ll_error(h).decode())
    shp = tuple(shape[i] for i in range(ndim.value))
    np_dtype = _DTYPES[dtype.value]
    n = int(np.prod(shp))
    buf = ctypes.cast(
        data, ctypes.POINTER(ctypes.c_char * (n * np_dtype().nbytes))
    ).contents
    out = np.frombuffer(buf, dtype=np_dtype).reshape(shp).copy()
    lib.ll_release(h, slot)
    return out


class NativeStream:
    """Streaming submit/get over the native prefetch ring.

    `read_many(paths)` issues all of a sample's .npy reads to the worker
    pool at once and collects them in submission order — the hot data-path
    integration point (data/dataset.py): a sample's latent/text/cond/clip
    files load in parallel instead of as sequential np.loads. Thread-safe
    for one reader at a time (internal lock)."""

    def __init__(self, slots: int = 16, threads: int = 4):
        import threading

        self._lib = _load_lib()
        self._h = None
        self._lock = threading.Lock()
        if self._lib is not None and hasattr(self._lib, "ll_open_stream"):
            self._h = self._lib.ll_open_stream(slots, threads)

    def available(self) -> bool:
        return self._h is not None

    def read_many(self, paths: Sequence[str]) -> List[np.ndarray]:
        if self._h is None:
            return [np.load(p) for p in paths]
        lib = self._lib
        data = ctypes.c_void_p()
        shape = (ctypes.c_longlong * 8)()
        ndim = ctypes.c_int()
        dtype = ctypes.c_int()
        with self._lock:
            for p in paths:
                lib.ll_submit(self._h, p.encode())
            out, err = [], None
            # drain EVERY submitted ticket even after an error — leftovers
            # would desync the next read_many's submission-order matching
            for _ in paths:
                try:
                    arr = _fetch_slot(lib, self._h, data, shape, ndim, dtype)
                except IOError as e:
                    err, arr = err or e, None
                out.append(arr)
        if err is not None:
            raise err
        return out

    def close(self):
        if self._h is not None:
            self._lib.ll_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def build_native(force: bool = False) -> bool:
    """Compile the shared library with the in-tree build script."""
    import subprocess

    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    so = os.path.join(here, "native", "liblatentloader.so")
    if os.path.exists(so) and not force:
        lib = _load_lib()
        if lib is not None and not hasattr(lib, "ll_open_stream"):
            force = True  # stale build predating the streaming API
        else:
            return lib is not None
    try:
        subprocess.run(["sh", os.path.join(here, "native", "build.sh")],
                       check=True, capture_output=True)
    except Exception:
        return False
    global _LIB_TRIED
    _LIB_TRIED = False
    return _load_lib() is not None


class NativePrefetcher:
    """Iterate .npy files with native prefetch; numpy fallback otherwise."""

    def __init__(self, paths: Sequence[str], slots: int = 8,
                 threads: int = 4):
        self.paths: List[str] = list(paths)
        self._lib = _load_lib()
        self._h = None
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._h = self._lib.ll_open(arr, len(self.paths), slots, threads)

    @staticmethod
    def available() -> bool:
        return _load_lib() is not None

    def __iter__(self):
        if self._h is None:
            for p in self.paths:
                yield np.load(p)
            return
        lib = self._lib
        data = ctypes.c_void_p()
        shape = (ctypes.c_longlong * 8)()
        ndim = ctypes.c_int()
        dtype = ctypes.c_int()
        while True:
            out = _fetch_slot(lib, self._h, data, shape, ndim, dtype)
            if out is None:
                return
            yield out

    def close(self):
        if self._h is not None:
            self._lib.ll_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
