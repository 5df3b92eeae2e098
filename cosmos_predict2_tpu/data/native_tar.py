"""Native tar-shard reader with background prefetch (ctypes binding).

The C++ side (csrc/tar_reader.cpp) parses tar headers, does the file IO
and buffers samples in pthreads — the role the reference delegates to
decord/webdataset native streaming (SURVEY.md §2.7/§2.10). Python sees
named byte buffers; decode stays wherever the caller wants it.

Falls back to the stdlib ``tarfile`` when no toolchain is available, so
`NativeTarShard` is always safe to use.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from cosmos_predict2_tpu.utils import log

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SRC = os.path.join(_CSRC, "tar_reader.cpp")
_LIB_PATH = os.path.join(_CSRC, "libtar_reader.so")
_lib = None
_tried = False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-o", _LIB_PATH, _SRC],
                check=True, capture_output=True, timeout=120,
            )
        except (subprocess.SubprocessError, FileNotFoundError) as e:
            log.warning(f"native tar_reader build failed ({e}); using tarfile fallback")
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        i64 = ctypes.c_int64
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.tar_index_open.argtypes = [ctypes.c_char_p]
        lib.tar_index_open.restype = ctypes.c_void_p
        lib.tar_index_count.argtypes = [ctypes.c_void_p]
        lib.tar_index_count.restype = i64
        lib.tar_index_name.argtypes = [ctypes.c_void_p, i64]
        lib.tar_index_name.restype = ctypes.c_char_p
        lib.tar_index_size.argtypes = [ctypes.c_void_p, i64]
        lib.tar_index_size.restype = i64
        lib.tar_read.argtypes = [ctypes.c_void_p, i64, u8p]
        lib.tar_prefetch_start.argtypes = [ctypes.c_void_p, ctypes.POINTER(i64), i64, i64]
        lib.tar_prefetch_get.argtypes = [ctypes.c_void_p, i64, u8p]
        lib.tar_prefetch_stop.argtypes = [ctypes.c_void_p]
        lib.tar_index_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    except OSError as e:
        log.warning(f"native tar_reader load failed ({e}); using tarfile fallback")
    return _lib


class NativeTarShard:
    """Random access + threaded prefetch over one tar shard."""

    def __init__(self, path: str, prefetch_threads: int = 2):
        self.path = path
        self.prefetch_threads = prefetch_threads
        self._lib = get_lib()
        self._h = None
        self._fallback = None
        self._prefetching: Optional[list[int]] = None
        if self._lib is not None:
            self._h = self._lib.tar_index_open(path.encode())
        if self._h is None:
            import tarfile

            self._fallback = tarfile.open(path)
            self._members = [m for m in self._fallback.getmembers() if m.isreg()]

    @property
    def names(self) -> list[str]:
        if self._h is not None:
            n = self._lib.tar_index_count(self._h)
            return [self._lib.tar_index_name(self._h, i).decode() for i in range(n)]
        return [m.name for m in self._members]

    def __len__(self) -> int:
        if self._h is not None:
            return int(self._lib.tar_index_count(self._h))
        return len(self._members)

    def read(self, i: int) -> bytes:
        if self._h is not None:
            size = self._lib.tar_index_size(self._h, i)
            buf = np.empty(size, dtype=np.uint8)
            self._lib.tar_read(self._h, i, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            return buf.tobytes()
        return self._fallback.extractfile(self._members[i]).read()

    # ------------------------- async prefetch -------------------------

    def prefetch(self, indices: list[int]) -> None:
        """Begin loading ``indices`` in background threads (off the GIL)."""
        if self._h is None:
            self._prefetching = list(indices)  # fallback: lazy sync reads
            return
        arr = (ctypes.c_int64 * len(indices))(*indices)
        self._lib.tar_prefetch_start(self._h, arr, len(indices), self.prefetch_threads)
        self._prefetching = list(indices)

    def get_prefetched(self, slot: int) -> bytes:
        """Blocking fetch of the ``slot``-th prefetched sample."""
        assert self._prefetching is not None, "call prefetch() first"
        if self._h is None:
            return self.read(self._prefetching[slot])
        size = self._lib.tar_index_size(self._h, self._prefetching[slot])
        buf = np.empty(size, dtype=np.uint8)
        self._lib.tar_prefetch_get(self._h, slot, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return buf.tobytes()

    def end_prefetch(self) -> None:
        if self._h is not None and self._prefetching is not None:
            self._lib.tar_prefetch_stop(self._h)
        self._prefetching = None

    def close(self) -> None:
        if self._h is not None:
            self._lib.tar_index_close(self._h)
            self._h = None
        if self._fallback is not None:
            self._fallback.close()
