"""ctypes bindings for the native batch image loader.

Builds libbbd_loader.so from bbd_loader.cpp on first use (g++ -O3 -ljpeg;
no pybind11 needed) and caches it next to the source. Falls back cleanly
when a compiler or libjpeg is unavailable -- callers check
native_available() and use the PIL path otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bbd_loader.cpp")
_SO = os.path.join(_DIR, "libbbd_loader.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    try:
        if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            # -march=native only when explicitly requested: the .so may be
            # built once and shipped to a fleet of heterogeneous TPU hosts,
            # where native-tuned code can SIGILL. -O3 alone decodes within
            # a few % (libjpeg does the heavy lifting).
            arch = ["-march=native"] if os.environ.get("BBD_NATIVE_MARCH") else []
            cmd = ["g++", "-O3", *arch, "-shared", "-fPIC", _SRC, "-ljpeg", "-o", _SO]
            subprocess.run(cmd, check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.bbd_decode_resize_batch.restype = ctypes.c_int
        lib.bbd_decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
        ]
        return lib
    except Exception as e:  # missing toolchain / libjpeg: PIL fallback
        print(f"[native] loader build unavailable ({e}); using PIL fallback")
        _build_failed = True
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        with _lock:
            if _lib is None and not _build_failed:
                _lib = _build()
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def decode_resize_batch(
    paths: List[str],
    width: int,
    height: int,
    threads: int = 8,
    fast: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode + Lanczos3-resize a batch of JPEGs.

    Returns (images uint8 [N, H, W, 3], ok bool [N]). fast=True enables
    DCT-space prescale (approximate but ~3x cheaper decode).
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.empty((n, height, width, 3), dtype=np.uint8)
    status = np.zeros(n, dtype=np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.bbd_decode_resize_batch(
        arr, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        width, height, threads, int(fast),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out, status.astype(bool)
