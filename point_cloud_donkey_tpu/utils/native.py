"""ctypes bindings for the native data-loader kernels (native/pcd_native.cpp).

Compiles the shared object on first use (g++ -O3) and caches it next to the
source; all entry points degrade gracefully to pure-Python implementations
when the toolchain or binary is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "pcd_native.cpp")
_SO = os.path.join(_NATIVE_DIR, "libpcd_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or \
                    os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.pcd_lzf_decompress.restype = ctypes.c_size_t
            lib.pcd_lzf_decompress.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_void_p, ctypes.c_size_t]
            lib.pcd_parse_floats.restype = ctypes.c_size_t
            lib.pcd_parse_floats.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_void_p, ctypes.c_size_t]
            lib.pcd_lzf_compress.restype = ctypes.c_size_t
            lib.pcd_lzf_compress.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_void_p, ctypes.c_size_t]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def lzf_decompress(data: bytes, expected_size: int) -> Optional[bytes]:
    """Native LZF decompression; None if the native lib is unavailable or
    the stream is invalid (caller falls back to Python)."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(expected_size, np.uint8)
    n = lib.pcd_lzf_decompress(data, len(data),
                               out.ctypes.data_as(ctypes.c_void_p),
                               expected_size)
    if n != expected_size:
        return None
    return out.tobytes()


def lzf_compress(data: bytes) -> Optional[bytes]:
    """Native LZF compression (the reference's CGF dump path links liblzf);
    None when unavailable or when the data is incompressible past the
    allocated budget (callers store uncompressed then)."""
    lib = _load()
    if lib is None or len(data) == 0:
        return None
    budget = len(data) + len(data) // 16 + 64
    out = np.empty(budget, np.uint8)
    n = lib.pcd_lzf_compress(data, len(data),
                             out.ctypes.data_as(ctypes.c_void_p), budget)
    if n == 0:
        return None
    return out[:n].tobytes()


def parse_floats(text: bytes, max_count: int) -> Optional[np.ndarray]:
    """Native whitespace-float parser; None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(max_count, np.float32)
    n = lib.pcd_parse_floats(text, len(text),
                             out.ctypes.data_as(ctypes.c_void_p), max_count)
    return out[:n]
