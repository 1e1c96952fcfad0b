"""Native (C++) IO hot paths, loaded via ctypes with lazy compilation.

``tiff_codec.cpp`` implements TIFF LZW / PackBits decoding, horizontal
predictor undo, and a multi-threaded batch strip decoder.  If the shared
library is missing it is compiled on first import with g++ (-O3); when
no toolchain is available everything degrades to the pure-Python
fallbacks in ``nellie_tpu.io.tiff``.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "tiff_codec.cpp")
_LIB = os.path.join(_DIR, "libnellie_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded ctypes library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None

        lib.nellie_packbits_decode.restype = ctypes.c_longlong
        lib.nellie_packbits_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong, ctypes.c_void_p, ctypes.c_longlong]
        lib.nellie_lzw_decode.restype = ctypes.c_longlong
        lib.nellie_lzw_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong, ctypes.c_void_p, ctypes.c_longlong]
        lib.nellie_undo_predictor.restype = None
        lib.nellie_undo_predictor.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_longlong,
            ctypes.c_longlong, ctypes.c_int]
        lib.nellie_decode_strips.restype = ctypes.c_longlong
        lib.nellie_decode_strips.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_longlong),
            ctypes.c_longlong, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_longlong),
            ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def lzw_decode(data: bytes, expected_size: int) -> bytes | None:
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(expected_size)
    n = lib.nellie_lzw_decode(data, len(data), out, expected_size)
    if n < 0:
        return None
    return out.raw[:n]


def packbits_decode(data: bytes, expected_size: int) -> bytes | None:
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(expected_size)
    n = lib.nellie_packbits_decode(data, len(data), out, expected_size)
    if n < 0:
        return None
    return out.raw[:n]


def undo_predictor(arr: np.ndarray, samples: int = 1) -> bool:
    """In-place horizontal predictor undo on a (rows, cols[*samples]) array."""
    lib = get_lib()
    if lib is None or not arr.flags.c_contiguous:
        return False
    rows = arr.shape[0]
    cols = int(np.prod(arr.shape[1:])) // samples
    lib.nellie_undo_predictor(
        arr.ctypes.data_as(ctypes.c_void_p), rows, cols, samples, arr.itemsize)
    return True


def decode_strips(
    src: bytes,
    offsets: np.ndarray,
    lengths: np.ndarray,
    dst: np.ndarray,
    dst_offsets: np.ndarray,
    dst_lengths: np.ndarray,
    compression: int,
    n_threads: int = 0,
) -> bool:
    """Decode many strips in parallel into a preallocated byte buffer."""
    lib = get_lib()
    if lib is None:
        return False
    offsets = np.ascontiguousarray(offsets, np.int64)
    lengths = np.ascontiguousarray(lengths, np.int64)
    dst_offsets = np.ascontiguousarray(dst_offsets, np.int64)
    dst_lengths = np.ascontiguousarray(dst_lengths, np.int64)
    as_ll = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong))  # noqa: E731
    rc = lib.nellie_decode_strips(
        src, as_ll(offsets), as_ll(lengths), len(offsets),
        dst.ctypes.data_as(ctypes.c_void_p), as_ll(dst_offsets), as_ll(dst_lengths),
        compression, n_threads)
    return rc == 0
