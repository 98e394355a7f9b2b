"""Native host-kernel loader.

Compiles lz4_kernels.cpp with g++ on first import (cached by source mtime),
binds it via ctypes (no pybind11 in this environment), registers the "native"
backend as the default host path, and accelerates the xxHash32 module.

If the toolchain or platform is unavailable, import fails softly and the
framework runs on the Python oracle backend.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

AVAILABLE = False

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "lz4_kernels.cpp")
_LIB = os.path.join(_HERE, "_lz4_kernels.so")


def _build() -> str:
    if (os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    # Build to a temp file then atomically rename, so concurrent importers
    # never load a half-written library.
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_HERE)
    os.close(fd)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return _LIB


_lib = ctypes.CDLL(_build())

_lib.lz4t_xxhash32.restype = ctypes.c_uint32
_lib.lz4t_xxhash32.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                               ctypes.c_uint32]
_lib.lz4t_xxh32_round4.restype = None
_lib.lz4t_xxh32_round4.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_int64]
_lib.lz4t_warm_table.restype = None
_lib.lz4t_warm_table.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_int64]
_lib.lz4t_compress_block.restype = ctypes.c_int64
_lib.lz4t_compress_block.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_void_p, ctypes.c_int64]
_lib.lz4t_decompress_block.restype = ctypes.c_int64
_lib.lz4t_decompress_block.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                       ctypes.c_int64, ctypes.c_void_p,
                                       ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_void_p, ctypes.c_int64]

_ERRORS = {
    -1: "LZ4: Output Buffer Too Small",
    -2: "LZ4: Malformed Input",
    -3: "LZ4: Invalid Offset 0",
    -4: "LZ4: Dictionary Offset Out of Bounds",
}


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.c_void_p)


def xxhash32_native(buf: np.ndarray, seed: int = 0) -> int:
    buf = np.ascontiguousarray(buf)
    return int(_lib.lz4t_xxhash32(_ptr(buf), len(buf), seed & 0xFFFFFFFF))


def xxh32_round4_native(v1, v2, v3, v4, words: np.ndarray):
    v = np.array([v1, v2, v3, v4], dtype=np.uint32)
    words = np.ascontiguousarray(words, dtype=np.uint32)
    _lib.lz4t_xxh32_round4(_ptr(v), _ptr(words), len(words))
    return int(v[0]), int(v[1]), int(v[2]), int(v[3])


def warm_table_native(table: np.ndarray, buf, limit: int) -> None:
    assert table.dtype == np.int32 and table.flags.c_contiguous
    buf = np.ascontiguousarray(buf)
    _lib.lz4t_warm_table(_ptr(table), _ptr(buf), limit)


def compress_block_native(src, dst, src_start: int, src_len: int,
                          hash_table: np.ndarray, dst_off: int) -> int:
    src = np.ascontiguousarray(src)
    assert dst.flags.c_contiguous and hash_table.dtype == np.int32
    return int(_lib.lz4t_compress_block(
        _ptr(src), _ptr(dst), src_start, src_len, _ptr(hash_table), dst_off))


def decompress_block_native(src, src_off: int, src_len: int, dst,
                            dst_off: int, dictionary=None) -> int:
    src = np.ascontiguousarray(src)
    assert dst.flags.c_contiguous
    if dictionary is not None:
        dictionary = np.ascontiguousarray(dictionary)
        dptr, dlen = _ptr(dictionary), len(dictionary)
    else:
        dptr, dlen = None, 0
    rc = int(_lib.lz4t_decompress_block(
        _ptr(src), src_off, src_len, _ptr(dst), len(dst), dst_off, dptr, dlen))
    if rc < 0:
        raise ValueError(_ERRORS.get(rc, f"LZ4: native error {rc}"))
    return rc


# --- Registration ---
from ..backends import Backend, register_backend  # noqa: E402

register_backend(Backend(
    "native",
    compress_block=compress_block_native,
    decompress_block=decompress_block_native,
    warm_table=warm_table_native,
), make_default=True)

from ..xxh import xxhash32 as _xxh_module_hook  # noqa: E402
import importlib  # noqa: E402

_xxh_mod = importlib.import_module("divortio_lz4_tpu.xxh.xxhash32")
_xxh_mod._native_oneshot = xxhash32_native
_xxh_mod._native_round4 = xxh32_round4_native

AVAILABLE = True
