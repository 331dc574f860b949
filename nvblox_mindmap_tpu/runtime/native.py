"""ctypes bindings for the native decoder (runtime/decoder.cpp).

Replaces the Python-side hot-loop byte work (zstd decompress + PNG decode)
with libzstd/libpng through a thread-pooled C++ shared library. Every
function falls back to the pure-Python path when the library is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import pickle
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_LIB_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_LIB_DIR, "libmindmap_runtime.so")
_lib = None
_load_attempted = False


def ensure_built(force: bool = False) -> bool:
    """Build the shared library if needed; returns availability."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(
            ["sh", os.path.join(_LIB_DIR, "build.sh")],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.exists(_LIB_PATH):
        if not ensure_built():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.mm_zstd_decompress_file.restype = ctypes.c_longlong
    lib.mm_zstd_decompress_file.argtypes = [
        ctypes.c_char_p,
        ctypes.c_void_p,
        ctypes.c_longlong,
    ]
    lib.mm_zstd_decompress_file_alloc.restype = ctypes.c_longlong
    lib.mm_zstd_decompress_file_alloc.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.mm_buffer_free.restype = None
    lib.mm_buffer_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    lib.mm_png_info.restype = ctypes.c_int
    lib.mm_png_info.argtypes = [ctypes.c_char_p] + [
        ctypes.POINTER(ctypes.c_int)
    ] * 4
    lib.mm_png_decode.restype = ctypes.c_int
    lib.mm_png_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.c_void_p,
        ctypes.c_longlong,
    ]
    lib.mm_png_decode_batch.restype = ctypes.c_int
    lib.mm_png_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.c_int,
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def decode_zstd_pickle(path: str):
    """Load a zstd-compressed pickle; native decompress when available."""
    lib = _load()
    if lib is None:
        from nvblox_mindmap_tpu.data.dataset import unpickle_zst

        return unpickle_zst(path)
    out_ptr = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.mm_zstd_decompress_file_alloc(path.encode(), ctypes.byref(out_ptr))
    if size < 0:
        from nvblox_mindmap_tpu.data.dataset import unpickle_zst

        return unpickle_zst(path)
    try:
        data = ctypes.string_at(out_ptr, size)
    finally:
        lib.mm_buffer_free(out_ptr)
    return pickle.loads(data)


def _png_shape(lib, path: str):
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    bits = ctypes.c_int()
    if lib.mm_png_info(path.encode(), w, h, c, bits) != 0:
        return None
    return h.value, w.value, c.value, bits.value


def decode_png(path: str) -> np.ndarray:
    """Decode a PNG to (H, W[, C]) uint8 or uint16 (depth)."""
    lib = _load()
    if lib is None:
        import imageio.v2 as imageio

        return np.asarray(imageio.imread(path))
    shape = _png_shape(lib, path)
    if shape is None:
        import imageio.v2 as imageio

        return np.asarray(imageio.imread(path))
    h, w, c, bits = shape
    dtype = np.uint16 if bits == 16 else np.uint8
    out = np.empty((h, w, c) if c > 1 else (h, w), dtype=dtype)
    rc = lib.mm_png_decode(
        path.encode(), out.ctypes.data_as(ctypes.c_void_p), out.nbytes
    )
    if rc != 0:
        import imageio.v2 as imageio

        return np.asarray(imageio.imread(path))
    return out


def decode_png_batch(paths: Sequence[str], n_threads: int = 4
                     ) -> List[Optional[np.ndarray]]:
    """Decode many PNGs concurrently via the native thread pool.

    Returns None for entries that could not be decoded (missing or corrupt
    files); valid entries around them are unaffected.
    """
    lib = _load()
    if lib is None:
        results: List[Optional[np.ndarray]] = []
        for p in paths:
            try:
                results.append(decode_png(p))
            except Exception:
                results.append(None)
        return results
    outs: List[Optional[np.ndarray]] = [None] * len(paths)
    valid: List[int] = []
    for i, path in enumerate(paths):
        shape = _png_shape(lib, path)
        if shape is None:
            continue
        h, w, c, bits = shape
        dtype = np.uint16 if bits == 16 else np.uint8
        outs[i] = np.empty((h, w, c) if c > 1 else (h, w), dtype=dtype)
        valid.append(i)
    if not valid:
        return outs
    c_paths = (ctypes.c_char_p * len(valid))()
    c_outs = (ctypes.c_void_p * len(valid))()
    c_caps = (ctypes.c_longlong * len(valid))()
    for j, i in enumerate(valid):
        arr = outs[i]
        c_paths[j] = paths[i].encode()
        c_outs[j] = arr.ctypes.data_as(ctypes.c_void_p).value
        c_caps[j] = arr.nbytes
    failures = lib.mm_png_decode_batch(c_paths, c_outs, c_caps, len(valid),
                                       n_threads)
    if failures != 0:
        # The batch call only reports a count, not WHICH entries failed, so
        # every entry must be re-verified (an early exit keyed on the count
        # could break before reaching the actually-corrupt entry and return
        # its partially-written buffer as valid data). Bad entries are
        # salvaged through the imageio fallback like decode_png.
        for i in valid:
            arr = outs[i]
            rc = lib.mm_png_decode(
                paths[i].encode(), arr.ctypes.data_as(ctypes.c_void_p),
                arr.nbytes,
            )
            if rc != 0:
                try:
                    import imageio.v2 as imageio

                    outs[i] = np.asarray(imageio.imread(paths[i]))
                except Exception:
                    outs[i] = None
    return outs
