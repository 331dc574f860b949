"""Native runtime bindings (C++ decoder via ctypes).

Builds on demand with runtime/build.sh; every entry point degrades to the
pure-Python implementation when the shared library is absent, so the
framework works without a toolchain.
"""
from nvblox_mindmap_tpu.runtime.native import (
    decode_png,
    decode_png_batch,
    decode_zstd_pickle,
    ensure_built,
    native_available,
)

__all__ = [
    "decode_png",
    "decode_png_batch",
    "decode_zstd_pickle",
    "ensure_built",
    "native_available",
]
