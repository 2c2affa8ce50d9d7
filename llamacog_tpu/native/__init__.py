"""ctypes binding for the native codec library (csrc/lcg_codecs.cpp).

The C++ side provides multithreaded block-quant decode (and Q8_0 encode) —
the role of the reference's native dequantize_row_* loops. The library is
built on demand with `make -C csrc` (g++); when unavailable, callers fall
back to the numpy reference decoders transparently.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess

import numpy as np

from ..gguf.constants import GGML_TYPE_TRAITS, GGMLType

_CSRC = pathlib.Path(__file__).resolve().parent.parent.parent / "csrc"
_lib = None
_checked = False


def _lib_path() -> pathlib.Path:
    """Build output keyed by source-content hash — git does not preserve
    mtimes, so an mtime staleness check would keep loading a stale binary;
    a content hash cannot."""
    src = _CSRC / "lcg_codecs.cpp"
    h = hashlib.sha256(src.read_bytes()).hexdigest()[:12]
    return _CSRC / f"liblcg_codecs-{h}.so"

# types the native decoder implements (codec_for in lcg_codecs.cpp)
NATIVE_DECODE_TYPES = {
    GGMLType.F16, GGMLType.BF16,
    GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q8_0,
    GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K,
    GGMLType.IQ4_NL, GGMLType.IQ4_XS,
}


def _build(lib_path: pathlib.Path) -> bool:
    if lib_path.is_file():
        return True
    try:
        subprocess.run(
            ["make", "-C", str(_CSRC), f"LIB={lib_path.name}"],
            check=True, capture_output=True, timeout=300,
        )
        return lib_path.is_file()
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
        return False


def get_lib():
    """Load (building from source if needed) the native library, or None."""
    global _lib, _checked
    if _checked:
        return _lib or None
    _checked = True
    if os.environ.get("LLAMACOG_NO_NATIVE"):
        _lib = False
        return None
    lib_path = _lib_path()
    if not _build(lib_path):
        _lib = False
        return None
    try:
        lib = ctypes.CDLL(str(lib_path))
        lib.lcg_dequantize.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int,
        ]
        lib.lcg_dequantize.restype = ctypes.c_int
        lib.lcg_quantize_q8_0.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int
        ]
        lib.lcg_quantize_q8_0.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = False
    return _lib or None


def available() -> bool:
    return get_lib() is not None


def dequantize(data: np.ndarray, ggml_type: GGMLType, n: int,
               nthreads: int | None = None) -> np.ndarray | None:
    """Threaded native dequant; None when the type/library is unavailable."""
    lib = get_lib()
    if lib is None or ggml_type not in NATIVE_DECODE_TYPES:
        return None
    tt = GGML_TYPE_TRAITS[ggml_type]
    if n % tt.block_size:
        return None
    data = np.ascontiguousarray(np.asarray(data, dtype=np.uint8).reshape(-1))
    if data.size < (n // tt.block_size) * tt.type_size:
        return None
    out = np.empty(n, dtype=np.float32)
    nth = nthreads or min(os.cpu_count() or 1, 16)
    rc = lib.lcg_dequantize(
        int(ggml_type), data.ctypes.data, data.size, out.ctypes.data, n, nth
    )
    return out if rc == 0 else None


def quantize_q8_0(x: np.ndarray, nthreads: int | None = None) -> np.ndarray | None:
    lib = get_lib()
    if lib is None or x.size % 32:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty((x.size // 32) * 34, dtype=np.uint8)
    nth = nthreads or min(os.cpu_count() or 1, 16)
    rc = lib.lcg_quantize_q8_0(x.ctypes.data, out.ctypes.data, x.size, nth)
    return out if rc == 0 else None
