"""Test oracle: compiles the reference ggml-quants.c (read-only from
/root/reference) into a shared library at test time for bit-exact parity
checks. Skipped when the reference tree or a C compiler is unavailable.
The reference source is never copied into this repo — only compiled
on the fly as a golden implementation.
"""

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_REF = pathlib.Path("/root/reference")
_HERE = pathlib.Path(__file__).parent
_LIB = pathlib.Path("/tmp/llamacog_qoracle/libqref.so")


def _build() -> pathlib.Path | None:
    src = _REF / "ggml/src/ggml-quants.c"
    if not src.is_file():
        return None
    if _LIB.is_file() and _LIB.stat().st_mtime > (_HERE / "shim.c").stat().st_mtime:
        return _LIB
    _LIB.parent.mkdir(parents=True, exist_ok=True)
    cmd = [
        "gcc", "-O2", "-shared", "-fPIC", "-o", str(_LIB),
        str(src), str(_HERE / "shim.c"),
        f"-I{_REF}/ggml/include", f"-I{_REF}/ggml/src", "-lm",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
        return None
    return _LIB


class QuantOracle:
    def __init__(self):
        lib = _build()
        if lib is None:
            raise RuntimeError("oracle unavailable")
        self.lib = ctypes.CDLL(str(lib))

    def _fn(self, name):
        fn = getattr(self.lib, name)
        fn.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        fn.restype = None
        return fn

    def quantize_row(self, type_name: str, x: np.ndarray, out_bytes: int) -> np.ndarray:
        x = np.ascontiguousarray(x, dtype=np.float32)
        buf = np.zeros(out_bytes, dtype=np.uint8)
        self._fn(f"quantize_row_{type_name}_ref")(x.ctypes.data, buf.ctypes.data, x.size)
        return buf

    def quantize(self, type_name: str, x: np.ndarray, out_bytes: int) -> np.ndarray:
        """Top-level quantize_<type>() entry (imatrix-capable path, no imatrix)."""
        x = np.ascontiguousarray(x, dtype=np.float32)
        buf = np.zeros(out_bytes, dtype=np.uint8)
        fn = getattr(self.lib, f"quantize_{type_name}")
        fn.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                       ctypes.c_void_p]
        fn.restype = ctypes.c_size_t
        fn(x.ctypes.data, buf.ctypes.data, 1, x.size, None)
        return buf

    _IQ_ENUMS = {  # ggml_type enum values (ggml.h:352-391)
        "iq2_xxs": 16, "iq2_xs": 17, "iq1_s": 19, "iq2_s": 22, "iq1_m": 29,
    }

    def _init_iq_grids(self, type_name: str) -> None:
        """ggml_quantize_init equivalent: build encode-side neighbor tables."""
        if type_name in self._IQ_ENUMS:
            fn = self.lib.iq2xs_init_impl
            fn.argtypes = [ctypes.c_int]
            fn(self._IQ_ENUMS[type_name])
        elif type_name == "iq3_xxs":
            fn = self.lib.iq3xs_init_impl
            fn.argtypes = [ctypes.c_int]
            fn(256)
        elif type_name == "iq3_s":
            fn = self.lib.iq3xs_init_impl
            fn.argtypes = [ctypes.c_int]
            fn(512)

    def quantize_imatrix(
        self, type_name: str, x: np.ndarray, out_bytes: int, imatrix: np.ndarray
    ) -> np.ndarray:
        """quantize_<type>() with an importance matrix (one row)."""
        x = np.ascontiguousarray(x, dtype=np.float32)
        im = np.ascontiguousarray(imatrix, dtype=np.float32)
        assert im.size == x.size
        self._init_iq_grids(type_name)
        buf = np.zeros(out_bytes, dtype=np.uint8)
        fn = getattr(self.lib, f"quantize_{type_name}")
        fn.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                       ctypes.c_void_p]
        fn.restype = ctypes.c_size_t
        fn(x.ctypes.data, buf.ctypes.data, 1, x.size, im.ctypes.data)
        return buf

    def dequantize_row(self, type_name: str, data: np.ndarray, n: int) -> np.ndarray:
        data = np.ascontiguousarray(data, dtype=np.uint8)
        out = np.zeros(n, dtype=np.float32)
        self._fn(f"dequantize_row_{type_name}")(data.ctypes.data, out.ctypes.data, n)
        return out


_oracle = None


def get_oracle() -> QuantOracle | None:
    global _oracle
    if _oracle is None:
        try:
            _oracle = QuantOracle()
        except RuntimeError:
            _oracle = False
    return _oracle or None
