"""GGUF writer (v3).

Mirrors the container layout in /root/reference/ggml/include/gguf.h:1-33.
Used by the quantize tool, test-model generators, and model export.
"""

from __future__ import annotations

import os
import struct
from typing import Any, BinaryIO, Sequence

import numpy as np

from .constants import (
    GGUF_DEFAULT_ALIGNMENT,
    GGUF_MAGIC,
    GGUF_VERSION,
    GGMLType,
    GGUFValueType,
    row_nbytes,
)

_SCALAR_FMT = {
    GGUFValueType.UINT8: "<B",
    GGUFValueType.INT8: "<b",
    GGUFValueType.UINT16: "<H",
    GGUFValueType.INT16: "<h",
    GGUFValueType.UINT32: "<I",
    GGUFValueType.INT32: "<i",
    GGUFValueType.FLOAT32: "<f",
    GGUFValueType.BOOL: "<?",
    GGUFValueType.UINT64: "<Q",
    GGUFValueType.INT64: "<q",
    GGUFValueType.FLOAT64: "<d",
}

_NP_TO_VTYPE = {
    "u1": GGUFValueType.UINT8,
    "i1": GGUFValueType.INT8,
    "u2": GGUFValueType.UINT16,
    "i2": GGUFValueType.INT16,
    "u4": GGUFValueType.UINT32,
    "i4": GGUFValueType.INT32,
    "f4": GGUFValueType.FLOAT32,
    "u8": GGUFValueType.UINT64,
    "i8": GGUFValueType.INT64,
    "f8": GGUFValueType.FLOAT64,
}

_NP_TO_GGML = {
    np.dtype(np.float32): GGMLType.F32,
    np.dtype(np.float16): GGMLType.F16,
    np.dtype(np.int8): GGMLType.I8,
    np.dtype(np.int16): GGMLType.I16,
    np.dtype(np.int32): GGMLType.I32,
    np.dtype(np.int64): GGMLType.I64,
    np.dtype(np.float64): GGMLType.F64,
}


def _infer_vtype(v: Any) -> GGUFValueType:
    if isinstance(v, bool):
        return GGUFValueType.BOOL
    if isinstance(v, int):
        if v < 0:
            return GGUFValueType.INT32 if -(2**31) <= v else GGUFValueType.INT64
        return GGUFValueType.UINT32 if v < 2**32 else GGUFValueType.UINT64
    if isinstance(v, float):
        return GGUFValueType.FLOAT32
    if isinstance(v, str):
        return GGUFValueType.STRING
    if isinstance(v, (list, tuple, np.ndarray)):
        return GGUFValueType.ARRAY
    if isinstance(v, np.generic):
        return _NP_TO_VTYPE[v.dtype.str[1:]]
    raise TypeError(f"cannot infer GGUF type for {type(v)}")


class GGUFWriter:
    def __init__(self, path: str | os.PathLike, alignment: int = GGUF_DEFAULT_ALIGNMENT):
        self.path = os.fspath(path)
        self.alignment = alignment
        self._kv: list[tuple[str, GGUFValueType, Any]] = []
        # (name, shape numpy-order, ggml_type, raw bytes)
        self._tensors: list[tuple[str, tuple[int, ...], GGMLType, bytes | np.ndarray]] = []
        self._names: set[str] = set()

    # -- metadata ---------------------------------------------------------
    def add(self, key: str, value: Any, vtype: GGUFValueType | None = None) -> None:
        self._kv.append((key, vtype if vtype is not None else _infer_vtype(value), value))

    def add_typed(self, key: str, value: Any, vtype: GGUFValueType) -> None:
        self._kv.append((key, vtype, value))

    # -- tensors ----------------------------------------------------------
    def add_tensor(
        self,
        name: str,
        data: np.ndarray | bytes,
        shape: Sequence[int] | None = None,
        ggml_type: GGMLType | None = None,
    ) -> None:
        """Add a tensor. For float/int arrays, dtype maps to the ggml type.

        For pre-quantized data pass raw ``bytes`` plus explicit ``shape`` (numpy
        order, last axis contiguous) and ``ggml_type``.
        """
        if name in self._names:
            raise ValueError(f"duplicate tensor {name!r}")
        if isinstance(data, np.ndarray) and ggml_type is None:
            if data.dtype == np.dtype("uint16"):  # bf16 carried as uint16
                ggml_type = GGMLType.BF16
            else:
                ggml_type = _NP_TO_GGML[data.dtype]
            shape = data.shape
            data = np.ascontiguousarray(data)
        if shape is None or ggml_type is None:
            raise ValueError("raw tensor data requires explicit shape and ggml_type")
        shape = tuple(int(d) for d in shape)
        inner = shape[-1] if shape else 1
        n = 1
        for d in shape:
            n *= d
        expect = (n // inner) * row_nbytes(ggml_type, inner)
        nbytes = data.nbytes if isinstance(data, np.ndarray) else len(data)
        if nbytes != expect:
            raise ValueError(f"tensor {name!r}: got {nbytes} bytes, expected {expect}")
        self._names.add(name)
        self._tensors.append((name, shape, ggml_type, data))

    # -- serialization ----------------------------------------------------
    def _w_str(self, f: BinaryIO, s: str) -> None:
        b = s.encode("utf-8")
        f.write(struct.pack("<Q", len(b)))
        f.write(b)

    def _w_value(self, f: BinaryIO, vtype: GGUFValueType, v: Any) -> None:
        if vtype == GGUFValueType.STRING:
            self._w_str(f, v)
        elif vtype == GGUFValueType.ARRAY:
            if isinstance(v, np.ndarray):
                item_t = _NP_TO_VTYPE[v.dtype.newbyteorder("<").str[1:]]
                f.write(struct.pack("<IQ", int(item_t), v.size))
                f.write(np.ascontiguousarray(v.reshape(-1)).astype(v.dtype.newbyteorder("<")).tobytes())
            else:
                items = list(v)
                item_t = _infer_vtype(items[0]) if items else GGUFValueType.INT32
                if item_t in (GGUFValueType.UINT32, GGUFValueType.INT32) and any(
                    isinstance(x, int) and not -(2**31) <= x < 2**32 for x in items
                ):
                    item_t = GGUFValueType.INT64
                f.write(struct.pack("<IQ", int(item_t), len(items)))
                for x in items:
                    self._w_value(f, item_t, x)
        else:
            f.write(struct.pack(_SCALAR_FMT[vtype], v))

    def write(self) -> None:
        with open(self.path, "wb") as f:
            f.write(GGUF_MAGIC)
            f.write(struct.pack("<I", GGUF_VERSION))
            f.write(struct.pack("<q", len(self._tensors)))
            f.write(struct.pack("<q", len(self._kv)))
            for key, vtype, v in self._kv:
                self._w_str(f, key)
                f.write(struct.pack("<I", int(vtype)))
                self._w_value(f, vtype, v)
            offset = 0
            for name, shape, ttype, data in self._tensors:
                self._w_str(f, name)
                ne = tuple(reversed(shape))
                f.write(struct.pack("<I", len(ne)))
                for d in ne:
                    f.write(struct.pack("<q", d))
                f.write(struct.pack("<I", int(ttype)))
                f.write(struct.pack("<Q", offset))
                nbytes = data.nbytes if isinstance(data, np.ndarray) else len(data)
                offset += -(-nbytes // self.alignment) * self.alignment
            pos = f.tell()
            f.write(b"\x00" * (-(-pos // self.alignment) * self.alignment - pos))
            for _, _, _, data in self._tensors:
                raw = data.tobytes() if isinstance(data, np.ndarray) else data
                f.write(raw)
                f.write(b"\x00" * (-(-len(raw) // self.alignment) * self.alignment - len(raw)))
