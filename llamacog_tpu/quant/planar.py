"""Planar (structure-of-arrays) quantized tensors for TPU.

GGUF stores weights as packed per-block structs (AoS). At load we split each
tensor into a few flat planes (quant payload, scales, mins, high bits) with
NO value-changing transforms — just byte shuffling — so that:

  * the payload stays sub-byte-packed in HBM (the whole point of quantized
    inference: HBM bandwidth),
  * every plane is a dense array whose last axis is contiguous along K and
    whose decode is *block-local concatenation* (the ggml bit layouts place
    nibble/2-bit groups as contiguous sub-runs inside each block — no
    element interleave is needed, which is exactly what the TPU wants),
  * f16 superblock scales are pre-multiplied with the 6-bit/4-bit group
    scales into f32 planes (the reference computes d*sc in f32 too:
    ggml-quants.c dequantize_row_q4_K), so kernels do a single multiply.

`decode()` gives the pure-jnp dequantization used as the XLA fallback path
and as the reference for the Pallas kernels.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGML_TYPE_TRAITS, QK_K, GGMLType
from .decode_np import KVALUES_IQ4NL


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantTensor:
    """A quantized [N, K] tensor as a set of planes. N = output rows."""

    kind: str  # ggml type name, static
    shape: tuple[int, ...]  # logical shape, static
    planes: dict[str, Any] = field(default_factory=dict)

    def tree_flatten(self):
        keys = tuple(sorted(self.planes))
        return tuple(self.planes[k] for k in keys), (self.kind, self.shape, keys)

    @classmethod
    def tree_unflatten(cls, aux, children):
        kind, shape, keys = aux
        return cls(kind, shape, dict(zip(keys, children)))

    @property
    def nbytes(self) -> int:
        return sum(int(np.prod(p.shape)) * p.dtype.itemsize for p in self.planes.values())


def _f16(a: np.ndarray) -> np.ndarray:
    return a.copy().view("<f2")


def _view(b: np.ndarray, dt) -> np.ndarray:
    return b.copy().view(dt)


def from_gguf(data: np.ndarray, ggml_type: GGMLType, shape: tuple[int, ...]) -> QuantTensor:
    """Relayout raw GGUF block bytes into planes (numpy, zero value change)."""
    n_el = int(np.prod(shape))
    K = shape[-1]
    N = n_el // K
    tt = GGML_TYPE_TRAITS[ggml_type]
    data = np.asarray(data, np.uint8).reshape(N, K // tt.block_size, tt.type_size)
    t = ggml_type
    p: dict[str, np.ndarray] = {}

    if t == GGMLType.F32:
        p["w"] = data.reshape(N, -1).copy().view("<f4").reshape(N, K)
    elif t == GGMLType.F16:
        p["w"] = data.reshape(N, -1).copy().view("<f2").reshape(N, K)
    elif t == GGMLType.BF16:
        u = data.reshape(N, -1).copy().view("<u2").reshape(N, K)
        p["w"] = u.view(jnp.bfloat16.dtype) if hasattr(jnp.bfloat16, "dtype") else u
        p["w"] = u.view("<u2")  # carried as u16; decode() bit-casts
    elif t == GGMLType.Q4_0:
        p["d"] = _f16(data[:, :, 0:2]).reshape(N, -1)
        p["qs"] = data[:, :, 2:18].reshape(N, K // 2)
    elif t == GGMLType.Q4_1:
        p["d"] = _f16(data[:, :, 0:2]).reshape(N, -1)
        p["m"] = _f16(data[:, :, 2:4]).reshape(N, -1)
        p["qs"] = data[:, :, 4:20].reshape(N, K // 2)
    elif t == GGMLType.Q5_0:
        p["d"] = _f16(data[:, :, 0:2]).reshape(N, -1)
        p["qh"] = _view(data[:, :, 2:6], "<u4").reshape(N, -1)
        p["qs"] = data[:, :, 6:22].reshape(N, K // 2)
    elif t == GGMLType.Q5_1:
        p["d"] = _f16(data[:, :, 0:2]).reshape(N, -1)
        p["m"] = _f16(data[:, :, 2:4]).reshape(N, -1)
        p["qh"] = _view(data[:, :, 4:8], "<u4").reshape(N, -1)
        p["qs"] = data[:, :, 8:24].reshape(N, K // 2)
    elif t == GGMLType.Q8_0:
        p["d"] = _f16(data[:, :, 0:2]).reshape(N, -1)
        p["qs"] = _view(data[:, :, 2:34], np.int8).reshape(N, K)
    elif t == GGMLType.Q2_K:
        sc = data[:, :, 0:16]
        d = _f16(data[:, :, 80:82]).astype(np.float32)
        dmin = _f16(data[:, :, 82:84]).astype(np.float32)
        p["scales"] = (d * (sc & 0xF)).reshape(N, K // 16).astype(np.float32)
        p["mins"] = (dmin * (sc >> 4)).reshape(N, K // 16).astype(np.float32)
        p["qs"] = data[:, :, 16:80].reshape(N, K // 4)
    elif t == GGMLType.Q3_K:
        from .decode_np import _q3_scales

        nb = data.shape[1]
        sc6 = _q3_scales(data[:, :, 96:108].reshape(-1, 12)).reshape(N, nb, 16)
        d = _f16(data[:, :, 108:110]).astype(np.float32)
        p["scales"] = (d * (sc6.astype(np.float32) - 32.0)).reshape(N, K // 16)
        p["hmask"] = data[:, :, 0:32].reshape(N, K // 8)
        p["qs"] = data[:, :, 32:96].reshape(N, K // 4)
    elif t in (GGMLType.Q4_K, GGMLType.Q5_K):
        from .encode_np import _unpack_k4_scales

        nb = data.shape[1]
        sc, mn = _unpack_k4_scales(data[:, :, 4:16].reshape(-1, 12))
        sc = sc.reshape(N, nb, 8).astype(np.float32)
        mn = mn.reshape(N, nb, 8).astype(np.float32)
        d = _f16(data[:, :, 0:2]).astype(np.float32)
        dmin = _f16(data[:, :, 2:4]).astype(np.float32)
        p["scales"] = (d * sc).reshape(N, K // 32)
        p["mins"] = (dmin * mn).reshape(N, K // 32)
        if t == GGMLType.Q4_K:
            p["qs"] = data[:, :, 16:144].reshape(N, K // 2)
        else:
            p["qh"] = data[:, :, 16:48].reshape(N, K // 8)
            p["qs"] = data[:, :, 48:176].reshape(N, K // 2)
    elif t == GGMLType.Q6_K:
        d = _f16(data[:, :, 208:210]).astype(np.float32)  # [N, nb, 1]
        sc8 = _view(data[:, :, 192:208], np.int8).astype(np.float32).reshape(N, -1, 16)
        p["scales"] = (d * sc8).reshape(N, K // 16).astype(np.float32)
        p["ql"] = data[:, :, 0:128].reshape(N, K // 2)
        p["qh"] = data[:, :, 128:192].reshape(N, K // 4)
    elif t == GGMLType.Q8_K:
        p["d"] = _view(data[:, :, 0:4], "<f4").reshape(N, -1)
        p["qs"] = _view(data[:, :, 4 : 4 + QK_K], np.int8).reshape(N, K)
    elif t == GGMLType.IQ4_NL:
        p["d"] = _f16(data[:, :, 0:2]).reshape(N, -1)
        p["qs"] = data[:, :, 2:18].reshape(N, K // 2)
    elif t == GGMLType.IQ4_XS:
        nb = data.shape[1]
        d = _f16(data[:, :, 0:2]).astype(np.float32)  # [N, nb, 1]
        sh = _view(data[:, :, 2:4], "<u2").astype(np.uint16)  # [N, nb, 1]
        sl = data[:, :, 4:8]  # [N, nb, 4]
        ib = np.arange(8)
        ls_l = (sl[:, :, ib // 2] >> (4 * (ib % 2))[None, None, :]) & 0xF
        ls_h = (sh >> (2 * ib)[None, None, :]) & 3
        ls = (ls_l | (ls_h << 4)).astype(np.float32) - 32.0  # [N, nb, 8]
        p["scales"] = (d * ls).reshape(N, K // 32).astype(np.float32)
        p["qs"] = data[:, :, 8:136].reshape(N, K // 2)
    else:
        raise NotImplementedError(f"planar relayout for {t.name}")
    return QuantTensor(t.name, tuple(shape), {k: np.ascontiguousarray(v) for k, v in p.items()})


# ---------------------------------------------------------------------------
# jnp decode (XLA path; also the reference for Pallas kernels)
# ---------------------------------------------------------------------------

def _nib(qs, lo_first_cols: int):
    """Block-local nibble concat: [N, nb, B/2] bytes -> [N, nb, B] values."""
    return jnp.concatenate([qs & 0xF, qs >> 4], axis=-1)


def decode(qt: QuantTensor, dtype=jnp.float32) -> jnp.ndarray:
    """Dequantize a QuantTensor to a dense [..., K] array."""
    p = {k: jnp.asarray(v) for k, v in qt.planes.items()}
    N, K = int(np.prod(qt.shape[:-1])), qt.shape[-1]
    kind = qt.kind

    if kind in ("F32", "F16"):
        return p["w"].astype(dtype).reshape(qt.shape)
    if kind == "BF16":
        return jax.lax.bitcast_convert_type(p["w"], jnp.bfloat16).astype(dtype).reshape(qt.shape)

    if kind == "Q4_0":
        qs = p["qs"].reshape(N, -1, 16)
        v = _nib(qs, 16).astype(jnp.int8) - 8
        w = v.astype(dtype) * p["d"].astype(dtype)[..., None]
    elif kind == "Q4_1":
        qs = p["qs"].reshape(N, -1, 16)
        v = _nib(qs, 16).astype(dtype)
        w = v * p["d"].astype(dtype)[..., None] + p["m"].astype(dtype)[..., None]
    elif kind in ("Q5_0", "Q5_1"):
        qs = p["qs"].reshape(N, -1, 16)
        lo = _nib(qs, 16).astype(jnp.int32)
        sh = jnp.arange(32, dtype=jnp.uint32)
        hb = ((p["qh"][..., None] >> sh) & 1).astype(jnp.int32)  # [N, nb, 32]
        v = lo | (hb << 4)
        if kind == "Q5_0":
            w = (v - 16).astype(dtype) * p["d"].astype(dtype)[..., None]
        else:
            w = v.astype(dtype) * p["d"].astype(dtype)[..., None] + p["m"].astype(dtype)[..., None]
    elif kind == "Q8_0":
        qs = p["qs"].reshape(N, -1, 32)
        w = qs.astype(dtype) * p["d"].astype(dtype)[..., None]
    elif kind == "Q8_K":
        qs = p["qs"].reshape(N, -1, QK_K)
        w = qs.astype(dtype) * p["d"].astype(dtype)[..., None]
    elif kind == "Q2_K":
        qs = p["qs"].reshape(N, -1, 32)  # per 128-elem chunk
        v = jnp.concatenate([(qs >> (2 * s)) & 3 for s in range(4)], axis=-1)  # [N, K/128, 128]
        v = v.reshape(N, -1, 16)  # per 16-elem scale group
        w = v.astype(dtype) * p["scales"].astype(dtype)[..., None] - p["mins"].astype(dtype)[
            ..., None
        ]
    elif kind == "Q3_K":
        qs = p["qs"].reshape(N, -1, 32)
        v = jnp.concatenate([(qs >> (2 * s)) & 3 for s in range(4)], axis=-1).astype(jnp.int32)
        hm = p["hmask"].reshape(N, -1, 32)  # [N, K/256*?, 32] bits 0..7 per chunk pair
        # hmask bytes cover a whole 256 superblock: bit (e//32) of byte (e%32)
        hm = p["hmask"].reshape(N, -1, 32)
        bits = jnp.concatenate(
            [(hm >> b) & 1 for b in range(8)], axis=-1
        )  # [N, K/256, 256] in element order
        v = v.reshape(N, -1, 256) - jnp.where(bits > 0, 0, 4)
        v = v.reshape(N, -1, 16)
        w = v.astype(dtype) * p["scales"].astype(dtype)[..., None]
    elif kind == "Q4_K":
        qs = p["qs"].reshape(N, -1, 32)  # per 64-elem group
        v = _nib(qs, 32)
        v = v.reshape(N, -1, 32)  # per 32-elem scale group
        w = v.astype(dtype) * p["scales"].astype(dtype)[..., None] - p["mins"].astype(dtype)[
            ..., None
        ]
    elif kind == "Q5_K":
        qs = p["qs"].reshape(N, -1, 32)
        lo = _nib(qs, 32).reshape(N, -1, 256).astype(jnp.int32)  # superblock order
        qh = p["qh"].reshape(N, -1, 32)
        bits = jnp.concatenate([(qh >> b) & 1 for b in range(8)], axis=-1).astype(jnp.int32)
        v = (lo | (bits << 4)).reshape(N, -1, 32)
        w = v.astype(dtype) * p["scales"].astype(dtype)[..., None] - p["mins"].astype(dtype)[
            ..., None
        ]
    elif kind == "Q6_K":
        ql = p["ql"].reshape(N, -1, 64)  # per 128-elem chunk
        qh = p["qh"].reshape(N, -1, 32)
        l1 = ql[..., 0:32] & 0xF
        l2 = ql[..., 32:64] & 0xF
        l3 = ql[..., 0:32] >> 4
        l4 = ql[..., 32:64] >> 4
        lo = jnp.concatenate([l1, l2, l3, l4], axis=-1).astype(jnp.int32)
        hb = jnp.concatenate(
            [(qh >> (2 * s)) & 3 for s in range(4)], axis=-1
        ).astype(jnp.int32)
        v = (lo | (hb << 4)) - 32
        v = v.reshape(N, -1, 16)
        w = v.astype(dtype) * p["scales"].astype(dtype)[..., None]
    elif kind == "IQ4_NL":
        qs = p["qs"].reshape(N, -1, 16)
        lut = jnp.asarray(KVALUES_IQ4NL, dtype=dtype)
        v = lut[_nib(qs, 16)]
        w = v * p["d"].astype(dtype)[..., None]
    elif kind == "IQ4_XS":
        qs = p["qs"].reshape(N, -1, 16)  # per 32-elem group
        lut = jnp.asarray(KVALUES_IQ4NL, dtype=dtype)
        v = lut[_nib(qs, 16)]
        w = v * p["scales"].astype(dtype)[..., None]
    else:
        raise NotImplementedError(f"jnp decode for {kind}")
    return w.reshape(qt.shape).astype(dtype)
