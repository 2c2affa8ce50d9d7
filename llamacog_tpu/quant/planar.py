"""Planar (structure-of-arrays) quantized tensors, laid out for TPU kernels.

GGUF stores weights as packed per-block structs (AoS). At load we repack each
tensor into flat planes shaped for the Pallas fused dequant-matmul kernels
(ops/pallas/qmm.py) — the TPU analog of the reference's load-time repack
(ggml/src/ggml-cpu/repack.cpp). Values are unchanged; only the bit layout
moves:

* payload planes are sub-byte packed 2-D arrays [N, K/pack] whose in-kernel
  unpack is a plain lane-aligned `concat` of shift/mask slices — Mosaic
  compiles this without any cross-lane shuffle;
* element order within each row is *group-strided*: decoded column c = r*G+g
  holds original element g*R+r, where R is the scale-group size (32 or 16)
  and G = K/R the group count. A scale plane [N, G] then broadcasts to all K
  columns with a single `pltpu.repeat` tile (column c gets scale c mod G);
* the matching activation permutation is a [B, K] reshape-transpose done
  once per matmul outside the kernel (negligible next to weight streaming);
* f16 superblock scales are pre-multiplied with the 6-bit/4-bit sub-scales
  into f32 planes exactly as the reference computes them
  (dequantize_row_q4_K: d*sc in f32).

`decode()` is the pure-jnp dequantizer (XLA fallback path and the reference
the Pallas kernels are tested against).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGML_TYPE_TRAITS, GGMLType
from .decode_np import KVALUES_IQ4NL

# scale-group size per type (elements per scale)
GROUP_SIZE = {
    "Q4_0": 32, "Q4_1": 32, "Q5_0": 32, "Q5_1": 32, "Q8_0": 32,
    "IQ4_NL": 32, "IQ4_XS": 32, "Q4_K": 32, "Q4_KS4": 32, "Q4_KC": 32,
    "Q5_K": 32,
    "Q2_K": 16, "Q3_K": 16, "Q6_K": 16, "Q6_KP": 16,
    "IQ2_XXS": 32, "IQ2_XS": 16, "IQ2_S": 16,
    "IQ3_XXS": 32, "IQ3_S": 32, "IQ1_S": 32, "IQ1_M": 8,
    "TQ1_0": 256, "TQ2_0": 256,
}

# i-quant codebook byte alphabets (positions in the iq_grids.npz tables):
# every grid byte is one of these values, so the planar form stores a 2/3-bit
# alphabet index + a sign bit instead of the full grid entry.
IQ2_ALPHABET = np.array([8.0, 25.0, 43.0], dtype=np.float32)
IQ3XXS_ALPHABET = np.array([4, 12, 20, 28, 36, 44, 52, 62], dtype=np.float32)


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantTensor:
    """A quantized [..., K] tensor as planes. Leading dims flatten to N."""

    kind: str  # ggml type name, static
    shape: tuple[int, ...]  # logical shape, static
    planes: dict[str, Any] = field(default_factory=dict)
    # TP/EP layout this tensor was sharded with (parallel/sharding.shard_params):
    # "row" (N on model axis), "col" (K on model axis), "expert" (dim 0), or
    # None (replicated). Static metadata so jitted code can pick the matching
    # shard_map specs for the Pallas kernels.
    pspec: str | None = None

    def tree_flatten(self):
        keys = tuple(sorted(self.planes))
        return (
            tuple(self.planes[k] for k in keys),
            (self.kind, self.shape, keys, self.pspec),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        kind, shape, keys, pspec = aux
        return cls(kind, shape, dict(zip(keys, children)), pspec)

    @property
    def nbytes(self) -> int:
        return sum(int(np.prod(p.shape)) * p.dtype.itemsize for p in self.planes.values())

    @property
    def group_size(self) -> int:
        return GROUP_SIZE.get(self.kind, 32)


# ---------------------------------------------------------------------------
# load-time repack (numpy)
# ---------------------------------------------------------------------------

def _f16(a: np.ndarray) -> np.ndarray:
    # scale planes are stored f32: Mosaic has no f16->f32 vector casts, and
    # f16 -> f32 conversion is exact
    return a.copy().view("<f2").astype(np.float32)


def _view(b: np.ndarray, dt) -> np.ndarray:
    return b.copy().view(dt)


def _strided(vals: np.ndarray, R: int) -> np.ndarray:
    """[N, K] element order -> group-strided decode order (see module doc)."""
    N, K = vals.shape
    G = K // R
    return np.ascontiguousarray(vals.reshape(N, G, R).swapaxes(1, 2).reshape(N, K))


# Kinds whose planar form keeps the f16 superblock scale (d / dmin) as its
# own [N, S] f32 plane instead of pre-multiplying it into every group
# (measured r4: Q6_K head matvec 870 -> 740 us, ffn_down 101 -> 86 us;
# Q4_K/Q5_K compact the MINS side only — compacting the st plane slowed the
# main dot's operand prep, docs/PERF.md round-4). Groups are strided over
# superblocks so the [N, S] plane tiles to group width with one
# pltpu.repeat: plane column j holds original group (j % S)*SB + j//S.
SB_STRIDED_KINDS = ("Q4_K", "Q4_KS4", "Q4_KC", "Q5_K", "Q6_K", "Q6_KP")


def _sb_strided(vals: np.ndarray, R: int) -> np.ndarray:
    """[N, K] element order -> superblock-strided decode order: decoded
    column c = r*G + b*S + s holds original element (s*SB + b)*R + r, where
    s = superblock, b = group-within-superblock, r = rank-in-group. Group
    of decoded column c is still c % G (the qmm layout contract), and the
    superblock of group-plane column j is j % S."""
    N, K = vals.shape
    SB = 256 // R  # groups per 256-element superblock
    S = K // 256
    return np.ascontiguousarray(
        vals.reshape(N, S, SB, R).transpose(0, 3, 2, 1).reshape(N, K))


def _sb_scale_plane(name: str, arr: np.ndarray, shape) -> dict:
    """Orient a per-superblock scale plane [N, S].

    2-D tensors store it TRANSPOSED as `nameT` [S, N]: a [N, S<128] f32
    plane draws a {0,1} (dim-0-minor) entry layout from XLA, which then
    re-stages the whole plane into VMEM every decode-loop step (measured
    107.1 -> 100.7 t/s at 8B, scripts/dump_decode_hlo.py); [S, N] is
    natively {1,0} with no padding. Stacked-expert (3-D) tensors keep
    [n_exp*N, S] so expert row-slicing stays contiguous
    (ops/pallas/qmm_id._planes3)."""
    if len(shape) <= 2:
        return {name + "T": np.ascontiguousarray(arr.T)}
    return {name: arr}


def _sb_group_order(arr: np.ndarray) -> np.ndarray:
    """Per-group plane [N, S, SB] (natural superblock-major order) ->
    [N, G] in the superblock-strided group order (column j = group
    (j % S)*SB + j//S)."""
    N, S, SB = arr.shape
    return np.ascontiguousarray(arr.transpose(0, 2, 1).reshape(N, S * SB))


def _pack4(sv: np.ndarray) -> np.ndarray:
    N, K = sv.shape
    return (sv[:, : K // 2] | (sv[:, K // 2:] << 4)).astype(np.uint8)


def _pack2(sv: np.ndarray) -> np.ndarray:
    N, K = sv.shape
    q = K // 4
    return (
        sv[:, :q] | (sv[:, q : 2 * q] << 2) | (sv[:, 2 * q : 3 * q] << 4) | (sv[:, 3 * q :] << 6)
    ).astype(np.uint8)


def _pack1(sv: np.ndarray) -> np.ndarray:
    N, K = sv.shape
    e = K // 8
    out = np.zeros((N, e), dtype=np.uint8)
    for b in range(8):
        out |= (sv[:, b * e : (b + 1) * e] & 1).astype(np.uint8) << b
    return out


def _k4_scale_min(scales: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    sc = np.empty((scales.shape[0], 8), dtype=np.uint8)
    mn = np.empty_like(sc)
    sc[:, :4] = scales[:, :4] & 63
    mn[:, :4] = scales[:, 4:8] & 63
    sc[:, 4:] = (scales[:, 8:12] & 0xF) | ((scales[:, :4] >> 6) << 4)
    mn[:, 4:] = (scales[:, 8:12] >> 4) | ((scales[:, 4:8] >> 6) << 4)
    return sc, mn


def _q3_scales(raw: np.ndarray) -> np.ndarray:
    a = raw.copy().view("<u4")
    a0, a1, tmp = a[:, 0], a[:, 1], a[:, 2]
    kmask1 = np.uint32(0x03030303)
    kmask2 = np.uint32(0x0F0F0F0F)
    out = np.empty((raw.shape[0], 4), dtype=np.uint32)
    out[:, 0] = (a0 & kmask2) | (((tmp >> np.uint32(0)) & kmask1) << np.uint32(4))
    out[:, 1] = (a1 & kmask2) | (((tmp >> np.uint32(2)) & kmask1) << np.uint32(4))
    out[:, 2] = ((a0 >> np.uint32(4)) & kmask2) | (((tmp >> np.uint32(4)) & kmask1) << np.uint32(4))
    out[:, 3] = ((a1 >> np.uint32(4)) & kmask2) | (((tmp >> np.uint32(6)) & kmask1) << np.uint32(4))
    return out.view(np.int8).reshape(raw.shape[0], 16)


def _unpack_2bit_elems(qs: np.ndarray) -> np.ndarray:
    """wire 2-bit [nb, 64] -> [nb, 256] element order (q2/q3 layout)."""
    nb = qs.shape[0]
    out = np.empty((nb, 256), dtype=np.uint8)
    for chunk in range(2):
        cb = qs[:, chunk * 32 : chunk * 32 + 32]
        for shift in range(4):
            out[:, chunk * 128 + shift * 32 : chunk * 128 + (shift + 1) * 32] = (
                cb >> (2 * shift)
            ) & 3
    return out


def _unpack_k4_elems(qs: np.ndarray) -> np.ndarray:
    """wire nibbles [nb, 128] -> [nb, 256] element order (q4_K/q5_K layout)."""
    nb = qs.shape[0]
    g = qs.reshape(nb, 4, 32)
    out = np.empty((nb, 4, 2, 32), dtype=np.uint8)
    out[:, :, 0, :] = g & 0xF
    out[:, :, 1, :] = g >> 4
    return out.reshape(nb, 256)


def _superblock_bits(qb: np.ndarray) -> np.ndarray:
    """wire bit plane [nb, 32] -> [nb, 256]: element e uses bit e//32 of byte e%32."""
    e = np.arange(256)
    return (qb[:, e % 32] >> (e // 32)[None, :]) & 1


def _iq_elements(t: GGMLType, blk: np.ndarray) -> dict[str, np.ndarray]:
    """Expand i-quant blocks [nb, type_size] to element-order planes:
    codes (alphabet indices), sign bits, f32 group scales (and mins for iq1).

    Bit extraction mirrors decode_np.dequant_iq* (validated bit-exact against
    the reference); here the codebook values stay as 2/3-bit indices so the
    payload remains sub-byte packed in HBM.
    """
    from .decode_np import _grids

    g = _grids()
    sbit128 = (g["sign128"] < 0)  # [128,8] bool
    sbit256 = (g["sign256"] < 0)
    nb = blk.shape[0]
    out: dict[str, np.ndarray] = {}
    if t == GGMLType.IQ2_XXS:
        d = blk[:, 0:2].copy().view("<f2").astype(np.float32)
        u32 = blk[:, 2:66].copy().view("<u4").reshape(nb, 8, 2).astype(np.uint32)
        a0, a1 = u32[..., 0], u32[..., 1]
        idx = (a0[..., None] >> (8 * np.arange(4))[None, None, :]) & 0xFF
        s7 = (a1[..., None] >> (7 * np.arange(4))[None, None, :]) & 127
        mag = g["iq2xxs"][idx]  # [nb,8,4,8]
        out["codes"] = np.searchsorted(IQ2_ALPHABET, mag.reshape(nb, 256) - 0.5)
        out["signs"] = sbit128[s7].reshape(nb, 256)
        out["scales"] = d * (0.5 + (a1 >> 28).astype(np.float32)) * 0.25  # [nb,8]
    elif t in (GGMLType.IQ2_XS, GGMLType.IQ2_S):
        d = blk[:, 0:2].copy().view("<f2").astype(np.float32)
        if t == GGMLType.IQ2_XS:
            qs = blk[:, 2:66].copy().view("<u2").reshape(nb, 8, 4).astype(np.uint16)
            idx = qs & 511
            sb = sbit128[qs >> 9]  # [nb,8,4,8]
            mag = g["iq2xs"][idx]
            sc = blk[:, 66:74]
        else:
            q8 = blk[:, 2:34].reshape(nb, 8, 4).astype(np.uint16)
            sgn = blk[:, 34:66].reshape(nb, 8, 4)
            qh = blk[:, 66:74].astype(np.uint16)
            shifts = (8 - 2 * np.arange(4))[None, None, :]
            idx = q8 | ((qh[..., None] << shifts) & 0x300)
            sb = sbit256[sgn]
            mag = g["iq2s"][idx]
            sc = blk[:, 74:82]
        out["codes"] = np.searchsorted(IQ2_ALPHABET, mag.reshape(nb, 256) - 0.5)
        out["signs"] = sb.reshape(nb, 256)
        db = np.stack(
            [d * (0.5 + (sc & 0xF)) * 0.25, d * (0.5 + (sc >> 4)) * 0.25], axis=-1
        )  # [nb,8,2] — one scale per 16 elements
        out["scales"] = db.reshape(nb, 16).astype(np.float32)
    elif t == GGMLType.IQ3_XXS:
        d = blk[:, 0:2].copy().view("<f2").astype(np.float32)
        qs = blk[:, 2:66].reshape(nb, 8, 4, 2)
        sas = blk[:, 66:98].copy().view("<u4").astype(np.uint32)
        s7 = (sas[..., None] >> (7 * np.arange(4))[None, None, :]) & 127
        mag = g["iq3xxs"][qs].reshape(nb, 256)
        out["codes"] = np.searchsorted(IQ3XXS_ALPHABET, mag - 0.5)
        out["signs"] = sbit128[s7].reshape(nb, 256)
        out["scales"] = d * (0.5 + (sas >> 28).astype(np.float32)) * 0.5  # [nb,8]
    elif t == GGMLType.IQ3_S:
        d = blk[:, 0:2].copy().view("<f2").astype(np.float32)
        qs = blk[:, 2:66].reshape(nb, 8, 8).astype(np.uint16)
        qh = blk[:, 66:74].astype(np.uint16)
        sgn = blk[:, 74:106].reshape(nb, 8, 4)
        sc = blk[:, 106:110]
        ib = np.arange(8)
        nib = (sc[:, ib // 2] >> (4 * (ib % 2))[None, :]) & 0xF
        out["scales"] = (d * (1 + 2 * nib.astype(np.float32))).astype(np.float32)  # [nb,8]
        hi = (qh[..., None] >> ib[None, None, :]) & 1
        mag = g["iq3s"][qs | (hi << 8)]  # [nb,8,8,4] values 2c+1
        out["codes"] = ((mag - 1) / 2).astype(np.uint8).reshape(nb, 256)
        out["signs"] = sbit256[sgn].reshape(nb, 8, 4, 2, 4).reshape(nb, 256)
    elif t == GGMLType.IQ1_S:
        from .decode_np import IQ1_DELTA

        d = blk[:, 0:2].copy().view("<f2").astype(np.float32)
        qs = blk[:, 2:34].reshape(nb, 8, 4).astype(np.uint16)
        qh = blk[:, 34:50].copy().view("<u2").astype(np.uint16)
        dl = d * (2 * ((qh >> 12) & 7).astype(np.float32) + 1)  # [nb,8]
        delta = np.where(qh & 0x8000, -IQ1_DELTA, IQ1_DELTA).astype(np.float32)
        idx = qs | (((qh[..., None] >> (3 * np.arange(4))[None, None, :]) & 7) << 8)
        out["codes"] = (g["iq1s"][idx] + 1).astype(np.uint8).reshape(nb, 256)
        out["scales"] = dl
        out["mins"] = -dl * delta  # decode: v = (c-1)*scale - min
    elif t == GGMLType.IQ1_M:
        from .decode_np import IQ1_DELTA

        qs = blk[:, 0:32].reshape(nb, 8, 4).astype(np.uint16)
        qh = blk[:, 32:48].reshape(nb, 8, 2).astype(np.uint16)
        scb = blk[:, 48:56].copy().view("<u2").astype(np.uint16)
        d16 = (
            (scb[:, 0] >> 12)
            | ((scb[:, 1] >> 8) & 0x00F0)
            | ((scb[:, 2] >> 4) & 0x0F00)
            | (scb[:, 3] & 0xF000)
        ).astype(np.uint16)
        d = d16.view(np.float16).astype(np.float32)[:, None, None]  # [nb,1,1]
        ib = np.arange(8)
        dl1 = 2 * ((scb[:, ib // 2] >> (6 * (ib % 2))[None, :]) & 7).astype(np.float32) + 1
        dl2 = 2 * ((scb[:, ib // 2] >> (6 * (ib % 2) + 3)[None, :]) & 7).astype(np.float32) + 1
        dl = d * np.stack([dl1, dl1, dl2, dl2], axis=-1)  # [nb,8,4] per 8 elements
        qhl = qh[:, :, [0, 0, 1, 1]]
        idx = qs | ((qhl << np.array([8, 4, 8, 4])[None, None, :]) & 0x700)
        dbit = np.array([0x08, 0x80, 0x08, 0x80])[None, None, :]
        delta = np.where(qhl & dbit, -IQ1_DELTA, IQ1_DELTA).astype(np.float32)
        out["codes"] = (g["iq1s"][idx] + 1).astype(np.uint8).reshape(nb, 256)
        out["scales"] = dl.reshape(nb, 32)  # per-8-element groups
        out["mins"] = (-dl * delta).reshape(nb, 32)
    else:
        raise NotImplementedError(t.name)
    return out


def from_gguf(data: np.ndarray, ggml_type: GGMLType, shape: tuple[int, ...]) -> QuantTensor:
    """Repack raw GGUF block bytes into TPU-planar form (no value change)."""
    n_el = int(np.prod(shape))
    K = shape[-1]
    N = n_el // K
    tt = GGML_TYPE_TRAITS[ggml_type]
    t = ggml_type
    p: dict[str, np.ndarray] = {}

    if t == GGMLType.F32:
        p["w"] = np.asarray(data, np.uint8)[: 4 * n_el].copy().view("<f4").reshape(N, K)
        return QuantTensor(t.name, tuple(shape), p)
    if t == GGMLType.F16:
        p["w"] = np.asarray(data, np.uint8)[: 2 * n_el].copy().view("<f2").reshape(N, K)
        return QuantTensor(t.name, tuple(shape), p)
    if t == GGMLType.BF16:
        p["w"] = np.asarray(data, np.uint8)[: 2 * n_el].copy().view("<u2").reshape(N, K)
        return QuantTensor(t.name, tuple(shape), p)

    data = np.asarray(data, np.uint8).reshape(N, K // tt.block_size, tt.type_size)
    nb = data.shape[1]

    if t in (GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.IQ4_NL):
        off = {GGMLType.Q4_0: 2, GGMLType.Q4_1: 4, GGMLType.IQ4_NL: 2}[t]
        qs = data[:, :, off : off + 16]
        ints = np.concatenate([qs & 0xF, qs >> 4], axis=2).reshape(N, K)
        if t == GGMLType.IQ4_NL:
            # LUT formats store the MAPPED values as int8: the 16-entry
            # nonlinear codebook costs ~16 select passes per element in the
            # kernel (measured 6x off the roofline at 8B), while int8 levels
            # decode like Q8_0 — the 4.25->8.25 bits/weight bandwidth trade
            # is far cheaper than the VPU LUT
            lvl = KVALUES_IQ4NL[ints].astype(np.int8)
            p["qs"] = _strided(lvl.view(np.uint8), 32).view(np.int8)
        else:
            p["qs"] = _pack4(_strided(ints, 32))
        p["d"] = _f16(data[:, :, 0:2]).reshape(N, nb)
        if t == GGMLType.Q4_1:
            p["m"] = _f16(data[:, :, 2:4]).reshape(N, nb)
    elif t in (GGMLType.Q5_0, GGMLType.Q5_1):
        off = 6 if t == GGMLType.Q5_0 else 8
        qs = data[:, :, off : off + 16]
        lo = np.concatenate([qs & 0xF, qs >> 4], axis=2)  # [N, nb, 32]
        qh = _view(data[:, :, off - 4 : off], "<u4").reshape(N, nb, 1).astype(np.uint32)
        hb = ((qh >> np.arange(32, dtype=np.uint32)) & 1).astype(np.uint8)
        p["qs"] = _pack4(_strided(lo.reshape(N, K), 32))
        p["qh"] = _pack1(_strided(hb.reshape(N, K), 32))
        p["d"] = _f16(data[:, :, 0:2]).reshape(N, nb)
        if t == GGMLType.Q5_1:
            p["m"] = _f16(data[:, :, 2:4]).reshape(N, nb)
    elif t == GGMLType.Q8_0:
        ints = _view(data[:, :, 2:34], np.int8).reshape(N, K)
        p["qs"] = _strided(ints.view(np.uint8), 32).view(np.int8)
        p["d"] = _f16(data[:, :, 0:2]).reshape(N, nb)
    elif t == GGMLType.Q2_K:
        sc = data[:, :, 0:16]
        d = _f16(data[:, :, 80:82]).astype(np.float32)
        dmin = _f16(data[:, :, 82:84]).astype(np.float32)
        p["scales"] = (d * (sc & 0xF)).reshape(N, K // 16).astype(np.float32)
        p["mins"] = (dmin * (sc >> 4)).reshape(N, K // 16).astype(np.float32)
        ints = _unpack_2bit_elems(data[:, :, 16:80].reshape(-1, 64)).reshape(N, K)
        p["qs"] = _pack2(_strided(ints, 16))
    elif t == GGMLType.Q3_K:
        sc6 = _q3_scales(data[:, :, 96:108].reshape(-1, 12)).reshape(N, nb, 16)
        d = _f16(data[:, :, 108:110]).astype(np.float32)
        p["scales"] = (d * (sc6.astype(np.float32) - 32.0)).reshape(N, K // 16)
        q2 = _unpack_2bit_elems(data[:, :, 32:96].reshape(-1, 64)).reshape(N, K)
        hb = _superblock_bits(data[:, :, 0:32].reshape(-1, 32)).reshape(N, K).astype(np.uint8)
        # 3-bit values merged into one 4-bit plane: a single nibble unpack
        # in-kernel instead of a 2-bit + 1-bit recombine (0.375 -> 0.5
        # bytes/el buys ~3x fewer decode ops; q3_k measured VPU-bound)
        p["qs"] = _pack4(_strided(q2 | (hb << 2), 16))
    elif t in (GGMLType.Q4_K, GGMLType.Q5_K):
        import os as _os
        sc_u8, mn = _k4_scale_min(data[:, :, 4:16].reshape(-1, 12))
        sc = sc_u8.reshape(N, nb, 8).astype(np.float32)
        d = _f16(data[:, :, 0:2]).astype(np.float32)
        compact_sc = (t == GGMLType.Q4_K and len(shape) <= 2
                      and _os.environ.get("LLAMACOG_Q4K_CSC") == "1"
                      and _os.environ.get("LLAMACOG_Q4_S4") != "1")
        if compact_sc:
            # Q4_KC: COMPACT st side — 6-bit sc as u8 per group + the f16
            # superblock d/dmin as ONE merged transposed f32 plane
            # ddm_sbT [2S, N] (rows 0..S-1 = d, S..2S-1 = dmin; merged
            # because a kernel with TWO minor-indexed [S, N] planes
            # measured 120 -> 197 us at gate_up — scripts/
            # exp_csc_variants.py — while one is free). st and mins are
            # recombined in-kernel (st = d_sb[j % S] * sc[j], exact f32
            # product, same value as the premultiplied plane). Streams
            # 0.375 b/w of scale data instead of the f32 plane's 1.0.
            dmin = _f16(data[:, :, 2:4]).reshape(N, nb)
            p["ddm_sbT"] = np.ascontiguousarray(
                np.concatenate([d.reshape(N, nb), dmin], axis=1).T)
            p["scq"] = _sb_group_order(sc_u8.reshape(N, nb, 8))
        else:
            # premultiplied f32 st plane (d*sc, exact — f16 x 6-bit int)
            p["scales"] = _sb_group_order(d * sc)
            p.update(_sb_scale_plane(
                "dmin_sb", _f16(data[:, :, 2:4]).reshape(N, nb), shape))
        p["m"] = _sb_group_order(mn.reshape(N, nb, 8))
        if t == GGMLType.Q4_K:
            ints = _unpack_k4_elems(data[:, :, 16:144].reshape(-1, 128)).reshape(N, K)
            import os as _os
            if (len(shape) <= 2 and N % 2 == 0
                    and _os.environ.get("LLAMACOG_Q4_S4") == "1"):
                # Q4_KS4: (q-8) two's-complement nibbles, ROW-PAIR packed
                # (qsv u8 [N/2, K]: byte (r, c) = row 2r's nibble | row
                # 2r+1's << 4). Mosaic's pltpu.bitcast(u8, int4) expands
                # the sublane dim with exactly this pairing — int4 row
                # 2r+n = nibble n of u8 row r — so the kernel gets the
                # [TN, K] s4 weight tile rows-in-order as a free register
                # reinterpret: ONE load+cast+mul full-width dot at the
                # same streamed bytes (no mask/shift unpack, no dual
                # half-dots). Measured 102.7 us vs 114.8 at the gate_up
                # matvec shape = the DMA roofline (scripts/exp_s4.py);
                # in-kernel bitcast keeps planes u8 across jit boundaries
                # (int4 jit args recurse in jax 0.9.0, and a trace-level
                # conversion re-materializes GBs inside decode loops).
                # The +8 moves into the correction dot:
                # corr = mins - 8*scales (ops/pallas/qmm._dec_q4_ks4).
                # 3-D (stacked-expert) tensors keep classic Q4_K: the
                # expert-gather kernels index rows dynamically.
                v = (_sb_strided(ints, 32).astype(np.int16) - 8) & 0xF
                v = v.astype(np.uint8)
                p["qsv"] = (v[0::2] | (v[1::2] << 4)).astype(np.uint8)
                return QuantTensor("Q4_KS4", tuple(shape), p)
            p["qs"] = _pack4(_sb_strided(ints, 32))
            if compact_sc:
                return QuantTensor(
                    "Q4_KC", tuple(shape),
                    {k: np.ascontiguousarray(v) for k, v in p.items()})
        else:
            lo = _unpack_k4_elems(data[:, :, 48:176].reshape(-1, 128)).reshape(N, K)
            hb = _superblock_bits(data[:, :, 16:48].reshape(-1, 32)).reshape(N, K).astype(np.uint8)
            p["qs"] = _pack4(_sb_strided(lo, 32))
            p["qh"] = _pack1(_sb_strided(hb, 32))
    elif t == GGMLType.Q6_K:
        # d stays a per-superblock f32 plane [N, S]; sc is the wire's int8
        # per-group sub-scale — recombined in-kernel ([TN, G] work, 1/16 of
        # elements). Measured r4: head matvec 870 -> 740 us vs the
        # premultiplied f32 [N, G] plane (10 -> 8.6 bits/weight streamed).
        p.update(_sb_scale_plane("d_sb", _f16(data[:, :, 208:210]).reshape(N, nb), shape))
        sc8 = _view(data[:, :, 192:208], np.int8).reshape(N, nb, 16)
        p["sc"] = _sb_group_order(sc8).astype(np.int8)
        ql = data[:, :, 0:128].reshape(-1, 2, 64)
        qh = data[:, :, 128:192].reshape(-1, 2, 32)
        lo = np.concatenate(
            [ql[..., 0:32] & 0xF, ql[..., 32:64] & 0xF, ql[..., 0:32] >> 4, ql[..., 32:64] >> 4],
            axis=2,
        )  # [-1, 2, 128]
        hi = np.concatenate([(qh >> (2 * s)) & 3 for s in range(4)], axis=2)
        import os as _os
        if (len(shape) <= 2
                and _os.environ.get("LLAMACOG_Q6K_PACK") == "1"):
            # Q6_KP: packed 6-bit payload — raw levels q in [0, 64) as a
            # 4-bit plane (split _pack4) + a 2-bit plane (_pack2), both in
            # superblock-strided order. 6.625 b/w streamed instead of the
            # int8 predecode's 8.625; in-kernel reassembly is one extra
            # shift+or per slice (Q5_K-class work). The r2-era "VPU-bound"
            # measurement predates the tn table; re-measured r5, the 8B
            # decode kernels sit AT the DMA roofline so the 2 b/w win
            # dominates. Value path unchanged: (q - 32) folds into the
            # correction dot (corr = 32 * st).
            q6 = (lo.reshape(N, K) | (hi.reshape(N, K) << 4)).astype(np.uint8)
            sv = _sb_strided(q6, 16)
            p["qs"] = _pack4(sv & 0xF)
            p["qh"] = _pack2(sv >> 4)
            return QuantTensor(
                "Q6_KP", tuple(shape),
                {k: np.ascontiguousarray(v) for k, v in p.items()})
        # 3-D (stacked-expert) tensors: signed int8 levels (q - 32), like
        # the LUT formats — one byte/level, no qh reassembly
        q6 = (lo.reshape(N, K).astype(np.int16) | (hi.reshape(N, K).astype(np.int16) << 4)) - 32
        p["qs"] = _sb_strided(q6.astype(np.int8).view(np.uint8), 16).view(np.int8)
    elif t == GGMLType.IQ4_XS:
        d = _f16(data[:, :, 0:2]).astype(np.float32)
        sh = _view(data[:, :, 2:4], "<u2").astype(np.uint16)
        sl = data[:, :, 4:8]
        ib = np.arange(8)
        ls_l = (sl[:, :, ib // 2] >> (4 * (ib % 2))[None, None, :]) & 0xF
        ls_h = (sh >> (2 * ib)[None, None, :]) & 3
        ls = (ls_l | (ls_h << 4)).astype(np.float32) - 32.0
        p["scales"] = (d * ls).reshape(N, K // 32).astype(np.float32)
        qs = data[:, :, 8:136].reshape(N, nb, 8, 16)
        ints = np.concatenate([qs & 0xF, qs >> 4], axis=3).reshape(N, K)
        # LUT format: store mapped int8 values (see IQ4_NL note above)
        lvl = KVALUES_IQ4NL[ints].astype(np.int8)
        p["qs"] = _strided(lvl.view(np.uint8), 32).view(np.int8)
    elif t in (
        GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
        GGMLType.IQ3_XXS, GGMLType.IQ3_S,
    ):
        # codebook formats: pre-fold alphabet LUT and sign bit into signed
        # int8 levels (|value| <= 62 for every alphabet), so the kernel
        # decode is a Q8_0-style int8 * group-scale — the packed
        # code+sign planes cost 12-35 VPU ops/element to expand in-kernel
        el = _iq_elements(t, data.reshape(-1, tt.type_size))
        R = GROUP_SIZE[t.name]
        codes = el["codes"].reshape(N, K).astype(np.int64)
        sign = 1 - 2 * el["signs"].reshape(N, K).astype(np.int64)
        if t in (GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S):
            mag = IQ2_ALPHABET.astype(np.int64)[codes]
        elif t == GGMLType.IQ3_XXS:
            mag = IQ3XXS_ALPHABET.astype(np.int64)[codes]
        else:  # IQ3_S: grid values are 2c+1
            mag = 2 * codes + 1
        lvl = (mag * sign).astype(np.int8)
        p["qs"] = _strided(lvl.view(np.uint8), R).view(np.int8)
        p["scales"] = el["scales"].reshape(N, K // R).astype(np.float32)
    elif t in (GGMLType.IQ1_S, GGMLType.IQ1_M):
        el = _iq_elements(t, data.reshape(-1, tt.type_size))
        R = GROUP_SIZE[t.name]
        codes = el["codes"].reshape(N, K).astype(np.uint8)
        p["qs"] = _pack2(_strided(codes & 3, R))
        p["scales"] = el["scales"].reshape(N, K // R).astype(np.float32)
        if "mins" in el:
            p["mins"] = el["mins"].reshape(N, K // R).astype(np.float32)
    elif t in (GGMLType.TQ1_0, GGMLType.TQ2_0):
        # ternary (BitNet b1.58): elements are {-1,0,1} stored as codes
        # {0,1,2} in a 2-bit plane; value = (q - 1) * d, one f16 d per
        # 256-block (decode_np.dequant_tq1_0/tq2_0 for the wire layouts)
        codes = np.empty((N, nb, 256), dtype=np.uint8)
        if t == GGMLType.TQ1_0:
            pow3 = np.array([1, 3, 9, 27, 81], dtype=np.uint16)
            qs16 = data[:, :, 0:48].astype(np.uint16)
            for grp, nby in ((0, 32), (1, 16)):
                base, byts = grp * 160, qs16[:, :, grp * 32 : grp * 32 + nby]
                for j in range(5):
                    codes[:, :, base + j * nby : base + (j + 1) * nby] = (
                        ((byts * pow3[j]) & 0xFF) * 3 // 256
                    )
            qh16 = data[:, :, 48:52].astype(np.uint16)
            for j in range(4):
                codes[:, :, 240 + j * 4 : 240 + (j + 1) * 4] = (
                    ((qh16 * pow3[j]) & 0xFF) * 3 // 256
                )
            p["d"] = _f16(data[:, :, 52:54]).reshape(N, nb)
        else:
            qs = data[:, :, 0:64]
            for half in range(2):
                byts = qs[:, :, half * 32 : half * 32 + 32]
                for j in range(4):
                    codes[:, :, half * 128 + j * 32 : half * 128 + (j + 1) * 32] = (
                        byts >> (2 * j)
                    ) & 3
            p["d"] = _f16(data[:, :, 64:66]).reshape(N, nb)
        p["qs"] = _pack2(_strided(codes.reshape(N, K), 256))
    else:
        raise NotImplementedError(f"planar relayout for {t.name}")
    return QuantTensor(t.name, tuple(shape), {k: np.ascontiguousarray(v) for k, v in p.items()})


# ---------------------------------------------------------------------------
# jnp decode (XLA path; reference for the Pallas kernels)
# ---------------------------------------------------------------------------

def _unpack4_j(qs):  # [N, K/2] -> [N, K] strided order
    q = qs.astype(jnp.int32)
    return jnp.concatenate([q & 0xF, q >> 4], axis=-1)


def _unpack2_j(qs):
    q = qs.astype(jnp.int32)
    return jnp.concatenate([(q >> (2 * s)) & 3 for s in range(4)], axis=-1)


def _unpack1_j(qb):
    q = qb.astype(jnp.int32)
    return jnp.concatenate([(q >> b) & 1 for b in range(8)], axis=-1)


def _sb_plane_j(p, name):
    """Superblock scale plane as f32 [N, S] from either orientation
    (see _sb_scale_plane)."""
    if name + "T" in p:
        return p[name + "T"].astype(jnp.float32).T
    return p[name].astype(jnp.float32)


def _tile_scale_j(s, R):  # [N, G] -> [N, K]: column c gets s[c mod G]
    return jnp.tile(s.astype(jnp.float32), (1, R))


def _unstride_j(vals, R, sb=False):  # strided decode order -> element order
    N, K = vals.shape
    G = K // R
    if sb:  # superblock-strided: col c = r*G + b*S + s -> e = (s*SB+b)*R + r
        S = K // 256
        SB = 256 // R
        return vals.reshape(N, R, SB, S).transpose(0, 3, 2, 1).reshape(N, K)
    return vals.reshape(N, R, G).swapaxes(1, 2).reshape(N, K)


def decode_strided(qt: QuantTensor) -> jnp.ndarray:
    """Dequantize to f32 [N, K] in the *strided* column order (kernel order)."""
    p = {k: jnp.asarray(v) for k, v in qt.planes.items()}
    kind = qt.kind
    if kind == "Q4_0":
        v = _unpack4_j(p["qs"]).astype(jnp.float32) - 8.0
        return v * _tile_scale_j(p["d"], 32)
    if kind == "Q4_1":
        v = _unpack4_j(p["qs"]).astype(jnp.float32)
        return v * _tile_scale_j(p["d"], 32) + _tile_scale_j(p["m"], 32)
    if kind == "Q5_0":
        v = (_unpack4_j(p["qs"]) | (_unpack1_j(p["qh"]) << 4)).astype(jnp.float32) - 16.0
        return v * _tile_scale_j(p["d"], 32)
    if kind == "Q5_1":
        v = (_unpack4_j(p["qs"]) | (_unpack1_j(p["qh"]) << 4)).astype(jnp.float32)
        return v * _tile_scale_j(p["d"], 32) + _tile_scale_j(p["m"], 32)
    if kind == "Q8_0":
        return p["qs"].astype(jnp.float32) * _tile_scale_j(p["d"], 32)
    if kind == "Q2_K":
        v = _unpack2_j(p["qs"]).astype(jnp.float32)
        return v * _tile_scale_j(p["scales"], 16) - _tile_scale_j(p["mins"], 16)
    if kind == "Q3_K":
        v = _unpack4_j(p["qs"]).astype(jnp.float32) - 4.0
        return v * _tile_scale_j(p["scales"], 16)
    if kind in ("Q4_K", "Q4_KS4", "Q4_KC", "Q5_K"):
        # mins recombined from the compact planes: group-plane col j's
        # superblock is j % S (see _sb_strided)
        if kind == "Q4_KS4":
            # row-pair (q-8) nibbles: interleave rows back then re-offset
            q = p["qsv"].astype(jnp.int32)
            lo, hi = q & 0xF, q >> 4
            v = jnp.stack([lo, hi], axis=1).reshape(2 * q.shape[0],
                                                    q.shape[-1])
            v = ((v + 8) & 0xF).astype(jnp.float32)  # q = sext4(n) + 8
        elif kind in ("Q4_K", "Q4_KC"):
            v = _unpack4_j(p["qs"]).astype(jnp.float32)
        else:
            v = (_unpack4_j(p["qs"]) | (_unpack1_j(p["qh"]) << 4)).astype(jnp.float32)
        G = p["m"].shape[-1]
        if kind == "Q4_KC":
            dmin = p["ddm_sbT"][p["ddm_sbT"].shape[0] // 2:].T
        else:
            dmin = _sb_plane_j(p, "dmin_sb")
        mins = jnp.tile(dmin, (1, G // dmin.shape[-1])) * p["m"].astype(jnp.float32)
        if kind == "Q4_KC":
            d_sb = p["ddm_sbT"][: p["ddm_sbT"].shape[0] // 2].T
            st = jnp.tile(d_sb, (1, G // d_sb.shape[-1])) * p["scq"].astype(jnp.float32)
        else:
            st = p["scales"]
        return v * _tile_scale_j(st, 32) - _tile_scale_j(mins, 32)
    if kind in ("Q6_K", "Q6_KP"):
        # scale = d_sb[j % S] * sc[j]; levels are signed int8 (q - 32) for
        # Q6_K, packed raw 4+2-bit codes (q, minus 32 here) for Q6_KP
        G = p["sc"].shape[-1]
        d_sb = _sb_plane_j(p, "d_sb")
        st = jnp.tile(d_sb, (1, G // d_sb.shape[-1])) * p["sc"].astype(jnp.float32)
        if kind == "Q6_KP":
            v = (_unpack4_j(p["qs"]) | (_unpack2_j(p["qh"]) << 4)).astype(jnp.float32) - 32.0
        else:
            v = p["qs"].astype(jnp.float32)
        return v * _tile_scale_j(st, 16)
    R = GROUP_SIZE.get(kind, 32)
    if kind in ("IQ4_NL", "IQ4_XS", "IQ2_XXS", "IQ2_XS", "IQ2_S",
                "IQ3_XXS", "IQ3_S"):
        # LUT/codebook formats store pre-mapped int8 levels (see from_gguf)
        s = p["d"] if kind == "IQ4_NL" else p["scales"]
        return p["qs"].astype(jnp.float32) * _tile_scale_j(s, R)
    if kind in ("IQ1_S", "IQ1_M"):
        v = _unpack2_j(p["qs"]).astype(jnp.float32) - 1.0
        return v * _tile_scale_j(p["scales"], R) - _tile_scale_j(p["mins"], R)
    if kind in ("TQ1_0", "TQ2_0"):
        v = _unpack2_j(p["qs"]).astype(jnp.float32) - 1.0
        return v * _tile_scale_j(p["d"], R)
    raise NotImplementedError(f"decode for {kind}")


def decode(qt: QuantTensor, dtype=jnp.float32) -> jnp.ndarray:
    """Dequantize to a dense array in the original element order."""
    if qt.kind in ("F32", "F16"):
        return jnp.asarray(qt.planes["w"]).astype(dtype).reshape(qt.shape)
    if qt.kind == "BF16":
        w = jax.lax.bitcast_convert_type(jnp.asarray(qt.planes["w"]), jnp.bfloat16)
        return w.astype(dtype).reshape(qt.shape)
    w = decode_strided(qt)
    w = _unstride_j(w, qt.group_size, sb=qt.kind in SB_STRIDED_KINDS)
    return w.reshape(qt.shape).astype(dtype)


def gather_rows(qt: QuantTensor, idx: jnp.ndarray) -> QuantTensor:
    """Row-gather a planar tensor: planes are all [N, ...], so taking rows
    first and decoding after costs O(len(idx)·K) instead of O(N·K) — the
    token-embedding lookup path (decode must never dequantize the whole
    vocab table)."""
    if len(qt.shape) != 2:
        raise ValueError("gather_rows expects a 2-D QuantTensor")
    flat_idx = idx.reshape(-1)
    if qt.kind == "Q4_KS4":
        # row-pair-packed qsv: weight row r lives in plane row r//2,
        # nibble r%2. Gather the pair rows, select the nibble, and repack
        # as a classic Q4_K sub-tensor (split _pack4 layout) — the other
        # planes are identical between the two kinds.
        K = qt.shape[-1]
        q = jnp.take(qt.planes["qsv"], flat_idx // 2, axis=0).astype(jnp.int32)
        nib = jnp.where((flat_idx % 2 == 0)[:, None], q & 0xF, q >> 4)
        v = (nib + 8) & 0xF  # wire codes 0..15, strided order
        planes = {k: jnp.take(p, flat_idx, axis=1 if k.endswith("T") else 0)
                  for k, p in qt.planes.items() if k != "qsv"}
        planes["qs"] = (v[:, : K // 2] | (v[:, K // 2:] << 4)).astype(jnp.uint8)
        return QuantTensor("Q4_K", (int(flat_idx.shape[0]), K), planes)
    # transposed superblock planes ([S, N]) carry the row dim in axis 1
    planes = {k: jnp.take(v, flat_idx, axis=1 if k.endswith("T") else 0)
              for k, v in qt.planes.items()}
    return QuantTensor(qt.kind, (int(flat_idx.shape[0]), qt.shape[-1]), planes)


def decode_rows(qt: QuantTensor, idx: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """decode(qt)[idx] without materializing the full table. Returns
    [*idx.shape, K]."""
    sub = gather_rows(qt, idx)
    out = decode(sub, dtype=dtype)
    return out.reshape(*idx.shape, qt.shape[-1])


def permute_activation(x: jnp.ndarray, qt: QuantTensor) -> jnp.ndarray:
    """Reorder x's K axis into the QuantTensor's strided column order."""
    R = qt.group_size
    K = x.shape[-1]
    G = K // R
    lead = x.shape[:-1]
    if qt.kind in SB_STRIDED_KINDS:
        S = K // 256
        SB = 256 // R
        nd = len(lead)
        return x.reshape(*lead, S, SB, R).transpose(
            *range(nd), nd + 2, nd + 1, nd).reshape(*lead, K)
    return x.reshape(*lead, G, R).swapaxes(-1, -2).reshape(*lead, K)
