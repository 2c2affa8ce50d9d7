"""Vectorized numpy dequantizers for the ggml block-quant wire formats.

These are the *reference* decoders of this framework: the Pallas kernels and
the load-time weight relayout are validated against them, and they are
validated against the bit layouts in
/root/reference/ggml/src/ggml-common.h:167-418 with semantics per
/root/reference/ggml/src/ggml-quants.c (dequantize_row_*).

All functions take a flat uint8 buffer holding whole blocks and the element
count, and return float32.
"""

from __future__ import annotations

import numpy as np

from ..gguf.constants import GGML_TYPE_TRAITS, QK_K, GGMLType

# IQ4 non-linear codebook (ggml-common.h kvalues_iq4nl) — wire-format constant.
KVALUES_IQ4NL = np.array(
    [-127, -104, -83, -65, -49, -35, -22, -10, 1, 13, 25, 38, 53, 69, 89, 113],
    dtype=np.float32,
)


def _blocks(data: np.ndarray, n: int, t: GGMLType) -> np.ndarray:
    tt = GGML_TYPE_TRAITS[t]
    if n % tt.block_size:
        raise ValueError(f"{t.name}: {n} not a multiple of block size {tt.block_size}")
    nb = n // tt.block_size
    data = np.asarray(data, dtype=np.uint8).reshape(-1)
    if data.size < nb * tt.type_size:
        raise ValueError(f"{t.name}: buffer too small ({data.size} < {nb * tt.type_size})")
    return data[: nb * tt.type_size].reshape(nb, tt.type_size)


def _f16(b: np.ndarray) -> np.ndarray:
    """View pairs of bytes as little-endian float16 → float32."""
    return b.copy().view("<f2").astype(np.float32)


def dequant_f32(data, n):
    return np.asarray(data, np.uint8)[: 4 * n].copy().view("<f4").astype(np.float32)


def dequant_f16(data, n):
    return np.asarray(data, np.uint8)[: 2 * n].copy().view("<f2").astype(np.float32)


def dequant_bf16(data, n):
    u = np.asarray(data, np.uint8)[: 2 * n].copy().view("<u2").astype(np.uint32) << 16
    return u.view(np.float32)


def dequant_f64(data, n):
    return np.asarray(data, np.uint8)[: 8 * n].copy().view("<f8").astype(np.float32)


def _dequant_int(dtype):
    def f(data, n):
        it = np.dtype(dtype)
        return np.asarray(data, np.uint8)[: it.itemsize * n].copy().view(it).astype(np.float32)

    return f


def _split_nibbles(qs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return qs & 0x0F, qs >> 4


def dequant_q4_0(data, n):
    b = _blocks(data, n, GGMLType.Q4_0)
    d = _f16(b[:, 0:2])  # [nb, 1]
    lo, hi = _split_nibbles(b[:, 2:18])
    q = np.concatenate([lo, hi], axis=1).astype(np.int8) - 8
    return (q * d).reshape(-1)


def dequant_q4_1(data, n):
    b = _blocks(data, n, GGMLType.Q4_1)
    d = _f16(b[:, 0:2])
    m = _f16(b[:, 2:4])
    lo, hi = _split_nibbles(b[:, 4:20])
    q = np.concatenate([lo, hi], axis=1).astype(np.float32)
    return (q * d + m).reshape(-1)


def _q5_high_bits(qh_bytes: np.ndarray) -> np.ndarray:
    """[nb,4] LE bytes -> [nb,32] the 5th bit per element (0/1)."""
    qh = qh_bytes.copy().view("<u4").reshape(-1, 1).astype(np.uint32)
    shifts = np.arange(32, dtype=np.uint32)
    return ((qh >> shifts) & 1).astype(np.uint8)


def dequant_q5_0(data, n):
    b = _blocks(data, n, GGMLType.Q5_0)
    d = _f16(b[:, 0:2])
    hb = _q5_high_bits(b[:, 2:6])
    lo, hi = _split_nibbles(b[:, 6:22])
    q = np.concatenate([lo, hi], axis=1).astype(np.int16) | (hb.astype(np.int16) << 4)
    return ((q - 16) * d).reshape(-1)


def dequant_q5_1(data, n):
    b = _blocks(data, n, GGMLType.Q5_1)
    d = _f16(b[:, 0:2])
    m = _f16(b[:, 2:4])
    hb = _q5_high_bits(b[:, 4:8])
    lo, hi = _split_nibbles(b[:, 8:24])
    q = (np.concatenate([lo, hi], axis=1).astype(np.int16) | (hb.astype(np.int16) << 4)).astype(
        np.float32
    )
    return (q * d + m).reshape(-1)


def dequant_q8_0(data, n):
    b = _blocks(data, n, GGMLType.Q8_0)
    d = _f16(b[:, 0:2])
    q = b[:, 2:34].copy().view(np.int8).astype(np.float32)
    return (q * d).reshape(-1)


def dequant_q8_K(data, n):
    b = _blocks(data, n, GGMLType.Q8_K)
    d = b[:, 0:4].copy().view("<f4")
    q = b[:, 4 : 4 + QK_K].copy().view(np.int8).astype(np.float32)
    return (q * d).reshape(-1)


def _unpack_2bit_qk(qs: np.ndarray) -> np.ndarray:
    """[nb, 64] packed 2-bit -> [nb, 256] in ggml element order.

    Element e: chunk=e//128, shift=(e%128)//32, byte=chunk*32 + e%32.
    """
    nb = qs.shape[0]
    out = np.empty((nb, 256), dtype=np.uint8)
    for chunk in range(2):
        cb = qs[:, chunk * 32 : chunk * 32 + 32]
        for shift in range(4):
            out[:, chunk * 128 + shift * 32 : chunk * 128 + (shift + 1) * 32] = (
                cb >> (2 * shift)
            ) & 3
    return out


def dequant_q2_K(data, n):
    b = _blocks(data, n, GGMLType.Q2_K)
    scales = b[:, 0:16]  # [nb,16] 4-bit scale | 4-bit min per 16-elem group
    q = _unpack_2bit_qk(b[:, 16:80]).astype(np.float32)  # [nb,256]
    d = _f16(b[:, 80:82])
    dmin = _f16(b[:, 82:84])
    sc = (scales & 0xF).astype(np.float32)  # [nb,16]
    mn = (scales >> 4).astype(np.float32)
    dl = (d * sc).repeat(16, axis=1)  # group g covers elements 16g..16g+15
    ml = (dmin * mn).repeat(16, axis=1)
    return (dl * q - ml).reshape(-1)


def _q3_scales(raw: np.ndarray) -> np.ndarray:
    """[nb,12] packed 6-bit scales -> [nb,16] int8 in 0..63 (reference aux unpack)."""
    a = raw.copy().view("<u4")  # [nb,3]
    a0, a1, tmp = a[:, 0], a[:, 1], a[:, 2]
    kmask1 = np.uint32(0x03030303)
    kmask2 = np.uint32(0x0F0F0F0F)
    out = np.empty((raw.shape[0], 4), dtype=np.uint32)
    out[:, 0] = (a0 & kmask2) | (((tmp >> np.uint32(0)) & kmask1) << np.uint32(4))
    out[:, 1] = (a1 & kmask2) | (((tmp >> np.uint32(2)) & kmask1) << np.uint32(4))
    out[:, 2] = ((a0 >> np.uint32(4)) & kmask2) | (((tmp >> np.uint32(4)) & kmask1) << np.uint32(4))
    out[:, 3] = ((a1 >> np.uint32(4)) & kmask2) | (((tmp >> np.uint32(6)) & kmask1) << np.uint32(4))
    return out.view(np.int8).reshape(raw.shape[0], 16)


def dequant_q3_K(data, n):
    b = _blocks(data, n, GGMLType.Q3_K)
    hmask = b[:, 0:32]
    q = _unpack_2bit_qk(b[:, 32:96]).astype(np.int8)  # [nb,256] in 0..3
    scales = _q3_scales(b[:, 96:108]).astype(np.float32) - 32.0  # [nb,16]
    d = _f16(b[:, 108:110])
    # high bit: element e uses bit (e//32) of hmask[e%32]
    e = np.arange(256)
    hbit = (hmask[:, e % 32] >> (e // 32)[None, :]) & 1  # [nb,256]
    qv = q.astype(np.float32) - np.where(hbit, 0.0, 4.0)
    dl = (d * scales).repeat(16, axis=1)
    return (dl * qv).reshape(-1)


def _k4_scale_min(scales: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[nb,12] packed 6-bit (scale,min) pairs -> two [nb,8] uint8 arrays."""
    sc = np.empty((scales.shape[0], 8), dtype=np.uint8)
    mn = np.empty_like(sc)
    j = np.arange(4)
    sc[:, :4] = scales[:, :4] & 63
    mn[:, :4] = scales[:, 4:8] & 63
    sc[:, 4:] = (scales[:, 8:12] & 0xF) | ((scales[:, j] >> 6) << 4)
    mn[:, 4:] = (scales[:, 8:12] >> 4) | ((scales[:, j + 4] >> 6) << 4)
    return sc, mn


def _unpack_k4_nibbles(qs: np.ndarray) -> np.ndarray:
    """[nb,128] nibble-packed -> [nb,256]: per 64-group, 32 low then 32 high."""
    nb = qs.shape[0]
    g = qs.reshape(nb, 4, 32)
    out = np.empty((nb, 4, 2, 32), dtype=np.uint8)
    out[:, :, 0, :] = g & 0xF
    out[:, :, 1, :] = g >> 4
    return out.reshape(nb, 256)


def dequant_q4_K(data, n):
    b = _blocks(data, n, GGMLType.Q4_K)
    d = _f16(b[:, 0:2])
    dmin = _f16(b[:, 2:4])
    sc, mn = _k4_scale_min(b[:, 4:16])
    q = _unpack_k4_nibbles(b[:, 16:144]).astype(np.float32)
    dl = (d * sc.astype(np.float32)).repeat(32, axis=1)
    ml = (dmin * mn.astype(np.float32)).repeat(32, axis=1)
    return (dl * q - ml).reshape(-1)


def dequant_q5_K(data, n):
    b = _blocks(data, n, GGMLType.Q5_K)
    d = _f16(b[:, 0:2])
    dmin = _f16(b[:, 2:4])
    sc, mn = _k4_scale_min(b[:, 4:16])
    qh = b[:, 16:48]  # [nb,32]; element e uses bit (e//32) of qh[e%32]
    ql = _unpack_k4_nibbles(b[:, 48:176]).astype(np.int16)
    e = np.arange(256)
    hbit = ((qh[:, e % 32] >> (e // 32)[None, :]) & 1).astype(np.int16)
    q = (ql + (hbit << 4)).astype(np.float32)
    dl = (d * sc.astype(np.float32)).repeat(32, axis=1)
    ml = (dmin * mn.astype(np.float32)).repeat(32, axis=1)
    return (dl * q - ml).reshape(-1)


def dequant_q6_K(data, n):
    b = _blocks(data, n, GGMLType.Q6_K)
    ql = b[:, 0:128]
    qh = b[:, 128:192]
    scales = b[:, 192:208].copy().view(np.int8).astype(np.float32)  # [nb,16]
    d = _f16(b[:, 208:210])
    nb = b.shape[0]
    # element e: chunk=e//128, quarter=(e%128)//32, l=e%32
    # ql byte = chunk*64 + (quarter%2)*32 + l ; nibble = low if quarter<2 else high
    # qh byte = chunk*32 + l ; bits (2*quarter, 2*quarter+1)
    out = np.empty((nb, 256), dtype=np.float32)
    for chunk in range(2):
        lo = ql[:, chunk * 64 : chunk * 64 + 64]
        hh = qh[:, chunk * 32 : chunk * 32 + 32]
        for quarter in range(4):
            nib = lo[:, (quarter % 2) * 32 : (quarter % 2) * 32 + 32]
            nib = (nib & 0xF) if quarter < 2 else (nib >> 4)
            hb = (hh >> (2 * quarter)) & 3
            q = (nib.astype(np.int16) | (hb.astype(np.int16) << 4)) - 32
            out[:, chunk * 128 + quarter * 32 : chunk * 128 + (quarter + 1) * 32] = q
    dl = (d * scales).repeat(16, axis=1)  # scale per 16 elements, in element order
    return (dl * out).reshape(-1)


# ---------------------------------------------------------------------------
# i-quants (codebook formats). The codebook grids are wire-format data tables
# extracted from ggml-common.h into iq_grids.npz (see scripts/gen_iq_grids.py).
# Decode semantics per ggml-quants.c dequantize_row_iq* (:2191-2440).
# ---------------------------------------------------------------------------

_IQ_GRIDS: dict | None = None


def _grids() -> dict:
    global _IQ_GRIDS
    if _IQ_GRIDS is None:
        import pathlib

        z = np.load(pathlib.Path(__file__).parent / "iq_grids.npz")
        ksigns = z["ksigns"]  # [128] sign bytes
        # sign factor tables: ±1 per (sign byte, element j) — kmask[j] == 1<<j
        bits = np.arange(8)
        sign128 = np.where((ksigns[:, None] >> bits) & 1, -1.0, 1.0).astype(np.float32)
        sign256 = np.where(
            (np.arange(256, dtype=np.uint16)[:, None] >> bits) & 1, -1.0, 1.0
        ).astype(np.float32)
        _IQ_GRIDS = {
            "iq2xxs": z["iq2xxs"].copy().view(np.uint8).reshape(256, 8).astype(np.float32),
            "iq2xs": z["iq2xs"].copy().view(np.uint8).reshape(512, 8).astype(np.float32),
            "iq2s": z["iq2s"].copy().view(np.uint8).reshape(1024, 8).astype(np.float32),
            "iq3xxs": z["iq3xxs"].copy().view(np.uint8).reshape(256, 4).astype(np.float32),
            "iq3s": z["iq3s"].copy().view(np.uint8).reshape(512, 4).astype(np.float32),
            "iq1s": z["iq1s"].copy().view(np.int8).reshape(2048, 8).astype(np.float32),
            "sign128": sign128,  # ksigns_iq2xs-indexed ±1 factors
            "sign256": sign256,  # raw-sign-byte ±1 factors
        }
    return _IQ_GRIDS


IQ1_DELTA = 0.125  # IQ1S_DELTA / IQ1M_DELTA (ggml-common.h:1082-1083)


def dequant_iq2_xxs(data, n):
    g = _grids()
    b = _blocks(data, n, GGMLType.IQ2_XXS)
    nb = b.shape[0]
    d = _f16(b[:, 0:2])  # [nb,1]
    u32 = b[:, 2:66].copy().view("<u4").reshape(nb, 8, 2).astype(np.uint32)
    a0, a1 = u32[..., 0], u32[..., 1]  # [nb,8]
    idx = (a0[..., None] >> (8 * np.arange(4))[None, None, :]) & 0xFF  # [nb,8,4]
    s7 = (a1[..., None] >> (7 * np.arange(4))[None, None, :]) & 127
    db = d * (0.5 + (a1 >> 28).astype(np.float32)) * 0.25  # [nb,8]
    out = db[..., None, None] * g["iq2xxs"][idx] * g["sign128"][s7]
    return out.reshape(-1).astype(np.float32)


def _iq2_scales(d: np.ndarray, sc: np.ndarray) -> np.ndarray:
    """db per (block, ib32, l): nibble scales, low nibble for l<2."""
    db = np.stack(
        [
            d * (0.5 + (sc & 0xF).astype(np.float32)) * 0.25,
            d * (0.5 + (sc >> 4).astype(np.float32)) * 0.25,
        ],
        axis=-1,
    )  # [nb,8,2]
    return db[:, :, [0, 0, 1, 1]]  # [nb,8,4]


def dequant_iq2_xs(data, n):
    g = _grids()
    b = _blocks(data, n, GGMLType.IQ2_XS)
    nb = b.shape[0]
    d = _f16(b[:, 0:2])
    qs = b[:, 2:66].copy().view("<u2").reshape(nb, 8, 4).astype(np.uint16)
    dl = _iq2_scales(d, b[:, 66:74])  # [nb,8,4]
    out = dl[..., None] * g["iq2xs"][qs & 511] * g["sign128"][qs >> 9]
    return out.reshape(-1).astype(np.float32)


def dequant_iq2_s(data, n):
    g = _grids()
    b = _blocks(data, n, GGMLType.IQ2_S)
    nb = b.shape[0]
    d = _f16(b[:, 0:2])
    qs = b[:, 2:34].reshape(nb, 8, 4).astype(np.uint16)
    signs = b[:, 34:66].reshape(nb, 8, 4)
    qh = b[:, 66:74].astype(np.uint16)  # [nb,8]
    dl = _iq2_scales(d, b[:, 74:82])
    shifts = (8 - 2 * np.arange(4))[None, None, :]
    idx = qs | ((qh[..., None] << shifts) & 0x300)
    out = dl[..., None] * g["iq2s"][idx] * g["sign256"][signs]
    return out.reshape(-1).astype(np.float32)


def dequant_iq3_xxs(data, n):
    g = _grids()
    b = _blocks(data, n, GGMLType.IQ3_XXS)
    nb = b.shape[0]
    d = _f16(b[:, 0:2])
    qs = b[:, 2:66].reshape(nb, 8, 4, 2)  # two 4-value grid entries per l
    sas = b[:, 66:98].copy().view("<u4").astype(np.uint32)  # [nb,8]
    db = d * (0.5 + (sas >> 28).astype(np.float32)) * 0.5  # [nb,8]
    s7 = (sas[..., None] >> (7 * np.arange(4))[None, None, :]) & 127
    vals = g["iq3xxs"][qs].reshape(nb, 8, 4, 8)
    out = db[..., None, None] * vals * g["sign128"][s7]
    return out.reshape(-1).astype(np.float32)


def dequant_iq3_s(data, n):
    g = _grids()
    b = _blocks(data, n, GGMLType.IQ3_S)
    nb = b.shape[0]
    d = _f16(b[:, 0:2])
    qs = b[:, 2:66].reshape(nb, 8, 8).astype(np.uint16)  # 8 grid bytes per ib32
    qh = b[:, 66:74].astype(np.uint16)  # [nb,8]
    signs = b[:, 74:106].reshape(nb, 8, 4)
    sc = b[:, 106:110]  # [nb,4] one nibble pair per 2 ib32
    ib = np.arange(8)
    nib = (sc[:, ib // 2] >> (4 * (ib % 2))[None, :]) & 0xF
    dl = d * (1 + 2 * nib.astype(np.float32))  # [nb,8]
    # grid index bit 8 for byte m is bit m of qh (dequantize_row_iq3_s:2335-2345)
    hi = (qh[..., None] >> ib[None, None, :]) & 1
    idx = qs | (hi << 8)
    vals = g["iq3s"][idx]  # [nb,8,8,4]
    # sign byte for element (m, j) is signs[m//2] with mask bit 4*(m%2)+j
    sgn = g["sign256"][signs].reshape(nb, 8, 4, 2, 4).reshape(nb, 8, 8, 4)
    out = dl[..., None, None] * vals * sgn
    return out.reshape(-1).astype(np.float32)


def dequant_iq1_s(data, n):
    g = _grids()
    b = _blocks(data, n, GGMLType.IQ1_S)
    nb = b.shape[0]
    d = _f16(b[:, 0:2])
    qs = b[:, 2:34].reshape(nb, 8, 4).astype(np.uint16)
    qh = b[:, 34:50].copy().view("<u2").astype(np.uint16)  # [nb,8]
    dl = d * (2 * ((qh >> 12) & 7).astype(np.float32) + 1)  # [nb,8]
    delta = np.where(qh & 0x8000, -IQ1_DELTA, IQ1_DELTA).astype(np.float32)
    idx = qs | (((qh[..., None] >> (3 * np.arange(4))[None, None, :]) & 7) << 8)
    vals = g["iq1s"][idx]  # [nb,8,4,8]
    out = dl[..., None, None] * (vals + delta[..., None, None])
    return out.reshape(-1).astype(np.float32)


def dequant_iq1_m(data, n):
    g = _grids()
    b = _blocks(data, n, GGMLType.IQ1_M)
    nb = b.shape[0]
    qs = b[:, 0:32].reshape(nb, 8, 4).astype(np.uint16)
    qh = b[:, 32:48].reshape(nb, 8, 2).astype(np.uint16)
    scb = b[:, 48:56].copy().view("<u2").astype(np.uint16)  # [nb,4]
    # the f16 super-scale hides in the top nibbles (dequantize_row_iq1_m:2397)
    d16 = (
        (scb[:, 0] >> 12)
        | ((scb[:, 1] >> 8) & 0x00F0)
        | ((scb[:, 2] >> 4) & 0x0F00)
        | (scb[:, 3] & 0xF000)
    ).astype(np.uint16)
    d = d16.view(np.float16).astype(np.float32)  # [nb]
    ib = np.arange(8)
    dl1 = 2 * ((scb[:, ib // 2] >> (6 * (ib % 2))[None, :]) & 7).astype(np.float32) + 1
    dl2 = 2 * ((scb[:, ib // 2] >> (6 * (ib % 2) + 3)[None, :]) & 7).astype(np.float32) + 1
    dl = np.stack([dl1, dl1, dl2, dl2], axis=-1)  # [nb,8,4]
    qhl = qh[:, :, [0, 0, 1, 1]]
    idx = qs | ((qhl << np.array([8, 4, 8, 4])[None, None, :]) & 0x700)
    dbit = np.array([0x08, 0x80, 0x08, 0x80])[None, None, :]
    delta = np.where(qhl & dbit, -IQ1_DELTA, IQ1_DELTA).astype(np.float32)
    vals = g["iq1s"][idx]  # [nb,8,4,8]
    out = d[:, None, None, None] * dl[..., None] * (vals + delta[..., None])
    return out.reshape(-1).astype(np.float32)


def dequant_iq4_nl(data, n):
    b = _blocks(data, n, GGMLType.IQ4_NL)
    d = _f16(b[:, 0:2])
    lo, hi = _split_nibbles(b[:, 2:18])
    q = KVALUES_IQ4NL[np.concatenate([lo, hi], axis=1)]
    return (q * d).reshape(-1)


def dequant_iq4_xs(data, n):
    b = _blocks(data, n, GGMLType.IQ4_XS)
    d = _f16(b[:, 0:2])
    scales_h = b[:, 2:4].copy().view("<u2").astype(np.uint16)  # [nb,1]
    scales_l = b[:, 4:8]  # [nb,4]
    qs = b[:, 8:136]
    ib = np.arange(8)
    ls_l = (scales_l[:, ib // 2] >> (4 * (ib % 2))[None, :]) & 0xF
    ls_h = (scales_h >> (2 * ib)[None, :]) & 3
    ls = (ls_l | (ls_h << 4)).astype(np.float32) - 32.0  # [nb,8]
    # per 32-group: 16 bytes; j<16 low nibble, j+16 high nibble
    g = qs.reshape(-1, 8, 16)
    q = np.empty((b.shape[0], 8, 32), dtype=np.uint8)
    q[:, :, :16] = g & 0xF
    q[:, :, 16:] = g >> 4
    vals = KVALUES_IQ4NL[q]
    dl = (d[:, None] * ls[..., None])  # [nb,8,1]
    return (dl * vals).reshape(-1)


def dequant_tq1_0(data, n):
    b = _blocks(data, n, GGMLType.TQ1_0)
    # layout: qs[(256-16)/5=48] base-3 packed x5, qh[4] x4, d  (ggml-common.h block_tq1_0)
    qs = b[:, 0:48]
    qh = b[:, 48:52]
    d = _f16(b[:, 52:54])
    pow3 = np.array([1, 3, 9, 27, 81], dtype=np.uint16)
    out = np.empty((b.shape[0], 256), dtype=np.float32)
    # elements 0..239 from qs: element e -> byte index: interleaved in groups of 32
    # reference dequantize_row_tq1_0: for each group of 32 bytes, 5 passes
    qs16 = qs.astype(np.uint16)
    for grp in range(2):  # bytes 0..31 -> elems 0..159 ; only first grp has 32 bytes
        nbytes = 32 if grp == 0 else 16
        base = grp * 160
        byts = qs16[:, grp * 32 : grp * 32 + nbytes]
        for j in range(5):
            q = ((byts * pow3[j]) & 0xFF) * 3 // 256
            out[:, base + j * nbytes : base + (j + 1) * nbytes] = q.astype(np.float32) - 1
    qh16 = qh.astype(np.uint16)
    for j in range(4):
        q = ((qh16 * pow3[j]) & 0xFF) * 3 // 256
        out[:, 240 + j * 4 : 240 + (j + 1) * 4] = q.astype(np.float32) - 1
    return (out * d).reshape(-1)


def dequant_tq2_0(data, n):
    b = _blocks(data, n, GGMLType.TQ2_0)
    qs = b[:, 0:64]
    d = _f16(b[:, 64:66])
    out = np.empty((b.shape[0], 256), dtype=np.float32)
    # reference: for each 32-byte half, 4 shift passes of 32 elements
    for half in range(2):
        byts = qs[:, half * 32 : half * 32 + 32]
        for j in range(4):
            q = (byts >> (2 * j)) & 3
            out[:, half * 128 + j * 32 : half * 128 + (j + 1) * 32] = q.astype(np.float32) - 1
    return (out * d).reshape(-1)


DEQUANT_FNS = {
    GGMLType.F32: dequant_f32,
    GGMLType.F16: dequant_f16,
    GGMLType.BF16: dequant_bf16,
    GGMLType.F64: dequant_f64,
    GGMLType.I8: _dequant_int(np.int8),
    GGMLType.I16: _dequant_int("<i2"),
    GGMLType.I32: _dequant_int("<i4"),
    GGMLType.I64: _dequant_int("<i8"),
    GGMLType.Q4_0: dequant_q4_0,
    GGMLType.Q4_1: dequant_q4_1,
    GGMLType.Q5_0: dequant_q5_0,
    GGMLType.Q5_1: dequant_q5_1,
    GGMLType.Q8_0: dequant_q8_0,
    GGMLType.Q8_K: dequant_q8_K,
    GGMLType.Q2_K: dequant_q2_K,
    GGMLType.Q3_K: dequant_q3_K,
    GGMLType.Q4_K: dequant_q4_K,
    GGMLType.Q5_K: dequant_q5_K,
    GGMLType.Q6_K: dequant_q6_K,
    GGMLType.IQ2_XXS: dequant_iq2_xxs,
    GGMLType.IQ2_XS: dequant_iq2_xs,
    GGMLType.IQ2_S: dequant_iq2_s,
    GGMLType.IQ3_XXS: dequant_iq3_xxs,
    GGMLType.IQ3_S: dequant_iq3_s,
    GGMLType.IQ1_S: dequant_iq1_s,
    GGMLType.IQ1_M: dequant_iq1_m,
    GGMLType.IQ4_NL: dequant_iq4_nl,
    GGMLType.IQ4_XS: dequant_iq4_xs,
    GGMLType.TQ1_0: dequant_tq1_0,
    GGMLType.TQ2_0: dequant_tq2_0,
}


# tensors at least this large go through the threaded C++ decoder when built
_NATIVE_MIN_ELEMS = 1 << 16


def dequantize(data: np.ndarray, ggml_type: GGMLType, n_elements: int) -> np.ndarray:
    """Dequantize a flat buffer of `n_elements` to float32.

    Large tensors route through the native threaded decoder
    (csrc/lcg_codecs.cpp, bit-exact per tests/test_native.py); everything
    else uses the vectorized numpy reference path."""
    if n_elements >= _NATIVE_MIN_ELEMS:
        from .. import native

        out = native.dequantize(data, ggml_type, n_elements)
        if out is not None:
            return out
    fn = DEQUANT_FNS.get(ggml_type)
    if fn is None:
        raise NotImplementedError(f"dequantize not implemented for {ggml_type.name}")
    return fn(data, n_elements)


def dequantize_tensor(data: np.ndarray, ggml_type: GGMLType, shape: tuple[int, ...]) -> np.ndarray:
    """Dequantize a tensor (rows contiguous along the last axis)."""
    n = 1
    for s in shape:
        n *= s
    return dequantize(data, ggml_type, n).reshape(shape)
