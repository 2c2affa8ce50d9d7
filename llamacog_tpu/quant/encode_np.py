"""Vectorized numpy quantizers (encoders) for the ggml block formats.

Implements the reference encoding heuristics (llama.cpp
ggml/src/ggml-quants.c: quantize_row_*_ref, make_qx_quants,
make_qkx2_quants, make_q3_quants) so that models quantized by this framework
match the reference's published quality deltas. Rounding uses
round-half-to-even (numpy rint), matching the reference's float-add trick
(`nearest_int`, ggml-quants.c:363-368).
"""

from __future__ import annotations

import numpy as np

from ..gguf.constants import GGML_TYPE_TRAITS, GGMLType

GROUP_MAX_EPS = 1e-15


def _f16_bytes(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.astype("<f2")).view(np.uint8).reshape(x.shape[0], -1)


def _rint(x):
    return np.rint(x)


def _group(x: np.ndarray, t: GGMLType) -> np.ndarray:
    bs = GGML_TYPE_TRAITS[t].block_size
    x = np.asarray(x, dtype=np.float32).reshape(-1)
    if x.size % bs:
        raise ValueError(f"{t.name}: {x.size} not a multiple of {bs}")
    return x.reshape(-1, bs)


# ---------------------------------------------------------------------------
# simple 32-element block formats
# ---------------------------------------------------------------------------

def _signed_max(x: np.ndarray) -> np.ndarray:
    """Value with max |x| per row (keeping sign)."""
    idx = np.argmax(np.abs(x), axis=1)
    return x[np.arange(x.shape[0]), idx]


def quant_q8_0(x) -> np.ndarray:
    x = _group(x, GGMLType.Q8_0)
    amax = np.abs(x).max(axis=1)
    d = (amax / 127.0).astype(np.float32)
    id_ = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0).astype(np.float32)
    d16 = d.astype(np.float16)
    q = np.clip(_rint(x * id_[:, None]), -128, 127).astype(np.int8)
    out = np.empty((x.shape[0], 34), dtype=np.uint8)
    out[:, 0:2] = d16[:, None].view(np.uint8).reshape(-1, 2)
    out[:, 2:] = q.view(np.uint8)
    return out.reshape(-1)


def quant_q4_0(x) -> np.ndarray:
    x = _group(x, GGMLType.Q4_0)
    mx = _signed_max(x)
    d = (mx / -8.0).astype(np.float32)
    id_ = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0).astype(np.float32)
    # C: MIN(15, (int8)(v + 8.5)); v+8.5 >= 0 so the cast truncates (floor)
    q = np.minimum(15, np.floor(x * id_[:, None] + 8.5).astype(np.int32)).astype(np.uint8)
    q = np.maximum(q, 0)
    out = np.empty((x.shape[0], 18), dtype=np.uint8)
    out[:, 0:2] = d.astype("<f2")[:, None].view(np.uint8).reshape(-1, 2)
    out[:, 2:] = q[:, :16] | (q[:, 16:] << 4)
    return out.reshape(-1)


def quant_q4_1(x) -> np.ndarray:
    x = _group(x, GGMLType.Q4_1)
    mn = x.min(axis=1)
    mx = x.max(axis=1)
    d = ((mx - mn) / 15.0).astype(np.float32)
    id_ = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0).astype(np.float32)
    q = np.minimum(15, np.floor((x - mn[:, None]) * id_[:, None] + 0.5).astype(np.int32))
    q = np.maximum(q, 0).astype(np.uint8)
    out = np.empty((x.shape[0], 20), dtype=np.uint8)
    out[:, 0:2] = d.astype("<f2")[:, None].view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = mn.astype("<f2")[:, None].view(np.uint8).reshape(-1, 2)
    out[:, 4:] = q[:, :16] | (q[:, 16:] << 4)
    return out.reshape(-1)


def _pack_qh(q: np.ndarray) -> np.ndarray:
    """5-bit quants [nb,32] -> [nb,4] little-endian high-bit mask bytes."""
    bits = ((q >> 4) & 1).astype(np.uint32)
    shifts = np.arange(32, dtype=np.uint32)
    qh = (bits << shifts).sum(axis=1, dtype=np.uint64).astype(np.uint32)
    return qh[:, None].view(np.uint8).reshape(-1, 4)


def quant_q5_0(x) -> np.ndarray:
    x = _group(x, GGMLType.Q5_0)
    mx = _signed_max(x)
    d = (mx / -16.0).astype(np.float32)
    id_ = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0).astype(np.float32)
    q = np.minimum(31, np.floor(x * id_[:, None] + 16.5).astype(np.int32))
    q = np.maximum(q, 0).astype(np.uint8)
    out = np.empty((x.shape[0], 22), dtype=np.uint8)
    out[:, 0:2] = d.astype("<f2")[:, None].view(np.uint8).reshape(-1, 2)
    out[:, 2:6] = _pack_qh(q)
    out[:, 6:] = (q[:, :16] & 0xF) | ((q[:, 16:] & 0xF) << 4)
    return out.reshape(-1)


def quant_q5_1(x) -> np.ndarray:
    x = _group(x, GGMLType.Q5_1)
    mn = x.min(axis=1)
    mx = x.max(axis=1)
    d = ((mx - mn) / 31.0).astype(np.float32)
    id_ = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0).astype(np.float32)
    q = np.floor((x - mn[:, None]) * id_[:, None] + 0.5).astype(np.int32)
    q = np.clip(q, 0, 31).astype(np.uint8)
    out = np.empty((x.shape[0], 24), dtype=np.uint8)
    out[:, 0:2] = d.astype("<f2")[:, None].view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = mn.astype("<f2")[:, None].view(np.uint8).reshape(-1, 2)
    out[:, 4:8] = _pack_qh(q)
    out[:, 8:] = (q[:, :16] & 0xF) | ((q[:, 16:] & 0xF) << 4)
    return out.reshape(-1)


def quant_q8_K(x) -> np.ndarray:
    x = _group(x, GGMLType.Q8_K)
    idx = np.argmax(np.abs(x), axis=1)
    mx = x[np.arange(x.shape[0]), idx]
    nonzero = np.abs(mx) > 0
    iscale = np.where(nonzero, -127.0 / np.where(mx != 0, mx, 1), 0.0).astype(np.float32)
    q = np.minimum(127, _rint(iscale[:, None] * x)).astype(np.int8)
    q = np.where(nonzero[:, None], q, 0)
    d = np.where(nonzero, 1.0 / np.where(iscale != 0, iscale, 1), 0.0).astype(np.float32)
    bsums = q.reshape(-1, 16, 16).sum(axis=2).astype("<i2")
    out = np.empty((x.shape[0], 292), dtype=np.uint8)
    out[:, 0:4] = d.astype("<f4")[:, None].view(np.uint8).reshape(-1, 4)
    out[:, 4:260] = q.view(np.uint8)
    out[:, 260:] = bsums.view(np.uint8).reshape(-1, 32)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# K-quant search helpers (vectorized across groups)
# ---------------------------------------------------------------------------

def make_qkx2_quants(
    x: np.ndarray,
    weights: np.ndarray,
    nmax: int,
    rmin: float,
    rdelta: float,
    nstep: int,
    use_mad: bool,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Scale/min search (ggml-quants.c:545-625). x,[G,n] -> (scale[G], the_min[G], L[G,n])."""
    x = x.astype(np.float32)
    w = weights.astype(np.float32)
    mn = np.minimum(x.min(axis=1), 0.0)
    mx = x.max(axis=1)
    sum_w = w.sum(axis=1)
    sum_x = (w * x).sum(axis=1)
    degenerate = mx == mn
    rng = np.where(degenerate, 1.0, mx - mn)
    iscale = nmax / rng
    scale = 1.0 / iscale
    L = np.clip(_rint(iscale[:, None] * (x - mn[:, None])), 0, nmax)
    diff = scale[:, None] * L + mn[:, None] - x
    diff = np.abs(diff) if use_mad else diff * diff
    best_mad = (w * diff).sum(axis=1)
    # NB: the reference updates `min` on every accepted candidate and later
    # candidate steps use the updated min (sequential dependency).
    cur_min = mn.copy()
    for step in range(nstep + 1):
        rng_c = np.where(degenerate | (mx == cur_min), 1.0, mx - cur_min)
        isc = (rmin + rdelta * step + nmax) / rng_c
        Laux = np.clip(_rint(isc[:, None] * (x - cur_min[:, None])), 0, nmax)
        sum_l = (w * Laux).sum(axis=1)
        sum_l2 = (w * Laux * Laux).sum(axis=1)
        sum_xl = (w * Laux * x).sum(axis=1)
        D = sum_w * sum_l2 - sum_l * sum_l
        ok = D > 0
        Dsafe = np.where(ok, D, 1.0)
        this_scale = (sum_w * sum_xl - sum_x * sum_l) / Dsafe
        this_min = (sum_l2 * sum_x - sum_l * sum_xl) / Dsafe
        pos = this_min > 0
        this_min = np.where(pos, 0.0, this_min)
        this_scale = np.where(pos, sum_xl / np.where(sum_l2 != 0, sum_l2, 1.0), this_scale)
        diff = this_scale[:, None] * Laux + this_min[:, None] - x
        diff = np.abs(diff) if use_mad else diff * diff
        mad = (w * diff).sum(axis=1)
        upd = ok & (mad < best_mad)
        best_mad = np.where(upd, mad, best_mad)
        scale = np.where(upd, this_scale, scale)
        cur_min = np.where(upd, this_min, cur_min)
        L = np.where(upd[:, None], Laux, L)
    scale = np.where(degenerate, 0.0, scale)
    L = np.where(degenerate[:, None], 0, L).astype(np.uint8)
    the_min = -np.where(degenerate, mn, cur_min)
    return scale.astype(np.float32), the_min.astype(np.float32), L


def make_qx_quants(x: np.ndarray, nmax: int) -> tuple[np.ndarray, np.ndarray]:
    """Weighted-RMSE scale search, rmse_type=1 (ggml-quants.c:373-443).

    x: [G, n] -> (scale[G], L[G,n] in 0..2*nmax-1).
    """
    x = x.astype(np.float32)
    idx = np.argmax(np.abs(x), axis=1)
    mx = x[np.arange(x.shape[0]), idx]
    amax = np.abs(mx)
    dead = amax < GROUP_MAX_EPS
    mxs = np.where(dead, 1.0, mx)
    w = x * x  # rmse_type == 1

    def trial(iscale):
        l = np.clip(_rint(iscale[:, None] * x), -nmax, nmax - 1)
        sumlx = (w * x * l).sum(axis=1)
        suml2 = (w * l * l).sum(axis=1)
        return l, sumlx, suml2

    iscale0 = -nmax / mxs
    L, sumlx, suml2 = trial(iscale0)
    scale = np.where(suml2 != 0, sumlx / np.where(suml2 != 0, suml2, 1), 0.0)
    best = scale * sumlx
    for step in range(-9, 10):
        if step == 0:
            continue
        isc = -(nmax + 0.1 * step) / mxs
        l, slx, sl2 = trial(isc)
        upd = (sl2 > 0) & (slx * slx > best * sl2)
        scale = np.where(upd, slx / np.where(sl2 != 0, sl2, 1), scale)
        best = np.where(upd, scale * slx, best)
        L = np.where(upd[:, None], l, L)
    L = (L + nmax).astype(np.uint8)
    L = np.where(dead[:, None], 0, L)
    scale = np.where(dead, 0.0, scale)
    return scale.astype(np.float32), L


def make_q3_quants(x: np.ndarray, nmax: int) -> np.ndarray:
    """do_rmse=true variant with coordinate descent (ggml-quants.c:445-498).

    x: [G, n] -> scale[G] (the quants are recomputed by the caller from the
    packed 6-bit scales, so L is not returned).
    """
    x = x.astype(np.float32)
    n = x.shape[1]
    idx = np.argmax(np.abs(x), axis=1)
    mx = x[np.arange(x.shape[0]), idx]
    amax = np.abs(mx)
    dead = amax < GROUP_MAX_EPS
    mxs = np.where(dead, 1.0, mx)
    iscale = -nmax / mxs
    w = x * x
    L = np.clip(_rint(iscale[:, None] * x), -nmax, nmax - 1)
    sumlx = (w * x * L).sum(axis=1)
    suml2 = (w * L * L).sum(axis=1)
    for _ in range(5):
        changed = np.zeros(x.shape[0], dtype=bool)
        for i in range(n):
            wi = w[:, i]
            xi = x[:, i]
            slx = sumlx - wi * xi * L[:, i]
            sl2 = suml2 - wi * L[:, i] * L[:, i]
            can = slx > 0
            new_l = np.clip(
                _rint(xi * sl2 / np.where(slx != 0, slx, 1)), -nmax, nmax - 1
            )
            slx2 = slx + wi * xi * new_l
            sl22 = sl2 + wi * new_l * new_l
            upd = can & (new_l != L[:, i]) & (sl22 > 0) & (
                slx2 * slx2 * suml2 > sumlx * sumlx * sl22
            )
            L[:, i] = np.where(upd, new_l, L[:, i])
            sumlx = np.where(upd, slx2, sumlx)
            suml2 = np.where(upd, sl22, suml2)
            changed |= upd
        if not changed.any():
            break
    scale = np.where(suml2 != 0, sumlx / np.where(suml2 != 0, suml2, 1), 0.0)
    return np.where(dead, 0.0, scale).astype(np.float32)


# ---------------------------------------------------------------------------
# K-quant encoders
# ---------------------------------------------------------------------------

def _pack_2bit_qk(L: np.ndarray) -> np.ndarray:
    """[nb,256] 2-bit values -> [nb,64] packed (inverse of decode order)."""
    nb = L.shape[0]
    out = np.zeros((nb, 64), dtype=np.uint8)
    for chunk in range(2):
        for shift in range(4):
            seg = L[:, chunk * 128 + shift * 32 : chunk * 128 + (shift + 1) * 32]
            out[:, chunk * 32 : chunk * 32 + 32] |= (seg & 3).astype(np.uint8) << (2 * shift)
    return out


def quant_q2_K(x) -> np.ndarray:
    x = _group(x, GGMLType.Q2_K)
    nb = x.shape[0]
    xg = x.reshape(nb * 16, 16)
    weights = np.abs(xg)
    scales, mins, _ = make_qkx2_quants(xg, weights, 3, -0.5, 0.1, 15, True)
    scales = scales.reshape(nb, 16)
    mins = mins.reshape(nb, 16)
    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)
    d = np.where(max_scale > 0, max_scale / 15.0, 0.0).astype(np.float16).astype(np.float32)
    dmin = np.where(max_min > 0, max_min / 15.0, 0.0).astype(np.float16).astype(np.float32)
    ls = np.where(
        max_scale[:, None] > 0,
        _rint(scales * (15.0 / np.where(max_scale != 0, max_scale, 1))[:, None]),
        0,
    ).astype(np.uint8)
    lm = np.where(
        max_min[:, None] > 0,
        _rint(mins * (15.0 / np.where(max_min != 0, max_min, 1))[:, None]),
        0,
    ).astype(np.uint8)
    sc_bytes = (ls & 0xF) | (lm << 4)
    dl = d[:, None] * (sc_bytes & 0xF)  # [nb,16]
    ml = dmin[:, None] * (sc_bytes >> 4)
    dl_e = dl.repeat(16, axis=1)
    ml_e = ml.repeat(16, axis=1)
    L = np.where(
        dl_e != 0,
        np.clip(_rint((x + ml_e) / np.where(dl_e != 0, dl_e, 1)), 0, 3),
        0,
    ).astype(np.uint8)
    out = np.empty((nb, 84), dtype=np.uint8)
    out[:, 0:16] = sc_bytes
    out[:, 16:80] = _pack_2bit_qk(L)
    out[:, 80:82] = _f16_bytes(d)
    out[:, 82:84] = _f16_bytes(dmin)
    return out.reshape(-1)


def quant_q3_K(x) -> np.ndarray:
    x = _group(x, GGMLType.Q3_K)
    nb = x.shape[0]
    xg = x.reshape(nb * 16, 16)
    scales = make_q3_quants(xg, 4).reshape(nb, 16)
    aidx = np.argmax(np.abs(scales), axis=1)
    max_scale = scales[np.arange(nb), aidx]
    has = max_scale != 0
    iscale = np.where(has, -32.0 / np.where(max_scale != 0, max_scale, 1), 0.0)
    lvals = np.clip(_rint(iscale[:, None] * scales), -32, 31).astype(np.int32) + 32  # [nb,16]
    lvals = np.where(has[:, None], lvals, 32)  # so sc-32 = 0 when dead
    # pack 6-bit scales into 12 bytes (reference bit order, q3_K layout)
    sb = np.zeros((nb, 12), dtype=np.uint8)
    lo = (lvals & 0xF).astype(np.uint8)
    hi = (lvals >> 4).astype(np.uint8)
    for j in range(8):
        sb[:, j] |= lo[:, j]
    for j in range(8, 16):
        sb[:, j - 8] |= lo[:, j] << 4
    for j in range(16):
        sb[:, 8 + j % 4] |= hi[:, j] << (2 * (j // 4))
    d = np.where(has, 1.0 / np.where(iscale != 0, iscale, 1), 0.0).astype(np.float16).astype(
        np.float32
    )
    sc = lvals.astype(np.float32) - 32.0
    dl = (d[:, None] * sc).repeat(16, axis=1)
    L = np.where(
        dl != 0, np.clip(_rint(x / np.where(dl != 0, dl, 1)), -4, 3), 0
    ).astype(np.int32) + 4  # 0..7
    hbit = (L > 3).astype(np.uint8)  # [nb,256]
    Llow = np.where(L > 3, L - 4, L).astype(np.uint8)
    # hmask: element e -> bit (e//32) of byte (e%32)
    hmask = np.zeros((nb, 32), dtype=np.uint8)
    for g in range(8):
        hmask |= hbit[:, g * 32 : (g + 1) * 32] << g
    out = np.empty((nb, 110), dtype=np.uint8)
    out[:, 0:32] = hmask
    out[:, 32:96] = _pack_2bit_qk(Llow)
    out[:, 96:108] = sb
    out[:, 108:110] = _f16_bytes(d)
    return out.reshape(-1)


def _pack_k4_scales(ls: np.ndarray, lm: np.ndarray) -> np.ndarray:
    """Inverse of get_scale_min_k4: [nb,8] 6-bit scale/min -> [nb,12] bytes."""
    nb = ls.shape[0]
    sb = np.zeros((nb, 12), dtype=np.uint8)
    sb[:, 0:4] = ls[:, 0:4] & 63
    sb[:, 4:8] = lm[:, 0:4] & 63
    sb[:, 8:12] = (ls[:, 4:8] & 0xF) | ((lm[:, 4:8] & 0xF) << 4)
    sb[:, 0:4] |= (ls[:, 4:8] >> 4) << 6
    sb[:, 4:8] |= (lm[:, 4:8] >> 4) << 6
    return sb


def _unpack_k4_scales(sb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    sc = np.empty((sb.shape[0], 8), dtype=np.uint8)
    mn = np.empty_like(sc)
    sc[:, :4] = sb[:, :4] & 63
    mn[:, :4] = sb[:, 4:8] & 63
    sc[:, 4:] = (sb[:, 8:12] & 0xF) | ((sb[:, :4] >> 6) << 4)
    mn[:, 4:] = (sb[:, 8:12] >> 4) | ((sb[:, 4:8] >> 6) << 4)
    return sc, mn


def _quant_q45_K(x: np.ndarray, nmax: int, rmin: float, rdelta: float, nstep: int):
    """Shared q4_K / q5_K scale search. Returns (d, dmin, scale_bytes, L)."""
    nb = x.shape[0]
    xg = x.reshape(nb * 8, 32)
    av_x = np.sqrt((xg * xg).sum(axis=1) / 32.0)
    weights = av_x[:, None] + np.abs(xg)
    scales, mins, _ = make_qkx2_quants(xg, weights, nmax, rmin, rdelta, nstep, False)
    scales = scales.reshape(nb, 8)
    mins = mins.reshape(nb, 8)
    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)
    inv_scale = np.where(max_scale > 0, 63.0 / np.where(max_scale != 0, max_scale, 1), 0.0)
    inv_min = np.where(max_min > 0, 63.0 / np.where(max_min != 0, max_min, 1), 0.0)
    ls = np.minimum(63, _rint(inv_scale[:, None] * scales)).astype(np.uint8)
    lm = np.minimum(63, _rint(inv_min[:, None] * mins)).astype(np.uint8)
    sb = _pack_k4_scales(ls, lm)
    d = (max_scale / 63.0).astype(np.float16).astype(np.float32)
    dmin = (max_min / 63.0).astype(np.float16).astype(np.float32)
    sc, mn = _unpack_k4_scales(sb)
    dl = (d[:, None] * sc).repeat(32, axis=1)
    ml = (dmin[:, None] * mn).repeat(32, axis=1)
    L = np.where(
        dl != 0,
        np.clip(_rint((x + ml) / np.where(dl != 0, dl, 1)), 0, nmax),
        0,
    ).astype(np.uint8)
    return d, dmin, sb, L


def _pack_k4_nibbles(L: np.ndarray) -> np.ndarray:
    """[nb,256] 4-bit -> [nb,128]: per 64-group low 32 | high 32 << 4."""
    nb = L.shape[0]
    g = L.reshape(nb, 4, 2, 32)
    return (g[:, :, 0, :] | (g[:, :, 1, :] << 4)).reshape(nb, 128)


def quant_q4_K(x) -> np.ndarray:
    x = _group(x, GGMLType.Q4_K)
    d, dmin, sb, L = _quant_q45_K(x, 15, -1.0, 0.1, 20)
    out = np.empty((x.shape[0], 144), dtype=np.uint8)
    out[:, 0:2] = _f16_bytes(d)
    out[:, 2:4] = _f16_bytes(dmin)
    out[:, 4:16] = sb
    out[:, 16:144] = _pack_k4_nibbles(L)
    return out.reshape(-1)


def quant_q5_K(x) -> np.ndarray:
    x = _group(x, GGMLType.Q5_K)
    d, dmin, sb, L = _quant_q45_K(x, 31, -0.5, 0.1, 15)
    hbit = (L > 15).astype(np.uint8)
    Llow = np.where(L > 15, L - 16, L).astype(np.uint8)
    nb = x.shape[0]
    qh = np.zeros((nb, 32), dtype=np.uint8)
    for g in range(8):  # bit index g = 2*(e//64) + (e%64)//32
        qh |= hbit[:, g * 32 : (g + 1) * 32] << g
    out = np.empty((nb, 176), dtype=np.uint8)
    out[:, 0:2] = _f16_bytes(d)
    out[:, 2:4] = _f16_bytes(dmin)
    out[:, 4:16] = sb
    out[:, 16:48] = qh
    out[:, 48:176] = _pack_k4_nibbles(Llow)
    return out.reshape(-1)


def quant_q6_K(x) -> np.ndarray:
    x = _group(x, GGMLType.Q6_K)
    nb = x.shape[0]
    xg = x.reshape(nb * 16, 16)
    scales, _ = make_qx_quants(xg, 32)
    scales = scales.reshape(nb, 16)
    aidx = np.argmax(np.abs(scales), axis=1)
    max_scale = scales[np.arange(nb), aidx]
    dead = np.abs(max_scale) < GROUP_MAX_EPS
    iscale = np.where(dead, 0.0, -128.0 / np.where(max_scale != 0, max_scale, 1))
    d = np.where(dead, 0.0, 1.0 / np.where(iscale != 0, iscale, 1)).astype(np.float16).astype(
        np.float32
    )
    sc8 = np.minimum(127, _rint(iscale[:, None] * scales)).astype(np.int8)
    sc8 = np.where(dead[:, None], 0, sc8)
    dl = (d[:, None] * sc8.astype(np.float32)).repeat(16, axis=1)
    L = np.where(
        dl != 0, np.clip(_rint(x / np.where(dl != 0, dl, 1)), -32, 31), 0
    ).astype(np.int32) + 32  # 0..63
    # pack: per 128-chunk: ql[l]=q1|(q3<<4), ql[l+32]=q2|(q4<<4), qh[l]=hi bits
    Lr = L.reshape(nb, 2, 4, 32)
    lo = (Lr & 0xF).astype(np.uint8)
    hi = (Lr >> 4).astype(np.uint8)
    ql = np.empty((nb, 2, 64), dtype=np.uint8)
    ql[:, :, 0:32] = lo[:, :, 0, :] | (lo[:, :, 2, :] << 4)
    ql[:, :, 32:64] = lo[:, :, 1, :] | (lo[:, :, 3, :] << 4)
    qh = (
        hi[:, :, 0, :] | (hi[:, :, 1, :] << 2) | (hi[:, :, 2, :] << 4) | (hi[:, :, 3, :] << 6)
    )
    out = np.empty((nb, 210), dtype=np.uint8)
    out[:, 0:128] = ql.reshape(nb, 128)
    out[:, 128:192] = qh.reshape(nb, 64)
    out[:, 192:208] = sc8.view(np.uint8)
    out[:, 208:210] = _f16_bytes(d)
    return out.reshape(-1)


def quant_f16(x) -> np.ndarray:
    return np.asarray(x, np.float32).astype("<f2").reshape(-1).view(np.uint8)


def quant_bf16(x) -> np.ndarray:
    x = np.asarray(x, np.float32).reshape(-1)
    u = x.view(np.uint32)
    # round-to-nearest-even on the mantissa truncation (ggml_compute_fp32_to_bf16)
    rounded = ((u + 0x7FFF + ((u >> 16) & 1)) >> 16).astype("<u2")
    nan = np.isnan(x)
    rounded = np.where(nan, ((u >> 16) | 64).astype("<u2"), rounded)
    return rounded.view(np.uint8)


def quant_f32(x) -> np.ndarray:
    return np.asarray(x, "<f4").reshape(-1).view(np.uint8)


def _best_index_int8(values: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Nearest-codebook index, ties toward the upper index (ggml-quants.c:4554)."""
    idx = np.searchsorted(values, x)
    lo = np.clip(idx - 1, 0, len(values) - 1)
    hi = np.clip(idx, 0, len(values) - 1)
    return np.where(x - values[lo] < values[hi] - x, lo, hi)


def _iq4_block_scales(x: np.ndarray, values: np.ndarray, ntry: int) -> np.ndarray:
    """Per-32-block scale search (quantize_row_iq4_nl_impl, ggml-quants.c:4565-4634).

    x: [G, 32] -> scales [G] (weight = x^2, the no-imatrix path).
    """
    w = x * x
    idxm = np.argmax(np.abs(x), axis=1)
    mx = x[np.arange(x.shape[0]), idxm]
    amax = np.abs(mx)
    live = amax >= GROUP_MAX_EPS
    mxs = np.where(live, mx, 1.0)

    def sums(id_):
        q = values[_best_index_int8(values, id_[:, None] * x)]
        return (w * q * x).sum(axis=1), (w * q * q).sum(axis=1)

    d0 = -mxs / values[0]
    id0 = 1.0 / d0
    sumqx, sumq2 = sums(id0)
    d = np.where(sumq2 != 0, sumqx / np.where(sumq2 != 0, sumq2, 1), 0.0)
    best = d * sumqx
    for itry in range(-ntry, ntry + 1):
        idc = (itry + values[0]) / mxs
        sqx, sq2 = sums(idc)
        upd = (sq2 > 0) & (sqx * sqx > best * sq2)
        d = np.where(upd, sqx / np.where(sq2 != 0, sq2, 1), d)
        best = np.where(upd, d * sqx, best)
    return np.where(live, d, 0.0).astype(np.float32)


def quant_iq4_nl(x) -> np.ndarray:
    from .decode_np import KVALUES_IQ4NL

    x = _group(x, GGMLType.IQ4_NL)
    nb = x.shape[0]
    d = _iq4_block_scales(x, KVALUES_IQ4NL, ntry=7)
    id_ = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0)
    L = _best_index_int8(KVALUES_IQ4NL, id_[:, None] * x).astype(np.uint8)
    out = np.empty((nb, 18), dtype=np.uint8)
    out[:, 0:2] = _f16_bytes(d)
    out[:, 2:18] = L[:, :16] | (L[:, 16:] << 4)
    return out.reshape(-1)


def quant_iq4_xs(x) -> np.ndarray:
    from .decode_np import KVALUES_IQ4NL

    x = _group(x, GGMLType.IQ4_XS)
    nb = x.shape[0]
    xg = x.reshape(nb * 8, 32)
    scales = _iq4_block_scales(xg, KVALUES_IQ4NL, ntry=7).reshape(nb, 8)
    aidx = np.argmax(np.abs(scales), axis=1)
    max_scale = scales[np.arange(nb), aidx]
    d = (-max_scale / 32.0).astype(np.float32)
    id_ = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0)
    l = np.clip(_rint(id_[:, None] * scales), -32, 31).astype(np.int32)
    dl = d[:, None] * l
    idl = np.where(dl != 0, 1.0 / np.where(dl != 0, dl, 1), 0.0)  # [nb,8]
    L = _best_index_int8(
        KVALUES_IQ4NL, idl.repeat(32, axis=1) * x
    ).astype(np.uint8).reshape(nb, 8, 32)
    lq = (l + 32).astype(np.uint16)
    scales_l = ((lq[:, 0::2] & 0xF) | ((lq[:, 1::2] & 0xF) << 4)).astype(np.uint8)
    sh = np.zeros(nb, dtype=np.uint16)
    for ib in range(8):
        sh |= (lq[:, ib] >> 4) << np.uint16(2 * ib)
    out = np.empty((nb, 136), dtype=np.uint8)
    out[:, 0:2] = _f16_bytes(d)
    out[:, 2:4] = sh.astype("<u2")[:, None].view(np.uint8).reshape(-1, 2)
    out[:, 4:8] = scales_l
    out[:, 8:136] = (L[:, :, :16] | (L[:, :, 16:] << 4)).reshape(nb, 128)
    return out.reshape(-1)


def _lround(x):
    """C lroundf: round half away from zero."""
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int32)


def quant_tq1_0(x) -> np.ndarray:
    """Ternary 1.69-bpw (quantize_row_tq1_0_ref, ggml-quants.c): trits packed
    5-per-byte base-3 with a ceil-div 256/243 code, plus a 4-trit tail."""
    x = _group(x, GGMLType.TQ1_0)
    amax = np.abs(x).max(axis=1)
    d = amax.astype(np.float32)
    id_ = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0).astype(np.float32)
    xi = (_lround(x * id_[:, None]) + 1).astype(np.uint16)  # {-1,0,1} -> {0,1,2}

    def pack5(e):  # e [nb, 5, W]: trit n is most significant first
        q = e[:, 0]
        for n in range(1, 5):
            q = q * 3 + e[:, n]
        return ((q * 256 + 242) // 243).astype(np.uint8)

    out = np.zeros((x.shape[0], 54), dtype=np.uint8)
    out[:, 0:32] = pack5(xi[:, :160].reshape(-1, 5, 32))
    out[:, 32:48] = pack5(xi[:, 160:240].reshape(-1, 5, 16))
    e = xi[:, 240:].reshape(-1, 4, 4)  # [nb, m, j]: element = 240 + j + m*4
    q = (((e[:, 0] * 3 + e[:, 1]) * 3 + e[:, 2]) * 3 + e[:, 3]) * 3
    out[:, 48:52] = ((q * 256 + 242) // 243).astype(np.uint8)
    out[:, 52:54] = _f16_bytes(d[:, None])
    return out.reshape(-1)


def quant_tq2_0(x) -> np.ndarray:
    """Ternary 2-bpw (quantize_row_tq2_0_ref): 4 trits per byte, 2 bits each."""
    x = _group(x, GGMLType.TQ2_0)
    amax = np.abs(x).max(axis=1)
    d = amax.astype(np.float32)
    id_ = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0).astype(np.float32)
    xi = (_lround(x * id_[:, None]) + 1).astype(np.uint8)
    e = xi.reshape(-1, 2, 4, 32)  # [nb, 32-byte group, n, m]
    qs = e[:, :, 0] | (e[:, :, 1] << 2) | (e[:, :, 2] << 4) | (e[:, :, 3] << 6)
    out = np.zeros((x.shape[0], 66), dtype=np.uint8)
    out[:, 0:64] = qs.reshape(-1, 64)
    out[:, 64:66] = _f16_bytes(d[:, None])
    return out.reshape(-1)


QUANT_FNS = {
    GGMLType.F32: quant_f32,
    GGMLType.F16: quant_f16,
    GGMLType.BF16: quant_bf16,
    GGMLType.Q4_0: quant_q4_0,
    GGMLType.Q4_1: quant_q4_1,
    GGMLType.Q5_0: quant_q5_0,
    GGMLType.Q5_1: quant_q5_1,
    GGMLType.Q8_0: quant_q8_0,
    GGMLType.Q8_K: quant_q8_K,
    GGMLType.Q2_K: quant_q2_K,
    GGMLType.Q3_K: quant_q3_K,
    GGMLType.Q4_K: quant_q4_K,
    GGMLType.Q5_K: quant_q5_K,
    GGMLType.Q6_K: quant_q6_K,
    GGMLType.IQ4_NL: quant_iq4_nl,
    GGMLType.IQ4_XS: quant_iq4_xs,
    GGMLType.TQ1_0: quant_tq1_0,
    GGMLType.TQ2_0: quant_tq2_0,
}


def _register_iq():
    """Codebook i-quant encoders live in encode_iq.py (grid machinery)."""
    from . import encode_iq as iq

    QUANT_FNS.update({
        GGMLType.IQ2_XXS: iq.quant_iq2_xxs,
        GGMLType.IQ2_XS: iq.quant_iq2_xs,
        GGMLType.IQ2_S: iq.quant_iq2_s,
        GGMLType.IQ3_XXS: iq.quant_iq3_xxs,
        GGMLType.IQ3_S: iq.quant_iq3_s,
        GGMLType.IQ1_S: iq.quant_iq1_s,
        GGMLType.IQ1_M: iq.quant_iq1_m,
    })


_register_iq()

# formats whose encoder accepts an importance matrix (quant_weights)
IMATRIX_TYPES = frozenset({
    GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
    GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S, GGMLType.IQ1_M,
})


def quantize(x: np.ndarray, ggml_type: GGMLType, quant_weights=None) -> np.ndarray:
    """Quantize a flat float array to raw block bytes."""
    fn = QUANT_FNS.get(ggml_type)
    if fn is None:
        raise NotImplementedError(f"quantize not implemented for {ggml_type.name}")
    if ggml_type in IMATRIX_TYPES:
        return np.asarray(fn(x, quant_weights), dtype=np.uint8)
    return np.asarray(fn(x), dtype=np.uint8)


def quantize_tensor(
    x: np.ndarray, ggml_type: GGMLType, quant_weights=None
) -> np.ndarray:
    return quantize(
        np.ascontiguousarray(x, dtype=np.float32).reshape(-1), ggml_type,
        quant_weights=quant_weights,
    )
