"""Fused dequantize × matmul Pallas TPU kernels.

The TPU analog of the reference's mmvq.cu (decode matvec) and mmq.cu
(prefill GEMM): weights stay block-quantized in HBM; each grid step streams
one [TN, K]-rows weight tile's packed planes into VMEM, unpacks them
in-register on the VPU, and feeds the MXU against the activation block.
Decode is HBM-bandwidth-bound, so the win is reading ~2-8 bits/weight
instead of 16.

Throughput shape (measured on v5e): decode matvec is VPU-decode-bound, not
DMA-bound, so the kernel minimises per-element VPU work two ways:
  * sub-byte payloads are NOT concatenated into one [TN, K] tile; each
    shift/mask slice is scaled and fed to the MXU as its own dot over the
    matching activation columns (saves the concat copy);
  * per-group offsets (the "-8" of Q4_0, the mins planes of the K-quants)
    are not applied per element — the identity
        sum_j x_j (q_j - off_g) s_g = x·(q s) - sum_g off_g s_g (sum_j∈g x_j)
    turns them into one tiny [B,G]x[TN,G] correction dot against the
    per-group sums of the activations.
Together these cut VPU ops/element from ~6.5 to ~4.5 and lift Q4_0 matvec
from ~510 to ~800 GB/s effective payload bandwidth.

Layout contract (see quant/planar.py): payload planes unpack with plain
lane-aligned shift/mask slices; scale planes [TN, G] broadcast with one
`pltpu.repeat` tile (decoded column c ↔ scale c mod G); activations arrive
already permuted into the same strided column order, so slice p of the
unpack covers activation columns [p*K/P, (p+1)*K/P) and group membership
stays c mod G within every slice.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...quant.planar import QuantTensor, permute_activation

# ---------------------------------------------------------------------------
# in-kernel unpack helpers (all 2-D, lane-aligned)
# ---------------------------------------------------------------------------


def _nib(qs):
    """4-bit payload -> (lo, hi) int32 slices of K/2 columns each."""
    q = qs.astype(jnp.int32)
    return [q & 0xF, q >> 4]


def _crumbs(qs):
    """2-bit payload -> 4 int32 slices of K/4 columns each."""
    q = qs.astype(jnp.int32)
    return [(q >> (2 * s)) & 3 for s in range(4)]


def _bits(qb, n_parts):
    """1-bit payload -> n_parts int32 slices (8//n_parts bits concatenated)."""
    q = qb.astype(jnp.int32)
    per = 8 // n_parts
    return [
        jnp.concatenate([(q >> (p * per + b)) & 1 for b in range(per)], axis=-1)
        for p in range(n_parts)
    ]


def _rep(s, r):
    return pltpu.repeat(s.astype(jnp.float32), r, axis=1)


def _rep_to(s, w):
    """Tile the scale plane to payload-slice width `w`. The repeat factor is
    derived from shapes (not a per-format constant) so the same decoder
    works on column-sharded planes, where the payload slice is 1/m of the
    global width but the scale plane stays full (parallel/sharding._put_quant:
    shard widths are group-aligned, so `c mod G` still indexes the group)."""
    return _rep(s, w // s.shape[-1])


# trace-time flag (set by _qmm_call, keyed into the jit cache via its static
# args): at matvec batch sizes the MXU is row-starved, so f32 operands cost
# no MXU time and skip one bf16-cast VPU pass per weight element
_MXU_F32 = False

# trace-time flag: interpret-mode (CPU) kernels emulate Mosaic-only ops
# (pltpu.bitcast sublane expansion) with plain jnp
_INTERPRET = False


def _to_mxu(w):
    return w if _MXU_F32 else w.astype(jnp.bfloat16)


def _wm(v, st):
    """int levels × f32 scale tile -> MXU operand (bf16, or f32 at matvec B)."""
    return _to_mxu(v.astype(jnp.float32) * st)


def _f32(p):
    return p.astype(jnp.float32)


# Each decoder returns (parts, corr):
#   parts: list of bf16 tiles, part p multiplying activation columns
#          [p*K/P, (p+1)*K/P); levels are the RAW unsigned codes times scale.
#   corr:  f32 [TN, G] plane C with  true = sum_p dot(x_p, part_p) - xg @ C.T
#          (None when the format has no per-group offset).


def _dec_q4_0(p):
    st = _rep_to(p["d"], p["qs"].shape[-1])
    return [_wm(v, st) for v in _nib(p["qs"])], 8.0 * _f32(p["d"])


def _dec_q4_1(p):
    st = _rep_to(p["d"], p["qs"].shape[-1])
    return [_wm(v, st) for v in _nib(p["qs"])], -_f32(p["m"])


def _dec_q5_0(p):
    st = _rep_to(p["d"], p["qs"].shape[-1])
    hb = _bits(p["qh"], 2)
    lo, hi = _nib(p["qs"])
    return [_wm(lo | (hb[0] << 4), st), _wm(hi | (hb[1] << 4), st)], 16.0 * _f32(p["d"])


def _dec_q5_1(p):
    st = _rep_to(p["d"], p["qs"].shape[-1])
    hb = _bits(p["qh"], 2)
    lo, hi = _nib(p["qs"])
    return [_wm(lo | (hb[0] << 4), st), _wm(hi | (hb[1] << 4), st)], -_f32(p["m"])


def _dec_q8_0(p):
    return [_wm(p["qs"], _rep_to(p["d"], p["qs"].shape[-1]))], None


def _dec_q2_K(p):
    st = _rep_to(p["scales"], p["qs"].shape[-1])
    return [_wm(v, st) for v in _crumbs(p["qs"])], _f32(p["mins"])


# Superblock scale planes come in two orientations (quant/planar.py):
#   name  [N, S]  — 3-D stacked-expert tensors (expert row-slicing needs
#                   rows = n_exp*N)
#   nameT [S, N]  — 2-D tensors, stored transposed so the minor dim is a
#                   multiple of 128. A [N, S<128] f32 plane gets a {0,1}
#                   entry layout from XLA, which then re-stages the whole
#                   plane into VMEM EVERY decode step (slice-start x4 +
#                   ConcatBitcast inside the while body — measured 107.1 ->
#                   100.7 t/s at 8B, scripts/dump_decode_hlo.py). [S, N] is
#                   natively {1,0} with zero padding; the kernel pays one
#                   tiny [S, TN] -> [TN, S] VREG transpose instead.
TRANSPOSED_SB_PLANES = ("dmin_sb", "d_sb")


def resolve_plane_names(planes, names):
    """Map canonical plane names to the transposed variant when the tensor
    stores one (2-D tensors store dmin_sbT/d_sbT; experts keep [N, S])."""
    return tuple(n + "T" if n + "T" in planes else n for n in names)


def _sb_plane(p, name):
    """[TN, S] superblock tile from either orientation."""
    return p[name + "T"].T if name + "T" in p else p[name]


def _sb_expand(d_sb, G):
    """[TN, S] superblock plane -> [TN, G] per-group (col j's superblock is
    j % S under the superblock-strided group order, quant/planar.py)."""
    return _rep(d_sb, G // d_sb.shape[-1])


def _u8f(a):
    # Mosaic has no direct u8->f32 cast; int8 converts fine
    return a.astype(jnp.int32).astype(jnp.float32)


def _kq_mins(p):
    """Q4_K/Q5_K compact mins: dmin_sb [TN, S] f32 x m [TN, G] u8 — the
    correction-dot plane, recombined off the main dot's operand path."""
    return _sb_expand(_sb_plane(p, "dmin_sb"), p["m"].shape[-1]) * _u8f(p["m"])


def _dec_q3_K(p):
    # 3-bit values stored merged in a 4-bit plane (quant/planar.py)
    st = _rep_to(p["scales"], p["qs"].shape[-1])
    return [_wm(v, st) for v in _nib(p["qs"])], 4.0 * _f32(p["scales"])


def _dec_q4_K(p):
    st = _rep_to(p["scales"], p["qs"].shape[-1])
    return [_wm(v, st) for v in _nib(p["qs"])], _kq_mins(p)


def _dec_q4_ks4(p):
    """Q4_KS4: native s4 levels (q-8) from the row-pair-packed qsv u8
    plane [TN/2, K] — pltpu.bitcast(u8, int4) expands sublanes so int4
    row 2r+n = nibble n of u8 row r, i.e. the [TN, K] weight tile comes
    out rows-in-order as a free register reinterpret. ONE full-width
    load+cast+mul and ONE dot replace the mask/shift unpack and dual
    half-dots; measured at the DMA roofline (scripts/exp_s4.py).
    true = x.((q-8) st) - xg @ (mins - 8*st_g)^T."""
    qp = p["qsv"]
    if _INTERPRET:
        q = qp.astype(jnp.int32)
        lo, hi = q & 0xF, q >> 4
        v = jnp.stack([lo, hi], axis=1).reshape(2 * qp.shape[0], qp.shape[1])
        w4 = jnp.where(v >= 8, v - 16, v)
    else:
        w4 = pltpu.bitcast(qp, jnp.int4)  # [TN, K]
    st_g = _f32(p["scales"])
    st = _rep_to(st_g, w4.shape[-1])
    return [_wm(w4, st)], _kq_mins(p) - 8.0 * st_g


def _dec_q4_kc(p):
    """Q4_KC: compact st side — st = d_sb[j % S] * sc[j] recombined on the
    [TN, G] plane (1/32 of elements), streaming 0.375 b/w for scales
    instead of the premultiplied f32 plane's 1.0 (quant/planar.from_gguf).
    d and dmin ride ONE merged transposed plane ddm_sbT [2S, N] (a kernel
    with two minor-indexed [S, N] planes measured 120 -> 197 us at
    gate_up, scripts/exp_csc_variants.py). Identical f32 products, so
    bit-exact vs the Q4_K path."""
    G = p["scq"].shape[-1]
    dd = p["ddm_sbT"]  # [2S, TN]: rows 0..S-1 = d, S..2S-1 = dmin
    S = dd.shape[0] // 2
    # ONE [2S, TN] -> [TN, 2S] transpose per tile (the classic kernel's
    # dmin budget — a second per-tile transpose measured +2-3 us/grid
    # step); d and dmin come off it as cheap lane slices
    ddT = dd.T
    st_g = _rep(ddT[:, :S], G // S) * _u8f(p["scq"])
    mins = _rep(ddT[:, S:], G // S) * _u8f(p["m"])
    st = _rep_to(st_g, p["qs"].shape[-1])
    return [_wm(v, st) for v in _nib(p["qs"])], mins


def _dec_q5_K(p):
    st = _rep_to(p["scales"], p["qs"].shape[-1])
    hb = _bits(p["qh"], 2)
    lo, hi = _nib(p["qs"])
    return [_wm(lo | (hb[0] << 4), st), _wm(hi | (hb[1] << 4), st)], _kq_mins(p)


def _dec_q6_K(p):
    # signed int8 levels (q - 32) x (d_sb[j % S] * sc[j]): the packed
    # 4+2-bit decode measured VPU-bound at 8B; the premultiplied f32 [N, G]
    # scale plane measured DMA-bound (head matvec 870 vs 740 us, PERF r4)
    G = p["sc"].shape[-1]
    st_g = _sb_expand(_sb_plane(p, "d_sb"), G) * p["sc"].astype(jnp.float32)
    return [_wm(p["qs"], _rep_to(st_g, p["qs"].shape[-1]))], None


def _dec_q6_kp(p):
    """Q6_KP: packed 6-bit payload (4-bit split-packed qs + 2-bit qh,
    quant/planar.from_gguf) — 6.625 b/w streamed vs the int8 predecode's
    8.625. Raw levels q in [0, 64); the -32 folds into the correction dot
    (corr = 32 * st). st recombined like Q6_K."""
    G = p["sc"].shape[-1]
    st_g = _sb_expand(_sb_plane(p, "d_sb"), G) * p["sc"].astype(jnp.float32)
    st = _rep_to(st_g, p["qs"].shape[-1])
    lo = _nib(p["qs"])
    cr = _crumbs(p["qh"])
    hi = [jnp.concatenate([cr[0], cr[1]], axis=-1),
          jnp.concatenate([cr[2], cr[3]], axis=-1)]
    return ([_wm(lo[i] | (hi[i] << 4), st) for i in range(2)], 32.0 * st_g)


def _dec_i8(scale_name, p):
    # LUT/codebook formats: planar stores pre-mapped signed int8 levels
    # (quant/planar.from_gguf), so decode is Q8_0-style int8 * group scale
    return [_wm(p["qs"], _rep_to(p[scale_name], p["qs"].shape[-1]))], None


def _dec_iq1(R, p):
    # v = (q - 1)*s - m  ->  q*s with correction plane s + m
    st = _rep_to(p["scales"], p["qs"].shape[-1])
    parts = [_wm(v, st) for v in _crumbs(p["qs"])]
    return parts, _f32(p["scales"]) + _f32(p["mins"])


def _dec_tq(p):
    # ternary (BitNet): v = (q - 1)*d -> q*d with correction plane d
    st = _rep_to(p["d"], p["qs"].shape[-1])
    return [_wm(v, st) for v in _crumbs(p["qs"])], _f32(p["d"])


# kind -> (decoder, payload plane names, group/scale plane for G)
TILE_DECODERS = {
    "Q4_0": (_dec_q4_0, ("qs", "d"), "d"),
    "Q4_1": (_dec_q4_1, ("qs", "d", "m"), "d"),
    "Q5_0": (_dec_q5_0, ("qs", "qh", "d"), "d"),
    "Q5_1": (_dec_q5_1, ("qs", "qh", "d", "m"), "d"),
    "Q8_0": (_dec_q8_0, ("qs", "d"), "d"),
    "Q2_K": (_dec_q2_K, ("qs", "scales", "mins"), "scales"),
    "Q3_K": (_dec_q3_K, ("qs", "scales"), "scales"),
    "Q4_K": (_dec_q4_K, ("qs", "scales", "dmin_sb", "m"), "scales"),
    "Q4_KS4": (_dec_q4_ks4, ("qsv", "scales", "dmin_sb", "m"), "scales"),
    "Q4_KC": (_dec_q4_kc, ("qs", "scq", "ddm_sbT", "m"), "scq"),
    "Q5_K": (_dec_q5_K, ("qs", "qh", "scales", "dmin_sb", "m"), "scales"),
    "Q6_K": (_dec_q6_K, ("qs", "d_sb", "sc"), "sc"),
    "Q6_KP": (_dec_q6_kp, ("qs", "qh", "d_sb", "sc"), "sc"),
    "IQ4_NL": (functools.partial(_dec_i8, "d"), ("qs", "d"), "d"),
    "IQ4_XS": (functools.partial(_dec_i8, "scales"), ("qs", "scales"), "scales"),
    "IQ2_XXS": (functools.partial(_dec_i8, "scales"), ("qs", "scales"), "scales"),
    "IQ2_XS": (functools.partial(_dec_i8, "scales"), ("qs", "scales"), "scales"),
    "IQ2_S": (functools.partial(_dec_i8, "scales"), ("qs", "scales"), "scales"),
    "IQ3_XXS": (functools.partial(_dec_i8, "scales"), ("qs", "scales"), "scales"),
    "IQ3_S": (functools.partial(_dec_i8, "scales"), ("qs", "scales"), "scales"),
    "IQ1_S": (functools.partial(_dec_iq1, 32), ("qs", "scales", "mins"), "scales"),
    "IQ1_M": (functools.partial(_dec_iq1, 8), ("qs", "scales", "mins"), "scales"),
    "TQ1_0": (_dec_tq, ("qs", "d"), "d"),
    "TQ2_0": (_dec_tq, ("qs", "d"), "d"),
}


# ---------------------------------------------------------------------------
# kernel + call
# ---------------------------------------------------------------------------


def _tile_matvec(kind, G, planes, xf):
    """One weight tile's fused dequant x matmul: planes dict -> [B, TN] f32."""
    parts, corr = TILE_DECODERS[kind][0](planes)
    x = xf if _MXU_F32 else xf.astype(jnp.bfloat16)
    P = len(parts)
    Kp = x.shape[1] // P
    acc = None
    for p, w in enumerate(parts):
        d = jax.lax.dot_general(
            x[:, p * Kp : (p + 1) * Kp], w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = d if acc is None else acc + d
    if corr is not None:
        # per-group activation sums (group of strided col c is c mod G):
        # R cheap [B, G] slice-adds of the already-resident x block
        R = x.shape[1] // G
        xg = xf[:, :G].astype(jnp.float32)
        for r in range(1, R):
            xg = xg + xf[:, r * G : (r + 1) * G]
        acc = acc - jax.lax.dot_general(
            xg, corr, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return acc


def _qmm_kernel(kind, plane_names, G, permute, x_ref, *refs):
    n_planes = len(plane_names)
    planes = {name: refs[i][...] for i, name in enumerate(plane_names)}
    out_ref = refs[n_planes]
    # x is [B, K] strided cols (permuted outside: Mosaic has no in-kernel
    # shape-cast for the reorder; XLA CSE dedupes the repeated permutes of
    # one activation across q/k/v/gate_up)
    del permute
    out_ref[...] = _tile_matvec(kind, G, planes, x_ref[...])


def _qmm_multi_kernel(kinds, all_names, Gs, bounds, *refs):
    """Phase-partitioned multi-weight kernel: grid steps [bounds[t],
    bounds[t+1]) decode tensor t's tiles and write its output block."""
    nt = len(kinds)
    x_refs = refs[:nt]
    plane_refs = []
    off = nt
    for t in range(nt):
        plane_refs.append(refs[off:off + len(all_names[t])])
        off += len(all_names[t])
    out_refs = refs[off:off + nt]
    i = pl.program_id(0)
    for t in range(nt):
        @pl.when((i >= bounds[t]) & (i < bounds[t + 1]))
        def _(t=t):
            planes = {nm: plane_refs[t][j][...]
                      for j, nm in enumerate(all_names[t])}
            out_refs[t][...] = _tile_matvec(kinds[t], Gs[t], planes,
                                            x_refs[t][...])


@functools.partial(jax.jit, static_argnames=(
    "kind", "shape", "plane_names", "tn", "G", "interpret", "permute", "mxu_f32"))
def _qmm_call(x, plane_vals, kind, shape, plane_names, tn, G, interpret=False,
              permute=False, mxu_f32=False):
    global _MXU_F32, _INTERPRET
    N, K = shape
    B = x.shape[0]
    planes = dict(zip(plane_names, plane_vals))
    # large-B (prefill) row tiling: a [B, K] activation block stops fitting
    # VMEM around B*K = 8M elements; split rows with N OUTER in the grid so
    # a weight tile's index stays constant across consecutive row steps
    # (pallas skips the re-DMA) while x tiles stream
    tb = 0
    if B * K * 2 > 12 * 1024 * 1024:
        for cand in (1024, 512, 256, 128):
            # the x tile is double-buffered: keep one copy under ~8MB
            if B % cand == 0 and cand * K * 2 <= 8 * 1024 * 1024:
                tb = cand
                break
        else:
            for cand in (256, 128):
                if B % cand == 0:
                    tb = cand
                    break
    def plane_spec(name, idx_t, idx_n):
        # transposed [S, N] planes tile as (S, tn) with the row grid index
        # in the minor dim (see TRANSPOSED_SB_PLANES); the row-pair-packed
        # qsv plane carries 2 weight rows per stored row, so its block is
        # (tn/2, K) with the same block index
        pv = planes[name]
        if name.endswith("T"):
            return pl.BlockSpec((pv.shape[0], tn), idx_t,
                                memory_space=pltpu.VMEM)
        rows = tn // 2 if name == "qsv" else tn
        return pl.BlockSpec((rows, pv.shape[1]), idx_n, memory_space=pltpu.VMEM)

    if tb:
        grid = (N // tn, B // tb)
        in_specs = [
            pl.BlockSpec((tb, K), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        ] + [
            plane_spec(name, lambda j, i: (0, j), lambda j, i: (j, 0))
            for name in plane_names
        ]
        out_spec = pl.BlockSpec((tb, tn), lambda j, i: (i, j),
                                memory_space=pltpu.VMEM)
        dims = ("arbitrary", "arbitrary")
    else:
        grid = (N // tn,)
        in_specs = [
            pl.BlockSpec((B, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ] + [
            plane_spec(name, lambda i: (0, i), lambda i: (i, 0))
            for name in plane_names
        ]
        out_spec = pl.BlockSpec((B, tn), lambda i: (0, i), memory_space=pltpu.VMEM)
        dims = ("arbitrary",)
    kernel = functools.partial(_qmm_kernel, kind, plane_names, G, permute)
    _MXU_F32 = mxu_f32  # trace-time; jit caches on the static arg
    _INTERPRET = interpret
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=dims,
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    try:
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * B * N * K,
                bytes_accessed=sum(int(np.prod(p.shape)) * p.dtype.itemsize for p in plane_vals)
                + B * K * x.dtype.itemsize + B * N * 4,
                transcendentals=0,
            ),
            **kwargs,
        )(x, *(planes[n] for n in plane_names))
    finally:
        _MXU_F32 = False
        _INTERPRET = False


_TN_OVERRIDE = int(os.environ.get("LLAMACOG_QMM_TN", "0"))

# streamed bits/weight per kind (tile-size sizing input for pick_tile_n;
# extendable by measurement scripts that register experimental kinds)
KIND_BITS = {"Q2_K": 3.0, "Q3_K": 4.0, "Q4_0": 5.0, "Q4_1": 6.0, "IQ4_NL": 5.0,
             "IQ4_XS": 5.0, "Q4_K": 5.4, "Q4_KS4": 5.4, "Q4_KC": 4.8,
             "Q6_KP": 6.7,
             "Q5_0": 6.0, "Q5_1": 7.0, "Q5_K": 6.4,
             "Q6_K": 8.6, "Q8_0": 10.0,
             "IQ2_XXS": 4.0, "IQ2_XS": 5.0, "IQ2_S": 5.0, "IQ3_XXS": 5.0,
             "IQ3_S": 5.0, "IQ1_S": 4.0, "IQ1_M": 10.0}


# measured decode (matvec-B) tile sizes on v5e (scripts/exp_tn_sweep.py,
# e2e-confirmed by bench.py): the heuristic below picks 512/128 for these,
# which leaves 20-30% of the DMA roofline on the table at the ffn shapes
_DECODE_TN_V5E = {
    ("Q4_K", 28672, 4096): 1024,   # gate_up fused: 120 -> 94 us
    ("Q4_K", 4096, 14336): 512,    # ffn_down:       64 -> 45 us
    ("Q4_KC", 28672, 4096): 1024,  # compact-scales variants of the same
    ("Q4_KC", 4096, 14336): 512,
    ("Q4_K", 5120, 4096): 1024,    # qk phase of the qk+v fused launch
    ("Q6_K", 1024, 4096): 512,     # v phase
    # llama-3-70B per-layer shapes (BASELINE config 5; exp_tn_sweep 70b):
    ("Q4_K", 57344, 8192): 2048,   # gate_up full        459 -> 421 us
    ("Q4_K", 14336, 8192): 1024,   # gate_up TP4 shard   141 -> 92 us
    ("Q4_K", 9216, 8192): 1024,    # qk fused            83 -> 77 us
    ("Q4_K", 8192, 8192): 512,     # wo                  72 -> 56 us (roofline)
    ("Q4_K", 8192, 28672): 256,    # ffn_down
    ("Q6_K", 8192, 28672): 256,    # ffn_down (6-bit layers)
    ("Q4_K", 2048, 28672): 512,    # ffn_down TP4 shard  67 -> 52 us
}


def pick_tile_n(N: int, K: int, kind: str, b: int = 1) -> int:
    """Rows per grid step, sized so payload (2x double-buffered) + decoded
    bf16 tile + f32 scale tile fit comfortably in VMEM. At matvec batch
    sizes a measured per-shape table overrides the heuristic."""
    if _TN_OVERRIDE:
        return _TN_OVERRIDE if N % _TN_OVERRIDE == 0 else 0
    if b <= 8:
        tn = _DECODE_TN_V5E.get((kind, N, K))
        if tn and N % tn == 0:
            return tn
    bits = KIND_BITS.get(kind, 8.0)
    # bytes per weight row resident: 2x payload + bf16 decoded + f32 scale tile
    row_bytes = K * (2 * bits / 8 + 2.0 + 4.0)
    budget = 16 * 1024 * 1024  # measured on v5e: tn1024 at K=2048 beats tn512 by ~18%
    tn = max(128, int(budget / max(row_bytes, 1)) // 128 * 128)
    # keep at least ~4 grid steps so the payload DMA pipeline fills
    # (v5e scan: N=2048 best at tn 512, N=3072 at 768, N=11264 at 1024)
    tn = min(tn, max(128, N // 4 // 128 * 128), N)
    while N % tn and tn > 128:
        tn -= 128
    if N % tn:
        for cand in (512, 256, 128, 64, 32, 16, 8):
            if N % cand == 0:
                return cand
        return 0
    return tn


@functools.partial(
    jax.jit, static_argnames=("kinds", "shapes", "names", "tns", "Gs",
                              "interpret", "mxu_f32"))
def _qmm_multi_call(xs, all_plane_vals, kinds, shapes, names, tns, Gs,
                    interpret=False, mxu_f32=False):
    global _MXU_F32, _INTERPRET
    nt = len(kinds)
    B = xs[0].shape[0]
    steps = [shapes[t][0] // tns[t] for t in range(nt)]
    bounds = tuple(int(np.sum(steps[:t])) for t in range(nt + 1))
    in_specs = [
        pl.BlockSpec((B, xs[t].shape[1]), lambda i: (0, 0),
                     memory_space=pltpu.VMEM)
        for t in range(nt)
    ]
    flat_planes = []
    for t in range(nt):
        lo, hi = bounds[t], bounds[t + 1]
        for nm, pv in zip(names[t], all_plane_vals[t]):
            if nm.endswith("T"):  # [S, N]: row tile rides the minor dim
                spec = pl.BlockSpec(
                    (pv.shape[0], tns[t]),
                    (lambda i, _lo=lo, _hi=hi:
                     (0, jnp.clip(i - _lo, 0, _hi - _lo - 1))),
                    memory_space=pltpu.VMEM)
            else:
                rows = tns[t] // 2 if nm == "qsv" else tns[t]
                spec = pl.BlockSpec(
                    (rows, pv.shape[1]),
                    (lambda i, _lo=lo, _hi=hi:
                     (jnp.clip(i - _lo, 0, _hi - _lo - 1), 0)),
                    memory_space=pltpu.VMEM)
            in_specs.append(spec)
            flat_planes.append(pv)
    out_shapes = [jax.ShapeDtypeStruct((B, shapes[t][0]), jnp.float32)
                  for t in range(nt)]
    out_specs = [
        pl.BlockSpec((B, tns[t]),
                     (lambda i, _lo=bounds[t], _hi=bounds[t + 1]:
                      (0, jnp.clip(i - _lo, 0, _hi - _lo - 1))),
                     memory_space=pltpu.VMEM)
        for t in range(nt)
    ]
    kernel = functools.partial(_qmm_multi_kernel, kinds, names, Gs, bounds)
    _MXU_F32 = mxu_f32
    _INTERPRET = interpret
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    total_bytes = sum(int(np.prod(p.shape)) * p.dtype.itemsize
                      for p in flat_planes)
    try:
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            grid=(bounds[-1],),
            in_specs=in_specs,
            out_specs=out_specs,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * B * sum(s[0] * s[1] for s in shapes),
                bytes_accessed=total_bytes + sum(
                    B * x.shape[1] * x.dtype.itemsize for x in xs),
                transcendentals=0,
            ),
            **kwargs,
        )(*xs, *flat_planes)
    finally:
        _MXU_F32 = False
        _INTERPRET = False


def qmm_multi(x: jnp.ndarray, qts, interpret: bool = False):
    """One pallas_call computing x @ dequant(qt)^T for SEVERAL QuantTensors
    sharing the activation (mixed kinds welcome — the 8B Q4_K_M layer pairs
    Q4_K attn_qk with Q6_K attn_v). The grid is phase-partitioned: steps
    [bounds[t], bounds[t+1]) stream tensor t's tiles, each phase's clamped
    index maps pin the other tensors' blocks (no re-DMA). One kernel launch
    + one x round-trip replaces len(qts) of each.

    Returns a list of [..., N_t] f32 outputs (same contract as qmm)."""
    lead = x.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    xs, shapes, names_all, tns, Gs, kinds, planes_all = [], [], [], [], [], [], []
    for qt in qts:
        N, K = int(np.prod(qt.shape[:-1])), qt.shape[-1]
        tn = pick_tile_n(N, K, qt.kind, b=B)
        if tn == 0:
            raise ValueError(f"N={N} not tileable")
        dec, names, gplane = TILE_DECODERS[qt.kind]
        names = resolve_plane_names(qt.planes, names)
        xs.append(permute_activation(x, qt).reshape(B, K))
        shapes.append((N, K))
        names_all.append(names)
        tns.append(tn)
        Gs.append(qt.planes[gplane].shape[1])
        kinds.append(qt.kind)
        planes_all.append(tuple(qt.planes[n] for n in names))
    outs = _qmm_multi_call(
        tuple(xs), tuple(planes_all), tuple(kinds), tuple(shapes),
        tuple(names_all), tuple(tns), tuple(Gs), interpret,
        mxu_f32=B <= 8)
    return [o.reshape(*lead, s[0]) for o, s in zip(outs, shapes)]


def qmm(x: jnp.ndarray, qt: QuantTensor, interpret: bool = False) -> jnp.ndarray:
    """x [..., K] @ dequant(qt)[N, K]^T -> [..., N] (f32)."""
    N, K = int(np.prod(qt.shape[:-1])), qt.shape[-1]
    lead = x.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    if "qi8" in qt.planes:
        from ...quant.mmq import MMQ_MIN_B

        if B >= MMQ_MIN_B:
            from .qmm_i8 import qmm_i8

            return qmm_i8(x, qt, interpret=interpret)
    xp = permute_activation(x, qt).reshape(B, K)
    tn = pick_tile_n(N, K, qt.kind, b=B)
    if tn == 0:
        raise ValueError(f"N={N} not tileable")
    dec, names, gplane = TILE_DECODERS[qt.kind]
    names = resolve_plane_names(qt.planes, names)
    G = qt.planes[gplane].shape[1]
    plane_vals = tuple(qt.planes[n] for n in names)
    out = _qmm_call(xp, plane_vals, qt.kind, (N, K), names, tn, G, interpret,
                    permute=True, mxu_f32=B <= 8)
    return out.reshape(*lead, N)


def supports(kind: str) -> bool:
    return kind in TILE_DECODERS
