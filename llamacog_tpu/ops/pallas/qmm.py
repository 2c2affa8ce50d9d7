"""Fused dequantize × matmul Pallas TPU kernels.

The TPU analog of the reference's mmvq.cu (decode matvec) and mmq.cu
(prefill GEMM): weights stay block-quantized in HBM; each grid step streams
one [TN, K]-rows weight tile's packed planes into VMEM, unpacks them
in-register on the VPU, and feeds the MXU against the activation block.
Decode is HBM-bandwidth-bound, so the win is reading ~2-8 bits/weight
instead of 16.

Layout contract (see quant/planar.py): payload planes unpack with plain
lane-aligned `concat` of shift/mask slices; scale planes [TN, G] broadcast
with one `pltpu.repeat` tile (column c ↔ scale c mod G); activations arrive
already permuted into the same strided column order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...quant.decode_np import KVALUES_IQ4NL
from ...quant.planar import IQ3XXS_ALPHABET, QuantTensor, permute_activation

# ---------------------------------------------------------------------------
# in-kernel unpack helpers (all 2-D, lane-aligned)
# ---------------------------------------------------------------------------


def _unpack4(qs):
    q = qs.astype(jnp.int32)
    return jnp.concatenate([q & 0xF, q >> 4], axis=-1)


def _unpack2(qs):
    q = qs.astype(jnp.int32)
    return jnp.concatenate([(q >> (2 * s)) & 3 for s in range(4)], axis=-1)


def _unpack1(qb):
    q = qb.astype(jnp.int32)
    return jnp.concatenate([(q >> b) & 1 for b in range(8)], axis=-1)


def _tile_scale(s, R):
    return pltpu.repeat(s.astype(jnp.float32), R, axis=1)


def _lut16(idx):
    v = jnp.zeros(idx.shape, jnp.float32)
    for i in range(16):
        v = v + jnp.where(idx == i, np.float32(KVALUES_IQ4NL[i]), 0.0)
    return v


def _dec_q4_0(p):
    return (_unpack4(p["qs"]).astype(jnp.float32) - 8.0) * _tile_scale(p["d"], 32)


def _dec_q4_1(p):
    return _unpack4(p["qs"]).astype(jnp.float32) * _tile_scale(p["d"], 32) + _tile_scale(
        p["m"], 32
    )


def _dec_q5_0(p):
    v = (_unpack4(p["qs"]) | (_unpack1(p["qh"]) << 4)).astype(jnp.float32) - 16.0
    return v * _tile_scale(p["d"], 32)


def _dec_q5_1(p):
    v = (_unpack4(p["qs"]) | (_unpack1(p["qh"]) << 4)).astype(jnp.float32)
    return v * _tile_scale(p["d"], 32) + _tile_scale(p["m"], 32)


def _dec_q8_0(p):
    return p["qs"].astype(jnp.float32) * _tile_scale(p["d"], 32)


def _dec_q2_K(p):
    v = _unpack2(p["qs"]).astype(jnp.float32)
    return v * _tile_scale(p["scales"], 16) - _tile_scale(p["mins"], 16)


def _dec_q3_K(p):
    v = (_unpack2(p["qs"]) + (_unpack1(p["hb"]) << 2)).astype(jnp.float32) - 4.0
    return v * _tile_scale(p["scales"], 16)


def _dec_q4_K(p):
    v = _unpack4(p["qs"]).astype(jnp.float32)
    return v * _tile_scale(p["scales"], 32) - _tile_scale(p["mins"], 32)


def _dec_q5_K(p):
    v = (_unpack4(p["qs"]) | (_unpack1(p["qh"]) << 4)).astype(jnp.float32)
    return v * _tile_scale(p["scales"], 32) - _tile_scale(p["mins"], 32)


def _dec_q6_K(p):
    v = (_unpack4(p["qs"]) | (_unpack2(p["qh"]) << 4)).astype(jnp.float32) - 32.0
    return v * _tile_scale(p["scales"], 16)


def _dec_iq4_nl(p):
    return _lut16(_unpack4(p["qs"])) * _tile_scale(p["d"], 32)


def _dec_iq4_xs(p):
    return _lut16(_unpack4(p["qs"])) * _tile_scale(p["scales"], 32)


def _dec_iq2(R, p):
    c = _unpack2(p["qs"])
    mag = jnp.where(c == 0, 8.0, jnp.where(c == 1, 25.0, 43.0))
    sign = 1.0 - 2.0 * _unpack1(p["sg"]).astype(jnp.float32)
    return mag * sign * _tile_scale(p["scales"], R)


def _dec_iq3_xxs(p):
    c = _unpack2(p["qs"]) | (_unpack1(p["hb"]) << 2)
    mag = jnp.zeros(c.shape, jnp.float32)
    for i, val in enumerate(IQ3XXS_ALPHABET):
        mag = mag + jnp.where(c == i, np.float32(val), 0.0)
    sign = 1.0 - 2.0 * _unpack1(p["sg"]).astype(jnp.float32)
    return mag * sign * _tile_scale(p["scales"], 32)


def _dec_iq3_s(p):
    c = _unpack2(p["qs"]) | (_unpack1(p["hb"]) << 2)
    sign = 1.0 - 2.0 * _unpack1(p["sg"]).astype(jnp.float32)
    return (2 * c + 1).astype(jnp.float32) * sign * _tile_scale(p["scales"], 32)


def _dec_iq1(R, p):
    v = _unpack2(p["qs"]).astype(jnp.float32) - 1.0
    return v * _tile_scale(p["scales"], R) - _tile_scale(p["mins"], R)


TILE_DECODERS = {
    "Q4_0": (_dec_q4_0, ("qs", "d")),
    "Q4_1": (_dec_q4_1, ("qs", "d", "m")),
    "Q5_0": (_dec_q5_0, ("qs", "qh", "d")),
    "Q5_1": (_dec_q5_1, ("qs", "qh", "d", "m")),
    "Q8_0": (_dec_q8_0, ("qs", "d")),
    "Q2_K": (_dec_q2_K, ("qs", "scales", "mins")),
    "Q3_K": (_dec_q3_K, ("qs", "hb", "scales")),
    "Q4_K": (_dec_q4_K, ("qs", "scales", "mins")),
    "Q5_K": (_dec_q5_K, ("qs", "qh", "scales", "mins")),
    "Q6_K": (_dec_q6_K, ("qs", "qh", "scales")),
    "IQ4_NL": (_dec_iq4_nl, ("qs", "d")),
    "IQ4_XS": (_dec_iq4_xs, ("qs", "scales")),
    "IQ2_XXS": (functools.partial(_dec_iq2, 32), ("qs", "sg", "scales")),
    "IQ2_XS": (functools.partial(_dec_iq2, 16), ("qs", "sg", "scales")),
    "IQ2_S": (functools.partial(_dec_iq2, 16), ("qs", "sg", "scales")),
    "IQ3_XXS": (_dec_iq3_xxs, ("qs", "hb", "sg", "scales")),
    "IQ3_S": (_dec_iq3_s, ("qs", "hb", "sg", "scales")),
    "IQ1_S": (functools.partial(_dec_iq1, 32), ("qs", "scales", "mins")),
    "IQ1_M": (functools.partial(_dec_iq1, 8), ("qs", "scales", "mins")),
}


# ---------------------------------------------------------------------------
# kernel + call
# ---------------------------------------------------------------------------


def _qmm_kernel(kind, n_planes, x_ref, *refs):
    names = TILE_DECODERS[kind][1]
    planes = {name: refs[i][...] for i, name in enumerate(names)}
    out_ref = refs[n_planes]
    # decode in f32 (exact scale products), feed the MXU in bf16 — same
    # register budget as the reference's int8 path, f32 accumulation
    w = TILE_DECODERS[kind][0](planes).astype(jnp.bfloat16)  # [TN, K] strided cols
    x = x_ref[...].astype(jnp.bfloat16)  # [B, K] strided cols
    out_ref[...] = jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("kind", "shape", "plane_names", "tn", "interpret"))
def _qmm_call(x, plane_vals, kind, shape, plane_names, tn, interpret=False):
    N, K = shape
    B = x.shape[0]
    planes = dict(zip(plane_names, plane_vals))
    grid = (N // tn,)
    in_specs = [pl.BlockSpec((B, K), lambda i: (0, 0), memory_space=pltpu.VMEM)] + [
        pl.BlockSpec((tn, planes[name].shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for name in plane_names
    ]
    kernel = functools.partial(_qmm_kernel, kind, len(plane_names))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K,
            bytes_accessed=sum(int(np.prod(p.shape)) * p.dtype.itemsize for p in plane_vals)
            + B * K * x.dtype.itemsize + B * N * 4,
            transcendentals=0,
        ),
    )(x, *(planes[n] for n in plane_names))


import os

_TN_OVERRIDE = int(os.environ.get("LLAMACOG_QMM_TN", "0"))


def pick_tile_n(N: int, K: int, kind: str) -> int:
    """Rows per grid step, sized so payload (2x double-buffered) + decoded
    bf16 tile + f32 scale tile fit comfortably in VMEM."""
    if _TN_OVERRIDE:
        return _TN_OVERRIDE if N % _TN_OVERRIDE == 0 else 0
    bits = {"Q2_K": 3.0, "Q3_K": 4.0, "Q4_0": 5.0, "Q4_1": 6.0, "IQ4_NL": 5.0,
            "IQ4_XS": 5.0, "Q4_K": 6.0, "Q5_0": 6.0, "Q5_1": 7.0, "Q5_K": 7.0,
            "Q6_K": 8.5, "Q8_0": 10.0,
            "IQ2_XXS": 4.0, "IQ2_XS": 5.0, "IQ2_S": 5.0, "IQ3_XXS": 5.0,
            "IQ3_S": 5.0, "IQ1_S": 4.0, "IQ1_M": 10.0}.get(kind, 8.0)
    # bytes per weight row resident: 2x payload + bf16 decoded + f32 scale tile
    row_bytes = K * (2 * bits / 8 + 2.0 + 4.0)
    budget = 16 * 1024 * 1024  # measured on v5e: tn1024 at K=2048 beats tn512 by ~18%
    tn = max(128, int(budget / max(row_bytes, 1)) // 128 * 128)
    tn = min(tn, N)
    while N % tn and tn > 128:
        tn -= 128
    if N % tn:
        for cand in (512, 256, 128, 64, 32, 16, 8):
            if N % cand == 0:
                return cand
        return 0
    return tn


def qmm(x: jnp.ndarray, qt: QuantTensor, interpret: bool = False) -> jnp.ndarray:
    """x [..., K] @ dequant(qt)[N, K]^T -> [..., N] (f32)."""
    N, K = int(np.prod(qt.shape[:-1])), qt.shape[-1]
    lead = x.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    xp = permute_activation(x, qt).reshape(B, K)
    tn = pick_tile_n(N, K, qt.kind)
    if tn == 0:
        raise ValueError(f"N={N} not tileable")
    names = TILE_DECODERS[qt.kind][1]
    plane_vals = tuple(qt.planes[n] for n in names)
    out = _qmm_call(xp, plane_vals, qt.kind, (N, K), names, tn, interpret)
    return out.reshape(*lead, N)


def supports(kind: str) -> bool:
    return kind in TILE_DECODERS
