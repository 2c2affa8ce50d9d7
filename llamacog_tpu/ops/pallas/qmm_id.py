"""Sparse MoE expert matmuls over stacked quantized experts (mul_mat_id).

TPU analog of the reference's GGML_OP_MUL_MAT_ID (ggml/include/ggml.h:460;
expert-grouped CPU loop ggml-cpu/ggml-cpu.c:1466; router build_moe_ffn
src/llama-graph.cpp:642-760). Expert weights stay block-quantized in HBM as
one stacked QuantTensor [n_exp, N, K]; only the selected experts' bytes are
ever streamed:

* `qmm_gather` (decode, few rows): grid (S, N/tn); the per-row expert id is
  scalar-prefetched so the BlockSpec index_map DMAs exactly that expert's
  weight tiles — the Pallas "gather via prefetched indices" pattern.
* `qmm_ragged` (prefill): tokens are sorted by expert and padded per expert
  to token-tile multiples outside the kernel; a prefetched tile→expert map
  then drives a grouped GEMM, grid (S_pad/TT, N/tn), reading each used
  expert's weights once (megablocks-style static-shape dispatch).

Both reuse the per-format TILE_DECODERS from qmm.py, so every quant kind
with a planar layout works as an expert format.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...quant.planar import QuantTensor, permute_activation
from .qmm import TILE_DECODERS, pick_tile_n


def _planes3(qt: QuantTensor):
    """Stacked expert planes as [n_exp, N, cols] views."""
    n_exp, N = qt.shape[0], int(np.prod(qt.shape[1:-1]))
    return {k: v.reshape(n_exp, N, v.shape[-1]) for k, v in qt.planes.items()}


def _decode_block(kind, refs, n_planes):
    names = TILE_DECODERS[kind][1]
    planes = {name: refs[i][0] for i, name in enumerate(names)}
    return TILE_DECODERS[kind][0](planes)


def _body(kind, G, x, xf, parts, corr, out_ref):
    P = len(parts)
    Kp = x.shape[1] // P
    acc = None
    for p, w in enumerate(parts):
        d = jax.lax.dot_general(
            x[:, p * Kp:(p + 1) * Kp], w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = d if acc is None else acc + d
    if corr is not None:
        R = x.shape[1] // G
        xg = xf[:, :G]
        for r in range(1, R):
            xg = xg + xf[:, r * G:(r + 1) * G]
        acc = acc - jax.lax.dot_general(
            xg, corr, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[...] = acc


def _gather_kernel(kind, n_planes, G, ids_ref, x_ref, *refs):
    out_ref = refs[n_planes]
    parts, corr = _decode_block(kind, refs, n_planes)
    xf = x_ref[...]  # [*, K] strided cols (permuted outside; see qmm.py)
    _body(kind, G, xf.astype(jnp.bfloat16), xf, parts, corr, out_ref)


@functools.partial(jax.jit, static_argnames=("kind", "shape", "plane_names", "tn", "G", "interpret"))
def _gather_call(x, ids, plane_vals, kind, shape, plane_names, tn, G, interpret=False):
    n_exp, N, K = shape
    S = x.shape[0]
    planes = dict(zip(plane_names, plane_vals))
    grid = (S, N // tn)
    in_specs = [
        pl.BlockSpec((1, K), lambda s, j, ids: (s, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(
            (1, tn, planes[name].shape[-1]),
            lambda s, j, ids, _n=name: (ids[s], j, 0),
            memory_space=pltpu.VMEM,
        )
        for name in plane_names
    ]
    kernel = functools.partial(_gather_kernel, kind, len(plane_names), G)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    bytes_per = sum(int(np.prod(p.shape[1:])) * p.dtype.itemsize for p in plane_vals)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, N), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, tn), lambda s, j, ids: (s, j)),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * S * N * K,
            bytes_accessed=S * bytes_per + S * K * 4 + S * N * 4,
            transcendentals=0,
        ),
        **kwargs,
    )(ids, x, *(planes[n] for n in plane_names))


def qmm_gather(x: jnp.ndarray, ids: jnp.ndarray, qt: QuantTensor,
               interpret: bool = False) -> jnp.ndarray:
    """x [S, K] rows, ids [S] expert per row, qt stacked [n_exp, N, K]
    -> [S, N] f32 where out[s] = x[s] @ dequant(qt[ids[s]])^T."""
    n_exp = qt.shape[0]
    N, K = int(np.prod(qt.shape[1:-1])), qt.shape[-1]
    xp = permute_activation(x, qt)
    tn = pick_tile_n(N, K, qt.kind)
    if tn == 0:
        raise ValueError(f"N={N} not tileable")
    dec, names, gplane = TILE_DECODERS[qt.kind]
    p3 = _planes3(qt)
    G = p3[gplane].shape[-1]
    return _gather_call(
        xp, jnp.asarray(ids, jnp.int32), tuple(p3[n] for n in names),
        qt.kind, (n_exp, N, K), names, tn, G, interpret,
    )


def _ragged_kernel(kind, n_planes, G, te_ref, x_ref, *refs):
    out_ref = refs[n_planes]
    parts, corr = _decode_block(kind, refs, n_planes)
    xf = x_ref[...]  # [*, K] strided cols (permuted outside; see qmm.py)
    _body(kind, G, xf.astype(jnp.bfloat16), xf, parts, corr, out_ref)


@functools.partial(jax.jit, static_argnames=("kind", "shape", "tt", "tn", "G", "plane_names", "interpret"))
def _ragged_call(xs, tile_expert, plane_vals, kind, shape, plane_names, tt, tn, G,
                 interpret=False):
    n_exp, N, K = shape
    S_pad = xs.shape[0]
    planes = dict(zip(plane_names, plane_vals))
    grid = (S_pad // tt, N // tn)
    in_specs = [
        pl.BlockSpec((tt, K), lambda i, j, te: (i, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(
            (1, tn, planes[name].shape[-1]),
            lambda i, j, te, _n=name: (te[i], j, 0),
            memory_space=pltpu.VMEM,
        )
        for name in plane_names
    ]
    kernel = functools.partial(_ragged_kernel, kind, len(plane_names), G)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    bytes_per = sum(int(np.prod(p.shape[1:])) * p.dtype.itemsize for p in plane_vals)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S_pad, N), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tt, tn), lambda i, j, te: (i, j)),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * S_pad * N * K,
            bytes_accessed=(S_pad // tt) * bytes_per + S_pad * (K + N) * 4,
            transcendentals=0,
        ),
        **kwargs,
    )(tile_expert, xs, *(planes[n] for n in plane_names))


def qmm_ragged(xs: jnp.ndarray, tile_expert: jnp.ndarray, qt: QuantTensor,
               tt: int, interpret: bool = False) -> jnp.ndarray:
    """Grouped GEMM over expert-sorted tokens.

    xs [S_pad, K]: rows sorted/padded so token-tile i (rows [i*tt,(i+1)*tt))
    belongs entirely to expert tile_expert[i]. Returns [S_pad, N] f32."""
    n_exp = qt.shape[0]
    N, K = int(np.prod(qt.shape[1:-1])), qt.shape[-1]
    xp = permute_activation(xs, qt)
    tn = pick_tile_n(N, K, qt.kind)
    if tn == 0:
        raise ValueError(f"N={N} not tileable")
    dec, names, gplane = TILE_DECODERS[qt.kind]
    p3 = _planes3(qt)
    G = p3[gplane].shape[-1]
    return _ragged_call(
        xp, jnp.asarray(tile_expert, jnp.int32), tuple(p3[n] for n in names),
        qt.kind, (n_exp, N, K), names, tt, tn, G, interpret,
    )


# ---------------------------------------------------------------------------
# XLA fallback (CPU / unsupported kinds): gather selected experts' planes,
# decode only those rows — never materializes non-selected experts.
# ---------------------------------------------------------------------------


def qmm_gather_xla(x: jnp.ndarray, ids: jnp.ndarray, qt: QuantTensor,
                   dtype=jnp.bfloat16) -> jnp.ndarray:
    from ...quant.planar import decode

    n_exp = qt.shape[0]
    N, K = int(np.prod(qt.shape[1:-1])), qt.shape[-1]
    S = x.shape[0]
    p3 = _planes3(qt)
    sel = {k: jnp.take(v, ids, axis=0).reshape(S * N, v.shape[-1])
           for k, v in p3.items()}
    w = decode(QuantTensor(qt.kind, (S * N, K), sel), dtype=dtype)
    w = w.reshape(S, N, K)
    return jnp.einsum(
        "sk,snk->sn", x.astype(dtype), w, preferred_element_type=jnp.float32
    )


def supports(kind: str) -> bool:
    return kind in TILE_DECODERS
