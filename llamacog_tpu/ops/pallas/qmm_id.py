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


def _decode_block(kind, refs, n_planes, flat=False):
    names = TILE_DECODERS[kind][1]
    if flat:
        planes = {name: refs[i][...] for i, name in enumerate(names)}
    else:
        planes = {name: refs[i][0] for i, name in enumerate(names)}
    return TILE_DECODERS[kind][0](planes)


def _body(kind, G, x, xf, parts, corr):
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
    return acc


def _gather_kernel(kind, n_planes, G, ids_ref, x_ref, *refs):
    # grid (N/tn, S): x and out stay full-array blocks (Mosaic requires
    # block rows divisible by 8 OR equal to the array dim — a (1, K) row
    # block is illegal); the kernel slices its row via the grid index
    out_ref = refs[n_planes]
    parts, corr = _decode_block(kind, refs, n_planes, flat=True)
    sidx = pl.program_id(0)
    xf = x_ref[pl.ds(sidx, 1), :]  # [1, K] strided cols (permuted outside)
    acc = _body(kind, G, xf.astype(jnp.bfloat16), xf, parts, corr)
    out_ref[pl.ds(sidx, 1), :] = acc


@functools.partial(jax.jit, static_argnames=("kind", "shape", "plane_names", "tn", "G", "interpret"))
def _gather_call(x, ids, plane_vals, kind, shape, plane_names, tn, G, interpret=False):
    n_exp, N, K = shape
    S = x.shape[0]
    planes = dict(zip(plane_names, plane_vals))
    grid = (S, N // tn)  # s outer: the inner j sweep streams ONE expert's
    # tiles sequentially — the same pipelined access pattern as qmm — while
    # x/out stay full-array blocks (Mosaic block-shape legality) indexed by
    # the grid row inside the kernel. Planes are indexed FLAT
    # ([n_exp*N, cols] with row-block ids[s]*(N/tn)+j) so the DMA geometry
    # is exactly the production qmm's 2-D tile stream.
    nb = N // tn
    in_specs = [
        pl.BlockSpec((S, K), lambda s, j, ids: (0, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(
            (tn, planes[name].shape[-1]),
            lambda s, j, ids, _n=name: (ids[s] * nb + j, 0),
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
            out_specs=pl.BlockSpec((S, tn), lambda s, j, ids: (0, j)),
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
    # f32 rows: the kernel's dynamic per-row slice needs sublane-1 dtype
    # granularity (bf16 packs 2 rows/sublane, which Mosaic can't index
    # dynamically by odd offsets)
    xp = permute_activation(x, qt).astype(jnp.float32)
    tn = pick_tile_n(N, K, qt.kind)
    if tn == 0:
        raise ValueError(f"N={N} not tileable")
    dec, names, gplane = TILE_DECODERS[qt.kind]
    flat = {k: v.reshape(n_exp * N, v.shape[-1]) for k, v in qt.planes.items()}
    G = flat[gplane].shape[-1]
    return _gather_call(
        xp, jnp.asarray(ids, jnp.int32), tuple(flat[n] for n in names),
        qt.kind, (n_exp, N, K), names, tn, G, interpret,
    )


def _ragged_kernel(kind, n_planes, G, te_ref, x_ref, *refs):
    out_ref = refs[n_planes]
    parts, corr = _decode_block(kind, refs, n_planes)
    xf = x_ref[...]  # [tt, K] strided cols (permuted outside; see qmm.py)
    out_ref[...] = _body(kind, G, xf.astype(jnp.bfloat16), xf, parts, corr)


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


def _offset_kernel(kind, n_planes, G, mxu_f32, eid_ref, x_ref, *refs):
    """Production-qmm body with a scalar-prefetched expert base offset: the
    1-D j grid streams ONE expert's weight tiles exactly like qmm's matvec
    grid (its proven ~600-700 GB/s DMA pipeline), the only difference being
    the dynamic row-block base eid*nb in the index maps."""
    out_ref = refs[n_planes]
    parts, corr = _decode_block(kind, refs, n_planes, flat=True)
    xf = x_ref[...]
    x = xf if mxu_f32 else xf.astype(jnp.bfloat16)
    acc = _body(kind, G, x, xf, parts, corr)
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=(
    "kind", "shape", "plane_names", "tn", "G", "mxu_f32", "interpret"))
def _offset_call(x, eid, plane_vals, kind, shape, plane_names, tn, G,
                 mxu_f32=False, interpret=False):
    n_exp, N, K = shape
    B = x.shape[0]
    planes = dict(zip(plane_names, plane_vals))
    nb = N // tn
    in_specs = [
        pl.BlockSpec((B, K), lambda j, eid: (0, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(
            (tn, planes[name].shape[-1]),
            lambda j, eid, _n=name: (eid[0] * nb + j, 0),
            memory_space=pltpu.VMEM,
        )
        for name in plane_names
    ]
    kernel = functools.partial(_offset_kernel, kind, len(plane_names), G, mxu_f32)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    bytes_per = sum(int(np.prod(p.shape[1:])) * p.dtype.itemsize for p in plane_vals)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((B, tn), lambda j, eid: (0, j)),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K,
            bytes_accessed=bytes_per + B * K * 4 + B * N * 4,
            transcendentals=0,
        ),
        **kwargs,
    )(eid, x, *(planes[n] for n in plane_names))


def qmm_gather_offset(x: jnp.ndarray, ids: jnp.ndarray, qt: QuantTensor,
                      interpret: bool = False) -> jnp.ndarray:
    """Few-row mul_mat_id as per-row offset-qmm calls (one 1-D-grid kernel
    per (token,slot) row). Same contract as qmm_gather."""
    n_exp = qt.shape[0]
    N, K = int(np.prod(qt.shape[1:-1])), qt.shape[-1]
    xp = permute_activation(x, qt).astype(jnp.float32)
    tn = pick_tile_n(N, K, qt.kind)
    if tn == 0:
        raise ValueError(f"N={N} not tileable")
    dec, names, gplane = TILE_DECODERS[qt.kind]
    flat = {k: v.reshape(n_exp * N, v.shape[-1]) for k, v in qt.planes.items()}
    G = flat[gplane].shape[-1]
    ids = jnp.asarray(ids, jnp.int32)
    outs = [
        _offset_call(
            xp[s : s + 1], ids[s : s + 1], tuple(flat[n] for n in names),
            qt.kind, (n_exp, N, K), names, tn, G, True, interpret,
        )
        for s in range(x.shape[0])
    ]
    return jnp.concatenate(outs, axis=0)


# rows <= this use the per-row offset-qmm path instead of the gather kernel
# (0 disables; set after on-chip A/B)
GATHER_OFFSET_MAX = int(__import__("os").environ.get("LLAMACOG_MOE_OFFSET", "0"))


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


def qmm_gather_slice(x: jnp.ndarray, ids: jnp.ndarray, qt: QuantTensor,
                     interpret: bool = False) -> jnp.ndarray:
    """Tiny-S gather variant: XLA dynamic-slices the selected expert's
    planes (one contiguous HBM copy at full DMA rate) and runs the
    production qmm on the copy. Reads 2x the selected bytes (copy + kernel)
    but at qmm's pipelined rate. Measured on v5e at mixtral-8x7B expert
    shapes it LOSES to the gather kernel (30.3 vs 20.8 ms/tok end to end:
    XLA lowers the big strided slice poorly), so it is kept only as an
    alternative; GATHER_SLICE_MAX=0 disables it."""
    from .qmm import qmm

    n_exp = qt.shape[0]
    N, K = int(np.prod(qt.shape[1:-1])), qt.shape[-1]
    outs = []
    for s_i in range(x.shape[0]):
        planes = {
            k: jax.lax.dynamic_index_in_dim(
                v.reshape(n_exp, N, v.shape[-1]), ids[s_i], axis=0,
                keepdims=False,
            )
            for k, v in qt.planes.items()
        }
        sub = QuantTensor(qt.kind, (N, K), planes)
        outs.append(qmm(x[s_i : s_i + 1], sub, interpret=interpret))
    return jnp.concatenate(outs, axis=0)


# 0 = always use the gather kernel (the slice variant measured slower)
GATHER_SLICE_MAX = 0


def supports(kind: str) -> bool:
    return kind in TILE_DECODERS
