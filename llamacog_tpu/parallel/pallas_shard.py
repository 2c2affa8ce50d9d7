"""shard_map wrappers running the Pallas qmm kernels on weight shards.

Under plain pjit, a pallas_call sees only replicated operands — XLA would
all-gather the sharded weight planes into every device (silent m x memory)
or fail to partition. These wrappers make the TP layout explicit: each
device runs the production kernel on ITS plane shard and the results
combine exactly like the reference's row-split TP (ggml-cuda.cu:768-892):

  row  (N on "model"): x replicated -> local [B, N/m] -> concat on last dim.
  col  (K on "model"): x sharded on the owned decoded columns -> local
       partial [B, N] -> psum over "model" (the mins/offset correction dot
       distributes over column shards, so partial corrections psum too).

The activation is permuted into planar decode order OUTSIDE the map; for
col shards it is viewed as [B, P, K/P] (P = payload slices of the format)
so the last-dim shard picks up exactly the decoded columns the local `qs`
shard expands to.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

try:  # jax>=0.4.35 moved shard_map
    from jax.experimental.shard_map import shard_map
except ImportError:  # pragma: no cover
    from jax.sharding import shard_map

# decoded slices per payload byte-plane for the col-shardable formats
_COL_SLICES = {"Q8_0": 1, "Q4_KS4": 1, "Q4_0": 2, "Q4_1": 2, "Q4_K": 2,
               "Q4_KC": 2,
               "IQ4_NL": 2, "IQ4_XS": 2, "Q2_K": 4}


def supports(qt) -> bool:
    from ..ops.pallas.qmm import TILE_DECODERS

    if qt.kind not in TILE_DECODERS:
        return False
    if qt.pspec == "col" and qt.kind not in _COL_SLICES:
        return False
    return qt.pspec in ("row", "col")


def sharded_qmm(x: jnp.ndarray, qt, mesh) -> jnp.ndarray | None:
    """x [..., K] @ dequant(qt)^T under the recorded TP layout; None when
    the layout/kind cannot run the kernel locally (caller falls back)."""
    from ..ops.pallas.qmm import (TILE_DECODERS, _qmm_call, pick_tile_n,
                                  resolve_plane_names)
    from ..quant.planar import permute_activation

    if not supports(qt):
        return None
    interp = jax.default_backend() != "tpu"
    N, K = int(np.prod(qt.shape[:-1])), qt.shape[-1]
    lead = x.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    m = mesh.shape["model"]
    dec, names, gplane = TILE_DECODERS[qt.kind]
    names = resolve_plane_names(qt.planes, names)
    plane_vals = tuple(qt.planes[n] for n in names)
    xp = permute_activation(x, qt).reshape(B, K)
    # ride the data axis when the flattened batch divides it (decode B=1
    # stays replicated over data)
    nd = mesh.shape.get("data", 1)
    bspec = "data" if nd > 1 and B % nd == 0 else None
    mxu_f32 = B <= 8  # same operand-dtype policy as the unsharded qmm()

    if qt.pspec == "row":
        n_local = N // m
        tn = pick_tile_n(n_local, K, qt.kind, b=B)
        if tn == 0:
            return None

        def local(xl, *planes):
            G = dict(zip(names, planes))[gplane].shape[-1]
            return _qmm_call(xl, planes, qt.kind, (n_local, K), names, tn, G,
                             interp, mxu_f32=mxu_f32)

        out = shard_map(
            local, mesh=mesh,
            # transposed [S, N] planes carry the row dim in dim 1
            in_specs=(P(bspec, None),) + tuple(
                P(None, "model") if n.endswith("T") else P("model", None)
                for n in names),
            out_specs=P(bspec, "model"),
            check_rep=False,
        )(xp, *plane_vals)
        return out.reshape(*lead, N)

    # col
    k_local = K // m
    tn = pick_tile_n(N, k_local, qt.kind, b=B)
    if tn == 0:
        return None
    n_slices = _COL_SLICES[qt.kind]
    x3 = xp.reshape(B, n_slices, K // n_slices)

    def local_col(xl, *planes):
        xl = xl.reshape(xl.shape[0], k_local)
        G = dict(zip(names, planes))[gplane].shape[-1]
        part = _qmm_call(xl, planes, qt.kind, (N, k_local), names, tn, G,
                         interp, mxu_f32=mxu_f32)
        return jax.lax.psum(part, "model")

    # payload planes (qs, or the row-pair-packed qsv) carry K in dim 1 and
    # shard with the activation; scale/min planes stay replicated
    specs = tuple(
        P(None, "model") if n in ("qs", "qsv") else P(None, None)
        for n in names
    )
    out = shard_map(
        local_col, mesh=mesh,
        in_specs=(P(bspec, None, "model"),) + specs,
        out_specs=P(bspec, None),
        check_rep=False,
    )(x3, *plane_vals)
    return out.reshape(*lead, N)


def sharded_qmm_gather(x, ids, qt, mesh):
    """Expert-parallel qmm_gather: planes hold n_exp/m whole experts per
    device; every device runs the gather kernel for all S rows against its
    local experts (rows owned elsewhere are masked to zero) and the results
    psum — the EP analog of mul_mat_id over a sharded expert axis."""
    from ..ops.pallas.qmm_id import _gather_call
    from ..ops.pallas.qmm import TILE_DECODERS, pick_tile_n

    if qt.pspec != "expert" or qt.kind not in TILE_DECODERS:
        return None
    from ..quant.planar import permute_activation

    interp = jax.default_backend() != "tpu"
    n_exp = qt.shape[0]
    N, K = int(np.prod(qt.shape[1:-1])), qt.shape[-1]
    m = mesh.shape["model"]
    n_local = n_exp // m
    tn = pick_tile_n(N, K, qt.kind)
    if tn == 0:
        return None
    dec, names, gplane = TILE_DECODERS[qt.kind]
    # FLAT planes [n_exp*N, cols] (the gather kernel's layout): a "model"
    # row-split lands whole experts per device since m | n_exp
    flat = {k: v.reshape(n_exp * N, v.shape[-1]) for k, v in qt.planes.items()}
    G = flat[gplane].shape[-1]
    x = permute_activation(x, qt).astype(jnp.float32)

    def local(xl, ids_g, *planes):
        d = jax.lax.axis_index("model")
        lids = ids_g - d * n_local
        inside = (lids >= 0) & (lids < n_local)
        cl = jnp.clip(lids, 0, n_local - 1).astype(jnp.int32)
        out = _gather_call(xl, cl, planes, qt.kind, (n_local, N, K), names,
                           tn, G, interp)
        return jax.lax.psum(jnp.where(inside[:, None], out, 0.0), "model")

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None), P(None)) + tuple(P("model", None) for _ in names),
        out_specs=P(None, None),
        check_rep=False,
    )(x, jnp.asarray(ids, jnp.int32), *(flat[n] for n in names))


def sharded_qmm_ragged(xs, tile_expert, qt, tt, mesh):
    """Expert-parallel grouped GEMM: like sharded_qmm_gather but per token
    tile; non-local tiles compute masked zeros and psum."""
    from ..ops.pallas.qmm_id import _planes3, _ragged_call
    from ..ops.pallas.qmm import TILE_DECODERS, pick_tile_n

    if qt.pspec != "expert" or qt.kind not in TILE_DECODERS:
        return None
    interp = jax.default_backend() != "tpu"
    n_exp = qt.shape[0]
    N, K = int(np.prod(qt.shape[1:-1])), qt.shape[-1]
    m = mesh.shape["model"]
    n_local = n_exp // m
    tn = pick_tile_n(N, K, qt.kind)
    if tn == 0:
        return None
    from ..quant.planar import permute_activation

    dec, names, gplane = TILE_DECODERS[qt.kind]
    p3 = _planes3(qt)
    G = p3[gplane].shape[-1]
    S_pad = xs.shape[0]
    xs = permute_activation(xs, qt)  # kernels take strided-col activations

    def local(xl, te_g, *planes):
        d = jax.lax.axis_index("model")
        lte = te_g - d * n_local
        inside = (lte >= 0) & (lte < n_local)
        cl = jnp.clip(lte, 0, n_local - 1).astype(jnp.int32)
        out = _ragged_call(xl, cl, planes, qt.kind, (n_local, N, K), names,
                           tt, tn, G, interp)
        rows_in = jnp.repeat(inside, tt, total_repeat_length=S_pad)
        return jax.lax.psum(jnp.where(rows_in[:, None], out, 0.0), "model")

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None), P(None)) + tuple(P("model", None, None) for _ in names),
        out_specs=P(None, None),
        check_rep=False,
    )(xs, jnp.asarray(tile_expert, jnp.int32), *(p3[n] for n in names))
