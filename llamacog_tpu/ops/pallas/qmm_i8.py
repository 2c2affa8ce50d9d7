"""int8 x int8 -> int32 MXU prefill GEMM over mmq planes.

The compute half of the mmq analog (see quant/mmq.py for the design and
the reference mapping to ggml-cuda/mmq.cu). Weights arrive as "qi8"
int8 [N, K] (natural column order) + "ws8T" f32 [GP, N]; activations are
quantized here per token. Each grid step runs GP = K/MMQ_KB int8 MXU
dots over MMQ_KB-wide column slices and combines the int32 partials
with the weight-block scales ([1, TN] lane broadcasts off the
transposed plane), then folds the per-token activation scale into the
f32 result. Measured on v5e at the 8B gate_up shape: 2.0-2.1x the bf16
kernel rate with the combine fully hidden (scripts/exp_i8_mxu.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _i8_kernel(gp, x_ref, xs_ref, w_ref, ws_ref, o_ref):
    K = x_ref.shape[1]
    kb = K // gp
    acc = None
    for g in range(gp):
        p = jax.lax.dot_general(
            x_ref[:, g * kb:(g + 1) * kb],
            w_ref[:, g * kb:(g + 1) * kb],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        part = p.astype(jnp.float32) * ws_ref[g:g + 1, :]
        acc = part if acc is None else acc + part
    o_ref[...] = acc * xs_ref[:, 0][:, None]


def _pick_tiles(N: int, K: int, B: int) -> tuple[int, int]:
    """(tn, tb): qi8 tile 2 MB-ish double-buffered + int8 x tile."""
    tn = 512
    while N % tn and tn > 128:
        tn //= 2
    if N % tn:
        return 0, 0
    # keep the int8 x tile under ~2 MB (K up to 14336 at the 8B shapes)
    tb = 512 if K <= 4096 else 256
    while B % tb and tb > 32:
        tb //= 2
    return (tn, tb) if B % tb == 0 else (tn, 0)


@functools.partial(jax.jit, static_argnames=("shape", "gp", "tn", "tb",
                                             "interpret"))
def _qmm_i8_call(xq, xs, qi, wsT, shape, gp, tn, tb, interpret=False):
    N, K = shape
    B = xq.shape[0]
    grid = (N // tn, B // tb)
    kernel = functools.partial(_i8_kernel, gp)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, K), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, K), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gp, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tn), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K,
            bytes_accessed=N * K + B * K + gp * N * 4 + B * N * 4,
            transcendentals=0,
        ),
        **kwargs,
    )(xq, xs, qi, wsT)


def supports_i8(qt, B: int) -> bool:
    from ...quant.mmq import MMQ_MIN_B

    return B >= MMQ_MIN_B and "qi8" in qt.planes


def qmm_i8(x: jnp.ndarray, qt, interpret: bool = False) -> jnp.ndarray:
    """x [..., K] @ dequant-int8(qt)[N, K]^T -> [..., N] (f32)."""
    N, K = int(np.prod(qt.shape[:-1])), qt.shape[-1]
    lead = x.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    xf = x.reshape(B, K).astype(jnp.float32)
    xs = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0
    xs = jnp.where(xs == 0, 1.0, xs)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    wsT = qt.planes["ws8T"]
    gp = wsT.shape[0]
    tn, tb = _pick_tiles(N, K, B)
    if tb == 0:  # ragged B: pad rows up to a tileable multiple
        pad = (-B) % 256
        xq = jnp.pad(xq, ((0, pad), (0, 0)))
        xs = jnp.pad(xs, ((0, pad), (0, 0)), constant_values=1.0)
        tn, tb = _pick_tiles(N, K, B + pad)
    out = _qmm_i8_call(xq, xs, qt.planes["qi8"], wsT, (N, K), gp, tn, tb,
                       interpret)
    if out.shape[0] != B:
        out = out[:B]
    return out.reshape(*lead, N)
