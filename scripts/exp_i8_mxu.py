"""Micro-probe: does int8 x int8 -> int32 dot_general hit the v5e MXU at
2x the bf16 rate from inside a Pallas kernel, and what do the mmq-style
per-block scale combines cost on the VPU?

Shapes: the 8B gate_up prefill GEMM [B=512] x [28672, 4096]. Kernels:
bf16 dot (the current prefill compute), raw int8 dot (rate ceiling),
int8 + per-1024-block scale combine (the proposed mmq analog, weight
scale plane stored transposed [GP, TN] so the per-block combine is a
2-D [1, TN] broadcast), and int8 + per-row scales (GP=1 floor).
Timing = fori_loop iteration differencing (the repo's timed_rate
pattern) so dispatch/tunnel overhead cancels. Run:
python scripts/exp_i8_mxu.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, K = 512, 28672, 4096
TN = 512


def _bf16_kernel(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _i8_kernel(x_ref, w_ref, o_ref):
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[...] = acc.astype(jnp.float32)


def _i8_scaled_kernel(gp, x_ref, xs_ref, w_ref, ws_ref, o_ref):
    kb = K // gp
    acc = None
    for g in range(gp):
        p = jax.lax.dot_general(
            x_ref[:, g * kb:(g + 1) * kb], w_ref[:, g * kb:(g + 1) * kb],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
        part = p.astype(jnp.float32) * ws_ref[g:g + 1, :]
        acc = part if acc is None else acc + part
    o_ref[...] = acc * xs_ref[:, 0][:, None]


def build(kernel, in_specs, extra_bytes=0):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        grid=(N // TN,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, TN), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def timed(name, call, args):
    """Iterate call inside one jit with a data dependency; diff n2-n1."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(n, x, *rest):
        def body(i, x):
            o = call(x, *rest)
            return x.at[0, 0].add((o[0, 0] * 1e-30).astype(x.dtype))
        return jax.lax.fori_loop(0, n, body, x).sum()

    x0 = args[0]
    float(loop(8, *args)); float(loop(64, *args))
    ts = []
    for _ in range(3):
        t0 = time.time(); float(loop(8, *args)); t1 = time.time()
        float(loop(64, *args)); t2 = time.time()
        ts.append(((t2 - t1) - (t1 - t0)) / 56)
    dt = min(ts)
    macs = B * N * K
    print(f"{name:16s}: {dt*1e6:8.1f} us  {macs/dt/1e12:6.1f} TMAC/s")
    return dt


if __name__ == "__main__":
    key = jax.random.PRNGKey(0)
    xf = jax.random.normal(key, (B, K), jnp.float32)
    wf = jax.random.normal(jax.random.PRNGKey(1), (N, K), jnp.float32) * 0.02

    spec_x = pl.BlockSpec((B, K), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((TN, K), lambda i: (i, 0), memory_space=pltpu.VMEM)

    f_bf = build(_bf16_kernel, [spec_x, spec_w])
    t_bf = timed("bf16", lambda x, w: f_bf(x, w),
                 (xf.astype(jnp.bfloat16), wf.astype(jnp.bfloat16)))

    xi = jnp.clip(jnp.round(xf * 8), -127, 127).astype(jnp.int8)
    wi = jnp.clip(jnp.round(wf * 512), -127, 127).astype(jnp.int8)
    f_i8 = build(_i8_kernel, [spec_x, spec_w])
    o_i8 = jax.jit(f_i8)(xi, wi)
    ref = np.asarray(xi, np.int32) @ np.asarray(wi, np.int32).T
    print("int8 dot exact:", bool((np.asarray(o_i8).astype(np.int64) == ref).all()))
    t_i8 = timed("int8 raw", lambda x, w: f_i8(x, w), (xi, wi))

    xs = jnp.full((B, 1), 1.0 / 8, jnp.float32)
    spec_xs = pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    results = {}
    for gp in (1, 4, 8):
        ws = jnp.full((gp, N), 1.0 / 512, jnp.float32)
        f_s = build(functools.partial(_i8_scaled_kernel, gp),
                    [spec_x, spec_xs, spec_w,
                     pl.BlockSpec((gp, TN), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)])
        o_s = jax.jit(f_s)(xi, xs, wi, ws)
        ref_f = np.asarray(xf) @ np.asarray(wf).T
        err = np.abs(np.asarray(o_s) - ref_f) / (np.abs(ref_f).mean() + 1e-9)
        t_s = timed(f"int8+scales G{gp}",
                    lambda x, s, w, v: f_s(x, s, w, v), (xi, xs, wi, ws))
        results[gp] = t_s
        print(f"   G{gp} mean rel err vs f32: {err.mean():.4f}")
    print(f"speedup vs bf16: raw {t_bf/t_i8:.2f}x, "
          + ", ".join(f"G{g} {t_bf/t:.2f}x" for g, t in results.items()))
