"""On-chip A/B of qmm decode-matvec kernel variants at 8B shapes.

Variants (Q4_K):
  v0: production kernel (ops/pallas/qmm.py)
  v1: v0 but f32 MXU operands (skip bf16 cast; MXU is idle at B=1)
  v2: G-wide slicing — scale plane [TN, G] used directly, no pltpu.repeat
  v3: v2 + f32 MXU operands (unpack -> convert -> scale-mul = 3 VPU ops/el)

Run: python scripts/exp_qmm.py [B]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llamacog_tpu.ops.pallas.qmm import pick_tile_n, qmm
from llamacog_tpu.quant.planar import QuantTensor


def rand_q4k(key, n, k):
    ks = jax.random.split(key, 3)
    return QuantTensor("Q4_K", (n, k), {
        "qs": jax.random.randint(ks[0], (n, k // 2), 0, 255, dtype=jnp.int32).astype(jnp.uint8),
        "scales": jax.random.uniform(ks[1], (n, k // 32), jnp.float32, 1e-4, 1e-3),
        "mins": jax.random.uniform(ks[2], (n, k // 32), jnp.float32, 1e-4, 1e-3),
    })


def _kernel_var(variant, G, x_ref, qs_ref, sc_ref, mn_ref, out_ref):
    xf = x_ref[...]
    qs = qs_ref[...]
    sc = sc_ref[...]
    K = xf.shape[1]
    if variant in ("v0", "v1"):
        q = qs.astype(jnp.int32)
        st = pltpu.repeat(sc, (K // 2) // G, axis=1)
        parts = [(q & 0xF).astype(jnp.float32) * st, (q >> 4).astype(jnp.float32) * st]
        if variant == "v0":
            parts = [p.astype(jnp.bfloat16) for p in parts]
            xd = xf.astype(jnp.bfloat16)
        else:
            xd = xf
        acc = None
        Kp = K // 2
        for p, w in enumerate(parts):
            d = jax.lax.dot_general(
                xd[:, p * Kp:(p + 1) * Kp], w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
    else:  # v2 / v3: G-wide slices, scale plane direct
        n_sl = (K // 2) // G
        xd = xf.astype(jnp.bfloat16) if variant == "v2" else xf
        acc = None
        for i in range(n_sl):
            q = qs[:, i * G:(i + 1) * G].astype(jnp.int32)
            for half, shift in ((0, 0), (1, 4)):
                w = ((q >> shift) & 0xF).astype(jnp.float32) * sc
                if variant == "v2":
                    w = w.astype(jnp.bfloat16)
                xsl = xd[:, half * (K // 2) + i * G: half * (K // 2) + (i + 1) * G]
                d = jax.lax.dot_general(
                    xsl, w, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
    # mins correction dot (same in all variants)
    R = K // G
    xg = xf[:, :G]
    for r in range(1, R):
        xg = xg + xf[:, r * G:(r + 1) * G]
    acc = acc - jax.lax.dot_general(
        xg, mn_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("variant", "tn"))
def qmm_var(x, qt, variant, tn):
    N, K = qt.shape
    B = x.shape[0]
    G = K // 32
    grid = (N // tn,)
    return pl.pallas_call(
        functools.partial(_kernel_var, variant, G),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, K // 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K,
            bytes_accessed=N * K // 2 + N * (K // 32) * 8 + B * K * 4 + B * N * 4,
            transcendentals=0),
    )(x, qt.planes["qs"], qt.planes["scales"], qt.planes["mins"])


def timeit(fn, x, reps=3000):
    """On-device chained loop: each rep's input depends on the previous
    output, so no dispatch-level caching/dedup can elide work. The ~30ms
    tunnel round-trip is measured with a null loop and subtracted."""
    K = x.shape[1]

    @jax.jit
    def loop(x0):
        def body(_, xc):
            out = fn(xc)
            w = min(out.shape[1], K)
            return xc.at[:, :w].add(1e-12 * out[:, :w])

        return jax.lax.fori_loop(0, reps, body, x0)

    @jax.jit
    def null_loop(x0):
        return jax.lax.fori_loop(0, reps, lambda _, xc: xc * 1.0000001, x0)

    def best(f):
        f(x).block_until_ready()  # warmup/compile
        ts = []
        for _ in range(3):
            t0 = time.time()
            f(x).block_until_ready()
            ts.append(time.time() - t0)
        return min(ts)  # min-of-3 damps the ~30ms tunnel RTT jitter

    base = best(null_loop)
    return max(best(loop) - base, 1e-9) / reps


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    key = jax.random.PRNGKey(0)
    shapes = [(14336, 4096), (4096, 14336)]  # 8B ffn up / down shapes
    for N, K in shapes:
        qt = rand_q4k(key, N, K)
        x = jax.random.normal(jax.random.fold_in(key, 1), (B, K), jnp.float32)
        payload = qt.nbytes
        tn = pick_tile_n(N, K, "Q4_K")
        print(f"== Q4_K [{N},{K}] B={B} tn={tn} payload {payload/1e6:.1f} MB")
        t_prod = timeit(lambda a: qmm(a, qt), x)
        print(f"  prod : {t_prod*1e6:8.1f} us  {payload/t_prod/1e9:6.1f} GB/s")
        ref = None
        for v in ("v0", "v1", "v2", "v3"):
            try:
                t = timeit(lambda a: qmm_var(a, qt, v, tn), x)
                out = qmm_var(x, qt, v, tn)
                if ref is None:
                    ref = out
                err = float(jnp.abs(out - ref).max() / (jnp.abs(ref).max() + 1e-9))
                print(f"  {v}   : {t*1e6:8.1f} us  {payload/t/1e9:6.1f} GB/s  relerr {err:.1e}")
            except Exception as e:
                print(f"  {v}   : FAIL {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
