"""Native int4 (s4) weight loads in Mosaic — Q4-class decode spike.

Today the Q4 kernels unpack 2 nibbles per u8 with mask/shift (~2 extra
VPU ops/element) and feed two half-width dots. If Mosaic can load a
jnp.int4 array and cast it straight to f32, Q4-class decode becomes
load -> cast -> mul at the same streamed bytes, and the kernel needs ONE
full-width dot. Levels store q-8 (signed); the per-group correction dot
absorbs the +8: true = x . ((q-8) st) + xg @ (8*scales - mins)^T.

Stages:
  1. s4 support probe: pallas load + cast + dot on small shapes
  2. standalone A/B at 8B decode shapes vs the production Q4_K kernel

Run: python scripts/exp_s4.py [probe|bench]
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


def probe():
    def kern(x_ref, w_ref, o_ref):
        w = w_ref[...].astype(jnp.float32)
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    K, TN = 512, 256
    rng = np.random.default_rng(0)
    w_i = rng.integers(-8, 8, size=(TN, K))
    x = jnp.asarray(rng.standard_normal((1, K)), jnp.float32)
    try:
        # S4 arrays cannot cross a jit boundary in this jax version
        # (dispatch recursion): pass int8 and convert INSIDE the jit
        @jax.jit
        def run(x, w8):
            w = w8.astype(jnp.int4)
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((1, TN), jnp.float32),
                in_specs=[pl.BlockSpec((1, K), lambda: (0, 0), memory_space=pltpu.VMEM),
                          pl.BlockSpec((TN, K), lambda: (0, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, TN), lambda: (0, 0), memory_space=pltpu.VMEM),
            )(x, w)
        o = np.asarray(run(x, jnp.asarray(w_i, jnp.int8)))
        ref = np.asarray(x) @ w_i.T.astype(np.float32)
        # default MXU precision is bf16 (same as the production kernels):
        # report the relative error, gate only on gross mismatch
        rel = np.abs(o - ref).max() / max(np.abs(ref).max(), 1.0)
        print(f"s4 pallas load+cast+dot: max rel err {rel:.2e} "
              f"(bf16 MXU expected ~1e-3)")
        return rel < 0.02
    except Exception as e:
        print(f"s4 pallas FAIL: {type(e).__name__}: {str(e)[:300]}")
        return False


def _dec_s4_kernel(G, x_ref, qs_ref, sc_ref, corr_ref, o_ref):
    # q-8 s4 levels x f32 group scale + correction dot (qmm semantics)
    st = pltpu.repeat(sc_ref[...], qs_ref.shape[-1] // G, axis=1)
    w = qs_ref[...].astype(jnp.float32) * st
    xf = x_ref[...]
    acc = jax.lax.dot_general(
        xf, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    R = xf.shape[1] // G
    xg = xf[:, :G]
    for r in range(1, R):
        xg = xg + xf[:, r * G:(r + 1) * G]
    acc = acc + jax.lax.dot_general(
        xg, corr_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[...] = acc


def timed_rate(fn, n1=32, n2=160):
    fn(n1); fn(n2)
    t1s, t2s = [], []
    for _ in range(4):
        t0 = time.time(); fn(n1); t1s.append(time.time() - t0)
        t0 = time.time(); fn(n2); t2s.append(time.time() - t0)
    return (min(t2s) - min(t1s)) / (n2 - n1)


def bench(n=28672, k=4096):
    G = k // 32
    tn = 512
    key = jax.random.PRNGKey(0)
    # S4 arrays cannot cross a jit boundary in this jax version (dispatch
    # recursion): pass int8 and convert INSIDE the jit, where the astype
    # is loop-invariant and hoists to one conversion per call — the fori
    # chain then streams the packed s4 buffer.
    qs = jax.random.randint(key, (n, k), -8, 8, jnp.int32).astype(jnp.int8)
    sc = jax.random.uniform(jax.random.fold_in(key, 1), (n, G), jnp.float32,
                            1e-4, 1e-3)
    corr = jax.random.uniform(jax.random.fold_in(key, 2), (n, G), jnp.float32,
                              1e-4, 1e-3)
    jax.block_until_ready(qs)

    @functools.partial(jax.jit, static_argnames=("n_iter",))
    def loop(x, qs8, sc, corr, n_iter):
        qs = qs8.astype(jnp.int4)  # hoisted: converted once per call

        def body(i, x):
            o = pl.pallas_call(
                functools.partial(_dec_s4_kernel, G),
                out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
                grid=(n // tn,),
                in_specs=[
                    pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((tn, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((tn, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((tn, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, tn), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    vmem_limit_bytes=64 * 1024 * 1024),
            )(x, qs, sc, corr)
            return x.at[0, :k].add(jnp.tanh(o[0, :k]) * 1e-20)
        return jax.lax.fori_loop(0, n_iter, body, x).sum()

    x0 = jax.random.normal(key, (1, k), jnp.float32)
    rate = timed_rate(lambda m: float(loop(x0, qs, sc, corr, m)))
    by = n * k // 2 + sc.size * 4 + corr.size * 4
    ideal = by / 819e9
    print(f"s4 Q4-style [{n},{k}]: {by/1e6:8.1f} MB  {rate*1e6:8.1f} us "
          f"(DMA ideal {ideal*1e6:6.1f} us, {ideal/rate*100:5.1f}%)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "probe"
    if which in ("probe", "all"):
        ok = probe()
        if not ok:
            sys.exit(1)
    if which in ("bench", "all"):
        bench()
