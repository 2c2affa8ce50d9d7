"""Measure per-qmm-call overhead and inter-kernel glue cost on chip.

Chained differenced loops (32 vs 160 iterations) over synthetic Q4_K
matvec chains:
  A) 4 calls/iter of [1,4096]x[4096,4096]  (16 MB of weights per call)
  B) 1 call/iter of  [1,4096]x[16384,4096] (same total bytes)
  C) A + rms_norm between calls
  D) A + permute_activation explicit (qmm already permutes; adds 1 extra)
  E) A + residual add + cast between calls

delta(A,B)/3 = per-call overhead; delta(C,A)/4 = per-norm cost, etc.

Run: python scripts/exp_glue.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def make_q4k(key, N, K):
    from llamacog_tpu.quant.planar import QuantTensor

    G = K // 32
    ks = jax.random.split(key, 3)
    planes = {
        "qs": jax.random.randint(ks[0], (N, K // 2), 0, 255, jnp.int32).astype(jnp.uint8),
        "scales": jax.random.uniform(ks[1], (N, G), jnp.float32, 0.001, 0.01),
        "mins": jax.random.uniform(ks[2], (N, G), jnp.float32, 0.0, 0.01),
    }
    return QuantTensor("Q4_K", (N, K), planes)


def main():
    from llamacog_tpu.ops.pallas.qmm import qmm
    from llamacog_tpu.ops.norms import rms_norm

    K = 4096
    key = jax.random.PRNGKey(0)
    w4 = [make_q4k(jax.random.fold_in(key, i), K, K) for i in range(4)]
    w1 = make_q4k(jax.random.fold_in(key, 9), 4 * K, K)
    nw = jnp.ones((K,), jnp.float32)
    jax.block_until_ready(w1.planes["qs"])

    def chain4(x):
        for w in w4:
            x = qmm(x, w)[:, :K].astype(jnp.bfloat16)
        return x

    def chain1(x):
        y = qmm(x, w1)
        return y[:, :K].astype(jnp.bfloat16)

    def chain4_norm(x):
        for w in w4:
            x = rms_norm(qmm(x, w)[:, :K], nw, 1e-5).astype(jnp.bfloat16)
        return x

    def chain4_resid(x):
        r = x
        for w in w4:
            x = (qmm(x, w)[:, :K] + r.astype(jnp.float32)).astype(jnp.bfloat16)
            r = x
        return x

    def timed_loop(fn, name):
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(x, n):
            def body(i, x):
                return fn(x)
            return jax.lax.fori_loop(0, n, body, x)

        x0 = jnp.ones((1, K), jnp.bfloat16)
        jax.block_until_ready(loop(x0, 64))
        jax.block_until_ready(loop(x0, 2048))
        best = 1e9
        for _ in range(3):
            t0 = time.time(); jax.block_until_ready(loop(x0, 64)); ta = time.time() - t0
            t0 = time.time(); jax.block_until_ready(loop(x0, 2048)); tb = time.time() - t0
            best = min(best, (tb - ta) / 1984 * 1e3)
        print(f"{name:14s}: {best:7.3f} ms/iter")
        return best

    a = timed_loop(chain4, "4-call chain")
    b = timed_loop(chain1, "1-call chain")
    c = timed_loop(chain4_norm, "4-call +norm")
    e = timed_loop(chain4_resid, "4-call +resid")
    print(f"\nper-call overhead : {(a - b) / 3 * 1e3:7.1f} us")
    print(f"per-norm cost     : {(c - a) / 4 * 1e3:7.1f} us")
    print(f"per-resid-add cost: {(e - a) / 4 * 1e3:7.1f} us")
    # bandwidth sanity
    gb = 4 * K * K * 0.75 / 1e9
    print(f"chain bytes {gb*1e3:.1f} MB -> 1-call eff BW {gb/(b/1e3):.0f} GB/s")


if __name__ == "__main__":
    main()
