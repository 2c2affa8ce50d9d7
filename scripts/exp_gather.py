"""On-chip A/B of the MoE qmm_gather kernel at mixtral decode shapes.

Measures effective HBM bandwidth of expert-gathered matvecs (the decode-path
mul_mat_id) against the plain qmm kernel on the same tile geometry.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_gather.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from llamacog_tpu.ops.pallas.qmm import pick_tile_n, qmm
from llamacog_tpu.ops.pallas.qmm_id import qmm_gather
from llamacog_tpu.quant.planar import QuantTensor


def rand_q4k(key, shape):
    # cheap deterministic fill (tunnel RNG for 0.5 GB takes minutes)
    n = int(np.prod(shape[:-1]))
    k = shape[-1]

    @jax.jit
    def mk():
        r = jnp.arange(n, dtype=jnp.int32)[:, None]
        c2 = jnp.arange(k // 2, dtype=jnp.int32)[None, :]
        cg = jnp.arange(k // 32, dtype=jnp.int32)[None, :]
        qs = ((r * 131 + c2 * 7) % 251).astype(jnp.uint8)
        sc = 1e-4 + 1e-6 * ((r * 17 + cg) % 97).astype(jnp.float32)
        mn = 1e-4 + 1e-6 * ((r * 13 + cg) % 89).astype(jnp.float32)
        return qs, sc, mn

    qs, sc, mn = mk()
    return QuantTensor("Q4_K", shape, {"qs": qs, "scales": sc, "mins": mn})


def timeit(fn, x, qt, reps=300):
    """Chained on-device loop; the QuantTensor is a jit ARGUMENT (closing
    over it would embed 0.5 GB in the tunnel compile payload -> HTTP 413)."""
    @jax.jit
    def loop(x0, q):
        def body(_, xc):
            out = fn(xc, q)
            w = min(out.shape[1], x0.shape[1])
            return xc.at[:, :w].add(1e-12 * out[:, :w])
        return jax.lax.fori_loop(0, reps, body, x0)

    @jax.jit
    def null_loop(x0, q):
        return jax.lax.fori_loop(0, reps, lambda _, xc: xc * 1.0000001, x0)

    def best(f):
        f(x, qt).block_until_ready()
        ts = []
        for _ in range(3):
            t0 = time.time()
            f(x, qt).block_until_ready()
            ts.append(time.time() - t0)
        return min(ts)

    return max(best(loop) - best(null_loop), 1e-9) / reps


def main():
    key = jax.random.PRNGKey(0)
    n_exp, F, E = 8, 14336, 4096
    # fused [gate;up] experts: [n_exp, 2F, E]
    wgu = rand_q4k(key, (n_exp, 2 * F, E))
    per_exp_bytes = sum(
        int(np.prod(p.shape[1:])) * p.dtype.itemsize
        for p in ((v.reshape(n_exp, -1, v.shape[-1]) for v in wgu.planes.values()))
    )
    print(f"per-expert bytes: {per_exp_bytes/1e6:.1f} MB  "
          f"tn={pick_tile_n(2*F, E, 'Q4_K')}")
    for S in (2, 4, 8):
        ids = jnp.arange(S, dtype=jnp.int32) % n_exp  # distinct experts
        x = jax.random.normal(key, (S, E), jnp.float32)
        t = timeit(lambda xc, q: qmm_gather(xc, ids, q), x, wgu)
        gb = S * per_exp_bytes / t / 1e9
        print(f"gather S={S}: {t*1e6:8.1f} us  {gb:7.1f} GB/s")
    # reference: plain qmm on ONE expert-sized matrix [2F, E]
    w1 = rand_q4k(key, (2 * F, E))
    x1 = jax.random.normal(key, (1, E), jnp.float32)
    t = timeit(lambda xc, q: qmm(xc, q), x1, w1)
    print(f"plain qmm [2F,E] B=1: {t*1e6:8.1f} us  "
          f"{per_exp_bytes/t/1e9:7.1f} GB/s")


if __name__ == "__main__":
    main()
