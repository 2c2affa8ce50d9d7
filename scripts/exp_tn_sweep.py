"""Per-shape tile-size (tn) sweep for the decode matvec kernel across the
8B Q4_K_M shapes. Found while A/B-ing s4 (exp_s4_ab.py): gate_up classic
Q4_K at tn1024 measures 93.8 us vs 120.0 at the production tn512 pick —
the tn, not the nibble unpack, is the gate_up bottleneck.

Run: python scripts/exp_tn_sweep.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("LLAMACOG_Q4_S4", "0")

import numpy as np

import jax
import jax.numpy as jnp

from llamacog_tpu.utils.synthetic import _rand_qt
from llamacog_tpu.ops.pallas import qmm as qmm_mod


def timed_rate(fn, n1=32, n2=160):
    fn(n1); fn(n2)
    t1s, t2s = [], []
    for _ in range(4):
        t0 = time.time(); fn(n1); t1s.append(time.time() - t0)
        t0 = time.time(); fn(n2); t2s.append(time.time() - t0)
    return (min(t2s) - min(t1s)) / (n2 - n1)


def bench(kind, n, k, tn, label):
    qmm_mod._TN_OVERRIDE = tn
    key = jax.random.PRNGKey(0)
    qt = _rand_qt(key, kind, n, k)

    @functools.partial(jax.jit, static_argnames=("n_iter",))
    def loop(x, qt, n_iter):
        def body(i, x):
            o = qmm_mod.qmm(x, qt)
            m = min(n, k)
            return x.at[0, :m].add(jnp.tanh(o[0, :m]) * 1e-20)
        return jax.lax.fori_loop(0, n_iter, body, x).sum()

    x0 = jax.random.normal(key, (1, k), jnp.float32)
    try:
        rate = timed_rate(lambda m: float(loop(x0, qt, m)))
    except Exception as e:
        print(f"{label:22s} tn{tn:5d}: FAIL {type(e).__name__} {str(e)[:80]}")
        return None
    finally:
        qmm_mod._TN_OVERRIDE = 0
    by = qt.nbytes
    ideal = by / 819e9
    print(f"{label:22s} tn{tn:5d}: {by/1e6:7.1f} MB {rate*1e6:7.1f} us "
          f"(ideal {ideal*1e6:6.1f} us, {ideal/rate*100:5.1f}%)")
    return rate


SHAPES = [
    ("gate_up", "Q4_K", 28672, 4096),
    ("qk", "Q4_K", 5120, 4096),
    ("wo", "Q4_K", 4096, 4096),
    ("down_q4", "Q4_K", 4096, 14336),
    ("down_q6", "Q6_K", 4096, 14336),
    ("v_q6", "Q6_K", 1024, 4096),
    ("head_q6", "Q6_K", 128256, 4096),
]

# llama-3-70B per-layer geometry (BASELINE config 5): E=8192, FF=28672,
# 64 q heads + 8 kv heads of 128. TP4 row-shards divide N by 4.
SHAPES_70B = [
    ("70b_gate_up", "Q4_K", 57344, 8192),
    ("70b_gate_up_tp4", "Q4_K", 14336, 8192),
    ("70b_qk", "Q4_K", 9216, 8192),
    ("70b_wo", "Q4_K", 8192, 8192),
    ("70b_down_q4", "Q4_K", 8192, 28672),
    ("70b_down_q6", "Q6_K", 8192, 28672),
    ("70b_down_tp4", "Q4_K", 2048, 28672),
]

if __name__ == "__main__":
    shapes = SHAPES_70B if len(sys.argv) > 1 and sys.argv[1] == "70b" else SHAPES
    best = {}
    for nm, kind, n, k in shapes:
        cur = qmm_mod.pick_tile_n(n, k, kind)
        print(f"--- {nm} [{n},{k}] {kind} (production pick tn={cur})")
        for tn in (128, 256, 512, 1024, 2048):
            if n % tn:
                continue
            r = bench(kind, n, k, tn, f"{nm}")
            if r is not None and (nm not in best or r < best[nm][1]):
                best[nm] = (tn, r)
    print("\nbest:", {k: (v[0], round(v[1] * 1e6, 1)) for k, v in best.items()})
