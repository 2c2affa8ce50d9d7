"""A/B the PRODUCTION qmm kernel: classic Q4_K (u8 mask/shift, dual
half-dots) vs Q4_KS4 (row-pair qsv, in-kernel pltpu.bitcast, one dot)
at the 8B decode shapes, same fori_loop harness as exp_s4.py.

Run: python scripts/exp_s4_ab.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timed_rate(fn, n1=32, n2=160):
    fn(n1); fn(n2)
    t1s, t2s = [], []
    for _ in range(4):
        t0 = time.time(); fn(n1); t1s.append(time.time() - t0)
        t0 = time.time(); fn(n2); t2s.append(time.time() - t0)
    return (min(t2s) - min(t1s)) / (n2 - n1)


def bench(kind_env, n, k, label, base="Q4_K"):
    # kind_env now selects layout flags: "0" classic, "1" s4, "csc" compact
    os.environ["LLAMACOG_Q4_S4"] = "1" if kind_env == "1" else "0"
    os.environ["LLAMACOG_Q4K_CSC"] = "1" if kind_env == "csc" else "0"
    os.environ["LLAMACOG_Q6K_PACK"] = "1" if kind_env == "q6p" else "0"
    # fresh import state is per-process; _rand_qt reads the env at call time
    from llamacog_tpu.utils.synthetic import _rand_qt
    from llamacog_tpu.ops.pallas.qmm import qmm

    key = jax.random.PRNGKey(0)
    qt = _rand_qt(key, base, n, k)

    @functools.partial(jax.jit, static_argnames=("n_iter",))
    def loop(x, qt, n_iter):
        def body(i, x):
            o = qmm(x, qt)
            m = min(n, k)
            return x.at[0, :m].add(jnp.tanh(o[0, :m]) * 1e-20)
        return jax.lax.fori_loop(0, n_iter, body, x).sum()

    x0 = jax.random.normal(key, (1, k), jnp.float32)
    rate = timed_rate(lambda m: float(loop(x0, qt, m)))
    by = qt.nbytes
    ideal = by / 819e9
    print(f"{label:18s} [{n:6d},{k}] kind={qt.kind:7s}: {by/1e6:7.1f} MB "
          f"{rate*1e6:7.1f} us (DMA ideal {ideal*1e6:6.1f} us, "
          f"{ideal/rate*100:5.1f}%)")


if __name__ == "__main__":
    import sys as _sys
    if len(_sys.argv) > 1 and _sys.argv[1] == "tnsweep":
        for tn in ("512", "1024", "2048"):
            os.environ["LLAMACOG_QMM_TN"] = tn
            import importlib
            import llamacog_tpu.ops.pallas.qmm as _q
            importlib.reload(_q)
            for n, k, nm in [(28672, 4096, "gate_up"), (4096, 14336, "down")]:
                bench("0", n, k, f"{nm} cls tn{tn}")
                bench("1", n, k, f"{nm} s4 tn{tn}")
    elif len(_sys.argv) > 1 and _sys.argv[1] == "compact":
        for n, k, nm in [(28672, 4096, "gate_up"), (5120, 4096, "qk"),
                         (4096, 14336, "down")]:
            bench("0", n, k, f"{nm} q4k-classic")
            bench("csc", n, k, f"{nm} q4kc")
        for n, k, nm in [(128256, 4096, "head"), (4096, 14336, "down6"),
                         (1024, 4096, "v")]:
            bench("0", n, k, f"{nm} q6k-classic", base="Q6_K")
            bench("q6p", n, k, f"{nm} q6kp", base="Q6_K")
    else:
        for n, k, nm in [(28672, 4096, "gate_up"), (5120, 4096, "qk"),
                         (4096, 14336, "down")]:
            bench("0", n, k, f"{nm} classic")
            bench("1", n, k, f"{nm} s4-inkernel")
