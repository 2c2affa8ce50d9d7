"""Dissect the Q4_KC compact-scales kernel regression (gate_up 121 -> 178
us standalone, scripts/exp_s4_ab.py compact). Variants isolate which part
of the st_g = transpose(d_sbT) expand * u8f(scq) production costs:

  classic  — production Q4_K (premultiplied f32 st plane)
  csc      — production Q4_KC
  nodsb    — st_g = u8f(scq) only (no transpose/expand)
  nomul    — st_g = expand(d_sbT) only (no scq load/convert/multiply)
  scqf32   — scq stored as f32 (isolate the u8->f32 convert)

Run: python scripts/exp_csc_variants.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["LLAMACOG_Q4_S4"] = "0"

import numpy as np

import jax
import jax.numpy as jnp

from llamacog_tpu.ops.pallas import qmm as qmm_mod
from llamacog_tpu.ops.pallas.qmm import (_kq_mins, _nib, _rep_to, _sb_expand,
                                         _sb_plane, _u8f, _wm)
from llamacog_tpu.utils.synthetic import _rand_qt


def timed_rate(fn, n1=32, n2=160):
    fn(n1); fn(n2)
    t1s, t2s = [], []
    for _ in range(4):
        t0 = time.time(); fn(n1); t1s.append(time.time() - t0)
        t0 = time.time(); fn(n2); t2s.append(time.time() - t0)
    return (min(t2s) - min(t1s)) / (n2 - n1)


def make_dec(variant):
    def dec(p):
        G = p["scq"].shape[-1]
        if variant == "csc":
            st_g = _sb_expand(_sb_plane(p, "d_sb"), G) * _u8f(p["scq"])
        elif variant == "nodsb":
            st_g = _u8f(p["scq"]) * 1e-3
        elif variant == "four":
            # scq present, d_sb DROPPED from the plane list entirely
            st_g = _u8f(p["scq"]) * 1e-3
        elif variant == "nomul":
            st_g = _sb_expand(_sb_plane(p, "d_sb"), G)
        elif variant == "scqf32":
            st_g = _sb_expand(_sb_plane(p, "d_sb"), G) * p["scqf"]
        st = _rep_to(st_g, p["qs"].shape[-1])
        return [_wm(v, st) for v in _nib(p["qs"])], _kq_mins(p)
    return dec


def bench(variant, n, k):
    os.environ["LLAMACOG_Q4K_CSC"] = "0" if variant == "classic" else "1"
    key = jax.random.PRNGKey(0)
    qt = _rand_qt(key, "Q4_K", n, k)
    if variant == "scqf32":
        qt.planes["scqf"] = _u8f(qt.planes.pop("scq"))
        qmm_mod.TILE_DECODERS["Q4_KC"] = (
            make_dec(variant), ("qs", "scqf", "d_sb", "dmin_sb", "m"), "scqf")
    elif variant == "four":
        qmm_mod.TILE_DECODERS["Q4_KC"] = (
            make_dec(variant), ("qs", "scq", "dmin_sb", "m"), "scq")
    elif variant != "classic":
        qmm_mod.TILE_DECODERS["Q4_KC"] = (
            make_dec(variant), ("qs", "scq", "d_sb", "dmin_sb", "m"), "scq")

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
        print(f"{variant:8s} [{n},{k}]: FAIL {str(e)[:100]}")
        return
    by = qt.nbytes
    print(f"{variant:8s} [{n:6d},{k:5d}] {qt.kind:7s}: {by/1e6:6.1f} MB "
          f"{rate*1e6:7.1f} us (ideal {by/819e9*1e6:6.1f}, "
          f"{by/819e9/rate*100:5.1f}%)")


if __name__ == "__main__":
    import copy
    orig = dict(qmm_mod.TILE_DECODERS)
    for n, k in [(28672, 4096), (5120, 4096)]:
        for v in ("classic", "csc", "four"):
            qmm_mod.TILE_DECODERS.update(orig)
            bench(v, n, k)
