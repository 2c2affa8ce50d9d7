"""On-chip A/B of compact scale-plane layouts at 8B decode shapes (round 4).

The judge pinned the gate denominator at 6.03 GB/step; the only way to
raise vs_baseline now is to make the NUMERATOR faster, and the biggest
remaining byte block is the f32 scale/min planes (Q4_K streams 6.0
effective bits/weight vs its 4.5-bit wire format; Q6_K int8 streams 10
vs 6.56). Round 2 measured two compact variants SLOWER on the old
kernel; this re-runs the trade on today's kernel (qmatmul_multi, int8
Q6_K, f32-MXU matvec operands) as standalone matvecs:

  q4k_f32     production: scales f32 [N,G] + mins f32 [N,G]   (6.0 b/w)
  q4k_c       compact: d f16 [N,G], sc u8 [N,G], dmin f16, m u8 (5.5 b/w)
  q6k_i8      production: int8 levels + scales f32 [N,G]      (10.0 b/w)
  q6k_c       compact: int8 levels + d f16 [N,G] + sc i8 [N,G] (9.5 b/w)
  q6k_packed  round-2 layout: 4+2-bit packed + f32 scales      (8.5 b/w)
  q6k_int8mxu int8-MXU spike (VERDICT r3 #2): per-group activation
              quant to i8, per-group integer dots via a G-batched
              dot_general, then one [1,G]x[G,TN] f32 combine — the
              scheme ggml-cpu.c:1254-1289 uses on CPU SIMD.

Shapes: ffn_gate_up [28672,4096] (Q4_K), LM head [128256,4096] (Q6_K).
Timing: chained dependent calls inside one jit, differenced (n2-n1) so
dispatch RTT and loop overhead cancel.

Run: python scripts/exp_scales_layout.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from llamacog_tpu.ops.pallas import qmm as Q
from llamacog_tpu.quant.planar import QuantTensor


# ---------------------------------------------------------------------------
# extra decoders (registered into TILE_DECODERS under spike-only kind names)
# ---------------------------------------------------------------------------


def _f(a):  # Mosaic has no direct u8->f32 cast; go via i32
    if a.dtype in (jnp.uint8, jnp.int8):
        return a.astype(jnp.int32).astype(jnp.float32)
    return a.astype(jnp.float32)


# Superblock-compact scale planes: f32 d per SUPERBLOCK [TN, S] + u8/i8
# sub-scale per group [TN, G], with groups strided over superblocks so one
# pltpu.repeat tiles d to group width (col j -> d[j mod S]). Exact: the f32
# multiply d*sc is exactly what the f32 plane stores today. Bytes per
# weight (K=4096): Q4_K scales+mins 2.0 -> 0.75 b/w; Q6_K scales 2 -> 0.625.


def _dec_q4k_sb(p):
    G = p["sc"].shape[-1]
    S = p["d"].shape[-1]
    sc = Q._rep(p["d"], G // S) * _f(p["sc"])
    mn = Q._rep(p["dmin"], G // S) * _f(p["m"])
    st = Q._rep_to(sc, p["qs"].shape[-1])
    return [Q._wm(v, st) for v in Q._nib(p["qs"])], mn


def _dec_q6k_sb(p):
    G = p["sc"].shape[-1]
    S = p["d"].shape[-1]
    sc = Q._rep(p["d"], G // S) * _f(p["sc"])
    return [Q._wm(p["qs"], Q._rep_to(sc, p["qs"].shape[-1]))], None


def _dec_q6k_packed(p):  # round-2 production decoder (git a50ac56)
    st = Q._rep_to(p["scales"], p["qs"].shape[-1])
    hb = Q._crumbs(p["qh"])
    lo, hi = Q._nib(p["qs"])
    parts = [
        Q._wm(lo | (jnp.concatenate(hb[0:2], axis=-1) << 4), st),
        Q._wm(hi | (jnp.concatenate(hb[2:4], axis=-1) << 4), st),
    ]
    return parts, 32.0 * Q._f32(p["scales"])


def _dec_q6k_packed_sb(p):  # packed payload + superblock-compact scales
    G = p["sc"].shape[-1]
    S = p["d"].shape[-1]
    st_g = Q._rep(p["d"], G // S) * _f(p["sc"])
    st = Q._rep_to(st_g, p["qs"].shape[-1])
    hb = Q._crumbs(p["qh"])
    lo, hi = Q._nib(p["qs"])
    parts = [
        Q._wm(lo | (jnp.concatenate(hb[0:2], axis=-1) << 4), st),
        Q._wm(hi | (jnp.concatenate(hb[2:4], axis=-1) << 4), st),
    ]
    return parts, 32.0 * st_g


def _dec_q4k_m2(p):
    # f32 per-group scales (production) + compact MINS only
    G = p["m"].shape[-1]
    S = p["dmin"].shape[-1]
    mn = Q._rep(p["dmin"], G // S) * _f(p["m"])
    st = Q._rep_to(p["scales"], p["qs"].shape[-1])
    return [Q._wm(v, st) for v in Q._nib(p["qs"])], mn


def _dec_q4k_sc2(p):
    # compact SCALES only + f32 per-group mins (production)
    G = p["sc"].shape[-1]
    S = p["d"].shape[-1]
    sc = Q._rep(p["d"], G // S) * _f(p["sc"])
    st = Q._rep_to(sc, p["qs"].shape[-1])
    return [Q._wm(v, st) for v in Q._nib(p["qs"])], Q._f32(p["mins"])


def _dec_q4k_sb2(p):
    # merged superblock plane: ddm [TN, 2S] holds d | dmin side by side —
    # ONE operand DMA instead of two 16-lane ones
    G = p["sc"].shape[-1]
    S = p["ddm"].shape[-1] // 2
    ddm = Q._f32(p["ddm"])
    sc = Q._rep(ddm[:, :S], G // S) * _f(p["sc"])
    mn = Q._rep(ddm[:, S:], G // S) * _f(p["m"])
    st = Q._rep_to(sc, p["qs"].shape[-1])
    return [Q._wm(v, st) for v in Q._nib(p["qs"])], mn


Q.TILE_DECODERS["Q4KSB"] = (_dec_q4k_sb, ("qs", "d", "sc", "dmin", "m"), "sc")
Q.TILE_DECODERS["Q4KSB2"] = (_dec_q4k_sb2, ("qs", "ddm", "sc", "m"), "sc")
Q.TILE_DECODERS["Q4KM2"] = (_dec_q4k_m2, ("qs", "scales", "dmin", "m"), "scales")
Q.TILE_DECODERS["Q4KSC2"] = (_dec_q4k_sc2, ("qs", "d", "sc", "mins"), "sc")
Q.TILE_DECODERS["Q6KSB"] = (_dec_q6k_sb, ("qs", "d", "sc"), "sc")
Q.TILE_DECODERS["Q6KP"] = (_dec_q6k_packed, ("qs", "qh", "scales"), "scales")
Q.TILE_DECODERS["Q6KPSB"] = (_dec_q6k_packed_sb, ("qs", "qh", "d", "sc"), "sc")


def make_qt(key, kind, n, k):
    ks = jax.random.split(key, 8)

    def u8(i, cols, hi=255, dt=jnp.uint8):
        return jax.random.randint(ks[i], (n, cols), 0, hi, jnp.int32).astype(dt)

    def f32s(i, cols):
        return jax.random.uniform(ks[i], (n, cols), jnp.float32, 1e-4, 1e-3)

    G32, G16, S = k // 32, k // 16, k // 256
    if kind == "Q4_K":  # NOTE: production Q4_K switched to the Q4KM2 layout
        # (dmin_sb + m) after round 4; this spike entry keeps the OLD f32
        # mins plane to preserve the A/B against the historical layout
        p = {"qs": u8(0, k // 2), "scales": f32s(1, G32), "mins": f32s(2, G32)}
        from llamacog_tpu.ops.pallas import qmm as _Q

        def _dec_q4k_old(pp):
            st = _Q._rep_to(pp["scales"], pp["qs"].shape[-1])
            return ([_Q._wm(v, st) for v in _Q._nib(pp["qs"])],
                    _Q._f32(pp["mins"]))

        _Q.TILE_DECODERS.setdefault(
            "Q4KOLD", (_dec_q4k_old, ("qs", "scales", "mins"), "scales"))
        _Q.KIND_BITS.setdefault("Q4KOLD", 6.0)
        return QuantTensor("Q4KOLD", (n, k), p)
    elif kind == "Q4KSB":
        p = {"qs": u8(0, k // 2), "d": f32s(1, S), "sc": u8(2, G32, 64),
             "dmin": f32s(3, S), "m": u8(4, G32, 64)}
    elif kind == "Q4KSB2":
        p = {"qs": u8(0, k // 2), "ddm": f32s(1, 2 * S), "sc": u8(2, G32, 64),
             "m": u8(4, G32, 64)}
    elif kind == "Q4KM2":
        p = {"qs": u8(0, k // 2), "scales": f32s(1, G32),
             "dmin": f32s(3, S), "m": u8(4, G32, 64)}
    elif kind == "Q4KSC2":
        p = {"qs": u8(0, k // 2), "d": f32s(1, S), "sc": u8(2, G32, 64),
             "mins": f32s(3, G32)}
    elif kind == "Q6_K":  # historical layout (premultiplied f32 plane);
        # production Q6_K switched to the Q6KSB layout after round 4
        p = {"qs": u8(0, k, 127, jnp.int8), "scales": f32s(1, G16)}
        from llamacog_tpu.ops.pallas import qmm as _Q

        _Q.TILE_DECODERS.setdefault(
            "Q6KOLD",
            (functools.partial(_Q._dec_i8, "scales"), ("qs", "scales"),
             "scales"))
        _Q.KIND_BITS.setdefault("Q6KOLD", 10.0)
        return QuantTensor("Q6KOLD", (n, k), p)
    elif kind == "Q6KSB":
        p = {"qs": u8(0, k, 127, jnp.int8), "d": f32s(1, S),
             "sc": u8(2, G16, 127, jnp.int8)}
    elif kind == "Q6KP":
        p = {"qs": u8(0, k // 2), "qh": u8(1, k // 4), "scales": f32s(2, G16)}
    elif kind == "Q6KPSB":
        p = {"qs": u8(0, k // 2), "qh": u8(1, k // 4), "d": f32s(2, S),
             "sc": u8(3, G16, 127, jnp.int8)}
    else:
        raise ValueError(kind)
    return QuantTensor(kind, (n, k), p)


def qt_bytes(qt):
    return sum(int(np.prod(p.shape)) * p.dtype.itemsize for p in qt.planes.values())


def timed_rate(fn, n1=128, n2=1152):
    # difference of per-config MINIMUMS: min(t) is the clean-RTT run for
    # each n, so the subtraction cancels dispatch cost without letting the
    # tunnel's ±10-30 ms jitter leak in (min over noisy DIFFS picks the
    # most negative outlier — measured that trap in the first version).
    # fn must return a host float: on the tunneled backend
    # block_until_ready returns BEFORE the device finishes (measured: a
    # 1152-iter chain "completed" in 0.1 ms); only a value fetch syncs.
    fn(n1); fn(n2)  # compile both
    t1s, t2s = [], []
    for _ in range(4):
        t0 = time.time(); fn(n1); t1s.append(time.time() - t0)
        t0 = time.time(); fn(n2); t2s.append(time.time() - t0)
    return (min(t2s) - min(t1s)) / (n2 - n1)


def bench_kind(kind, n, k, label):
    qt = make_qt(jax.random.PRNGKey(hash(kind) % 9973), kind, n, k)
    kind = qt.kind  # make_qt may remap (e.g. Q4_K -> Q4KOLD historical A/B)
    jax.block_until_ready(qt.planes["qs"])
    x0 = jax.random.normal(jax.random.PRNGKey(7), (1, k), jnp.float32)
    tn = Q.pick_tile_n(n, k, kind)
    dec, names, gplane = Q.TILE_DECODERS[kind]
    names = Q.resolve_plane_names(qt.planes, names)
    G = qt.planes[gplane].shape[1]
    planes = tuple(qt.planes[nm] for nm in names)

    @functools.partial(jax.jit, static_argnames=("n_iter",))
    def loop(x, pl_vals, n_iter):
        def body(i, x):
            o = Q._qmm_call(x, pl_vals, kind, (n, k), names, tn, G,
                            mxu_f32=True)
            # dependency: fold a data-dependent scalar back into x so the
            # chained calls can't be CSE'd or folded away
            m = min(n, k)
            return x.at[0, :m].add(jnp.tanh(o[0, :m]) * 1e-20)

        return jax.lax.fori_loop(0, n_iter, body, x).sum()

    rate = timed_rate(lambda m: float(loop(x0, planes, m)))
    by = qt_bytes(qt)
    ideal = by / 819e9
    print(f"{label:14s} {kind:6s} {by/1e6:8.1f} MB  {rate*1e6:8.1f} us "
          f"(DMA ideal {ideal*1e6:6.1f} us, {ideal/rate*100:5.1f}%)")
    return rate


# ---------------------------------------------------------------------------
# int8-MXU matvec spike: per-group activation quantization + per-group
# integer dots. Weights: int8 levels + f32 scales (Q6_K-int8-like layout).
# ---------------------------------------------------------------------------


def _int8mxu_kernel(G, x_ref, xs_ref, qs_ref, sc_ref, out_ref):
    # x quantized OUTSIDE (per-group i8 + [1, G] scales) — the kernel does
    # per-group int dots: reshape both sides to (G, 32) and batch over G.
    TN = qs_ref.shape[0]
    K = qs_ref.shape[1]
    R = K // G
    xq = x_ref[...]  # [1, K] int8 (strided group order: col c group c%G)
    # per-group partial dots via R slice-dots accumulated per group:
    # P[n, g] = sum_r w[n, g + r*G] * x[g + r*G]
    acc = jnp.zeros((1, TN), jnp.float32)
    w = qs_ref[...]
    sc = sc_ref[...]
    xs = xs_ref[...]
    # combine weighted per-group dots: out = sum_g xs[g]*sc[n,g]*P[n,g].
    # P as an [TN, G] f32 intermediate, computed with integer mul-adds on
    # the VPU (the MXU cannot emit per-group partials from one dot).
    p = jnp.zeros((TN, G), jnp.float32)
    for r in range(R):
        wi = w[:, r * G:(r + 1) * G].astype(jnp.float32)
        xi = xq[:, r * G:(r + 1) * G].astype(jnp.float32)
        p = p + wi * xi
    acc = jax.lax.dot_general(
        xs, p * sc, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[...] = acc


def bench_int8mxu(n, k):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = k // 16
    key = jax.random.PRNGKey(3)
    qs = jax.random.randint(key, (n, k), -127, 127, jnp.int32).astype(jnp.int8)
    sc = jax.random.uniform(jax.random.fold_in(key, 1), (n, G), jnp.float32,
                            1e-4, 1e-3)
    tn = 1024
    jax.block_until_ready(qs)

    @functools.partial(jax.jit, static_argnames=("n_iter",))
    def loop(x, qs, sc, n_iter):
        def quant_x(xf):  # per-group symmetric i8 quant on [1, K]
            xg = xf.reshape(1, k // G, G)
            m = jnp.max(jnp.abs(xg), axis=1)  # [1, G] over the strided reps
            s = m / 127.0
            xq = jnp.clip(jnp.round(xf / jnp.tile(s, (1, k // G))), -127, 127
                          ).astype(jnp.int8)
            return xq, s

        def body(i, x):
            xq, xs = quant_x(x)
            o = pl.pallas_call(
                functools.partial(_int8mxu_kernel, G),
                out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
                grid=(n // tn,),
                in_specs=[
                    pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((tn, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((tn, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, tn), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    vmem_limit_bytes=96 * 1024 * 1024),
            )(xq, xs, qs, sc)
            return x + jnp.tanh(o[0, :k]) * 1e-20

        return jax.lax.fori_loop(0, n_iter, body, x).sum()

    x0 = jax.random.normal(key, (1, k), jnp.float32)
    rate = timed_rate(lambda m: float(loop(x0, qs, sc, m)), 32, 160)
    by = qs.size + sc.size * 4
    ideal = by / 819e9
    print(f"{'int8-MXU spike':14s} {'I8MXU':6s} {by/1e6:8.1f} MB  "
          f"{rate*1e6:8.1f} us (DMA ideal {ideal*1e6:6.1f} us, "
          f"{ideal/rate*100:5.1f}%)")


def main():
    assert jax.default_backend() == "tpu", "run on the chip"
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "r1"):
        print("== ffn_gate_up shape [28672, 4096], B=1 matvec ==")
        bench_kind("Q4_K", 28672, 4096, "production")
        bench_kind("Q4KSB", 28672, 4096, "sb-compact")
        print("== LM head shape [128256, 4096], B=1 matvec ==")
        bench_kind("Q6_K", 128256, 4096, "production")
        bench_kind("Q6KSB", 128256, 4096, "sb-compact")
        bench_kind("Q6KP", 128256, 4096, "r2 packed")
        bench_kind("Q6KPSB", 128256, 4096, "packed+sb")
        print("== int8-MXU activation-quant spike, head shape ==")
        bench_int8mxu(128256, 4096)
    if which in ("all", "r2"):
        print("== round 2: isolate the Q4_K sb-compact cost, ffn shape ==")
        bench_kind("Q4KM2", 28672, 4096, "mins-only-sb")
        bench_kind("Q4KSC2", 28672, 4096, "scales-only-sb")
        print("== round 2: Q6_K sb-compact at the other Q6 shapes ==")
        bench_kind("Q6_K", 4096, 14336, "prod dn")
        bench_kind("Q6KSB", 4096, 14336, "sb dn")
        bench_kind("Q6_K", 1024, 4096, "prod v")
        bench_kind("Q6KSB", 1024, 4096, "sb v")
    if which in ("all", "r3"):
        print("== round 3: merged ddm plane + Q4KSB re-check, ffn shape ==")
        bench_kind("Q4KSB2", 28672, 4096, "merged-ddm")
        bench_kind("Q4KSB", 28672, 4096, "sb-compact")
        bench_kind("Q4_K", 28672, 4096, "production")
        print("== round 3: Q4_K variants at attn_qk shape [5120, 4096] ==")
        bench_kind("Q4_K", 5120, 4096, "production")
        bench_kind("Q4KSB2", 5120, 4096, "merged-ddm")
        print("== round 3: Q4_K variants at wo shape [4096, 4096] ==")
        bench_kind("Q4_K", 4096, 4096, "production")
        bench_kind("Q4KSB2", 4096, 4096, "merged-ddm")
    if which in ("all", "r4"):
        print("== round 4: mins-only-sb (the Q4_K winner) at every shape ==")
        bench_kind("Q4_K", 28672, 4096, "prod gu")
        bench_kind("Q4KM2", 28672, 4096, "m2 gu")
        bench_kind("Q4_K", 5120, 4096, "prod qk")
        bench_kind("Q4KM2", 5120, 4096, "m2 qk")
        bench_kind("Q4_K", 4096, 4096, "prod wo")
        bench_kind("Q4KM2", 4096, 4096, "m2 wo")
        bench_kind("Q4_K", 4096, 14336, "prod dn")
        bench_kind("Q4KM2", 4096, 14336, "m2 dn")


if __name__ == "__main__":
    main()
