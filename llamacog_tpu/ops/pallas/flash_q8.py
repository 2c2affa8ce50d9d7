"""Flash attention reading quantized KV-cache planes directly (Pallas TPU).

Role of the reference's quantized-KV fattn vec kernels
(ggml-cuda/fattn.cu:133-151; CPU analog ggml-cpu/ops.cpp:7096): K and V stay
packed in HBM and are dequantized per tile in-register, so attention reads
the packed bits instead of the XLA fallback's dequantize-the-whole-cache
round trip (packed read + bf16 write + bf16 read = 3-5x traffic). K and V
kinds are independent (reference -ctk/-ctv, common/arg.cpp:2093-2130):
q8_0 / q4_0 / q4_1 / q5_0 / q5_1 / dense f16/bf16.

The cache stores head-dim elements group-strided (kv_quant_planes):
column c = r*G + g holds element g*32 + r, so per-group planes broadcast
with one pltpu.repeat tile (group = c mod G, in-group index r = c // G —
the 5-bit kinds extract bit r of the int32 high-bit pack the same way).
Q and the current-step K/V are permuted to match and the output is
unpermuted back — O(B*H*D) work outside the kernel.

Cache planes arrive with the trailing (head, width) dims FLATTENED to
[.., S, Hkv*W] (kv_cache.QuantKVCache docstring: the 5-D form drew 8-32x
TPU tile padding and OOM'd at 32k). Kernels slice head h's [S, W] strip
off the lane dim statically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TS = 512  # prefill KV tile length

SUPPORTED_KV_KINDS = ("q8_0", "q4_0", "q4_1", "q5_0", "q5_1", "f16", "bf16")
Q8_KINDS = (("q8_0", "q8_0"),)  # legacy name for the default pair


def _plane_args(kind, tiles):
    """Canonical plane tuple -> (q, s, m, h) for the kind."""
    q = tiles[0]
    s = tiles[1] if len(tiles) > 1 else None
    m = tiles[2] if kind in ("q4_1", "q5_1") else None
    h = tiles[2] if kind == "q5_0" else tiles[3] if kind == "q5_1" else None
    return q, s, m, h


def _deq(kind, gs, tiles):
    """Plane tiles [S, *] (strided order) -> f32 [S, D].

    The 4/5-bit packs put strided column c in the low nibble of byte c and
    column c + D/2 in the high nibble (kv_quant_planes), so the unpack
    concat reproduces the strided order the per-group broadcasts expect."""
    q, s, m, h = _plane_args(kind, tiles)
    if kind in ("f16", "bf16"):
        return q.astype(jnp.float32)
    if kind == "q8_0":
        v = q.astype(jnp.float32)
    else:
        qi = q.astype(jnp.int32)
        v = jnp.concatenate([qi & 0xF, qi >> 4], axis=-1).astype(jnp.float32)
    if h is not None:  # 5th bit: bit (c // G) of the int32 pack at c mod G
        G = h.shape[-1]
        hb = pltpu.repeat(h, gs, axis=1)
        r = jax.lax.broadcasted_iota(jnp.int32, hb.shape, 1) // G
        v = v + 16.0 * ((hb >> r) & 1).astype(jnp.float32)
    if kind == "q4_0":
        v = v - 8.0
    elif kind == "q5_0":
        v = v - 16.0
    out = v * pltpu.repeat(s.astype(jnp.float32), gs, axis=1)
    if m is not None:
        out = out + pltpu.repeat(m.astype(jnp.float32), gs, axis=1)
    return out


def _gs(kind, d, planes, hkv):
    """In-kernel repeat factor for per-group planes (unused for dense)."""
    if kind in ("f16", "bf16"):
        return 1
    return d // (planes[1].shape[-1] // hkv)


def _flat_planes(planes, ndim):
    """Accept either the cache's flat [.., S, Hkv*W] planes (ndim dims) or
    unflattened [.., S, Hkv, W] (dense KVCache stacks, tests): merge the
    trailing two dims. The merge is layout-free (contiguous minor)."""
    return tuple(
        p.reshape(*p.shape[:-2], p.shape[-2] * p.shape[-1])
        if p.ndim == ndim + 1 else p
        for p in planes
    )


def _hslice(tile, h, hkv):
    """Head h's [S, W] strip of a flat [S, Hkv*W] plane tile (static lane
    slice)."""
    W = tile.shape[-1] // hkv
    return tile[..., h * W:(h + 1) * W]


def _decode_kernel(hkv, rep, scale, softcap, window, gsk, gsv,
                   kind_k, kind_v, nk, nv, *refs):
    q_ref = refs[0]
    k_refs = refs[1:1 + nk]
    v_refs = refs[1 + nk:1 + nk + nv]
    kc_ref, vc_ref, len_ref, o_ref = refs[1 + nk + nv:]
    S = k_refs[0].shape[1]
    n = len_ref[pl.program_id(0), 0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    valid = pos < n
    if window > 0:
        valid = valid & (pos > n - window)
    neg = jnp.float32(-1e30)

    for h in range(hkv):
        q_h = q_ref[0, h * rep:(h + 1) * rep, :].astype(jnp.float32)  # [rep, Dk]
        k_h = _deq(kind_k, gsk,
                   tuple(_hslice(r[0, :, :], h, hkv) for r in k_refs))  # [S, Dk]
        s_old = jax.lax.dot_general(
            q_h, k_h, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        kc_h = kc_ref[0, h, :].astype(jnp.float32)
        s_cur = jnp.sum(q_h * kc_h[None, :], axis=-1, keepdims=True) * scale
        if softcap > 0.0:
            s_old = softcap * jnp.tanh(s_old / softcap)
            s_cur = softcap * jnp.tanh(s_cur / softcap)
        s_old = jnp.where(valid, s_old, neg)
        m = jnp.maximum(jnp.max(s_old, axis=-1, keepdims=True), s_cur)
        e_old = jnp.exp(s_old - m)
        e_cur = jnp.exp(s_cur - m)
        denom = jnp.sum(e_old, axis=-1, keepdims=True) + e_cur
        v_h = _deq(kind_v, gsv,
                   tuple(_hslice(r[0, :, :], h, hkv) for r in v_refs))  # [S, Dv]
        out = jax.lax.dot_general(
            e_old, v_h, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = out + e_cur * vc_ref[0, h, :].astype(jnp.float32)[None, :]
        o_ref[0, h * rep:(h + 1) * rep, :] = (out / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "scale", "softcap", "window", "interpret", "kv_cap", "kinds"))
def flash_decode_q8(
    q: jnp.ndarray,  # [B, H, Dk] natural order
    k_planes: tuple,  # each [B, S, Hkv, *] (strided order)
    v_planes: tuple,
    k_cur: jnp.ndarray,  # [B, Hkv, Dk] natural order
    v_cur: jnp.ndarray,
    seq_len: jnp.ndarray,  # [B]
    scale: float,
    softcap: float = 0.0,
    window: int = 0,
    interpret: bool = False,
    kv_cap: int | None = None,  # static prefix bound: blocks beyond it are
    # never DMA'd (the padded-n_kv role)
    kinds: tuple = ("q8_0", "q8_0"),
) -> jnp.ndarray:  # [B, H, Dv] natural order
    from ...runtime.kv_cache import QuantKVCache

    B, H, Dk = q.shape
    k_planes = _flat_planes(k_planes, 3)
    v_planes = _flat_planes(v_planes, 3)
    S, Hkv = k_planes[0].shape[1], k_cur.shape[1]
    if kv_cap is not None and kv_cap < S:
        S = kv_cap
    Dv = v_cur.shape[-1]  # logical (the value plane may be nibble-packed)
    rep = H // Hkv
    kind_k, kind_v = kinds
    gsk = _gs(kind_k, Dk, k_planes, Hkv)
    gsv = _gs(kind_v, Dv, v_planes, Hkv)
    qp = QuantKVCache.kv_permute(q)
    kcp = QuantKVCache.kv_permute(k_cur)
    vcp = QuantKVCache.kv_permute(v_cur)
    kern = functools.partial(_decode_kernel, Hkv, rep, scale, softcap, window,
                             gsk, gsv, kind_k, kind_v,
                             len(k_planes), len(v_planes))
    cache_specs = [
        # block S may be a PREFIX of the stored cache (kv_cap); planes are
        # flat [B, S, Hkv*W]
        pl.BlockSpec((1, S, p.shape[-1]), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM)
        for p in (*k_planes, *v_planes)
    ]
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, H, Dv), q.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Dk), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            *cache_specs,
            pl.BlockSpec((1, Hkv, Dk), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, Dv), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, H, Dv), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        **({} if interpret else {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)}),
    )(qp, *k_planes, *v_planes, kcp, vcp, seq_len.reshape(B, 1))
    return QuantKVCache.kv_unpermute(out)


def _prefill_kernel(rep, T, Dv, scale, softcap, window, s_tiles, gsk, gsv,
                    kind_k, kind_v, nk, nv, *refs):
    q_ref = refs[0]
    k_refs = refs[1:1 + nk]
    v_refs = refs[1 + nk:1 + nk + nv]
    kc_ref, vc_ref, len_ref, o_ref = refs[1 + nk + nv:]
    n = len_ref[pl.program_id(0), 0]
    TR = q_ref.shape[-2]  # q-row tile (see flash_prefill.py)
    r0 = pl.program_id(2) * TR

    q = q_ref[0, 0, :, :].astype(jnp.float32)  # [TR, Dk]
    t_of_row = (r0 + jax.lax.broadcasted_iota(jnp.int32, (TR, 1), 0)) // rep
    pos_q = n + t_of_row

    m_i = jnp.full((TR, 1), -1e30, jnp.float32)
    l_i = jnp.zeros((TR, 1), jnp.float32)
    acc = jnp.zeros((TR, Dv), jnp.float32)

    def s_tile(i, carry):
        m_i, l_i, acc = carry
        k_t = _deq(kind_k, gsk,
                   tuple(r[0, 0, pl.ds(i * TS, TS), :] for r in k_refs))
        v_t = _deq(kind_v, gsv,
                   tuple(r[0, 0, pl.ds(i * TS, TS), :] for r in v_refs))
        s = jax.lax.dot_general(
            q, k_t, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if softcap > 0.0:
            s = softcap * jnp.tanh(s / softcap)
        pos_k = i * TS + jax.lax.broadcasted_iota(jnp.int32, (1, TS), 1)
        ok = pos_k < n
        if window > 0:
            ok = ok & (pos_k > pos_q - window)
        s = jnp.where(ok, s, -1e30)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_t, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc

    m_i, l_i, acc = jax.lax.fori_loop(0, s_tiles, s_tile, (m_i, l_i, acc))

    kc = kc_ref[0, 0, :, :].astype(jnp.float32)  # [T, Dk]
    vc = vc_ref[0, 0, :, :].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, kc, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if softcap > 0.0:
        s = softcap * jnp.tanh(s / softcap)
    t_k = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    ok = t_k <= t_of_row
    if window > 0:
        ok = ok & (t_k > t_of_row - window)
    s = jnp.where(ok, s, -1e30)
    m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_i - m_new)
    p = jnp.exp(s - m_new)
    l_i = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc * alpha + jax.lax.dot_general(
        p, vc, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = acc / jnp.maximum(l_i, 1e-30)
    o_ref[0, 0, :, :] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "scale", "softcap", "window", "interpret", "kv_cap", "kinds"))
def flash_prefill_q8(
    q: jnp.ndarray,  # [B, T, H, Dk] natural order
    k_planes: tuple,  # each [B, S, Hkv, *] (strided order)
    v_planes: tuple,
    k_cur: jnp.ndarray,  # [B, T, Hkv, Dk] natural order
    v_cur: jnp.ndarray,
    seq_len: jnp.ndarray,
    scale: float,
    softcap: float = 0.0,
    window: int = 0,
    interpret: bool = False,
    kv_cap: int | None = None,
    kinds: tuple = ("q8_0", "q8_0"),
) -> jnp.ndarray:  # [B, T, H, Dv]
    from ...runtime.kv_cache import QuantKVCache

    B, T, H, Dk = q.shape
    k_planes = _flat_planes(k_planes, 3)
    v_planes = _flat_planes(v_planes, 3)
    S, Hkv = k_planes[0].shape[1], k_cur.shape[2]
    if kv_cap is not None and kv_cap < S:
        S = kv_cap
    Dv = v_cur.shape[-1]  # logical (the value plane may be nibble-packed)
    rep = H // Hkv
    R = T * rep
    s_tiles = S // TS
    TR = 512 if R % 512 == 0 else R
    kind_k, kind_v = kinds
    gsk = _gs(kind_k, Dk, k_planes, Hkv)
    gsv = _gs(kind_v, Dv, v_planes, Hkv)
    qp = QuantKVCache.kv_permute(q)
    kcp = QuantKVCache.kv_permute(k_cur)
    vcp = QuantKVCache.kv_permute(v_cur)
    qh = qp.reshape(B, T, Hkv, rep, Dk).transpose(0, 2, 1, 3, 4).reshape(B, Hkv, R, Dk)
    # planes arrive flat [B, S, Hkv*W]; the per-(b,h) grid wants [B, Hkv,
    # S, W], so unflatten + transpose at XLA level. This temp is TRANSIENT
    # (per prefill call, not the persistent cache) — the narrow-minor
    # padding the flat cache layout exists to avoid applies to it, which
    # is acceptable for a chunked-prefill working buffer
    kvh = [p[:, :S].reshape(B, S, Hkv, p.shape[-1] // Hkv)
           .transpose(0, 2, 1, 3) for p in (*k_planes, *v_planes)]
    kch = kcp.transpose(0, 2, 1, 3)
    vch = vcp.transpose(0, 2, 1, 3)
    kern = functools.partial(_prefill_kernel, rep, T, Dv, scale, softcap,
                             window, s_tiles, gsk, gsv, kind_k, kind_v,
                             len(k_planes), len(v_planes))
    cache_specs = [
        pl.BlockSpec((1, 1, S, p.shape[-1]), lambda b, h, r: (b, h, 0, 0),
                     memory_space=pltpu.VMEM)
        for p in kvh
    ]
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, R, Dv), q.dtype),
        grid=(B, Hkv, R // TR),
        in_specs=[
            pl.BlockSpec((1, 1, TR, Dk), lambda b, h, r: (b, h, r, 0), memory_space=pltpu.VMEM),
            *cache_specs,
            pl.BlockSpec((1, 1, T, Dk), lambda b, h, r: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, Dv), lambda b, h, r: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda b, h, r: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TR, Dv), lambda b, h, r: (b, h, r, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **({} if interpret else {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)}),
    )(qh, *kvh, kch, vch, seq_len.reshape(B, 1))
    out = out.reshape(B, Hkv, T, rep, Dv).transpose(0, 2, 1, 3, 4).reshape(B, T, H, Dv)
    return QuantKVCache.kv_unpermute(out)


def _cache_kinds(cache):
    from ...runtime.kv_cache import QuantKVCache

    if not isinstance(cache, QuantKVCache):
        return None
    kinds = getattr(cache, "kinds", ("q8_0", "q8_0"))
    if all(k in SUPPORTED_KV_KINDS for k in kinds):
        return kinds
    return None


def decode_supported(cfg, cache, t: int) -> bool:
    from ...parallel.sharding import get_active_mesh

    if get_active_mesh() is not None:
        return False  # sharded serving: attention runs on the SPMD XLA path
    if cfg.use_alibi or cfg.n_head_kv_arr:
        return False  # ALiBi bias / per-layer heads use the masked path
    import os

    if os.environ.get("LLAMACOG_FLASH_Q8", "1") != "1":
        return False
    if _cache_kinds(cache) is None:
        return False
    S = int(cache.max_seq)
    return (
        t == 1
        and cfg.head_dim_k % 32 == 0
        and cfg.head_dim_v % 32 == 0
        and cfg.n_head % cfg.n_head_kv == 0
        and (S <= _WHOLE_S_MAX or S % DTS == 0)
    )


def prefill_supported(cfg, cache, t: int, s: int) -> bool:
    from ...parallel.sharding import get_active_mesh

    if get_active_mesh() is not None:
        return False  # sharded serving: attention runs on the SPMD XLA path
    if cfg.use_alibi or cfg.n_head_kv_arr:
        return False  # ALiBi bias / per-layer heads use the masked path
    import os

    if os.environ.get("LLAMACOG_FLASH_Q8", "1") != "1":
        return False
    return (
        t >= 8
        and t % 8 == 0
        and s % TS == 0
        and _cache_kinds(cache) is not None
        and cfg.head_dim_k % 32 == 0
        and cfg.head_dim_v % 32 == 0
        and cfg.n_head % cfg.n_head_kv == 0
    )


# ---------------------------------------------------------------------------
# S-tiled decode: the whole-S decode kernel above needs S*Hkv*(Dk+Dv) bytes
# of VMEM and stops fitting around S=4k. This variant streams TS-long KV
# tiles through VMEM with the online-softmax state (m/l/acc) carried in
# scratch across grid steps — context length is bounded by HBM, not VMEM.
# ---------------------------------------------------------------------------

DTS = 1024  # decode KV tile length


def _decode_tiled_kernel(hkv, rep, n_tiles, Dv, scale, softcap, window,
                         gsk, gsv, kind_k, kind_v, nk, nv, *refs):
    q_ref = refs[0]
    k_refs = refs[1:1 + nk]
    v_refs = refs[1 + nk:1 + nk + nv]
    kc_ref, vc_ref, len_ref, o_ref, m_ref, l_ref, acc_ref = refs[1 + nk + nv:]
    b = pl.program_id(0)
    i = pl.program_id(1)
    n = len_ref[b, 0]

    @pl.when(i == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    TSs = k_refs[0].shape[1]
    pos = i * TSs + jax.lax.broadcasted_iota(jnp.int32, (1, TSs), 1)
    valid = pos < n
    if window > 0:
        valid = valid & (pos > n - window)

    for h in range(hkv):
        sl = slice(h * rep, (h + 1) * rep)
        q_h = q_ref[0, sl, :].astype(jnp.float32)  # [rep, Dk]
        k_h = _deq(kind_k, gsk,
                   tuple(_hslice(r[0, :, :], h, hkv) for r in k_refs))  # [TSs, Dk]
        s = jax.lax.dot_general(
            q_h, k_h, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if softcap > 0.0:
            s = softcap * jnp.tanh(s / softcap)
        s = jnp.where(valid, s, -1e30)
        m_prev = m_ref[sl, :1]
        l_prev = l_ref[sl, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        v_h = _deq(kind_v, gsv,
                   tuple(_hslice(r[0, :, :], h, hkv) for r in v_refs))  # [TSs, Dv]
        pv = jax.lax.dot_general(
            p, v_h, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[sl, :1] = m_new
        l_ref[sl, :1] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[sl, :] = acc_ref[sl, :] * alpha + pv

    @pl.when(i == n_tiles - 1)
    def _():
        # final: this step's own K/V, then normalize and emit
        for h in range(hkv):
            sl = slice(h * rep, (h + 1) * rep)
            q_h = q_ref[0, sl, :].astype(jnp.float32)
            kc_h = kc_ref[0, h, :].astype(jnp.float32)
            s_cur = jnp.sum(q_h * kc_h[None, :], axis=-1, keepdims=True) * scale
            if softcap > 0.0:
                s_cur = softcap * jnp.tanh(s_cur / softcap)
            m_prev = m_ref[sl, :1]
            l_prev = l_ref[sl, :1]
            m_new = jnp.maximum(m_prev, s_cur)
            alpha = jnp.exp(m_prev - m_new)
            e_cur = jnp.exp(s_cur - m_new)
            acc = acc_ref[sl, :] * alpha + e_cur * vc_ref[0, h, :].astype(jnp.float32)[None, :]
            denom = l_prev * alpha + e_cur
            o_ref[0, sl, :] = (acc / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "scale", "softcap", "window", "interpret", "kv_cap", "kinds"))
def flash_decode_q8_tiled(
    q, k_planes, v_planes, k_cur, v_cur, seq_len, scale,
    softcap: float = 0.0, window: int = 0, interpret: bool = False,
    kv_cap: int | None = None, kinds: tuple = ("q8_0", "q8_0"),
):
    """Same contract as flash_decode_q8, S tiled in DTS chunks."""
    from ...runtime.kv_cache import QuantKVCache

    B, H, Dk = q.shape
    k_planes = _flat_planes(k_planes, 3)
    v_planes = _flat_planes(v_planes, 3)
    S, Hkv = k_planes[0].shape[1], k_cur.shape[1]
    if kv_cap is not None and kv_cap < S:
        S = kv_cap  # grid covers only the attended prefix
    Dv = v_cur.shape[-1]  # logical (the value plane may be nibble-packed)
    rep = H // Hkv
    kind_k, kind_v = kinds
    gsk = _gs(kind_k, Dk, k_planes, Hkv)
    gsv = _gs(kind_v, Dv, v_planes, Hkv)
    n_tiles = S // DTS
    qp = QuantKVCache.kv_permute(q)
    kcp = QuantKVCache.kv_permute(k_cur)
    vcp = QuantKVCache.kv_permute(v_cur)
    kern = functools.partial(_decode_tiled_kernel, Hkv, rep, n_tiles, Dv,
                             scale, softcap, window, gsk, gsv, kind_k, kind_v,
                             len(k_planes), len(v_planes))
    cache_specs = [
        pl.BlockSpec((1, DTS, p.shape[-1]), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM)
        for p in (*k_planes, *v_planes)
    ]
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, H, Dv), q.dtype),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, H, Dk), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            *cache_specs,
            pl.BlockSpec((1, Hkv, Dk), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, Dv), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, H, Dv), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H, 1), jnp.float32),   # running max
            pltpu.VMEM((H, 1), jnp.float32),   # running denom
            pltpu.VMEM((H, Dv), jnp.float32),  # running numerator
        ],
        interpret=interpret,
        **({} if interpret else {"compiler_params": pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024)}),
    )(qp, *k_planes, *v_planes, kcp, vcp, seq_len.reshape(B, 1))
    return QuantKVCache.kv_unpermute(out)


# whole-S VMEM residency stops fitting around this context length
_WHOLE_S_MAX = 4096
# ... and, independently, when the per-head f32 dequant buffers exceed the
# scoped-vmem budget (the unrolled head loop holds Hkv * S * (Dk+Dv) f32;
# measured OOM at Hkv=8, S=1024, D=128 -> 8.4 MB of dequant + operands)
_WHOLE_VMEM_MAX = 6 * 1024 * 1024


def flash_decode_q8_auto(q, k_planes, v_planes, k_cur, v_cur, seq_len, scale,
                         softcap=0.0, window=0, interpret=False, kv_cap=None,
                         kinds=("q8_0", "q8_0")):
    S = k_planes[0].shape[1]
    if kv_cap is not None:
        S = min(S, kv_cap)
    Hkv = k_cur.shape[1]
    dk, dv = k_cur.shape[-1], v_cur.shape[-1]
    est = Hkv * S * (dk + dv) * 4
    if (S > _WHOLE_S_MAX or est > _WHOLE_VMEM_MAX) and S % DTS == 0:
        return flash_decode_q8_tiled(q, k_planes, v_planes, k_cur, v_cur,
                                     seq_len, scale, softcap=softcap,
                                     window=window, interpret=interpret,
                                     kv_cap=kv_cap, kinds=kinds)
    return flash_decode_q8(q, k_planes, v_planes, k_cur, v_cur, seq_len, scale,
                           softcap=softcap, window=window, interpret=interpret,
                           kv_cap=kv_cap, kinds=kinds)


# ---------------------------------------------------------------------------
# Stacked-cache decode: the per-layer entry points above receive p[il]
# slices, which XLA must MATERIALIZE before the custom-call (a ~2 MB HBM
# copy per layer per step on a dense 8B cache — ~1 ms/tok of pure copies in
# the decode trace). These variants take the whole stacked planes
# [L, B, S, Hkv, *] and pick the layer inside the BlockSpec index_map (`il`
# is a trace-time constant: the layer loop is unrolled), so the kernel DMAs
# its KV tiles straight out of the cache buffer and nothing is copied.
# Dense bf16/f16 caches ride the same kernels ("bf16" kind = identity _deq)
# with no group permute — this is also the production replacement for the
# XLA flat decode attention (ops/attention.py), whose cache reshapes forced
# those copies.
# ---------------------------------------------------------------------------



# kinds whose flat [S, Hkv*W] tile dequantizes in ONE pass (payload cast +
# an MXU-built scale expansion) instead of Hkv per-head op chains — the
# per-head path costs ~8x the op count and dominated at depth (q8_0 32k
# decode 22.9 -> 67.3 t/s with the one-pass deq, beating dense's 64.4).
# q4_0's single nibble unpack emits columns in (half, head, col') order;
# the scale expansion matrix and the block-diagonal q lane layout absorb
# the permutation, so it one-passes too.
_FLAT_DEQ_KINDS = ("q8_0", "q4_0", "f16", "bf16")


def _scale_expand(sc, hkv, HD, head_w):
    """[S, Hkv*G] scales -> [S, HD] per-column scales via ONE tiny MXU dot
    against a 0/1 expansion matrix: decoded col j belongs to head
    (j // head_w) % hkv and group j % G (head_w % G == 0), so
    E[r, j] = 1 iff r == head(j)*G + j%G."""
    HG = sc.shape[-1]
    G = HG // hkv
    jj = jax.lax.broadcasted_iota(jnp.int32, (HG, HD), 1)
    g_idx = ((jj // head_w) % hkv) * G + jj % G
    rows = jax.lax.broadcasted_iota(jnp.int32, (HG, HD), 0)
    E = (rows == g_idx).astype(jnp.float32)
    return jax.lax.dot_general(
        sc.astype(jnp.float32), E,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _deq_whole(kind, hkv, tiles):
    """Flat [S, Hkv*W] plane tiles -> f32 [S, Hkv*D] in one pass. For
    q4_0 the output columns are in (half, head, col') order — callers
    account for it via the q lane layout (_qb_lanes) and per-head output
    slices (_acc_slices)."""
    q = tiles[0]
    if kind in ("f16", "bf16"):
        return q.astype(jnp.float32)
    if kind == "q4_0":
        qi = q.astype(jnp.int32)  # [S, Hkv*D/2] packed
        v = jnp.concatenate([qi & 0xF, qi >> 4], axis=-1).astype(jnp.float32)
        st = _scale_expand(tiles[1], hkv, v.shape[-1], q.shape[-1] // hkv)
        return (v - 8.0) * st
    v = q.astype(jnp.float32)  # [S, Hkv*D] int8 levels
    st = _scale_expand(tiles[1], hkv, v.shape[-1], v.shape[-1] // hkv)
    return v * st


def _deq_cat(kind, gs, hkv, refs):
    """[S, Hkv*D] f32 from flat plane refs: one-pass for q8_0/q4_0/dense,
    per-head slices otherwise."""
    if kind in _FLAT_DEQ_KINDS:
        return _deq_whole(kind, hkv, tuple(r[0, :, :] for r in refs))
    return jnp.concatenate(
        [_deq(kind, gs, tuple(_hslice(r[0, :, :], h, hkv) for r in refs))
         for h in range(hkv)], axis=1)


def _split2(kind):
    """True when the kind's one-pass deq emits (half, head, col') column
    order (q4_0's single nibble unpack) instead of (head, col)."""
    return kind == "q4_0"


def _head_block(flat, h, hkv, split):
    """Head h's [.., D] strip of a flat [.., Hkv*D] row in the deq column
    order: contiguous block, or two half-blocks for split2 kinds."""
    D = flat.shape[-1] // hkv
    if not split:
        return flat[..., h * D:(h + 1) * D]
    D2 = D // 2
    HD2 = hkv * D2
    return jnp.concatenate(
        [flat[..., h * D2:(h + 1) * D2],
         flat[..., HD2 + h * D2:HD2 + (h + 1) * D2]], axis=-1)


def _decode_onedot_kernel(hkv, rep, n_tiles, Dk, Dv, scale, softcap, window,
                          gsk, gsv, kind_k, kind_v, nk, nv, *refs):
    """Quantized-KV decode with ONE score dot and ONE pv dot per tile.

    The per-head loop kernel above issues 2*Hkv tiny MXU dots per tile
    ([rep, Dk] x [S, Dk]) plus per-head scale machinery — measured 150
    us/call vs 7.8 for the dense flat kernel at d=1024 (PERF r5). Here
    the per-head dequantized tiles are concatenated to [ts, Hkv*D] and
    the q operand arrives BLOCK-DIAGONAL (qb[i] holds q_i at lane block
    h(i)*Dk, zeros elsewhere), so

        s[i, pos] = qb[i] . k_cat[pos]  =  q_i . k_{h(i), pos}

    is one [H, Hkv*Dk] x [ts, Hkv*Dk]^T MXU dot, and the pv product
    keeps the block structure ([H, Hkv*Dv], head h(i)'s slice extracted
    once at the end). The MXU does the head fan-out; the VPU only pays
    the dequant it already paid."""
    len_ref = refs[0]  # scalar-prefetched [B] (also drives the index maps)
    qb_ref = refs[1]
    k_refs = refs[2:2 + nk]
    v_refs = refs[2 + nk:2 + nk + nv]
    kc_ref, vc_ref, o_ref, m_ref, l_ref, acc_ref = refs[2 + nk + nv:]
    b = pl.program_id(0)
    i = pl.program_id(1)
    n = len_ref[b]
    H = hkv * rep

    @pl.when(i == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    TSs = k_refs[0].shape[1]

    @pl.when(i * TSs < n)
    def _():
        # rows whose depth ends before this tile skip it entirely; the
        # index maps also clamp their block index so no new DMA is issued
        k_cat = _deq_cat(kind_k, gsk, hkv, k_refs)  # [TSs, Hkv*Dk]
        v_cat = _deq_cat(kind_v, gsv, hkv, v_refs)  # [TSs, Hkv*Dv]
        qb = qb_ref[0, :, :].astype(jnp.float32)  # [H, Hkv*Dk] block-diag
        s = jax.lax.dot_general(
            qb, k_cat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [H, TSs]
        if softcap > 0.0:
            s = softcap * jnp.tanh(s / softcap)
        pos = i * TSs + jax.lax.broadcasted_iota(jnp.int32, (1, TSs), 1)
        valid = pos < n
        if window > 0:
            valid = valid & (pos > n - window)
        s = jnp.where(valid, s, -1e30)
        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        pv = jax.lax.dot_general(
            p, v_cat, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H, Hkv*Dv] — row i's result in lane block h(i)*Dv
        m_ref[:, :1] = m_new
        l_ref[:, :1] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(i == n_tiles - 1)
    def _():
        # current-step K/V + per-head block extraction, once per call.
        # Head strips follow each side's deq column order (split2 for the
        # q4_0 one-pass unpack; the current-step K is in the q lane
        # order, so q.kc still contracts correctly per head)
        sk = _split2(kind_k) and kind_k in _FLAT_DEQ_KINDS
        sv = _split2(kind_v) and kind_v in _FLAT_DEQ_KINDS
        for h in range(hkv):
            sl = slice(h * rep, (h + 1) * rep)
            q_h = _head_block(qb_ref[0, sl, :], h, hkv, sk).astype(jnp.float32)
            # (_head_block reassembles the split2 halves back into the
            # strided col order, so q_h matches kc_h directly)
            kc_h = kc_ref[0, h, :].astype(jnp.float32)
            s_cur = jnp.sum(q_h * kc_h[None, :], axis=-1, keepdims=True) * scale
            if softcap > 0.0:
                s_cur = softcap * jnp.tanh(s_cur / softcap)
            m_prev = m_ref[sl, :1]
            l_prev = l_ref[sl, :1]
            m_new = jnp.maximum(m_prev, s_cur)
            alpha = jnp.exp(m_prev - m_new)
            e_cur = jnp.exp(s_cur - m_new)
            acc = (_head_block(acc_ref[sl, :], h, hkv, sv) * alpha
                   + e_cur * vc_ref[0, h, :].astype(jnp.float32)[None, :])
            denom = l_prev * alpha + e_cur
            o_ref[0, sl, :] = (acc / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "il", "scale", "softcap", "window", "interpret", "kv_cap", "kinds",
    "permute"))
def flash_decode_stacked(
    q: jnp.ndarray,  # [B, H, Dk]
    k_planes: tuple,  # each [L, B, S, Hkv, *]
    v_planes: tuple,
    il: int,  # static layer index
    k_cur: jnp.ndarray,  # [B, Hkv, Dk]
    v_cur: jnp.ndarray,
    seq_len: jnp.ndarray,  # [B]
    scale: float,
    softcap: float = 0.0,
    window: int = 0,
    interpret: bool = False,
    kv_cap: int | None = None,
    kinds: tuple = ("q8_0", "q8_0"),
    permute: bool = True,  # False for dense caches (no strided group order)
) -> jnp.ndarray:  # [B, H, Dv]
    from ...runtime.kv_cache import QuantKVCache

    B, H, Dk = q.shape
    k_planes = _flat_planes(k_planes, 4)
    v_planes = _flat_planes(v_planes, 4)
    S, Hkv = k_planes[0].shape[2], k_cur.shape[1]
    if kv_cap is not None and kv_cap < S:
        S = kv_cap
    Dv = v_cur.shape[-1]
    rep = H // Hkv
    kind_k, kind_v = kinds
    gsk = _gs(kind_k, Dk, k_planes, Hkv)
    gsv = _gs(kind_v, Dv, v_planes, Hkv)
    if permute:
        qp = QuantKVCache.kv_permute(q)
        kcp = QuantKVCache.kv_permute(k_cur)
        vcp = QuantKVCache.kv_permute(v_cur)
    else:
        qp, kcp, vcp = q, k_cur, v_cur
    # one-dot kernel: ts = DTS when it divides, else whole-S in one tile
    ts = DTS if (S > DTS and S % DTS == 0) else S
    n_tiles = S // ts
    params = {} if interpret else {"compiler_params": pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024)}
    # block-diagonal q: row i carries q_i at head h(i)'s lanes in the
    # K side's deq column order ((head, col), or (half, head, col') for
    # q4_0's one-pass unpack)
    onehot = (jnp.arange(H)[:, None] // rep ==
              jnp.arange(Hkv)[None, :]).astype(qp.dtype)
    if _split2(kind_k) and kind_k in _FLAT_DEQ_KINDS:
        qb = (onehot[None, :, None, :, None]
              * qp.reshape(B, H, 2, 1, Dk // 2)).reshape(B, H, Hkv * Dk)
    else:
        qb = (onehot[None, :, :, None] * qp[:, :, None, :]).reshape(
            B, H, Hkv * Dk)
    kern = functools.partial(_decode_onedot_kernel, Hkv, rep, n_tiles, Dk,
                             Dv, scale, softcap, window, gsk, gsv,
                             kind_k, kind_v, len(k_planes), len(v_planes))

    def _clamp(i, lens, b, _ts=ts):
        # rows stop DMAing past their own depth: tiles beyond
        # ceil(len/ts) re-map to the last needed block (pallas skips the
        # re-DMA when the block index repeats)
        need = jnp.maximum((lens[b] + _ts - 1) // _ts - 1, 0)
        return jnp.minimum(i, need)

    cache_specs = [
        pl.BlockSpec((None, 1, ts, p.shape[-1]),
                     (lambda b, i, lens, _il=il: (_il, b, _clamp(i, lens, b), 0)),
                     memory_space=pltpu.VMEM)
        for p in (*k_planes, *v_planes)
    ]
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, H, Dv), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec((1, H, Hkv * Dk), lambda b, i, lens: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                *cache_specs,
                pl.BlockSpec((1, Hkv, Dk), lambda b, i, lens: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, Dv), lambda b, i, lens: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H, Dv), lambda b, i, lens: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((H, 1), jnp.float32),
                pltpu.VMEM((H, 1), jnp.float32),
                pltpu.VMEM((H, Hkv * Dv), jnp.float32),
            ],
        ),
        interpret=interpret,
        **params,
    )(seq_len.astype(jnp.int32), qb, *k_planes, *v_planes, kcp, vcp)
    return QuantKVCache.kv_unpermute(out) if permute else out


def _decode_flat_dense_kernel(hkv, rep, n_tiles, Dv, scale, softcap, window,
                              *refs):
    """Dense-cache decode with the flat-GQA trick INSIDE the kernel: the
    [TS, Hkv, D] KV tile collapses (contiguously, no copy) to [TS*Hkv, D],
    so QK and PV are ONE MXU dot each per tile instead of Hkv small
    per-head dots, with a static block mask (flat column j belongs to kv
    head j % Hkv) zeroing off-group scores through exp(-1e30). Same math as
    ops/attention._decode_attention_flat, which this replaces on the
    production path (the XLA version forced per-layer cache copies)."""
    (len_ref, q_ref, k_ref, v_ref, kc_ref, vc_ref, o_ref,
     m_ref, l_ref, acc_ref) = refs
    b = pl.program_id(0)
    i = pl.program_id(1)
    n = len_ref[b]
    H = q_ref.shape[1]

    @pl.when(i == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    TSs = k_ref.shape[1]
    q = q_ref[0, :, :].astype(jnp.float32)  # [H, Dk]

    @pl.when(i * TSs < n)
    def _():
        # rows whose depth ends before this tile skip it (the index maps
        # also clamp, so no DMA is issued either) — at mixed-depth B=32
        # serving this is the difference between streaming B*kv_cap and
        # streaming sum(depth_b) of cache
        J = TSs * hkv
        k_flat = k_ref[0, :, :, :].reshape(J, k_ref.shape[-1])
        s = jax.lax.dot_general(
            q, k_flat.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [H, J]
        if softcap > 0.0:
            s = softcap * jnp.tanh(s / softcap)
        col = jax.lax.broadcasted_iota(jnp.int32, (H, J), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (H, J), 0)
        pos = i * TSs + col // hkv
        ok = (col % hkv == row // rep) & (pos < n)
        if window > 0:
            ok = ok & (pos > n - window)
        s = jnp.where(ok, s, -1e30)
        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # off-group/invalid -> exactly 0
        v_flat = v_ref[0, :, :, :].reshape(J, Dv)
        pv = jax.lax.dot_general(
            p, v_flat.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:, :1] = m_new
        l_ref[:, :1] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(i == n_tiles - 1)
    def _():
        # element-repeat kc/vc rows to q's head order (q head h reads kv
        # head h // rep; pltpu.repeat would tile [k0,k1,k0,k1...] instead)
        kc = jnp.concatenate(
            [jnp.broadcast_to(kc_ref[0, hk, :].astype(jnp.float32)[None, :],
                              (rep, kc_ref.shape[-1])) for hk in range(hkv)],
            axis=0)
        vc = jnp.concatenate(
            [jnp.broadcast_to(vc_ref[0, hk, :].astype(jnp.float32)[None, :],
                              (rep, Dv)) for hk in range(hkv)], axis=0)
        s_cur = jnp.sum(q * kc, axis=-1, keepdims=True) * scale  # [H, 1]
        if softcap > 0.0:
            s_cur = softcap * jnp.tanh(s_cur / softcap)
        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, s_cur)
        alpha = jnp.exp(m_prev - m_new)
        e_cur = jnp.exp(s_cur - m_new)
        acc = acc_ref[...] * alpha + e_cur * vc
        denom = l_prev * alpha + e_cur
        o_ref[0, :, :] = (acc / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "il", "scale", "softcap", "window", "interpret", "kv_cap"))
def _flash_decode_stacked_dense(q, k_stack, v_stack, il, k_cur, v_cur,
                                seq_len, scale, softcap=0.0, window=0,
                                interpret=False, kv_cap=None):
    B, H, Dk = q.shape
    S, Hkv = k_stack.shape[2], k_stack.shape[3]
    if kv_cap is not None and kv_cap < S:
        S = kv_cap
    Dv = v_stack.shape[-1]
    rep = H // Hkv
    # tile S when it divides cleanly; otherwise whole-S (fits VMEM to ~4k,
    # which stacked_decode_supported guarantees for non-DTS-multiple S)
    # finer tiles let the per-row depth clamp skip real DMA: at B=32 with
    # ~260-token rows in a 1024-slot cache, ts=256 streams 1 tile/row
    # instead of 4 (the whole-cache read was the r4 batched-decode gap)
    ts = next((t for t in (256, 512, DTS) if S > t and S % t == 0), S)
    n_tiles = S // ts
    kern = functools.partial(_decode_flat_dense_kernel, Hkv, rep, n_tiles,
                             Dv, scale, softcap, window)

    def _clamp(i, lens, b, _ts=ts):
        need = jnp.maximum((lens[b] + _ts - 1) // _ts - 1, 0)
        return jnp.minimum(i, need)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, H, Dv), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec((1, H, Dk), lambda b, i, lens: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, 1, ts, Hkv, Dk),
                             (lambda b, i, lens, _il=il:
                              (_il, b, _clamp(i, lens, b), 0, 0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, 1, ts, Hkv, Dv),
                             (lambda b, i, lens, _il=il:
                              (_il, b, _clamp(i, lens, b), 0, 0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, Dk), lambda b, i, lens: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hkv, Dv), lambda b, i, lens: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H, Dv), lambda b, i, lens: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((H, 1), jnp.float32),
                pltpu.VMEM((H, 1), jnp.float32),
                pltpu.VMEM((H, Dv), jnp.float32),
            ],
        ),
        interpret=interpret,
        **({} if interpret else {"compiler_params": pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024)}),
    )(seq_len.astype(jnp.int32), q, k_stack, v_stack, k_cur, v_cur)


def decode_from_cache(q, cache, il, k_cur, v_cur, seq_len, scale,
                      softcap=0.0, window=0, interpret=False, kv_cap=None):
    """Decode attention for layer `il` reading the stacked cache directly.

    Dispatches on cache type: QuantKVCache planes keep their strided group
    order (permute=True); a dense KVCache passes its bf16/f16 stores with
    the identity decode and no permute."""
    from ...runtime.kv_cache import QuantKVCache

    if isinstance(cache, QuantKVCache):
        return flash_decode_stacked(
            q, cache.k_planes, cache.v_planes, il, k_cur, v_cur, seq_len,
            scale, softcap=softcap, window=window, interpret=interpret,
            kv_cap=kv_cap, kinds=cache.kinds, permute=True)
    return _flash_decode_stacked_dense(
        q, cache.k, cache.v, il, k_cur, v_cur, seq_len, scale,
        softcap=softcap, window=window, interpret=interpret, kv_cap=kv_cap)


def stacked_decode_supported(cfg, cache, t: int) -> bool:
    import os

    from ...parallel.sharding import get_active_mesh
    from ...runtime.kv_cache import KVCache, QuantKVCache

    if get_active_mesh() is not None:
        return False  # sharded serving: attention runs on the SPMD XLA path
    if cfg.use_alibi or cfg.n_head_kv_arr:
        return False
    if os.environ.get("LLAMACOG_FLASH_STACKED", "1") != "1":
        return False
    if isinstance(cache, QuantKVCache):
        if _cache_kinds(cache) is None:
            return False
    elif type(cache) is not KVCache:  # SwaKVCache ring keeps the masked path
        return False
    S = int(cache.max_seq)
    return (
        t == 1
        and cfg.head_dim_k % 32 == 0
        and cfg.head_dim_v % 32 == 0
        and cfg.n_head % cfg.n_head_kv == 0
        and (S <= _WHOLE_S_MAX or S % DTS == 0)
    )
