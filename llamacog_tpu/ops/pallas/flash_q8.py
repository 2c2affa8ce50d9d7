"""Flash attention reading the Q8_0 KV cache directly (Pallas TPU).

Role of the reference's quantized-KV fattn vec kernels
(ggml-cuda/fattn.cu:133-151; CPU analog ggml-cpu/ops.cpp:7096): K and V stay
int8+scales in HBM and are dequantized per tile in-register, so attention
reads 9 bits/element instead of the XLA fallback's dequantize-the-whole-
cache-to-bf16 round trip (int8 read + bf16 write + bf16 read = 5x traffic).

The cache stores head-dim elements group-strided (QuantKVCache._quant):
column c = r*G + g holds element g*32 + r, so the in-kernel scale broadcast
is one pltpu.repeat tile. Q and the current-step K/V are permuted to match
and the output is unpermuted back — O(B*H*D) work outside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TS = 512  # prefill KV tile length


def _deq(q_tile, s_tile, gs):
    """int8 (Q8_0 cache) or nibble-packed uint8 (Q4_0 cache) tile -> f32.

    The q4 pack puts strided column c in the low nibble of byte c and
    strided column c + D/2 in the high nibble (Q4KVCache._quant), so the
    unpack concat reproduces the strided order the scale broadcast expects."""
    if q_tile.dtype == jnp.uint8:  # q4 packed
        qi = q_tile.astype(jnp.int32)
        v = jnp.concatenate([qi & 0xF, qi >> 4], axis=-1).astype(jnp.float32) - 8.0
    else:
        v = q_tile.astype(jnp.float32)
    return v * pltpu.repeat(s_tile.astype(jnp.float32), gs, axis=1)


def _decode_kernel(hkv, rep, scale, softcap, window, gsk, gsv,
                   q_ref, kq_ref, ks_ref, vq_ref, vs_ref, kc_ref, vc_ref,
                   len_ref, o_ref):
    S = kq_ref.shape[1]
    n = len_ref[pl.program_id(0), 0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    valid = pos < n
    if window > 0:
        valid = valid & (pos > n - window)
    neg = jnp.float32(-1e30)

    for h in range(hkv):
        q_h = q_ref[0, h * rep:(h + 1) * rep, :].astype(jnp.float32)  # [rep, Dk]
        k_h = _deq(kq_ref[0, :, h, :], ks_ref[0, :, h, :], gsk)  # [S, Dk]
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
        v_h = _deq(vq_ref[0, :, h, :], vs_ref[0, :, h, :], gsv)  # [S, Dv]
        out = jax.lax.dot_general(
            e_old, v_h, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = out + e_cur * vc_ref[0, h, :].astype(jnp.float32)[None, :]
        o_ref[0, h * rep:(h + 1) * rep, :] = (out / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "softcap", "window", "interpret", "kv_cap"))
def flash_decode_q8(
    q: jnp.ndarray,  # [B, H, Dk] natural order
    kq: jnp.ndarray,  # [B, S, Hkv, Dk] int8 (strided order)
    ks: jnp.ndarray,  # [B, S, Hkv, Gk] f32
    vq: jnp.ndarray,
    vs: jnp.ndarray,
    k_cur: jnp.ndarray,  # [B, Hkv, Dk] natural order
    v_cur: jnp.ndarray,
    seq_len: jnp.ndarray,  # [B]
    scale: float,
    softcap: float = 0.0,
    window: int = 0,
    interpret: bool = False,
    kv_cap: int | None = None,  # static prefix bound: blocks beyond it are
    # never DMA'd (the padded-n_kv role)
) -> jnp.ndarray:  # [B, H, Dv] natural order
    from ...runtime.kv_cache import QuantKVCache

    B, H, Dk = q.shape
    S, Hkv = kq.shape[1], kq.shape[2]
    if kv_cap is not None and kv_cap < S:
        S = kv_cap
    Dv = v_cur.shape[-1]  # logical (vq may be nibble-packed at Dv/2 bytes)
    rep = H // Hkv
    gsk = Dk // ks.shape[-1]
    gsv = Dv // vs.shape[-1]
    qp = QuantKVCache.kv_permute(q)
    kcp = QuantKVCache.kv_permute(k_cur)
    vcp = QuantKVCache.kv_permute(v_cur)
    kern = functools.partial(_decode_kernel, Hkv, rep, scale, softcap, window,
                             gsk, gsv)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, H, Dv), q.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Dk), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            # block S may be a PREFIX of the stored cache (kv_cap)
            pl.BlockSpec((1, S, Hkv, kq.shape[-1]), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Hkv, ks.shape[-1]), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Hkv, vq.shape[-1]), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Hkv, vs.shape[-1]), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, Dk), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, Dv), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, H, Dv), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        **({} if interpret else {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)}),
    )(qp, kq, ks, vq, vs, kcp, vcp, seq_len.reshape(B, 1))
    return QuantKVCache.kv_unpermute(out)


def _prefill_kernel(rep, T, scale, softcap, window, s_tiles, gsk, gsv,
                    q_ref, kq_ref, ks_ref, vq_ref, vs_ref, kc_ref, vc_ref,
                    len_ref, o_ref):
    Dv = vs_ref.shape[-1] * gsv  # logical (vq may be nibble-packed)
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
        k_t = _deq(kq_ref[0, 0, pl.ds(i * TS, TS), :],
                   ks_ref[0, 0, pl.ds(i * TS, TS), :], gsk)
        v_t = _deq(vq_ref[0, 0, pl.ds(i * TS, TS), :],
                   vs_ref[0, 0, pl.ds(i * TS, TS), :], gsv)
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


@functools.partial(jax.jit, static_argnames=("scale", "softcap", "window", "interpret", "kv_cap"))
def flash_prefill_q8(
    q: jnp.ndarray,  # [B, T, H, Dk] natural order
    kq: jnp.ndarray,  # [B, S, Hkv, Dk] int8 (strided order)
    ks: jnp.ndarray,
    vq: jnp.ndarray,
    vs: jnp.ndarray,
    k_cur: jnp.ndarray,  # [B, T, Hkv, Dk] natural order
    v_cur: jnp.ndarray,
    seq_len: jnp.ndarray,
    scale: float,
    softcap: float = 0.0,
    window: int = 0,
    interpret: bool = False,
    kv_cap: int | None = None,
) -> jnp.ndarray:  # [B, T, H, Dv]
    from ...runtime.kv_cache import QuantKVCache

    B, T, H, Dk = q.shape
    S, Hkv = kq.shape[1], kq.shape[2]
    if kv_cap is not None and kv_cap < S:
        S = kv_cap
    Dv = v_cur.shape[-1]  # logical (vq may be nibble-packed at Dv/2 bytes)
    Gk, Gv = ks.shape[-1], vs.shape[-1]
    rep = H // Hkv
    R = T * rep
    s_tiles = S // TS
    TR = 512 if R % 512 == 0 else R
    qp = QuantKVCache.kv_permute(q)
    kcp = QuantKVCache.kv_permute(k_cur)
    vcp = QuantKVCache.kv_permute(v_cur)
    qh = qp.reshape(B, T, Hkv, rep, Dk).transpose(0, 2, 1, 3, 4).reshape(B, Hkv, R, Dk)
    kqh = kq[:, :S].transpose(0, 2, 1, 3)  # [B, Hkv, S, Dk]
    ksh = ks[:, :S].transpose(0, 2, 1, 3)
    vqh = vq[:, :S].transpose(0, 2, 1, 3)
    vsh = vs[:, :S].transpose(0, 2, 1, 3)
    kch = kcp.transpose(0, 2, 1, 3)
    vch = vcp.transpose(0, 2, 1, 3)
    kern = functools.partial(_prefill_kernel, rep, T, scale, softcap, window,
                             s_tiles, Dk // Gk, Dv // Gv)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, R, Dv), q.dtype),
        grid=(B, Hkv, R // TR),
        in_specs=[
            pl.BlockSpec((1, 1, TR, Dk), lambda b, h, r: (b, h, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, kq.shape[-1]), lambda b, h, r: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, Gk), lambda b, h, r: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, vq.shape[-1]), lambda b, h, r: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, Gv), lambda b, h, r: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, Dk), lambda b, h, r: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, Dv), lambda b, h, r: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda b, h, r: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TR, Dv), lambda b, h, r: (b, h, r, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **({} if interpret else {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)}),
    )(qh, kqh, ksh, vqh, vsh, kch, vch, seq_len.reshape(B, 1))
    out = out.reshape(B, Hkv, T, rep, Dv).transpose(0, 2, 1, 3, 4).reshape(B, T, H, Dv)
    return QuantKVCache.kv_unpermute(out)


def decode_supported(cfg, cache, t: int) -> bool:
    from ...parallel.sharding import get_active_mesh

    if get_active_mesh() is not None:
        return False  # sharded serving: attention runs on the SPMD XLA path
    if cfg.use_alibi or cfg.n_head_kv_arr:
        return False  # ALiBi bias / per-layer heads use the masked path
    import os

    from ...runtime.kv_cache import QuantKVCache

    if os.environ.get("LLAMACOG_FLASH_Q8", "1") != "1":
        return False
    S = int(cache.max_seq)
    return (
        t == 1
        and isinstance(cache, QuantKVCache)
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

    from ...runtime.kv_cache import QuantKVCache

    if os.environ.get("LLAMACOG_FLASH_Q8", "1") != "1":
        return False
    return (
        t >= 8
        and t % 8 == 0
        and s % TS == 0
        and isinstance(cache, QuantKVCache)
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


def _decode_tiled_kernel(hkv, rep, n_tiles, scale, softcap, window, gsk, gsv,
                         q_ref, kq_ref, ks_ref, vq_ref, vs_ref, kc_ref, vc_ref,
                         len_ref, o_ref, m_ref, l_ref, acc_ref):
    b = pl.program_id(0)
    i = pl.program_id(1)
    n = len_ref[b, 0]
    H = q_ref.shape[1]
    Dv = vs_ref.shape[-1] * gsv  # logical (vq may be nibble-packed)

    @pl.when(i == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    TSs = kq_ref.shape[1]
    pos = i * TSs + jax.lax.broadcasted_iota(jnp.int32, (1, TSs), 1)
    valid = pos < n
    if window > 0:
        valid = valid & (pos > n - window)

    for h in range(hkv):
        sl = slice(h * rep, (h + 1) * rep)
        q_h = q_ref[0, sl, :].astype(jnp.float32)  # [rep, Dk]
        k_h = _deq(kq_ref[0, :, h, :], ks_ref[0, :, h, :], gsk)  # [TSs, Dk]
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
        v_h = _deq(vq_ref[0, :, h, :], vs_ref[0, :, h, :], gsv)  # [TSs, Dv]
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


@functools.partial(jax.jit, static_argnames=("scale", "softcap", "window", "interpret", "kv_cap"))
def flash_decode_q8_tiled(
    q, kq, ks, vq, vs, k_cur, v_cur, seq_len, scale,
    softcap: float = 0.0, window: int = 0, interpret: bool = False,
    kv_cap: int | None = None,
):
    """Same contract as flash_decode_q8, S tiled in DTS chunks."""
    from ...runtime.kv_cache import QuantKVCache

    B, H, Dk = q.shape
    S, Hkv = kq.shape[1], kq.shape[2]
    if kv_cap is not None and kv_cap < S:
        S = kv_cap  # grid covers only the attended prefix
    Dv = v_cur.shape[-1]  # logical (vq may be nibble-packed at Dv/2 bytes)
    rep = H // Hkv
    gsk = Dk // ks.shape[-1]
    gsv = Dv // vs.shape[-1]
    n_tiles = S // DTS
    qp = QuantKVCache.kv_permute(q)
    kcp = QuantKVCache.kv_permute(k_cur)
    vcp = QuantKVCache.kv_permute(v_cur)
    kern = functools.partial(_decode_tiled_kernel, Hkv, rep, n_tiles, scale,
                             softcap, window, gsk, gsv)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, H, Dv), q.dtype),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, H, Dk), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DTS, Hkv, kq.shape[-1]), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DTS, Hkv, ks.shape[-1]), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DTS, Hkv, vq.shape[-1]), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DTS, Hkv, vs.shape[-1]), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
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
    )(qp, kq, ks, vq, vs, kcp, vcp, seq_len.reshape(B, 1))
    return QuantKVCache.kv_unpermute(out)


# whole-S VMEM residency stops fitting around this context length
_WHOLE_S_MAX = 4096
# ... and, independently, when the per-head f32 dequant buffers exceed the
# scoped-vmem budget (the unrolled head loop holds Hkv * S * (Dk+Dv) f32;
# measured OOM at Hkv=8, S=1024, D=128 -> 8.4 MB of dequant + operands)
_WHOLE_VMEM_MAX = 6 * 1024 * 1024


def flash_decode_q8_auto(q, kq, ks, vq, vs, k_cur, v_cur, seq_len, scale,
                         softcap=0.0, window=0, interpret=False, kv_cap=None):
    S = kq.shape[1]
    if kv_cap is not None:
        S = min(S, kv_cap)
    Hkv = kq.shape[2]
    dk, dv = k_cur.shape[-1], v_cur.shape[-1]
    est = Hkv * S * (dk + dv) * 4
    if (S > _WHOLE_S_MAX or est > _WHOLE_VMEM_MAX) and S % DTS == 0:
        return flash_decode_q8_tiled(q, kq, ks, vq, vs, k_cur, v_cur, seq_len,
                                     scale, softcap=softcap, window=window,
                                     interpret=interpret, kv_cap=kv_cap)
    return flash_decode_q8(q, kq, ks, vq, vs, k_cur, v_cur, seq_len, scale,
                           softcap=softcap, window=window, interpret=interpret,
                           kv_cap=kv_cap)
