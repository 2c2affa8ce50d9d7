"""Flash attention for prefill (Pallas TPU).

The XLA fallback materializes [B, H, T, S] f32 scores — at T=512, S=2048
that is ~0.5GB of HBM traffic per layer and dominates prefill time. This
kernel streams K/V tiles through VMEM with an online softmax (the classic
flash recurrence), never materializing the score matrix; the current block
(the T new tokens) is handled as a final causally-masked tile, matching the
deferred-KV-write design (models/llama.forward).

Grid: (B, Hkv). Per step: all of one row's K/V for one KV head streams
through an S-tile loop; q is [T*rep, Dk].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TS = 512  # KV tile length


def _kernel(rep, T, scale, softcap, window, s_tiles,
            q_ref, k_ref, v_ref, kc_ref, vc_ref, len_ref, o_ref):
    Dk = q_ref.shape[-1]
    Dv = v_ref.shape[-1]
    # valid old length (= write_pos) for this batch row; the SMEM block is
    # the whole [B, 1] array (Mosaic rejects a (1,1) sub-block of it)
    n = len_ref[pl.program_id(0), 0]
    TR = q_ref.shape[-2]  # q rows in this tile (R split over the grid so
    # register/VMEM pressure stays bounded at long T)
    r0 = pl.program_id(2) * TR

    q = q_ref[0, 0, :, :].astype(jnp.float32)  # [TR, Dk], rows t-major
    # query absolute position per row: pos_q = n + t  (row r -> t = r // rep)
    t_of_row = (r0 + jax.lax.broadcasted_iota(jnp.int32, (TR, 1), 0)) // rep
    pos_q = n + t_of_row  # [R, 1]

    m_i = jnp.full((TR, 1), -1e30, jnp.float32)
    l_i = jnp.zeros((TR, 1), jnp.float32)
    acc = jnp.zeros((TR, Dv), jnp.float32)

    def s_tile(i, carry):
        m_i, l_i, acc = carry
        k_t = k_ref[0, 0, pl.ds(i * TS, TS), :].astype(jnp.float32)  # [TS, Dk]
        v_t = v_ref[0, 0, pl.ds(i * TS, TS), :].astype(jnp.float32)  # [TS, Dv]
        s = jax.lax.dot_general(
            q, k_t, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [R, TS]
        if softcap > 0.0:
            s = softcap * jnp.tanh(s / softcap)
        pos_k = i * TS + jax.lax.broadcasted_iota(jnp.int32, (1, TS), 1)
        ok = pos_k < n  # old cache: strictly below write_pos
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

    # final tile: the current block (causal within the block)
    kc = kc_ref[0, 0, :, :].astype(jnp.float32)  # [T, Dk]
    vc = vc_ref[0, 0, :, :].astype(jnp.float32)  # [T, Dv]
    s = jax.lax.dot_general(
        q, kc, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [R, T]
    if softcap > 0.0:
        s = softcap * jnp.tanh(s / softcap)
    t_k = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    ok = t_k <= t_of_row  # causal within the block
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


@functools.partial(
    jax.jit, static_argnames=("scale", "softcap", "window", "interpret")
)
def flash_prefill_attention(
    q: jnp.ndarray,  # [B, T, H, Dk]
    k: jnp.ndarray,  # [B, S, Hkv, Dk] old cache
    v: jnp.ndarray,  # [B, S, Hkv, Dv]
    k_cur: jnp.ndarray,  # [B, T, Hkv, Dk]
    v_cur: jnp.ndarray,  # [B, T, Hkv, Dv]
    seq_len: jnp.ndarray,  # [B] valid old length (write_pos)
    scale: float,
    softcap: float = 0.0,
    window: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:  # [B, T, H, Dv]
    B, T, H, Dk = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    Dv = v.shape[-1]
    rep = H // Hkv
    R = T * rep
    s_tiles = S // TS
    TR = 512 if R % 512 == 0 else R  # q-row tile (bounds VMEM/register use)
    # head-major layouts so block trailing dims are tile-aligned
    qh = q.reshape(B, T, Hkv, rep, Dk).transpose(0, 2, 1, 3, 4).reshape(B, Hkv, R, Dk)
    kh = k.transpose(0, 2, 1, 3)  # [B, Hkv, S, Dk]
    vh = v.transpose(0, 2, 1, 3)
    kch = k_cur.transpose(0, 2, 1, 3)  # [B, Hkv, T, Dk]
    vch = v_cur.transpose(0, 2, 1, 3)
    kern = functools.partial(_kernel, rep, T, scale, softcap, window, s_tiles)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, R, Dv), q.dtype),
        grid=(B, Hkv, R // TR),
        in_specs=[
            pl.BlockSpec((1, 1, TR, Dk), lambda b, h, r: (b, h, r, 0),
                         memory_space=pltpu.VMEM),
            # KV blocks keep a constant index while r sweeps, so pallas
            # reuses them without re-DMA
            pl.BlockSpec((1, 1, S, Dk), lambda b, h, r: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, Dv), lambda b, h, r: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, Dk), lambda b, h, r: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, Dv), lambda b, h, r: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda b, h, r: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TR, Dv), lambda b, h, r: (b, h, r, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qh, kh, vh, kch, vch, seq_len.reshape(B, 1))
    # [B, Hkv, T*rep, Dv] -> [B, T, H, Dv]
    return out.reshape(B, Hkv, T, rep, Dv).transpose(0, 2, 1, 3, 4).reshape(B, T, H, Dv)


def supported(cfg, cache, t: int, s: int) -> bool:
    from ...parallel.sharding import get_active_mesh

    if get_active_mesh() is not None:
        return False  # sharded serving: attention runs on the SPMD XLA path
    if cfg.use_alibi or cfg.n_head_kv_arr:
        return False  # ALiBi bias / per-layer heads use the masked path
    from ...runtime.kv_cache import KVCache

    return (
        t >= 8
        and t % 8 == 0
        and s % TS == 0
        and isinstance(cache, KVCache)
        and cfg.head_dim_k % 8 == 0
        and cfg.head_dim_v % 8 == 0
        and cfg.n_head % cfg.n_head_kv == 0
        and cfg.attn_logit_softcap >= 0.0
    )
