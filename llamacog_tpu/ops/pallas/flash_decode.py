"""Fused decode attention (Pallas TPU): one kernel per layer computes
masked scores over the cache + the current token, softmax, and the V
reduction (role of the reference's fattn vec kernels, ggml-cuda/fattn*.cu).

Decode attention is tiny in FLOPs/bytes; the win is collapsing ~15 XLA ops
(two einsums, mask concat, softmax, two output einsums) into one kernel —
per-op dispatch dominates single-stream decode.

Shapes (T=1 decode): q [B, H, Dk], cache k/v [B, S, Hkv, D*], current
k/v [B, Hkv, D*], seq_len [B] (valid old length). GQA via reshape
H = Hkv * rep. Grid over B; each step holds one row's KV in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(hkv, rep, scale, softcap, window,
            q_ref, k_ref, v_ref, kc_ref, vc_ref, len_ref, o_ref):
    S = k_ref.shape[1]
    dk = q_ref.shape[-1]
    dv = v_ref.shape[-1]
    # whole [B,1] SMEM array per step (Mosaic rejects a (1,1) sub-block)
    n = len_ref[pl.program_id(0), 0]  # valid old length for this row
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    valid = pos < n
    if window > 0:
        valid = valid & (pos > n - window)
    neg = jnp.float32(-1e30)

    for h in range(hkv):
        q_h = q_ref[0, h * rep : (h + 1) * rep, :].astype(jnp.float32)  # [rep, Dk]
        k_h = k_ref[0, :, h, :].astype(jnp.float32)  # [S, Dk]
        s_old = jax.lax.dot_general(
            q_h, k_h, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [rep, S]
        kc_h = kc_ref[0, h, :].astype(jnp.float32)  # [Dk]
        s_cur = jnp.sum(q_h * kc_h[None, :], axis=-1, keepdims=True) * scale  # [rep,1]
        if softcap > 0.0:
            s_old = softcap * jnp.tanh(s_old / softcap)
            s_cur = softcap * jnp.tanh(s_cur / softcap)
        s_old = jnp.where(valid, s_old, neg)
        m = jnp.maximum(jnp.max(s_old, axis=-1, keepdims=True), s_cur)
        e_old = jnp.exp(s_old - m)
        e_cur = jnp.exp(s_cur - m)
        denom = jnp.sum(e_old, axis=-1, keepdims=True) + e_cur
        v_h = v_ref[0, :, h, :].astype(jnp.float32)  # [S, Dv]
        out = jax.lax.dot_general(
            e_old, v_h, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rep, Dv]
        out = out + e_cur * vc_ref[0, h, :].astype(jnp.float32)[None, :]
        o_ref[0, h * rep : (h + 1) * rep, :] = (out / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "softcap", "window", "interpret")
)
def flash_decode_attention(
    q: jnp.ndarray,  # [B, H, Dk]
    k: jnp.ndarray,  # [B, S, Hkv, Dk] old cache
    v: jnp.ndarray,  # [B, S, Hkv, Dv]
    k_cur: jnp.ndarray,  # [B, Hkv, Dk] this step's key
    v_cur: jnp.ndarray,  # [B, Hkv, Dv]
    seq_len: jnp.ndarray,  # [B] int32 valid old length
    scale: float,
    softcap: float = 0.0,
    window: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:  # [B, H, Dv]
    B, H, Dk = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    Dv = v.shape[-1]
    rep = H // Hkv
    kern = functools.partial(_kernel, Hkv, rep, scale, softcap, window)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, H, Dv), q.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Dk), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Hkv, Dk), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Hkv, Dv), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, Dk), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, Dv), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, H, Dv), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v, k_cur, v_cur, seq_len.reshape(B, 1))


def supported(cfg, cache, t: int) -> bool:
    from ...parallel.sharding import get_active_mesh

    if get_active_mesh() is not None:
        return False  # sharded serving: attention runs on the SPMD XLA path
    if cfg.use_alibi or cfg.n_head_kv_arr:
        return False  # ALiBi bias / per-layer heads use the masked path
    """Use the fused kernel only on the plain decode shape, and only when
    opted in: measured on v5e, XLA's fused einsum+softmax attention beats
    this kernel's per-head loop at decode shapes (616 vs 556 t/s on the 1B
    bench), so the default stays with XLA."""
    import os

    from ...runtime.kv_cache import KVCache

    if os.environ.get("LLAMACOG_FLASH_DECODE", "0") != "1":
        return False
    return (
        t == 1
        and isinstance(cache, KVCache)
        and cfg.head_dim_k % 8 == 0
        and cfg.head_dim_v % 8 == 0
        and cfg.n_head % cfg.n_head_kv == 0
    )
