"""Attention over a static KV cache with an additive mask.

The additive mask is *the* mechanism (causality + per-sequence membership +
SWA are all encoded in it), mirroring the reference design where
set_input_kq_mask builds the mask host-side
(src/llama-kv-cache-unified.cpp). Softmax runs in f32
(ggml_flash_attn_ext_set_prec F32, src/llama-graph.cpp:1052).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_attention(
    q: jnp.ndarray,  # [B, T, H, Dk]
    k: jnp.ndarray,  # [B, S, Hkv, Dk]
    v: jnp.ndarray,  # [B, S, Hkv, Dv]
    mask: jnp.ndarray,  # [B, T, S] additive (0 or -inf), f32
    scale: float,
    logit_softcap: float = 0.0,
    k_cur: jnp.ndarray | None = None,  # [B, T, Hkv, Dk] this step's keys
    v_cur: jnp.ndarray | None = None,
    intra_mask: jnp.ndarray | None = None,  # [T, T] additive, within-block
    alibi_slopes: jnp.ndarray | None = None,  # [H]: scores += slope*mask,
    # where the mask holds -|pos_q - pos_k| in allowed cells (ggml
    # soft_max_ext max_bias semantics; set_input_kq_mask use_alibi values)
) -> jnp.ndarray:  # [B, T, H, Dv]
    """Attention over the (old) cache plus, optionally, the current block's
    keys/values handled explicitly. Splitting "old cache" from "current
    tokens" lets the KV write be deferred to one bulk update per step
    instead of a read-modify-write per layer (the decode-time hot spot)."""
    B, T, H, Dk = q.shape
    Hkv = k.shape[2]
    rep = H // Hkv
    qf = q.astype(jnp.float32).reshape(B, T, Hkv, rep, Dk)
    kf = k.astype(jnp.float32)
    scores = jnp.einsum("bthrd,bshd->bhrts", qf, kf) * scale  # [B,Hkv,rep,T,S]
    if k_cur is not None:
        sc_cur = jnp.einsum(
            "bthrd,bshd->bhrts", qf, k_cur.astype(jnp.float32)
        ) * scale  # [B,Hkv,rep,T,T]
        scores = jnp.concatenate([scores, sc_cur], axis=-1)
    if logit_softcap > 0.0:
        scores = logit_softcap * jnp.tanh(scores / logit_softcap)
    # select (not add) the mask: masked cache slots may hold garbage —
    # including NaN from fully-masked pad rows — which must not reach the
    # softmax. The finite floor keeps fully-masked rows NaN-free (uniform
    # garbage that downstream masking discards).
    full_mask = mask
    if k_cur is not None:
        im = intra_mask if intra_mask is not None else jnp.zeros((T, T), jnp.float32)
        if im.ndim == 2:  # chunked-SWA intra masks are per-row [B,T,T]
            im = im[None]
        full_mask = jnp.concatenate(
            [mask, jnp.broadcast_to(im, (B, T, T))], axis=-1
        )
    allowed = full_mask[:, None, None, :, :] > -1e29
    if alibi_slopes is not None:
        sl = alibi_slopes.astype(jnp.float32).reshape(1, Hkv, rep, 1, 1)
        scores = scores + sl * full_mask[:, None, None, :, :]
    scores = jnp.where(allowed, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    vf = v.astype(jnp.float32)
    if k_cur is not None:
        S = k.shape[1]
        out = jnp.einsum("bhrts,bshd->bthrd", probs[..., :S], vf)
        out = out + jnp.einsum(
            "bhrts,bshd->bthrd", probs[..., S:], v_cur.astype(jnp.float32)
        )
    else:
        out = jnp.einsum("bhrts,bshd->bthrd", probs, vf)
    return out.reshape(B, T, H, -1).astype(q.dtype)
