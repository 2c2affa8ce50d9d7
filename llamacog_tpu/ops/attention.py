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
    if (T == 1 and q.shape[0] == 1 and alibi_slopes is None
            and logit_softcap == 0.0 and v.shape[-1] == Dk and rep > 1):
        # Single-stream only. At B>=8 the flat path loses either way
        # (measured on the 8B config, grouped 13.9 ms/step at B=8):
        # f32 operands materialize B x S*Hkv x D x 4-byte cache casts
        # (+0.5 ms), and bf16 operands with f32 accumulation still pay
        # the 8x-redundant flattened reads (+0.5 ms) — the grouped
        # einsum's per-op overhead amortizes over the batch instead.
        return _decode_attention_flat(q, k, v, mask, scale, k_cur, v_cur)
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


def _decode_attention_flat(q, k, v, mask, scale, k_cur, v_cur,
                           ct=jnp.float32):
    """T=1 GQA decode as TWO single matmuls per layer.

    The grouped einsum (bthrd,bshd->bhrts) lowers to one small MXU op per
    kv head; at 32 layers x 8 groups x 2 (QK+PV) those fixed costs measure
    ~2 ms/step on the 8B config. Flattening the cache to [S*Hkv, D] turns
    each of QK and PV into ONE [H, D] x [D, S*Hkv] matmul, with a STATIC
    block mask (column j belongs to kv head j % Hkv) making the off-group
    scores -inf — exp() zeros them exactly, so PV over the flat axis equals
    the grouped result. ~8x redundant MAC work, which is negligible at
    decode shapes, for ~10x fewer attention ops per step."""
    B, T, H, Dk = q.shape
    S, Hkv, _ = k.shape[1], k.shape[2], k.shape[3]
    rep = H // Hkv
    Dv = v.shape[-1]
    qf = q.astype(ct).reshape(B, H, Dk)
    cols = [k.astype(ct).reshape(B, S * Hkv, Dk)]
    vcols = [v.astype(ct).reshape(B, S * Hkv, Dv)]
    valid = [jnp.repeat(mask[:, 0] > -1e29, Hkv, axis=-1)]  # [B, S*Hkv]
    if k_cur is not None:
        cols.append(k_cur.astype(ct).reshape(B, Hkv, Dk))
        vcols.append(v_cur.astype(ct).reshape(B, Hkv, Dv))
        valid.append(jnp.ones((B, Hkv), bool))  # self-attend always allowed
    kf = jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]
    vf = jnp.concatenate(vcols, axis=1) if len(vcols) > 1 else vcols[0]
    ok = jnp.concatenate(valid, axis=1) if len(valid) > 1 else valid[0]
    J = kf.shape[1]
    # static block-diagonal group mask: flat column j -> kv head j % Hkv
    group = (jnp.arange(J) % Hkv)[None, :] == (jnp.arange(H) // rep)[:, None]
    scores = jnp.einsum("bhd,bjd->bhj", qf, kf,
                        preferred_element_type=jnp.float32) * scale
    scores = jnp.where(group[None] & ok[:, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)  # off-group exp(-1e30) == 0
    out = jnp.einsum("bhj,bjd->bhd", probs.astype(ct), vf,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, 1, H, Dv).astype(q.dtype)
