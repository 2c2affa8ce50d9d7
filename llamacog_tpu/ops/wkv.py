"""RWKV time-mixing recurrences (wkv6, wkv7) as jax scans.

The reference implements these as sequential per-token CPU/CUDA kernels
(ggml-cpu/ops.cpp ggml_compute_forward_rwkv_wkv6_f32 :8127, _wkv7 :8546).
On TPU the head-state update is a small outer-product recurrence: per head a
[D, D] state matrix evolves once per token, so the natural mapping is a
`lax.scan` over time with all heads/batches updated in parallel on the VPU —
there is no KV cache and no attention; the state IS the memory (the
reference's llama_memory_recurrent holds it, src/llama-memory-recurrent.h).

State is always f32 (the recurrence is numerically long-lived).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def wkv6(k, v, r, u, w, state):
    """RWKV v6 linear-attention recurrence.

    k, v, r, w: [B, T, H, D]; u (time_first): [H, D]; state: [B, H, D, D]
    with state[i, j] pairing key-dim i with value-dim j.

    Per token (ops.cpp :8280-8317):
        out_j = sum_i r_i * (u_i * k_i * v_j + S_ij)
        S_ij  = S_ij * w_i + k_i * v_j

    Returns (out [B, T, H, D], state [B, H, D, D]).
    """
    kT, vT, rT, wT = (jnp.moveaxis(t.astype(jnp.float32), 1, 0) for t in (k, v, r, w))
    uf = u.astype(jnp.float32)

    def step(S, inp):
        k_t, v_t, r_t, w_t = inp  # [B, H, D]
        kv = k_t[..., :, None] * v_t[..., None, :]  # [B, H, D, D]
        out = jnp.einsum("bhi,bhij->bhj", r_t, uf[..., :, None] * kv + S)
        S = S * w_t[..., :, None] + kv
        return S, out

    S, outs = jax.lax.scan(step, state.astype(jnp.float32), (kT, vT, rT, wT))
    return jnp.moveaxis(outs, 0, 1), S


def wkv7(r, w, k, v, a, b, state):
    """RWKV v7 ("Goose") recurrence.

    r, w, k, v, a, b: [B, T, H, D]; state: [B, H, D, D] with state[i, j]
    pairing value-dim i with key-dim j (the model passes a = -kk and
    b = kk * iclr, llama-model.cpp :12401).

    Per token (ops.cpp :8546, scalar tail):
        sa_i  = sum_j a_j * S_ij
        S_ij  = S_ij * w_j + v_i * k_j + sa_i * b_j
        out_i = sum_j S_ij * r_j

    Returns (out [B, T, H, D], state [B, H, D, D]).
    """
    rT, wT, kT, vT, aT, bT = (
        jnp.moveaxis(t.astype(jnp.float32), 1, 0) for t in (r, w, k, v, a, b)
    )

    def step(S, inp):
        r_t, w_t, k_t, v_t, a_t, b_t = inp  # [B, H, D]
        sa = jnp.einsum("bhij,bhj->bhi", S, a_t)
        S = (
            S * w_t[..., None, :]
            + v_t[..., :, None] * k_t[..., None, :]
            + sa[..., :, None] * b_t[..., None, :]
        )
        out = jnp.einsum("bhij,bhj->bhi", S, r_t)
        return S, out

    S, outs = jax.lax.scan(step, state.astype(jnp.float32), (rT, wT, kT, vT, aT, bT))
    return jnp.moveaxis(outs, 0, 1), S


def gated_linear_attn(k, v, q, g, state, scale: float):
    """Gated linear attention (rwkv6qwen2's time mix; ggml_gated_linear_attn,
    ops.cpp ggml_compute_forward_gla_f32 :8343).

    k, v, q, g: [B, T, H, D]; state: [B, H, D, D] (i = key dim, j = value
    dim). Per token:
        S_ij  = S_ij * g_i + k_i * v_j
        out_j = scale * sum_i q_i * S_ij      (reads the NEW state)
    """
    kT, vT, qT, gT = (jnp.moveaxis(t.astype(jnp.float32), 1, 0) for t in (k, v, q, g))
    sc = jnp.float32(scale)

    def step(S, inp):
        k_t, v_t, q_t, g_t = inp  # [B, H, D]
        S = S * g_t[..., :, None] + k_t[..., :, None] * v_t[..., None, :]
        out = jnp.einsum("bhi,bhij->bhj", q_t * sc, S)
        return S, out

    S, outs = jax.lax.scan(step, state.astype(jnp.float32), (kT, vT, qT, gT))
    return jnp.moveaxis(outs, 0, 1), S
