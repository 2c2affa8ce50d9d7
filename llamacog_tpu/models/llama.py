"""Llama-family forward pass (functional JAX).

Covers the llm_build_llama graph (reference src/llama-model.cpp:4691):
per layer RMS-norm → Q/K/V projections → RoPE → attention over the KV cache
→ output projection → residual → RMS-norm → SwiGLU FFN (or MoE) → residual;
final RMS-norm → LM head. GQA, optional QK-norm, MoE (build_moe_ffn,
src/llama-graph.cpp:642) included. Params are a plain pytree of dense arrays
and/or QuantTensors.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..ops.attention import masked_attention
from ..ops.linear import qmatmul
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope
from ..quant.planar import QuantTensor, decode
from ..runtime.kv_cache import KVCache
from .config import ModelConfig


def embed_tokens(params: dict, tokens: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    emb = params["tok_embd"]
    if isinstance(emb, QuantTensor):
        emb = decode(emb, dtype=dtype)  # [V, E]
    return jnp.take(emb, tokens, axis=0).astype(dtype)


def _ffn_swiglu(layer: dict, x: jnp.ndarray) -> jnp.ndarray:
    if "ffn_gate_up" in layer:
        gu = qmatmul(x, layer["ffn_gate_up"])
        gate, up = jnp.split(gu, 2, axis=-1)
    else:
        gate = qmatmul(x, layer["ffn_gate"])
        up = qmatmul(x, layer["ffn_up"])
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    return qmatmul(act, layer["ffn_down"])


def _ffn_moe(layer: dict, x: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Dense MoE: evaluate all experts, combine top-k by router weight.

    TPU-first choice: expert weights are stacked [n_expert, F, E]; a dense
    einsum over all experts maps onto the MXU with static shapes (the
    mul_mat_id gather is replaced by a weighted combine). Expert-parallel
    sharding splits the expert axis over the mesh.
    """
    B, T, E = x.shape
    n_exp, k = cfg.n_expert, cfg.n_expert_used
    logits = qmatmul(x, layer["ffn_gate_inp"]).astype(jnp.float32)  # [B,T,n_exp]
    if cfg.expert_gating_func == "sigmoid":
        probs = jax.nn.sigmoid(logits)
    else:
        probs = jax.nn.softmax(logits, axis=-1)
    if "exp_probs_b" in layer:  # DeepSeek-V3 group-selection bias
        sel = probs + layer["exp_probs_b"].astype(jnp.float32)
    else:
        sel = probs
    top_w, top_i = jax.lax.top_k(sel, k)  # [B,T,k]
    gate_w = jnp.take_along_axis(probs, top_i, axis=-1)  # weights from pre-bias probs
    if cfg.expert_weights_norm:
        gate_w = gate_w / (gate_w.sum(axis=-1, keepdims=True) + 1e-20)
    gate_w = gate_w * cfg.expert_weights_scale

    # dense evaluation of all experts
    wg = layer["ffn_gate_exps"]
    wu = layer["ffn_up_exps"]
    wd = layer["ffn_down_exps"]
    if isinstance(wg, QuantTensor):
        wg = decode(wg, dtype=x.dtype)
    if isinstance(wu, QuantTensor):
        wu = decode(wu, dtype=x.dtype)
    if isinstance(wd, QuantTensor):
        wd = decode(wd, dtype=x.dtype)
    # wg/wu: [n_exp, F, E], wd: [n_exp, E, F]
    gate = jnp.einsum("bte,nfe->btnf", x, wg)
    up = jnp.einsum("bte,nfe->btnf", x, wu)
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    expert_out = jnp.einsum("btnf,nef->btne", act, wd)  # [B,T,n_exp,E]
    # combine selected experts
    onehot = jax.nn.one_hot(top_i, n_exp, dtype=gate_w.dtype) * gate_w[..., None]  # [B,T,k,n]
    comb = onehot.sum(axis=2)  # [B,T,n_exp]
    out = jnp.einsum("btne,btn->bte", expert_out.astype(jnp.float32), comb)
    if "ffn_up_shexp" in layer:  # shared expert branch
        shexp = {
            "ffn_gate": layer["ffn_gate_shexp"],
            "ffn_up": layer["ffn_up_shexp"],
            "ffn_down": layer["ffn_down_shexp"],
        }
        out = out + _ffn_swiglu(shexp, x).astype(jnp.float32)
    return out.astype(x.dtype)


def forward(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [B, T]
    positions: jnp.ndarray,  # [B, T] absolute positions
    cache: KVCache,
    write_pos: jnp.ndarray,  # [B] cache write offsets
    mask: jnp.ndarray,  # [B, T, S] additive
    swa_mask: jnp.ndarray | None = None,  # [B, T, S] for SWA layers
    dtype=jnp.bfloat16,
    return_hidden: bool = False,
) -> tuple[jnp.ndarray, KVCache]:
    """Returns (logits [B, T, V] f32, updated cache); with return_hidden,
    the first element is the final-norm hidden state [B, T, E] instead
    (embeddings path, reference llama_context::encode pooling)."""
    B, T = tokens.shape
    H, Hkv = cfg.n_head, cfg.n_head_kv
    Dk, Dv = cfg.head_dim_k, cfg.head_dim_v
    scale = Dk**-0.5

    x = embed_tokens(params, tokens, dtype=dtype)
    for il, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], cfg.rms_norm_eps)
        if "attn_qkv" in layer:
            qkv = qmatmul(h, layer["attn_qkv"])
            q, k, v = jnp.split(qkv, [H * Dk, H * Dk + Hkv * Dk], axis=-1)
            q = q.reshape(B, T, H, Dk)
            k = k.reshape(B, T, Hkv, Dk)
            v = v.reshape(B, T, Hkv, Dv)
        else:
            q = qmatmul(h, layer["attn_q"]).reshape(B, T, H, Dk)
            k = qmatmul(h, layer["attn_k"]).reshape(B, T, Hkv, Dk)
            v = qmatmul(h, layer["attn_v"]).reshape(B, T, Hkv, Dv)
        if "attn_q_norm" in layer:
            q = rms_norm(q, layer["attn_q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k, layer["attn_k_norm"], cfg.rms_norm_eps)
        q = apply_rope(q, positions, cfg.rope)
        k = apply_rope(k, positions, cfg.rope)
        cache, k_all, v_all = cache.update(il, k, v, write_pos)
        m = swa_mask if (swa_mask is not None and cfg.is_swa(il)) else mask
        attn = masked_attention(
            q, k_all, v_all, m, scale, logit_softcap=cfg.attn_logit_softcap
        )
        attn = qmatmul(attn.reshape(B, T, H * Dv), layer["attn_output"])
        x = x + attn
        h = rms_norm(x, layer["ffn_norm"], cfg.rms_norm_eps)
        if cfg.n_expert > 0 and "ffn_gate_inp" in layer:
            ffn = _ffn_moe(layer, h, cfg)
        else:
            ffn = _ffn_swiglu(layer, h)
        x = x + ffn

    x = rms_norm(x, params["output_norm"], cfg.rms_norm_eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    out_w = params.get("output", params["tok_embd"])
    logits = qmatmul(x, out_w).astype(jnp.float32)
    if cfg.final_logit_softcap > 0.0:
        logits = cfg.final_logit_softcap * jnp.tanh(logits / cfg.final_logit_softcap)
    return logits, cache
