"""Jamba-style hybrid model: interleaved attention + mamba layers sharing
one forward pass (functional JAX).

The reference ships the memory infrastructure for this (llama_memory_hybrid,
src/llama-memory-hybrid.{h,cpp}: attention-KV + recurrent state combined)
without a model wired to it; here the hybrid cache is a pytree holding a
KVCache for the attention layers and a RecurrentCache for the mamba layers,
and the layer loop dispatches on which tensors each layer carries
(`ssm_in` => mamba mixer, `attn_q`/`attn_qkv` => attention).

Jamba uses no positional encoding on its attention layers (rope disabled).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.attention import masked_attention
from ..ops.linear import qmatmul
from ..ops.norms import rms_norm
from .config import ModelConfig
from .llama import _ffn, _ffn_moe, embed_tokens
from .mamba import _mixer


@jax.tree_util.register_pytree_node_class
@dataclass
class HybridCache:
    """llama_memory_hybrid analog: KV for attention layers (indexed by a
    static per-layer slot map) + conv/ssm state for recurrent layers."""

    kv_k: jnp.ndarray  # [La, B, S, Hkv, Dk] — La = number of attention layers
    kv_v: jnp.ndarray
    conv: jnp.ndarray  # [Lm, B, d_conv-1, d_inner]
    ssm: jnp.ndarray  # [Lm, B, d_inner, d_state]

    def tree_flatten(self):
        return (self.kv_k, self.kv_v, self.conv, self.ssm), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def max_seq(self) -> int:
        return self.kv_k.shape[2]


def layer_kinds(params: dict) -> list[str]:
    return ["mamba" if "ssm_in" in l else "attn" for l in params["layers"]]


def make_hybrid_cache(cfg: ModelConfig, params: dict, batch: int, max_seq: int,
                      dtype=jnp.bfloat16) -> HybridCache:
    kinds = layer_kinds(params)
    n_attn = kinds.count("attn")
    n_mamba = kinds.count("mamba")
    return HybridCache(
        kv_k=jnp.zeros((n_attn, batch, max_seq, cfg.n_head_kv, cfg.head_dim_k), dtype),
        kv_v=jnp.zeros((n_attn, batch, max_seq, cfg.n_head_kv, cfg.head_dim_v), dtype),
        conv=jnp.zeros((n_mamba, batch, cfg.ssm_d_conv - 1, cfg.ssm_d_inner), jnp.float32),
        ssm=jnp.zeros((n_mamba, batch, cfg.ssm_d_inner, cfg.ssm_d_state), jnp.float32),
    )


def forward(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [B, T] (exact length — mamba state advances per token)
    cache: HybridCache,
    write_pos: jnp.ndarray,  # [B] attention-KV write offsets (= valid old len)
    active: jnp.ndarray,  # [B] rows whose state should advance
    dtype=jnp.bfloat16,
    return_hidden: bool = False,
):
    from ..runtime.kv_cache import build_causal_mask

    B, T = tokens.shape
    H, Hkv = cfg.n_head, cfg.n_head_kv
    Dk, Dv = cfg.head_dim_k, cfg.head_dim_v
    S = int(cache.max_seq)
    mask = build_causal_mask(write_pos, T, S, seq_len=write_pos)
    ti = jnp.arange(T)
    intra = jnp.where(ti[None, :] <= ti[:, None], 0.0, -jnp.inf).astype(jnp.float32)

    x = embed_tokens(params, tokens, dtype=dtype)
    new_ks, new_vs, new_conv, new_ssm = [], [], [], []
    ia = im = 0
    for layer in params["layers"]:
        h = rms_norm(x, layer["attn_norm"], cfg.rms_norm_eps)
        if "ssm_in" in layer:
            y, conv_l, ssm_l = _mixer(layer, h, cache.conv[im], cache.ssm[im], cfg)
            keep = active[:, None, None]
            new_conv.append(jnp.where(keep, conv_l, cache.conv[im]))
            new_ssm.append(jnp.where(keep, ssm_l, cache.ssm[im]))
            x = x + y.astype(dtype)
            im += 1
        else:
            if "attn_qkv" in layer:
                qkv = qmatmul(h, layer["attn_qkv"])
                q, k, v = jnp.split(qkv, [H * Dk, H * Dk + Hkv * Dk], axis=-1)
            else:
                q = qmatmul(h, layer["attn_q"])
                k = qmatmul(h, layer["attn_k"])
                v = qmatmul(h, layer["attn_v"])
            q = q.reshape(B, T, H, Dk)
            k = k.reshape(B, T, Hkv, Dk)
            v = v.reshape(B, T, Hkv, Dv)
            # no rope: jamba attention is NoPE
            new_ks.append(k)
            new_vs.append(v)
            attn = masked_attention(
                q, cache.kv_k[ia], cache.kv_v[ia], mask, cfg.kq_scale,
                k_cur=k, v_cur=v, intra_mask=intra,
            )
            x = x + qmatmul(attn.reshape(B, T, H * Dv), layer["attn_output"])
            ia += 1
        hf = rms_norm(x, layer["ffn_norm"], cfg.rms_norm_eps) if "ffn_norm" in layer else x
        if cfg.n_expert > 0 and "ffn_gate_inp" in layer:
            ffn = _ffn_moe(layer, hf, cfg)
        else:
            ffn = _ffn(layer, hf, cfg)
        x = x + ffn

    # bulk writes: one DUS per state kind
    if new_ks:
        def write_row(kc, vc, kn, vn, pos):
            kc = jax.lax.dynamic_update_slice(kc, kn.astype(kc.dtype), (0, pos, 0, 0))
            vc = jax.lax.dynamic_update_slice(vc, vn.astype(vc.dtype), (0, pos, 0, 0))
            return kc, vc

        kv_k, kv_v = jax.vmap(write_row, in_axes=(1, 1, 1, 1, 0), out_axes=(1, 1))(
            cache.kv_k, cache.kv_v, jnp.stack(new_ks), jnp.stack(new_vs), write_pos
        )
    else:
        kv_k, kv_v = cache.kv_k, cache.kv_v
    cache = HybridCache(
        kv_k, kv_v,
        jnp.stack(new_conv) if new_conv else cache.conv,
        jnp.stack(new_ssm) if new_ssm else cache.ssm,
    )
    x = rms_norm(x, params["output_norm"], cfg.rms_norm_eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    out_w = params.get("output", params["tok_embd"])
    logits = qmatmul(x, out_w).astype(jnp.float32)
    return logits, cache
