"""BERT-family encoders (embeddings / rerankers), functional JAX.

Covers the reference's llm_build_bert (src/llama-model.cpp:6042) — the
post-LN encoder shared by bert / nomic-bert / nomic-bert-moe / jina-bert-v2 —
and llm_build_neo_bert (:6228), the pre-norm RMS variant. Per-arch deltas
(all keyed off ModelConfig flags set in config._apply_arch_defaults):

- bert: token-type + learned position embeddings, GELU FFN with biases.
- nomic-bert: NEOX rope instead of positions, silu-gated parallel FFN.
- nomic-bert-moe: rope + qkv biases; layers with il % moe_every_n_layers == 1
  use a gateless-GELU MoE (build_moe_ffn with no gate_exps, :6171-6182),
  softmax router, no weight renorm.
- jina-bert-v2: ALiBi (mask = -|Δpos|, slopes from max_alibi_bias 8.0,
  llama-graph.cpp:268-270), optional full-width q/k LayerNorms, optional
  attn_norm_2 second residual norm, GELU-gated or GEGLU-split FFN (:6191).
- neo-bert: pre-norm RMS, fused bias-free qkv, NORM (interleaved) rope,
  packed-swiglu FFN (single ffn_up of width 2*n_ff, split in half —
  LLM_FFN_SWIGLU, llama-graph.cpp:583), final enc.output_norm.

Plus the rank/classification head (`cls`/`cls.output`) used by rerankers
(pooling_type RANK).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.linear import qmatmul
from ..ops.norms import layer_norm, rms_norm
from ..ops.rope import apply_rope
from .config import ModelConfig
from .llama import _alibi_slopes, _moe_router, embed_tokens


def _moe_ffn_gateless(layer: dict, x: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """nomic-bert-moe FFN: softmax top-k router, experts = down(gelu(up(x))),
    top-k probabilities used as-is (build_moe_ffn norm_w=false). Encoders run
    at prefill shapes where most experts are hit, so the dense all-expert
    einsum (MXU-friendly, EP-shardable) is the right evaluation strategy."""
    top_i, gate_w = _moe_router(layer, x, cfg)  # [B,T,k]
    wu, wd = layer["ffn_up_exps"], layer["ffn_down_exps"]
    onehot = jax.nn.one_hot(top_i, cfg.n_expert, dtype=gate_w.dtype) * gate_w[..., None]
    comb = onehot.sum(axis=2)  # [B,T,n_exp]
    up = jnp.einsum("bte,nfe->btnf", x, wu)
    act = jax.nn.gelu(up.astype(jnp.float32), approximate=True).astype(x.dtype)
    expert_out = jnp.einsum("btnf,nef->btne", act, wd)
    return jnp.einsum("btne,btn->bte", expert_out.astype(jnp.float32), comb)


def encode(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [B, T]
    valid: jnp.ndarray,  # [B, T] bool attention mask (pad exclusion)
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Returns the final hidden states [B, T, E]."""
    B, T = tokens.shape
    H, Hkv = cfg.n_head, cfg.n_head_kv
    Dk, Dv = cfg.head_dim_k, cfg.head_dim_v
    scale = cfg.kq_scale
    eps = cfg.norm_eps
    neo = cfg.arch == "neo-bert"
    jina = cfg.arch == "jina-bert-v2"

    x = embed_tokens(params, tokens, dtype=dtype)
    if not neo:
        if "token_types" in params:  # token_type 0 embedding
            x = x + params["token_types"][0].astype(dtype)
        if "pos_embd" in params:
            pos = jnp.arange(T)
            x = x + jnp.take(params["pos_embd"], pos, axis=0).astype(dtype)
        x = layer_norm(x, params["tok_norm"], params.get("tok_norm_b"), eps)

    # bidirectional mask: attend to every valid token; ALiBi adds
    # slope_h * -|i-j| (llm_graph_input_attn_no_cache::set_input)
    allow = valid[:, None, :] & valid[:, :, None]  # [B, T, T]
    bias = jnp.where(allow, 0.0, -1e30).astype(jnp.float32)[:, None]  # [B,1,T,T]
    if cfg.use_alibi:
        idx = jnp.arange(T)
        dist = -jnp.abs(idx[:, None] - idx[None, :]).astype(jnp.float32)
        slopes = _alibi_slopes(H, cfg.max_alibi_bias)
        bias = bias + slopes[None, :, None, None] * dist[None, None]
    positions = jnp.arange(T)[None, :].repeat(B, 0)

    for il, layer in enumerate(params["layers"]):
        inp = x
        if neo:  # pre-norm
            x = rms_norm(x, layer["attn_norm"], cfg.rms_norm_eps)
        if "attn_qkv" in layer:
            qkv = qmatmul(x, layer["attn_qkv"])
            if "attn_qkv_b" in layer:
                qkv = qkv + layer["attn_qkv_b"].astype(qkv.dtype)
            q, k, v = jnp.split(qkv, [H * Dk, H * Dk + Hkv * Dk], axis=-1)
        else:
            def lin(key):
                o = qmatmul(x, layer[key])
                b = layer.get(key + "_b")
                return o + b.astype(o.dtype) if b is not None else o

            q, k, v = lin("attn_q"), lin("attn_k"), lin("attn_v")
        if "attn_q_norm" in layer:  # jina: LN over the full q/k projections
            q = layer_norm(q, layer["attn_q_norm"], layer.get("attn_q_norm_b"), eps)
        if "attn_k_norm" in layer:
            k = layer_norm(k, layer["attn_k_norm"], layer.get("attn_k_norm_b"), eps)
        q = q.reshape(B, T, H, Dk)
        k = k.reshape(B, T, Hkv, Dk)
        v = v.reshape(B, T, Hkv, Dv)
        if cfg.rope.enabled:  # nomic-bert (NEOX) / neo-bert (NORM)
            q = apply_rope(q, positions, cfg.rope)
            k = apply_rope(k, positions, cfg.rope)
        if Hkv != H:  # GQA broadcast
            k = jnp.repeat(k, H // Hkv, axis=2)
            v = jnp.repeat(v, H // Hkv, axis=2)
        s = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * scale
        p = jax.nn.softmax(s + bias, axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))
        o = o.reshape(B, T, H * Dv).astype(dtype)
        o = qmatmul(o, layer["attn_output"])
        if "attn_output_b" in layer:
            o = o + layer["attn_output_b"].astype(o.dtype)

        if neo:
            x = inp + o
            ffn_inp = x
            h = rms_norm(x, layer["ffn_norm"], cfg.rms_norm_eps)
            # [.., 2*n_ff] packed swiglu (loader renames 2x-wide ffn_up)
            up = qmatmul(h, layer.get("ffn_gate_up", layer.get("ffn_up")))
            x0, x1 = jnp.split(up, 2, axis=-1)
            h = (jax.nn.silu(x0.astype(jnp.float32)) * x1.astype(jnp.float32)).astype(dtype)
            h = qmatmul(h, layer["ffn_down"])
            x = ffn_inp + h
            continue

        # post-LN path (bert/nomic/jina)
        x = layer_norm(inp + o, layer["attn_out_norm"], layer.get("attn_out_norm_b"), eps)
        if "attn_norm_2" in layer:  # jina: second residual + norm
            x = layer_norm(x + inp, layer["attn_norm_2"], layer.get("attn_norm_2_b"), eps)
        ffn_inp = x
        if (cfg.moe_every_n_layers > 0
                and il % cfg.moe_every_n_layers == 1):  # nomic-bert-moe
            h = _moe_ffn_gateless(layer, x, cfg).astype(dtype)
        else:
            if "ffn_gate" in layer or "ffn_gate_up" in layer:
                if "ffn_gate_up" in layer:  # loader-fused [gate; up]
                    gu = qmatmul(x, layer["ffn_gate_up"])
                    gate, up = jnp.split(gu, 2, axis=-1)
                    gate = gate.astype(jnp.float32)
                else:
                    gate = qmatmul(x, layer["ffn_gate"]).astype(jnp.float32)
                    up = qmatmul(x, layer["ffn_up"])
                # jina gates with GELU (LLM_FFN_GELU, :6193); nomic with silu.
                # GEGLU (gateless jina, doubled ffn_up split in half,
                # llama-graph.cpp:597) lands here too via the loader's
                # 2x-row-count detection — same gelu(x0)*x1 math.
                act = (jax.nn.gelu(gate, approximate=True) if jina
                       else jax.nn.silu(gate)).astype(dtype)
                h = act * up
            else:
                up = qmatmul(x, layer["ffn_up"])
                if "ffn_up_b" in layer:
                    up = up + layer["ffn_up_b"].astype(up.dtype)
                h = jax.nn.gelu(up.astype(jnp.float32), approximate=False).astype(dtype)
            h = qmatmul(h, layer["ffn_down"])
            if "ffn_down_b" in layer:
                h = h + layer["ffn_down_b"].astype(h.dtype)
        x = layer_norm(ffn_inp + h, layer["layer_out_norm"], layer.get("layer_out_norm_b"), eps)
    if neo:
        x = rms_norm(x, params["output_norm_enc"], cfg.rms_norm_eps)
    return x


def pool(hidden: np.ndarray, valid: np.ndarray, pooling: str = "mean") -> np.ndarray:
    """[B, T, E] -> [B, E] per llama pooling types (mean/cls/last)."""
    h = np.asarray(hidden, np.float32)
    v = np.asarray(valid, np.float32)[..., None]
    if pooling == "mean":
        return (h * v).sum(1) / np.maximum(v.sum(1), 1.0)
    if pooling == "cls":
        return h[:, 0]
    if pooling == "last":
        idx = np.asarray(valid).sum(1).astype(int) - 1
        return h[np.arange(h.shape[0]), idx]
    raise ValueError(pooling)


def rank_score(params: dict, hidden: jnp.ndarray) -> np.ndarray:
    """Reranker head (pooling_type RANK, llama-context pooling): CLS hidden →
    cls dense+tanh → cls.output → scalar relevance per sequence."""
    h = hidden[:, 0].astype(jnp.float32)  # CLS token
    if "cls" in params:
        h = jnp.tanh(h @ params["cls"].T + params.get("cls_b", 0.0))
    if "cls_out" in params:
        h = h @ params["cls_out"].T + params.get("cls_out_b", 0.0)
    return np.asarray(h[..., 0] if h.ndim > 1 else h)


class BertEncoder:
    """Jitted encoder wrapper (the encoder-model analog of runtime.Engine)."""

    def __init__(self, params: dict, cfg: ModelConfig, dtype=jnp.float32):
        import functools

        self.params = params
        self.cfg = cfg

        @functools.partial(jax.jit, static_argnames=("t",))
        def run(params, tokens, valid, t):
            return encode(params, cfg, tokens, valid, dtype=dtype)

        self._run = run

    def _pad(self, batches: list[list[int]]):
        B = len(batches)
        T = max(8, max(len(b) for b in batches))
        T = -(-T // 8) * 8  # pad to 8 for tiling
        toks = np.zeros((B, T), np.int32)
        valid = np.zeros((B, T), bool)
        for i, b in enumerate(batches):
            toks[i, : len(b)] = b
            valid[i, : len(b)] = True
        return toks, valid, T

    def hidden(self, batches: list[list[int]]):
        toks, valid, T = self._pad(batches)
        h = self._run(self.params, jnp.asarray(toks), jnp.asarray(valid), t=T)
        return h, valid

    def embed(self, batches: list[list[int]], pooling: str = "mean") -> np.ndarray:
        h, valid = self.hidden(batches)
        return pool(np.asarray(h), valid, pooling)

    def rank(self, batches: list[list[int]]) -> np.ndarray:
        """Relevance scores via the cls head (pooling_type RANK)."""
        h, _ = self.hidden(batches)
        return rank_score(self.params, h)
