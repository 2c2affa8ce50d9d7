"""BERT-family encoder (embeddings / rerankers), functional JAX.

Covers the reference's llm_build_bert (src/llama-model.cpp:6042): post-LN
transformer — token (+type +position) embeddings → embedding LayerNorm →
per layer [bidirectional attention → +residual → attn_output_norm →
FFN (gelu, biases) → +residual → layer_output_norm] — plus the rank/
classification head (`cls`/`cls.output` tensors) used by rerankers
(pooling_type RANK). nomic-bert swaps learned positions for rope.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.linear import qmatmul
from ..ops.norms import layer_norm
from ..ops.rope import apply_rope
from .config import ModelConfig
from .llama import embed_tokens


def encode(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [B, T]
    valid: jnp.ndarray,  # [B, T] bool attention mask (pad exclusion)
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Returns the final hidden states [B, T, E]."""
    B, T = tokens.shape
    H = cfg.n_head
    Dk, Dv = cfg.head_dim_k, cfg.head_dim_v
    scale = cfg.kq_scale
    eps = cfg.norm_eps

    x = embed_tokens(params, tokens, dtype=dtype)
    if "token_types" in params:  # token_type 0 embedding
        x = x + params["token_types"][0].astype(dtype)
    if "pos_embd" in params:
        pos = jnp.arange(T)
        x = x + jnp.take(params["pos_embd"], pos, axis=0).astype(dtype)
    x = layer_norm(x, params["tok_norm"], params.get("tok_norm_b"), eps)

    # bidirectional mask: attend to every valid token
    allow = valid[:, None, :] & valid[:, :, None]  # [B, T, T]
    bias = jnp.where(allow, 0.0, -1e30).astype(jnp.float32)
    positions = jnp.arange(T)[None, :].repeat(B, 0)

    for layer in params["layers"]:
        if "attn_qkv" in layer:
            qkv = qmatmul(x, layer["attn_qkv"])
            if "attn_qkv_b" in layer:
                qkv = qkv + layer["attn_qkv_b"].astype(qkv.dtype)
            q, k, v = jnp.split(qkv, [H * Dk, H * Dk + H * Dk], axis=-1)
        else:
            def lin(key):
                o = qmatmul(x, layer[key])
                b = layer.get(key + "_b")
                return o + b.astype(o.dtype) if b is not None else o

            q, k, v = lin("attn_q"), lin("attn_k"), lin("attn_v")
        q = q.reshape(B, T, H, Dk)
        k = k.reshape(B, T, H, Dk)
        v = v.reshape(B, T, H, Dv)
        if cfg.rope.enabled:  # nomic-bert
            q = apply_rope(q, positions, cfg.rope)
            k = apply_rope(k, positions, cfg.rope)
        s = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * scale
        p = jax.nn.softmax(s + bias[:, None], axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))
        o = o.reshape(B, T, H * Dv).astype(dtype)
        o = qmatmul(o, layer["attn_output"])
        if "attn_output_b" in layer:
            o = o + layer["attn_output_b"].astype(o.dtype)
        x = layer_norm(x + o, layer["attn_out_norm"], layer.get("attn_out_norm_b"), eps)
        # FFN (gelu MLP with biases; nomic uses gated)
        if "ffn_gate" in layer:
            gate = qmatmul(x, layer["ffn_gate"])
            up = qmatmul(x, layer["ffn_up"])
            h = jax.nn.silu(gate.astype(jnp.float32)).astype(dtype) * up
        else:
            up = qmatmul(x, layer["ffn_up"])
            if "ffn_up_b" in layer:
                up = up + layer["ffn_up_b"].astype(up.dtype)
            h = jax.nn.gelu(up.astype(jnp.float32), approximate=False).astype(dtype)
        h = qmatmul(h, layer["ffn_down"])
        if "ffn_down_b" in layer:
            h = h + layer["ffn_down_b"].astype(h.dtype)
        x = layer_norm(x + h, layer["layer_out_norm"], layer.get("layer_out_norm_b"), eps)
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
