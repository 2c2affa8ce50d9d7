"""T5 encoder-decoder (functional JAX).

Covers the reference's llm_build_t5 / llama_encode path (src/llama-model.cpp
T5 builders; enc/dec tensor names src/llama-arch.cpp:1260-1289): T5-style
RMS norm (no mean subtraction), unscaled attention with bucketed relative
position biases (shared from layer 0), gated or plain ReLU FFN, causal
decoder with cross-attention over the encoder output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.linear import qmatmul
from ..ops.norms import rms_norm
from .config import ModelConfig
from .llama import embed_tokens


def rel_bucket(rel_pos: jnp.ndarray, bidirectional: bool, n_buckets: int,
               max_distance: int = 128) -> jnp.ndarray:
    """T5 relative position bucketing (HF _relative_position_bucket)."""
    ret = jnp.zeros_like(rel_pos)
    n = n_buckets
    if bidirectional:
        n = n // 2
        ret = ret + jnp.where(rel_pos > 0, n, 0)
        rel = jnp.abs(rel_pos)
    else:
        rel = -jnp.minimum(rel_pos, 0)
    max_exact = n // 2
    is_small = rel < max_exact
    val_large = max_exact + (
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact)
        * (n - max_exact)
    ).astype(rel.dtype)
    val_large = jnp.minimum(val_large, n - 1)
    return ret + jnp.where(is_small, rel, val_large)


def _rel_bias(rel_b: jnp.ndarray, q_pos: jnp.ndarray, k_pos: jnp.ndarray,
              bidirectional: bool, n_buckets: int) -> jnp.ndarray:
    """[H, Tq, Tk] additive bias from the bucket embedding [n_buckets, H]."""
    rel = k_pos[None, :] - q_pos[:, None]  # [Tq, Tk]
    buckets = rel_bucket(rel, bidirectional, n_buckets)
    return jnp.take(rel_b, buckets, axis=0).transpose(2, 0, 1)  # [H, Tq, Tk]


def _attn(q, k, v, bias, out_w):
    """Unscaled T5 attention. q/k/v [B,T,H,D]; bias [B,H,Tq,Tk] additive."""
    B, T, H, D = q.shape
    s = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32), k.astype(jnp.float32))
    p = jax.nn.softmax(s + bias, axis=-1)
    o = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))
    return qmatmul(o.reshape(B, T, -1).astype(q.dtype), out_w)


def _ffn(layer, x, cfg):
    if "ffn_gate" in layer:  # gated (flan-t5: gelu)
        gate = qmatmul(x, layer["ffn_gate"]).astype(jnp.float32)
        up = qmatmul(x, layer["ffn_up"])
        h = (jax.nn.gelu(gate, approximate=True) * up.astype(jnp.float32)).astype(x.dtype)
    else:  # original t5: relu
        up = qmatmul(x, layer["ffn_up"]).astype(jnp.float32)
        h = jax.nn.relu(up).astype(x.dtype)
    return qmatmul(h, layer["ffn_down"])


def t5_encode(params: dict, cfg: ModelConfig, tokens: jnp.ndarray,
              valid: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Encoder: [B, T] -> [B, T, E] (llama_encode role)."""
    B, T = tokens.shape
    H, Dk, Dv = cfg.n_head, cfg.head_dim_k, cfg.head_dim_v
    eps = cfg.rms_norm_eps
    x = embed_tokens(params, tokens, dtype=dtype)
    pos = jnp.arange(T)
    rel_b = params["enc_layers"][0]["attn_rel_b"]
    bias = _rel_bias(rel_b, pos, pos, True, rel_b.shape[0])[None]  # [1,H,T,T]
    pad = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)[:, None, None, :]
    bias = bias + pad
    for layer in params["enc_layers"]:
        h = rms_norm(x, layer["attn_norm"], eps)
        q = qmatmul(h, layer["attn_q"]).reshape(B, T, H, Dk)
        k = qmatmul(h, layer["attn_k"]).reshape(B, T, H, Dk)
        v = qmatmul(h, layer["attn_v"]).reshape(B, T, H, Dv)
        x = x + _attn(q, k, v, bias, layer["attn_o"])
        h = rms_norm(x, layer["ffn_norm"], eps)
        x = x + _ffn(layer, h, cfg)
    return rms_norm(x, params["enc_output_norm"], eps)


def t5_decode(params: dict, cfg: ModelConfig, tokens: jnp.ndarray,
              enc_out: jnp.ndarray, enc_valid: jnp.ndarray,
              dtype=jnp.float32) -> jnp.ndarray:
    """Decoder (full-sequence, no cache): [B, Td] + encoder output ->
    logits [B, Td, V]."""
    B, T = tokens.shape
    H, Dk, Dv = cfg.n_head, cfg.head_dim_k, cfg.head_dim_v
    eps = cfg.rms_norm_eps
    x = embed_tokens(params, tokens, dtype=dtype)
    pos = jnp.arange(T)
    rel_b = params["dec_layers"][0]["attn_rel_b"]
    bias = _rel_bias(rel_b, pos, pos, False, rel_b.shape[0])[None]
    causal = jnp.where(pos[None, :] <= pos[:, None], 0.0, -1e30).astype(jnp.float32)
    bias = bias + causal[None, None]
    xbias = jnp.where(enc_valid, 0.0, -1e30).astype(jnp.float32)[:, None, None, :]
    Te = enc_out.shape[1]
    for layer in params["dec_layers"]:
        h = rms_norm(x, layer["attn_norm"], eps)
        q = qmatmul(h, layer["attn_q"]).reshape(B, T, H, Dk)
        k = qmatmul(h, layer["attn_k"]).reshape(B, T, H, Dk)
        v = qmatmul(h, layer["attn_v"]).reshape(B, T, H, Dv)
        x = x + _attn(q, k, v, bias, layer["attn_o"])
        h = rms_norm(x, layer["cross_attn_norm"], eps)
        q = qmatmul(h, layer["cross_attn_q"]).reshape(B, T, H, Dk)
        k = qmatmul(enc_out.astype(h.dtype), layer["cross_attn_k"]).reshape(B, Te, H, Dk)
        v = qmatmul(enc_out.astype(h.dtype), layer["cross_attn_v"]).reshape(B, Te, H, Dv)
        x = x + _attn(q, k, v, xbias, layer["cross_attn_o"])
        h = rms_norm(x, layer["ffn_norm"], eps)
        x = x + _ffn(layer, h, cfg)
    x = rms_norm(x, params["dec_output_norm"], eps)
    out_w = params.get("output", params["tok_embd"])
    logits = qmatmul(x, out_w).astype(jnp.float32)
    if "output" not in params:
        logits = logits * (cfg.n_embd**-0.5)  # tied-embedding T5 rescale
    return logits


class T5Model:
    """Encode-then-decode wrapper with greedy generation."""

    def __init__(self, params: dict, cfg: ModelConfig, dtype=jnp.float32):
        self.params = params
        self.cfg = cfg

        @jax.jit
        def enc(params, toks, valid):
            return t5_encode(params, cfg, toks, valid, dtype=dtype)

        @jax.jit
        def dec(params, toks, enc_out, enc_valid):
            return t5_decode(params, cfg, toks, enc_out, enc_valid, dtype=dtype)

        self._enc = enc
        self._dec = dec

    def generate_greedy(self, input_ids: list[int], max_new_tokens: int,
                        decoder_start_id: int = 0, eos_id: int = 1) -> list[int]:
        toks = jnp.asarray(np.asarray(input_ids, np.int32)[None])
        valid = jnp.ones_like(toks, dtype=bool)
        enc = self._enc(self.params, toks, valid)
        out = [decoder_start_id]
        for _ in range(max_new_tokens):
            dec_in = jnp.asarray(np.asarray(out, np.int32)[None])
            logits = self._dec(self.params, dec_in, enc, valid)
            nxt = int(np.argmax(np.asarray(logits[0, -1])))
            out.append(nxt)
            if nxt == eos_id:
                break
        return out[1:]


def load_t5_params(reader, cfg: ModelConfig, load_tensor) -> dict:
    """Collect enc./dec. tensors (called from models.loader for arch t5)."""
    params: dict = {"enc_layers": [], "dec_layers": []}
    params["tok_embd"] = load_tensor("token_embd.weight")
    if (w := load_tensor("output.weight", optional=True)) is not None:
        params["output"] = w
    params["enc_output_norm"] = load_tensor("enc.output_norm.weight")
    params["dec_output_norm"] = load_tensor("dec.output_norm.weight")
    enc_names = ("attn_norm", "attn_q", "attn_k", "attn_v", "attn_o", "attn_rel_b",
                 "ffn_norm", "ffn_gate", "ffn_up", "ffn_down")
    dec_extra = ("cross_attn_norm", "cross_attn_q", "cross_attn_k", "cross_attn_v",
                 "cross_attn_o")
    for il in range(cfg.n_layer):
        layer = {}
        for nm in enc_names:
            if (w := load_tensor(f"enc.blk.{il}.{nm}.weight", optional=True)) is not None:
                layer[nm] = w
        params["enc_layers"].append(layer)
        layer = {}
        for nm in enc_names + dec_extra:
            if (w := load_tensor(f"dec.blk.{il}.{nm}.weight", optional=True)) is not None:
                layer[nm] = w
        params["dec_layers"].append(layer)
    # rel bias is stored on layer 0 only; share it
    for key in ("enc_layers", "dec_layers"):
        rb = params[key][0].get("attn_rel_b")
        if rb is not None:
            for layer in params[key][1:]:
                layer.setdefault("attn_rel_b", rb)
    return params
