"""RWKV v6 / v7 model family (functional JAX).

Graphs follow the reference builders llm_build_rwkv6 / llm_build_rwkv7
(src/llama-model.cpp :11912-12165 and :12308-12530): layer-norm everywhere
(with biases), token-shift states feeding the lerp mixes, the wkv6/wkv7
head-state recurrence (ops/wkv.py), per-head group-norm on the time-mix
output, and the squared-ReLU channel mix. State per layer is a [2, n_embd]
token-shift pair (att, ffn) plus the [H, D, D] wkv matrix — the reference's
llama_memory_recurrent slots.

Tensor names per llama-arch.cpp LLM_ARCH_RWKV6 (:1362) / LLM_ARCH_RWKV7
(:1424). The qwen2-hybrid variants are covered too: rwkv6qwen2
(llm_build_rwkv6qwen2 :12187 — RMS norms, single token shift, qwen2 FFN,
no time_mix_first -> gated linear attention) and arwkv7
(llm_build_arwkv7 :12540 — rwkv7 time mix inside a qwen2 layer).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.linear import qmatmul
from ..ops.norms import layer_norm, rms_norm
from ..ops.wkv import gated_linear_attn, wkv6, wkv7
from .config import ModelConfig
from .llama import _ffn, embed_tokens

GROUP_NORM_EPS = 64e-5  # ggml_norm eps in build_rwkv*_time_mix (:12073)


@jax.tree_util.register_pytree_node_class
@dataclass
class RwkvCache:
    """Recurrent state: token-shift pairs + per-head wkv matrices."""

    shift: jnp.ndarray  # [L, B, 2, n_embd] f32 (att shift, ffn shift)
    wkv: jnp.ndarray  # [L, B, H, D, D] f32

    def tree_flatten(self):
        return (self.shift, self.wkv), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def make_rwkv_cache(cfg: ModelConfig, batch_size: int, dtype=jnp.float32):
    D = cfg.wkv_head_size
    H = cfg.n_embd // D
    return RwkvCache(
        shift=jnp.zeros((cfg.n_layer, batch_size, 2, cfg.n_embd), jnp.float32),
        wkv=jnp.zeros((cfg.n_layer, batch_size, H, D, D), jnp.float32),
    )


def _group_norm(x, ln_w, ln_b, H):
    """ggml_norm over each head's channels (eps 64e-5), then the learned
    time_mix_ln scale/bias on the flattened vector."""
    B, T, E = x.shape
    xh = x.reshape(B, T, H, E // H)
    mu = xh.mean(-1, keepdims=True)
    var = ((xh - mu) ** 2).mean(-1, keepdims=True)
    xh = (xh - mu) * jax.lax.rsqrt(var + GROUP_NORM_EPS)
    return xh.reshape(B, T, E) * ln_w + ln_b


def _repeat_kv(t, n_embd, head_size):
    """QRWKV k/v projections may have fewer heads; repeat whole HEADS so
    full head j reads kv head j // rep (build_rwkv6_time_mix :12015-12022:
    ggml_repeat of [D, 1, Hkv, T] then reshape merges (rep, Hkv))."""
    if t.shape[-1] == n_embd:
        return t
    rep = n_embd // t.shape[-1]
    hkv = t.shape[-1] // head_size
    g = t.reshape(*t.shape[:-1], hkv, 1, head_size)
    g = jnp.broadcast_to(g, (*t.shape[:-1], hkv, rep, head_size))
    return g.reshape(*t.shape[:-1], n_embd)


def _x_prev(x, shift_row):
    """[B, T, E] shifted right by one token, position 0 fed by the stored
    shift state (build_rwkv_token_shift_load + concat, :12108-12121)."""
    return jnp.concatenate([shift_row[:, None, :].astype(x.dtype), x[:, :-1]], axis=1)


def _time_mix_v6(layer, cfg, x, x_prev, wkv_state):
    B, T, E = x.shape
    D = cfg.wkv_head_size
    H = E // D
    sx = (x_prev - x).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    xxx = xf + sx * layer["time_mix_lerp_x"].reshape(-1)
    # 5-way lerp lora: tanh(x @ w1) -> 5 chunks -> per-mix w2
    mix = jnp.tanh(qmatmul(xxx.astype(x.dtype), layer["time_mix_w1"]))
    extra = mix.shape[-1] // 5
    w2 = layer["time_mix_w2"]  # [5, n_embd, extra]
    fused = layer.get("time_mix_lerp_fused")
    xs = []
    for i, nm in enumerate(("w", "k", "v", "r", "g")):
        m = qmatmul(mix[..., i * extra : (i + 1) * extra].astype(x.dtype), w2[i])
        if fused is not None:
            lerp = fused.reshape(5, -1)[i]
        else:
            lerp = layer[f"time_mix_lerp_{nm}"].reshape(-1)
        xs.append(xf + sx * (m + lerp))
    xw, xk, xv, xr, xg = (t.astype(x.dtype) for t in xs)

    is_qrwkv = "time_mix_first" not in layer  # rwkv6qwen2 (:11934)
    r = qmatmul(xr, layer["time_mix_receptance"])
    k = qmatmul(xk, layer["time_mix_key"])
    v = qmatmul(xv, layer["time_mix_value"])
    if "time_mix_receptance_b" in layer:
        r = r + layer["time_mix_receptance_b"]
    if "time_mix_key_b" in layer:
        k = k + layer["time_mix_key_b"]
    if "time_mix_value_b" in layer:
        v = v + layer["time_mix_value_b"]
    gate = qmatmul(xg, layer["time_mix_gate"]).astype(jnp.float32)
    g = jax.nn.sigmoid(gate) if is_qrwkv else jax.nn.silu(gate)
    k, v = (_repeat_kv(t, E, D) for t in (k, v))  # QRWKV GQA-style kv heads

    w = qmatmul(
        jnp.tanh(qmatmul(xw, layer["time_mix_decay_w1"])).astype(x.dtype),
        layer["time_mix_decay_w2"],
    ).astype(jnp.float32)
    w = w + layer["time_mix_decay"].reshape(-1)
    w = jnp.exp(-jnp.exp(w))

    shp = (B, T, H, D)
    if is_qrwkv:
        k = (k.astype(jnp.float32) - k.astype(jnp.float32) * w)  # k *= 1-w
        out, new_state = gated_linear_attn(
            k.reshape(shp), v.reshape(shp), r.reshape(shp), w.reshape(shp),
            wkv_state, D ** -0.5,
        )
        out = out.reshape(B, T, E)
    else:
        out, new_state = wkv6(
            k.reshape(shp), v.reshape(shp), r.reshape(shp),
            layer["time_mix_first"].reshape(H, D), w.reshape(shp), wkv_state,
        )
        out = _group_norm(out.reshape(B, T, E), layer["time_mix_ln"],
                          layer["time_mix_ln_b"], H)
    out = out * g
    return qmatmul(out.astype(x.dtype), layer["time_mix_output"]), new_state


def _time_mix_v7(layer, cfg, x, x_prev, wkv_state, v_first):
    B, T, E = x.shape
    D = cfg.wkv_head_size
    H = E // D
    sx = (x_prev - x).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    has_g = "time_mix_g1" in layer
    n_mix = 6 if has_g else 5
    fused = layer["time_mix_lerp_fused"].reshape(n_mix, -1)
    # mix order r, w, k, v, a, g (build_rwkv7_time_mix :12337-12342)
    mixed = [(xf + sx * fused[i]).astype(x.dtype) for i in range(n_mix)]
    xr, xw, xk, xv, xa = mixed[:5]
    xg = mixed[5] if has_g else None

    r = qmatmul(xr, layer["time_mix_receptance"])
    w = qmatmul(
        jnp.tanh(qmatmul(xw, layer["time_mix_w1"])).astype(x.dtype),
        layer["time_mix_w2"],
    ).astype(jnp.float32) + layer["time_mix_w0"].reshape(-1)
    w = jnp.exp(jax.nn.sigmoid(w) * jnp.float32(-0.606531))  # -exp(-0.5)

    k = qmatmul(xk, layer["time_mix_key"]).astype(jnp.float32)
    v = qmatmul(xv, layer["time_mix_value"]).astype(jnp.float32)
    if v_first is None:
        v_first = v
    else:
        vmix = qmatmul(
            qmatmul(xv, layer["time_mix_v1"]).astype(x.dtype), layer["time_mix_v2"]
        ).astype(jnp.float32) + layer["time_mix_v0"].reshape(-1)
        v = v + (v_first - v) * jax.nn.sigmoid(vmix)

    a = jax.nn.sigmoid(
        qmatmul(
            qmatmul(xa, layer["time_mix_a1"]).astype(x.dtype), layer["time_mix_a2"]
        ).astype(jnp.float32) + layer["time_mix_a0"].reshape(-1)
    )

    kk = (k * layer["time_mix_k_k"].reshape(-1)).reshape(B, T, H, D)
    kk = kk * jax.lax.rsqrt((kk * kk).sum(-1, keepdims=True) + jnp.float32(1e-12))
    ka = k * layer["time_mix_k_a"].reshape(-1)
    k = k + a * ka - ka

    shp = (B, T, H, D)
    out, new_state = wkv7(
        r.astype(jnp.float32).reshape(shp), w.reshape(shp), k.reshape(shp),
        v.reshape(shp), -kk, kk * a.reshape(shp), wkv_state,
    )
    out = out.reshape(B, T, E)
    if "time_mix_ln" in layer:
        out = _group_norm(out, layer["time_mix_ln"], layer["time_mix_ln_b"], H)
    # bonus term: out += v * sum_d(k*r*r_k) per head (:12448-12450)
    rk = (
        k.reshape(shp) * r.astype(jnp.float32).reshape(shp)
        * layer["time_mix_r_k"].reshape(H, D)
    ).sum(-1, keepdims=True)
    out = out + (v.reshape(shp) * rk).reshape(B, T, E)
    if has_g:
        g = qmatmul(
            jax.nn.sigmoid(qmatmul(xg, layer["time_mix_g1"]).astype(jnp.float32))
            .astype(x.dtype),
            layer["time_mix_g2"],
        ).astype(jnp.float32)
        out = out * g
    return qmatmul(out.astype(x.dtype), layer["time_mix_output"]), new_state, v_first


def _channel_mix(layer, cfg, x, x_prev, v7: bool):
    sx = (x_prev - x).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    xk = (xf + sx * layer["channel_mix_lerp_k"].reshape(-1)).astype(x.dtype)
    k = qmatmul(xk, layer["channel_mix_key"]).astype(jnp.float32)
    k = jnp.square(jax.nn.relu(k))
    out = qmatmul(k.astype(x.dtype), layer["channel_mix_value"]).astype(jnp.float32)
    if not v7:
        xr = (xf + sx * layer["channel_mix_lerp_r"].reshape(-1)).astype(x.dtype)
        r = jax.nn.sigmoid(
            qmatmul(xr, layer["channel_mix_receptance"]).astype(jnp.float32)
        )
        out = r * out
    return out


def forward(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [B, T]
    cache: RwkvCache,
    active: jnp.ndarray,  # [B] bool — rows whose state should advance
    dtype=jnp.float32,
    return_hidden: bool = False,
):
    v7 = cfg.arch in ("rwkv7", "arwkv7")
    qwen = cfg.arch in ("rwkv6qwen2", "arwkv7")  # qwen2-style layer shell
    eps = cfg.norm_eps
    x = embed_tokens(params, tokens, dtype=dtype)
    if not qwen:
        x = layer_norm(x, params["tok_norm"], params["tok_norm_b"], eps)
    new_shift, new_wkv = [], []
    v_first = None
    for il, layer in enumerate(params["layers"]):
        att_shift = cache.shift[il, :, 0]
        ffn_shift = cache.shift[il, :, 1]
        if qwen:
            att_norm = rms_norm(x, layer["attn_norm"], cfg.rms_norm_eps)
        else:
            att_norm = layer_norm(x, layer["attn_norm"], layer["attn_norm_b"], eps)
        x_prev = _x_prev(att_norm, att_shift)
        if v7:
            cur, wkv_l, v_first = _time_mix_v7(
                layer, cfg, att_norm, x_prev, cache.wkv[il], v_first
            )
        else:
            cur, wkv_l = _time_mix_v6(layer, cfg, att_norm, x_prev, cache.wkv[il])
        ffn_inp = x + cur.astype(dtype)
        if qwen:
            # standard qwen2 FFN shell, no second token shift
            h = rms_norm(ffn_inp, layer["ffn_norm"], cfg.rms_norm_eps)
            cur = _ffn(layer, h, cfg)
            ffn_last = att_norm[:, -1]
        else:
            ffn_norm = layer_norm(ffn_inp, layer["attn_norm_2"],
                                  layer["attn_norm_2_b"], eps)
            x_prev_f = _x_prev(ffn_norm, ffn_shift)
            cur = _channel_mix(layer, cfg, ffn_norm, x_prev_f, v7)
            ffn_last = ffn_norm[:, -1]
        x = ffn_inp + cur.astype(dtype)
        if cfg.rescale_every_n and (il + 1) % cfg.rescale_every_n == 0:
            x = x * jnp.asarray(0.5, dtype)
        shift_l = jnp.stack(
            [att_norm[:, -1].astype(jnp.float32), ffn_last.astype(jnp.float32)],
            axis=1,
        )
        keep2 = active[:, None, None]
        new_shift.append(jnp.where(keep2, shift_l, cache.shift[il]))
        keep4 = active[:, None, None, None]
        new_wkv.append(jnp.where(keep4, wkv_l, cache.wkv[il]))
    cache = RwkvCache(jnp.stack(new_shift), jnp.stack(new_wkv))
    if qwen:
        x = rms_norm(x, params["output_norm"], cfg.rms_norm_eps)
    else:
        x = layer_norm(x, params["output_norm"], params["output_norm_b"], eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    out_w = params.get("output", params["tok_embd"])
    logits = qmatmul(x, out_w).astype(jnp.float32)
    return logits, cache


# ---------------------------------------------------------------------------
# loading
# ---------------------------------------------------------------------------

_V6_LAYER = (
    "attn_norm", "attn_norm_b", "attn_norm_2", "attn_norm_2_b",
    "time_mix_w1", "time_mix_w2", "time_mix_lerp_x", "time_mix_lerp_w",
    "time_mix_lerp_k", "time_mix_lerp_v", "time_mix_lerp_r", "time_mix_lerp_g",
    "time_mix_lerp_fused", "time_mix_first", "time_mix_decay",
    "time_mix_decay_w1", "time_mix_decay_w2", "time_mix_key", "time_mix_value",
    "time_mix_receptance", "time_mix_gate", "time_mix_ln", "time_mix_ln_b",
    "time_mix_output", "channel_mix_lerp_k", "channel_mix_lerp_r",
    "channel_mix_key", "channel_mix_value", "channel_mix_receptance",
    "time_mix_key_b", "time_mix_value_b", "time_mix_receptance_b",
)
_V7_LAYER = (
    "attn_norm", "attn_norm_b", "attn_norm_2", "attn_norm_2_b",
    "time_mix_w0", "time_mix_w1", "time_mix_w2", "time_mix_a0", "time_mix_a1",
    "time_mix_a2", "time_mix_v0", "time_mix_v1", "time_mix_v2", "time_mix_g1",
    "time_mix_g2", "time_mix_k_k", "time_mix_k_a", "time_mix_r_k",
    "time_mix_lerp_fused", "time_mix_key", "time_mix_value",
    "time_mix_receptance", "time_mix_ln", "time_mix_ln_b", "time_mix_output",
    "channel_mix_lerp_k", "channel_mix_key", "channel_mix_value",
)
_QWEN_EXTRA = ("ffn_norm", "ffn_gate", "ffn_up", "ffn_down",
               "time_mix_key_b", "time_mix_value_b", "time_mix_receptance_b")


def load_rwkv_params(reader, cfg: ModelConfig, load_tensor) -> dict:
    """Collect rwkv6/rwkv7 tensors (llama-arch.cpp names)."""
    params: dict = {"layers": []}
    params["tok_embd"] = load_tensor("token_embd.weight")
    if (w := load_tensor("token_embd_norm.weight", optional=True)) is not None:
        params["tok_norm"] = w
        params["tok_norm_b"] = load_tensor("token_embd_norm.bias")
    params["output_norm"] = load_tensor("output_norm.weight")
    if (w := load_tensor("output_norm.bias", optional=True)) is not None:
        params["output_norm_b"] = w
    if (w := load_tensor("output.weight", optional=True)) is not None:
        params["output"] = w
    names = _V7_LAYER if cfg.arch in ("rwkv7", "arwkv7") else _V6_LAYER
    if cfg.arch in ("rwkv6qwen2", "arwkv7"):
        names = names + _QWEN_EXTRA
    for il in range(cfg.n_layer):
        layer = {}
        for nm in names:
            if nm.endswith("_b"):
                gname, suffix = nm[:-2], "bias"
            else:
                gname, suffix = nm, "weight"
            w = load_tensor(f"blk.{il}.{gname}.{suffix}", optional=True)
            if w is not None:
                layer[nm] = w
        params["layers"].append(layer)
    return params
