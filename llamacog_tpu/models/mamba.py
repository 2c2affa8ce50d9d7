"""Mamba (S6) forward pass with recurrent state (functional JAX).

Covers the reference's llm_build_mamba / build_mamba_layer
(src/llama-model.cpp:9112, build_mamba_layer above it) and the
llama_memory_recurrent per-sequence state slots
(src/llama-memory-recurrent.h:16). The ggml_ssm_scan recurrence
(ggml/src/ggml-cpu/ops.cpp ssm_scan_f32) is expressed as a lax.scan over
time — the selective-scan state is carried functionally, so the "cache" is
just a pytree of (conv_state, ssm_state) arrays per layer.

TPU notes: the scan body is a batch of small einsums (VPU-bound); prefill
throughput comes from doing the x/dt/B/C projections for the whole sequence
in one MXU matmul before the scan, exactly like the reference splits
ssm_in/ssm_x out of the recurrence.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.linear import qmatmul
from ..ops.norms import rms_norm
from .config import ModelConfig
from .llama import embed_tokens


@jax.tree_util.register_pytree_node_class
@dataclass
class RecurrentCache:
    """Per-layer recurrent state: conv window tail + SSM state.

    conv: [L, B, d_conv-1, d_inner]   ssm: [L, B, d_inner, d_state]
    """

    conv: jnp.ndarray
    ssm: jnp.ndarray

    def tree_flatten(self):
        return (self.conv, self.ssm), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def max_seq(self) -> int:  # API parity with KVCache (unused for state)
        return 1 << 30


def make_recurrent_cache(cfg: ModelConfig, batch_size: int, dtype=jnp.float32):
    return RecurrentCache(
        conv=jnp.zeros(
            (cfg.n_layer, batch_size, cfg.ssm_d_conv - 1, cfg.ssm_d_inner), dtype
        ),
        ssm=jnp.zeros(
            (cfg.n_layer, batch_size, cfg.ssm_d_inner, cfg.ssm_d_state), dtype
        ),
    )


def _softplus_dt(dt: jnp.ndarray) -> jnp.ndarray:
    # ggml ssm_scan: log1p(exp(dt)) with a linear tail for dt > 20
    return jnp.where(dt <= 20.0, jnp.log1p(jnp.exp(dt)), dt)


def _mixer(
    layer: dict, h: jnp.ndarray, conv_state: jnp.ndarray, ssm_state: jnp.ndarray,
    cfg: ModelConfig,
):
    """One mamba mixer over a [B, T, E] block; returns (y, conv', ssm')."""
    B, T, _ = h.shape
    d_conv, d_inner = cfg.ssm_d_conv, cfg.ssm_d_inner
    d_state, dt_rank = cfg.ssm_d_state, cfg.ssm_dt_rank

    xz = qmatmul(h, layer["ssm_in"]).astype(jnp.float32)  # [B,T,2*d_inner]
    x, z = jnp.split(xz, 2, axis=-1)

    # causal depthwise conv with carried window tail
    xfull = jnp.concatenate([conv_state.astype(jnp.float32), x], axis=1)
    new_conv = xfull[:, -(d_conv - 1):]
    conv_w = layer["ssm_conv1d"].astype(jnp.float32)  # [d_inner, d_conv]
    wind = jnp.stack([xfull[:, j : j + T] for j in range(d_conv)], axis=-1)
    # wind [B,T,d_inner,d_conv] × conv_w [d_inner,d_conv], reduce over taps
    xc = (wind * conv_w[None, None]).sum(-1) + layer["ssm_conv1d_b"].astype(jnp.float32)
    xc = jax.nn.silu(xc)  # [B,T,d_inner]

    x_db = qmatmul(xc, layer["ssm_x"]).astype(jnp.float32)
    dt, Bm, Cm = jnp.split(x_db, [dt_rank, dt_rank + d_state], axis=-1)
    if "ssm_dt_norm" in layer:  # jamba: learned RMSNorm on dt/B/C
        dt = rms_norm(dt, layer["ssm_dt_norm"], cfg.rms_norm_eps)
        Bm = rms_norm(Bm, layer["ssm_b_norm"], cfg.rms_norm_eps)
        Cm = rms_norm(Cm, layer["ssm_c_norm"], cfg.rms_norm_eps)
    elif cfg.ssm_dt_b_c_rms:  # FalconMamba variant (weightless)
        one = jnp.ones((), jnp.float32)
        dt = rms_norm(dt, one, cfg.rms_norm_eps)
        Bm = rms_norm(Bm, one, cfg.rms_norm_eps)
        Cm = rms_norm(Cm, one, cfg.rms_norm_eps)
    dt = qmatmul(dt, layer["ssm_dt"]).astype(jnp.float32) + layer["ssm_dt_b"].astype(
        jnp.float32
    )
    dt = _softplus_dt(dt)  # [B,T,d_inner]
    A = layer["ssm_a"].astype(jnp.float32)  # [d_inner, d_state], already -exp(A_log)

    def step(state, inp):
        dt_t, b_t, c_t, x_t = inp  # [B,d_inner],[B,d_state],[B,d_state],[B,d_inner]
        da = jnp.exp(dt_t[:, :, None] * A[None])  # [B,d_inner,d_state]
        state = state * da + (x_t * dt_t)[:, :, None] * b_t[:, None, :]
        y = (state * c_t[:, None, :]).sum(-1)  # [B,d_inner]
        return state, y

    inputs = (
        jnp.swapaxes(dt, 0, 1),  # [T,B,d_inner]
        jnp.swapaxes(Bm, 0, 1),
        jnp.swapaxes(Cm, 0, 1),
        jnp.swapaxes(xc, 0, 1),
    )
    new_ssm, ys = jax.lax.scan(step, ssm_state.astype(jnp.float32), inputs)
    y = jnp.swapaxes(ys, 0, 1)  # [B,T,d_inner]
    y = y + xc * layer["ssm_d"].astype(jnp.float32)
    y = y * jax.nn.silu(z)
    out = qmatmul(y.astype(h.dtype), layer["ssm_out"])
    return out, new_conv.astype(conv_state.dtype), new_ssm.astype(ssm_state.dtype)


def forward(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [B, T]
    cache: RecurrentCache,
    active: jnp.ndarray,  # [B] bool — rows whose state should advance
    dtype=jnp.float32,
    return_hidden: bool = False,
):
    B, T = tokens.shape
    x = embed_tokens(params, tokens, dtype=dtype)
    new_conv, new_ssm = [], []
    for il, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], cfg.rms_norm_eps)
        y, conv_l, ssm_l = _mixer(layer, h, cache.conv[il], cache.ssm[il], cfg)
        keep = active[:, None, None]
        new_conv.append(jnp.where(keep, conv_l, cache.conv[il]))
        new_ssm.append(jnp.where(keep, ssm_l, cache.ssm[il]))
        x = x + y.astype(dtype)
    cache = RecurrentCache(jnp.stack(new_conv), jnp.stack(new_ssm))
    x = rms_norm(x, params["output_norm"], cfg.rms_norm_eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    out_w = params.get("output", params["tok_embd"])
    logits = qmatmul(x, out_w).astype(jnp.float32)
    return logits, cache
