"""Normalization ops (f32 accumulation, as the reference CPU/CUDA kernels do)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float,
             bias: jnp.ndarray | None = None) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    if weight is not None:  # llama4 L2 q/k norm is weightless ggml_rms_norm
        out = out * weight.astype(jnp.float32)
    if bias is not None:  # ggml build_norm RMS + bias (phimoe)
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def layer_norm(x, weight, bias, eps: float):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    if weight is not None:  # olmo: non-parametric LN (build_norm NULL weight)
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)
