"""Rotary position embeddings (NeoX-style interleaving as used by llama),
with linear and YaRN scaling.

Semantics follow ggml_rope_ext (reference ggml/src/ggml.c; YaRN ramp per
ggml-cpu/ops.cpp rope). Positions are an explicit input — cache shifts are
"free" (we re-rope nothing; we just feed different positions).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..models.config import RopeConfig


def _yarn_corr_dim(n_dims: int, n_ctx_orig: int, n_rot: float, base: float) -> float:
    # inverse of 2pi * d / L  (ggml-cpu ops rope_yarn_corr_dim)
    return n_dims * math.log(n_ctx_orig / (n_rot * 2 * math.pi)) / (2 * math.log(base))


def rope_frequencies(cfg: RopeConfig, head_dim: int) -> tuple[np.ndarray, np.ndarray, float]:
    """Per-dim inverse frequencies and YaRN interpolation mix.

    Returns (inv_freq [D/2], ramp_mix [D/2], mscale).
    """
    dim = cfg.dim or head_dim
    exponents = np.arange(0, dim, 2, dtype=np.float64) / dim
    inv_freq = cfg.freq_base ** -exponents
    mscale = 1.0
    ramp = np.zeros_like(inv_freq)
    if cfg.scaling_type == "linear" and cfg.scaling_factor not in (0.0, 1.0):
        inv_freq = inv_freq / cfg.scaling_factor
    elif cfg.scaling_type == "yarn" and cfg.scaling_factor not in (0.0,):
        n_ctx_orig = cfg.orig_ctx_len or 2048
        lo = _yarn_corr_dim(dim, n_ctx_orig, cfg.beta_fast, cfg.freq_base)
        hi = _yarn_corr_dim(dim, n_ctx_orig, cfg.beta_slow, cfg.freq_base)
        lo, hi = max(0.0, math.floor(lo)), min(dim - 1.0, math.ceil(hi))
        dims = np.arange(0, dim, 2, dtype=np.float64)
        ramp = np.clip((dims / 2 - lo / 2) / max((hi - lo) / 2, 0.001), 0, 1)
        ramp = 1.0 - ramp  # 1 = interpolate (low freq), 0 = extrapolate
        mscale = float(
            cfg.attn_factor * (1.0 + 0.1 * math.log(cfg.scaling_factor))
            if cfg.scaling_factor > 1.0
            else cfg.attn_factor
        )
    return (
        inv_freq.astype(np.float32),
        ramp.astype(np.float32),
        mscale,
    )


def rope_tables(
    positions: jnp.ndarray,  # [..., T]
    cfg: RopeConfig,
    head_dim: int,
    freq_factors: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(cos, sin) [..., T, dim/2] — computed ONCE per step and shared by all
    layers (the per-layer transcendentals were a measurable decode cost)."""
    dim = cfg.dim or head_dim
    inv_freq, ramp, mscale = rope_frequencies(cfg, head_dim)
    inv_freq = jnp.asarray(inv_freq)
    if cfg.scaling_type == "yarn" and cfg.scaling_factor not in (0.0, 1.0):
        inv_extrap = jnp.asarray(rope_frequencies(
            RopeConfig(dim=cfg.dim, freq_base=cfg.freq_base), head_dim)[0])
        inv_freq = inv_extrap * (1 - jnp.asarray(ramp)) + (
            inv_extrap / cfg.scaling_factor
        ) * jnp.asarray(ramp)
    if freq_factors is not None:
        inv_freq = inv_freq / freq_factors.astype(jnp.float32)
    theta = positions[..., None].astype(jnp.float32) * inv_freq  # [..., T, dim/2]
    return jnp.cos(theta) * mscale, jnp.sin(theta) * mscale


def apply_rope_tables(
    x: jnp.ndarray,  # [..., T, H, D]
    tables: tuple[jnp.ndarray, jnp.ndarray],  # from rope_tables
    dim: int | None = None,
    interleaved: bool = False,
) -> jnp.ndarray:
    """Rope with precomputed tables. Default NeoX pairing (i, i + dim/2);
    `interleaved` is ggml's mode-0 "norm" rope rotating pairs (2i, 2i+1)
    (gptj/glm families)."""
    cos, sin = tables
    D = x.shape[-1]
    dim = dim or 2 * cos.shape[-1]
    cos = cos[..., None, :]  # broadcast over heads
    sin = sin[..., None, :]
    half = dim // 2
    x_rot = x[..., :dim].astype(jnp.float32)
    if interleaved:
        x1 = x_rot[..., 0::2]
        x2 = x_rot[..., 1::2]
        r1 = x1 * cos - x2 * sin
        r2 = x2 * cos + x1 * sin
        out = jnp.stack([r1, r2], axis=-1).reshape(*x_rot.shape[:-1], dim)
    else:
        x1 = x_rot[..., :half]
        x2 = x_rot[..., half:]
        out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    if dim < D:
        out = jnp.concatenate([out, x[..., dim:].astype(jnp.float32)], axis=-1)
    return out.astype(x.dtype)


def apply_rope(
    x: jnp.ndarray,  # [..., T, H, D]
    positions: jnp.ndarray,  # [..., T]
    cfg: RopeConfig,
    freq_factors: jnp.ndarray | None = None,  # [dim/2] divisors (rope_freqs /
    # rope_long/rope_short weights; ggml_rope_ext's `c` input)
) -> jnp.ndarray:
    """NeoX rope: rotate pairs (i, i + D/2)."""
    if not cfg.enabled:
        return x
    D = x.shape[-1]
    dim = cfg.dim or D
    tables = rope_tables(positions, cfg, D, freq_factors)
    return apply_rope_tables(x, tables, dim, interleaved=cfg.interleaved)
