"""Static-shape KV cache.

A fixed preallocated [L, B, S_max, Hkv, D] array pair plus per-row lengths.
Positions are an input to the graph, so "context shift" is free (no K-shift
re-rotation graph as in the reference: SURVEY §7.4). Per-sequence ops
(seq_rm/cp/...) are provided by the engine's cell bookkeeping on the host;
the device only sees writes at explicit offsets and an additive mask.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    k: jnp.ndarray  # [L, B, S, Hkv, Dk]
    v: jnp.ndarray  # [L, B, S, Hkv, Dv]

    def tree_flatten(self):
        return (self.k, self.v), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def max_seq(self) -> int:
        return self.k.shape[2]

    @classmethod
    def create(cls, n_layers, batch, max_seq, n_head_kv, head_dim_k, head_dim_v, dtype=jnp.bfloat16):
        return cls(
            k=jnp.zeros((n_layers, batch, max_seq, n_head_kv, head_dim_k), dtype=dtype),
            v=jnp.zeros((n_layers, batch, max_seq, n_head_kv, head_dim_v), dtype=dtype),
        )

    def update(self, layer: int, k_new: jnp.ndarray, v_new: jnp.ndarray, write_pos: jnp.ndarray):
        """Write [B, T, Hkv, D] at per-row offsets write_pos [B]; returns new cache."""

        def write_row(cache_row, new_row, pos):
            return jax.lax.dynamic_update_slice(
                cache_row, new_row.astype(cache_row.dtype), (pos, 0, 0)
            )

        k_l = jax.vmap(write_row)(self.k[layer], k_new, write_pos)
        v_l = jax.vmap(write_row)(self.v[layer], v_new, write_pos)
        return KVCache(self.k.at[layer].set(k_l), self.v.at[layer].set(v_l)), k_l, v_l

    def read(self, layer: int):
        """(k, v) [B, S, Hkv, D] for one layer (old contents only)."""
        return self.k[layer], self.v[layer]

    def write_all(self, k_new: jnp.ndarray, v_new: jnp.ndarray, write_pos: jnp.ndarray,
                  active: jnp.ndarray | None = None):
        """Deferred bulk write: [L, B, T, Hkv, D] for ALL layers in two
        dynamic-update-slices per batch row (one DUS per step instead of two
        per layer — per-layer .at[il].set copies dominated decode time).

        `active` [B] bool gates which rows are written. Needed by prefill:
        a padded block written at an inactive row whose write_pos is within
        T of max_seq would CLAMP the DUS start and overwrite that row's
        valid history (jax DUS clamps out-of-range starts)."""

        def write_row(k_col, v_col, kn, vn, pos, act):
            # k_col [L, S, H, D], kn [L, T, H, D]
            k2 = jax.lax.dynamic_update_slice(
                k_col, kn.astype(k_col.dtype), (0, pos, 0, 0)
            )
            v2 = jax.lax.dynamic_update_slice(
                v_col, vn.astype(v_col.dtype), (0, pos, 0, 0)
            )
            return jnp.where(act, k2, k_col), jnp.where(act, v2, v_col)

        if active is None:
            active = jnp.ones(write_pos.shape, bool)
        k, v = jax.vmap(write_row, in_axes=(1, 1, 1, 1, 0, 0), out_axes=(1, 1))(
            self.k, self.v, k_new, v_new, write_pos, active
        )
        return KVCache(k, v)


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantKVCache:
    """Q8_0-style quantized KV cache: int8 values + f32 scale per 32-group
    along the head dim (reference: quantized KV via cache type flags,
    llama-kv-cache-unified.cpp:952; CUDA fattn vec kernels read q8 KV).
    Halves KV HBM (9 bits/elem vs 16), doubling usable context."""

    k_q: jnp.ndarray  # [L, B, S, Hkv, Dk] int8
    k_s: jnp.ndarray  # [L, B, S, Hkv, Dk/32] f32
    v_q: jnp.ndarray
    v_s: jnp.ndarray

    def tree_flatten(self):
        return (self.k_q, self.k_s, self.v_q, self.v_s), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def max_seq(self) -> int:
        return self.k_q.shape[2]

    @staticmethod
    def group_size(d: int) -> int:
        return 32 if d % 32 == 0 else d

    @classmethod
    def create(cls, n_layers, batch, max_seq, n_head_kv, head_dim_k, head_dim_v, dtype=None):
        def z(d):
            g = cls.group_size(d)
            return (
                jnp.zeros((n_layers, batch, max_seq, n_head_kv, d), dtype=jnp.int8),
                jnp.zeros((n_layers, batch, max_seq, n_head_kv, d // g), dtype=jnp.float32),
            )

        kq, ks = z(head_dim_k)
        vq, vs = z(head_dim_v)
        return cls(kq, ks, vq, vs)

    @staticmethod
    def _quant(x: jnp.ndarray):
        """[..., D] -> int8 [..., D], scales [..., D/g] (Q8_0 semantics)."""
        gs = QuantKVCache.group_size(x.shape[-1])
        g = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, gs)
        amax = jnp.max(jnp.abs(g), axis=-1, keepdims=True)
        d = amax / 127.0
        q = jnp.where(d > 0, jnp.round(g / jnp.where(d > 0, d, 1.0)), 0.0)
        return (
            q.astype(jnp.int8).reshape(*x.shape[:-1], -1),
            d.squeeze(-1),
        )

    @staticmethod
    def _dequant(q: jnp.ndarray, s: jnp.ndarray, dtype):
        gs = q.shape[-1] // s.shape[-1]
        g = q.reshape(*q.shape[:-1], -1, gs).astype(jnp.float32)
        out = g * s[..., None]
        return out.reshape(*q.shape[:-1], -1).astype(dtype)

    def update(self, layer: int, k_new: jnp.ndarray, v_new: jnp.ndarray, write_pos: jnp.ndarray):
        kq_new, ks_new = self._quant(k_new)
        vq_new, vs_new = self._quant(v_new)

        def write_row(cache_row, new_row, pos):
            return jax.lax.dynamic_update_slice(
                cache_row, new_row.astype(cache_row.dtype), (pos,) + (0,) * (cache_row.ndim - 1)
            )

        kq = jax.vmap(write_row)(self.k_q[layer], kq_new, write_pos)
        ks = jax.vmap(write_row)(self.k_s[layer], ks_new, write_pos)
        vq = jax.vmap(write_row)(self.v_q[layer], vq_new, write_pos)
        vs = jax.vmap(write_row)(self.v_s[layer], vs_new, write_pos)
        new_cache = QuantKVCache(
            self.k_q.at[layer].set(kq),
            self.k_s.at[layer].set(ks),
            self.v_q.at[layer].set(vq),
            self.v_s.at[layer].set(vs),
        )
        k_all = self._dequant(kq, ks, k_new.dtype)
        v_all = self._dequant(vq, vs, v_new.dtype)
        return new_cache, k_all, v_all

    def read(self, layer: int):
        k = self._dequant(self.k_q[layer], self.k_s[layer], jnp.bfloat16)
        v = self._dequant(self.v_q[layer], self.v_s[layer], jnp.bfloat16)
        return k, v

    def write_all(self, k_new: jnp.ndarray, v_new: jnp.ndarray, write_pos: jnp.ndarray,
                  active: jnp.ndarray | None = None):
        kq_new, ks_new = self._quant(k_new)
        vq_new, vs_new = self._quant(v_new)

        def write_row(planes, news, pos, act):
            return tuple(
                jnp.where(
                    act,
                    jax.lax.dynamic_update_slice(
                        c, n.astype(c.dtype), (0, pos) + (0,) * (c.ndim - 2)
                    ),
                    c,
                )
                for c, n in zip(planes, news)
            )

        if active is None:
            active = jnp.ones(write_pos.shape, bool)
        kq, ks, vq, vs = jax.vmap(
            lambda a, b, c, d, na, nb, nc, nd, p, m: write_row(
                (a, b, c, d), (na, nb, nc, nd), p, m
            ),
            in_axes=(1,) * 8 + (0, 0), out_axes=(1, 1, 1, 1),
        )(self.k_q, self.k_s, self.v_q, self.v_s, kq_new, ks_new, vq_new, vs_new,
          write_pos, active)
        return QuantKVCache(kq, ks, vq, vs)


def make_cache(kind: str, n_layers, batch, max_seq, n_head_kv, dk, dv, dtype=jnp.bfloat16):
    if kind in ("bf16", "f16", "f32", "dense"):
        return KVCache.create(n_layers, batch, max_seq, n_head_kv, dk, dv, dtype=dtype)
    if kind in ("q8_0", "q8"):
        return QuantKVCache.create(n_layers, batch, max_seq, n_head_kv, dk, dv)
    raise ValueError(f"unknown kv cache type {kind!r}")


def build_causal_mask(
    write_pos: jnp.ndarray,  # [B] first position of the new tokens
    t: int,  # new tokens per row
    s_max: int,
    seq_len: jnp.ndarray | None = None,  # [B] total valid length after write
    sliding_window: int = 0,
) -> jnp.ndarray:
    """Additive mask [B, T, S]: token i (absolute pos write_pos+i) may attend to
    cache slot j iff j <= write_pos+i (causal), j within the sliding window,
    and j < seq_len."""
    B = write_pos.shape[0]
    ti = jnp.arange(t)[None, :, None]  # [1,T,1]
    sj = jnp.arange(s_max)[None, None, :]  # [1,1,S]
    abs_pos = write_pos[:, None, None] + ti  # [B,T,1]
    ok = sj <= abs_pos
    if sliding_window > 0:
        ok = ok & (sj > abs_pos - sliding_window)
    if seq_len is not None:
        ok = ok & (sj < seq_len[:, None, None])
    return jnp.where(ok, 0.0, -jnp.inf).astype(jnp.float32)
