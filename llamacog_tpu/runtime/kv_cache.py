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
