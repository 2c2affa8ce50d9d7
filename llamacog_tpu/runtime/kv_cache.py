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
                  active: jnp.ndarray | None = None, n_new=None):
        """Deferred bulk write: [L, B, T, Hkv, D] for ALL layers in two
        dynamic-update-slices per batch row (one DUS per step instead of two
        per layer — per-layer .at[il].set copies dominated decode time).

        `active` [B] bool gates which rows are written. Needed by prefill:
        a padded block written at an inactive row whose write_pos is within
        T of max_seq would CLAMP the DUS start and overwrite that row's
        valid history (jax DUS clamps out-of-range starts). `n_new` is
        accepted for interface parity with SwaKVCache (pads beyond the valid
        length are harmless in a linear store)."""

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
    def kv_permute(x: jnp.ndarray) -> jnp.ndarray:
        """Natural head-dim order -> the cache's strided store order."""
        D = x.shape[-1]
        gs = QuantKVCache.group_size(D)
        G = D // gs
        return jnp.swapaxes(x.reshape(*x.shape[:-1], G, gs), -1, -2).reshape(x.shape)

    @staticmethod
    def kv_unpermute(x: jnp.ndarray) -> jnp.ndarray:
        """Strided store order -> natural head-dim order."""
        D = x.shape[-1]
        gs = QuantKVCache.group_size(D)
        G = D // gs
        return jnp.swapaxes(x.reshape(*x.shape[:-1], gs, G), -1, -2).reshape(x.shape)

    @staticmethod
    def _quant(x: jnp.ndarray):
        """[..., D] -> int8 [..., D], scales [..., G] (Q8_0 semantics).

        Element order is GROUP-STRIDED like quant/planar.py: stored column
        c = r*G + g holds source element g*gs + r, so the flash kernels
        broadcast the scale plane with one pltpu.repeat tile (column c gets
        scale c mod G). Q/output head-dims are permuted to match outside the
        kernels (kv_permute/kv_unpermute)."""
        D = x.shape[-1]
        gs = QuantKVCache.group_size(D)
        G = D // gs
        g = x.astype(jnp.float32).reshape(*x.shape[:-1], G, gs)
        amax = jnp.max(jnp.abs(g), axis=-1, keepdims=True)
        d = amax / 127.0
        q = jnp.where(d > 0, jnp.round(g / jnp.where(d > 0, d, 1.0)), 0.0)
        # [.., G, gs] -> strided store order [.., gs, G] -> [.., D]
        q = jnp.swapaxes(q, -1, -2).reshape(*x.shape[:-1], D)
        return q.astype(jnp.int8), d.squeeze(-1)

    @staticmethod
    def _dequant(q: jnp.ndarray, s: jnp.ndarray, dtype):
        D = q.shape[-1]
        G = s.shape[-1]
        gs = D // G
        g = q.reshape(*q.shape[:-1], gs, G).astype(jnp.float32)
        out = g * s[..., None, :]
        out = jnp.swapaxes(out, -1, -2).reshape(*q.shape[:-1], D)
        return out.astype(dtype)

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
        new_cache = type(self)(
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
                  active: jnp.ndarray | None = None, n_new=None):
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
        return type(self)(kq, ks, vq, vs)


@jax.tree_util.register_pytree_node_class
class Q4KVCache(QuantKVCache):
    """Q4_0-style 4-bit KV cache: packed nibbles + f32 scale per 32-group
    along the head dim (reference cache-type-K/V q4_0 flags;
    llama-kv-cache-unified.cpp:952). 5 bits/element — quarter of bf16 KV,
    doubling usable context again over Q8_0.

    The packed plane stores strided column c in the low nibble of byte c
    and strided column c + D/2 in the high nibble, so the in-kernel unpack
    is one concat of shift/mask slices that reproduces the strided order
    (same trick as quant/planar._pack4)."""

    @classmethod
    def create(cls, n_layers, batch, max_seq, n_head_kv, head_dim_k, head_dim_v, dtype=None):
        def z(d):
            g = cls.group_size(d)
            return (
                jnp.zeros((n_layers, batch, max_seq, n_head_kv, d // 2), dtype=jnp.uint8),
                jnp.zeros((n_layers, batch, max_seq, n_head_kv, d // g), dtype=jnp.float32),
            )

        kq, ks = z(head_dim_k)
        vq, vs = z(head_dim_v)
        return cls(kq, ks, vq, vs)

    @staticmethod
    def _quant(x: jnp.ndarray):
        """[..., D] -> packed uint8 [..., D/2], scales [..., G]
        (quantize_row_q4_0 semantics: d = signed_amax / -8, q in [0, 15])."""
        D = x.shape[-1]
        gs = QuantKVCache.group_size(D)
        G = D // gs
        g = x.astype(jnp.float32).reshape(*x.shape[:-1], G, gs)
        amax_i = jnp.argmax(jnp.abs(g), axis=-1, keepdims=True)
        vmax = jnp.take_along_axis(g, amax_i, axis=-1)  # signed max-|.|
        d = vmax / -8.0
        q = jnp.where(
            d != 0, jnp.clip(jnp.round(g / jnp.where(d != 0, d, 1.0)) + 8.0,
                             0.0, 15.0), 8.0)
        # [.., G, gs] -> strided [.., D] -> pack nibble pairs (c, c + D/2)
        q = jnp.swapaxes(q, -1, -2).reshape(*x.shape[:-1], D).astype(jnp.uint8)
        lo, hi = q[..., : D // 2], q[..., D // 2:]
        return lo | (hi << 4), d.squeeze(-1)

    @staticmethod
    def _dequant(q: jnp.ndarray, s: jnp.ndarray, dtype):
        D2 = q.shape[-1]
        D = D2 * 2
        G = s.shape[-1]
        gs = D // G
        qi = q.astype(jnp.int32)
        v = jnp.concatenate([qi & 0xF, qi >> 4], axis=-1).astype(jnp.float32) - 8.0
        g = v.reshape(*q.shape[:-1], gs, G)
        out = g * s[..., None, :]
        out = jnp.swapaxes(out, -1, -2).reshape(*q.shape[:-1], D)
        return out.astype(dtype)


def make_cache(kind: str, n_layers, batch, max_seq, n_head_kv, dk, dv, dtype=jnp.bfloat16):
    if kind in ("bf16", "f16", "f32", "dense"):
        return KVCache.create(n_layers, batch, max_seq, n_head_kv, dk, dv, dtype=dtype)
    if kind in ("q8_0", "q8"):
        return QuantKVCache.create(n_layers, batch, max_seq, n_head_kv, dk, dv)
    if kind in ("q4_0", "q4"):
        return Q4KVCache.create(n_layers, batch, max_seq, n_head_kv, dk, dv)
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


@jax.tree_util.register_pytree_node_class
@dataclass
class SwaKVCache:
    """Two-store cache, the reference's llama_kv_cache_unified_iswa
    (src/llama-kv-cache-iswa.h): full-size store for global-attention layers
    plus a window-sized RING for the SWA layers. The deferred-write design
    (current block attends to its own K/V explicitly) means the ring only
    ever needs the last `window` OLD tokens — memory for SWA layers drops
    from max_seq to window slots.

    Ring slot j of a row with write offset p holds absolute position
    a(j) = p-1 - ((p-1-j) mod W); build_swa_ring_mask derives validity
    (a >= 0 and within the window of each query) from that.
    """

    full: KVCache  # [Lf, B, S, H, D] global-attention layers
    k_swa: jnp.ndarray  # [Ls, B, W+1, H, Dk] (slot W is a write dump)
    v_swa: jnp.ndarray  # [Ls, B, W+1, H, Dv]
    swa_layers: tuple = ()  # static: model layer index -> is-SWA

    def tree_flatten(self):
        return (self.full, self.k_swa, self.v_swa), self.swa_layers

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, swa_layers=aux)

    @property
    def max_seq(self) -> int:
        return self.full.max_seq

    @property
    def window(self) -> int:
        return self.k_swa.shape[2] - 1  # last slot is the pad-write dump

    @classmethod
    def create(cls, swa_layers, batch, max_seq, window, n_head_kv, dk, dv,
               dtype=jnp.bfloat16):
        n_swa = sum(swa_layers)
        n_full = len(swa_layers) - n_swa
        w = min(window, max_seq)
        return cls(
            full=KVCache.create(n_full, batch, max_seq, n_head_kv, dk, dv, dtype=dtype),
            k_swa=jnp.zeros((n_swa, batch, w + 1, n_head_kv, dk), dtype),
            v_swa=jnp.zeros((n_swa, batch, w + 1, n_head_kv, dv), dtype),
            swa_layers=tuple(bool(s) for s in swa_layers),
        )

    def _index(self, layer: int) -> tuple[bool, int]:
        is_swa = self.swa_layers[layer]
        idx = sum(1 for s in self.swa_layers[:layer] if s == is_swa)
        return is_swa, idx

    def read(self, layer: int):
        is_swa, i = self._index(layer)
        if is_swa:
            return self.k_swa[i, :, :-1], self.v_swa[i, :, :-1]
        return self.full.read(i)

    def write_all(self, k_new: jnp.ndarray, v_new: jnp.ndarray, write_pos: jnp.ndarray,
                  active: jnp.ndarray | None = None,
                  n_new: jnp.ndarray | None = None):
        """n_new [B]: how many of the block's T tokens are real (prefill pads
        must not wrap into the ring — they would overwrite live slots).
        Invalid tokens are scattered into the dump slot W instead."""
        swa_ids = [i for i, s in enumerate(self.swa_layers) if s]
        full_ids = [i for i, s in enumerate(self.swa_layers) if not s]
        if active is None:
            active = jnp.ones(write_pos.shape, bool)
        full = self.full.write_all(
            k_new[jnp.asarray(full_ids)], v_new[jnp.asarray(full_ids)],
            write_pos, active,
        ) if full_ids else self.full
        if not swa_ids:
            return SwaKVCache(full, self.k_swa, self.v_swa, self.swa_layers)
        kn = k_new[jnp.asarray(swa_ids)]
        vn = v_new[jnp.asarray(swa_ids)]
        W = self.window
        T = kn.shape[2]
        if n_new is None:
            n_new = jnp.full(write_pos.shape, T, jnp.int32)
        i_tok = jnp.arange(T)

        def write_row(kc, vc, kr, vr, pos, act, n_r):
            # last W real tokens land in the ring; everything else -> dump
            valid = act & (i_tok < n_r) & (i_tok >= n_r - W)
            idx = jnp.where(valid, (pos + i_tok) % W, W)
            k2 = kc.at[:, idx].set(kr.astype(kc.dtype))
            v2 = vc.at[:, idx].set(vr.astype(vc.dtype))
            return k2, v2

        k_swa, v_swa = jax.vmap(write_row, in_axes=(1, 1, 1, 1, 0, 0, 0),
                                out_axes=(1, 1))(
            self.k_swa, self.v_swa, kn, vn, write_pos, active, n_new
        )
        return SwaKVCache(full, k_swa, v_swa, self.swa_layers)


def build_swa_ring_mask(write_pos: jnp.ndarray, t: int, ring_w: int,
                        window: int) -> jnp.ndarray:
    """Additive mask [B, T, W] over a SWA ring: slot j's absolute position is
    p-1 - ((p-1-j) mod W); valid iff it exists (>= 0) and lies within the
    query's sliding window."""
    B = write_pos.shape[0]
    j = jnp.arange(ring_w)[None, None, :]
    p1 = (write_pos - 1)[:, None, None]
    a = p1 - jnp.mod(p1 - j, ring_w)  # [B,1,W]
    q = write_pos[:, None, None] + jnp.arange(t)[None, :, None]  # [B,T,1]
    ok = (a >= 0) & (a > q - window)
    return jnp.where(ok, 0.0, -jnp.inf).astype(jnp.float32)
