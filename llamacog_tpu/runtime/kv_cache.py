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
import numpy as np


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

        if active is None:
            active = jnp.ones(write_pos.shape, bool)

        def write_plane(c, n):
            # Per-row DUS unrolled over the (static, small) batch. A
            # vmapped DUS lowers to a scatter, which breaks the while-loop
            # carry's in-place aliasing: at B=32 XLA inserted two .remat
            # copies of the ENTIRE 4.3 GB cache per decode step (13.1
            # ms/tok, XPlane r5). The act gate selects on the T-sized
            # update slice only — a whole-cache jnp.where copies GBs.
            for b in range(c.shape[1]):
                start = (0, b, write_pos[b], 0, 0)
                nb = n[:, b:b + 1]
                old = jax.lax.dynamic_slice(c, start, nb.shape)
                upd = jnp.where(active[b], nb.astype(c.dtype), old)
                c = jax.lax.dynamic_update_slice(c, upd, start)
            return c

        return KVCache(write_plane(self.k, k_new), write_plane(self.v, v_new))


# ---------------------------------------------------------------------------
# Per-kind KV plane codecs (the reference accepts q4_0/q4_1/q5_0/q5_1/q8_0/
# f16 for K and V independently: ggml-cuda/fattn.cu:133-151, flag parsing
# common/arg.cpp:2093-2130). Planes are stored GROUP-STRIDED like
# quant/planar.py: stored column c = r*G + g holds source element g*gs + r,
# so the flash kernels broadcast per-group planes with one pltpu.repeat tile
# (column c's group is c mod G, its in-group index is c // G).
#
# Plane roles (canonical order):
#   q — packed values: int8 [.., D] (q8_0), nibble-packed uint8 [.., D/2]
#       (4/5-bit kinds: strided column c in the low nibble of byte c,
#       column c + D/2 in the high nibble), or dense f16/bf16 [.., D]
#   s — f32 per-group scale [.., G]
#   m — f32 per-group min  [.., G]           (q4_1 / q5_1)
#   h — int32 per-group high-bit pack [.., G]: bit r holds the 5th bit of
#       the element at in-group index r     (q5_0 / q5_1)
# ---------------------------------------------------------------------------

KV_QUANT_KINDS = ("q8_0", "q4_0", "q4_1", "q5_0", "q5_1")
KV_DENSE_KINDS = ("f16", "bf16")
_PLANE_ORDER = ("q", "s", "m", "h")


def _group_size(d: int) -> int:
    return 32 if d % 32 == 0 else d


def _stride(q: jnp.ndarray, shape) -> jnp.ndarray:
    """[.., G, gs] group view -> strided store order [.., D]."""
    return jnp.swapaxes(q, -1, -2).reshape(*shape)


def _pack_nibbles(q: jnp.ndarray) -> jnp.ndarray:
    """Strided uint8 [.., D] (values 0..15) -> packed [.., D/2]."""
    D = q.shape[-1]
    lo, hi = q[..., : D // 2], q[..., D // 2:]
    return lo | (hi << 4)


def _pack_high_bits(hi: jnp.ndarray) -> jnp.ndarray:
    """[.., G, gs] 0/1 high bits -> int32 [.., G], bit r = in-group index r."""
    gs = hi.shape[-1]
    return jnp.sum(hi.astype(jnp.int32) << jnp.arange(gs, dtype=jnp.int32),
                   axis=-1).astype(jnp.int32)


def kv_quant_planes(kind: str, x: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """[..., D] natural order -> tuple of planes in canonical order."""
    D = x.shape[-1]
    gs = _group_size(D)
    G = D // gs
    if kind in KV_DENSE_KINDS:
        dt = jnp.float16 if kind == "f16" else jnp.bfloat16
        return (QuantKVCache.kv_permute(x).astype(dt),)
    g = x.astype(jnp.float32).reshape(*x.shape[:-1], G, gs)
    if kind == "q8_0":
        amax = jnp.max(jnp.abs(g), axis=-1, keepdims=True)
        d = amax / 127.0
        q = jnp.where(d > 0, jnp.round(g / jnp.where(d > 0, d, 1.0)), 0.0)
        return (_stride(q, x.shape).astype(jnp.int8), d.squeeze(-1))
    if kind in ("q4_0", "q5_0"):
        # quantize_row_q4_0/q5_0 semantics: d = signed_amax / -(2^(b-1))
        half = 8.0 if kind == "q4_0" else 16.0
        amax_i = jnp.argmax(jnp.abs(g), axis=-1, keepdims=True)
        vmax = jnp.take_along_axis(g, amax_i, axis=-1)  # signed max-|.|
        d = vmax / -half
        q = jnp.where(
            d != 0, jnp.clip(jnp.round(g / jnp.where(d != 0, d, 1.0)) + half,
                             0.0, 2 * half - 1.0), half)
    else:  # q4_1 / q5_1: quantize_row_qx_1 semantics (min + scale)
        levels = 15.0 if kind == "q4_1" else 31.0
        vmin = jnp.min(g, axis=-1, keepdims=True)
        vmax = jnp.max(g, axis=-1, keepdims=True)
        d = (vmax - vmin) / levels
        q = jnp.where(
            d != 0, jnp.clip(jnp.round((g - vmin) / jnp.where(d != 0, d, 1.0)),
                             0.0, levels), 0.0)
    q = q.astype(jnp.uint8)
    planes = [_pack_nibbles(_stride(q & 0xF, x.shape)), d.squeeze(-1)]
    if kind in ("q4_1", "q5_1"):
        planes.append(vmin.squeeze(-1))
    if kind in ("q5_0", "q5_1"):
        planes.append(_pack_high_bits((q >> 4) & 1))
    return tuple(planes)


def kv_dequant_planes(kind: str, planes: tuple, dtype) -> jnp.ndarray:
    """Strided planes -> [..., D] natural order."""
    q = planes[0]
    if kind in KV_DENSE_KINDS:
        return QuantKVCache.kv_unpermute(q).astype(dtype)
    s = planes[1]
    G = s.shape[-1]
    if kind == "q8_0":
        v = q.astype(jnp.float32)
    else:
        qi = q.astype(jnp.int32)
        v = jnp.concatenate([qi & 0xF, qi >> 4], axis=-1).astype(jnp.float32)
    D = v.shape[-1]
    gs = D // G
    g = v.reshape(*v.shape[:-1], gs, G)  # row r = in-group index, col = group
    if kind in ("q5_0", "q5_1"):
        h = planes[-1]
        bit = (h[..., None, :] >> jnp.arange(gs, dtype=jnp.int32)[:, None]) & 1
        g = g + 16.0 * bit.astype(jnp.float32)
    if kind == "q4_0":
        g = g - 8.0
    elif kind == "q5_0":
        g = g - 16.0
    out = g * s[..., None, :]
    if kind in ("q4_1", "q5_1"):
        out = out + planes[2][..., None, :]
    out = jnp.swapaxes(out, -1, -2).reshape(*v.shape[:-1], D)
    return out.astype(dtype)


def kv_plane_shapes(kind: str, d: int) -> tuple[tuple[int, ...], ...]:
    """Per-element trailing shape+dtype of each plane for head dim d."""
    g = _group_size(d)
    G = d // g
    if kind == "f16":
        return (((d,), jnp.float16),)
    if kind == "bf16":
        return (((d,), jnp.bfloat16),)
    if kind == "q8_0":
        return (((d,), jnp.int8), ((G,), jnp.float32))
    base = [((d // 2,), jnp.uint8), ((G,), jnp.float32)]
    if kind in ("q4_1", "q5_1"):
        base.append(((G,), jnp.float32))
    if kind in ("q5_0", "q5_1"):
        base.append(((G,), jnp.int32))
    return tuple(base)


@jax.tree_util.register_pytree_node_class
class QuantKVCache:
    """Quantized KV cache with independent K and V kinds (reference:
    quantized KV via cache type flags, llama-kv-cache-unified.cpp:952;
    CUDA fattn vec kernels read any-quant KV, fattn.cu:133-151).

    Stores a tuple of planes per tensor (see codec comment above). Q8_0
    is 9 bits/elem (half of bf16), q4_0 is 5 bits (a quarter), q4_1/q5_0
    ~6, q5_1 ~7 — with the kernels reading the packed planes directly.

    Planes are stored with the trailing (head, width) dims FLATTENED:
    [L, B, S, Hkv*W]. The 5-D [.., Hkv, W] form drew catastrophic TPU
    tile padding — the (8,128)/(32,128) tiles pad W=G=4 f32 scale minors
    32x and nibble payload minors 2-8x, which at 32k context turned
    128 MB of q4_0 scales into a 4 GB allocation and OOM'd the decode
    step (the r4 depth cliff). Flat planes have a wide minor and pad at
    most 4x on the G planes; kernels take static per-head lane slices."""

    DEFAULT_KINDS = ("q8_0", "q8_0")

    def __init__(self, k_planes, v_planes, kinds=None, hkv=None):
        self.k_planes = tuple(k_planes)
        self.v_planes = tuple(v_planes)
        self.kinds = tuple(kinds) if kinds is not None else self.DEFAULT_KINDS
        self.hkv = int(hkv) if hkv is not None else None

    # back-compat accessors (q8/q4 two-plane layout)
    @property
    def k_q(self):
        return self.k_planes[0]

    @property
    def k_s(self):
        return self.k_planes[1]

    @property
    def v_q(self):
        return self.v_planes[0]

    @property
    def v_s(self):
        return self.v_planes[1]

    def tree_flatten(self):
        return (self.k_planes, self.v_planes), (self.kinds, self.hkv)

    @classmethod
    def tree_unflatten(cls, aux, children):
        kinds, hkv = aux if isinstance(aux[0], tuple) else (aux, None)
        return cls(children[0], children[1], kinds, hkv)

    @property
    def max_seq(self) -> int:
        return self.k_planes[0].shape[2]

    @staticmethod
    def group_size(d: int) -> int:
        return _group_size(d)

    @classmethod
    def create(cls, n_layers, batch, max_seq, n_head_kv, head_dim_k, head_dim_v,
               dtype=None, kinds=None):
        kinds = tuple(kinds) if kinds is not None else cls.DEFAULT_KINDS

        def z(kind, d):
            # trailing (H, W) flattened: see class docstring
            return tuple(
                jnp.zeros((n_layers, batch, max_seq,
                           n_head_kv * int(np.prod(shp))), dtype=dt)
                for shp, dt in kv_plane_shapes(kind, d)
            )

        return cls(z(kinds[0], head_dim_k), z(kinds[1], head_dim_v), kinds,
                   hkv=n_head_kv)

    @staticmethod
    def kv_permute(x: jnp.ndarray) -> jnp.ndarray:
        """Natural head-dim order -> the cache's strided store order."""
        D = x.shape[-1]
        gs = _group_size(D)
        G = D // gs
        return jnp.swapaxes(x.reshape(*x.shape[:-1], G, gs), -1, -2).reshape(x.shape)

    @staticmethod
    def kv_unpermute(x: jnp.ndarray) -> jnp.ndarray:
        """Strided store order -> natural head-dim order."""
        D = x.shape[-1]
        gs = _group_size(D)
        G = D // gs
        return jnp.swapaxes(x.reshape(*x.shape[:-1], gs, G), -1, -2).reshape(x.shape)

    # back-compat statics (Q8_0 two-plane codec)
    @staticmethod
    def _quant(x: jnp.ndarray):
        return kv_quant_planes("q8_0", x)

    @staticmethod
    def _dequant(q: jnp.ndarray, s: jnp.ndarray, dtype):
        return kv_dequant_planes("q8_0", (q, s), dtype)

    @staticmethod
    def _flat(planes: tuple) -> tuple:
        """[.., H, W] per-head planes -> stored [.., H*W] form."""
        return tuple(p.reshape(*p.shape[:-2], p.shape[-2] * p.shape[-1])
                     for p in planes)

    def _unflat(self, planes: tuple) -> tuple:
        """Stored [.., H*W] planes -> [.., H, W] for the XLA codecs."""
        h = self.hkv
        return tuple(p.reshape(*p.shape[:-1], h, p.shape[-1] // h)
                     for p in planes)

    def quant_k(self, x: jnp.ndarray) -> tuple:
        return self._flat(kv_quant_planes(self.kinds[0], x))

    def quant_v(self, x: jnp.ndarray) -> tuple:
        return self._flat(kv_quant_planes(self.kinds[1], x))

    def dequant_k(self, planes: tuple, dtype=jnp.bfloat16) -> jnp.ndarray:
        return kv_dequant_planes(self.kinds[0], self._unflat(planes), dtype)

    def dequant_v(self, planes: tuple, dtype=jnp.bfloat16) -> jnp.ndarray:
        return kv_dequant_planes(self.kinds[1], self._unflat(planes), dtype)

    def update(self, layer: int, k_new: jnp.ndarray, v_new: jnp.ndarray, write_pos: jnp.ndarray):
        kp_new = self.quant_k(k_new)
        vp_new = self.quant_v(v_new)

        def write_row(cache_row, new_row, pos):
            return jax.lax.dynamic_update_slice(
                cache_row, new_row.astype(cache_row.dtype), (pos,) + (0,) * (cache_row.ndim - 1)
            )

        kp = tuple(jax.vmap(write_row)(c[layer], n, write_pos)
                   for c, n in zip(self.k_planes, kp_new))
        vp = tuple(jax.vmap(write_row)(c[layer], n, write_pos)
                   for c, n in zip(self.v_planes, vp_new))
        new_cache = type(self)(
            tuple(c.at[layer].set(p) for c, p in zip(self.k_planes, kp)),
            tuple(c.at[layer].set(p) for c, p in zip(self.v_planes, vp)),
            self.kinds, self.hkv,
        )
        k_all = self.dequant_k(kp, k_new.dtype)
        v_all = self.dequant_v(vp, v_new.dtype)
        return new_cache, k_all, v_all

    def read(self, layer: int):
        k = self.dequant_k(tuple(p[layer] for p in self.k_planes))
        v = self.dequant_v(tuple(p[layer] for p in self.v_planes))
        return k, v

    def write_all(self, k_new: jnp.ndarray, v_new: jnp.ndarray, write_pos: jnp.ndarray,
                  active: jnp.ndarray | None = None, n_new=None):
        kp_new = self.quant_k(k_new)
        vp_new = self.quant_v(v_new)
        if active is None:
            active = jnp.ones(write_pos.shape, bool)

        def write_plane(c, n):
            # per-row DUS unrolled over the (static, small) batch; a
            # vmapped DUS lowers to a scatter, which makes XLA negotiate
            # a rotated {0,3,2,1} layout for the while-loop cache carry
            # and insert FULL-PLANE layout-conversion copies each decode
            # step (measured 22.8 ms/tok on a 32k q8 cache). act gates on
            # the T-sized update slice only (a whole-cache jnp.where
            # copies GBs per step).
            for b in range(c.shape[1]):
                start = (0, b, write_pos[b]) + (0,) * (c.ndim - 3)
                nb = n[:, b:b + 1]
                old = jax.lax.dynamic_slice(c, start, nb.shape)
                upd = jnp.where(active[b], nb.astype(c.dtype), old)
                c = jax.lax.dynamic_update_slice(c, upd, start)
            return c

        kp = tuple(write_plane(c, n)
                   for c, n in zip(self.k_planes, kp_new))
        vp = tuple(write_plane(c, n)
                   for c, n in zip(self.v_planes, vp_new))
        return type(self)(kp, vp, self.kinds, self.hkv)


@jax.tree_util.register_pytree_node_class
class Q4KVCache(QuantKVCache):
    """Q4_0/Q4_0 KV cache (back-compat alias; see QuantKVCache)."""

    DEFAULT_KINDS = ("q4_0", "q4_0")

    @staticmethod
    def _quant(x: jnp.ndarray):
        return kv_quant_planes("q4_0", x)

    @staticmethod
    def _dequant(q: jnp.ndarray, s: jnp.ndarray, dtype):
        return kv_dequant_planes("q4_0", (q, s), dtype)


_KIND_ALIASES = {"q8": "q8_0", "q4": "q4_0", "f32": "dense", "dense": "dense",
                 "bf16": "bf16", "f16": "f16"}


def parse_kv_kinds(kind: str) -> tuple[str, str]:
    """'q8_0' -> (q8_0, q8_0); 'q8_0:q5_1' -> split K/V types (reference
    -ctk/-ctv flags, common/arg.cpp:2093-2130)."""
    parts = kind.split(":") if ":" in kind else [kind, kind]
    if len(parts) != 2:
        raise ValueError(f"bad kv cache type {kind!r}")
    out = []
    for p in parts:
        p = _KIND_ALIASES.get(p, p)
        if p not in KV_QUANT_KINDS + KV_DENSE_KINDS + ("dense",):
            raise ValueError(f"unknown kv cache type {p!r}")
        out.append(p)
    return tuple(out)


def make_cache(kind: str, n_layers, batch, max_seq, n_head_kv, dk, dv, dtype=jnp.bfloat16):
    kk, kv = parse_kv_kinds(kind)
    dense = KV_DENSE_KINDS + ("dense",)
    if kk in dense and kv in dense:
        # uniform dense cache stores the engine compute dtype (bf16 is the
        # TPU-native role of the reference's f16 KV default); the plain
        # cache's XLA reads fuse best at B=1
        return KVCache.create(n_layers, batch, max_seq, n_head_kv, dk, dv, dtype=dtype)
    # dense mixed with quant runs through the planar cache (strided dense
    # plane) so the flash kernels see one layout
    kk = "bf16" if kk == "dense" else kk
    kv = "bf16" if kv == "dense" else kv
    cls = Q4KVCache if (kk, kv) == ("q4_0", "q4_0") else QuantKVCache
    return cls.create(n_layers, batch, max_seq, n_head_kv, dk, dv, kinds=(kk, kv))


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
