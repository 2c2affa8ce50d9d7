"""Qwen2-VL vision tower (functional JAX) + M-RoPE helpers.

Covers the reference's build_qwen2vl graph (tools/mtmd/clip.cpp:625) /
ggml_rope_multi M-RoPE (ggml-cpu/ops.cpp:5120): dual temporal-frame conv
patchify, 2x2 spatial-merge patch ordering, vision rotary where each head-dim
sector takes its angle from a different position component (h/w for vision;
t/h/w for the text model), and the 2x2 merger MLP projecting into the text
embedding space.

Implementation is verified against HF Qwen2VisionTransformerPretrainedModel.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def mrope_tables(
    positions: jnp.ndarray,  # [C, T] position components (t, h, w[, e])
    sections: tuple,  # rotary dims per component (pairs), e.g. (16, 24, 24)
    head_dim: int,
    freq_base: float = 10000.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(cos, sin) [T, dim/2] for M-RoPE: rotary pair i takes its angle from
    positions[sector(i)] where sector(i) = bucket of i over `sections`
    cycled (ggml_mrope_cache_init sector logic, ops.cpp:5134-5166)."""
    dim = head_dim
    half = dim // 2
    inv_freq = jnp.asarray(
        freq_base ** -(np.arange(0, dim, 2, dtype=np.float64) / dim), jnp.float32
    )  # [half]
    sect = np.asarray(sections + (0,) * (4 - len(sections)))
    sect_dims = int(sect.sum())
    bounds = np.cumsum(sect)
    sector = np.arange(half) % sect_dims
    comp = np.searchsorted(bounds, sector, side="right")  # component index per pair
    comp = np.minimum(comp, positions.shape[0] - 1)
    pos_per_pair = positions[comp, :]  # [half, T]
    theta = pos_per_pair.T.astype(jnp.float32) * inv_freq[None, :]  # [T, half]
    return jnp.cos(theta), jnp.sin(theta)


@dataclass
class Qwen2VLVisionConfig:
    patch_size: int = 14
    temporal_patch_size: int = 2
    n_embd: int = 1280
    n_layer: int = 32
    n_head: int = 16
    n_ff: int = 0  # 0 -> mlp_ratio*embd
    out_dim: int = 3584  # text model n_embd
    spatial_merge: int = 2
    eps: float = 1e-6
    use_silu: bool = False  # qwen2.5vl uses rms+silu; qwen2vl LN+quick-gelu


@dataclass
class Qwen2VLVisionModel:
    config: Qwen2VLVisionConfig
    params: dict = field(default_factory=dict)

    def patchify(self, image: np.ndarray) -> tuple[np.ndarray, tuple[int, int]]:
        """[H, W, 3] float (normalized) -> flattened patches
        [n_patches, C*tp*P*P] in HF's 2x2-merged order + (gh, gw) grid."""
        cfg = self.config
        P, TP = cfg.patch_size, cfg.temporal_patch_size
        H, W = image.shape[:2]
        gh, gw = H // P, W // P
        x = image[: gh * P, : gw * P].transpose(2, 0, 1)  # [C, H, W]
        x = np.stack([x] * TP)  # duplicate temporal frames [TP, C, H, W]
        m = cfg.spatial_merge
        x = x.reshape(TP, 3, gh // m, m, P, gw // m, m, P)
        # HF order: (gh/m, gw/m, m, m) patches, channel-major patch vectors
        x = x.transpose(2, 5, 3, 6, 1, 0, 4, 7)  # [gh/m, gw/m, m, m, C, TP, P, P]
        patches = x.reshape(gh * gw, 3 * TP * P * P)
        return patches.astype(np.float32), (gh, gw)

    def grid_positions(self, gh: int, gw: int) -> np.ndarray:
        """(h, w) index per patch in the 2x2-merged order -> [2, n]."""
        m = self.config.spatial_merge
        hs, ws = [], []
        for bh in range(gh // m):
            for bw in range(gw // m):
                for ih in range(m):
                    for iw in range(m):
                        hs.append(bh * m + ih)
                        ws.append(bw * m + iw)
        return np.stack([np.asarray(hs), np.asarray(ws)])

    def encode(self, image: np.ndarray) -> np.ndarray:
        """normalized [H, W, 3] -> [n_tokens, out_dim] (n_tokens = n/4)."""
        patches, (gh, gw) = self.patchify(image)
        pos_hw = self.grid_positions(gh, gw)
        static = (self.config.n_head, self.config.eps, self.config.spatial_merge)
        out = _encode_jit(
            self.params, jnp.asarray(patches), jnp.asarray(pos_hw), static
        )
        m = self.config.spatial_merge
        # merged output grid, consumed by the engine's M-RoPE positions
        self.last_grid = (gh // m, gw // m)
        return np.asarray(out)


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps) * w
    return out + b if b is not None else out


def _rot_half(x, cos, sin):
    # NeoX-style rotate pairs (i, i+half) with given tables [T, half]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    c = cos[:, None, :]
    s = sin[:, None, :]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


@partial(jax.jit, static_argnums=(3,))
def _encode_jit(params, patches, pos_hw, static):
    n_head, eps, merge = static
    x = patches.astype(jnp.float32) @ params["patch_embd"].T  # [N, E]
    N, E = x.shape
    D = E // n_head
    scale = D**-0.5
    # vision rotary: first half of pairs from h, second half from w
    # (HF Qwen2VL VisionRotaryEmbedding: rotary dim = D/2, cat(h_emb, w_emb))
    half = D // 2
    inv_freq = jnp.asarray(
        10000.0 ** -(np.arange(0, half, 2, dtype=np.float64) / half), jnp.float32
    )
    th = pos_hw[0][:, None].astype(jnp.float32) * inv_freq[None]  # [N, half/2]
    tw = pos_hw[1][:, None].astype(jnp.float32) * inv_freq[None]
    theta = jnp.concatenate([th, tw], axis=-1)  # [N, half]
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    for layer in params["layers"]:
        h = _ln(x, layer["ln1"], layer.get("ln1_b"), eps)
        qkv = h @ layer["attn_qkv"].T + layer["attn_qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _rot_half(q.reshape(N, n_head, D), cos, sin)
        k = _rot_half(k.reshape(N, n_head, D), cos, sin)
        v = v.reshape(N, n_head, D)
        s = jnp.einsum("thd,shd->hts", q, k) * scale
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("hts,shd->thd", p, v).reshape(N, E)
        x = x + (o @ layer["attn_out"].T + layer["attn_out_b"])
        h = _ln(x, layer["ln2"], layer.get("ln2_b"), eps)
        ff = h @ layer["ffn_up"].T + layer["ffn_up_b"]
        ff = ff * jax.nn.sigmoid(1.702 * ff)  # quick-gelu
        x = x + (ff @ layer["ffn_down"].T + layer["ffn_down_b"])
    # merger: ln_q -> group 2x2 -> MLP (gelu) -> out_dim
    x = _ln(x, params["post_ln"], params.get("post_ln_b"), eps)
    x = x.reshape(N // (merge * merge), merge * merge * E)
    x = x @ params["mm_0"].T + params["mm_0_b"]
    x = jax.nn.gelu(x, approximate=False)
    return x @ params["mm_2"].T + params["mm_2_b"]


def load_qwen2vl_mmproj(path: str) -> Qwen2VLVisionModel:
    """Load a qwen2vl mmproj GGUF (clip.cpp names: v.patch_embd.weight[.1],
    v.blk.N.*, v.post_ln, mm.0/mm.2 merger)."""
    from ..gguf import GGUFModelReader
    from ..quant.decode_np import dequantize_tensor

    r = GGUFModelReader(path)
    md = r.metadata
    cfg = Qwen2VLVisionConfig(
        patch_size=int(md.get("clip.vision.patch_size", 14)),
        n_embd=int(md.get("clip.vision.embedding_length", 1280)),
        n_layer=int(md.get("clip.vision.block_count", 32)),
        n_head=int(md.get("clip.vision.attention.head_count", 16)),
        out_dim=int(md.get("clip.vision.projection_dim", 3584)),
        eps=float(md.get("clip.vision.attention.layer_norm_epsilon", 1e-6)),
    )

    def t(name):
        if name not in r.tensors:
            return None
        rd, ti = r.tensors[name]
        return jnp.asarray(
            dequantize_tensor(rd.tensor_bytes(name), ti.ggml_type, ti.shape), jnp.float32
        )

    p: dict = {}
    pe0 = t("v.patch_embd.weight")
    pe1 = t("v.patch_embd.weight.1")
    # combine the two temporal conv planes into one [E, C*TP*P*P] matmul
    w0 = pe0.reshape(pe0.shape[0], 3, 1, -1)
    w1 = (pe1 if pe1 is not None else pe0).reshape(pe0.shape[0], 3, 1, -1)
    p["patch_embd"] = jnp.concatenate([w0, w1], axis=2).reshape(pe0.shape[0], -1)
    for pre, key in (("v.post_ln", "post_ln"),):
        if (w := t(pre + ".weight")) is not None:
            p[key] = w
            if (b := t(pre + ".bias")) is not None:
                p[key + "_b"] = b
    layers = []
    for il in range(cfg.n_layer):
        bl = f"v.blk.{il}."
        layer = {}
        for gg, key in (("attn_qkv", "attn_qkv"), ("attn_q", "attn_q"),
                        ("attn_k", "attn_k"), ("attn_v", "attn_v"),
                        ("attn_out", "attn_out"), ("ln1", "ln1"), ("ln2", "ln2"),
                        ("ffn_up", "ffn_up"), ("ffn_down", "ffn_down")):
            if (w := t(bl + gg + ".weight")) is not None:
                layer[key] = w
            if (b := t(bl + gg + ".bias")) is not None:
                layer[key + "_b"] = b
        if "attn_qkv" not in layer and "attn_q" in layer:
            layer["attn_qkv"] = jnp.concatenate(
                [layer.pop("attn_q"), layer.pop("attn_k"), layer.pop("attn_v")]
            )
            layer["attn_qkv_b"] = jnp.concatenate(
                [layer.pop("attn_q_b"), layer.pop("attn_k_b"), layer.pop("attn_v_b")]
            )
        layers.append(layer)
    p["layers"] = layers
    for i in (0, 2):
        if (w := t(f"mm.{i}.weight")) is not None:
            p[f"mm_{i}"] = w
        if (b := t(f"mm.{i}.bias")) is not None:
            p[f"mm_{i}_b"] = b
    r.close()
    return Qwen2VLVisionModel(cfg, p)
