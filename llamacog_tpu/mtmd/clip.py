"""CLIP/SigLIP-style vision encoder (functional JAX) + mmproj loading.

The TPU replacement for the reference's ggml CLIP implementation
(tools/mtmd/clip.cpp): a plain jitted ViT — patch conv as an unfold+matmul
(MXU-friendly), learned positions, pre/post layernorm, standard MHA blocks,
then the multimodal projector (LLaVA MLP `mm.0/mm.2`, clip-impl.h:78; gemma3
`mm.input_projection`, :84).

mmproj GGUF tensor names per tools/mtmd/clip-impl.h:57-95, metadata keys
:16-46.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp


@dataclass
class ClipVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    n_embd: int = 1024
    n_ff: int = 4096
    n_layer: int = 24
    n_head: int = 16
    proj_dim: int = 4096  # text-model embedding size after projection
    eps: float = 1e-5
    use_gelu: bool = True  # else quick-gelu / silu per metadata
    use_silu: bool = False
    projector_type: str = "mlp"  # mlp (llava) | mlp_norm (Yi-VL) | ldp |
    # ldpv2 (MobileVLM) | gemma3 | idefics3 | resampler (minicpmv) |
    # internvl | pixtral | adapter (glm-edge) | llama4
    image_mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    image_std: tuple = (0.26862954, 0.26130258, 0.27577711)
    has_class_embd: bool = True
    vit_norm: str = "layer"  # rms for pixtral / internvl-6B ViTs
    minicpmv_version: int = 0
    proj_scale_factor: int = 0  # internvl/llama4 pixel shuffle
    spatial_merge_size: int = 0  # pixtral/mistral-small patch merger
    rope_theta: float = 10000.0  # pixtral 2D rope

    @property
    def n_patches_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def n_patches(self) -> int:
        return self.n_patches_side**2


@dataclass
class ClipVisionModel:
    config: ClipVisionConfig
    params: dict = field(default_factory=dict)

    def preprocess(self, image: np.ndarray) -> np.ndarray:
        """uint8/float HWC RGB -> normalized [3, S, S] f32 (bilinear resize;
        reference clip.cpp image preprocessing with image_mean/std)."""
        cfg = self.config
        img = np.asarray(image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        img = _resize_bilinear(img, cfg.image_size, cfg.image_size)
        img = (img - np.asarray(cfg.image_mean)) / np.asarray(cfg.image_std)
        return img.transpose(2, 0, 1).astype(np.float32)

    def encode(self, pixels: np.ndarray) -> np.ndarray:
        """[3, S, S] (or batch [B, 3, S, S]) -> projected embeddings
        [n_tokens, n_embd_text]."""
        x = jnp.asarray(pixels)
        if x.ndim == 3:
            x = x[None]
        out = _encode_jit(self.params, x, _static_cfg(self.config))
        return np.asarray(out[0] if pixels.ndim == 3 else out)


def _static_cfg(cfg: ClipVisionConfig) -> tuple:
    return (
        cfg.patch_size, cfg.n_head, cfg.eps, cfg.use_gelu, cfg.use_silu,
        cfg.projector_type, cfg.has_class_embd, cfg.vit_norm,
        cfg.proj_scale_factor, cfg.spatial_merge_size, cfg.rope_theta,
    )


def _act(x, use_gelu, use_silu):
    xf = x.astype(jnp.float32)
    if use_silu:
        return jax.nn.silu(xf)
    if use_gelu:
        return jax.nn.gelu(xf, approximate=True)
    return xf * jax.nn.sigmoid(1.702 * xf)  # quick-gelu (original CLIP)


def _layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps) * w
    if b is not None:
        out = out + b
    return out


def _vit_norm(x, w, b, eps, kind):
    if kind == "rms":
        xf = x.astype(jnp.float32)
        out = xf * jax.lax.rsqrt((xf * xf).mean(-1, keepdims=True) + eps) * w
        return out if b is None else out + b
    return _layer_norm(x, w, b, eps)


def _rope_2d(x, pos_a, pos_b, theta, interleave_freq):
    """clip.cpp build_rope_2d: head-dim split in half; each half gets
    mode-0 (interleaved-pair) rope over D/2 dims — first half positions
    pos_a, second half pos_b with the odd-frequency shift when
    interleave_freq (pixtral)."""
    B, T, H, D = x.shape
    half = D // 2

    def rot(xh, pos, fscale):
        d2 = half // 2
        inv = fscale * theta ** (-2.0 * jnp.arange(d2) / half)
        th = pos[:, None].astype(jnp.float32) * inv  # [T, d2]
        c, si = jnp.cos(th)[None, :, None, :], jnp.sin(th)[None, :, None, :]
        x1 = xh[..., 0::2]
        x2 = xh[..., 1::2]
        r1 = x1 * c - x2 * si
        r2 = x2 * c + x1 * si
        return jnp.stack([r1, r2], axis=-1).reshape(xh.shape)

    fso = theta ** (-2.0 / D) if interleave_freq else 1.0
    a = rot(x[..., :half].astype(jnp.float32), pos_a, 1.0)
    b2 = rot(x[..., half:].astype(jnp.float32), pos_b, fso)
    return jnp.concatenate([a, b2], axis=-1).astype(x.dtype)


def _sincos_2d_pos(embed_dim: int, h: int, w: int) -> np.ndarray:
    """get_2d_sincos_pos_embed (minicpmv resampler K positions)."""
    def one_dim(dim, pos):
        omega = 1.0 / 10000 ** (np.arange(dim // 2, dtype=np.float64) / (dim / 2))
        out = np.einsum("p,d->pd", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gy, gx = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    emb_h = one_dim(embed_dim // 2, gy)
    emb_w = one_dim(embed_dim // 2, gx)
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


from functools import partial


@partial(jax.jit, static_argnums=(2,))
def _encode_jit(params, pixels, static):
    (patch_size, n_head, eps, use_gelu, use_silu, proj_type, has_cls,
     vit_norm, scale_factor, merge_size, rope_theta) = static
    B, C, S, _ = pixels.shape
    P = patch_size
    n_side = S // P
    # unfold patches -> [B, n_patches, C*P*P], conv == matmul with the
    # flattened conv kernel (MXU path, no real conv needed)
    x = pixels.reshape(B, C, n_side, P, n_side, P)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, n_side * n_side, C * P * P)
    w = params["patch_embd"]  # [E, C*P*P]
    x = x.astype(jnp.float32) @ w.T
    if "patch_embd_b" in params:
        x = x + params["patch_embd_b"]
    if has_cls and "class_embd" in params:
        cls = jnp.broadcast_to(params["class_embd"][None, None], (B, 1, x.shape[-1]))
        if proj_type == "llama4":  # CLS appended last (build_llama4, clip.cpp:991)
            x = jnp.concatenate([x, cls], axis=1)
        else:
            x = jnp.concatenate([cls, x], axis=1)
    if "pos_embd" in params:
        x = x + params["pos_embd"][: x.shape[1]]
    if "pre_ln" in params:
        x = _vit_norm(x, params["pre_ln"], params.get("pre_ln_b"), eps, vit_norm)
    E = x.shape[-1]
    D = E // n_head
    scale = D**-0.5
    # pixtral/llama4: per-layer 2D rope on q/k instead of learned positions
    # (build_rope_2d, clip.cpp:535; pixtral interleave_freq=true)
    pos2d = None
    rope_ileave = True
    if proj_type == "pixtral":
        idx = jnp.arange(n_side * n_side)
        pos2d = (idx // n_side, idx % n_side)  # (h, w)
    elif proj_type == "llama4":
        # 1-based positions, CLS (last token) at 0; first half is the X axis
        # (build_llama4 add_pos + set_input pos_h/pos_w, clip.cpp:995,3984)
        idx = jnp.arange(n_side * n_side)
        zero = jnp.zeros((1,), idx.dtype)
        pos2d = (jnp.concatenate([idx % n_side + 1, zero]),
                 jnp.concatenate([idx // n_side + 1, zero]))
        rope_ileave = False
    layers = params["layers"]
    if proj_type in ("mlp", "mlp_norm", "ldp", "ldpv2"):
        # llava-projector models take features from the second-to-last layer:
        # build_llava max_feature_layer = n_layer-1 (clip.cpp:1066-1084)
        layers = layers[:-1]
    for layer in layers:
        h = _vit_norm(x, layer["ln1"], layer.get("ln1_b"), eps, vit_norm)
        q = (h @ layer["attn_q"].T + layer.get("attn_q_b", 0.0)).reshape(B, -1, n_head, D)
        k = (h @ layer["attn_k"].T + layer.get("attn_k_b", 0.0)).reshape(B, -1, n_head, D)
        v = (h @ layer["attn_v"].T + layer.get("attn_v_b", 0.0)).reshape(B, -1, n_head, D)
        if pos2d is not None:
            q = _rope_2d(q, pos2d[0], pos2d[1], rope_theta, rope_ileave)
            k = _rope_2d(k, pos2d[0], pos2d[1], rope_theta, rope_ileave)
        att = jnp.einsum("bthd,bshd->bhts", q, k) * scale
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", att, v).reshape(B, -1, E)
        o = o @ layer["attn_out"].T + layer.get("attn_out_b", 0.0)
        if "ls1" in layer:  # layer scale (InternVL)
            o = o * layer["ls1"]
        x = x + o
        h = _vit_norm(x, layer["ln2"], layer.get("ln2_b"), eps, vit_norm)
        if "ffn_gate" in layer:
            ff = _act(h @ layer["ffn_gate"].T + layer.get("ffn_gate_b", 0.0),
                      use_gelu, use_silu) * (h @ layer["ffn_up"].T + layer.get("ffn_up_b", 0.0))
        else:
            ff = _act(h @ layer["ffn_up"].T + layer.get("ffn_up_b", 0.0),
                      use_gelu, use_silu)
        ff = ff @ layer["ffn_down"].T + layer.get("ffn_down_b", 0.0)
        if "ls2" in layer:
            ff = ff * layer["ls2"]
        x = x + ff
    if "post_ln" in params:
        x = _vit_norm(x, params["post_ln"], params.get("post_ln_b"), eps, vit_norm)
    if has_cls:
        # patch tokens feed the LLM (LLaVA drops CLS; llama4 keeps it last)
        x = x[:, :-1] if proj_type == "llama4" else x[:, 1:]
    # projector
    if proj_type == "gemma3":
        x = _layer_norm(x, params["mm_soft_emb_norm"], None, eps)
        x = x @ params["mm_input_projection"]
    elif proj_type == "resampler":
        x = _resampler_proj(params, x, eps)
    elif proj_type == "internvl":
        x = _pixel_shuffle(x, n_side, n_side, scale_factor)
        x = _layer_norm(x, params["mm_0"], params.get("mm_0_b"), 1e-5)
        x = jax.nn.gelu(x @ params["mm_1"].T + params.get("mm_1_b", 0.0),
                        approximate=False)
        x = x @ params["mm_3"].T + params.get("mm_3_b", 0.0)
    elif proj_type == "pixtral":
        if "mm_patch_merger" in params:
            xm = x * jax.lax.rsqrt(
                (x.astype(jnp.float32) ** 2).mean(-1, keepdims=True) + eps
            ) * params["mm_input_norm"]
            # unfold merge_size x merge_size patch groups and project
            m = merge_size
            xm = xm.reshape(B, n_side, n_side, E)
            xm = xm.reshape(B, n_side // m, m, n_side // m, m, E)
            xm = xm.transpose(0, 1, 3, 2, 4, 5).reshape(B, -1, m * m * E)
            x = xm @ params["mm_patch_merger"].T
        x = jax.nn.gelu(x @ params["mm_1"].T + params.get("mm_1_b", 0.0),
                        approximate=False)
        x = x @ params["mm_2"].T + params.get("mm_2_b", 0.0)
        # one [IMG_BREAK] embedding appended per patch row except the last
        if "tok_img_break" in params:
            m = merge_size if merge_size > 0 else 1
            py, px = n_side // m, n_side // m
            x = x.reshape(B, py, px, -1)
            brk = jnp.broadcast_to(
                params["tok_img_break"][None, None, None, :], (B, py, 1, x.shape[-1])
            )
            x = jnp.concatenate([x, brk], axis=2).reshape(B, py * (px + 1), -1)
            x = x[:, :-1]  # no break after the final row
    elif proj_type == "idefics3":
        # pixel shuffle then a single fc (clip.cpp build_siglip idefics3 path)
        x = _pixel_shuffle(x, n_side, n_side, scale_factor)
        x = x @ params["mm_fc"].T
    elif proj_type == "llama4":
        # Llama4VisionPixelShuffleMLP + projector (clip.cpp:1013-1048)
        x = _pixel_shuffle(x, n_side, n_side, scale_factor)
        x = jax.nn.gelu(x @ params["mvlm_mlp_1"].T, approximate=True)
        x = jax.nn.gelu(x @ params["mvlm_mlp_2"].T, approximate=True)
        x = x @ params["mm_fc"].T
    elif proj_type == "mlp_norm":
        # Yi-VL: linear/LN/gelu/linear/LN (clip.cpp:1230-1251)
        x = x @ params["mm_0"].T + params.get("mm_0_b", 0.0)
        x = _layer_norm(x, params["mm_1"], params.get("mm_1_b"), eps)
        x = jax.nn.gelu(x, approximate=True)
        x = x @ params["mm_3"].T + params.get("mm_3_b", 0.0)
        x = _layer_norm(x, params["mm_4"], params.get("mm_4_b"), eps)
    elif proj_type == "ldp":
        # MobileVLM LDP (clip.cpp:1251-1360): MLP then two mobile blocks,
        # block 1 residual stride 1, block 2 stride 2
        h = jax.nn.gelu(x @ params["mvlm_mlp_1"].T + params["mvlm_mlp_1_b"],
                        approximate=True)
        h = h @ params["mvlm_mlp_3"].T + params["mvlm_mlp_3_b"]
        C = h.shape[-1]
        h = h.transpose(0, 2, 1).reshape(B, C, n_side, n_side)
        h = h + _mobile_block(params, "ldp_b1", h, eps, 1)
        h = _mobile_block(params, "ldp_b2", h, eps, 2)
        x = h.transpose(0, 2, 3, 1).reshape(B, -1, h.shape[1])
    elif proj_type == "ldpv2":
        # MobileVLM-v2 (clip.cpp:1361-1390): MLP, 2x2 avg pool, PEG dw-conv
        h = jax.nn.gelu(x @ params["mvlm_mlp_0"].T + params["mvlm_mlp_0_b"],
                        approximate=True)
        h = h @ params["mvlm_mlp_2"].T + params["mvlm_mlp_2_b"]
        C = h.shape[-1]
        h = h.transpose(0, 2, 1).reshape(B, C, n_side, n_side)
        h = h.reshape(B, C, n_side // 2, 2, n_side // 2, 2).mean(axis=(3, 5))
        peg = jax.lax.conv_general_dilated(
            h, params["peg0"], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C)
        h = h + peg + params["peg0_b"][None, :, None, None]
        x = h.transpose(0, 2, 3, 1).reshape(B, -1, C)
    elif proj_type == "adapter":
        # GLM-Edge (clip.cpp:1391-1418): 2x2 stride-2 conv, gated MLP,
        # BOI/EOI embeddings spliced around the image tokens
        h = x.transpose(0, 2, 1).reshape(B, E, n_side, n_side)
        h = jax.lax.conv_general_dilated(
            h, params["glm_conv"], (2, 2), ((0, 0), (0, 0)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        h = h.reshape(B, h.shape[1], -1).transpose(0, 2, 1) + params["glm_conv_b"]
        h = h @ params["glm_linear"].T
        h = _layer_norm(h, params["glm_norm1"], params.get("glm_norm1_b"), eps)
        h = jax.nn.gelu(h, approximate=True)
        h = jax.nn.silu(h @ params["glm_gate"].T) * (h @ params["glm_h4h"].T)
        h = h @ params["glm_4hh"].T
        boi = jnp.broadcast_to(params["glm_boi"][None, None], (B, 1, h.shape[-1]))
        eoi = jnp.broadcast_to(params["glm_eoi"][None, None], (B, 1, h.shape[-1]))
        x = jnp.concatenate([boi, h, eoi], axis=1)
    elif "mm_0" in params:  # llava MLP: mm.0 -> gelu -> mm.2
        x = x @ params["mm_0"].T + params.get("mm_0_b", 0.0)
        x = jax.nn.gelu(x, approximate=False)
        if "mm_2" in params:
            x = x @ params["mm_2"].T + params.get("mm_2_b", 0.0)
    return x


def _mobile_block(p, pre, x, eps, stride):
    """MobileVLM LDP mobile block (clip.cpp:1262-1360): 3x3 depthwise conv →
    channel LayerNorm → hardswish → squeeze-excite (global avgpool / fc1 /
    relu / fc2 / hardsigmoid) → pointwise conv → channel LayerNorm. NCHW."""
    C = x.shape[1]
    y = jax.lax.conv_general_dilated(
        x, p[pre + "_dw"], (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C)
    y = y.transpose(0, 2, 3, 1)
    y = _layer_norm(y, p[pre + "_ln0"], p.get(pre + "_ln0_b"), eps)
    hw = jax.nn.hard_swish(y.transpose(0, 3, 1, 2))
    se = hw.mean(axis=(2, 3))
    se = jax.nn.relu(se @ p[pre + "_fc1"].T + p[pre + "_fc1_b"])
    se = jax.nn.hard_sigmoid(se @ p[pre + "_fc2"].T + p[pre + "_fc2_b"])
    y = hw * se[:, :, None, None]
    y = y.transpose(0, 2, 3, 1) @ p[pre + "_pw"].T
    y = _layer_norm(y, p[pre + "_ln2"], p.get(pre + "_ln2_b"), eps)
    return y.transpose(0, 3, 1, 2)


def _pixel_shuffle(x, height, width, scale_factor):
    """InternVL/llama4 pixel shuffle (clip.cpp build_internvl): fold an
    sxs patch neighbourhood into the channel dim."""
    B, T, E = x.shape
    sf = scale_factor
    x = x.reshape(B, height, width, E)
    x = x.reshape(B, height, width // sf, sf * E)
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(B, width // sf, height // sf, sf * sf * E)
    x = x.transpose(0, 2, 1, 3)
    return x.reshape(B, (height // sf) * (width // sf), sf * sf * E)


def _resampler_proj(params, x, eps):
    """MiniCPM-V perceiver resampler (clip.cpp build_minicpmv): learned
    query tokens cross-attend to the ViT features; K adds a 2D sincos
    position embedding in the resampler dim."""
    B = x.shape[0]
    q = params["rs_query"]  # [n_query, Dm]
    v = x @ params["rs_kv_proj"].T  # [B, T, Dm]
    q = _layer_norm(q, params["rs_ln_q"], params.get("rs_ln_q_b"), eps)
    v = _layer_norm(v, params["rs_ln_kv"], params.get("rs_ln_kv_b"), eps)
    k = v + params["rs_pos_k"][None, : v.shape[1]]
    Dm = q.shape[-1]
    d_head = 128 if Dm % 128 == 0 else Dm
    n_head = Dm // d_head
    n_query = q.shape[0]
    Q = (q @ params["rs_attn_q"].T + params.get("rs_attn_q_b", 0.0))
    K = (k @ params["rs_attn_k"].T + params.get("rs_attn_k_b", 0.0))
    V = (v @ params["rs_attn_v"].T + params.get("rs_attn_v_b", 0.0))
    Q = jnp.broadcast_to(Q[None], (B, n_query, Dm)).reshape(B, n_query, n_head, d_head)
    K = K.reshape(B, -1, n_head, d_head)
    V = V.reshape(B, -1, n_head, d_head)
    att = jnp.einsum("bthd,bshd->bhts", Q, K) * (d_head ** -0.5)
    att = jax.nn.softmax(att, axis=-1)
    o = jnp.einsum("bhts,bshd->bthd", att, V).reshape(B, n_query, Dm)
    o = o @ params["rs_attn_out"].T + params.get("rs_attn_out_b", 0.0)
    o = _layer_norm(o, params["rs_ln_post"], params.get("rs_ln_post_b"), eps)
    return o @ params["rs_proj"]


def load_mmproj(path: str) -> ClipVisionModel:
    """Load a .mmproj GGUF (clip.cpp format) into a ClipVisionModel."""
    from ..gguf import GGUFModelReader
    from ..quant.decode_np import dequantize_tensor

    r = GGUFModelReader(path)
    md = r.metadata

    def g(key, default=None):
        return md.get(key, default)

    cfg = ClipVisionConfig(
        image_size=int(g("clip.vision.image_size", 224)),
        patch_size=int(g("clip.vision.patch_size", 14)),
        n_embd=int(g("clip.vision.embedding_length", 1024)),
        n_ff=int(g("clip.vision.feed_forward_length", 4096)),
        n_layer=int(g("clip.vision.block_count", 24)),
        n_head=int(g("clip.vision.attention.head_count", 16)),
        proj_dim=int(g("clip.vision.projection_dim", 4096)),
        eps=float(g("clip.vision.attention.layer_norm_epsilon", 1e-5)),
        use_gelu=bool(g("clip.use_gelu", False)),
        use_silu=bool(g("clip.use_silu", False)),
        projector_type=str(g("clip.projector_type", "mlp")),
        image_mean=tuple(g("clip.vision.image_mean", (0.48145466, 0.4578275, 0.40821073))),
        image_std=tuple(g("clip.vision.image_std", (0.26862954, 0.26130258, 0.27577711))),
        minicpmv_version=int(g("clip.minicpmv_version", 0) or 0),
        proj_scale_factor=int(g("clip.vision.projector.scale_factor", 0) or 0),
        spatial_merge_size=int(g("clip.vision.spatial_merge_size", 0) or 0),
        rope_theta=float(g("clip.vision.rope_theta", 10000.0) or 10000.0),
    )
    if cfg.projector_type == "pixtral":
        cfg.vit_norm = "rms"
    elif cfg.projector_type == "internvl" and cfg.n_embd == 3200 and cfg.n_layer == 45:
        cfg.vit_norm = "rms"  # 6B InternVL ViT (clip.cpp build_internvl)

    def t(name):
        if name not in r.tensors:
            return None
        rd, ti = r.tensors[name]
        arr = dequantize_tensor(rd.tensor_bytes(name), ti.ggml_type, ti.shape)
        return jnp.asarray(arr, jnp.float32)

    p: dict = {}
    pe = t("v.patch_embd.weight")
    if pe is None:
        raise ValueError(f"{path}: no v.patch_embd.weight (not an mmproj gguf?)")
    p["patch_embd"] = pe.reshape(pe.shape[0], -1)  # [E, C*P*P]
    if (b := t("v.patch_embd.bias")) is not None:
        p["patch_embd_b"] = b
    if (c := t("v.class_embd")) is not None:
        p["class_embd"] = c
    else:
        cfg.has_class_embd = False
    if (pos := t("v.position_embd.weight")) is not None:
        p["pos_embd"] = pos
    for pre, key in (("v.pre_ln", "pre_ln"), ("v.post_ln", "post_ln")):
        if (w := t(pre + ".weight")) is not None:
            p[key] = w
            if (b := t(pre + ".bias")) is not None:
                p[key + "_b"] = b
    layers = []
    for il in range(cfg.n_layer):
        bl = f"v.blk.{il}."
        layer = {}
        for gguf_name, key in (
            ("attn_q", "attn_q"), ("attn_k", "attn_k"), ("attn_v", "attn_v"),
            ("attn_out", "attn_out"), ("ln1", "ln1"), ("ln2", "ln2"),
            ("ffn_up", "ffn_up"), ("ffn_down", "ffn_down"), ("ffn_gate", "ffn_gate"),
            ("ls1", "ls1"), ("ls2", "ls2"),
        ):
            if (w := t(bl + gguf_name + ".weight")) is not None:
                layer[key] = w
            if (b := t(bl + gguf_name + ".bias")) is not None:
                layer[key + "_b"] = b
        layers.append(layer)
    p["layers"] = layers
    # projectors
    for i in (0, 1, 2, 3, 4):
        if (w := t(f"mm.{i}.weight")) is not None:
            p[f"mm_{i}"] = w
        if (b := t(f"mm.{i}.bias")) is not None:
            p[f"mm_{i}_b"] = b
    # Yi-VL stores an "mlp" projector with extra LN tensors mm.3/mm.4
    # (clip.cpp:2411-2414 auto-promotes to MLP_NORM)
    if cfg.projector_type == "mlp" and "mm_3" in p and "mm_4" in p:
        cfg.projector_type = "mlp_norm"
    # mm.model.mlp.N — internvl / MobileVLM ldp+ldpv2 / llama4
    # (TN_MVLM_PROJ_MLP, clip-impl.h:80)
    for i in (0, 1, 2, 3):
        if (w := t(f"mm.model.mlp.{i}.weight")) is not None:
            p[f"mvlm_mlp_{i}"] = w
        if (b := t(f"mm.model.mlp.{i}.bias")) is not None:
            p[f"mvlm_mlp_{i}_b"] = b
    if cfg.projector_type == "internvl":
        for i in (0, 1, 3):  # internvl graph reads them as mm_0/mm_1/mm_3
            if f"mvlm_mlp_{i}" in p:
                p[f"mm_{i}"] = p[f"mvlm_mlp_{i}"]
            if f"mvlm_mlp_{i}_b" in p:
                p[f"mm_{i}_b"] = p[f"mvlm_mlp_{i}_b"]
    if (w := t("mm.model.fc.weight")) is not None:  # idefics3 / llama4 proj
        p["mm_fc"] = w
    if (w := t("mm.model.peg.0.weight")) is not None:  # MobileVLM-v2 PEG
        p["peg0"] = w
        p["peg0_b"] = t("mm.model.peg.0.bias")
    for bi in (1, 2):  # MobileVLM LDP mobile blocks (TN_MVLM_PROJ_BLOCK)
        base = f"mm.model.mb_block.{bi}.block"
        if (w := t(f"{base}.0.0.weight")) is None:
            continue
        pre = f"ldp_b{bi}"
        p[pre + "_dw"] = w
        p[pre + "_ln0"] = t(f"{base}.0.1.weight")
        p[pre + "_ln0_b"] = t(f"{base}.0.1.bias")
        p[pre + "_fc1"] = t(f"{base}.1.fc1.weight")
        p[pre + "_fc1_b"] = t(f"{base}.1.fc1.bias")
        p[pre + "_fc2"] = t(f"{base}.1.fc2.weight")
        p[pre + "_fc2_b"] = t(f"{base}.1.fc2.bias")
        p[pre + "_pw"] = t(f"{base}.2.0.weight")
        p[pre + "_ln2"] = t(f"{base}.2.1.weight")
        p[pre + "_ln2_b"] = t(f"{base}.2.1.bias")
    if (w := t("adapter.conv.weight")) is not None:  # GLM-Edge (clip-impl.h:100)
        p["glm_conv"] = w
        p["glm_conv_b"] = t("adapter.conv.bias")
        p["glm_linear"] = t("adapter.linear.linear.weight")
        p["glm_norm1"] = t("adapter.linear.norm1.weight")
        if (b := t("adapter.linear.norm1.bias")) is not None:
            p["glm_norm1_b"] = b
        p["glm_h4h"] = t("adapter.linear.dense_h_to_4h.weight")
        p["glm_gate"] = t("adapter.linear.gate.weight")
        p["glm_4hh"] = t("adapter.linear.dense_4h_to_h.weight")
        p["glm_boi"] = t("adapter.boi").reshape(-1)
        p["glm_eoi"] = t("adapter.eoi").reshape(-1)
    if (w := t("mm.input_projection.weight")) is not None:
        p["mm_input_projection"] = w
    if (w := t("mm.soft_emb_norm.weight")) is not None:
        p["mm_soft_emb_norm"] = w
    # pixtral extras (clip-impl.h:83-88)
    if (w := t("mm.patch_merger.weight")) is not None:
        p["mm_patch_merger"] = w
    if (w := t("mm.input_norm.weight")) is not None:
        p["mm_input_norm"] = w
    if (w := t("v.token_embd.img_break")) is not None:
        p["tok_img_break"] = w.reshape(-1)
    # minicpmv resampler (clip-impl.h:93-98)
    if (q := t("resampler.query")) is not None:
        p["rs_query"] = q
        p["rs_kv_proj"] = t("resampler.kv.weight")
        proj = t("resampler.proj.weight")
        dm = q.shape[-1]
        p["rs_proj"] = proj if proj.shape[0] == dm else proj.T
        for nm, key in (("q", "rs_attn_q"), ("k", "rs_attn_k"), ("v", "rs_attn_v"),
                        ("out", "rs_attn_out")):
            p[key] = t(f"resampler.attn.{nm}.weight")
            if (b := t(f"resampler.attn.{nm}.bias")) is not None:
                p[key + "_b"] = b
        for nm, key in (("q", "rs_ln_q"), ("kv", "rs_ln_kv"), ("post", "rs_ln_post")):
            p[key] = t(f"resampler.ln_{nm}.weight")
            if (b := t(f"resampler.ln_{nm}.bias")) is not None:
                p[key + "_b"] = b
        if (pk := t("resampler.pos_embed_k")) is not None:
            p["rs_pos_k"] = pk.reshape(-1, dm)
        else:  # computed 2D sincos grid (clip.cpp set_input minicpmv)
            side = cfg.n_patches_side
            p["rs_pos_k"] = jnp.asarray(_sincos_2d_pos(dm, side, side))
    r.close()
    return ClipVisionModel(cfg, p)


def _resize_bilinear(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """[H, W, C] float -> [h, w, C] bilinear."""
    H, W = img.shape[:2]
    if (H, W) == (h, w):
        return img
    ys = (np.arange(h) + 0.5) * H / h - 0.5
    xs = (np.arange(w) + 0.5) * W / w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, H - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, W - 1)
    y1 = np.clip(y0 + 1, 0, H - 1)
    x1 = np.clip(x0 + 1, 0, W - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, :, None]
    a = img[y0][:, x0] * (1 - wy) * (1 - wx)
    b = img[y0][:, x1] * (1 - wy) * wx
    c = img[y1][:, x0] * wy * (1 - wx)
    d = img[y1][:, x1] * wy * wx
    return (a + b + c + d).astype(np.float32)
