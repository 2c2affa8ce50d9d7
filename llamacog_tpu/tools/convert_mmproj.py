"""HF -> mmproj GGUF converter: the reference's `--mmproj` mode.

Converter roles of the reference MmprojModel subclasses
(convert_hf_to_gguf.py: LlavaVisionModel pixtral :2037, SmolVLMModel :2102,
Llama4VisionModel :2179, Qwen2VLVisionModel :2766, Qwen25OmniModel :2847,
InternVisionModel :2908, Gemma3VisionModel :4277, WhisperEncoderModel /
UltravoxWhisperEncoderModel :6232).  GGUF tensor names per
gguf-py/gguf/tensor_mapping.py MMPROJ section (tools/mtmd/clip-impl.h),
metadata keys per gguf-py constants Keys.Clip*.  Output loads into
llamacog_tpu.mtmd.clip / llamacog_tpu.mtmd.audio.
"""

from __future__ import annotations

import json
import pathlib
import re

import numpy as np

from ..gguf import GGUFWriter

# ---------------------------------------------------------------------------
# HF -> GGUF tensor aliases (tensor_mapping.py MMPROJ block; {bid} = layer)
# ---------------------------------------------------------------------------

_ALIASES = [
    # vision encoder blocks
    ("vision_tower.vision_model.encoder.layers.{bid}.self_attn.q_proj", "v.blk.{bid}.attn_q"),
    ("vpm.encoder.layers.{bid}.self_attn.q_proj", "v.blk.{bid}.attn_q"),
    ("model.vision_model.encoder.layers.{bid}.self_attn.q_proj", "v.blk.{bid}.attn_q"),
    ("vision_model.model.layers.{bid}.self_attn.q_proj", "v.blk.{bid}.attn_q"),
    ("vision_tower.transformer.layers.{bid}.attention.q_proj", "v.blk.{bid}.attn_q"),
    ("visual.blocks.{bid}.attn.q", "v.blk.{bid}.attn_q"),
    ("vision_tower.vision_model.encoder.layers.{bid}.attn.q_norm", "v.blk.{bid}.attn_q_norm"),
    ("vision_tower.vision_model.encoder.layers.{bid}.self_attn.k_proj", "v.blk.{bid}.attn_k"),
    ("vpm.encoder.layers.{bid}.self_attn.k_proj", "v.blk.{bid}.attn_k"),
    ("model.vision_model.encoder.layers.{bid}.self_attn.k_proj", "v.blk.{bid}.attn_k"),
    ("vision_model.model.layers.{bid}.self_attn.k_proj", "v.blk.{bid}.attn_k"),
    ("vision_tower.transformer.layers.{bid}.attention.k_proj", "v.blk.{bid}.attn_k"),
    ("visual.blocks.{bid}.attn.k", "v.blk.{bid}.attn_k"),
    ("vision_tower.vision_model.encoder.layers.{bid}.attn.k_norm", "v.blk.{bid}.attn_k_norm"),
    ("vision_tower.vision_model.encoder.layers.{bid}.self_attn.v_proj", "v.blk.{bid}.attn_v"),
    ("vpm.encoder.layers.{bid}.self_attn.v_proj", "v.blk.{bid}.attn_v"),
    ("model.vision_model.encoder.layers.{bid}.self_attn.v_proj", "v.blk.{bid}.attn_v"),
    ("vision_model.model.layers.{bid}.self_attn.v_proj", "v.blk.{bid}.attn_v"),
    ("vision_tower.transformer.layers.{bid}.attention.v_proj", "v.blk.{bid}.attn_v"),
    ("visual.blocks.{bid}.attn.v", "v.blk.{bid}.attn_v"),
    ("vision_tower.vision_model.encoder.layers.{bid}.self_attn.out_proj", "v.blk.{bid}.attn_out"),
    ("vision_tower.vision_model.encoder.layers.{bid}.attn.proj", "v.blk.{bid}.attn_out"),
    ("vpm.encoder.layers.{bid}.self_attn.out_proj", "v.blk.{bid}.attn_out"),
    ("model.vision_model.encoder.layers.{bid}.self_attn.out_proj", "v.blk.{bid}.attn_out"),
    ("vision_model.model.layers.{bid}.self_attn.o_proj", "v.blk.{bid}.attn_out"),
    ("vision_tower.transformer.layers.{bid}.attention.o_proj", "v.blk.{bid}.attn_out"),
    ("visual.blocks.{bid}.attn.proj", "v.blk.{bid}.attn_out"),
    ("vision_tower.vision_model.encoder.layers.{bid}.layer_norm1", "v.blk.{bid}.ln1"),
    ("vision_tower.vision_model.encoder.layers.{bid}.norm1", "v.blk.{bid}.ln1"),
    ("vpm.encoder.layers.{bid}.layer_norm1", "v.blk.{bid}.ln1"),
    ("model.vision_model.encoder.layers.{bid}.layer_norm1", "v.blk.{bid}.ln1"),
    ("vision_tower.transformer.layers.{bid}.attention_norm", "v.blk.{bid}.ln1"),
    ("vision_model.model.layers.{bid}.input_layernorm", "v.blk.{bid}.ln1"),
    ("visual.blocks.{bid}.norm1", "v.blk.{bid}.ln1"),
    ("vision_tower.vision_model.encoder.layers.{bid}.layer_norm2", "v.blk.{bid}.ln2"),
    ("vision_tower.vision_model.encoder.layers.{bid}.norm2", "v.blk.{bid}.ln2"),
    ("vpm.encoder.layers.{bid}.layer_norm2", "v.blk.{bid}.ln2"),
    ("model.vision_model.encoder.layers.{bid}.layer_norm2", "v.blk.{bid}.ln2"),
    ("vision_model.model.layers.{bid}.post_attention_layernorm", "v.blk.{bid}.ln2"),
    ("vision_tower.transformer.layers.{bid}.ffn_norm", "v.blk.{bid}.ln2"),
    ("visual.blocks.{bid}.norm2", "v.blk.{bid}.ln2"),
    ("vision_tower.vision_model.encoder.layers.{bid}.mlp.fc1", "v.blk.{bid}.ffn_up"),
    ("vpm.encoder.layers.{bid}.mlp.fc1", "v.blk.{bid}.ffn_up"),
    ("model.vision_model.encoder.layers.{bid}.mlp.fc1", "v.blk.{bid}.ffn_up"),
    ("vision_tower.transformer.layers.{bid}.feed_forward.up_proj", "v.blk.{bid}.ffn_up"),
    ("vision_model.model.layers.{bid}.mlp.fc1", "v.blk.{bid}.ffn_up"),
    ("visual.blocks.{bid}.mlp.fc1", "v.blk.{bid}.ffn_up"),
    ("visual.blocks.{bid}.mlp.up_proj", "v.blk.{bid}.ffn_up"),
    ("vision_tower.transformer.layers.{bid}.feed_forward.gate_proj", "v.blk.{bid}.ffn_gate"),
    ("visual.blocks.{bid}.mlp.gate_proj", "v.blk.{bid}.ffn_gate"),
    ("vision_tower.vision_model.encoder.layers.{bid}.mlp.fc2", "v.blk.{bid}.ffn_down"),
    ("vpm.encoder.layers.{bid}.mlp.fc2", "v.blk.{bid}.ffn_down"),
    ("model.vision_model.encoder.layers.{bid}.mlp.fc2", "v.blk.{bid}.ffn_down"),
    ("vision_tower.transformer.layers.{bid}.feed_forward.down_proj", "v.blk.{bid}.ffn_down"),
    ("vision_model.model.layers.{bid}.mlp.fc2", "v.blk.{bid}.ffn_down"),
    ("visual.blocks.{bid}.mlp.fc2", "v.blk.{bid}.ffn_down"),
    ("visual.blocks.{bid}.mlp.down_proj", "v.blk.{bid}.ffn_down"),
    ("vision_tower.vision_model.encoder.layers.{bid}.ls1", "v.blk.{bid}.ls1"),
    ("vision_tower.vision_model.encoder.layers.{bid}.ls2", "v.blk.{bid}.ls2"),
    # vision globals
    ("vision_tower.vision_model.embeddings.class_embedding", "v.class_embd"),
    ("vision_model.class_embedding", "v.class_embd"),
    ("vision_tower.vision_model.embeddings.patch_embedding", "v.patch_embd"),
    ("vpm.embeddings.patch_embedding", "v.patch_embd"),
    ("model.vision_model.embeddings.patch_embedding", "v.patch_embd"),
    ("vision_tower.patch_conv", "v.patch_embd"),
    ("vision_model.patch_embedding.linear", "v.patch_embd"),
    ("visual.patch_embed.proj", "v.patch_embd"),
    ("vision_tower.vision_model.embeddings.position_embedding", "v.position_embd"),
    ("vpm.embeddings.position_embedding", "v.position_embd"),
    ("model.vision_model.embeddings.position_embedding", "v.position_embd"),
    ("vision_model.positional_embedding_vlm", "v.position_embd"),
    ("vision_tower.vision_model.pre_layrnorm", "v.pre_ln"),
    ("vision_tower.ln_pre", "v.pre_ln"),
    ("vision_model.layernorm_pre", "v.pre_ln"),
    ("vision_tower.vision_model.post_layernorm", "v.post_ln"),
    ("model.vision_model.post_layernorm", "v.post_ln"),
    ("vision_model.layernorm_post", "v.post_ln"),
    ("visual.merger.ln_q", "v.post_ln"),
    # projectors
    ("multi_modal_projector.linear_0", "mm.0"),
    ("visual.merger.mlp.0", "mm.0"),
    ("multi_modal_projector.linear_1", "mm.1"),
    ("visual.merger.mlp.1", "mm.1"),
    ("multi_modal_projector.linear_2", "mm.2"),
    ("visual.merger.mlp.2", "mm.2"),
    ("multi_modal_projector.linear_3", "mm.3"),
    ("visual.merger.mlp.3", "mm.3"),
    ("multi_modal_projector.norm", "mm.input_norm"),
    ("multi_modal_projector.mm_input_projection", "mm.input_projection"),
    ("multi_modal_projector.mm_soft_emb_norm", "mm.soft_emb_norm"),
    ("multi_modal_projector.patch_merger.merging_layer", "mm.patch_merger"),
    ("model.connector.modality_projection.proj", "mm.model.fc"),
    ("vision_model.vision_adapter.mlp.fc0", "mm.model.mlp.0"),
    ("vision_model.vision_adapter.mlp.fc1", "mm.model.mlp.1"),
    ("vision_model.vision_adapter.mlp.fc2", "mm.model.mlp.2"),
    ("mlp1.0", "mm.model.mlp.0"),
    ("mlp1.1", "mm.model.mlp.1"),
    ("mlp1.2", "mm.model.mlp.2"),
    ("mlp1.3", "mm.model.mlp.3"),
    # audio encoder (whisper family)
    ("audio_tower.layers.{bid}.self_attn.q_proj", "a.blk.{bid}.attn_q"),
    ("audio_tower.layers.{bid}.self_attn.k_proj", "a.blk.{bid}.attn_k"),
    ("audio_tower.layers.{bid}.self_attn.v_proj", "a.blk.{bid}.attn_v"),
    ("audio_tower.layers.{bid}.self_attn.out_proj", "a.blk.{bid}.attn_out"),
    ("audio_tower.layers.{bid}.self_attn_layer_norm", "a.blk.{bid}.ln1"),
    ("audio_tower.layers.{bid}.final_layer_norm", "a.blk.{bid}.ln2"),
    ("audio_tower.layers.{bid}.fc1", "a.blk.{bid}.ffn_up"),
    ("audio_tower.layers.{bid}.fc2", "a.blk.{bid}.ffn_down"),
    ("audio_tower.conv{bid}", "a.conv1d.{bid}"),
    ("audio_tower.embed_positions", "a.position_embd"),
    ("audio_tower.layer_norm", "a.post_ln"),
    ("audio_tower.ln_post", "a.post_ln"),
    ("audio.multi_modal_projector.linear", "mm.a.fc"),
    ("audio_tower.proj", "mm.a.fc"),
    ("audio.multi_modal_projector.linear_0", "mm.a.mlp.0"),
    ("audio.multi_modal_projector.linear_1", "mm.a.mlp.1"),
    ("audio.multi_modal_projector.linear_2", "mm.a.mlp.2"),
    ("audio.multi_modal_projector.ln_pre", "mm.a.norm_pre"),
    ("audio.multi_modal_projector.ln_mid", "mm.a.norm_mid"),
]

_COMPILED = [(re.compile("^" + re.escape(h).replace(r"\{bid\}", r"(\d+)")
                         + "$"), g) for h, g in _ALIASES]


def _map_name(name: str) -> str:
    """HF tensor name -> GGUF mmproj name (suffix-preserving)."""
    stem, _, sfx = name.rpartition(".")
    if sfx in ("weight", "bias"):
        suffix = "." + sfx
    else:
        stem, suffix = name, ""
    for pat, g in _COMPILED:
        m = pat.match(stem)
        if m:
            out = g.format(bid=m.group(1)) if m.groups() else g
            return out + suffix
    raise ValueError(f"unmapped mmproj tensor {name!r}")


# ---------------------------------------------------------------------------
# shared metadata
# ---------------------------------------------------------------------------


_N_BLOCK_KEYS = ("n_layers", "num_hidden_layers", "n_layer", "num_layers",
                 "depth")


def _find(cfg, keys):
    for k in keys:
        if k in cfg:
            return cfg[k]
    raise KeyError(f"could not find any of {keys}")


def _base_vision_meta(w, vcfg, pre, n_embd_text):
    w.add("clip.has_vision_encoder", True)
    w.add("clip.vision.projection_dim", n_embd_text)
    w.add("clip.vision.image_size", vcfg["image_size"])
    w.add("clip.vision.patch_size", vcfg["patch_size"])
    w.add("clip.vision.embedding_length", vcfg["hidden_size"])
    w.add("clip.vision.feed_forward_length", vcfg["intermediate_size"])
    w.add("clip.vision.block_count", _find(vcfg, _N_BLOCK_KEYS))
    w.add("clip.vision.attention.head_count", vcfg["num_attention_heads"])
    w.add("clip.vision.image_mean", np.asarray(pre["image_mean"], np.float32))
    w.add("clip.vision.image_std", np.asarray(pre["image_std"], np.float32))


def _base_audio_meta(w, acfg, n_embd_text):
    w.add("clip.has_audio_encoder", True)
    w.add("clip.audio.projection_dim", n_embd_text)
    w.add("clip.audio.embedding_length", acfg["hidden_size"])
    w.add("clip.audio.feed_forward_length", acfg["intermediate_size"])
    w.add("clip.audio.block_count", _find(acfg, _N_BLOCK_KEYS))
    w.add("clip.audio.attention.head_count", acfg["num_attention_heads"])


def _n_embd_text(cfg):
    tc = {**cfg, **(cfg.get("text_config") or {})}
    n = tc.get("hidden_size", tc.get("n_embd", 0))
    assert n > 0, "text hidden_size not found"
    return n


def _llama_permute(t, n_head):
    t = np.asarray(t, np.float32)
    return (t.reshape(n_head, 2, t.shape[0] // n_head // 2, *t.shape[1:])
            .swapaxes(1, 2).reshape(t.shape))


# ---------------------------------------------------------------------------
# per-family converters: yield (hf_name, array) after preprocessing;
# meta(w) writes the family keys
# ---------------------------------------------------------------------------


def _family_pixtral(d, cfg, sd, w):
    vcfg = cfg["vision_config"]
    if vcfg.get("model_type") != "pixtral":
        raise ValueError(f"unsupported llava vision model_type "
                         f"{vcfg.get('model_type')!r} (pixtral only, as in "
                         "the reference LlavaVisionModel)")
    eps = vcfg.get("layer_norm_eps", 1e-5)  # hard-coded in modeling_pixtral
    w.add("clip.projector_type", "pixtral")
    w.add("clip.vision.attention.layer_norm_epsilon", eps)
    act = vcfg.get("hidden_act", "silu")
    w.add("clip.use_silu" if act == "silu" else "clip.use_gelu", True)
    if "spatial_merge_size" in cfg:
        w.add("clip.vision.spatial_merge_size", cfg["spatial_merge_size"])

    n_head = vcfg["num_attention_heads"]
    # [IMG_BREAK] token embedding, extracted from the text embeddings
    tok_cfg = json.loads((d / "tokenizer_config.json").read_text())
    img_break = next(
        (int(i) for i, t in tok_cfg.get("added_tokens_decoder", {}).items()
         if t.get("content") == "[IMG_BREAK]"), -1)
    for name in sd.names():
        if name.startswith(("multi_modal_projector.", "vision_tower.")):
            t = sd[name]
            if name.endswith(("q_proj.weight", "q_proj.bias",
                              "k_proj.weight", "k_proj.bias")):
                t = _llama_permute(t, n_head)
            yield name, t
        elif img_break >= 0 and "embed_tokens.weight" in name:
            yield "v.token_embd.img_break", np.asarray(sd[name])[img_break]


def _smolvlm_defaults(vcfg):
    """SmolVLM2 omits these keys; transformers defaults (SmolVLMModel)."""
    if vcfg.get("model_type") == "smolvlm_vision":
        vcfg.setdefault("hidden_size", 1152)
        vcfg.setdefault("num_attention_heads", 16)
        vcfg.setdefault("intermediate_size", 3072)
    return vcfg


def _family_idefics3(d, cfg, sd, w):
    vcfg = _smolvlm_defaults(cfg["vision_config"])
    w.add("clip.projector_type", "idefics3")
    w.add("clip.vision.attention.layer_norm_epsilon",
          vcfg.get("layer_norm_eps", 1e-5))
    w.add("clip.vision.projector.scale_factor", cfg.get("scale_factor", 2))
    w.add("clip.use_gelu", True)
    for name in sd.names():
        if ("vision_tower" in name or "vision_model" in name
                or "model.connector" in name):
            yield name, sd[name]


def _family_llama4(d, cfg, sd, w):
    vcfg = cfg["vision_config"]
    w.add("clip.projector_type", "llama4")
    w.add("clip.vision.attention.layer_norm_epsilon", vcfg["norm_eps"])
    w.add("clip.vision.projector.scale_factor",
          int(1.0 / vcfg["pixel_shuffle_ratio"]))
    assert vcfg.get("hidden_act", "gelu") == "gelu"
    w.add("clip.use_gelu", True)
    for name in sd.names():
        if "multi_modal_projector" in name or "vision_model" in name:
            if "positional_embedding_vlm" in name and \
                    not name.endswith(".weight"):
                name_out = name + ".weight"
            else:
                name_out = name
            if "multi_modal_projector.linear_1" in name:
                # single fully-connected layer despite the numbered name
                yield "mm.model.fc.weight", sd[name]
            else:
                yield name_out, sd[name]


def _qwen2vl_vcfg(cfg):
    vcfg = dict(cfg["vision_config"])
    vcfg.setdefault("image_size", 560)
    vcfg["num_attention_heads"] = vcfg.get("num_heads")
    vcfg["num_hidden_layers"] = vcfg.get("depth")
    if "embed_dim" in vcfg:  # qwen2vl: embed_dim is the encoder width
        vcfg["intermediate_size"] = vcfg.get("hidden_size")
        vcfg["hidden_size"] = vcfg.get("embed_dim")
    return vcfg


def _qwen2vl_meta(cfg, vcfg, w):
    mt = cfg["model_type"]
    if mt == "qwen2_vl":
        w.add("clip.projector_type", "qwen2vl_merger")
    else:
        w.add("clip.projector_type",
              "qwen2.5o" if mt == "qwen2_5_omni" else "qwen2.5vl_merger")
        w.add("clip.use_silu", True)
        fullatt = vcfg["fullatt_block_indexes"]
        n_wa = fullatt[0] + 1
        for i in range(1, len(fullatt)):
            if fullatt[i] - fullatt[i - 1] != n_wa:
                raise ValueError(f"invalid fullatt_block_indexes: {fullatt}")
        w.add("clip.vision.n_wa_pattern", n_wa)
    w.add("clip.vision.attention.layer_norm_epsilon",
          cfg.get("rms_norm_eps", 1e-6))


def _qwen2vl_tensors(sd, prefix="visual."):
    for name in sd.names():
        if not name.startswith(prefix):
            continue
        t = sd[name]
        if ".qkv." in name:
            t = np.asarray(t, np.float32)
            c = t.shape[0] // 3
            yield name.replace("qkv", "q"), t[:c]
            yield name.replace("qkv", "k"), t[c:2 * c]
            yield name.replace("qkv", "v"), t[2 * c:]
        elif "patch_embed.proj.weight" in name:
            # Conv3D split into two Conv2Ds along temporal patches
            t = np.asarray(t, np.float32)
            assert t.shape[2] == 2, "temporal_patch_size must be 2"
            yield "v.patch_embd.weight", t[:, :, 0]
            yield "v.patch_embd.weight.1", t[:, :, 1]
        else:
            yield name, t


def _family_qwen2vl(d, cfg, sd, w):
    vcfg = _qwen2vl_vcfg(cfg)
    _qwen2vl_meta(cfg, vcfg, w)
    yield from _qwen2vl_tensors(sd)


def _family_qwen25omni(d, cfg, sd, w):
    thinker = cfg["thinker_config"]
    acfg = dict(thinker["audio_config"])
    acfg["hidden_size"] = acfg["d_model"]
    acfg["intermediate_size"] = acfg["encoder_ffn_dim"]
    acfg["num_attention_heads"] = acfg["encoder_attention_heads"]
    vcfg = _qwen2vl_vcfg({"vision_config": thinker["vision_config"]})
    _qwen2vl_meta(cfg, vcfg, w)
    w.add("clip.audio.num_mel_bins", acfg["num_mel_bins"])
    w.add("clip.audio.attention.layer_norm_epsilon",
          acfg.get("layer_norm_eps", 1e-5))

    # SinusoidsPositionEmbedding (generate_extra_tensors); computed with
    # torch when available so the floats match the reference bit-for-bit
    channels = acfg["hidden_size"]
    log_inc = float(np.log(10000) / (channels // 2 - 1))
    try:
        import torch

        inv = torch.exp(-log_inc * torch.arange(channels // 2).float())
        scaled = torch.arange(1500)[:, None] * inv[None, :]
        pos = torch.cat([torch.sin(scaled), torch.cos(scaled)],
                        dim=1).float().numpy()
    except ImportError:
        inv = np.exp((-log_inc
                      * np.arange(channels // 2)).astype(np.float32))
        scaled = np.arange(1500, dtype=np.float32)[:, None] * inv[None, :]
        pos = np.concatenate([np.sin(scaled), np.cos(scaled)],
                             axis=1).astype(np.float32)
    yield "audio_tower.embed_positions.weight", pos

    class _View:
        def names(self):
            return [n[len("thinker."):] for n in sd.names()
                    if n.startswith("thinker.visual.")]

        def __getitem__(self, k):
            return sd["thinker." + k]
    yield from _qwen2vl_tensors(_View())
    for name in sd.names():
        short = name[len("thinker."):] if name.startswith("thinker.") \
            else name
        if short.startswith("audio_tower"):
            if "audio_bos_eos_token" in short:
                continue  # unused in transformers
            t = np.asarray(sd[name], np.float32)
            if "conv1.bias" in short or "conv2.bias" in short:
                t = t[:, None]
            yield short, t


def _family_internvl(d, cfg, sd, w):
    vcfg = cfg["vision_config"]
    w.add("clip.projector_type", "internvl")
    w.add("clip.vision.attention.layer_norm_epsilon",
          vcfg["layer_norm_eps"])
    act = vcfg["hidden_act"]
    w.add("clip.use_silu" if act == "silu" else "clip.use_gelu", True)
    downsample = cfg["downsample_ratio"]
    w.add("clip.vision.projector.scale_factor", int(1.0 / downsample))
    for name in sd.names():
        if not (name.startswith("vision_model") or name.startswith("mlp")):
            continue
        t = sd[name]
        if name.startswith("vision_model"):
            name = "vision_tower." + name
        if (".ls" in name or "position_embedding" in name) and \
                not name.endswith(".weight"):
            name += ".weight"
        if ".qkv." in name:
            t = np.asarray(t, np.float32)
            c = t.shape[0] // 3
            yield name.replace("attn.qkv", "self_attn.q_proj"), t[:c]
            yield name.replace("attn.qkv", "self_attn.k_proj"), t[c:2 * c]
            yield name.replace("attn.qkv", "self_attn.v_proj"), t[2 * c:]
        else:
            yield name, t


def _family_gemma3(d, cfg, sd, w):
    vcfg = cfg["vision_config"]
    w.add("clip.projector_type", "gemma3")
    w.add("clip.vision.attention.layer_norm_epsilon",
          vcfg.get("layer_norm_eps", 1e-6))
    w.add("clip.use_gelu", True)
    pre = json.loads((d / "preprocessor_config.json").read_text())
    n_side = int(pre.get("image_seq_length", 256) ** 0.5)
    scale = (vcfg["image_size"] // vcfg["patch_size"]) // n_side
    if scale > 0 and scale != 4:  # only written for non-default (test) sizes
        w.add("clip.vision.projector.scale_factor", scale)
    for name in sd.names():
        if "vision_model.head." in name:
            continue
        if name.startswith(("multi_modal_projector.", "vision_tower.",
                            "multimodal_projector.", "vision_model.")):
            t = np.asarray(sd[name], np.float32)
            out = name.replace("_weight", ".weight")
            if "soft_emb_norm.weight" in out:
                t = t + 1  # Gemma3RMSNorm stores weight-1
            yield out, t


def _family_whisper(d, cfg, sd, w, projector):
    acfg = dict(cfg["audio_config"])
    acfg["hidden_size"] = acfg["d_model"]
    acfg["intermediate_size"] = acfg["encoder_ffn_dim"]
    acfg["num_attention_heads"] = acfg["encoder_attention_heads"]
    # NB: the reference labels BOTH qwen2-audio and ultravox mmprojs
    # "qwen2a" (UltravoxWhisperEncoderModel inherits the projector-type
    # write); our audio loader promotes qwen2a back to the ultravox path
    # when a stack factor / swiglu-mlp projector is present
    w.add("clip.projector_type", "qwen2a")
    w.add("clip.audio.num_mel_bins", acfg["num_mel_bins"])
    w.add("clip.audio.attention.layer_norm_epsilon",
          acfg.get("layer_norm_eps", 1e-5))
    if projector == "ultravox":
        w.add("clip.audio.projector.stack_factor", cfg["stack_factor"])
    for name in sd.names():
        if name.startswith("language_model."):
            continue
        t = np.asarray(sd[name], np.float32)
        out = name
        if out.startswith("multi_modal_projector"):
            out = "audio." + out  # avoid clash with vision projector names
        if "conv1.bias" in out or "conv2.bias" in out:
            t = t[:, None]
        yield out, t


_FAMILIES = {
    "LlavaForConditionalGeneration": ("vision", _family_pixtral),
    "Mistral3ForConditionalGeneration": ("vision", _family_pixtral),
    "Idefics3ForConditionalGeneration": ("vision", _family_idefics3),
    "SmolVLMForConditionalGeneration": ("vision", _family_idefics3),
    "Llama4ForConditionalGeneration": ("vision", _family_llama4),
    "Qwen2VLModel": ("vision", _family_qwen2vl),
    "Qwen2VLForConditionalGeneration": ("vision", _family_qwen2vl),
    "Qwen2_5_VLForConditionalGeneration": ("vision", _family_qwen2vl),
    "Qwen2_5OmniModel": ("vision+audio", _family_qwen25omni),
    "InternVisionModel": ("vision", _family_internvl),
    "Gemma3ForConditionalGeneration": ("vision", _family_gemma3),
    "Qwen2AudioForConditionalGeneration":
        ("audio", lambda d, c, s, w: _family_whisper(d, c, s, w, "qwen2a")),
    "UltravoxModel":
        ("audio", lambda d, c, s, w: _family_whisper(d, c, s, w,
                                                     "ultravox")),
}


# per-family forced storage types (reference tensor_force_quant overrides;
# these apply regardless of the requested outtype, as upstream does)


def _force_patch_pos(name, gname):
    if ".patch_embd." in gname:
        return "f16"
    if ".position_embd." in gname:
        return "f32"
    return None


def _force_conv(name, gname):
    return "f16" if ".conv" in name and ".weight" in name else None


def _force_gemma3(name, gname):
    if "input_projection" in name:
        return "f16"
    if ".embeddings." in name:
        return "f32"
    return None


def _force_embeddings(name, gname):
    return "f32" if ".embeddings." in name else None


_FORCE_QUANT = {
    "Qwen2VLModel": _force_patch_pos,
    "Qwen2VLForConditionalGeneration": _force_patch_pos,
    "Qwen2_5_VLForConditionalGeneration": _force_patch_pos,
    "Qwen2_5OmniModel": _force_conv,
    "InternVisionModel": _force_patch_pos,
    "Gemma3ForConditionalGeneration": _force_gemma3,
    "Idefics3ForConditionalGeneration": _force_embeddings,
    "SmolVLMForConditionalGeneration": _force_embeddings,
    "Qwen2AudioForConditionalGeneration": _force_conv,
    "UltravoxModel": _force_conv,
}


def convert_mmproj(hf_dir: str, out_path: str, outtype: str = "f16",
                   progress=None) -> dict:
    """Convert the vision/audio encoder + projector of a multimodal HF
    checkpoint into an mmproj GGUF (reference --mmproj mode)."""
    from .convert_hf import StateDict, _cast

    d = pathlib.Path(hf_dir)
    cfg = json.loads((d / "config.json").read_text())
    if "llm_config" in cfg:  # InternVL names its text config llm_config
        cfg["text_config"] = cfg["llm_config"]
    arch_name = cfg["architectures"][0]
    if arch_name not in _FAMILIES:
        raise NotImplementedError(
            f"{arch_name} has no mmproj converter "
            f"(have: {sorted(_FAMILIES)})")
    kind, family = _FAMILIES[arch_name]
    sd = StateDict(hf_dir)

    w = GGUFWriter(out_path)
    w.add("general.architecture", "clip")
    w.add("general.type", "mmproj")
    w.add("general.name", cfg.get("_name_or_path", d.name) or d.name)
    n_text = _n_embd_text(cfg if arch_name != "Qwen2_5OmniModel"
                          else {**cfg, **cfg["thinker_config"]})
    pre = {}
    pp = d / "preprocessor_config.json"
    if pp.exists():
        pre = json.loads(pp.read_text())
    if "vision" in kind:
        if arch_name == "Qwen2_5OmniModel":
            vcfg = _qwen2vl_vcfg(
                {"vision_config": cfg["thinker_config"]["vision_config"]})
        elif arch_name in ("Qwen2VLModel", "Qwen2VLForConditionalGeneration",
                           "Qwen2_5_VLForConditionalGeneration"):
            vcfg = _qwen2vl_vcfg(cfg)
        else:
            vcfg = _smolvlm_defaults(dict(cfg["vision_config"]))
        _base_vision_meta(w, vcfg, pre, n_text)
    if "audio" in kind:
        if arch_name == "Qwen2_5OmniModel":
            acfg = dict(cfg["thinker_config"]["audio_config"])
        else:
            acfg = dict(cfg["audio_config"])
        acfg["hidden_size"] = acfg.get("hidden_size", acfg.get("d_model"))
        acfg["intermediate_size"] = acfg.get("intermediate_size",
                                             acfg.get("encoder_ffn_dim"))
        acfg["num_attention_heads"] = acfg.get(
            "num_attention_heads", acfg.get("encoder_attention_heads"))
        _base_audio_meta(w, acfg, n_text)

    count = [0]
    force = _FORCE_QUANT.get(arch_name)
    for name, t in family(d, cfg, sd, w):
        gname = name if name.startswith(("v.", "a.", "mm.")) \
            else _map_name(name)
        ot = (force(name, gname) if force else None) or outtype
        _cast(np.asarray(t, np.float32), ot, gname, w)
        count[0] += 1
        if progress:
            progress(gname)
    w.write()
    return {"arch": "clip", "kind": kind, "tensors": count[0],
            "output": out_path}
