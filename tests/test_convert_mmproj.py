"""mmproj converter oracle: vision/audio encoder + projector GGUFs diffed
against the reference convert_hf_to_gguf.py --mmproj classes
(LlavaVisionModel, SmolVLMModel, Llama4VisionModel, Qwen2VLVisionModel,
Qwen25OmniModel, InternVisionModel, Gemma3VisionModel, WhisperEncoderModel,
UltravoxWhisperEncoderModel), plus the text-side wrapper conversions."""

import json
import pathlib
import sys

import numpy as np
import pytest

pytest.importorskip("torch")
pytest.importorskip("transformers")

if not pathlib.Path("/root/reference/convert_hf_to_gguf.py").exists():
    pytest.skip("reference tree unavailable", allow_module_level=True)

sys.path.insert(0, str(pathlib.Path(__file__).parent))

from ref_converter import compare_with_reference  # noqa: E402

from llamacog_tpu.tools.convert_hf import convert  # noqa: E402
from llamacog_tpu.tools.convert_mmproj import convert_mmproj  # noqa: E402

VE, VF, VH, VL = 32, 64, 4, 4   # vision encoder dims
TE = 48                          # text embedding dim
NV = 64                          # text vocab


def _craft(tmp_path, name, cfg, tensors, preprocessor=None, tok_cfg=None):
    from safetensors.numpy import save_file

    d = tmp_path / name
    d.mkdir()
    (d / "config.json").write_text(json.dumps(cfg))
    rng = np.random.default_rng(0)
    data = {k: rng.standard_normal(v, dtype=np.float32)
            for k, v in tensors.items()}
    save_file(data, str(d / "model.safetensors"))
    (d / "preprocessor_config.json").write_text(json.dumps(
        preprocessor or {"image_mean": [0.5, 0.5, 0.5],
                         "image_std": [0.25, 0.25, 0.25]}))
    (d / "tokenizer.json").write_text(json.dumps({
        "model": {"type": "BPE",
                  "vocab": {f"t{i}": i for i in range(NV)},
                  "merges": []},
        "added_tokens": [],
    }))
    if tok_cfg is not None:
        (d / "tokenizer_config.json").write_text(json.dumps(tok_cfg))
    return str(d)


def _siglip_layers(prefix, n=VL, bias=True):
    t = {}
    for i in range(n):
        p = f"{prefix}.encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            t[f"{p}.self_attn.{proj}.weight"] = (VE, VE)
            if bias:
                t[f"{p}.self_attn.{proj}.bias"] = (VE,)
        for ln in ("layer_norm1", "layer_norm2"):
            t[f"{p}.{ln}.weight"] = (VE,)
            t[f"{p}.{ln}.bias"] = (VE,)
        t[f"{p}.mlp.fc1.weight"] = (VF, VE)
        t[f"{p}.mlp.fc1.bias"] = (VF,)
        t[f"{p}.mlp.fc2.weight"] = (VE, VF)
        t[f"{p}.mlp.fc2.bias"] = (VE,)
    return t


def _whisper_tensors(prefix="audio_tower", n=VL, with_proj=False):
    t = {f"{prefix}.conv1.weight": (VE, 16, 3), f"{prefix}.conv1.bias": (VE,),
         f"{prefix}.conv2.weight": (VE, VE, 3), f"{prefix}.conv2.bias": (VE,),
         f"{prefix}.layer_norm.weight": (VE,),
         f"{prefix}.layer_norm.bias": (VE,)}
    if not with_proj:
        t[f"{prefix}.embed_positions.weight"] = (10, VE)
    for i in range(n):
        p = f"{prefix}.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            t[f"{p}.self_attn.{proj}.weight"] = (VE, VE)
            t[f"{p}.self_attn.{proj}.bias"] = (VE,)
        t[f"{p}.self_attn_layer_norm.weight"] = (VE,)
        t[f"{p}.self_attn_layer_norm.bias"] = (VE,)
        t[f"{p}.final_layer_norm.weight"] = (VE,)
        t[f"{p}.final_layer_norm.bias"] = (VE,)
        t[f"{p}.fc1.weight"] = (VF, VE)
        t[f"{p}.fc1.bias"] = (VF,)
        t[f"{p}.fc2.weight"] = (VE, VF)
        t[f"{p}.fc2.bias"] = (VE,)
    if with_proj:
        t[f"{prefix}.proj.weight"] = (TE, VE)
        t[f"{prefix}.proj.bias"] = (TE,)
    return t


def _llama_text(prefix="language_model.", nl=2):
    t = {f"{prefix}model.embed_tokens.weight": (NV, TE),
         f"{prefix}model.norm.weight": (TE,),
         f"{prefix}lm_head.weight": (NV, TE)}
    for i in range(nl):
        p = f"{prefix}model.layers.{i}"
        t.update({f"{p}.self_attn.q_proj.weight": (TE, TE),
                  f"{p}.self_attn.k_proj.weight": (TE, TE),
                  f"{p}.self_attn.v_proj.weight": (TE, TE),
                  f"{p}.self_attn.o_proj.weight": (TE, TE),
                  f"{p}.input_layernorm.weight": (TE,),
                  f"{p}.post_attention_layernorm.weight": (TE,),
                  f"{p}.mlp.gate_proj.weight": (96, TE),
                  f"{p}.mlp.up_proj.weight": (96, TE),
                  f"{p}.mlp.down_proj.weight": (TE, 96)})
    return t


def _pixtral_dir(tmp_path):
    cfg = dict(
        architectures=["LlavaForConditionalGeneration"], model_type="llava",
        spatial_merge_size=1,
        text_config=dict(architectures=["MistralForCausalLM"],
                         model_type="mistral", vocab_size=NV, hidden_size=TE,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=4,
                         max_position_embeddings=2048, rms_norm_eps=1e-5),
        vision_config=dict(model_type="pixtral", hidden_size=VE,
                           intermediate_size=VF, num_hidden_layers=VL,
                           num_attention_heads=VH, image_size=32,
                           patch_size=8, head_dim=VE // VH,
                           hidden_act="silu"))
    t = {"vision_tower.patch_conv.weight": (VE, 3, 8, 8),
         "vision_tower.ln_pre.weight": (VE,)}
    for i in range(VL):
        p = f"vision_tower.transformer.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            t[f"{p}.attention.{proj}.weight"] = (VE, VE)
        t[f"{p}.attention_norm.weight"] = (VE,)
        t[f"{p}.ffn_norm.weight"] = (VE,)
        t[f"{p}.feed_forward.gate_proj.weight"] = (VF, VE)
        t[f"{p}.feed_forward.up_proj.weight"] = (VF, VE)
        t[f"{p}.feed_forward.down_proj.weight"] = (VE, VF)
    t.update({"multi_modal_projector.norm.weight": (VE,),
              "multi_modal_projector.patch_merger.merging_layer.weight":
                  (VE, VE),
              "multi_modal_projector.linear_1.weight": (TE, VE),
              "multi_modal_projector.linear_2.weight": (TE, TE)})
    t.update(_llama_text())
    return _craft(
        tmp_path, "pixtral", cfg, t,
        tok_cfg={"added_tokens_decoder":
                 {"12": {"content": "[IMG_BREAK]", "special": True}}})


def test_mmproj_pixtral(tmp_path):
    d = _pixtral_dir(tmp_path)
    compare_with_reference(d, tmp_path, convert_mmproj, mmproj=True)


def test_text_pixtral_wrapper(tmp_path):
    d = _pixtral_dir(tmp_path)
    compare_with_reference(d, tmp_path, convert)


def _idefics3_dir(tmp_path):
    cfg = dict(
        architectures=["Idefics3ForConditionalGeneration"],
        model_type="idefics3", scale_factor=2,
        text_config=dict(architectures=["LlamaForCausalLM"],
                         model_type="llama", vocab_size=NV, hidden_size=TE,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=4,
                         max_position_embeddings=2048, rms_norm_eps=1e-5),
        vision_config=dict(model_type="idefics3_vision", hidden_size=VE,
                           intermediate_size=VF, num_hidden_layers=VL,
                           num_attention_heads=VH, image_size=32,
                           patch_size=8, layer_norm_eps=1e-6))
    t = {"model.vision_model.embeddings.patch_embedding.weight":
             (VE, 3, 8, 8),
         "model.vision_model.embeddings.patch_embedding.bias": (VE,),
         "model.vision_model.embeddings.position_embedding.weight": (16, VE),
         "model.vision_model.post_layernorm.weight": (VE,),
         "model.vision_model.post_layernorm.bias": (VE,),
         "model.connector.modality_projection.proj.weight": (TE, VE * 4)}
    t.update(_siglip_layers("model.vision_model"))
    # idefics3 nests the text model as model.text_model.* with a top lm_head
    for k, v in _llama_text(prefix="").items():
        if k == "lm_head.weight":
            t[k] = v
        else:
            t["model.text_model." + k[len("model."):]] = v
    return _craft(tmp_path, "idefics3", cfg, t)


def test_mmproj_idefics3(tmp_path):
    d = _idefics3_dir(tmp_path)
    compare_with_reference(d, tmp_path, convert_mmproj, mmproj=True)


def test_text_idefics3_wrapper(tmp_path):
    d = _idefics3_dir(tmp_path)
    compare_with_reference(d, tmp_path, convert)


def test_mmproj_llama4(tmp_path):
    cfg = dict(
        architectures=["Llama4ForConditionalGeneration"],
        model_type="llama4",
        text_config=dict(hidden_size=TE),
        vision_config=dict(hidden_size=VE, intermediate_size=VF,
                           num_hidden_layers=VL, num_attention_heads=VH,
                           image_size=32, patch_size=8, norm_eps=1e-5,
                           pixel_shuffle_ratio=0.5, hidden_act="gelu"))
    t = {"vision_model.patch_embedding.linear.weight": (VE, 192),
         "vision_model.class_embedding": (VE,),
         "vision_model.positional_embedding_vlm": (17, VE),
         "vision_model.layernorm_pre.weight": (VE,),
         "vision_model.layernorm_pre.bias": (VE,),
         "vision_model.layernorm_post.weight": (VE,),
         "vision_model.layernorm_post.bias": (VE,),
         "vision_model.vision_adapter.mlp.fc1.weight": (VF, VE),
         "vision_model.vision_adapter.mlp.fc2.weight": (VE, VF),
         "multi_modal_projector.linear_1.weight": (TE, VE)}
    for i in range(VL):
        p = f"vision_model.model.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            t[f"{p}.self_attn.{proj}.weight"] = (VE, VE)
            t[f"{p}.self_attn.{proj}.bias"] = (VE,)
        t[f"{p}.input_layernorm.weight"] = (VE,)
        t[f"{p}.input_layernorm.bias"] = (VE,)
        t[f"{p}.post_attention_layernorm.weight"] = (VE,)
        t[f"{p}.post_attention_layernorm.bias"] = (VE,)
        t[f"{p}.mlp.fc1.weight"] = (VF, VE)
        t[f"{p}.mlp.fc1.bias"] = (VF,)
        t[f"{p}.mlp.fc2.weight"] = (VE, VF)
        t[f"{p}.mlp.fc2.bias"] = (VE,)
    d = _craft(tmp_path, "llama4v", cfg, t)
    compare_with_reference(d, tmp_path, convert_mmproj, mmproj=True)


def _qwen2vl_tensors(pref="visual.", gated=False):
    t = {f"{pref}patch_embed.proj.weight": (VE, 3, 2, 8, 8),
         f"{pref}merger.ln_q.weight": (VE,),
         f"{pref}merger.ln_q.bias": (VE,),
         f"{pref}merger.mlp.0.weight": (VE * 4, VE * 4),
         f"{pref}merger.mlp.0.bias": (VE * 4,),
         f"{pref}merger.mlp.2.weight": (TE, VE * 4),
         f"{pref}merger.mlp.2.bias": (TE,)}
    for i in range(VL):
        p = f"{pref}blocks.{i}"
        t.update({f"{p}.attn.qkv.weight": (3 * VE, VE),
                  f"{p}.attn.qkv.bias": (3 * VE,),
                  f"{p}.attn.proj.weight": (VE, VE),
                  f"{p}.attn.proj.bias": (VE,),
                  f"{p}.norm1.weight": (VE,), f"{p}.norm1.bias": (VE,),
                  f"{p}.norm2.weight": (VE,), f"{p}.norm2.bias": (VE,)})
        if gated:
            t.update({f"{p}.mlp.gate_proj.weight": (VF, VE),
                      f"{p}.mlp.gate_proj.bias": (VF,),
                      f"{p}.mlp.up_proj.weight": (VF, VE),
                      f"{p}.mlp.up_proj.bias": (VF,),
                      f"{p}.mlp.down_proj.weight": (VE, VF),
                      f"{p}.mlp.down_proj.bias": (VE,)})
        else:
            t.update({f"{p}.mlp.fc1.weight": (VF, VE),
                      f"{p}.mlp.fc1.bias": (VF,),
                      f"{p}.mlp.fc2.weight": (VE, VF),
                      f"{p}.mlp.fc2.bias": (VE,)})
    return t


def _qwen2vl_dir(tmp_path, v25=False):
    name = "qwen25vlm" if v25 else "qwen2vlm"
    vision = (dict(depth=VL, hidden_size=VE, intermediate_size=VF,
                   num_heads=VH, image_size=32, patch_size=8,
                   temporal_patch_size=2, fullatt_block_indexes=[0, 1])
              if v25 else
              dict(depth=VL, embed_dim=VE, hidden_size=VF, num_heads=VH,
                   image_size=32, patch_size=8, temporal_patch_size=2))
    cfg = dict(
        architectures=["Qwen2_5_VLForConditionalGeneration" if v25
                       else "Qwen2VLForConditionalGeneration"],
        model_type="qwen2_5_vl" if v25 else "qwen2_vl",
        vocab_size=NV, hidden_size=TE, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=2048, rms_norm_eps=1e-6,
        rope_theta=1000000.0,
        rope_scaling={"type": "mrope", "mrope_section": [2, 1, 1]},
        vision_config=vision)
    t = _qwen2vl_tensors(gated=v25)
    t.update({"model.embed_tokens.weight": (NV, TE),
              "model.norm.weight": (TE,), "lm_head.weight": (NV, TE)})
    for i in range(2):
        p = f"model.layers.{i}"
        t.update({f"{p}.self_attn.q_proj.weight": (TE, TE),
                  f"{p}.self_attn.q_proj.bias": (TE,),
                  f"{p}.self_attn.k_proj.weight": (24, TE),
                  f"{p}.self_attn.k_proj.bias": (24,),
                  f"{p}.self_attn.v_proj.weight": (24, TE),
                  f"{p}.self_attn.v_proj.bias": (24,),
                  f"{p}.self_attn.o_proj.weight": (TE, TE),
                  f"{p}.input_layernorm.weight": (TE,),
                  f"{p}.post_attention_layernorm.weight": (TE,),
                  f"{p}.mlp.gate_proj.weight": (96, TE),
                  f"{p}.mlp.up_proj.weight": (96, TE),
                  f"{p}.mlp.down_proj.weight": (TE, 96)})
    return _craft(tmp_path, name, cfg, t)


def test_mmproj_qwen2vl(tmp_path):
    d = _qwen2vl_dir(tmp_path)
    compare_with_reference(d, tmp_path, convert_mmproj, mmproj=True)


def test_mmproj_qwen25vl(tmp_path):
    d = _qwen2vl_dir(tmp_path, v25=True)
    compare_with_reference(d, tmp_path, convert_mmproj, mmproj=True)


def test_text_qwen2vl_wrapper(tmp_path):
    d = _qwen2vl_dir(tmp_path)
    compare_with_reference(d, tmp_path, convert)


def test_mmproj_internvl(tmp_path):
    cfg = dict(
        architectures=["InternVisionModel"], model_type="internvl_chat",
        downsample_ratio=0.5,
        llm_config=dict(hidden_size=TE),
        vision_config=dict(hidden_size=VE, intermediate_size=VF,
                           num_hidden_layers=VL, num_attention_heads=VH,
                           image_size=32, patch_size=8, layer_norm_eps=1e-6,
                           hidden_act="gelu"))
    t = {"vision_model.embeddings.class_embedding": (1, 1, VE),
         "vision_model.embeddings.patch_embedding.weight": (VE, 3, 8, 8),
         "vision_model.embeddings.patch_embedding.bias": (VE,),
         "vision_model.embeddings.position_embedding": (1, 17, VE),
         "mlp1.0.weight": (VE * 4,), "mlp1.0.bias": (VE * 4,),
         "mlp1.1.weight": (TE, VE * 4), "mlp1.1.bias": (TE,),
         "mlp1.3.weight": (TE, TE), "mlp1.3.bias": (TE,)}
    for i in range(VL):
        p = f"vision_model.encoder.layers.{i}"
        t.update({f"{p}.attn.qkv.weight": (3 * VE, VE),
                  f"{p}.attn.qkv.bias": (3 * VE,),
                  f"{p}.attn.proj.weight": (VE, VE),
                  f"{p}.attn.proj.bias": (VE,),
                  f"{p}.norm1.weight": (VE,), f"{p}.norm1.bias": (VE,),
                  f"{p}.norm2.weight": (VE,), f"{p}.norm2.bias": (VE,),
                  f"{p}.mlp.fc1.weight": (VF, VE),
                  f"{p}.mlp.fc1.bias": (VF,),
                  f"{p}.mlp.fc2.weight": (VE, VF),
                  f"{p}.mlp.fc2.bias": (VE,),
                  f"{p}.ls1": (VE,), f"{p}.ls2": (VE,)})
    d = _craft(tmp_path, "internvlv", cfg, t)
    compare_with_reference(d, tmp_path, convert_mmproj, mmproj=True)


def test_mmproj_gemma3(tmp_path):
    cfg = dict(
        architectures=["Gemma3ForConditionalGeneration"],
        model_type="gemma3",
        text_config=dict(hidden_size=TE),
        vision_config=dict(hidden_size=VE, intermediate_size=VF,
                           num_hidden_layers=VL, num_attention_heads=VH,
                           image_size=32, patch_size=8, layer_norm_eps=1e-6))
    t = {"vision_tower.vision_model.embeddings.patch_embedding.weight":
             (VE, 3, 8, 8),
         "vision_tower.vision_model.embeddings.patch_embedding.bias": (VE,),
         "vision_tower.vision_model.embeddings.position_embedding.weight":
             (16, VE),
         "vision_tower.vision_model.post_layernorm.weight": (VE,),
         "vision_tower.vision_model.post_layernorm.bias": (VE,),
         "multi_modal_projector.mm_input_projection_weight": (VE, TE),
         "multi_modal_projector.mm_soft_emb_norm.weight": (VE,)}
    t.update(_siglip_layers("vision_tower.vision_model"))
    d = _craft(tmp_path, "g3v", cfg, t,
               preprocessor={"image_mean": [0.5, 0.5, 0.5],
                             "image_std": [0.25, 0.25, 0.25],
                             "image_seq_length": 4})
    compare_with_reference(d, tmp_path, convert_mmproj, mmproj=True)


def _qwen2audio_dir(tmp_path):
    cfg = dict(
        architectures=["Qwen2AudioForConditionalGeneration"],
        model_type="qwen2_audio",
        text_config=dict(architectures=["Qwen2ForCausalLM"],
                         model_type="qwen2", vocab_size=NV, hidden_size=TE,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=2048, rms_norm_eps=1e-6,
                         rope_theta=10000.0),
        audio_config=dict(d_model=VE, encoder_ffn_dim=VF,
                          encoder_attention_heads=VH, encoder_layers=VL,
                          num_hidden_layers=VL, num_mel_bins=16))
    t = _whisper_tensors()
    t.update({"multi_modal_projector.linear.weight": (TE, VE),
              "multi_modal_projector.linear.bias": (TE,)})
    t.update({k.replace("model.", "language_model.model.", 1)
              if k.startswith("model.") else
              ("language_model." + k if k == "lm_head.weight" else k): v
              for k, v in _llama_text(prefix="").items()})
    # qwen2 text side has qkv biases
    for i in range(2):
        p = f"language_model.model.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj"):
            t[f"{p}.self_attn.{proj}.bias"] = (TE,)
    return _craft(tmp_path, "q2audio", cfg, t)


def test_mmproj_qwen2audio(tmp_path):
    d = _qwen2audio_dir(tmp_path)
    compare_with_reference(d, tmp_path, convert_mmproj, mmproj=True)


def test_text_qwen2audio_wrapper(tmp_path):
    d = _qwen2audio_dir(tmp_path)
    compare_with_reference(d, tmp_path, convert)


def test_mmproj_ultravox(tmp_path):
    cfg = dict(
        architectures=["UltravoxModel"], model_type="ultravox",
        stack_factor=8,
        text_config=dict(hidden_size=TE),
        audio_config=dict(d_model=VE, encoder_ffn_dim=VF,
                          encoder_attention_heads=VH, num_hidden_layers=VL,
                          num_mel_bins=16))
    t = _whisper_tensors()
    t.update({"multi_modal_projector.linear_1.weight": (TE, VE * 8),
              "multi_modal_projector.linear_2.weight": (TE, TE),
              "multi_modal_projector.ln_pre.weight": (VE * 8,),
              "multi_modal_projector.ln_mid.weight": (TE,)})
    d = _craft(tmp_path, "ultrav", cfg, t)
    compare_with_reference(d, tmp_path, convert_mmproj, mmproj=True)


def test_mmproj_qwen25omni(tmp_path):
    cfg = dict(
        architectures=["Qwen2_5OmniModel"], model_type="qwen2_5_omni",
        thinker_config=dict(
            text_config=dict(hidden_size=TE),
            audio_config=dict(d_model=VE, encoder_ffn_dim=VF,
                              encoder_attention_heads=VH, encoder_layers=VL,
                              num_hidden_layers=VL, num_mel_bins=16),
            vision_config=dict(depth=VL, hidden_size=VE,
                               intermediate_size=VF, num_heads=VH,
                               image_size=32, patch_size=8,
                               temporal_patch_size=2,
                               fullatt_block_indexes=[0, 1])))
    t = {f"thinker.{k}": v
         for k, v in _qwen2vl_tensors(gated=True).items()}
    t.update({f"thinker.{k}": v
              for k, v in _whisper_tensors(with_proj=True).items()})
    t["thinker.audio_tower.ln_post.weight"] = (VE,)
    t["thinker.audio_tower.ln_post.bias"] = (VE,)
    del t["thinker.audio_tower.layer_norm.weight"]
    del t["thinker.audio_tower.layer_norm.bias"]
    d = _craft(tmp_path, "q25omni", cfg, t)
    compare_with_reference(d, tmp_path, convert_mmproj, mmproj=True)

def test_mmproj_roundtrip_loaders(tmp_path):
    """Converted mmproj GGUFs load and encode through our mtmd stack."""
    from llamacog_tpu.mtmd.audio import load_audio_mmproj
    from llamacog_tpu.mtmd.clip import load_mmproj

    d = _pixtral_dir(tmp_path)
    out = str(tmp_path / "pixtral.mmproj.gguf")
    convert_mmproj(d, out, outtype="f32")
    clip = load_mmproj(out)
    assert clip.config.projector_type == "pixtral"
    emb = clip.encode(np.zeros((3, 32, 32), np.float32))
    assert emb.shape[-1] == TE and np.isfinite(emb).all()

    # ultravox audio (labeled qwen2a by the converter, promoted on load)
    cfg = dict(architectures=["UltravoxModel"], model_type="ultravox",
               stack_factor=8,
               text_config=dict(hidden_size=TE),
               audio_config=dict(d_model=VE, encoder_ffn_dim=VF,
                                 encoder_attention_heads=VH,
                                 num_hidden_layers=VL, num_mel_bins=16))
    t = _whisper_tensors()
    t.update({"multi_modal_projector.linear_1.weight": (2 * TE, VE * 8),
              "multi_modal_projector.linear_2.weight": (TE, TE),
              "multi_modal_projector.ln_pre.weight": (VE * 8,),
              "multi_modal_projector.ln_mid.weight": (TE,)})
    da = _craft(tmp_path, "ultrav_rt", cfg, t)
    outa = str(tmp_path / "ultrav.mmproj.gguf")
    convert_mmproj(da, outa, outtype="f32")
    audio = load_audio_mmproj(outa)
    assert audio.config.projector_type == "ultravox"
    emb = audio.encode(np.zeros((16, 20), np.float32))
    assert emb.shape[-1] == TE and np.isfinite(np.asarray(emb)).all()


def test_wavtokenizer_convert_roundtrip(tmp_path):
    """Converted WavTokenizerDec GGUF loads and decodes through our vocoder
    (the conversion path the reference TTS workflow uses)."""
    import sys as _sys

    _sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_convert_oracle_rc import _craft as _craft_rc

    from llamacog_tpu.models.wavtokenizer import load_wavtokenizer
    from llamacog_tpu.tools.convert_hf import convert

    cfg = dict(architectures=["WavTokenizerDec"], vocab_size=64,
               n_embd=32, n_ff=48, n_embd_features=16,
               group_norm_epsilon=1e-6, group_norm_groups=4, n_layer=2,
               posnet={"n_embd": 32, "n_layer": 2},
               convnext={"n_embd": 32, "n_layer": 2})
    t = {"token_embd.weight": (64, 16),
         "backbone.embed.weight": (32, 16, 7), "backbone.embed.bias": (32,),
         "backbone.norm.weight": (32,), "backbone.norm.bias": (32,),
         "backbone.final_layer_norm.weight": (32,),
         "backbone.final_layer_norm.bias": (32,),
         "head.out.weight": (18, 32), "head.out.bias": (18,)}
    t.update({"backbone.posnet.0.conv1.weight": (32, 32, 3),
              "backbone.posnet.0.conv1.bias": (32,),
              "backbone.posnet.0.conv2.weight": (32, 32, 3),
              "backbone.posnet.0.conv2.bias": (32,),
              "backbone.posnet.0.norm1.weight": (32,),
              "backbone.posnet.0.norm1.bias": (32,),
              "backbone.posnet.0.norm2.weight": (32,),
              "backbone.posnet.0.norm2.bias": (32,),
              "backbone.posnet.1.norm.weight": (32,),
              "backbone.posnet.1.norm.bias": (32,),
              "backbone.posnet.1.q.weight": (32, 32, 1),
              "backbone.posnet.1.q.bias": (32,),
              "backbone.posnet.1.k.weight": (32, 32, 1),
              "backbone.posnet.1.k.bias": (32,),
              "backbone.posnet.1.v.weight": (32, 32, 1),
              "backbone.posnet.1.v.bias": (32,),
              "backbone.posnet.1.proj_out.weight": (32, 32, 1),
              "backbone.posnet.1.proj_out.bias": (32,)})
    for i in range(2):
        t.update({f"backbone.convnext.{i}.dwconv.weight": (32, 1, 7),
                  f"backbone.convnext.{i}.dwconv.bias": (32,),
                  f"backbone.convnext.{i}.norm.weight": (32,),
                  f"backbone.convnext.{i}.norm.bias": (32,),
                  f"backbone.convnext.{i}.pwconv1.weight": (48, 32),
                  f"backbone.convnext.{i}.pwconv1.bias": (48,),
                  f"backbone.convnext.{i}.pwconv2.weight": (32, 48),
                  f"backbone.convnext.{i}.pwconv2.bias": (32,),
                  f"backbone.convnext.{i}.gamma": (32,)})
    d = _craft_rc(tmp_path, "wt_rt", cfg, t)
    out = str(tmp_path / "wt.gguf")
    convert(d, out, outtype="f32")
    wt = load_wavtokenizer(out)
    audio = wt.decode_audio(np.array([3, 7, 11, 13]))
    assert np.isfinite(np.asarray(audio)).all() and audio.size > 0
