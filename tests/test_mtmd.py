"""Multimodal tests: CLIP vision encoder HF parity + mtmd chunk flow
(role of the reference's mtmd/clip test coverage)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llamacog_tpu.gguf import GGUFWriter
from llamacog_tpu.mtmd import ClipVisionModel, MtmdContext, load_mmproj
from llamacog_tpu.mtmd.clip import ClipVisionConfig


def _tiny_hf_clip():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    cfg = CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        layer_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    return CLIPVisionModel(cfg).eval()


def _write_mmproj(model, path, n_embd_text=48):
    """Convert an HF CLIPVisionModel to the mmproj GGUF layout
    (clip-impl.h names; conversion mirror of convert_hf_to_gguf MmprojModel)."""
    sd = model.state_dict()
    cfg = model.config
    w = GGUFWriter(path)
    w.add("general.architecture", "clip")
    w.add("clip.has_vision_encoder", True)
    w.add("clip.projector_type", "mlp")
    w.add("clip.vision.image_size", cfg.image_size)
    w.add("clip.vision.patch_size", cfg.patch_size)
    w.add("clip.vision.embedding_length", cfg.hidden_size)
    w.add("clip.vision.feed_forward_length", cfg.intermediate_size)
    w.add("clip.vision.block_count", cfg.num_hidden_layers)
    w.add("clip.vision.attention.head_count", cfg.num_attention_heads)
    w.add("clip.vision.attention.layer_norm_epsilon", cfg.layer_norm_eps)
    w.add("clip.vision.projection_dim", n_embd_text)
    w.add("clip.use_gelu", False)  # CLIP uses quick-gelu

    pre = "vision_model."
    w.add_tensor("v.patch_embd.weight",
                 sd[pre + "embeddings.patch_embedding.weight"].float().numpy())
    w.add_tensor("v.class_embd", sd[pre + "embeddings.class_embedding"].float().numpy())
    w.add_tensor("v.position_embd.weight",
                 sd[pre + "embeddings.position_embedding.weight"].float().numpy())
    w.add_tensor("v.pre_ln.weight", sd[pre + "pre_layrnorm.weight"].float().numpy())
    w.add_tensor("v.pre_ln.bias", sd[pre + "pre_layrnorm.bias"].float().numpy())
    # post_ln intentionally omitted: LLaVA mmproj files export the -2 feature
    # layer, i.e. encoder output before post_layernorm (HF applies
    # post_layernorm only to the pooled CLS path)
    name_map = {
        "self_attn.q_proj": "attn_q", "self_attn.k_proj": "attn_k",
        "self_attn.v_proj": "attn_v", "self_attn.out_proj": "attn_out",
        "layer_norm1": "ln1", "layer_norm2": "ln2",
        "mlp.fc1": "ffn_up", "mlp.fc2": "ffn_down",
    }
    for il in range(cfg.num_hidden_layers):
        for hf, gg in name_map.items():
            for suffix in ("weight", "bias"):
                key = f"{pre}encoder.layers.{il}.{hf}.{suffix}"
                if key in sd:
                    w.add_tensor(f"v.blk.{il}.{gg}.{suffix}", sd[key].float().numpy())
    # llava-style MLP projector with random weights
    rng = np.random.default_rng(1)
    w.add_tensor("mm.0.weight", (rng.standard_normal((n_embd_text, cfg.hidden_size)) * 0.05).astype(np.float32))
    w.add_tensor("mm.0.bias", np.zeros(n_embd_text, np.float32))
    w.add_tensor("mm.2.weight", (rng.standard_normal((n_embd_text, n_embd_text)) * 0.05).astype(np.float32))
    w.add_tensor("mm.2.bias", np.zeros(n_embd_text, np.float32))
    w.write()
    return path


def test_clip_encoder_hf_parity(tmp_path):
    model = _tiny_hf_clip()
    path = _write_mmproj(model, str(tmp_path / "mmproj.gguf"))
    vision = load_mmproj(path)
    assert vision.config.n_layer == 2 and vision.config.patch_size == 14

    rng = np.random.default_rng(2)
    pixels = rng.standard_normal((3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        # llava takes the -2 feature layer: n_layer-1 blocks, no post_ln
        # (clip.cpp build_llava max_feature_layer, :1066-1084)
        hf = model(torch.tensor(pixels)[None],
                   output_hidden_states=True).hidden_states[-2][0].numpy()
    # compare pre-projector hidden states via a model without the projector
    v2 = ClipVisionModel(vision.config, {k: v for k, v in vision.params.items()
                                         if not k.startswith("mm_")})
    ours = v2.encode(pixels)
    # ours drops the CLS token; HF keeps it at index 0
    np.testing.assert_allclose(ours, hf[1:], atol=2e-3, rtol=1e-3)


def test_clip_preprocess_and_project(tmp_path):
    model = _tiny_hf_clip()
    path = _write_mmproj(model, str(tmp_path / "mmproj2.gguf"))
    vision = load_mmproj(path)
    img = (np.random.default_rng(3).random((56, 42, 3)) * 255).astype(np.uint8)
    pixels = vision.preprocess(img)
    assert pixels.shape == (3, 28, 28)
    embd = vision.encode(pixels)
    assert embd.shape == (4, 48)  # 2x2 patches -> 4 tokens, projected to 48
    assert np.isfinite(embd).all()


def test_mtmd_chunks_and_engine(tmp_path):
    from llamacog_tpu.models.loader import load_model
    from llamacog_tpu.runtime.engine import Engine
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    model = _tiny_hf_clip()
    mmproj = _write_mmproj(model, str(tmp_path / "mmproj3.gguf"), n_embd_text=64)
    vision = load_mmproj(mmproj)
    lm_path = make_tiny_llama_gguf(str(tmp_path / "lm.gguf"), n_embd=64)
    lm = load_model(lm_path)
    ctx = MtmdContext(vision, lm.tokenizer)
    img = (np.random.default_rng(4).random((28, 28, 3)) * 255).astype(np.uint8)
    chunks = ctx.tokenize("ab<__media__>cd", [img])
    kinds = [c.kind for c in chunks]
    assert kinds == ["text", "image", "text"]
    assert chunks[1].embd.shape == (4, 64)
    eng = Engine(lm.params, lm.config, batch_size=1, max_seq=64, dtype=jnp.float32)
    logits = ctx.eval_chunks(eng, chunks)
    assert logits.shape == (lm.config.n_vocab,)
    assert np.isfinite(logits).all()
    # image changed the context: different image -> different logits
    img2 = (np.random.default_rng(5).random((28, 28, 3)) * 255).astype(np.uint8)
    eng2 = Engine(lm.params, lm.config, batch_size=1, max_seq=64, dtype=jnp.float32)
    logits2 = ctx.eval_chunks(eng2, ctx.tokenize("ab<__media__>cd", [img2]))
    assert np.abs(logits - logits2).max() > 1e-4


# ---------------------------------------------------------------------------
# audio (whisper-style encoder + ultravox projector)
# ---------------------------------------------------------------------------


def test_log_mel_matches_whisper_feature_extractor():
    from transformers import WhisperFeatureExtractor

    from llamacog_tpu.mtmd.audio import log_mel_spectrogram

    fe = WhisperFeatureExtractor(feature_size=80)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)  # 1s
    ref = fe(audio, sampling_rate=16000, return_tensors="np",
             padding="max_length").input_features[0]
    ours = log_mel_spectrogram(audio, n_mels=80, pad_to_frames=3000)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def _tiny_whisper():
    from transformers import WhisperConfig, WhisperModel

    cfg = WhisperConfig(
        num_mel_bins=80, d_model=64, encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=1, decoder_attention_heads=4, encoder_ffn_dim=128,
        max_source_positions=1500,
    )
    torch.manual_seed(11)
    return WhisperModel(cfg).eval()


def _write_audio_mmproj(model, path, n_embd_text=48, stack=2):
    from llamacog_tpu.gguf import GGUFWriter

    sd = model.state_dict()
    cfg = model.config
    w = GGUFWriter(path)
    w.add("general.architecture", "clip")
    w.add("clip.has_audio_encoder", True)
    w.add("clip.projector_type", "ultravox")
    w.add("clip.audio.num_mel_bins", cfg.num_mel_bins)
    w.add("clip.audio.embedding_length", cfg.d_model)
    w.add("clip.audio.feed_forward_length", cfg.encoder_ffn_dim)
    w.add("clip.audio.block_count", cfg.encoder_layers)
    w.add("clip.audio.attention.head_count", cfg.encoder_attention_heads)
    w.add("clip.audio.projector.stack_factor", stack)
    pre = "encoder."
    w.add_tensor("a.conv1d.1.weight", sd[pre + "conv1.weight"].float().numpy())
    w.add_tensor("a.conv1d.1.bias", sd[pre + "conv1.bias"].float().numpy())
    w.add_tensor("a.conv1d.2.weight", sd[pre + "conv2.weight"].float().numpy())
    w.add_tensor("a.conv1d.2.bias", sd[pre + "conv2.bias"].float().numpy())
    w.add_tensor("a.position_embd.weight", sd[pre + "embed_positions.weight"].float().numpy())
    w.add_tensor("a.post_ln.weight", sd[pre + "layer_norm.weight"].float().numpy())
    w.add_tensor("a.post_ln.bias", sd[pre + "layer_norm.bias"].float().numpy())
    nm = {
        "self_attn.q_proj": "attn_q", "self_attn.k_proj": "attn_k",
        "self_attn.v_proj": "attn_v", "self_attn.out_proj": "attn_out",
        "self_attn_layer_norm": "ln1", "final_layer_norm": "ln2",
        "fc1": "ffn_up", "fc2": "ffn_down",
    }
    for il in range(cfg.encoder_layers):
        for hf, gg in nm.items():
            for sfx in ("weight", "bias"):
                key = f"{pre}layers.{il}.{hf}.{sfx}"
                if key in sd:
                    w.add_tensor(f"a.blk.{il}.{gg}.{sfx}", sd[key].float().numpy())
    rng = np.random.default_rng(5)
    d = cfg.d_model * stack
    w.add_tensor("mm.a.norm_pre.weight", np.ones(d, np.float32))
    w.add_tensor("mm.a.mlp.1.weight", (rng.standard_normal((2 * n_embd_text, d)) * 0.05).astype(np.float32))
    w.add_tensor("mm.a.norm_mid.weight", np.ones(n_embd_text, np.float32))
    w.add_tensor("mm.a.mlp.2.weight", (rng.standard_normal((n_embd_text, n_embd_text)) * 0.05).astype(np.float32))
    w.write()
    return path


def test_whisper_encoder_hf_parity(tmp_path):
    from llamacog_tpu.mtmd.audio import load_audio_mmproj, log_mel_spectrogram

    model = _tiny_whisper()
    path = _write_audio_mmproj(model, str(tmp_path / "audio.gguf"))
    enc = load_audio_mmproj(path)
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    mel = log_mel_spectrogram(audio, n_mels=80, pad_to_frames=3000)
    with torch.no_grad():
        ref = model.encoder(torch.tensor(mel)[None]).last_hidden_state[0].numpy()
    # compare the transformer output (pre-projector): build a qwen2a-style
    # identity check by stripping projector params
    p = {k: v for k, v in enc.params.items() if not k.startswith("mm_")}
    import dataclasses

    from llamacog_tpu.mtmd.audio import AudioEncoderModel

    cfg2 = dataclasses.replace(enc.config, projector_type="qwen2a")
    import jax.numpy as jnp2

    p["mm_fc_w"] = jnp2.eye(enc.config.n_embd, dtype=jnp2.float32)
    p["mm_fc_b"] = jnp2.zeros(enc.config.n_embd, jnp2.float32)
    ours = AudioEncoderModel(cfg2, p).encode(mel)
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=1e-3)


def test_ultravox_projector_shapes(tmp_path):
    from llamacog_tpu.mtmd.audio import load_audio_mmproj, log_mel_spectrogram

    model = _tiny_whisper()
    path = _write_audio_mmproj(model, str(tmp_path / "audio2.gguf"), n_embd_text=48,
                               stack=2)
    enc = load_audio_mmproj(path)
    audio = np.zeros(8000, np.float32)
    mel = log_mel_spectrogram(audio, n_mels=80, pad_to_frames=100)
    out = enc.encode(mel)
    # conv stride 2 halves frames; stacking by 2 halves again
    assert out.shape == (25, 48)
    assert np.isfinite(out).all()


def test_server_multimodal_chat(tmp_path):
    """OpenAI-style multimodal chat request end-to-end (data: URI image)."""
    import base64
    import io
    import json
    import threading
    import urllib.request

    from PIL import Image

    from llamacog_tpu.models.loader import load_model
    from llamacog_tpu.server.server import serve
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    model_v = _tiny_hf_clip()
    mmproj = _write_mmproj(model_v, str(tmp_path / "mm.gguf"), n_embd_text=64)
    from llamacog_tpu.mtmd import load_mmproj

    vision = load_mmproj(mmproj)
    lm_path = make_tiny_llama_gguf(str(tmp_path / "lm.gguf"), n_embd=64)
    lm = load_model(lm_path, dtype=jnp.float32)
    ctx, httpd = serve(lm, port=0, n_slots=1, ctx_size=128, dtype=jnp.float32,
                       vision=vision)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        buf = io.BytesIO()
        Image.fromarray(
            (np.random.default_rng(0).random((28, 28, 3)) * 255).astype(np.uint8)
        ).save(buf, format="PNG")
        uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
        body = {
            "messages": [{
                "role": "user",
                "content": [
                    {"type": "text", "text": "what is this?"},
                    {"type": "image_url", "image_url": {"url": uri}},
                ],
            }],
            "max_tokens": 4,
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{httpd.server_address[1]}/v1/chat/completions",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        assert out["choices"][0]["message"]["content"] is not None
    finally:
        ctx.stop()
        httpd.shutdown()


# ---------------------------------------------------------------------------
# Qwen2-VL vision tower + M-RoPE
# ---------------------------------------------------------------------------


def test_qwen2vl_vision_hf_parity(tmp_path):
    from transformers.models.qwen2_vl.configuration_qwen2_vl import Qwen2VLVisionConfig
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        Qwen2VisionTransformerPretrainedModel,
    )

    from llamacog_tpu.gguf import GGUFWriter
    from llamacog_tpu.mtmd.qwen2vl import load_qwen2vl_mmproj

    cfg = Qwen2VLVisionConfig(
        depth=2, embed_dim=64, hidden_size=48, num_heads=4, in_channels=3,
        patch_size=14, spatial_merge_size=2, temporal_patch_size=2, mlp_ratio=2,
    )
    torch.manual_seed(20)
    model = Qwen2VisionTransformerPretrainedModel(cfg).eval()
    sd = model.state_dict()
    path = str(tmp_path / "q2vl.gguf")
    w = GGUFWriter(path)
    w.add("general.architecture", "clip")
    w.add("clip.projector_type", "qwen2vl_merger")
    w.add("clip.vision.patch_size", 14)
    w.add("clip.vision.embedding_length", 64)
    w.add("clip.vision.block_count", 2)
    w.add("clip.vision.attention.head_count", 4)
    w.add("clip.vision.projection_dim", 48)
    w.add("clip.vision.attention.layer_norm_epsilon", 1e-6)
    # conv3d weight [E, 3, 2, 14, 14] -> two temporal planes
    conv = sd["patch_embed.proj.weight"].float().numpy()
    w.add_tensor("v.patch_embd.weight", np.ascontiguousarray(conv[:, :, 0]))
    w.add_tensor("v.patch_embd.weight.1", np.ascontiguousarray(conv[:, :, 1]))
    w.add_tensor("v.post_ln.weight", sd["merger.ln_q.weight"].float().numpy())
    w.add_tensor("v.post_ln.bias", sd["merger.ln_q.bias"].float().numpy())
    w.add_tensor("mm.0.weight", sd["merger.mlp.0.weight"].float().numpy())
    w.add_tensor("mm.0.bias", sd["merger.mlp.0.bias"].float().numpy())
    w.add_tensor("mm.2.weight", sd["merger.mlp.2.weight"].float().numpy())
    w.add_tensor("mm.2.bias", sd["merger.mlp.2.bias"].float().numpy())
    for il in range(2):
        pre = f"blocks.{il}."
        bl = f"v.blk.{il}."
        for hf, gg in (("norm1", "ln1"), ("norm2", "ln2"),
                       ("attn.qkv", "attn_qkv"), ("attn.proj", "attn_out"),
                       ("mlp.fc1", "ffn_up"), ("mlp.fc2", "ffn_down")):
            for sfx in ("weight", "bias"):
                key = pre + hf + "." + sfx
                if key in sd:
                    w.add_tensor(bl + gg + "." + sfx, sd[key].float().numpy())
    w.write()
    vision = load_qwen2vl_mmproj(path)
    rng = np.random.default_rng(3)
    img = rng.standard_normal((56, 56, 3)).astype(np.float32)  # 4x4 patch grid
    ours = vision.encode(img)
    patches, (gh, gw) = vision.patchify(img)
    with torch.no_grad():
        ref = model(
            torch.tensor(patches), grid_thw=torch.tensor([[1, gh, gw]])
        ).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=1e-3)


def test_mrope_tables_match_standard_for_text():
    """With all position components equal, M-RoPE must reduce to plain rope."""
    from llamacog_tpu.mtmd.qwen2vl import mrope_tables
    from llamacog_tpu.models.config import RopeConfig
    from llamacog_tpu.ops.rope import rope_tables

    T, D = 6, 128
    pos = np.arange(T)
    multi = jnp.asarray(np.stack([pos, pos, pos]), jnp.int32)
    cos_m, sin_m = mrope_tables(multi, (16, 24, 24), D)
    cos_r, sin_r = rope_tables(jnp.asarray(pos), RopeConfig(dim=D), D)
    np.testing.assert_allclose(np.asarray(cos_m), np.asarray(cos_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sin_m), np.asarray(sin_r), atol=1e-5)


def test_mrope_tables_match_hf():
    """M-RoPE with distinct components vs HF's multimodal rotary embedding."""
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        Qwen2VLRotaryEmbedding, apply_multimodal_rotary_pos_emb,
    )
    from transformers import Qwen2VLConfig

    from llamacog_tpu.mtmd.qwen2vl import mrope_tables

    D, T = 128, 5
    sections = (16, 24, 24)
    cfg = Qwen2VLConfig(hidden_size=D * 4, num_attention_heads=4,
                        rope_theta=10000.0)
    rot = Qwen2VLRotaryEmbedding(config=cfg)
    rng = np.random.default_rng(4)
    pos3 = torch.tensor(rng.integers(0, 50, (3, 1, T)))
    x = torch.tensor(rng.standard_normal((1, 4, T, D)), dtype=torch.float32)
    cos, sin = rot(x, pos3)
    q_hf, _ = apply_multimodal_rotary_pos_emb(x, x, cos, sin, list(sections))
    cos_m, sin_m = mrope_tables(jnp.asarray(pos3[:, 0].numpy()), sections, D)
    # apply to our layout [T, H, D]
    from llamacog_tpu.ops.rope import apply_rope_tables

    ours = apply_rope_tables(
        jnp.asarray(x[0].numpy().transpose(1, 0, 2)), (cos_m, sin_m), D
    )
    np.testing.assert_allclose(
        np.asarray(ours), q_hf[0].numpy().transpose(1, 0, 2), atol=2e-5
    )


# ---------------------------------------------------------------------------
# projector batch 2 (VERDICT #10): minicpmv resampler, internvl, pixtral
# ---------------------------------------------------------------------------


def _base_clip_md(w, *, image_size=28, patch=14, E=32, ff=64, L=1, H=2,
                  proj="mlp", proj_dim=48):
    w.add("general.architecture", "clip")
    w.add("clip.has_vision_encoder", True)
    w.add("clip.projector_type", proj)
    w.add("clip.vision.image_size", image_size)
    w.add("clip.vision.patch_size", patch)
    w.add("clip.vision.embedding_length", E)
    w.add("clip.vision.feed_forward_length", ff)
    w.add("clip.vision.block_count", L)
    w.add("clip.vision.attention.head_count", H)
    w.add("clip.vision.attention.layer_norm_epsilon", 1e-5)
    w.add("clip.vision.projection_dim", proj_dim)
    w.add("clip.use_gelu", True)


def _rand_vit_tensors(w, rng, *, E=32, ff=64, L=1, patch=14, n_pos=4,
                      with_cls=False, with_pos=True, norm_bias=True):
    r = lambda *s: (rng.standard_normal(s) * 0.05).astype(np.float32)
    w.add_tensor("v.patch_embd.weight", r(E, 3, patch, patch))
    if with_cls:
        w.add_tensor("v.class_embd", r(E))
    if with_pos:
        w.add_tensor("v.position_embd.weight", r(n_pos + (1 if with_cls else 0), E))
    for il in range(L):
        bl = f"v.blk.{il}."
        for nm in ("attn_q", "attn_k", "attn_v", "attn_out"):
            w.add_tensor(bl + nm + ".weight", r(E, E))
        w.add_tensor(bl + "ln1.weight", np.ones(E, np.float32))
        w.add_tensor(bl + "ln2.weight", np.ones(E, np.float32))
        if norm_bias:
            w.add_tensor(bl + "ln1.bias", np.zeros(E, np.float32))
            w.add_tensor(bl + "ln2.bias", np.zeros(E, np.float32))
        w.add_tensor(bl + "ffn_up.weight", r(ff, E))
        w.add_tensor(bl + "ffn_down.weight", r(E, ff))


def test_minicpmv_resampler(tmp_path):
    from llamacog_tpu.mtmd.clip import _sincos_2d_pos, load_mmproj

    rng = np.random.default_rng(31)
    E, Dm, nq, out_d = 32, 64, 16, 64
    path = str(tmp_path / "resampler.gguf")
    w = GGUFWriter(path)
    _base_clip_md(w, E=E, proj="resampler", proj_dim=Dm)
    w.add("clip.minicpmv_version", 3)
    _rand_vit_tensors(w, rng, E=E)
    r = lambda *s: (rng.standard_normal(s) * 0.05).astype(np.float32)
    w.add_tensor("resampler.query", r(nq, Dm))
    w.add_tensor("resampler.kv.weight", r(Dm, E))
    w.add_tensor("resampler.proj.weight", r(Dm, out_d))
    for nm in ("q", "k", "v", "out"):
        w.add_tensor(f"resampler.attn.{nm}.weight", r(Dm, Dm))
        w.add_tensor(f"resampler.attn.{nm}.bias", np.zeros(Dm, np.float32))
    for nm in ("q", "kv", "post"):
        w.add_tensor(f"resampler.ln_{nm}.weight", np.ones(Dm, np.float32))
        w.add_tensor(f"resampler.ln_{nm}.bias", np.zeros(Dm, np.float32))
    w.write()
    enc = load_mmproj(path)
    assert enc.config.projector_type == "resampler"
    img = (np.arange(28 * 28 * 3).reshape(28, 28, 3) % 255).astype(np.uint8)
    out = enc.encode(enc.preprocess(img))
    assert out.shape == (nq, out_d)
    assert np.isfinite(out).all()
    # K-position embedding is the 2D sincos grid
    pk = np.asarray(enc.params["rs_pos_k"])
    np.testing.assert_allclose(pk, _sincos_2d_pos(Dm, 2, 2), rtol=1e-6)


def test_internvl_pixel_shuffle(tmp_path):
    import jax.numpy as jnp

    from llamacog_tpu.mtmd.clip import _pixel_shuffle, load_mmproj

    # pixel shuffle against a direct numpy re-derivation
    B, hgt, wid, E, sf = 1, 4, 4, 6, 2
    x = np.arange(B * hgt * wid * E, dtype=np.float32).reshape(B, hgt * wid, E)
    got = np.asarray(_pixel_shuffle(jnp.asarray(x), hgt, wid, sf))
    assert got.shape == (B, (hgt // sf) * (wid // sf), sf * sf * E)
    assert set(got.reshape(-1)) == set(x.reshape(-1))  # pure relayout

    rng = np.random.default_rng(32)
    E2, out_d = 32, 40
    path = str(tmp_path / "internvl.gguf")
    w = GGUFWriter(path)
    _base_clip_md(w, E=E2, proj="internvl", proj_dim=out_d)
    w.add("clip.vision.projector.scale_factor", 2)
    _rand_vit_tensors(w, rng, E=E2, with_cls=True)
    r = lambda *s: (rng.standard_normal(s) * 0.05).astype(np.float32)
    # real internvl mmproj files use mm.model.mlp.N (TN_MVLM_PROJ_MLP)
    w.add_tensor("mm.model.mlp.0.weight", np.ones(4 * E2, np.float32))
    w.add_tensor("mm.model.mlp.0.bias", np.zeros(4 * E2, np.float32))
    w.add_tensor("mm.model.mlp.1.weight", r(out_d, 4 * E2))
    w.add_tensor("mm.model.mlp.1.bias", np.zeros(out_d, np.float32))
    w.add_tensor("mm.model.mlp.3.weight", r(out_d, out_d))
    w.add_tensor("mm.model.mlp.3.bias", np.zeros(out_d, np.float32))
    w.write()
    enc = load_mmproj(path)
    img = (np.arange(28 * 28 * 3).reshape(28, 28, 3) % 251).astype(np.uint8)
    out = enc.encode(enc.preprocess(img))
    assert out.shape == (1, out_d)  # 2x2 patches shuffled 2x -> 1 token
    assert np.isfinite(out).all()


def test_pixtral_vision_hf_parity(tmp_path):
    """Our RMS-norm ViT with 2D interleaved rope must match transformers'
    PixtralVisionModel hidden states (clip.cpp build_pixtral semantics)."""
    transformers = pytest.importorskip("transformers")
    if not hasattr(transformers, "PixtralVisionModel"):
        pytest.skip("PixtralVisionModel unavailable")
    import dataclasses

    import torch

    from llamacog_tpu.mtmd.clip import load_mmproj

    cfg = transformers.PixtralVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, head_dim=16, image_size=32, patch_size=8,
        rope_theta=10000.0,
    )
    torch.manual_seed(33)
    model = transformers.PixtralVisionModel(cfg).eval()
    sd = model.state_dict()
    path = str(tmp_path / "pixtral.gguf")
    w = GGUFWriter(path)
    _base_clip_md(w, image_size=32, patch=8, E=32, ff=64, L=2, H=2,
                  proj="pixtral", proj_dim=48)
    w.add("clip.use_silu", True)
    w.add("clip.use_gelu", False)
    w.add_tensor("v.patch_embd.weight", sd["patch_conv.weight"].float().numpy())
    w.add_tensor("v.pre_ln.weight", sd["ln_pre.weight"].float().numpy())
    nm = {
        "attention.q_proj": "attn_q", "attention.k_proj": "attn_k",
        "attention.v_proj": "attn_v", "attention.o_proj": "attn_out",
        "attention_norm": "ln1", "ffn_norm": "ln2",
        "feed_forward.gate_proj": "ffn_gate", "feed_forward.up_proj": "ffn_up",
        "feed_forward.down_proj": "ffn_down",
    }
    for il in range(2):
        for hf, gg in nm.items():
            key = f"transformer.layers.{il}.{hf}.weight"
            w.add_tensor(f"v.blk.{il}.{gg}.weight", sd[key].float().numpy())
    rng = np.random.default_rng(3)
    w.add_tensor("mm.1.weight", np.eye(32, dtype=np.float32))  # identity proj
    w.add_tensor("mm.2.weight", np.eye(32, dtype=np.float32))
    w.write()
    enc = load_mmproj(path)
    assert enc.config.vit_norm == "rms"
    pix = np.asarray(np.random.default_rng(5).standard_normal((3, 32, 32)),
                     np.float32)
    ours = enc.encode(pix)  # identity projector -> gelu(vit) @ I
    with torch.no_grad():
        hf_out = model(torch.tensor(pix)[None]).last_hidden_state[0].numpy()
    ref = torch.nn.functional.gelu(torch.tensor(hf_out)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def _r(rng, *s):
    return (rng.standard_normal(s) * 0.05).astype(np.float32)


def test_mlp_norm_projector(tmp_path):
    """Yi-VL: 'mlp' metadata + mm.3/mm.4 tensors auto-promotes to mlp_norm
    (clip.cpp:2411-2414)."""
    from llamacog_tpu.mtmd.clip import load_mmproj

    rng = np.random.default_rng(40)
    E, out_d = 32, 48
    path = str(tmp_path / "mlp_norm.gguf")
    w = GGUFWriter(path)
    _base_clip_md(w, E=E, L=2, proj="mlp", proj_dim=out_d)
    _rand_vit_tensors(w, rng, E=E, L=2, with_cls=True)
    w.add_tensor("mm.0.weight", _r(rng, out_d, E))
    w.add_tensor("mm.0.bias", np.zeros(out_d, np.float32))
    w.add_tensor("mm.1.weight", np.ones(out_d, np.float32))
    w.add_tensor("mm.1.bias", np.zeros(out_d, np.float32))
    w.add_tensor("mm.3.weight", _r(rng, out_d, out_d))
    w.add_tensor("mm.3.bias", np.zeros(out_d, np.float32))
    w.add_tensor("mm.4.weight", np.ones(out_d, np.float32))
    w.add_tensor("mm.4.bias", np.zeros(out_d, np.float32))
    w.write()
    enc = load_mmproj(path)
    assert enc.config.projector_type == "mlp_norm"
    out = enc.encode(enc.preprocess(np.zeros((28, 28, 3), np.uint8)))
    assert out.shape == (4, out_d) and np.isfinite(out).all()
    # second LN (gamma=1, beta=0) means rows are normalized
    assert np.allclose(out.mean(-1), 0.0, atol=1e-4)


def test_mobilevlm_ldp_projector(tmp_path):
    """MobileVLM LDP: MLP + two mobile blocks; stride-2 second block quarters
    the token count (clip.cpp:1251-1360)."""
    from llamacog_tpu.mtmd.clip import load_mmproj

    rng = np.random.default_rng(41)
    E, C = 32, 16
    path = str(tmp_path / "ldp.gguf")
    w = GGUFWriter(path)
    _base_clip_md(w, E=E, L=2, proj="ldp", proj_dim=C)
    _rand_vit_tensors(w, rng, E=E, L=2, with_cls=True)
    w.add_tensor("mm.model.mlp.1.weight", _r(rng, C, E))
    w.add_tensor("mm.model.mlp.1.bias", np.zeros(C, np.float32))
    w.add_tensor("mm.model.mlp.3.weight", _r(rng, C, C))
    w.add_tensor("mm.model.mlp.3.bias", np.zeros(C, np.float32))
    for bi in (1, 2):
        base = f"mm.model.mb_block.{bi}.block"
        w.add_tensor(f"{base}.0.0.weight", _r(rng, C, 1, 3, 3))
        w.add_tensor(f"{base}.0.1.weight", np.ones(C, np.float32))
        w.add_tensor(f"{base}.0.1.bias", np.zeros(C, np.float32))
        w.add_tensor(f"{base}.1.fc1.weight", _r(rng, C // 4, C))
        w.add_tensor(f"{base}.1.fc1.bias", np.zeros(C // 4, np.float32))
        w.add_tensor(f"{base}.1.fc2.weight", _r(rng, C, C // 4))
        w.add_tensor(f"{base}.1.fc2.bias", np.zeros(C, np.float32))
        w.add_tensor(f"{base}.2.0.weight", _r(rng, C, C))
        w.add_tensor(f"{base}.2.1.weight", np.ones(C, np.float32))
        w.add_tensor(f"{base}.2.1.bias", np.zeros(C, np.float32))
    w.write()
    enc = load_mmproj(path)
    out = enc.encode(enc.preprocess(np.zeros((28, 28, 3), np.uint8)))
    assert out.shape == (1, C) and np.isfinite(out).all()  # 2x2 -> 1x1


def test_mobilevlm_ldpv2_projector(tmp_path):
    """MobileVLM-v2 LDPv2: MLP, 2x2 avg pool, PEG depthwise conv + residual
    (clip.cpp:1361-1390)."""
    from llamacog_tpu.mtmd.clip import load_mmproj

    rng = np.random.default_rng(42)
    E, C = 32, 16
    path = str(tmp_path / "ldpv2.gguf")
    w = GGUFWriter(path)
    _base_clip_md(w, E=E, L=2, proj="ldpv2", proj_dim=C)
    _rand_vit_tensors(w, rng, E=E, L=2, with_cls=True)
    w.add_tensor("mm.model.mlp.0.weight", _r(rng, C, E))
    w.add_tensor("mm.model.mlp.0.bias", np.zeros(C, np.float32))
    w.add_tensor("mm.model.mlp.2.weight", _r(rng, C, C))
    w.add_tensor("mm.model.mlp.2.bias", np.zeros(C, np.float32))
    w.add_tensor("mm.model.peg.0.weight", _r(rng, C, 1, 3, 3))
    w.add_tensor("mm.model.peg.0.bias", np.zeros(C, np.float32))
    w.write()
    enc = load_mmproj(path)
    out = enc.encode(enc.preprocess(np.zeros((28, 28, 3), np.uint8)))
    assert out.shape == (1, C) and np.isfinite(out).all()


def test_glm_edge_adapter_projector(tmp_path):
    """GLM-Edge adapter: stride-2 conv + gated MLP + BOI/EOI splice
    (clip.cpp:1391-1418)."""
    from llamacog_tpu.mtmd.clip import load_mmproj

    rng = np.random.default_rng(43)
    E, H4, out_d = 32, 64, 48
    path = str(tmp_path / "glm.gguf")
    w = GGUFWriter(path)
    _base_clip_md(w, E=E, proj="adapter", proj_dim=out_d)
    _rand_vit_tensors(w, rng, E=E)  # no CLS (glm-edge siglip-style tower)
    w.add_tensor("adapter.conv.weight", _r(rng, E, E, 2, 2))
    w.add_tensor("adapter.conv.bias", np.zeros(E, np.float32))
    w.add_tensor("adapter.linear.linear.weight", _r(rng, out_d, E))
    w.add_tensor("adapter.linear.norm1.weight", np.ones(out_d, np.float32))
    w.add_tensor("adapter.linear.norm1.bias", np.zeros(out_d, np.float32))
    w.add_tensor("adapter.linear.dense_h_to_4h.weight", _r(rng, H4, out_d))
    w.add_tensor("adapter.linear.gate.weight", _r(rng, H4, out_d))
    w.add_tensor("adapter.linear.dense_4h_to_h.weight", _r(rng, out_d, H4))
    w.add_tensor("adapter.boi", _r(rng, out_d))
    w.add_tensor("adapter.eoi", _r(rng, out_d))
    w.write()
    enc = load_mmproj(path)
    out = enc.encode(enc.preprocess(np.zeros((28, 28, 3), np.uint8)))
    # 2x2 grid -> stride-2 conv -> 1 token, plus BOI and EOI
    assert out.shape == (3, out_d) and np.isfinite(out).all()
    np.testing.assert_allclose(out[0], np.asarray(enc.params["glm_boi"]),
                               atol=1e-6)
    np.testing.assert_allclose(out[-1], np.asarray(enc.params["glm_eoi"]),
                               atol=1e-6)


def test_idefics3_projector(tmp_path):
    """Idefics3: pixel shuffle then a single mm.model.fc projection."""
    from llamacog_tpu.mtmd.clip import load_mmproj

    rng = np.random.default_rng(44)
    E, out_d, sf = 32, 48, 2
    path = str(tmp_path / "idefics3.gguf")
    w = GGUFWriter(path)
    _base_clip_md(w, image_size=56, E=E, proj="idefics3", proj_dim=out_d)
    w.add("clip.vision.projector.scale_factor", sf)
    _rand_vit_tensors(w, rng, E=E, n_pos=16)
    w.add_tensor("mm.model.fc.weight", _r(rng, out_d, sf * sf * E))
    w.write()
    enc = load_mmproj(path)
    out = enc.encode(enc.preprocess(np.zeros((56, 56, 3), np.uint8)))
    assert out.shape == (4, out_d) and np.isfinite(out).all()  # 16/sf^2


def test_llama4_projector(tmp_path):
    """Llama4: CLS appended last, 2D rope (non-interleaved freq), pixel
    shuffle, bias-free gelu MLP, fc projection (clip.cpp build_llama4:962)."""
    from llamacog_tpu.mtmd.clip import load_mmproj

    rng = np.random.default_rng(45)
    E, out_d, sf = 32, 48, 2
    path = str(tmp_path / "llama4.gguf")
    w = GGUFWriter(path)
    _base_clip_md(w, image_size=56, E=E, proj="llama4", proj_dim=out_d)
    w.add("clip.vision.projector.scale_factor", sf)
    _rand_vit_tensors(w, rng, E=E, n_pos=16, with_cls=True)
    w.add_tensor("mm.model.mlp.1.weight", _r(rng, E, sf * sf * E))
    w.add_tensor("mm.model.mlp.2.weight", _r(rng, E, E))
    w.add_tensor("mm.model.fc.weight", _r(rng, out_d, E))
    w.write()
    enc = load_mmproj(path)
    out = enc.encode(enc.preprocess(np.zeros((56, 56, 3), np.uint8)))
    assert out.shape == (4, out_d) and np.isfinite(out).all()
