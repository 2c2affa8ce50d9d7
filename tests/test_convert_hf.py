"""llamacog-convert-hf end-to-end: tiny HF checkpoints saved with
save_pretrained (safetensors) -> GGUF -> our engine, logits vs the HF model
(the role of convert_hf_to_gguf.py + its CI parity runs)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.engine import Engine
from llamacog_tpu.tools.convert_hf import convert

TOKENS = [3, 17, 9, 41, 5, 88]


def _tokenizer_json(n_vocab: int) -> dict:
    """Minimal byte-level BPE tokenizer.json (never actually tokenized in
    these tests; exercises the vocab/merges export path)."""
    vocab = {f"t{i}": i for i in range(n_vocab)}
    return {
        "model": {"type": "BPE", "vocab": vocab, "merges": []},
        "added_tokens": [{"id": 0, "content": "t0", "special": True}],
    }


def _save(model, tmp_path, name):
    d = tmp_path / name
    model.save_pretrained(d, safe_serialization=True)
    (d / "tokenizer.json").write_text(
        json.dumps(_tokenizer_json(model.config.vocab_size))
    )
    return str(d)


def _hf_logits(model):
    with torch.no_grad():
        out = model(torch.tensor([TOKENS]))
    return out.logits[0].float().numpy()


def _our_logits(path):
    m = load_model(path, with_tokenizer=False, dtype=jnp.float32)
    eng = Engine(m.params, m.config, batch_size=1, max_seq=64, dtype=jnp.float32)
    return eng.prefill_logits(TOKENS)


def _assert_close(ours, ref):
    # f16 storage keeps this a conversion test, not a precision test
    corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert corr > 0.9999, f"logit corr {corr}"
    np.testing.assert_allclose(
        ours.argmax(-1), ref.argmax(-1), err_msg="argmax mismatch"
    )


def test_convert_llama(tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    d = _save(model, tmp_path, "llama")
    stats = convert(d, str(tmp_path / "llama.gguf"), outtype="f32")
    assert stats["arch"] == "llama"
    _assert_close(_our_logits(str(tmp_path / "llama.gguf")), _hf_logits(model))


def test_convert_qwen2_f16(tmp_path):
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    model = Qwen2ForCausalLM(cfg).eval()
    d = _save(model, tmp_path, "qwen2")
    convert(d, str(tmp_path / "qwen2.gguf"), outtype="f16")
    _assert_close(_our_logits(str(tmp_path / "qwen2.gguf")), _hf_logits(model))


def test_convert_gemma2(tmp_path):
    from transformers import Gemma2Config, Gemma2ForCausalLM

    cfg = Gemma2Config(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        max_position_embeddings=256, sliding_window=8, query_pre_attn_scalar=16,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
    )
    torch.manual_seed(2)
    model = Gemma2ForCausalLM(cfg).eval()
    d = _save(model, tmp_path, "gemma2")
    stats = convert(d, str(tmp_path / "gemma2.gguf"), outtype="f32")
    assert stats["arch"] == "gemma2"
    _assert_close(_our_logits(str(tmp_path / "gemma2.gguf")), _hf_logits(model))


def test_convert_mixtral_moe(tmp_path):
    from transformers import MixtralConfig, MixtralForCausalLM

    cfg = MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        num_local_experts=4, num_experts_per_tok=2, tie_word_embeddings=False,
    )
    torch.manual_seed(5)
    model = MixtralForCausalLM(cfg).eval()
    d = _save(model, tmp_path, "mixtral")
    convert(d, str(tmp_path / "mixtral.gguf"), outtype="f32")
    _assert_close(_our_logits(str(tmp_path / "mixtral.gguf")), _hf_logits(model))


def test_convert_q8_outtype(tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    torch.manual_seed(6)
    model = LlamaForCausalLM(cfg).eval()
    d = _save(model, tmp_path, "llamaq8")
    convert(d, str(tmp_path / "l8.gguf"), outtype="q8_0")
    ours = _our_logits(str(tmp_path / "l8.gguf"))
    ref = _hf_logits(model)
    corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999


def test_spm_proto_reader(tmp_path):
    """Wire-format parse of a hand-encoded sentencepiece ModelProto."""
    from llamacog_tpu.tools.convert_hf import _read_spm_proto
    import struct

    def piece(text, score, ptype):
        body = b"\x0a" + bytes([len(text)]) + text.encode()
        body += b"\x15" + struct.pack("<f", score)
        body += b"\x18" + bytes([ptype])
        return b"\x0a" + bytes([len(body)]) + body

    blob = piece("<unk>", 0.0, 2) + piece("hello", -1.5, 1) + piece("<0x41>", 0.0, 6)
    f = tmp_path / "tokenizer.model"
    f.write_bytes(blob)
    pieces = _read_spm_proto(f)
    assert pieces == [("<unk>", 0.0, 2), ("hello", -1.5, 1), ("<0x41>", 0.0, 6)]


def test_convert_granitemoe_shared(tmp_path):
    """GraniteMoeShared: fused JetMoe-style input_linear experts split to
    gate/up, shared_mlp, and the four granite multipliers."""
    from transformers import GraniteMoeSharedConfig, GraniteMoeSharedForCausalLM

    cfg = GraniteMoeSharedConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        num_local_experts=4, num_experts_per_tok=2, shared_intermediate_size=48,
        tie_word_embeddings=False, logits_scaling=2.0, residual_multiplier=0.5,
        embedding_multiplier=1.5, attention_multiplier=0.1,
    )
    torch.manual_seed(11)
    model = GraniteMoeSharedForCausalLM(cfg).eval()
    d = _save(model, tmp_path, "granitemoe")
    stats = convert(d, str(tmp_path / "gm.gguf"), outtype="f32")
    assert stats["arch"] == "granitemoe"
    _assert_close(_our_logits(str(tmp_path / "gm.gguf")), _hf_logits(model))


def test_convert_cohere2(tmp_path):
    """cohere2: iSWA pattern-4 + NoPE on full-attention layers + logit_scale."""
    from transformers import Cohere2Config, Cohere2ForCausalLM

    cfg = Cohere2Config(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        sliding_window=8, sliding_window_pattern=4, logit_scale=0.25,
        attn_implementation="eager",
    )
    torch.manual_seed(12)
    model = Cohere2ForCausalLM(cfg).eval()
    d = _save(model, tmp_path, "cohere2")
    stats = convert(d, str(tmp_path / "c2.gguf"), outtype="f32")
    assert stats["arch"] == "cohere2"
    _assert_close(_our_logits(str(tmp_path / "c2.gguf")), _hf_logits(model))


def test_convert_glm4(tmp_path):
    """glm4: post-attn/post-mlp sandwich norms via the arch extra map."""
    from transformers import Glm4Config, Glm4ForCausalLM

    cfg = Glm4Config(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        tie_word_embeddings=False, attention_bias=False, pad_token_id=0,
        eos_token_id=1,
    )
    torch.manual_seed(13)
    model = Glm4ForCausalLM(cfg).eval()
    d = _save(model, tmp_path, "glm4")
    stats = convert(d, str(tmp_path / "glm4.gguf"), outtype="f32")
    assert stats["arch"] == "glm4"
    _assert_close(_our_logits(str(tmp_path / "glm4.gguf")), _hf_logits(model))


def test_convert_deepseek2_moe(tmp_path):
    """deepseek2: MLA (q_lora) + first-k-dense MoE with shared expert."""
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    cfg = DeepseekV2Config(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4, max_position_embeddings=256,
        kv_lora_rank=32, q_lora_rank=24, qk_rope_head_dim=8, qk_nope_head_dim=16,
        v_head_dim=16, n_routed_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=32, first_k_dense_replace=1, n_shared_experts=1,
        routed_scaling_factor=1.0, norm_topk_prob=False, n_group=1, topk_group=1,
        topk_method="greedy", scoring_func="softmax",
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(15)
    model = DeepseekV2ForCausalLM(cfg).eval()
    d = _save(model, tmp_path, "dsv2")
    stats = convert(d, str(tmp_path / "dsv2.gguf"), outtype="f32")
    assert stats["arch"] == "deepseek2"
    ours = _our_logits(str(tmp_path / "dsv2.gguf"))
    ref = _hf_logits(model)
    corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999, f"logit corr {corr}"


def test_convert_dbrx(tmp_path):
    """dbrx: fused Wqkv + clamp, fused w1/v1/w2 expert mats split."""
    from transformers import DbrxConfig, DbrxForCausalLM

    cfg = DbrxConfig(
        d_model=64, n_heads=4, n_layers=2, vocab_size=128, max_seq_len=256,
        ffn_config={"ffn_hidden_size": 96, "moe_num_experts": 4, "moe_top_k": 2},
        attn_config={"kv_n_heads": 2, "clip_qkv": 8.0},
    )
    torch.manual_seed(16)
    model = DbrxForCausalLM(cfg).eval()
    d = _save(model, tmp_path, "dbrx")
    stats = convert(d, str(tmp_path / "dbrx.gguf"), outtype="f32")
    assert stats["arch"] == "dbrx"
    ours = _our_logits(str(tmp_path / "dbrx.gguf"))
    ref = _hf_logits(model)
    corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999, f"logit corr {corr}"


def test_convert_jamba_moe(tmp_path):
    # Observed ~1/750 full-suite-only flake (corr 0.68, catastrophic not
    # precision): passes standalone and in every targeted pairing, both
    # jamba tests flaked in different full runs. Clearing jax's compiled
    # caches guards the one nameable mechanism (long-process cache
    # collision); if it recurs with this guard, suspect the torch side.
    import jax

    jax.clear_caches()

    """jamba: hybrid attn/mamba layers + per-layer dense-or-MoE FFN."""
    from transformers import JambaConfig, JambaForCausalLM

    cfg = JambaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2,
        attn_layer_period=2, attn_layer_offset=1,
        expert_layer_period=2, expert_layer_offset=0, num_experts=4,
        num_experts_per_tok=2,
        mamba_d_state=16, mamba_d_conv=4, mamba_expand=2, mamba_dt_rank=8,
        use_mamba_kernels=False, max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    torch.manual_seed(17)
    model = JambaForCausalLM(cfg).eval()
    d = _save(model, tmp_path, "jamba")
    stats = convert(d, str(tmp_path / "jamba.gguf"), outtype="f32")
    assert stats["arch"] == "jamba"
    ours = _our_logits(str(tmp_path / "jamba.gguf"))
    ref = _hf_logits(model)
    corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999, f"logit corr {corr}"


def test_convert_arcee(tmp_path):
    from transformers import ArceeConfig, ArceeForCausalLM

    cfg = ArceeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    torch.manual_seed(14)
    model = ArceeForCausalLM(cfg).eval()
    d = _save(model, tmp_path, "arcee")
    stats = convert(d, str(tmp_path / "arcee.gguf"), outtype="f32")
    assert stats["arch"] == "arcee"
    _assert_close(_our_logits(str(tmp_path / "arcee.gguf")), _hf_logits(model))


def test_convert_mamba(tmp_path):
    from transformers import MambaConfig, MambaForCausalLM

    cfg = MambaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        state_size=16, conv_kernel=4, time_step_rank=8,
    )
    torch.manual_seed(6)
    model = MambaForCausalLM(cfg).eval()
    d = _save(model, tmp_path, "mamba")
    stats = convert(d, str(tmp_path / "mamba.gguf"), outtype="f32")
    assert stats["arch"] == "mamba"
    ours = _our_logits(str(tmp_path / "mamba.gguf"))
    ref = _hf_logits(model)
    corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999


def test_convert_sharded_safetensors(tmp_path):
    """Multi-shard checkpoints (model.safetensors.index.json) convert
    identically to single-file ones."""
    import numpy as np
    from safetensors.numpy import save_file

    from llamacog_tpu.gguf import GGUFReader

    rng = np.random.default_rng(0)
    E, F, NL = 64, 96, 2
    tensors = {"model.embed_tokens.weight": rng.standard_normal((128, E)).astype(np.float32),
               "model.norm.weight": rng.standard_normal((E,)).astype(np.float32),
               "lm_head.weight": rng.standard_normal((128, E)).astype(np.float32)}
    for i in range(NL):
        p = f"model.layers.{i}"
        for nm, shape in (("self_attn.q_proj", (E, E)), ("self_attn.k_proj", (E, E)),
                          ("self_attn.v_proj", (E, E)), ("self_attn.o_proj", (E, E)),
                          ("mlp.gate_proj", (F, E)), ("mlp.up_proj", (F, E)),
                          ("mlp.down_proj", (E, F))):
            tensors[f"{p}.{nm}.weight"] = rng.standard_normal(shape).astype(np.float32)
        tensors[f"{p}.input_layernorm.weight"] = rng.standard_normal((E,)).astype(np.float32)
        tensors[f"{p}.post_attention_layernorm.weight"] = rng.standard_normal((E,)).astype(np.float32)
    cfg = dict(architectures=["LlamaForCausalLM"], vocab_size=128, hidden_size=E,
               intermediate_size=F, num_hidden_layers=NL, num_attention_heads=4,
               num_key_value_heads=4, max_position_embeddings=256, rms_norm_eps=1e-5)
    tok = {"model": {"type": "BPE", "vocab": {f"t{i}": i for i in range(128)},
                     "merges": []}, "added_tokens": []}

    def make_dir(name, shards):
        d = tmp_path / name
        d.mkdir()
        (d / "config.json").write_text(json.dumps(cfg))
        (d / "tokenizer.json").write_text(json.dumps(tok))
        if shards == 1:
            save_file(tensors, str(d / "model.safetensors"))
        else:
            names = sorted(tensors)
            wmap = {}
            for si in range(shards):
                part = {n: tensors[n] for n in names[si::shards]}
                fname = f"model-{si+1:05d}-of-{shards:05d}.safetensors"
                save_file(part, str(d / fname))
                for n in part:
                    wmap[n] = fname
            (d / "model.safetensors.index.json").write_text(
                json.dumps({"weight_map": wmap}))
        return str(d)

    out1, out3 = str(tmp_path / "one.gguf"), str(tmp_path / "three.gguf")
    convert(make_dir("one", 1), out1, outtype="f32")
    convert(make_dir("three", 3), out3, outtype="f32")
    r1, r3 = GGUFReader(out1), GGUFReader(out3)
    assert set(r1.tensors) == set(r3.tensors)
    for name in r1.tensors:
        np.testing.assert_array_equal(r1.tensor_bytes(name), r3.tensor_bytes(name))
