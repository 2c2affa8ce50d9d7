"""Converter parity for the GPT/fused-QKV HF families plus round-2 generic
additions (gemma1, olmo, granite, qwen2moe, nemotron, stablelm, glm): tiny HF
checkpoints -> GGUF -> our engine, logits vs the HF forward (the role of the
reference convert_hf_to_gguf.py per-arch modify_tensors transforms)."""

import pytest

torch = pytest.importorskip("torch")

import transformers

from llamacog_tpu.tools.convert_hf import convert

from .test_convert_hf import _assert_close, _hf_logits, _our_logits, _save


def _roundtrip(model, tmp_path, name, arch):
    d = _save(model.eval(), tmp_path, name)
    stats = convert(d, str(tmp_path / f"{name}.gguf"), outtype="f32")
    assert stats["arch"] == arch
    _assert_close(_our_logits(str(tmp_path / f"{name}.gguf")), _hf_logits(model))


def test_convert_gpt2(tmp_path):
    from transformers import GPT2Config, GPT2LMHeadModel

    cfg = GPT2Config(vocab_size=128, n_positions=64, n_embd=64, n_layer=2,
                     n_head=4)
    torch.manual_seed(10)
    _roundtrip(GPT2LMHeadModel(cfg), tmp_path, "gpt2", "gpt2")


@pytest.mark.parametrize("parallel", [True, False])
def test_convert_gptneox(tmp_path, parallel):
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    cfg = GPTNeoXConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.25,
        use_parallel_residual=parallel, max_position_embeddings=128,
    )
    torch.manual_seed(11)
    _roundtrip(GPTNeoXForCausalLM(cfg), tmp_path, f"neox{parallel}", "gptneox")


def test_convert_phi2(tmp_path):
    from transformers import PhiConfig, PhiForCausalLM

    cfg = PhiConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        partial_rotary_factor=0.5, max_position_embeddings=128,
    )
    torch.manual_seed(12)
    _roundtrip(PhiForCausalLM(cfg), tmp_path, "phi2", "phi2")


def test_convert_falcon(tmp_path):
    from transformers import FalconConfig, FalconForCausalLM

    cfg = FalconConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_kv_heads=2, new_decoder_architecture=True,
        bias=False, parallel_attn=True, max_position_embeddings=128,
    )
    torch.manual_seed(13)
    _roundtrip(FalconForCausalLM(cfg), tmp_path, "falcon", "falcon")


def test_convert_falcon_7b_style(tmp_path):
    from transformers import FalconConfig, FalconForCausalLM

    cfg = FalconConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, new_decoder_architecture=False,
        multi_query=True, bias=False, parallel_attn=True,
        max_position_embeddings=128,
    )
    torch.manual_seed(14)
    _roundtrip(FalconForCausalLM(cfg), tmp_path, "falcon7b", "falcon")


def test_convert_bloom(tmp_path):
    from transformers import BloomConfig, BloomForCausalLM

    cfg = BloomConfig(vocab_size=128, hidden_size=64, n_layer=2, n_head=4)
    torch.manual_seed(15)
    _roundtrip(BloomForCausalLM(cfg), tmp_path, "bloom", "bloom")


def test_convert_mpt(tmp_path):
    from transformers import MptConfig, MptForCausalLM
    from transformers.models.mpt.configuration_mpt import MptAttentionConfig

    cfg = MptConfig(
        d_model=64, n_heads=4, n_layers=2, expansion_ratio=4,
        max_seq_len=128, vocab_size=128,
        attn_config=MptAttentionConfig(alibi=True, alibi_bias_max=8),
    )
    torch.manual_seed(16)
    _roundtrip(MptForCausalLM(cfg), tmp_path, "mpt", "mpt")


def test_convert_gptj(tmp_path):
    from transformers import GPTJConfig, GPTJForCausalLM

    cfg = GPTJConfig(vocab_size=128, n_positions=128, n_embd=64, n_layer=2,
                     n_head=4, rotary_dim=8)
    torch.manual_seed(17)
    _roundtrip(GPTJForCausalLM(cfg), tmp_path, "gptj", "gptj")


def test_convert_starcoder(tmp_path):
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM

    cfg = GPTBigCodeConfig(vocab_size=128, n_positions=128, n_embd=64,
                           n_layer=2, n_head=4, multi_query=True)
    torch.manual_seed(18)
    _roundtrip(GPTBigCodeForCausalLM(cfg), tmp_path, "starcoder", "starcoder")


def test_convert_gemma1(tmp_path):
    from transformers import GemmaConfig, GemmaForCausalLM

    cfg = GemmaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128,
    )
    torch.manual_seed(19)
    _roundtrip(GemmaForCausalLM(cfg), tmp_path, "gemma1", "gemma")


def test_convert_olmo(tmp_path):
    from transformers import OlmoConfig, OlmoForCausalLM

    cfg = OlmoConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        tie_word_embeddings=False, max_position_embeddings=128,
    )
    torch.manual_seed(20)
    _roundtrip(OlmoForCausalLM(cfg), tmp_path, "olmo", "olmo")


def test_convert_granite(tmp_path):
    from transformers import GraniteConfig, GraniteForCausalLM

    cfg = GraniteConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        embedding_multiplier=2.0, residual_multiplier=0.5,
        attention_multiplier=0.25, logits_scaling=4.0,
        tie_word_embeddings=False, max_position_embeddings=128,
    )
    torch.manual_seed(21)
    _roundtrip(GraniteForCausalLM(cfg), tmp_path, "granite", "granite")


def test_convert_qwen2moe(tmp_path):
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

    cfg = Qwen2MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, shared_expert_intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        norm_topk_prob=False, mlp_only_layers=[], tie_word_embeddings=False,
        max_position_embeddings=128,
    )
    torch.manual_seed(22)
    _roundtrip(Qwen2MoeForCausalLM(cfg), tmp_path, "qwen2moe", "qwen2moe")


def test_convert_nemotron(tmp_path):
    if not hasattr(transformers, "NemotronForCausalLM"):
        pytest.skip("transformers lacks Nemotron")
    from transformers import NemotronConfig, NemotronForCausalLM

    cfg = NemotronConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.5, tie_word_embeddings=False,
        max_position_embeddings=128,
    )
    torch.manual_seed(23)
    _roundtrip(NemotronForCausalLM(cfg), tmp_path, "nemotron", "nemotron")


def test_convert_stablelm(tmp_path):
    from transformers import StableLmConfig, StableLmForCausalLM

    cfg = StableLmConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.25, tie_word_embeddings=False,
        max_position_embeddings=128,
    )
    torch.manual_seed(24)
    _roundtrip(StableLmForCausalLM(cfg), tmp_path, "stablelm", "stablelm")


def test_convert_glm(tmp_path):
    from transformers import GlmConfig, GlmForCausalLM

    cfg = GlmConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.5, tie_word_embeddings=False,
        max_position_embeddings=128, pad_token_id=0,
    )
    torch.manual_seed(25)
    _roundtrip(GlmForCausalLM(cfg), tmp_path, "glm", "chatglm")
