"""Converter parity vs the REFERENCE convert_hf_to_gguf.py (oracle).

Each case builds a tiny HF checkpoint with transformers, converts it with
both our converter and the reference's (imported from /root/reference at
test time — see tests/ref_converter.py), and asserts byte-identical tensors
plus a superset of the reference's arch metadata. This catches tensor-name
mapping bugs that HF-logit-parity tests can miss when our loader and our
converter share the same wrong name.
"""

import json
import pathlib
import sys

import pytest

pytestmark = pytest.mark.slow  # heavy compiles / reference-oracle runs: core profile skips (-m 'not slow')

sys.path.insert(0, str(pathlib.Path(__file__).parent))

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

if not pathlib.Path("/root/reference/convert_hf_to_gguf.py").exists():
    pytest.skip("reference tree unavailable", allow_module_level=True)

from ref_converter import compare_with_reference  # noqa: E402

from llamacog_tpu.tools.convert_hf import convert  # noqa: E402

COMMON = dict(
    vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
    tie_word_embeddings=False, pad_token_id=0, bos_token_id=1, eos_token_id=2,
)


def _mk(tmp_path, name, cfg_cls, model_cls, **over):
    import transformers  # noqa: F401

    kw = dict(COMMON)
    kw.update(over)
    cfg = cfg_cls(**kw)
    torch.manual_seed(0)
    m = model_cls(cfg).eval()
    d = tmp_path / name
    m.save_pretrained(d, safe_serialization=True)
    (d / "tokenizer.json").write_text(json.dumps({
        "model": {"type": "BPE",
                  "vocab": {f"t{i}": i for i in range(kw["vocab_size"])},
                  "merges": []},
        "added_tokens": [],
    }))
    return str(d)


# (name, config class name, model class name, config overrides)
CASES = [
    ("llama", "LlamaConfig", "LlamaForCausalLM", {}),
    ("qwen2", "Qwen2Config", "Qwen2ForCausalLM", {}),
    ("qwen3", "Qwen3Config", "Qwen3ForCausalLM", {}),
    ("mixtral", "MixtralConfig", "MixtralForCausalLM",
     dict(num_local_experts=4, num_experts_per_tok=2)),
    ("gemma", "GemmaConfig", "GemmaForCausalLM", {}),
    ("gemma2", "Gemma2Config", "Gemma2ForCausalLM", dict(head_dim=16)),
    ("gemma3", "Gemma3TextConfig", "Gemma3ForCausalLM", dict(head_dim=16)),
    ("phi3", "Phi3Config", "Phi3ForCausalLM", {}),
    ("stablelm", "StableLmConfig", "StableLmForCausalLM", {}),
    ("granite", "GraniteConfig", "GraniteForCausalLM", {}),
    ("granitemoe", "GraniteMoeConfig", "GraniteMoeForCausalLM",
     dict(num_local_experts=4, num_experts_per_tok=2)),
    ("olmo", "OlmoConfig", "OlmoForCausalLM", {}),
    ("olmo2", "Olmo2Config", "Olmo2ForCausalLM", {}),
    ("olmoe", "OlmoeConfig", "OlmoeForCausalLM",
     dict(num_experts=4, num_experts_per_tok=2)),
    ("starcoder2", "Starcoder2Config", "Starcoder2ForCausalLM", {}),
    ("commandr", "CohereConfig", "CohereForCausalLM",
     dict(tie_word_embeddings=True)),
    ("cohere2", "Cohere2Config", "Cohere2ForCausalLM",
     dict(tie_word_embeddings=True, rotary_pct=0.5)),
    ("nemotron", "NemotronConfig", "NemotronForCausalLM", {}),
    ("glm4", "Glm4Config", "Glm4ForCausalLM", {}),
    ("arcee", "ArceeConfig", "ArceeForCausalLM", {}),
    ("qwen2moe", "Qwen2MoeConfig", "Qwen2MoeForCausalLM",
     dict(num_experts=4, num_experts_per_tok=2, moe_intermediate_size=48,
          shared_expert_intermediate_size=96)),
    ("qwen3moe", "Qwen3MoeConfig", "Qwen3MoeForCausalLM",
     dict(num_experts=4, num_experts_per_tok=2, moe_intermediate_size=48)),
]


@pytest.mark.parametrize("name,cfg_cls,model_cls,over",
                         CASES, ids=[c[0] for c in CASES])
def test_convert_matches_reference(tmp_path, name, cfg_cls, model_cls, over):
    import transformers as T

    cfg_cls = getattr(T, cfg_cls, None)
    model_cls = getattr(T, model_cls, None)
    if cfg_cls is None or model_cls is None:
        pytest.skip("arch not in this transformers version")
    d = _mk(tmp_path, name, cfg_cls, model_cls, **over)
    compare_with_reference(d, tmp_path, convert)


# encoder / seq2seq / ssm families need their own config vocabulary
_BERT_KW = dict(vocab_size=128, hidden_size=64, intermediate_size=96,
                num_hidden_layers=2, num_attention_heads=4,
                max_position_embeddings=64, type_vocab_size=2, pad_token_id=0)
_T5_KW = dict(vocab_size=128, d_model=64, d_kv=16, d_ff=96, num_layers=2,
              num_heads=4, relative_attention_num_buckets=8,
              decoder_start_token_id=0, pad_token_id=0, eos_token_id=1)
_MAMBA_KW = dict(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                 state_size=8, conv_kernel=4, intermediate_size=128,
                 pad_token_id=0)

# (name, config class, config kwargs, model class, tensor_rtol)
CASES2 = [
    ("bert", "BertConfig", _BERT_KW, "BertModel", 0.0),
    ("bert_mlm", "BertConfig", _BERT_KW, "BertForMaskedLM", 0.0),
    ("bert_cls", "BertConfig",
     dict(_BERT_KW, id2label={0: "neg", 1: "neu", 2: "pos"}),
     "BertForSequenceClassification", 0.0),
    ("roberta", "RobertaConfig", dict(_BERT_KW, bos_token_id=1, eos_token_id=2),
     "RobertaModel", 0.0),
    ("roberta_cls", "RobertaConfig",
     dict(_BERT_KW, bos_token_id=1, eos_token_id=2,
          id2label={0: "a", 1: "b", 2: "c"}),
     "RobertaForSequenceClassification", 0.0),
    ("xlmroberta", "XLMRobertaConfig",
     dict(_BERT_KW, bos_token_id=1, eos_token_id=2), "XLMRobertaModel", 0.0),
    ("distilbert", "DistilBertConfig",
     dict(vocab_size=128, dim=64, hidden_dim=96, n_layers=2, n_heads=4,
          max_position_embeddings=64, pad_token_id=0), "DistilBertModel", 0.0),
    ("t5", "T5Config", _T5_KW, "T5ForConditionalGeneration", 0.0),
    ("t5_untied", "T5Config", dict(_T5_KW, tie_word_embeddings=False),
     "T5ForConditionalGeneration", 0.0),
    ("umt5", "UMT5Config", _T5_KW, "UMT5ForConditionalGeneration", 0.0),
    ("t5encoder", "T5Config", _T5_KW, "T5EncoderModel", 0.0),
    # ssm_a differs by 1 ULP: numpy vs torch -exp rounding
    ("mamba", "MambaConfig", _MAMBA_KW, "MambaForCausalLM", 1e-6),
    ("falconmamba", "FalconMambaConfig", _MAMBA_KW,
     "FalconMambaForCausalLM", 1e-6),
]


@pytest.mark.parametrize("name,cfg_cls,kw,model_cls,rtol",
                         CASES2, ids=[c[0] for c in CASES2])
def test_convert_matches_reference_enc(tmp_path, name, cfg_cls, kw,
                                       model_cls, rtol):
    import transformers as T

    cfg_cls = getattr(T, cfg_cls, None)
    model_cls = getattr(T, model_cls, None)
    if cfg_cls is None or model_cls is None:
        pytest.skip("arch not in this transformers version")
    cfg = cfg_cls(**kw)
    torch.manual_seed(0)
    m = model_cls(cfg).eval()
    d = tmp_path / name
    m.save_pretrained(d, safe_serialization=True)
    (d / "tokenizer.json").write_text(json.dumps({
        "model": {"type": "BPE",
                  "vocab": {f"t{i}": i for i in range(kw["vocab_size"])},
                  "merges": []},
        "added_tokens": [],
    }))
    compare_with_reference(str(d), tmp_path, convert, tensor_rtol=rtol)
