"""Converter oracle for remote-code arches (no transformers classes).

These HF repos ship custom modeling code, so the checkpoints are
hand-crafted here: config.json + random safetensors with the layouts the
real repos use. Neither converter instantiates the model — both only read
config + tensors — so this exercises exactly what a real conversion does.
Reference oracle: tests/ref_converter.py.
"""

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


def _craft(tmp_path, name, cfg: dict, tensors: dict):
    """Write config.json + model.safetensors + a stub tokenizer.json."""
    from safetensors.numpy import save_file

    d = tmp_path / name
    d.mkdir()
    (d / "config.json").write_text(json.dumps(cfg))
    rng = np.random.default_rng(0)
    data = {k: rng.standard_normal(v, dtype=np.float32)
            for k, v in tensors.items()}
    save_file(data, str(d / "model.safetensors"))
    (d / "tokenizer.json").write_text(json.dumps({
        "model": {"type": "BPE",
                  "vocab": {f"t{i}": i for i in range(cfg["vocab_size"])},
                  "merges": []},
        "added_tokens": [],
    }))
    return str(d)


def _llama_layers(n_layer, E, F, n_head, n_kv, bias=False, fused_qkv=None):
    hd = E // n_head
    t = {
        "model.embed_tokens.weight": (128, E),
        "model.norm.weight": (E,),
        "lm_head.weight": (128, E),
    }
    for i in range(n_layer):
        p = f"model.layers.{i}"
        if fused_qkv == "W_pack":
            t[f"{p}.self_attn.W_pack.weight"] = (3 * E, E)
        else:
            t[f"{p}.self_attn.q_proj.weight"] = (n_head * hd, E)
            t[f"{p}.self_attn.k_proj.weight"] = (n_kv * hd, E)
            t[f"{p}.self_attn.v_proj.weight"] = (n_kv * hd, E)
        t[f"{p}.self_attn.o_proj.weight"] = (E, n_head * hd)
        t[f"{p}.input_layernorm.weight"] = (E,)
        t[f"{p}.post_attention_layernorm.weight"] = (E,)
        t[f"{p}.mlp.gate_proj.weight"] = (F, E)
        t[f"{p}.mlp.up_proj.weight"] = (F, E)
        t[f"{p}.mlp.down_proj.weight"] = (E, F)
        if bias:
            for nm in ("input_layernorm", "post_attention_layernorm"):
                t[f"{p}.{nm}.bias"] = (E,)
    if bias:
        t["model.norm.bias"] = (E,)
    return t


E, F, NH, NKV, NL = 64, 96, 4, 4, 2


def test_convert_baichuan(tmp_path):
    cfg = dict(architectures=["BaichuanForCausalLM"], vocab_size=128,
               hidden_size=E, intermediate_size=F, num_hidden_layers=NL,
               num_attention_heads=NH, model_max_length=4096,
               rms_norm_eps=1e-6)
    d = _craft(tmp_path, "baichuan", cfg,
               _llama_layers(NL, E, F, NH, NH, fused_qkv="W_pack"))
    compare_with_reference(d, tmp_path, convert)


def test_convert_xverse(tmp_path):
    cfg = dict(architectures=["XverseForCausalLM"], vocab_size=128,
               hidden_size=E, intermediate_size=F, num_hidden_layers=NL,
               num_attention_heads=NH, max_position_embeddings=2048,
               rms_norm_eps=1e-6)
    d = _craft(tmp_path, "xverse", cfg, _llama_layers(NL, E, F, NH, NH))
    compare_with_reference(d, tmp_path, convert)


def test_convert_orion(tmp_path):
    cfg = dict(architectures=["OrionForCausalLM"], vocab_size=128,
               hidden_size=E, intermediate_size=F, num_hidden_layers=NL,
               num_attention_heads=NH, num_key_value_heads=NKV,
               max_sequence_length=4096, rms_norm_eps=1e-5)
    d = _craft(tmp_path, "orion", cfg,
               _llama_layers(NL, E, F, NH, NKV, bias=True))
    compare_with_reference(d, tmp_path, convert)


def test_convert_internlm2(tmp_path):
    n_kv = 2
    hd = E // NH
    cfg = dict(architectures=["InternLM2ForCausalLM"], vocab_size=128,
               hidden_size=E, intermediate_size=F, num_hidden_layers=NL,
               num_attention_heads=NH, num_key_value_heads=n_kv,
               max_position_embeddings=2048, rope_theta=10000.0,
               rms_norm_eps=1e-5)
    t = {"model.tok_embeddings.weight": (128, E),
         "model.norm.weight": (E,),
         "output.weight": (128, E)}
    for i in range(NL):
        p = f"model.layers.{i}"
        t[f"{p}.attention.wqkv.weight"] = ((NH + 2 * n_kv) * hd, E)
        t[f"{p}.attention.wo.weight"] = (E, E)
        t[f"{p}.attention_norm.weight"] = (E,)
        t[f"{p}.ffn_norm.weight"] = (E,)
        t[f"{p}.feed_forward.w1.weight"] = (F, E)
        t[f"{p}.feed_forward.w2.weight"] = (E, F)
        t[f"{p}.feed_forward.w3.weight"] = (F, E)
    d = _craft(tmp_path, "internlm2", cfg, t)
    compare_with_reference(d, tmp_path, convert)


def test_convert_minicpm(tmp_path):
    hd = E // NH
    cfg = dict(architectures=["MiniCPMForCausalLM"], vocab_size=128,
               hidden_size=E, intermediate_size=F, num_hidden_layers=NL,
               num_attention_heads=NH, num_key_value_heads=NKV,
               max_position_embeddings=2048, rms_norm_eps=1e-5,
               scale_emb=12.0, scale_depth=1.4, dim_model_base=32,
               rope_scaling={"rope_type": "longrope",
                             "long_factor": [1.0] * (hd // 2),
                             "short_factor": [1.0] * (hd // 2),
                             "original_max_position_embeddings": 2048})
    d = _craft(tmp_path, "minicpm", cfg, _llama_layers(NL, E, F, NH, NKV))
    compare_with_reference(d, tmp_path, convert)
