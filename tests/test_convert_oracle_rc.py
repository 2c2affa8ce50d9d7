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

pytestmark = pytest.mark.slow  # heavy compiles / reference-oracle runs: core profile skips (-m 'not slow')

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


# ---------------------------------------------------------------------------
# wave D: long-tail decoder arches
# ---------------------------------------------------------------------------


def test_convert_deci_7b_style(tmp_path):
    per_layer = [4, 2]
    cfg = dict(architectures=["DeciLMForCausalLM"], vocab_size=128,
               hidden_size=E, intermediate_size=F, num_hidden_layers=NL,
               num_attention_heads=NH, num_key_value_heads_per_layer=per_layer,
               max_position_embeddings=2048, rms_norm_eps=1e-5)
    hd = E // NH
    t = _llama_layers(0, E, F, NH, NH)
    for i, kv in enumerate(per_layer):
        p = f"model.layers.{i}"
        t[f"{p}.self_attn.q_proj.weight"] = (NH * hd, E)
        t[f"{p}.self_attn.k_proj.weight"] = (kv * hd, E)
        t[f"{p}.self_attn.v_proj.weight"] = (kv * hd, E)
        t[f"{p}.self_attn.o_proj.weight"] = (E, NH * hd)
        t[f"{p}.input_layernorm.weight"] = (E,)
        t[f"{p}.post_attention_layernorm.weight"] = (E,)
        t[f"{p}.mlp.gate_proj.weight"] = (F, E)
        t[f"{p}.mlp.up_proj.weight"] = (F, E)
        t[f"{p}.mlp.down_proj.weight"] = (E, F)
    d = _craft(tmp_path, "deci7b", cfg, t)
    compare_with_reference(d, tmp_path, convert)


def test_convert_deci_nemotron_style(tmp_path):
    # layer 0: normal attention (group of 2), layer 1: attention-free
    blocks = [
        {"attention": {"n_heads_in_group": 2, "replace_with_linear": False},
         "ffn": {"ffn_mult": 1.0}},
        {"attention": {"n_heads_in_group": None, "replace_with_linear": False},
         "ffn": {"ffn_mult": 1.0}},
    ]
    ffn_dim = 256  # _ffn_mult_to_intermediate_size(1.0, 64) -> 256
    cfg = dict(architectures=["DeciLMForCausalLM"], vocab_size=128,
               hidden_size=E, num_hidden_layers=NL,
               num_attention_heads=NH, block_configs=blocks,
               max_position_embeddings=2048, rms_norm_eps=1e-5,
               rope_theta=10000.0)
    hd = E // NH
    t = {"model.embed_tokens.weight": (128, E), "model.norm.weight": (E,),
         "lm_head.weight": (128, E)}
    p = "model.layers.0"
    t.update({f"{p}.self_attn.q_proj.weight": (NH * hd, E),
              f"{p}.self_attn.k_proj.weight": (2 * hd, E),
              f"{p}.self_attn.v_proj.weight": (2 * hd, E),
              f"{p}.self_attn.o_proj.weight": (E, NH * hd),
              f"{p}.input_layernorm.weight": (E,)})
    for p in ("model.layers.0", "model.layers.1"):
        t.update({f"{p}.post_attention_layernorm.weight": (E,),
                  f"{p}.mlp.gate_proj.weight": (ffn_dim, E),
                  f"{p}.mlp.up_proj.weight": (ffn_dim, E),
                  f"{p}.mlp.down_proj.weight": (E, ffn_dim)})
    d = _craft(tmp_path, "deci51b", cfg, t)
    compare_with_reference(d, tmp_path, convert)


def test_convert_exaone(tmp_path):
    cfg = dict(architectures=["ExaoneForCausalLM"], vocab_size=128,
               hidden_size=E, intermediate_size=F, num_layers=NL,
               num_attention_heads=NH, num_key_value_heads=NKV,
               max_position_embeddings=2048, layer_norm_epsilon=1e-5,
               activation_function="silu", rope_theta=10000.0)
    t = {"transformer.wte.weight": (128, E), "transformer.ln_f.weight": (E,),
         "lm_head.weight": (128, E)}
    for i in range(NL):
        p = f"transformer.h.{i}"
        t.update({f"{p}.ln_1.weight": (E,), f"{p}.ln_2.weight": (E,),
                  f"{p}.attn.attention.q_proj.weight": (E, E),
                  f"{p}.attn.attention.k_proj.weight": (E, E),
                  f"{p}.attn.attention.v_proj.weight": (E, E),
                  f"{p}.attn.attention.out_proj.weight": (E, E),
                  f"{p}.mlp.c_fc_0.weight": (F, E),
                  f"{p}.mlp.c_fc_1.weight": (F, E),
                  f"{p}.mlp.c_proj.weight": (E, F)})
    d = _craft(tmp_path, "exaone", cfg, t)
    compare_with_reference(d, tmp_path, convert)


def test_convert_chatglm(tmp_path):
    n_kv = 2
    hd = E // NH
    cfg = dict(architectures=["ChatGLMModel"], vocab_size=128,
               hidden_size=E, ffn_hidden_size=F, num_layers=NL,
               num_attention_heads=NH, multi_query_group_num=n_kv,
               seq_length=2048, layernorm_epsilon=1e-5, rope_ratio=2.0)
    t = {"transformer.embedding.word_embeddings.weight": (128, E),
         "transformer.encoder.final_layernorm.weight": (E,),
         "transformer.output_layer.weight": (128, E),
         "transformer.rotary_pos_emb.inv_freq": (hd // 4,)}
    for i in range(NL):
        p = f"transformer.encoder.layers.{i}"
        t.update({f"{p}.input_layernorm.weight": (E,),
                  f"{p}.self_attention.query_key_value.weight":
                      ((NH + 2 * n_kv) * hd, E),
                  f"{p}.self_attention.query_key_value.bias":
                      ((NH + 2 * n_kv) * hd,),
                  f"{p}.self_attention.dense.weight": (E, E),
                  f"{p}.post_attention_layernorm.weight": (E,),
                  f"{p}.mlp.dense_h_to_4h.weight": (2 * F, E),
                  f"{p}.mlp.dense_4h_to_h.weight": (E, F)})
    d = _craft(tmp_path, "chatglm", cfg, t)
    compare_with_reference(d, tmp_path, convert)


def test_convert_qwen_v1(tmp_path):
    cfg = dict(architectures=["QWenLMHeadModel"], vocab_size=128,
               hidden_size=E, intermediate_size=F, num_hidden_layers=NL,
               num_attention_heads=NH, max_position_embeddings=2048,
               rotary_emb_base=10000.0, layer_norm_epsilon=1e-6)
    t = {"transformer.wte.weight": (128, E), "transformer.ln_f.weight": (E,),
         "lm_head.weight": (128, E)}
    for i in range(NL):
        p = f"transformer.h.{i}"
        t.update({f"{p}.ln_1.weight": (E,), f"{p}.ln_2.weight": (E,),
                  f"{p}.attn.c_attn.weight": (3 * E, E),
                  f"{p}.attn.c_attn.bias": (3 * E,),
                  f"{p}.attn.c_proj.weight": (E, E),
                  f"{p}.mlp.w1.weight": (F, E), f"{p}.mlp.w2.weight": (F, E),
                  f"{p}.mlp.c_proj.weight": (E, F)})
    d = _craft(tmp_path, "qwenv1", cfg, t)
    compare_with_reference(d, tmp_path, convert)


def test_convert_codeshell(tmp_path):
    n_kv = 2
    hd = E // NH
    cfg = dict(architectures=["CodeShellForCausalLM"], vocab_size=128,
               n_embd=E, n_layer=NL, n_head=NH, num_query_groups=n_kv,
               n_positions=2048, layer_norm_epsilon=1e-5)
    t = {"transformer.wte.weight": (128, E), "transformer.ln_f.weight": (E,),
         "transformer.ln_f.bias": (E,), "lm_head.weight": (128, E)}
    for i in range(NL):
        p = f"transformer.h.{i}"
        t.update({f"{p}.ln_1.weight": (E,), f"{p}.ln_1.bias": (E,),
                  f"{p}.ln_2.weight": (E,), f"{p}.ln_2.bias": (E,),
                  f"{p}.attn.c_attn.weight": ((NH + 2 * n_kv) * hd, E),
                  f"{p}.attn.c_attn.bias": ((NH + 2 * n_kv) * hd,),
                  f"{p}.attn.c_proj.weight": (E, E),
                  f"{p}.attn.c_proj.bias": (E,),
                  f"{p}.mlp.c_fc.weight": (4 * E, E),
                  f"{p}.mlp.c_fc.bias": (4 * E,),
                  f"{p}.mlp.c_proj.weight": (E, 4 * E),
                  f"{p}.mlp.c_proj.bias": (E,)})
    d = _craft(tmp_path, "codeshell", cfg, t)
    compare_with_reference(d, tmp_path, convert)


def test_convert_grok(tmp_path):
    n_exp = 4
    cfg = dict(architectures=["GrokForCausalLM"], vocab_size=128,
               hidden_size=E, intermediate_size=F, num_hidden_layers=NL,
               num_attention_heads=NH, num_key_value_heads=NKV,
               max_position_embeddings=2048, rms_norm_eps=1e-5,
               num_local_experts=n_exp, num_experts_per_tok=2)
    t = {"transformer.in_out_embed.weight": (128, E),
         "transformer.rms_norm.weight": (E,)}
    for i in range(NL):
        p = f"transformer.decoder_layer.{i}"
        t.update({f"{p}.rms_norm.weight": (E,), f"{p}.rms_norm_1.weight": (E,),
                  f"{p}.rms_norm_2.weight": (E,), f"{p}.rms_norm_3.weight": (E,),
                  f"{p}.multi_head_attention.query.weight": (E, E),
                  f"{p}.multi_head_attention.key.weight": (E, E),
                  f"{p}.multi_head_attention.value.weight": (E, E),
                  f"{p}.multi_head_attention.linear.weight": (E, E),
                  f"{p}.router.weight": (n_exp, E)})
        for e in range(n_exp):
            t.update({f"{p}.moe.{e}.linear.weight": (F, E),
                      f"{p}.moe.{e}.linear_1.weight": (E, F),
                      f"{p}.moe.{e}.linear_v.weight": (F, E)})
    d = _craft(tmp_path, "grok", cfg, t)
    compare_with_reference(d, tmp_path, convert)


def test_convert_minicpm3(tmp_path):
    q_lora, kv_lora = 32, 16
    qk_nope, qk_rope, v_hd = 16, 8, 16
    n_head = 4
    cfg = dict(architectures=["MiniCPM3ForCausalLM"], vocab_size=128,
               hidden_size=E, intermediate_size=F, num_hidden_layers=NL,
               num_attention_heads=n_head, num_key_value_heads=n_head,
               max_position_embeddings=2048, rms_norm_eps=1e-5,
               q_lora_rank=q_lora, kv_lora_rank=kv_lora,
               qk_nope_head_dim=qk_nope, qk_rope_head_dim=qk_rope,
               v_head_dim=v_hd,
               rope_scaling={"long_factor": [1.0] * (qk_rope // 2),
                             "short_factor": [1.0] * (qk_rope // 2)})
    t = {"model.embed_tokens.weight": (128, E), "model.norm.weight": (E,),
         "lm_head.weight": (128, E)}
    for i in range(NL):
        p = f"model.layers.{i}"
        t.update({f"{p}.input_layernorm.weight": (E,),
                  f"{p}.post_attention_layernorm.weight": (E,),
                  f"{p}.self_attn.q_a_proj.weight": (q_lora, E),
                  f"{p}.self_attn.q_a_layernorm.weight": (q_lora,),
                  f"{p}.self_attn.q_b_proj.weight":
                      (n_head * (qk_nope + qk_rope), q_lora),
                  f"{p}.self_attn.kv_a_proj_with_mqa.weight":
                      (kv_lora + qk_rope, E),
                  f"{p}.self_attn.kv_a_layernorm.weight": (kv_lora,),
                  f"{p}.self_attn.kv_b_proj.weight":
                      (n_head * (qk_nope + v_hd), kv_lora),
                  f"{p}.self_attn.o_proj.weight": (E, n_head * v_hd),
                  f"{p}.mlp.gate_proj.weight": (F, E),
                  f"{p}.mlp.up_proj.weight": (F, E),
                  f"{p}.mlp.down_proj.weight": (E, F)})
    d = _craft(tmp_path, "minicpm3", cfg, t)
    compare_with_reference(d, tmp_path, convert)


def test_convert_phimoe(tmp_path):
    n_exp = 4
    cfg = dict(architectures=["PhiMoEForCausalLM"], vocab_size=128,
               hidden_size=E, intermediate_size=F, num_hidden_layers=NL,
               num_attention_heads=NH, num_key_value_heads=NKV,
               max_position_embeddings=2048,
               original_max_position_embeddings=2048, rms_norm_eps=1e-5,
               rope_theta=10000.0, sliding_window=128,
               num_local_experts=n_exp, num_experts_per_tok=2)
    t = {"model.embed_tokens.weight": (128, E), "model.norm.weight": (E,),
         "model.norm.bias": (E,), "lm_head.weight": (128, E),
         "lm_head.bias": (128,)}
    for i in range(NL):
        p = f"model.layers.{i}"
        t.update({f"{p}.input_layernorm.weight": (E,),
                  f"{p}.input_layernorm.bias": (E,),
                  f"{p}.post_attention_layernorm.weight": (E,),
                  f"{p}.post_attention_layernorm.bias": (E,),
                  f"{p}.self_attn.q_proj.weight": (E, E),
                  f"{p}.self_attn.q_proj.bias": (E,),
                  f"{p}.self_attn.k_proj.weight": (E, E),
                  f"{p}.self_attn.k_proj.bias": (E,),
                  f"{p}.self_attn.v_proj.weight": (E, E),
                  f"{p}.self_attn.v_proj.bias": (E,),
                  f"{p}.self_attn.o_proj.weight": (E, E),
                  f"{p}.self_attn.o_proj.bias": (E,),
                  f"{p}.block_sparse_moe.gate.weight": (n_exp, E)})
        for e in range(n_exp):
            t.update({f"{p}.block_sparse_moe.experts.{e}.w1.weight": (F, E),
                      f"{p}.block_sparse_moe.experts.{e}.w2.weight": (E, F),
                      f"{p}.block_sparse_moe.experts.{e}.w3.weight": (F, E)})
    d = _craft(tmp_path, "phimoe", cfg, t)
    compare_with_reference(d, tmp_path, convert)


def test_convert_bailingmoe(tmp_path):
    n_exp, n_kv = 4, 2
    hd = E // NH
    cfg = dict(architectures=["BailingMoeForCausalLM"], vocab_size=128,
               hidden_size=E, intermediate_size=F, num_hidden_layers=NL,
               num_attention_heads=NH, num_key_value_heads=n_kv,
               max_position_embeddings=2048, rms_norm_eps=1e-5,
               first_k_dense_replace=0, moe_intermediate_size=48,
               num_experts=n_exp, num_shared_experts=1, norm_topk_prob=True,
               num_experts_per_tok=2, norm_head=True)
    t = {"model.word_embeddings.weight": (128, E), "model.norm.weight": (E,),
         "lm_head.weight": (128, E)}
    for i in range(NL):
        p = f"model.layers.{i}"
        t.update({f"{p}.input_layernorm.weight": (E,),
                  f"{p}.post_attention_layernorm.weight": (E,),
                  f"{p}.attention.query_key_value.weight":
                      ((NH + 2 * n_kv) * hd, E),
                  f"{p}.attention.dense.weight": (E, E)})
        t[f"{p}.mlp.gate.weight"] = (n_exp, E)
        for e in range(n_exp):
            t.update({f"{p}.mlp.experts.{e}.gate_proj.weight": (48, E),
                      f"{p}.mlp.experts.{e}.up_proj.weight": (48, E),
                      f"{p}.mlp.experts.{e}.down_proj.weight": (E, 48)})
        t.update({f"{p}.mlp.shared_experts.gate_proj.weight": (48, E),
                  f"{p}.mlp.shared_experts.up_proj.weight": (48, E),
                  f"{p}.mlp.shared_experts.down_proj.weight": (E, 48)})
    d = _craft(tmp_path, "bailingmoe", cfg, t)
    compare_with_reference(d, tmp_path, convert, tensor_rtol=1e-6)


def test_convert_dots1(tmp_path):
    n_exp = 4
    cfg = dict(architectures=["Dots1ForCausalLM"], vocab_size=128,
               hidden_size=E, intermediate_size=F, num_hidden_layers=NL,
               num_attention_heads=NH, num_key_value_heads=NKV,
               max_position_embeddings=2048, rms_norm_eps=1e-5,
               rope_theta=10000.0,
               n_routed_experts=n_exp, num_experts_per_tok=2,
               moe_intermediate_size=48, first_k_dense_replace=1,
               n_shared_experts=1, routed_scaling_factor=2.5,
               norm_topk_prob=True, scoring_func="noaux_tc")
    hd = E // NH
    t = {"model.embed_tokens.weight": (128, E), "model.norm.weight": (E,),
         "lm_head.weight": (128, E)}
    for i in range(NL):
        p = f"model.layers.{i}"
        t.update({f"{p}.input_layernorm.weight": (E,),
                  f"{p}.post_attention_layernorm.weight": (E,),
                  f"{p}.self_attn.q_proj.weight": (NH * hd, E),
                  f"{p}.self_attn.k_proj.weight": (NKV * hd, E),
                  f"{p}.self_attn.v_proj.weight": (NKV * hd, E),
                  f"{p}.self_attn.o_proj.weight": (E, NH * hd),
                  f"{p}.self_attn.q_norm.weight": (hd,),
                  f"{p}.self_attn.k_norm.weight": (hd,)})
        if i == 0:
            t.update({f"{p}.mlp.gate_proj.weight": (F, E),
                      f"{p}.mlp.up_proj.weight": (F, E),
                      f"{p}.mlp.down_proj.weight": (E, F)})
        else:
            t[f"{p}.mlp.gate.weight"] = (n_exp, E)
            t[f"{p}.mlp.gate.e_score_correction_bias"] = (n_exp,)
            for e in range(n_exp):
                t.update({f"{p}.mlp.experts.{e}.gate_proj.weight": (48, E),
                          f"{p}.mlp.experts.{e}.up_proj.weight": (48, E),
                          f"{p}.mlp.experts.{e}.down_proj.weight": (E, 48)})
            t.update({f"{p}.mlp.shared_experts.gate_proj.weight": (48, E),
                      f"{p}.mlp.shared_experts.up_proj.weight": (48, E),
                      f"{p}.mlp.shared_experts.down_proj.weight": (E, 48)})
    d = _craft(tmp_path, "dots1", cfg, t)
    compare_with_reference(d, tmp_path, convert)


def test_convert_chameleon(tmp_path):
    hd = E // NH
    cfg = dict(architectures=["ChameleonForConditionalGeneration"],
               vocab_size=128, hidden_size=E, intermediate_size=F,
               num_hidden_layers=NL, num_attention_heads=NH,
               num_key_value_heads=NKV, max_position_embeddings=2048,
               rms_norm_eps=1e-5, rope_theta=10000.0, swin_norm=True)
    t = _llama_layers(NL, E, F, NH, NKV)
    for i in range(NL):
        p = f"model.layers.{i}"
        t.update({f"{p}.self_attn.q_norm.weight": (NH, hd),
                  f"{p}.self_attn.q_norm.bias": (NH, hd),
                  f"{p}.self_attn.k_norm.weight": (NKV, hd),
                  f"{p}.self_attn.k_norm.bias": (NKV, hd)})
    d = _craft(tmp_path, "chameleon", cfg, t)
    compare_with_reference(d, tmp_path, convert)


def test_convert_bitnet(tmp_path):
    cfg = dict(architectures=["BitnetForCausalLM"], vocab_size=128,
               hidden_size=E, intermediate_size=F, num_hidden_layers=NL,
               num_attention_heads=NH, num_key_value_heads=NKV,
               max_position_embeddings=2048, rms_norm_eps=1e-5)
    t = _llama_layers(NL, E, F, NH, NKV)
    del t["lm_head.weight"]  # bitnet ties lm_head to embeddings
    for i in range(NL):
        p = f"model.layers.{i}"
        t.update({f"{p}.self_attn.inner_attn_ln.weight": (E,),
                  f"{p}.mlp.ffn_layernorm.weight": (F,)})
    d = _craft(tmp_path, "bitnet", cfg, t)
    compare_with_reference(d, tmp_path, convert, tensor_rtol=1e-6)


def test_convert_arctic(tmp_path):
    n_exp = 4
    hd = E // NH
    cfg = dict(architectures=["ArcticForCausalLM"], vocab_size=128,
               hidden_size=E, intermediate_size=F, num_hidden_layers=NL,
               num_attention_heads=NH, num_key_value_heads=NKV,
               max_position_embeddings=2048, rms_norm_eps=1e-5,
               num_local_experts=n_exp, num_experts_per_tok=2)
    t = {"model.embed_tokens.weight": (128, E), "model.norm.weight": (E,),
         "lm_head.weight": (128, E)}
    for i in range(NL):
        p = f"model.layers.{i}"
        t.update({f"{p}.input_layernorm.weight": (E,),
                  f"{p}.residual_layernorm.weight": (E,),
                  f"{p}.post_attention_layernorm.weight": (E,),
                  f"{p}.self_attn.q_proj.weight": (NH * hd, E),
                  f"{p}.self_attn.k_proj.weight": (NKV * hd, E),
                  f"{p}.self_attn.v_proj.weight": (NKV * hd, E),
                  f"{p}.self_attn.o_proj.weight": (E, NH * hd),
                  f"{p}.residual_mlp.w1.weight": (F, E),
                  f"{p}.residual_mlp.w3.weight": (F, E),
                  f"{p}.residual_mlp.w2.weight": (E, F),
                  f"{p}.block_sparse_moe.gate.weight": (n_exp, E)})
        for e in range(n_exp):
            t.update({f"{p}.block_sparse_moe.experts.{e}.w1.weight": (48, E),
                      f"{p}.block_sparse_moe.experts.{e}.w2.weight": (E, 48),
                      f"{p}.block_sparse_moe.experts.{e}.w3.weight": (48, E)})
    d = _craft(tmp_path, "arctic", cfg, t)
    compare_with_reference(d, tmp_path, convert)


def test_convert_openelm(tmp_path):
    hd = 16
    q_heads, kv_heads = [4, 2], [2, 1]
    mults = [1.0, 2.0]
    cfg = dict(architectures=["OpenELMForCausalLM"], vocab_size=128,
               model_dim=E, num_transformer_layers=NL, head_dim=hd,
               num_query_heads=q_heads, num_kv_heads=kv_heads,
               ffn_multipliers=mults, ffn_dim_divisor=32,
               max_context_length=2048, rope_freq_constant=10000)
    ffn = [64, 128]  # make_divisible(64*1,32), make_divisible(64*2,32)
    t = {"transformer.token_embeddings.weight": (128, E),
         "transformer.norm.weight": (E,)}
    for i in range(NL):
        p = f"transformer.layers.{i}"
        qkv = (q_heads[i] + 2 * kv_heads[i]) * hd
        t.update({f"{p}.attn_norm.weight": (E,),
                  f"{p}.ffn_norm.weight": (E,),
                  f"{p}.attn.qkv_proj.weight": (qkv, E),
                  f"{p}.attn.out_proj.weight": (E, q_heads[i] * hd),
                  f"{p}.attn.q_norm.weight": (hd,),
                  f"{p}.attn.k_norm.weight": (hd,),
                  f"{p}.ffn.proj_1.weight": (2 * ffn[i], E),
                  f"{p}.ffn.proj_2.weight": (E, ffn[i])})
    d = _craft(tmp_path, "openelm", cfg, t)
    compare_with_reference(d, tmp_path, convert)


def test_convert_deepseek_v1(tmp_path):
    n_exp = 4
    hd = E // NH
    cfg = dict(architectures=["DeepseekForCausalLM"], vocab_size=128,
               hidden_size=E, intermediate_size=F, num_hidden_layers=NL,
               num_attention_heads=NH, num_key_value_heads=NKV,
               max_position_embeddings=2048, rms_norm_eps=1e-5,
               n_routed_experts=n_exp, num_experts_per_tok=2,
               moe_intermediate_size=48, first_k_dense_replace=1,
               n_shared_experts=1)
    t = {"model.embed_tokens.weight": (128, E), "model.norm.weight": (E,),
         "lm_head.weight": (128, E)}
    for i in range(NL):
        p = f"model.layers.{i}"
        t.update({f"{p}.input_layernorm.weight": (E,),
                  f"{p}.post_attention_layernorm.weight": (E,),
                  f"{p}.self_attn.q_proj.weight": (NH * hd, E),
                  f"{p}.self_attn.k_proj.weight": (NKV * hd, E),
                  f"{p}.self_attn.v_proj.weight": (NKV * hd, E),
                  f"{p}.self_attn.o_proj.weight": (E, NH * hd)})
        if i == 0:
            t.update({f"{p}.mlp.gate_proj.weight": (F, E),
                      f"{p}.mlp.up_proj.weight": (F, E),
                      f"{p}.mlp.down_proj.weight": (E, F)})
        else:
            t[f"{p}.mlp.gate.weight"] = (n_exp, E)
            for e in range(n_exp):
                t.update({f"{p}.mlp.experts.{e}.gate_proj.weight": (48, E),
                          f"{p}.mlp.experts.{e}.up_proj.weight": (48, E),
                          f"{p}.mlp.experts.{e}.down_proj.weight": (E, 48)})
            t.update({f"{p}.mlp.shared_experts.gate_proj.weight": (48, E),
                      f"{p}.mlp.shared_experts.up_proj.weight": (48, E),
                      f"{p}.mlp.shared_experts.down_proj.weight": (E, 48)})
    d = _craft(tmp_path, "deepseek1", cfg, t)
    compare_with_reference(d, tmp_path, convert)


def test_convert_jais(tmp_path):
    cfg = dict(architectures=["JAISLMHeadModel"], vocab_size=128,
               n_embd=E, n_inner=F, n_layer=NL, n_head=NH, n_positions=2048,
               layer_norm_epsilon=1e-5, activation_function="swiglu",
               position_embedding_type="alibi", mup_embeddings_scale=14.6,
               mup_output_alpha=2.22, mup_width_scale=0.03571)
    t = {"transformer.wte.weight": (128, E), "transformer.ln_f.weight": (E,),
         "transformer.ln_f.bias": (E,), "lm_head.weight": (128, E)}
    for i in range(NL):
        p = f"transformer.h.{i}"
        t.update({f"{p}.ln_1.weight": (E,), f"{p}.ln_1.bias": (E,),
                  f"{p}.ln_2.weight": (E,), f"{p}.ln_2.bias": (E,),
                  f"{p}.attn.c_attn.weight": (E, 3 * E),
                  f"{p}.attn.c_attn.bias": (3 * E,),
                  f"{p}.attn.c_proj.weight": (E, E),
                  f"{p}.attn.c_proj.bias": (E,),
                  f"{p}.mlp.c_fc.weight": (E, F),
                  f"{p}.mlp.c_fc.bias": (F,),
                  f"{p}.mlp.c_fc2.weight": (E, F),
                  f"{p}.mlp.c_fc2.bias": (F,),
                  f"{p}.mlp.c_proj.weight": (F, E),
                  f"{p}.mlp.c_proj.bias": (E,)})
    d = _craft(tmp_path, "jais", cfg, t)
    compare_with_reference(d, tmp_path, convert, tensor_rtol=1e-6)


def test_convert_llama_aliases(tmp_path):
    cfg = dict(architectures=["LLaMAForCausalLM"], vocab_size=128,
               hidden_size=E, intermediate_size=F, num_hidden_layers=NL,
               num_attention_heads=NH, num_key_value_heads=NKV,
               max_position_embeddings=2048, rms_norm_eps=1e-5)
    d = _craft(tmp_path, "llama_alias", cfg, _llama_layers(NL, E, F, NH, NKV))
    compare_with_reference(d, tmp_path, convert)


def test_convert_olmo_oldcaps_alias(tmp_path):
    cfg = dict(architectures=["OLMoForCausalLM"], vocab_size=128,
               hidden_size=E, intermediate_size=F, num_hidden_layers=NL,
               num_attention_heads=NH, max_position_embeddings=2048,
               clip_qkv=8.0)
    t = _llama_layers(NL, E, F, NH, NH)
    del t["model.norm.weight"]  # olmo: non-parametric norms
    for i in range(NL):
        del t[f"model.layers.{i}.input_layernorm.weight"]
        del t[f"model.layers.{i}.post_attention_layernorm.weight"]
    d = _craft(tmp_path, "olmo_caps", cfg, t)
    compare_with_reference(d, tmp_path, convert)


# ---------------------------------------------------------------------------
# wave E: RWKV family, refact, PLM, wavtokenizer
# ---------------------------------------------------------------------------


def test_convert_rwkv6(tmp_path):
    E6, HS, NFF = 64, 8, 224
    cfg = dict(architectures=["Rwkv6ForCausalLM"], model_type="rwkv6",
               vocab_size=128,
               hidden_size=E6, num_hidden_layers=NL, head_size=HS,
               layer_norm_epsilon=1e-5, rescale_every=2,
               intermediate_size=None)
    nh = E6 // HS
    t = {"rwkv.embeddings.weight": (128, E6),
         "rwkv.blocks.0.pre_ln.weight": (E6,),
         "rwkv.blocks.0.pre_ln.bias": (E6,),
         "rwkv.ln_out.weight": (E6,), "rwkv.ln_out.bias": (E6,),
         "head.weight": (128, E6)}
    for i in range(NL):
        p = f"rwkv.blocks.{i}"
        t.update({f"{p}.ln1.weight": (E6,), f"{p}.ln1.bias": (E6,),
                  f"{p}.ln2.weight": (E6,), f"{p}.ln2.bias": (E6,)})
        for x in "xwkvrg":
            t[f"{p}.attention.time_maa_{x}"] = (1, 1, E6)
        t.update({f"{p}.attention.time_maa_w1": (E6, 5 * 32),
                  f"{p}.attention.time_maa_w2": (5, 32, E6),
                  f"{p}.attention.time_decay": (1, 1, E6),
                  f"{p}.attention.time_decay_w1": (E6, 64),
                  f"{p}.attention.time_decay_w2": (64, E6),
                  f"{p}.attention.time_faaaa": (nh, HS),
                  f"{p}.attention.receptance.weight": (E6, E6),
                  f"{p}.attention.key.weight": (E6, E6),
                  f"{p}.attention.value.weight": (E6, E6),
                  f"{p}.attention.gate.weight": (E6, E6),
                  f"{p}.attention.output.weight": (E6, E6),
                  f"{p}.attention.ln_x.weight": (E6,),
                  f"{p}.attention.ln_x.bias": (E6,),
                  f"{p}.feed_forward.time_maa_k": (1, 1, E6),
                  f"{p}.feed_forward.time_maa_r": (1, 1, E6),
                  f"{p}.feed_forward.key.weight": (NFF, E6),
                  f"{p}.feed_forward.receptance.weight": (E6, E6),
                  f"{p}.feed_forward.value.weight": (E6, NFF)})
    d = _craft(tmp_path, "rwkv6m", cfg, t)
    compare_with_reference(d, tmp_path, convert)


def test_convert_rwkv6qwen2(tmp_path):
    E6, HS = 64, 8
    cfg = dict(architectures=["RWKV6Qwen2ForCausalLM"], vocab_size=128,
               hidden_size=E6, num_hidden_layers=NL, num_attention_heads=8,
               num_key_value_heads=2, rms_norm_eps=1e-6,
               intermediate_size=96)
    t = {"model.embed_tokens.weight": (128, E6),
         "model.norm.weight": (E6,), "lm_head.weight": (128, E6)}
    for i in range(NL):
        p = f"model.layers.{i}"
        t[f"{p}.input_layernorm.weight"] = (E6,)
        for x in "xwkvrg":
            t[f"{p}.self_attn.time_maa_{x}"] = (1, 1, E6)
        t.update({f"{p}.self_attn.time_maa_w1": (E6, 5 * 32),
                  f"{p}.self_attn.time_maa_w2": (5, 32, E6),
                  f"{p}.self_attn.time_decay": (1, 1, E6),
                  f"{p}.self_attn.time_decay_w1": (E6, 64),
                  f"{p}.self_attn.time_decay_w2": (64, E6),
                  f"{p}.self_attn.q_proj.weight": (E6, E6),
                  f"{p}.self_attn.k_proj.weight": (2 * HS, E6),
                  f"{p}.self_attn.v_proj.weight": (2 * HS, E6),
                  f"{p}.self_attn.gate.weight": (E6, E6),
                  f"{p}.self_attn.o_proj.weight": (E6, E6),
                  f"{p}.post_attention_layernorm.weight": (E6,),
                  f"{p}.mlp.gate_proj.weight": (96, E6),
                  f"{p}.mlp.up_proj.weight": (96, E6),
                  f"{p}.mlp.down_proj.weight": (E6, 96)})
    d = _craft(tmp_path, "rwkv6q2", cfg, t)
    compare_with_reference(d, tmp_path, convert)


def _rwkv7_layer(E7, HS, NFF, p, with_dummy_v=True):
    nh = E7 // HS
    t = {f"{p}.ln1.weight": (E7,), f"{p}.ln1.bias": (E7,),
         f"{p}.ln2.weight": (E7,), f"{p}.ln2.bias": (E7,)}
    for x in "rwkvag":
        t[f"{p}.attention.x_{x}"] = (1, 1, E7)
    t.update({f"{p}.attention.w0": (1, 1, E7),
              f"{p}.attention.w1": (E7, 32),
              f"{p}.attention.w2": (32, E7),
              f"{p}.attention.a0": (1, 1, E7),
              f"{p}.attention.a1": (E7, 32),
              f"{p}.attention.a2": (32, E7),
              f"{p}.attention.g1": (E7, 32),
              f"{p}.attention.g2": (32, E7),
              f"{p}.attention.k_k": (1, 1, E7),
              f"{p}.attention.k_a": (1, 1, E7),
              f"{p}.attention.r_k": (nh, HS),
              f"{p}.attention.receptance.weight": (E7, E7),
              f"{p}.attention.key.weight": (E7, E7),
              f"{p}.attention.value.weight": (E7, E7),
              f"{p}.attention.output.weight": (E7, E7),
              f"{p}.attention.ln_x.weight": (E7,),
              f"{p}.attention.ln_x.bias": (E7,),
              f"{p}.feed_forward.x_k": (1, 1, E7),
              f"{p}.feed_forward.key.weight": (NFF, E7),
              f"{p}.feed_forward.value.weight": (E7, NFF)})
    if with_dummy_v:
        t.update({f"{p}.attention.v0": (1, 1, E7),
                  f"{p}.attention.v1": (E7, 32),
                  f"{p}.attention.v2": (32, E7)})
    return t


def test_convert_rwkv7(tmp_path):
    E7, HS, NFF = 64, 8, 256
    cfg = dict(architectures=["Rwkv7ForCausalLM"], vocab_size=128,
               hidden_size=E7, num_hidden_layers=NL, head_size=HS,
               layer_norm_epsilon=1e-5, intermediate_size=NFF,
               lora_rank_decay=None, lora_rank_iclr=None,
               lora_rank_value_residual_mix=None, lora_rank_gate=None)
    t = {"model.embeddings.weight": (128, E7),
         "model.layers.0.pre_norm.weight": (E7,),
         "model.layers.0.pre_norm.bias": (E7,),
         "model.ln_out.weight": (E7,), "model.ln_out.bias": (E7,),
         "lm_head.weight": (128, E7)}
    for i in range(NL):
        # layer 0 ships dummy v0/v1/v2 that the converter must drop and
        # re-synthesize from a0/a1/a2
        t.update(_rwkv7_layer(E7, HS, NFF, f"model.layers.{i}",
                              with_dummy_v=True))
    d = _craft(tmp_path, "rwkv7m", cfg, t)
    compare_with_reference(d, tmp_path, convert)


def test_convert_arwkv7(tmp_path):
    E7, HS, NFF = 64, 8, 96
    cfg = dict(architectures=["RwkvHybridForCausalLM"], vocab_size=128,
               hidden_size=E7, num_hidden_layers=NL, head_size=HS,
               rms_norm_eps=1e-6, intermediate_size=NFF, wkv_has_gate=True,
               wkv_version=7, num_attention_heads=8)
    t = {"model.embed_tokens.weight": (128, E7),
         "model.norm.weight": (E7,), "lm_head.weight": (128, E7)}
    for i in range(NL):
        p = f"model.layers.{i}"
        inner = _rwkv7_layer(E7, HS, NFF, p, with_dummy_v=(i == 0))
        # hybrid shell: time mixer nests under self_attn.time_mixer, qwen2
        # MLP + RMS norms replace the rwkv channel mix
        for k, v in list(inner.items()):
            if ".ln1." in k or ".ln2." in k or ".feed_forward." in k:
                continue
            t[k.replace(".attention.", ".self_attn.time_mixer.")] = v
        t.update({f"{p}.input_layernorm.weight": (E7,),
                  f"{p}.post_attention_layernorm.weight": (E7,),
                  f"{p}.mlp.gate_proj.weight": (NFF, E7),
                  f"{p}.mlp.up_proj.weight": (NFF, E7),
                  f"{p}.mlp.down_proj.weight": (E7, NFF)})
    d = _craft(tmp_path, "arwkv7m", cfg, t)
    compare_with_reference(d, tmp_path, convert)


def test_convert_refact(tmp_path):
    E8, NH8 = 64, 4
    hd = E8 // NH8
    ff = 256  # 256-rounded 2/3 swiglu of 4*64
    cfg = dict(architectures=["GPTRefactForCausalLM"], vocab_size=128,
               n_embd=E8, n_layer=NL, n_head=NH8, n_positions=2048,
               layer_norm_epsilon=1e-5)
    t = {"transformer.wte.weight": (128, E8),
         "transformer.ln_f.weight": (E8,), "lm_head.weight": (128, E8)}
    for i in range(NL):
        p = f"transformer.h.{i}"
        t.update({f"{p}.ln_1.weight": (E8,), f"{p}.ln_2.weight": (E8,),
                  f"{p}.attn.q.weight": (E8, E8),
                  f"{p}.attn.kv.weight": (2 * hd, E8),
                  f"{p}.attn.c_proj.weight": (E8, E8),
                  f"{p}.mlp.gate_up_proj.weight": (2 * ff, E8),
                  f"{p}.mlp.c_proj.weight": (E8, ff)})
    d = _craft(tmp_path, "refactm", cfg, t)
    compare_with_reference(d, tmp_path, convert)


def test_convert_plm(tmp_path):
    E9, NH9 = 64, 4
    kv_lora, qk_nope, qk_rope, v_hd = 32, 16, 8, 16
    cfg = dict(architectures=["PLMForCausalLM"], vocab_size=128,
               hidden_size=E9, num_hidden_layers=NL, num_attention_heads=NH9,
               num_key_value_heads=1, kv_lora_rank=kv_lora,
               qk_nope_head_dim=qk_nope, qk_rope_head_dim=qk_rope,
               v_head_dim=v_hd, intermediate_size=96,
               max_position_embeddings=2048, rms_norm_eps=1e-6,
               rope_theta=10000.0)
    t = {"model.embed_tokens.weight": (128, E9),
         "model.norm.weight": (E9,), "lm_head.weight": (128, E9)}
    for i in range(NL):
        p = f"model.layers.{i}"
        t.update({f"{p}.input_layernorm.weight": (E9,),
                  f"{p}.self_attn.q_proj.weight":
                      (NH9 * (qk_nope + qk_rope), E9),
                  f"{p}.self_attn.kv_a_proj_with_mqa.weight":
                      (kv_lora + qk_rope, E9),
                  f"{p}.self_attn.kv_a_layernorm.weight": (kv_lora,),
                  f"{p}.self_attn.kv_b_proj.weight":
                      (NH9 * (qk_nope + v_hd), kv_lora),
                  f"{p}.self_attn.o_proj.weight": (E9, NH9 * v_hd),
                  f"{p}.post_attention_layernorm.weight": (E9,),
                  f"{p}.mlp.up_proj.weight": (96, E9),
                  f"{p}.mlp.down_proj.weight": (E9, 96)})
    d = _craft(tmp_path, "plmm", cfg, t)
    compare_with_reference(d, tmp_path, convert)


def test_convert_wavtokenizer(tmp_path):
    cfg = dict(architectures=["WavTokenizerDec"], vocab_size=64,
               n_embd=32, n_ff=48, n_embd_features=16,
               group_norm_epsilon=1e-6, group_norm_groups=4, n_layer=2,
               posnet={"n_embd": 24, "n_layer": 2},
               convnext={"n_embd": 32, "n_layer": 2})
    t = {"token_embd.weight": (64, 16),
         "backbone.embed.weight": (32, 16, 7), "backbone.embed.bias": (32,),
         "backbone.norm.weight": (32,), "backbone.norm.bias": (32,),
         "backbone.final_layer_norm.weight": (32,),
         "backbone.final_layer_norm.bias": (32,),
         "head.out.weight": (18, 32), "head.out.bias": (18,)}
    # posnet block 0: resnet conv pair; block 1: attention block
    t.update({"backbone.posnet.0.conv1.weight": (24, 24, 3),
              "backbone.posnet.0.conv1.bias": (24,),
              "backbone.posnet.0.conv2.weight": (24, 24, 3),
              "backbone.posnet.0.conv2.bias": (24,),
              "backbone.posnet.0.norm1.weight": (24,),
              "backbone.posnet.0.norm1.bias": (24,),
              "backbone.posnet.0.norm2.weight": (24,),
              "backbone.posnet.0.norm2.bias": (24,),
              "backbone.posnet.1.norm.weight": (24,),
              "backbone.posnet.1.norm.bias": (24,),
              "backbone.posnet.1.q.weight": (24, 24, 1),
              "backbone.posnet.1.q.bias": (24,),
              "backbone.posnet.1.k.weight": (24, 24, 1),
              "backbone.posnet.1.k.bias": (24,),
              "backbone.posnet.1.v.weight": (24, 24, 1),
              "backbone.posnet.1.v.bias": (24,),
              "backbone.posnet.1.proj_out.weight": (24, 24, 1),
              "backbone.posnet.1.proj_out.bias": (24,)})
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
    d = _craft(tmp_path, "wavtok", cfg, t)
    compare_with_reference(d, tmp_path, convert)


def test_convert_rwkv_roundtrip(tmp_path):
    """Converted rwkv6/rwkv7 GGUFs load and run in our engine."""
    import jax.numpy as jnp

    from llamacog_tpu.models.loader import load_model
    from llamacog_tpu.runtime.engine import Engine

    E6, HS, NFF = 64, 8, 224
    cfg = dict(architectures=["Rwkv6ForCausalLM"], model_type="rwkv6",
               vocab_size=128, hidden_size=E6, num_hidden_layers=NL,
               head_size=HS, layer_norm_epsilon=1e-5, rescale_every=2,
               intermediate_size=None)
    t = {"rwkv.embeddings.weight": (128, E6),
         "rwkv.blocks.0.pre_ln.weight": (E6,),
         "rwkv.blocks.0.pre_ln.bias": (E6,),
         "rwkv.ln_out.weight": (E6,), "rwkv.ln_out.bias": (E6,),
         "head.weight": (128, E6)}
    for i in range(NL):
        p = f"rwkv.blocks.{i}"
        t.update({f"{p}.ln1.weight": (E6,), f"{p}.ln1.bias": (E6,),
                  f"{p}.ln2.weight": (E6,), f"{p}.ln2.bias": (E6,)})
        for x in "xwkvrg":
            t[f"{p}.attention.time_maa_{x}"] = (1, 1, E6)
        t.update({f"{p}.attention.time_maa_w1": (E6, 5 * 32),
                  f"{p}.attention.time_maa_w2": (5, 32, E6),
                  f"{p}.attention.time_decay": (1, 1, E6),
                  f"{p}.attention.time_decay_w1": (E6, 64),
                  f"{p}.attention.time_decay_w2": (64, E6),
                  f"{p}.attention.time_faaaa": (E6 // HS, HS),
                  f"{p}.attention.receptance.weight": (E6, E6),
                  f"{p}.attention.key.weight": (E6, E6),
                  f"{p}.attention.value.weight": (E6, E6),
                  f"{p}.attention.gate.weight": (E6, E6),
                  f"{p}.attention.output.weight": (E6, E6),
                  f"{p}.attention.ln_x.weight": (E6,),
                  f"{p}.attention.ln_x.bias": (E6,),
                  f"{p}.feed_forward.time_maa_k": (1, 1, E6),
                  f"{p}.feed_forward.time_maa_r": (1, 1, E6),
                  f"{p}.feed_forward.key.weight": (NFF, E6),
                  f"{p}.feed_forward.receptance.weight": (E6, E6),
                  f"{p}.feed_forward.value.weight": (E6, NFF)})
    d6 = _craft(tmp_path, "rt6", cfg, t)
    out6 = str(tmp_path / "rt6.gguf")
    convert(d6, out6, outtype="f32")

    cfg7 = dict(architectures=["Rwkv7ForCausalLM"], vocab_size=128,
                hidden_size=64, num_hidden_layers=NL, head_size=8,
                layer_norm_epsilon=1e-5, intermediate_size=256,
                lora_rank_decay=None, lora_rank_iclr=None,
                lora_rank_value_residual_mix=None, lora_rank_gate=None)
    t7 = {"model.embeddings.weight": (128, 64),
          "model.layers.0.pre_norm.weight": (64,),
          "model.layers.0.pre_norm.bias": (64,),
          "model.ln_out.weight": (64,), "model.ln_out.bias": (64,),
          "lm_head.weight": (128, 64)}
    for i in range(NL):
        t7.update(_rwkv7_layer(64, 8, 256, f"model.layers.{i}"))
    d7 = _craft(tmp_path, "rt7", cfg7, t7)
    out7 = str(tmp_path / "rt7.gguf")
    convert(d7, out7, outtype="f32")

    for path in (out6, out7):
        m = load_model(path, with_tokenizer=False, dtype=jnp.float32)
        eng = Engine(m.params, m.config, batch_size=1, max_seq=32,
                     dtype=jnp.float32)
        logits = eng.prefill_logits([3, 17, 9, 41])
        assert np.isfinite(np.asarray(logits)).all()


# ---------------------------------------------------------------------------
# wave F: encoder BERTs
# ---------------------------------------------------------------------------


def test_convert_jina_bert_v2(tmp_path):
    EB, FB = 64, 96
    cfg = dict(architectures=["JinaBertForMaskedLM"], model_type="bert",
               vocab_size=128, hidden_size=EB, intermediate_size=FB,
               num_hidden_layers=NL, num_attention_heads=NH,
               max_position_embeddings=512, layer_norm_eps=1e-12)
    t = {"embeddings.word_embeddings.weight": (128, EB),
         "embeddings.LayerNorm.weight": (EB,),
         "embeddings.LayerNorm.bias": (EB,),
         "embeddings.token_type_embeddings.weight": (2, EB)}
    for i in range(NL):
        p = f"encoder.layer.{i}"
        t.update({f"{p}.attention.self.query.weight": (EB, EB),
                  f"{p}.attention.self.query.bias": (EB,),
                  f"{p}.attention.self.key.weight": (EB, EB),
                  f"{p}.attention.self.key.bias": (EB,),
                  f"{p}.attention.self.value.weight": (EB, EB),
                  f"{p}.attention.self.value.bias": (EB,),
                  f"{p}.attention.output.dense.weight": (EB, EB),
                  f"{p}.attention.output.dense.bias": (EB,),
                  f"{p}.attention.output.LayerNorm.weight": (EB,),
                  f"{p}.attention.output.LayerNorm.bias": (EB,),
                  f"{p}.mlp.gated_layers.weight": (2 * FB, EB),
                  f"{p}.mlp.wo.weight": (EB, FB),
                  f"{p}.mlp.wo.bias": (EB,),
                  f"{p}.mlp.layernorm.weight": (EB,),
                  f"{p}.mlp.layernorm.bias": (EB,)})
    d = _craft(tmp_path, "jinav2", cfg, t)
    (pathlib.Path(d) / "tokenizer_config.json").write_text(
        json.dumps({"tokenizer_class": "BertTokenizer"}))
    compare_with_reference(d, tmp_path, convert)


def test_convert_nomic_bert(tmp_path):
    EB, FB = 64, 96
    cfg = dict(architectures=["NomicBertModel"], model_type="nomic_bert",
               vocab_size=128, n_embd=EB, n_inner=FB, n_layer=NL,
               n_head=NH, n_positions=8192, max_trained_positions=2048,
               layer_norm_epsilon=1e-12, rotary_emb_base=1000.0,
               activation_function="swiglu", causal=False,
               qkv_proj_bias=False, mlp_fc1_bias=False, mlp_fc2_bias=False,
               prenorm=False, rotary_emb_fraction=1.0,
               rotary_emb_interleaved=False, rotary_emb_scale_base=None)
    t = {"embeddings.word_embeddings.weight": (128, EB),
         "embeddings.token_type_embeddings.weight": (2, EB),
         "emb_ln.weight": (EB,), "emb_ln.bias": (EB,)}
    for i in range(NL):
        p = f"encoder.layers.{i}"
        t.update({f"{p}.attn.Wqkv.weight": (3 * EB, EB),
                  f"{p}.attn.out_proj.weight": (EB, EB),
                  f"{p}.norm1.weight": (EB,), f"{p}.norm1.bias": (EB,),
                  f"{p}.norm2.weight": (EB,), f"{p}.norm2.bias": (EB,),
                  f"{p}.mlp.fc11.weight": (FB, EB),
                  f"{p}.mlp.fc12.weight": (FB, EB),
                  f"{p}.mlp.fc2.weight": (EB, FB)})
    d = _craft(tmp_path, "nomicb", cfg, t)
    (pathlib.Path(d) / "tokenizer.json").write_text(json.dumps(
        {"model": {"type": "WordPiece", "vocab": {}}, "added_tokens": []}))
    (pathlib.Path(d) / "tokenizer_config.json").write_text(
        json.dumps({"tokenizer_class": "BertTokenizer"}))
    compare_with_reference(d, tmp_path, convert)


def test_convert_nomic_bert_moe(tmp_path):
    EB, FB, NE = 64, 96, 4
    cfg = dict(architectures=["NomicBertModel"], model_type="nomic_bert",
               vocab_size=128, n_embd=EB, n_inner=FB, n_layer=NL,
               n_head=NH, n_positions=2048, max_trained_positions=2048,
               layer_norm_epsilon=1e-12, rotary_emb_base=1000.0,
               activation_function="gelu", causal=False,
               moe_every_n_layers=2, num_experts=NE, moe_top_k=2,
               qkv_proj_bias=True, mlp_fc1_bias=True, mlp_fc2_bias=True,
               prenorm=False, rotary_emb_fraction=1.0,
               rotary_emb_interleaved=False, rotary_emb_scale_base=None)
    t = {"embeddings.word_embeddings.weight": (128, EB),
         "embeddings.token_type_embeddings.weight": (2, EB),
         "emb_ln.weight": (EB,), "emb_ln.bias": (EB,)}
    for i in range(NL):
        p = f"encoder.layers.{i}"
        t.update({f"{p}.attn.Wqkv.weight": (3 * EB, EB),
                  f"{p}.attn.Wqkv.bias": (3 * EB,),
                  f"{p}.attn.out_proj.weight": (EB, EB),
                  f"{p}.attn.out_proj.bias": (EB,),
                  f"{p}.norm1.weight": (EB,), f"{p}.norm1.bias": (EB,),
                  f"{p}.norm2.weight": (EB,), f"{p}.norm2.bias": (EB,)})
        if i % 2 == 1:  # moe layer
            t.update({f"{p}.mlp.router.layer.weight": (NE, EB),
                      f"{p}.mlp.experts.mlp.w1": (NE * FB, EB),
                      f"{p}.mlp.experts.mlp.w2": (NE * FB, EB),
                      f"{p}.mlp.experts.bias": (NE,)})
        else:
            t.update({f"{p}.mlp.fc1.weight": (FB, EB),
                      f"{p}.mlp.fc1.bias": (FB,),
                      f"{p}.mlp.fc2.weight": (EB, FB),
                      f"{p}.mlp.fc2.bias": (EB,)})
    d = _craft(tmp_path, "nomicmoe", cfg, t)
    (pathlib.Path(d) / "tokenizer.json").write_text(json.dumps(
        {"model": {"type": "WordPiece", "vocab": {}}, "added_tokens": []}))
    (pathlib.Path(d) / "tokenizer_config.json").write_text(
        json.dumps({"tokenizer_class": "BertTokenizer"}))
    compare_with_reference(d, tmp_path, convert)


def test_convert_neo_bert(tmp_path):
    EB, FB = 64, 96
    cfg = dict(architectures=["NeoBERT"], model_type="neobert",
               vocab_size=128,
               hidden_size=EB, intermediate_size=FB, num_hidden_layers=NL,
               num_attention_heads=NH, max_length=1024, norm_eps=1e-6)
    t = {"model.encoder.weight": (128, EB),
         "model.layer_norm.weight": (EB,)}
    for i in range(NL):
        p = f"model.transformer_encoder.{i}"
        t.update({f"{p}.attention_norm.weight": (EB,),
                  f"{p}.qkv.weight": (3 * EB, EB),
                  f"{p}.wo.weight": (EB, EB),
                  f"{p}.ffn_norm.weight": (EB,),
                  f"{p}.ffn.w12.weight": (2 * (2 * FB // 3), EB),
                  f"{p}.ffn.w3.weight": (EB, 2 * FB // 3)})
    d = _craft(tmp_path, "neob", cfg, t)
    compare_with_reference(d, tmp_path, convert)


def test_convert_deci_linear_attn(tmp_path):
    # layer 0 normal attention, layer 1 attention replaced with a linear
    # layer (replace_with_linear: linear_attn -> attn_output)
    blocks = [
        {"attention": {"n_heads_in_group": 2, "replace_with_linear": False},
         "ffn": {"ffn_mult": 1.0}},
        {"attention": {"n_heads_in_group": None, "replace_with_linear": True},
         "ffn": {"ffn_mult": 1.0}},
    ]
    ffn_dim = 256
    cfg = dict(architectures=["DeciLMForCausalLM"], vocab_size=128,
               hidden_size=E, num_hidden_layers=NL,
               num_attention_heads=NH, block_configs=blocks,
               max_position_embeddings=2048, rms_norm_eps=1e-5,
               rope_theta=10000.0)
    hd = E // NH
    t = {"model.embed_tokens.weight": (128, E), "model.norm.weight": (E,),
         "lm_head.weight": (128, E)}
    p = "model.layers.0"
    t.update({f"{p}.self_attn.q_proj.weight": (NH * hd, E),
              f"{p}.self_attn.k_proj.weight": (2 * hd, E),
              f"{p}.self_attn.v_proj.weight": (2 * hd, E),
              f"{p}.self_attn.o_proj.weight": (E, NH * hd),
              f"{p}.input_layernorm.weight": (E,),
              f"{p}.post_attention_layernorm.weight": (E,),
              f"{p}.mlp.gate_proj.weight": (ffn_dim, E),
              f"{p}.mlp.up_proj.weight": (ffn_dim, E),
              f"{p}.mlp.down_proj.weight": (E, ffn_dim)})
    p = "model.layers.1"
    t.update({f"{p}.self_attn.linear_attn.weight": (E, E),
              f"{p}.input_layernorm.weight": (E,),
              f"{p}.post_attention_layernorm.weight": (E,),
              f"{p}.mlp.gate_proj.weight": (ffn_dim, E),
              f"{p}.mlp.up_proj.weight": (ffn_dim, E),
              f"{p}.mlp.down_proj.weight": (E, ffn_dim)})
    d = _craft(tmp_path, "deci_lin", cfg, t)
    compare_with_reference(d, tmp_path, convert)
