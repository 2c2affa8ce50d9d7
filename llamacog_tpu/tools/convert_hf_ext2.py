"""HF->GGUF converters, wave D: long-tail decoder arches.

Converter roles of the reference classes DeciModel, ExaoneModel,
ChatGLMModel, QwenModel, CodeShellModel, GrokModel, MiniCPM3Model,
PhiMoeModel, BailingMoeModel, Dots1Model, ChameleonModel, BitnetModel,
ArcticModel, OpenELMModel, DeepseekModel, JaisModel, PlamoModel
(reference convert_hf_to_gguf.py; tensor names from
gguf-py/gguf/tensor_mapping.py). Output is oracle-diffed against the
reference converter in tests/test_convert_oracle_rc.py.
"""

from __future__ import annotations

import numpy as np

from .convert_hf_ext import (
    _llama_layer_rows,
    _llama_permute,
    _rope_scaling_meta,
    _std_model_rows,
)


def _text_meta(cfg, *, kv_optional=True):
    """The reference TextModel.set_gguf_parameters key set
    (convert_hf_to_gguf.py:519-562), as (key, value) pairs."""
    meta = [("block_count",
             next(cfg[k] for k in ("num_hidden_layers", "n_layer", "n_layers",
                                   "num_layers") if k in cfg))]
    for key, chain in (
        ("context_length", ("max_position_embeddings", "n_ctx", "n_positions",
                            "max_length")),
        ("embedding_length", ("hidden_size", "n_embd", "dim")),
        ("feed_forward_length", ("intermediate_size", "n_inner", "hidden_dim")),
        ("attention.head_count", ("num_attention_heads", "n_head", "n_heads")),
    ):
        v = next((cfg[k] for k in chain if cfg.get(k) is not None), None)
        if v is not None:
            meta.append((key, v))
    if cfg.get("num_key_value_heads") is not None:
        meta.append(("attention.head_count_kv", cfg["num_key_value_heads"]))
    if cfg.get("rope_theta") is not None:
        meta.append(("rope.freq_base", cfg["rope_theta"]))
    if cfg.get("rms_norm_eps") is not None:
        meta.append(("attention.layer_norm_rms_epsilon", cfg["rms_norm_eps"]))
    ln = next((cfg[k] for k in ("layer_norm_eps", "layer_norm_epsilon",
                                "norm_epsilon") if cfg.get(k) is not None), None)
    if ln is not None:
        meta.append(("attention.layer_norm_epsilon", ln))
    if cfg.get("num_local_experts") is not None:
        meta.append(("expert_count", cfg["num_local_experts"]))
    if cfg.get("num_experts_per_tok") is not None:
        meta.append(("expert_used_count", cfg["num_experts_per_tok"]))
    if cfg.get("head_dim") is not None:
        meta.append(("attention.key_length", cfg["head_dim"]))
        meta.append(("attention.value_length", cfg["head_dim"]))
    return meta


def _head_dim(cfg):
    return cfg.get("head_dim") or (cfg["hidden_size"]
                                   // cfg["num_attention_heads"])


def _stack_experts(sd, pre, n_exp, fmt):
    """Stack per-expert tensors named fmt.format(e) into one [E,...] array."""
    return np.stack([np.asarray(sd[fmt.format(e)], np.float32)
                     for e in range(n_exp)])


# ---------------------------------------------------------------------------
# DeciLM (variable-GQA llama; reference DeciModel)
# ---------------------------------------------------------------------------


def _convert_deci(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table

    n_layer = cfg["num_hidden_layers"]
    n_head = cfg["num_attention_heads"]
    hd = _head_dim(cfg)
    if "block_configs" in cfg:  # Llama-3_1-Nemotron-51B style
        def ffn_mult_to_size(mult):
            # DeciModel._ffn_mult_to_intermediate_size (find_multiple 256)
            size = int(2 * mult * cfg["hidden_size"] / 3)
            return size if size % 256 == 0 else size + 256 - size % 256

        kv_heads, q_heads, ffn_dims = [], [], []
        for bc in cfg["block_configs"]:
            a = bc["attention"]
            if a["n_heads_in_group"] is None:
                kv_heads.append(0)
                q_heads.append(n_head if a.get("replace_with_linear") else 0)
            else:
                kv_heads.append(n_head // a["n_heads_in_group"])
                q_heads.append(n_head)
            fm = bc["ffn"]["ffn_mult"]
            ffn_dims.append(0 if fm is None else ffn_mult_to_size(fm))
        meta = [
            ("attention.head_count_kv", kv_heads),
            ("attention.head_count", q_heads),
            ("feed_forward_length", ffn_dims),
            ("block_count", n_layer),
            ("context_length", cfg["max_position_embeddings"]),
            ("embedding_length", cfg["hidden_size"]),
            ("attention.layer_norm_rms_epsilon", cfg["rms_norm_eps"]),
            ("attention.key_length", hd),
            ("attention.value_length", hd),
        ]
        if cfg.get("rope_theta") is not None:
            meta.insert(0, ("rope.freq_base", cfg["rope_theta"]))

        def kv_of(il):
            return kv_heads[il] or None
    else:  # DeciLM-7B style
        meta = _text_meta(cfg)
        per_layer = cfg.get("num_key_value_heads_per_layer")
        if per_layer is not None:
            meta.append(("attention.head_count_kv", per_layer))

        def kv_of(il):
            if per_layer is not None:
                return per_layer[il]
            return cfg.get("num_key_value_heads")
    meta += [("rope.dimension_count", hd)] + _rope_scaling_meta(cfg)

    def permuted(put, il, pre):
        rs = cfg.get("rope_scaling") or {}
        if il == 0 and (rs.get("rope_type", "") or "").lower() == "llama3":
            put("rope_freqs.weight", _llama3_rope_factors(cfg))
        n_kv = kv_of(il)
        for hf, g, heads in (("q_proj", "attn_q", n_head), ("k_proj", "attn_k", n_kv)):
            for suff in ("weight", "bias"):
                key = f"{pre}.self_attn.{hf}.{suff}"
                if key in sd:
                    put(f"blk.{il}.{g}.{suff}",
                        _llama_permute(np.asarray(sd[key], np.float32),
                                       n_head, heads))
        # attention-free blocks replaced with a linear layer map it onto
        # attn_output (tensor_mapping.py 'self_attn.linear_attn'  # deci)
        lin = f"{pre}.self_attn.linear_attn.weight"
        if lin in sd:
            put(f"blk.{il}.attn_output.weight", np.asarray(sd[lin], np.float32))

    rows = [r for r in _llama_layer_rows()
            if not r[0].startswith(("self_attn.q_proj", "self_attn.k_proj"))]
    return _convert_table(d, cfg, sd, out_path, outtype, progress, "deci",
                          dict(meta), _std_model_rows(), "model.layers", rows,
                          n_layer, layer_hook=permuted)


# ---------------------------------------------------------------------------
# Exaone (reference ExaoneModel)
# ---------------------------------------------------------------------------


def _convert_exaone(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table, _wb

    n_layer = cfg["num_layers"]
    n_head = cfg["num_attention_heads"]
    n_embd = cfg["hidden_size"]
    meta = [
        ("embedding_length", n_embd),
        ("attention.head_count", n_head),
        ("attention.head_count_kv", cfg.get("num_key_value_heads", n_head)),
        ("context_length", cfg["max_position_embeddings"]),
        ("attention.layer_norm_rms_epsilon", cfg["layer_norm_epsilon"]),
        ("feed_forward_length", cfg.get("intermediate_size", 4 * n_embd)),
        ("block_count", n_layer),
    ]
    if cfg.get("rope_theta") is not None:
        meta.append(("rope.freq_base", cfg["rope_theta"]))
    rot = next((cfg[k] for k in ("partial_rotary_factor", "rope_pct")
                if cfg.get(k) is not None), 1.0)
    meta.append(("rope.dimension_count", int(rot * (n_embd // n_head))))
    meta += _rope_scaling_meta(cfg)
    rows = (_wb("ln_1", "attn_norm") + _wb("ln_2", "ffn_norm")
            + _wb("attn.attention.q_proj", "attn_q")
            + _wb("attn.attention.k_proj", "attn_k")
            + _wb("attn.attention.v_proj", "attn_v")
            + _wb("attn.attention.out_proj", "attn_output")
            + _wb("mlp.c_fc_0", "ffn_gate") + _wb("mlp.c_fc_1", "ffn_up")
            + _wb("mlp.c_proj", "ffn_down"))
    model = [("transformer.wte.weight", "token_embd.weight", None),
             ("transformer.ln_f.weight", "output_norm.weight", None),
             ("transformer.ln_f.bias", "output_norm.bias", None),
             ("lm_head.weight", "output.weight", None)]

    def extras(put, il, pre):
        rs = cfg.get("rope_scaling") or {}
        if il == 0 and (rs.get("rope_type", "") or "").lower() == "llama3":
            put("rope_freqs.weight", _llama3_rope_factors(cfg))

    return _convert_table(d, cfg, sd, out_path, outtype, progress, "exaone",
                          dict(meta), model, "transformer.h", rows, n_layer,
                          layer_hook=extras)


def _llama3_rope_factors(cfg) -> np.ndarray:
    """Per-dim llama-3.1 rope smoothing factors (reference
    generate_extra_tensors, shared by Llama/Deci/Exaone classes)."""
    hd = _head_dim(cfg)
    rs = cfg.get("rope_scaling") or {}
    base = cfg.get("rope_theta", 10000.0)
    freqs = 1.0 / base ** (np.arange(0, hd, 2, dtype=np.float32) / hd)
    factor = rs.get("factor", 8.0)
    lo_f, hi_f = rs.get("low_freq_factor", 1.0), rs.get("high_freq_factor", 4.0)
    old_ctx = cfg.get("original_max_position_embeddings", 8192)
    wavelen = 2 * np.pi / freqs
    smooth = (old_ctx / wavelen - lo_f) / (hi_f - lo_f)
    return np.where(wavelen < old_ctx / hi_f, 1.0,
                    np.where(wavelen > old_ctx / lo_f, factor,
                             1.0 / ((1.0 - smooth) / factor + smooth))
                    ).astype(np.float32)


# ---------------------------------------------------------------------------
# ChatGLM (THUDM checkpoints: transformer.encoder.* names, fused QKV kept)
# ---------------------------------------------------------------------------


def _convert_chatglm(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table, _wb

    n_embd = cfg.get("hidden_size", cfg.get("n_embed"))
    n_head = cfg.get("n_head", cfg.get("num_attention_heads"))
    n_layer = cfg.get("num_layers", cfg.get("num_hidden_layers"))
    meta = [
        ("context_length", cfg.get("seq_length", n_embd)),
        ("embedding_length", n_embd),
        ("feed_forward_length",
         cfg.get("ffn_hidden_size", cfg.get("intermediate_size", 4 * n_embd))),
        ("block_count", n_layer),
        ("attention.head_count", n_head),
        ("attention.head_count_kv",
         cfg.get("multi_query_group_num", cfg.get("num_key_value_heads", n_head))),
        ("attention.layer_norm_rms_epsilon", cfg.get("layernorm_epsilon", 1e-5)),
        ("rope.dimension_count",
         int(cfg.get("attention_dim", n_embd // n_head)
             * cfg.get("partial_rotary_factor", 0.5))),
        ("rope.freq_base", 10000.0 * cfg.get("rope_ratio", 1.0)),
    ]
    rows = (_wb("input_layernorm", "attn_norm")
            + _wb("self_attention.query_key_value", "attn_qkv")
            + _wb("self_attention.dense", "attn_output")
            + _wb("post_attention_layernorm", "ffn_norm")
            + _wb("mlp.dense_h_to_4h", "ffn_up")
            + _wb("mlp.dense_4h_to_h", "ffn_down"))
    model = [("transformer.embedding.word_embeddings.weight",
              "token_embd.weight", None),
             ("transformer.encoder.final_layernorm.weight",
              "output_norm.weight", None),
             ("transformer.output_layer.weight", "output.weight", None)]
    return _convert_table(d, cfg, sd, out_path, outtype, progress, "chatglm",
                          dict(meta), model, "transformer.encoder.layers",
                          rows, n_layer)


# ---------------------------------------------------------------------------
# Qwen v1 (reference QwenModel: fused c_attn kept, w1=up / w2=gate)
# ---------------------------------------------------------------------------


def _convert_qwen(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table, _wb

    n_layer = cfg["num_hidden_layers"]
    meta = [
        ("context_length", cfg["max_position_embeddings"]),
        ("block_count", n_layer),
        ("embedding_length", cfg["hidden_size"]),
        ("feed_forward_length", cfg["intermediate_size"]),
        ("rope.freq_base", cfg["rotary_emb_base"]),
        ("rope.dimension_count",
         cfg["hidden_size"] // cfg["num_attention_heads"]),
        ("attention.head_count", cfg["num_attention_heads"]),
        ("attention.layer_norm_rms_epsilon", cfg["layer_norm_epsilon"]),
    ]
    rows = (_wb("ln_1", "attn_norm") + _wb("ln_2", "ffn_norm")
            + _wb("attn.c_attn", "attn_qkv") + _wb("attn.c_proj", "attn_output")
            + _wb("mlp.w1", "ffn_up") + _wb("mlp.w2", "ffn_gate")
            + _wb("mlp.c_proj", "ffn_down"))
    model = [("transformer.wte.weight", "token_embd.weight", None),
             ("transformer.ln_f.weight", "output_norm.weight", None),
             ("lm_head.weight", "output.weight", None)]
    return _convert_table(d, cfg, sd, out_path, outtype, progress, "qwen",
                          dict(meta), model, "transformer.h", rows, n_layer)


# ---------------------------------------------------------------------------
# CodeShell (reference CodeShellModel: gpt2-style bias-ful fused QKV)
# ---------------------------------------------------------------------------


def _convert_codeshell(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table, _wb

    n_layer = cfg["n_layer"]
    meta = [
        ("context_length", cfg["n_positions"]),
        ("embedding_length", cfg["n_embd"]),
        ("feed_forward_length", 4 * cfg["n_embd"]),
        ("block_count", n_layer),
        ("attention.head_count", cfg["n_head"]),
        ("attention.head_count_kv", cfg["num_query_groups"]),
        ("attention.layer_norm_epsilon", cfg["layer_norm_epsilon"]),
        ("rope.freq_base", 10000.0),
        ("rope.scaling.type", "linear"),
        ("rope.scaling.factor", 1.0),
    ]
    rows = (_wb("ln_1", "attn_norm") + _wb("ln_2", "ffn_norm")
            + _wb("attn.c_attn", "attn_qkv") + _wb("attn.c_proj", "attn_output")
            + _wb("mlp.c_fc", "ffn_up") + _wb("mlp.c_proj", "ffn_down"))
    model = [("transformer.wte.weight", "token_embd.weight", None),
             ("transformer.ln_f.weight", "output_norm.weight", None),
             ("transformer.ln_f.bias", "output_norm.bias", None),
             ("lm_head.weight", "output.weight", None)]
    return _convert_table(d, cfg, sd, out_path, outtype, progress, "codeshell",
                          dict(meta), model, "transformer.h", rows, n_layer)


# ---------------------------------------------------------------------------
# Grok-1 (reference GrokModel: 4 rms norms per layer, merged expert mats)
# ---------------------------------------------------------------------------


def _convert_grok(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table, _wb

    n_layer = cfg["num_hidden_layers"]
    n_exp = cfg["num_local_experts"]
    meta = _text_meta(cfg)
    rows = (_wb("rms_norm", "attn_norm")
            + _wb("rms_norm_1", "attn_output_norm")
            + _wb("rms_norm_2", "ffn_norm")
            + _wb("rms_norm_3", "layer_output_norm")
            + _wb("multi_head_attention.query", "attn_q")
            + _wb("multi_head_attention.key", "attn_k")
            + _wb("multi_head_attention.value", "attn_v")
            + _wb("multi_head_attention.linear", "attn_output")
            + _wb("router", "ffn_gate_inp"))
    model = [("transformer.in_out_embed.weight", "token_embd.weight", None),
             ("transformer.rms_norm.weight", "output_norm.weight", None),
             ("lm_head.weight", "output.weight", None)]

    def experts(put, il, pre):
        if f"{pre}.moe.0.linear.weight" not in sd:
            return
        for hf_w, gname in (("linear", "ffn_gate_exps"),
                            ("linear_1", "ffn_down_exps"),
                            ("linear_v", "ffn_up_exps")):
            put(f"blk.{il}.{gname}.weight",
                _stack_experts(sd, pre, n_exp,
                               pre + ".moe.{0}." + hf_w + ".weight"))

    return _convert_table(d, cfg, sd, out_path, outtype, progress, "grok",
                          dict(meta), model, "transformer.decoder_layer",
                          rows, n_layer, layer_hook=experts)


# ---------------------------------------------------------------------------
# MiniCPM3 (MLA attention like deepseek2, + long/short rope factors)
# ---------------------------------------------------------------------------


def _convert_minicpm3(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table

    n_layer = cfg["num_hidden_layers"]
    meta = [
        ("context_length", cfg["max_position_embeddings"]),
        ("embedding_length", cfg["hidden_size"]),
        ("block_count", n_layer),
        ("feed_forward_length", cfg["intermediate_size"]),
        ("attention.head_count", cfg["num_attention_heads"]),
        ("attention.head_count_kv", cfg["num_key_value_heads"]),
        ("attention.layer_norm_rms_epsilon", cfg["rms_norm_eps"]),
        ("attention.kv_lora_rank", cfg["kv_lora_rank"]),
        ("attention.key_length",
         cfg["qk_nope_head_dim"] + cfg["qk_rope_head_dim"]),
        ("rope.dimension_count", cfg["qk_rope_head_dim"]),
    ]
    if cfg.get("q_lora_rank") is not None:
        meta.insert(7, ("attention.q_lora_rank", cfg["q_lora_rank"]))
    layer = [("input_layernorm.weight", "attn_norm.weight", None),
             ("post_attention_layernorm.weight", "ffn_norm.weight", None),
             ("self_attn.q_a_proj.weight", "attn_q_a.weight", None),
             ("self_attn.q_a_layernorm.weight", "attn_q_a_norm.weight", None),
             ("self_attn.q_b_proj.weight", "attn_q_b.weight", None),
             ("self_attn.kv_a_proj_with_mqa.weight", "attn_kv_a_mqa.weight", None),
             ("self_attn.kv_a_layernorm.weight", "attn_kv_a_norm.weight", None),
             ("self_attn.kv_b_proj.weight", "attn_kv_b.weight", None),
             ("self_attn.o_proj.weight", "attn_output.weight", None),
             ("mlp.gate_proj.weight", "ffn_gate.weight", None),
             ("mlp.up_proj.weight", "ffn_up.weight", None),
             ("mlp.down_proj.weight", "ffn_down.weight", None)]

    def extras(put, il, pre):
        rs = cfg.get("rope_scaling") or {}
        if il == 0 and rs.get("long_factor") is not None:
            put("rope_factors_long.weight",
                np.asarray(rs["long_factor"], np.float32))
            put("rope_factors_short.weight",
                np.asarray(rs["short_factor"], np.float32))

    return _convert_table(d, cfg, sd, out_path, outtype, progress, "minicpm3",
                          dict(meta), _std_model_rows(), "model.layers",
                          layer, n_layer, layer_hook=extras)


# ---------------------------------------------------------------------------
# PhiMoE (phi3 metadata + mixtral-style stacked w1/w2/w3 experts)
# ---------------------------------------------------------------------------


def _convert_phimoe(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table, _wb

    n_layer = cfg["num_hidden_layers"]
    n_embd = cfg["hidden_size"]
    n_head = cfg["num_attention_heads"]
    n_exp = cfg["num_local_experts"]
    rot_pct = cfg.get("partial_rotary_factor", 1.0)
    meta = [
        ("context_length", cfg["max_position_embeddings"]),
        ("rope.scaling.original_context_length",
         cfg["original_max_position_embeddings"]),
        ("embedding_length", n_embd),
        ("feed_forward_length", cfg["intermediate_size"]),
        ("block_count", n_layer),
        ("attention.head_count", n_head),
        ("attention.head_count_kv", cfg["num_key_value_heads"]),
        ("attention.layer_norm_rms_epsilon", cfg["rms_norm_eps"]),
        ("rope.dimension_count", int(rot_pct * n_embd) // n_head),
        ("rope.freq_base", cfg["rope_theta"]),
        ("attention.sliding_window", cfg.get("sliding_window") or 0),
        ("expert_used_count", cfg["num_experts_per_tok"]),
        ("expert_count", n_exp),
    ]
    rows = (_wb("input_layernorm", "attn_norm")
            + _wb("post_attention_layernorm", "ffn_norm")
            + _wb("self_attn.q_proj", "attn_q")
            + _wb("self_attn.k_proj", "attn_k")
            + _wb("self_attn.v_proj", "attn_v")
            + _wb("self_attn.o_proj", "attn_output")
            + _wb("block_sparse_moe.gate", "ffn_gate_inp"))
    model = [("model.embed_tokens.weight", "token_embd.weight", None),
             ("model.norm.weight", "output_norm.weight", None),
             ("model.norm.bias", "output_norm.bias", None),
             ("lm_head.weight", "output.weight", None),
             ("lm_head.bias", "output.bias", None)]

    def experts(put, il, pre):
        rs = cfg.get("rope_scaling") or {}
        if il == 0 and rs.get("long_factor") is not None:
            put("rope_factors_long.weight",
                np.asarray(rs["long_factor"], np.float32))
            put("rope_factors_short.weight",
                np.asarray(rs["short_factor"], np.float32))
        if f"{pre}.block_sparse_moe.experts.0.w1.weight" not in sd:
            return
        for hf_w, gname in (("w1", "ffn_gate_exps"), ("w2", "ffn_down_exps"),
                            ("w3", "ffn_up_exps")):
            put(f"blk.{il}.{gname}.weight",
                _stack_experts(sd, pre, n_exp,
                               pre + ".block_sparse_moe.experts.{0}."
                               + hf_w + ".weight"))

    return _convert_table(d, cfg, sd, out_path, outtype, progress, "phimoe",
                          dict(meta), model, "model.layers", rows, n_layer,
                          layer_hook=experts)


# ---------------------------------------------------------------------------
# BailingMoe (fused QKV split+permuted, deepseek-style MoE, norm_head)
# ---------------------------------------------------------------------------


def _convert_bailingmoe(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table, _wb

    n_layer = cfg["num_hidden_layers"]
    n_head = cfg["num_attention_heads"]
    n_kv = cfg.get("num_key_value_heads", n_head)
    n_embd = cfg["hidden_size"]
    hd = _head_dim(cfg)
    n_exp = cfg["num_experts"]
    meta = _text_meta(cfg) + [("rope.dimension_count", hd)]
    rs = cfg.get("rope_scaling") or {}
    if rs.get("rope_type", rs.get("type")) == "yarn" and "factor" in rs:
        meta += [("rope.scaling.type", "yarn"),
                 ("rope.scaling.factor", rs["factor"]),
                 ("rope.scaling.original_context_length",
                  rs["original_max_position_embeddings"])]
    else:
        meta += [("rope.scaling.type", "none")]
    meta += [
        ("leading_dense_block_count", cfg["first_k_dense_replace"]),
        ("expert_feed_forward_length", cfg["moe_intermediate_size"]),
        ("expert_weights_scale", 1.0),
        ("expert_count", n_exp),
        ("expert_shared_count", cfg["num_shared_experts"]),
        ("expert_weights_norm", bool(cfg["norm_topk_prob"])),
    ]
    # BAILINGMOE's tensor set has no dense-FFN rows — every layer is MoE
    # (reference constants.py MODEL_TENSORS[BAILINGMOE])
    rows = (_wb("input_layernorm", "attn_norm")
            + _wb("post_attention_layernorm", "ffn_norm")
            + _wb("mlp.gate", "ffn_gate_inp")
            + [(f"mlp.shared_experts.{p}_proj.weight",
                f"ffn_{p.replace('_', '')}_shexp.weight", None)
               for p in ("gate", "up", "down")])
    norm_head = cfg.get("norm_head")

    def head_tf(t):
        if not norm_head:
            return t
        return t / (np.linalg.norm(t, axis=0, keepdims=True) + 1e-7)

    model = [("model.word_embeddings.weight", "token_embd.weight", None),
             ("model.norm.weight", "output_norm.weight", None),
             ("lm_head.weight", "output.weight", head_tf)]

    def fused(put, il, pre):
        key = f"{pre}.attention.query_key_value.weight"
        if key in sd:
            t = np.asarray(sd[key], np.float32)
            q, k, v = np.split(t, [n_head * hd, n_head * hd + n_kv * hd])
            put(f"blk.{il}.attn_q.weight", _llama_permute(q, n_head, n_head))
            put(f"blk.{il}.attn_k.weight", _llama_permute(k, n_head, n_kv))
            put(f"blk.{il}.attn_v.weight", v)
        dense = f"{pre}.attention.dense.weight"
        if dense in sd:
            put(f"blk.{il}.attn_output.weight", sd[dense])
        if f"{pre}.mlp.experts.0.gate_proj.weight" in sd:
            for hf_w, gname in (("down_proj", "ffn_down_exps"),
                                ("gate_proj", "ffn_gate_exps"),
                                ("up_proj", "ffn_up_exps")):
                put(f"blk.{il}.{gname}.weight",
                    _stack_experts(sd, pre, n_exp,
                                   pre + ".mlp.experts.{0}." + hf_w + ".weight"))

    return _convert_table(d, cfg, sd, out_path, outtype, progress,
                          "bailingmoe", dict(meta), model, "model.layers",
                          rows, n_layer, layer_hook=fused)


# ---------------------------------------------------------------------------
# Dots1 (qwen2moe-style experts + v3-style bias/gating metadata)
# ---------------------------------------------------------------------------


def _convert_dots1(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table, _wb

    n_layer = cfg["num_hidden_layers"]
    n_exp = cfg["n_routed_experts"]
    meta = _text_meta(cfg) + [
        ("expert_count", n_exp),
        ("expert_feed_forward_length", cfg["moe_intermediate_size"]),
        ("leading_dense_block_count", cfg["first_k_dense_replace"]),
        ("expert_shared_count", cfg["n_shared_experts"]),
        ("expert_weights_scale", cfg["routed_scaling_factor"]),
        ("expert_weights_norm", bool(cfg["norm_topk_prob"])),
        ("expert_gating_func", 2),  # noaux_tc -> sigmoid
    ]
    rows = (_wb("input_layernorm", "attn_norm")
            + _wb("post_attention_layernorm", "ffn_norm")
            + _wb("self_attn.q_proj", "attn_q")
            + _wb("self_attn.k_proj", "attn_k")
            + _wb("self_attn.v_proj", "attn_v")
            + _wb("self_attn.o_proj", "attn_output")
            + _wb("self_attn.q_norm", "attn_q_norm")
            + _wb("self_attn.k_norm", "attn_k_norm")
            + _wb("mlp.gate", "ffn_gate_inp")
            + _wb("mlp.gate_proj", "ffn_gate") + _wb("mlp.up_proj", "ffn_up")
            + _wb("mlp.down_proj", "ffn_down")
            + [("mlp.gate.e_score_correction_bias", "exp_probs_b.bias", None)]
            + [(f"mlp.shared_experts.{p}_proj.weight",
                f"ffn_{p}_shexp.weight", None)
               for p in ("gate", "up", "down")])

    def experts(put, il, pre):
        if f"{pre}.mlp.experts.0.gate_proj.weight" not in sd:
            return
        for hf_w, gname in (("down_proj", "ffn_down_exps"),
                            ("gate_proj", "ffn_gate_exps"),
                            ("up_proj", "ffn_up_exps")):
            put(f"blk.{il}.{gname}.weight",
                _stack_experts(sd, pre, n_exp,
                               pre + ".mlp.experts.{0}." + hf_w + ".weight"))

    return _convert_table(d, cfg, sd, out_path, outtype, progress, "dots1",
                          dict(meta), _std_model_rows(), "model.layers",
                          rows, n_layer, layer_hook=experts)


# ---------------------------------------------------------------------------
# Chameleon (llama + per-head q/k norms with interleave transform)
# ---------------------------------------------------------------------------


def _convert_chameleon(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table

    n_layer = cfg["num_hidden_layers"]
    n_head = cfg["num_attention_heads"]
    n_kv = cfg.get("num_key_value_heads", n_head)
    n_embd = cfg["hidden_size"]
    hd = n_embd // n_head
    meta = _text_meta(cfg) + [("swin_norm", bool(cfg.get("swin_norm", False)))]

    def qknorm_tf(heads):
        def tf(t):
            # ChameleonModel._reverse_hf_permute: take head 0's params,
            # de-interleave [2, hd/2] -> rotate-half order, tile per head
            row = np.asarray(t, np.float32)[0].reshape(2, hd // 2)
            row = row.T.reshape(1, -1)
            return np.repeat(row, heads, axis=0)
        return tf

    rows = _llama_layer_rows(
        permute_q=lambda t: _llama_permute(t, n_head, n_head),
        permute_k=lambda t: _llama_permute(t, n_head, n_kv))
    rows += [("self_attn.q_norm.weight", "attn_q_norm.weight", qknorm_tf(n_head)),
             ("self_attn.q_norm.bias", "attn_q_norm.bias", qknorm_tf(n_head)),
             ("self_attn.k_norm.weight", "attn_k_norm.weight", qknorm_tf(n_kv)),
             ("self_attn.k_norm.bias", "attn_k_norm.bias", qknorm_tf(n_kv))]
    return _convert_table(d, cfg, sd, out_path, outtype, progress, "chameleon",
                          dict(meta), _std_model_rows(), "model.layers",
                          rows, n_layer)


# ---------------------------------------------------------------------------
# Bitnet (b1.58 ternarization at convert time + sub-norms)
# ---------------------------------------------------------------------------


def _convert_bitnet(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table, _wb

    n_layer = cfg["num_hidden_layers"]
    # transformers' BitNetConfig defaults rope_theta=500000 (the reference
    # inherits it through AutoConfig even when config.json omits the key)
    cfg = dict(cfg)
    cfg.setdefault("rope_theta", 500000.0)
    meta = _text_meta(cfg) + [("rope.scaling.type", "linear"),
                              ("rope.scaling.factor", 1.0)]

    def ternary(t):
        # BitnetModel.weight_quant: round-to-nearest-even onto {-s,0,+s}
        t = np.asarray(t, np.float32)
        scale = max(np.abs(t).mean(), 1e-5)
        iscale = np.float32(1.0) / np.float32(scale)
        return (np.clip(np.round(t * iscale), -1, 1) / iscale).astype(np.float32)

    rows = (_wb("input_layernorm", "attn_norm")
            + _wb("post_attention_layernorm", "ffn_norm")
            + [(f"self_attn.{p}_proj.weight", f"attn_{g}.weight", ternary)
               for p, g in (("q", "q"), ("k", "k"), ("v", "v"),
                            ("o", "output"))]
            + [(f"mlp.{p}_proj.weight", f"ffn_{p}.weight", ternary)
               for p in ("gate", "up", "down")]
            + _wb("self_attn.inner_attn_ln", "attn_sub_norm")
            + _wb("mlp.ffn_layernorm", "ffn_sub_norm"))
    return _convert_table(d, cfg, sd, out_path, outtype, progress, "bitnet",
                          dict(meta), _std_model_rows(), "model.layers",
                          rows, n_layer)


# ---------------------------------------------------------------------------
# Arctic (llama permutes + residual MLP + stacked w1/w2/w3 experts)
# ---------------------------------------------------------------------------


def _convert_arctic(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table, _wb

    n_layer = cfg["num_hidden_layers"]
    n_head = cfg["num_attention_heads"]
    n_kv = cfg.get("num_key_value_heads", n_head)
    n_exp = cfg["num_local_experts"]
    meta = _text_meta(cfg) + [
        ("rope.dimension_count", cfg["hidden_size"] // n_head),
    ]
    rows = _llama_layer_rows(
        permute_q=lambda t: _llama_permute(t, n_head, n_head),
        permute_k=lambda t: _llama_permute(t, n_head, n_kv))
    # arctic arch-specific norm mapping: residual_layernorm -> ffn_norm,
    # post_attention_layernorm -> ffn_norm_exps (tensor_mapping.py:1209-1216)
    rows = [r for r in rows if not r[0].startswith("post_attention_layernorm")
            and not r[0].startswith("mlp.")]
    rows += (_wb("residual_layernorm", "ffn_norm")
             + _wb("post_attention_layernorm", "ffn_norm_exps")
             + _wb("residual_mlp.w1", "ffn_gate")
             + _wb("residual_mlp.w3", "ffn_up")
             + _wb("residual_mlp.w2", "ffn_down")
             + _wb("block_sparse_moe.gate", "ffn_gate_inp"))

    def experts(put, il, pre):
        if f"{pre}.block_sparse_moe.experts.0.w1.weight" not in sd:
            return
        for hf_w, gname in (("w1", "ffn_gate_exps"), ("w2", "ffn_down_exps"),
                            ("w3", "ffn_up_exps")):
            put(f"blk.{il}.{gname}.weight",
                _stack_experts(sd, pre, n_exp,
                               pre + ".block_sparse_moe.experts.{0}."
                               + hf_w + ".weight"))

    return _convert_table(d, cfg, sd, out_path, outtype, progress, "arctic",
                          dict(meta), _std_model_rows(), "model.layers",
                          rows, n_layer, layer_hook=experts)


# ---------------------------------------------------------------------------
# OpenELM (per-layer head counts/FFN dims, fused qkv, split proj_1)
# ---------------------------------------------------------------------------


def _make_divisible(v, divisor):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _convert_openelm(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table, _wb

    n_layer = cfg["num_transformer_layers"]
    n_embd = cfg["model_dim"]
    hd = cfg["head_dim"]
    ffn_dims = [_make_divisible(m * n_embd, cfg["ffn_dim_divisor"])
                for m in cfg["ffn_multipliers"]]
    meta = [
        ("block_count", n_layer),
        ("context_length", cfg["max_context_length"]),
        ("embedding_length", n_embd),
        ("feed_forward_length", ffn_dims),
        ("attention.head_count", cfg["num_query_heads"]),
        ("attention.head_count_kv", cfg["num_kv_heads"]),
        ("rope.freq_base", cfg["rope_freq_constant"]),
        ("attention.layer_norm_rms_epsilon", 1e-6),
        ("rope.dimension_count", hd),
        ("attention.key_length", hd),
        ("attention.value_length", hd),
    ]
    rows = (_wb("attn_norm", "attn_norm") + _wb("ffn_norm", "ffn_norm")
            + _wb("attn.qkv_proj", "attn_qkv")
            + _wb("attn.out_proj", "attn_output")
            + _wb("attn.q_norm", "attn_q_norm")
            + _wb("attn.k_norm", "attn_k_norm")
            + _wb("ffn.proj_2", "ffn_down"))
    model = [("transformer.token_embeddings.weight", "token_embd.weight", None),
             ("transformer.norm.weight", "output_norm.weight", None)]

    def split_ffn(put, il, pre):
        key = f"{pre}.ffn.proj_1.weight"
        if key in sd:
            t = np.asarray(sd[key], np.float32)
            put(f"blk.{il}.ffn_gate.weight", t[:ffn_dims[il]])
            put(f"blk.{il}.ffn_up.weight", t[ffn_dims[il]:])

    return _convert_table(d, cfg, sd, out_path, outtype, progress, "openelm",
                          dict(meta), model, "transformer.layers", rows,
                          n_layer, layer_hook=split_ffn)


# ---------------------------------------------------------------------------
# Deepseek v1 (llama permutes + shared experts + stacked experts)
# ---------------------------------------------------------------------------


def _convert_deepseek1(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table

    n_layer = cfg["num_hidden_layers"]
    n_head = cfg["num_attention_heads"]
    n_kv = cfg.get("num_key_value_heads", n_head)
    n_exp = cfg["n_routed_experts"]
    meta = _text_meta(cfg) + [
        ("rope.dimension_count", _head_dim(cfg)),
        ("rope.scaling.type", "none"),
        ("leading_dense_block_count", cfg["first_k_dense_replace"]),
        ("expert_feed_forward_length", cfg["moe_intermediate_size"]),
        ("expert_weights_scale", 1.0),
        ("expert_count", n_exp),
        ("expert_shared_count", cfg["n_shared_experts"]),
    ]
    rows = _llama_layer_rows(
        permute_q=lambda t: _llama_permute(t, n_head, n_head),
        permute_k=lambda t: _llama_permute(t, n_head, n_kv))
    rows += ([("mlp.gate.weight", "ffn_gate_inp.weight", None)]
             + [(f"mlp.shared_experts.{p}_proj.weight",
                 f"ffn_{p}_shexp.weight", None)
                for p in ("gate", "up", "down")])

    def experts(put, il, pre):
        if f"{pre}.mlp.experts.0.gate_proj.weight" not in sd:
            return
        for hf_w, gname in (("down_proj", "ffn_down_exps"),
                            ("gate_proj", "ffn_gate_exps"),
                            ("up_proj", "ffn_up_exps")):
            put(f"blk.{il}.{gname}.weight",
                _stack_experts(sd, pre, n_exp,
                               pre + ".mlp.experts.{0}." + hf_w + ".weight"))

    return _convert_table(d, cfg, sd, out_path, outtype, progress, "deepseek",
                          dict(meta), _std_model_rows(), "model.layers",
                          rows, n_layer, layer_hook=experts)


# ---------------------------------------------------------------------------
# JAIS (gpt2-style transposed convs, mup embedding/width scales, ALiBi)
# ---------------------------------------------------------------------------


def _convert_jais(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table, _wb

    n_layer = cfg["n_layer"]
    n_head = cfg["n_head"]
    emb_scale = cfg.get("mup_embeddings_scale", cfg.get("embeddings_scale"))
    if cfg.get("mup_output_alpha") is not None:
        width_scale = cfg["mup_output_alpha"] * cfg["mup_width_scale"]
    else:
        width_scale = cfg["width_scale"]
    meta = [
        ("block_count", n_layer),
        ("context_length", cfg["n_positions"]),
        ("embedding_length", cfg["n_embd"]),
        ("feed_forward_length", cfg["n_inner"]),
        ("attention.head_count", n_head),
        ("attention.layer_norm_epsilon", cfg["layer_norm_epsilon"]),
    ]

    def T(t):
        return np.asarray(t, np.float32).T

    rows = (_wb("ln_1", "attn_norm") + _wb("ln_2", "ffn_norm")
            + [("attn.c_attn.weight", "attn_qkv.weight", T),
               ("attn.c_attn.bias", "attn_qkv.bias", None),
               ("attn.c_proj.weight", "attn_output.weight", T),
               ("attn.c_proj.bias", "attn_output.bias", None),
               ("mlp.c_fc.weight", "ffn_up.weight", T),
               ("mlp.c_fc.bias", "ffn_up.bias", None),
               ("mlp.c_fc2.weight", "ffn_gate.weight", T),
               ("mlp.c_fc2.bias", "ffn_gate.bias", None),
               ("mlp.c_proj.weight", "ffn_down.weight", T),
               ("mlp.c_proj.bias", "ffn_down.bias", None)])
    model = [("transformer.wte.weight", "token_embd.weight",
              lambda t: np.asarray(t, np.float32) * emb_scale),
             ("transformer.ln_f.weight", "output_norm.weight", None),
             ("transformer.ln_f.bias", "output_norm.bias", None),
             ("lm_head.weight", "output.weight",
              lambda t: np.asarray(t, np.float32) * width_scale)]

    # max_alibi_bias from the precomputed slopes tensor (JaisModel)
    import math
    max_alibi_bias = 8.0
    slopes_key = f"transformer.h.0.attn.relative_pe.slopes"
    for name in list(getattr(sd, "names", lambda: [])()) or []:
        if name.endswith("relative_pe.slopes"):
            slopes_key = name
            break
    if slopes_key in sd:
        closest_log2 = 2 ** math.floor(math.log2(n_head))
        first = float(np.asarray(sd[slopes_key], np.float32).ravel()[0])
        max_alibi_bias = -round(math.log2(first) * closest_log2)
    meta.append(("attention.max_alibi_bias", max_alibi_bias))

    return _convert_table(d, cfg, sd, out_path, outtype, progress, "jais",
                          dict(meta), model, "transformer.h", rows, n_layer)


# ---------------------------------------------------------------------------
# Plamo (GQA broadcast shuffles; reference hardcodes 5120 shapes — the
# same permutation generalized to the checkpoint's actual dims)
# ---------------------------------------------------------------------------


def _convert_plamo(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table, _wb

    n_layer = cfg["num_hidden_layers"]
    n_embd = cfg["hidden_size"]
    n_head = cfg["num_attention_heads"]
    n_kv = cfg.get("num_key_value_heads", 5)
    hd = n_embd // n_head
    groups = n_head // n_kv
    meta = [
        ("context_length", 4096),
        ("embedding_length", n_embd),
        ("feed_forward_length", cfg["intermediate_size"]),
        ("block_count", n_layer),
        ("attention.head_count", n_head),
        ("attention.head_count_kv", n_kv),
        ("attention.layer_norm_rms_epsilon", cfg["rms_norm_eps"]),
    ]

    def shuffle_q(t):  # PlamoModel.shuffle_attn_q_weight, generalized
        t = np.asarray(t, np.float32)
        return (t.reshape(groups, n_kv, hd, n_embd)
                .transpose(1, 0, 2, 3).reshape(n_embd, n_embd))

    def shuffle_o(t):  # PlamoModel.shuffle_attn_output_weight
        t = np.asarray(t, np.float32)
        return (t.reshape(n_embd, groups, n_kv, hd)
                .transpose(0, 2, 1, 3).reshape(n_embd, n_embd))

    rows = (_wb("norm", "attn_norm")
            + [("self_attn.q_proj.weight", "attn_q.weight", shuffle_q),
               ("self_attn.k_proj.weight", "attn_k.weight", None),
               ("self_attn.v_proj.weight", "attn_v.weight", None),
               ("self_attn.o_proj.weight", "attn_output.weight", shuffle_o)]
            + _wb("mlp.gate_proj", "ffn_gate") + _wb("mlp.up_proj", "ffn_up")
            + _wb("mlp.down_proj", "ffn_down"))
    return _convert_table(d, cfg, sd, out_path, outtype, progress, "plamo",
                          dict(meta), _std_model_rows(), "model.layers.layers",
                          rows, n_layer)


CUSTOM_EXT2 = {
    "DeciLMForCausalLM": _convert_deci,
    "ExaoneForCausalLM": _convert_exaone,
    "ChatGLMModel": _convert_chatglm,
    "ChatGLMForConditionalGeneration": _convert_chatglm,
    "QWenLMHeadModel": _convert_qwen,
    "CodeShellForCausalLM": _convert_codeshell,
    "GrokForCausalLM": _convert_grok,
    "MiniCPM3ForCausalLM": _convert_minicpm3,
    "PhiMoEForCausalLM": _convert_phimoe,
    "BailingMoeForCausalLM": _convert_bailingmoe,
    "Dots1ForCausalLM": _convert_dots1,
    "ChameleonForConditionalGeneration": _convert_chameleon,
    "ChameleonForCausalLM": _convert_chameleon,
    "BitnetForCausalLM": _convert_bitnet,
    "ArcticForCausalLM": _convert_arctic,
    "OpenELMForCausalLM": _convert_openelm,
    "DeepseekForCausalLM": _convert_deepseek1,
    "JAISLMHeadModel": _convert_jais,
    "PlamoForCausalLM": _convert_plamo,
}
