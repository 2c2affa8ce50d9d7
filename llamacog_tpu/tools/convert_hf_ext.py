"""HF->GGUF converters: encoder (BERT family) and seq2seq (T5 family).

Converter roles of the reference's BertModel/RobertaModel/DistilBertModel/
XLMRobertaModel and T5Model/T5EncoderModel classes (convert_hf_to_gguf.py).
Output is oracle-diffed against the reference converter in
tests/test_convert_oracle.py.
"""

from __future__ import annotations

import numpy as np

from ..gguf import GGUFWriter
from .convert_hf import _cast, _export_tokenizer

# ---------------------------------------------------------------------------
# BERT family (bert / roberta / camembert / distilbert -> gguf arch "bert")
# ---------------------------------------------------------------------------

# encoder.layer.N.<hf suffix> -> blk.N.<gguf>  (weight+bias each)
_BERT_LAYER = [
    ("attention.self.query", "attn_q"),
    ("attention.self.key", "attn_k"),
    ("attention.self.value", "attn_v"),
    ("attention.output.dense", "attn_output"),
    ("attention.output.LayerNorm", "attn_output_norm"),
    ("intermediate.dense", "ffn_up"),
    ("output.dense", "ffn_down"),
    ("output.LayerNorm", "layer_output_norm"),
]

# distilbert: transformer.layer.N.<hf suffix>
_DISTILBERT_LAYER = [
    ("attention.q_lin", "attn_q"),
    ("attention.k_lin", "attn_k"),
    ("attention.v_lin", "attn_v"),
    ("attention.out_lin", "attn_output"),
    ("sa_layer_norm", "attn_output_norm"),
    ("ffn.lin1", "ffn_up"),
    ("ffn.lin2", "ffn_down"),
    ("output_layer_norm", "layer_output_norm"),
]


def _strip_prefix(sd, prefixes):
    """View of the state dict with any of the given prefixes removed
    (BertForMaskedLM stores under bert.*, reranker checkpoints under
    roberta.*, DistilBert under distilbert.*)."""
    out = {}
    for name in sd.names():
        short = name
        for p in prefixes:
            if short.startswith(p):
                short = short[len(p):]
        out[short] = name
    return out


def _convert_bert(d, cfg, sd, out_path, outtype, progress) -> dict:
    arch = "bert"
    arch_name = cfg["architectures"][0]
    distil = "DistilBert" in arch_name
    roberta = "Roberta" in arch_name or "Camembert" in arch_name
    w = GGUFWriter(out_path)
    n_layer = cfg.get("num_hidden_layers", cfg.get("n_layers"))
    n_embd = cfg.get("hidden_size", cfg.get("dim"))
    n_ctx = cfg.get("max_position_embeddings", 512)
    # roberta position embeddings start at pad_token_id+1 (reference
    # RobertaModel.__init__ chops both the metadata and the tensor)
    pos_offset = 0
    if roberta and cfg.get("pad_token_id") is not None:
        pos_offset = cfg["pad_token_id"] + 1
        n_ctx -= pos_offset
    w.add("general.architecture", arch)
    w.add("general.name", cfg.get("_name_or_path", d.name) or d.name)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.context_length", n_ctx)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.feed_forward_length",
          cfg.get("intermediate_size", cfg.get("hidden_dim")))
    w.add(f"{arch}.attention.head_count",
          cfg.get("num_attention_heads", cfg.get("n_heads")))
    w.add(f"{arch}.attention.layer_norm_epsilon",
          1e-12 if distil else cfg.get("layer_norm_eps", 1e-12))
    w.add(f"{arch}.attention.causal", False)
    labels = cfg.get("id2label")
    if labels and not (len(labels) == 2 and labels.get("0") == "LABEL_0"):
        w.add(f"{arch}.classifier.output_labels",
              [v for k, v in sorted(labels.items(), key=lambda kv: int(kv[0]))])
    w.add(f"{arch}.vocab_size", cfg["vocab_size"])
    _export_tokenizer(w, d, cfg)

    names = _strip_prefix(sd, ("bert.", "distilbert.", "roberta.", "camembert."))

    def put(gname, key_or_arr):
        arr = sd[names[key_or_arr]] if isinstance(key_or_arr, str) else key_or_arr
        _cast(np.asarray(arr, np.float32), outtype, gname, w)
        if progress:
            progress(gname)

    put("token_embd.weight", "embeddings.word_embeddings.weight")
    pos = np.asarray(sd[names["embeddings.position_embeddings.weight"]], np.float32)
    put("position_embd.weight", pos[pos_offset:] if pos_offset else pos)
    if "embeddings.token_type_embeddings.weight" in names:
        put("token_types.weight", "embeddings.token_type_embeddings.weight")
    for s in ("weight", "bias"):
        put(f"token_embd_norm.{s}", f"embeddings.LayerNorm.{s}")
    layer_map = _DISTILBERT_LAYER if distil else _BERT_LAYER
    layer_prefix = "transformer.layer" if distil else "encoder.layer"
    count = 0
    for il in range(n_layer):
        for hf, g in layer_map:
            for s in ("weight", "bias"):
                key = f"{layer_prefix}.{il}.{hf}.{s}"
                if key in names:
                    put(f"blk.{il}.{g}.{s}", key)
                    count += 1
    # sequence-classification heads (reference BertModel.modify_tensors):
    # bert projects directly (classifier.*), roberta has dense+out_proj
    for hf, g in (("classifier.dense", "cls"),
                  ("classifier.out_proj", "cls.output"),
                  ("classifier", "cls.output" if labels else None),
                  ("pre_classifier", "cls")):
        if g is None:
            continue
        for s in ("weight", "bias"):
            if f"{hf}.{s}" in names and not any(
                    f"{hf}.{sub}.{s}" in names for sub in ("dense", "out_proj")):
                put(f"{g}.{s}", f"{hf}.{s}")
    w.write()
    return {"arch": arch, "layers": n_layer, "tensors": count, "output": out_path}


# ---------------------------------------------------------------------------
# T5 family -> gguf arch "t5" / "t5encoder"
# ---------------------------------------------------------------------------

_T5_SELF = [
    ("layer.0.SelfAttention.q.weight", "attn_q.weight"),
    ("layer.0.SelfAttention.k.weight", "attn_k.weight"),
    ("layer.0.SelfAttention.v.weight", "attn_v.weight"),
    ("layer.0.SelfAttention.o.weight", "attn_o.weight"),
    ("layer.0.SelfAttention.relative_attention_bias.weight", "attn_rel_b.weight"),
    ("layer.0.layer_norm.weight", "attn_norm.weight"),
]


def _t5_ffn(idx):
    return [
        (f"layer.{idx}.DenseReluDense.wi.weight", "ffn_up.weight"),
        (f"layer.{idx}.DenseReluDense.wi_0.weight", "ffn_gate.weight"),
        (f"layer.{idx}.DenseReluDense.wi_1.weight", "ffn_up.weight"),
        (f"layer.{idx}.DenseReluDense.wo.weight", "ffn_down.weight"),
        (f"layer.{idx}.layer_norm.weight", "ffn_norm.weight"),
    ]


_T5_CROSS = [
    ("layer.1.EncDecAttention.q.weight", "cross_attn_q.weight"),
    ("layer.1.EncDecAttention.k.weight", "cross_attn_k.weight"),
    ("layer.1.EncDecAttention.v.weight", "cross_attn_v.weight"),
    ("layer.1.EncDecAttention.o.weight", "cross_attn_o.weight"),
    ("layer.1.layer_norm.weight", "cross_attn_norm.weight"),
]


def _convert_t5(d, cfg, sd, out_path, outtype, progress) -> dict:
    enc_only = cfg["architectures"][0] == "T5EncoderModel"
    arch = "t5encoder" if enc_only else "t5"
    w = GGUFWriter(out_path)
    n_layer = cfg["num_layers"]
    w.add("general.architecture", arch)
    w.add("general.name", cfg.get("_name_or_path", d.name) or d.name)
    w.add(f"{arch}.context_length", cfg.get("n_positions", 512))
    w.add(f"{arch}.embedding_length", cfg["d_model"])
    w.add(f"{arch}.feed_forward_length", cfg["d_ff"])
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.attention.head_count", cfg["num_heads"])
    w.add(f"{arch}.attention.key_length", cfg["d_kv"])
    w.add(f"{arch}.attention.value_length", cfg["d_kv"])
    w.add(f"{arch}.attention.layer_norm_epsilon", cfg["layer_norm_epsilon"])
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", cfg["layer_norm_epsilon"])
    w.add(f"{arch}.attention.relative_buckets_count",
          cfg["relative_attention_num_buckets"])
    if not enc_only:
        w.add(f"{arch}.decoder_start_token_id", cfg["decoder_start_token_id"])
    w.add(f"{arch}.vocab_size", cfg["vocab_size"])
    _export_tokenizer(w, d, cfg)

    count = [0]

    def put(gname, arr):
        _cast(np.asarray(arr, np.float32), outtype, gname, w)
        count[0] += 1
        if progress:
            progress(gname)

    # shared token embeddings: first of the three aliases wins (reference
    # T5Model.shared_token_embeddings_found)
    for name in ("shared.weight", "encoder.embed_tokens.weight",
                 "decoder.embed_tokens.weight"):
        if name in sd:
            put("token_embd.weight", sd[name])
            break
    if "lm_head.weight" in sd and not cfg.get("tie_word_embeddings", True):
        put("output.weight", sd["lm_head.weight"])
    if "encoder.final_layer_norm.weight" in sd:
        put("enc.output_norm.weight", sd["encoder.final_layer_norm.weight"])
    if not enc_only and "decoder.final_layer_norm.weight" in sd:
        put("dec.output_norm.weight", sd["decoder.final_layer_norm.weight"])
    sides = [("encoder", "enc", _T5_SELF + _t5_ffn(1))]
    if not enc_only:
        sides.append(("decoder", "dec", _T5_SELF + _T5_CROSS + _t5_ffn(2)))
    for hf_side, g_side, table in sides:
        for il in range(n_layer):
            for hf, g in table:
                key = f"{hf_side}.block.{il}.{hf}"
                if key in sd:
                    put(f"{g_side}.blk.{il}.{g}", sd[key])
    w.write()
    return {"arch": arch, "layers": n_layer, "tensors": count[0],
            "output": out_path}


# ---------------------------------------------------------------------------
# Long-tail decoder arches (remote-code HF repos; reference classes:
# BaichuanModel, XverseModel, OrionModel, InternLM2Model, MiniCPMModel)
# ---------------------------------------------------------------------------


def _ctx_chain(cfg):
    """Baichuan/Xverse/Orion context-length fallback chain."""
    for k in ("max_sequence_length", "max_position_embeddings",
              "model_max_length"):
        if k in cfg:
            return cfg[k]
    raise ValueError("can not find ctx length parameter")


def _rope_scaling_meta(cfg):
    rs = cfg.get("rope_scaling") or {}
    if rs.get("rope_type", rs.get("type")) == "linear" and "factor" in rs:
        return [("rope.scaling.type", "linear"),
                ("rope.scaling.factor", rs["factor"])]
    return []


def _permute_baichuan(w, n_head, n_kv=None):
    """BaichuanModel._reverse_hf_permute (NB: its GQA branch divides by the
    kv count rather than substituting it — mirrored verbatim for parity)."""
    if n_kv is not None and n_head != n_kv:
        n_head //= n_kv
    return (w.reshape(n_head, 2, w.shape[0] // n_head // 2, *w.shape[1:])
            .swapaxes(1, 2).reshape(w.shape))


def _llama_permute(w, n_head, n_head2):
    if n_head2 is not None and n_head != n_head2:
        n_head = n_head2
    return (w.reshape(n_head, 2, w.shape[0] // n_head // 2, *w.shape[1:])
            .swapaxes(1, 2).reshape(w.shape))


_LLAMA_STYLE_LAYER = None  # built lazily from convert_hf tables


def _llama_layer_rows(permute_q=None, permute_k=None):
    from .convert_hf import _wb

    rows = [("self_attn.q_proj.weight", "attn_q.weight", permute_q),
            ("self_attn.k_proj.weight", "attn_k.weight", permute_k)]
    rows += _wb("self_attn.v_proj", "attn_v")
    rows += [("self_attn.q_proj.bias", "attn_q.bias", None),
             ("self_attn.k_proj.bias", "attn_k.bias", None)]
    rows += _wb("self_attn.o_proj", "attn_output")
    rows += _wb("input_layernorm", "attn_norm")
    rows += _wb("post_attention_layernorm", "ffn_norm")
    rows += _wb("mlp.gate_proj", "ffn_gate")
    rows += _wb("mlp.up_proj", "ffn_up")
    rows += _wb("mlp.down_proj", "ffn_down")
    return rows


def _std_model_rows():
    from .convert_hf import _wb

    return ([("model.embed_tokens.weight", "token_embd.weight", None),
             ("lm_head.weight", "output.weight", None)]
            + _wb("model.norm", "output_norm"))


def _convert_baichuan(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table

    n_layer = cfg["num_hidden_layers"]
    n_head = cfg["num_attention_heads"]
    n_kv = cfg.get("num_key_value_heads", n_head)
    n_embd = cfg["hidden_size"]
    meta = dict([
        ("tensor_data_layout", "Meta AI original pth"),
        ("context_length", _ctx_chain(cfg)),
        ("embedding_length", n_embd),
        ("block_count", n_layer),
        ("feed_forward_length", cfg["intermediate_size"]),
        ("rope.dimension_count", n_embd // n_head),
        ("attention.head_count", n_head),
        ("attention.head_count_kv", n_kv),
        ("attention.layer_norm_rms_epsilon", cfg["rms_norm_eps"]),
    ] + _rope_scaling_meta(cfg))

    def wpack(put, il, pre):
        key = f"{pre}.self_attn.W_pack.weight"
        if key not in sd:
            return
        t = np.asarray(sd[key], np.float32)
        r = t.shape[0] // 3
        put(f"blk.{il}.attn_q.weight",
            _permute_baichuan(t[:r], n_head, n_head))
        put(f"blk.{il}.attn_k.weight",
            _permute_baichuan(t[r:2 * r], n_head, n_kv))
        put(f"blk.{il}.attn_v.weight", t[2 * r:])

    return _convert_table(d, cfg, sd, out_path, outtype, progress, "baichuan",
                          meta, _std_model_rows(), "model.layers",
                          _llama_layer_rows(), n_layer, layer_hook=wpack)


def _convert_xverse(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table

    n_layer = cfg["num_hidden_layers"]
    n_head = cfg["num_attention_heads"]
    n_kv = cfg.get("num_key_value_heads", n_head)
    n_embd = cfg["hidden_size"]
    meta = dict([
        ("tensor_data_layout", "Meta AI original pth"),
        ("context_length", _ctx_chain(cfg)),
        ("embedding_length", n_embd),
        ("block_count", n_layer),
        ("feed_forward_length", cfg["intermediate_size"]),
        ("rope.dimension_count", n_embd // n_head),
        ("attention.head_count", n_head),
        ("attention.head_count_kv", n_kv),
        ("attention.layer_norm_rms_epsilon", cfg["rms_norm_eps"]),
    ] + _rope_scaling_meta(cfg))
    rows = _llama_layer_rows(
        permute_q=lambda t: _permute_baichuan(t, n_head, n_head),
        permute_k=lambda t: _permute_baichuan(t, n_head, n_kv))
    return _convert_table(d, cfg, sd, out_path, outtype, progress, "xverse",
                          meta, _std_model_rows(), "model.layers", rows,
                          n_layer)


def _convert_orion(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table

    n_layer = cfg["num_hidden_layers"]
    n_head = cfg["num_attention_heads"]
    meta = {
        "tensor_data_layout": "Meta AI original pth",
        "context_length": _ctx_chain(cfg),
        "embedding_length": cfg["hidden_size"],
        "block_count": n_layer,
        "feed_forward_length": cfg["intermediate_size"],
        "attention.head_count": n_head,
        "attention.head_count_kv": cfg.get("num_key_value_heads", n_head),
        # config says rms eps but the model applies LayerNorm (reference note)
        "attention.layer_norm_epsilon": cfg["rms_norm_eps"],
    }
    return _convert_table(d, cfg, sd, out_path, outtype, progress, "orion",
                          meta, _std_model_rows(), "model.layers",
                          _llama_layer_rows(), n_layer)


def _convert_internlm2(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table, _wb

    n_layer = cfg["num_hidden_layers"]
    n_head = cfg["num_attention_heads"]
    n_kv = cfg["num_key_value_heads"]
    n_embd = cfg["hidden_size"]
    head_dim = n_embd // n_head
    q_per_kv = n_head // n_kv
    meta = dict([
        ("context_length", cfg["max_position_embeddings"]),
        ("block_count", n_layer),
        ("embedding_length", n_embd),
        ("feed_forward_length", cfg["intermediate_size"]),
        ("rope.freq_base", cfg["rope_theta"]),
        ("attention.head_count", n_head),
        ("attention.layer_norm_rms_epsilon", cfg["rms_norm_eps"]),
        ("attention.head_count_kv", n_kv),
    ] + _rope_scaling_meta(cfg))

    def wqkv(put, il, pre):
        key = f"{pre}.attention.wqkv.weight"
        if key not in sd:
            return
        t = np.asarray(sd[key], np.float32)
        qkv = t.reshape(n_kv, q_per_kv + 2, head_dim, n_embd)
        q = qkv[:, :q_per_kv].reshape(-1, n_embd)
        k = qkv[:, -2].reshape(-1, n_embd)
        v = qkv[:, -1].reshape(-1, n_embd)
        put(f"blk.{il}.attn_q.weight", _llama_permute(q, n_head, n_head))
        put(f"blk.{il}.attn_k.weight", _llama_permute(k, n_head, n_kv))
        put(f"blk.{il}.attn_v.weight", v)

    rows = (_wb("attention.wo", "attn_output")
            + _wb("attention_norm", "attn_norm")
            + _wb("ffn_norm", "ffn_norm")
            + _wb("feed_forward.w1", "ffn_gate")
            + _wb("feed_forward.w3", "ffn_up")
            + _wb("feed_forward.w2", "ffn_down"))
    model = [("model.tok_embeddings.weight", "token_embd.weight", None),
             ("model.norm.weight", "output_norm.weight", None),
             ("output.weight", "output.weight", None)]
    return _convert_table(d, cfg, sd, out_path, outtype, progress,
                          "internlm2", meta, model, "model.layers", rows,
                          n_layer, layer_hook=wqkv)


def _convert_minicpm(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table

    n_layer = cfg["num_hidden_layers"]
    n_head = cfg["num_attention_heads"]
    n_kv = cfg.get("num_key_value_heads", n_head)
    meta = [
        ("context_length", cfg.get("max_position_embeddings", 4096)),
        ("embedding_length", cfg["hidden_size"]),
        ("feed_forward_length", cfg["intermediate_size"]),
        ("block_count", n_layer),
        ("attention.head_count", n_head),
        ("attention.head_count_kv", n_kv),
        ("attention.layer_norm_rms_epsilon", cfg.get("rms_norm_eps", 1e-5)),
        ("embedding_scale", float(cfg["scale_emb"])),
        ("residual_scale", cfg["scale_depth"] / n_layer ** 0.5),
        ("logit_scale", cfg["hidden_size"] / cfg["dim_model_base"]),
    ]
    rs = cfg.get("rope_scaling") or {}
    if rs.get("rope_type", rs.get("type")) == "longrope":
        meta.append(("rope.scaling.type", "longrope"))
    if cfg.get("rope_theta") is not None:
        meta.append(("rope.freq_base", cfg["rope_theta"]))

    def extras(put, il, pre):
        if il == 0 and rs.get("long_factor") is not None:
            put("rope_factors_long.weight",
                np.asarray(rs["long_factor"], np.float32))
            put("rope_factors_short.weight",
                np.asarray(rs["short_factor"], np.float32))

    rows = _llama_layer_rows(
        permute_q=lambda t: _llama_permute(t, n_head, n_head),
        permute_k=lambda t: _llama_permute(t, n_head, n_kv))
    return _convert_table(d, cfg, sd, out_path, outtype, progress, "minicpm",
                          dict(meta), _std_model_rows(), "model.layers", rows,
                          n_layer, layer_hook=extras)


CUSTOM_EXT = {
    "BaichuanForCausalLM": _convert_baichuan,
    "BaiChuanForCausalLM": _convert_baichuan,
    "XverseForCausalLM": _convert_xverse,
    "OrionForCausalLM": _convert_orion,
    "InternLM2ForCausalLM": _convert_internlm2,
    "MiniCPMForCausalLM": _convert_minicpm,
    "BertModel": _convert_bert,
    "BertForMaskedLM": _convert_bert,
    "BertForSequenceClassification": _convert_bert,
    "CamembertModel": _convert_bert,
    "RobertaModel": _convert_bert,
    "RobertaForSequenceClassification": _convert_bert,
    "XLMRobertaModel": _convert_bert,
    "XLMRobertaForSequenceClassification": _convert_bert,
    "DistilBertModel": _convert_bert,
    "DistilBertForMaskedLM": _convert_bert,
    "DistilBertForSequenceClassification": _convert_bert,
    "T5ForConditionalGeneration": _convert_t5,
    "T5WithLMHeadModel": _convert_t5,
    "MT5ForConditionalGeneration": _convert_t5,
    "UMT5ForConditionalGeneration": _convert_t5,
    "T5EncoderModel": _convert_t5,
}
