"""HF->GGUF converters, wave E: RWKV family, refact, PLM, WavTokenizer.

Converter roles of the reference classes Rwkv6Model, RWKV6Qwen2Model,
Rwkv7Model, ARwkv7Model, RefactModel, PLMModel, WavTokenizerDecModel
(reference convert_hf_to_gguf.py:4334-4620, 1692, 5319, 2964; tensor names
from gguf-py/gguf/tensor_mapping.py).  Output is oracle-diffed against the
reference converter in tests/test_convert_oracle_rc.py.
"""

from __future__ import annotations

import numpy as np

from .convert_hf_ext2 import _text_meta


def _squeeze(t):
    return np.squeeze(np.asarray(t, np.float32))


def _T(t):
    return np.asarray(t, np.float32).T


def _calc_lora_rank(hidden_size, exponent, multiplier):
    # Rwkv7Model.calc_lora_rank
    return max(1, round(hidden_size ** exponent * multiplier / 32)) * 32


# ---------------------------------------------------------------------------
# RWKV6 (rwkv.blocks.* HF layout; Rwkv6Model)
# ---------------------------------------------------------------------------


def _rwkv6_layer_rows():
    """(hf_suffix, gguf_suffix, transform) rows for one rwkv6 block, minus
    the two rescaled projections (emitted by the layer hook).

    HF parameter names carry no .weight suffix for the scalar/lerp tensors;
    the reference appends one (Rwkv6Model.modify_tensors)."""
    rows = [
        ("ln1.weight", "attn_norm.weight", None),
        ("ln1.bias", "attn_norm.bias", None),
        ("ln2.weight", "attn_norm_2.weight", None),
        ("ln2.bias", "attn_norm_2.bias", None),
        ("attention.time_maa_x", "time_mix_lerp_x.weight", _squeeze),
        ("attention.time_maa_w1", "time_mix_w1.weight", _T),
        ("attention.time_maa_w2", "time_mix_w2.weight",
         lambda t: np.transpose(np.asarray(t, np.float32), (0, 2, 1))),
        ("attention.time_decay", "time_mix_decay.weight", _squeeze),
        ("attention.time_decay_w1", "time_mix_decay_w1.weight", _T),
        ("attention.time_decay_w2", "time_mix_decay_w2.weight", _T),
        ("attention.time_faaaa", "time_mix_first.weight", None),
        ("attention.key.weight", "time_mix_key.weight", None),
        ("attention.value.weight", "time_mix_value.weight", None),
        ("attention.receptance.weight", "time_mix_receptance.weight", None),
        ("attention.gate.weight", "time_mix_gate.weight", None),
        ("attention.ln_x.weight", "time_mix_ln.weight", None),
        ("attention.ln_x.bias", "time_mix_ln.bias", None),
        ("feed_forward.time_maa_k", "channel_mix_lerp_k.weight", _squeeze),
        ("feed_forward.time_maa_r", "channel_mix_lerp_r.weight", _squeeze),
        ("feed_forward.key.weight", "channel_mix_key.weight", None),
        ("feed_forward.receptance.weight", "channel_mix_receptance.weight",
         None),
    ]
    return rows


def _rwkv6_fused_lerp(sd, pre, attn="attention", maa="time_maa_"):
    """Stack time_maa_{w,k,v,r,g} -> [5, 1, 1, D] (Rwkv6Model lerp fusion)."""
    parts = []
    for i in ("w", "k", "v", "r", "g"):
        key = f"{pre}.{attn}.{maa}{i}"
        if key not in sd:
            return None
        parts.append(_squeeze(sd[key])[None, :])  # [1, D]
    return np.stack(parts, axis=0)[:, None]  # [5, 1, 1, D]


def _convert_rwkv6(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table

    n_layer = cfg["num_hidden_layers"]
    e = cfg["hidden_size"]
    n_ff = (cfg["intermediate_size"]
            if cfg.get("intermediate_size") is not None
            else int((e * 3.5) // 32 * 32))
    rescale_every = cfg.get("rescale_every", 0)
    meta = [
        ("context_length", 1048576),  # RWKV isn't context limited
        ("embedding_length", e),
        ("block_count", n_layer),
        ("attention.layer_norm_epsilon", cfg["layer_norm_epsilon"]),
        ("rescale_every_n_layers", rescale_every),
        ("wkv.head_size", cfg["head_size"]),
        ("time_mix_extra_dim", 64 if e == 4096 else 32),
        ("time_decay_extra_dim", 128 if e == 4096 else 64),
        ("feed_forward_length", n_ff),
        ("attention.head_count", 0),  # required by llama.cpp, unused
    ]
    model = [
        ("rwkv.embeddings.weight", "token_embd.weight", None),
        ("rwkv.blocks.0.pre_ln.weight", "token_embd_norm.weight", None),
        ("rwkv.blocks.0.pre_ln.bias", "token_embd_norm.bias", None),
        ("rwkv.ln_out.weight", "output_norm.weight", None),
        ("rwkv.ln_out.bias", "output_norm.bias", None),
        ("head.weight", "output.weight", None),
    ]
    rows = _rwkv6_layer_rows()

    def layer_hook(put, il, pre):
        fused = _rwkv6_fused_lerp(sd, pre)
        if fused is not None:
            put(f"blk.{il}.time_mix_lerp_fused.weight", fused)
        # time_mix_output / channel_mix_value divided by 2^(il//rescale)
        s = np.float32(2.0 ** int(il // rescale_every)) if rescale_every \
            else np.float32(1.0)
        for hf, g in (("attention.output.weight", "time_mix_output.weight"),
                      ("feed_forward.value.weight",
                       "channel_mix_value.weight")):
            key = f"{pre}.{hf}"
            if key in sd:
                put(f"blk.{il}.{g}", np.asarray(sd[key], np.float32) / s)

    return _convert_table(d, cfg, sd, out_path, outtype, progress, "rwkv6",
                          dict(meta), model, "rwkv.blocks", rows,
                          n_layer, layer_hook=layer_hook)


# ---------------------------------------------------------------------------
# RWKV6-Qwen2 hybrid (model.layers.*.self_attn HF layout; RWKV6Qwen2Model)
# ---------------------------------------------------------------------------


def _reorder_rkvwg(t):
    """rwkv6qwen2 stores lora groups in rkvwg order; the reference permutes
    to the rwkv6 wkvrg convention (RWKV6Qwen2Model.modify_tensors)."""
    t = np.asarray(t, np.float32)
    g = t.reshape(5, -1, t.shape[-1])
    return np.stack([g[3], g[1], g[2], g[0], g[4]], axis=0).reshape(t.shape)


def _convert_rwkv6qwen2(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table

    n_layer = cfg["num_hidden_layers"]
    e = cfg["hidden_size"]
    n_head = cfg["num_attention_heads"]
    meta = [
        ("context_length", 1048576),
        ("embedding_length", e),
        ("block_count", n_layer),
        ("wkv.head_size", e // n_head),
        ("time_mix_extra_dim",
         cfg.get("lora_rank_tokenshift", 64 if e >= 4096 else 32)),
        ("time_decay_extra_dim",
         cfg.get("lora_rank_decay", 128 if e >= 4096 else 64)),
        ("feed_forward_length", cfg["intermediate_size"]),
        ("attention.layer_norm_rms_epsilon", cfg["rms_norm_eps"]),
        ("token_shift_count", 1),
        ("attention.head_count_kv", cfg["num_key_value_heads"]),
        ("attention.head_count", 0),
    ]
    model = [
        ("model.embed_tokens.weight", "token_embd.weight", None),
        ("model.norm.weight", "output_norm.weight", None),
        ("lm_head.weight", "output.weight", None),
    ]

    def w1_tf(t):
        return _reorder_rkvwg(_T(t))

    def w2_tf(t):
        # transposed like rwkv6, then group-reordered, kept [5, D, ed]
        t = np.transpose(np.asarray(t, np.float32), (0, 2, 1))
        flat = _reorder_rkvwg(t.reshape(-1, t.shape[-1]))
        return flat.reshape(t.shape)

    rows = [
        ("input_layernorm.weight", "attn_norm.weight", None),
        ("self_attn.time_maa_x", "time_mix_lerp_x.weight", _squeeze),
        ("self_attn.time_maa_w1", "time_mix_w1.weight", w1_tf),
        ("self_attn.time_maa_w2", "time_mix_w2.weight", w2_tf),
        ("self_attn.time_decay", "time_mix_decay.weight", _squeeze),
        ("self_attn.time_decay_w1", "time_mix_decay_w1.weight", _T),
        ("self_attn.time_decay_w2", "time_mix_decay_w2.weight", _T),
        ("self_attn.k_proj.weight", "time_mix_key.weight", None),
        ("self_attn.v_proj.weight", "time_mix_value.weight", None),
        ("self_attn.q_proj.weight", "time_mix_receptance.weight", None),
        ("self_attn.gate.weight", "time_mix_gate.weight", None),
        ("self_attn.o_proj.weight", "time_mix_output.weight", None),
        ("post_attention_layernorm.weight", "ffn_norm.weight", None),
        ("mlp.gate_proj.weight", "ffn_gate.weight", None),
        ("mlp.up_proj.weight", "ffn_up.weight", None),
        ("mlp.down_proj.weight", "ffn_down.weight", None),
    ]

    def hook(put, il, pre):
        fused = _rwkv6_fused_lerp(sd, pre, attn="self_attn")
        if fused is not None:
            put(f"blk.{il}.time_mix_lerp_fused.weight", fused)

    return _convert_table(d, cfg, sd, out_path, outtype, progress,
                          "rwkv6qwen2", dict(meta), model, "model.layers",
                          rows, n_layer, layer_hook=hook)


# ---------------------------------------------------------------------------
# RWKV7 (fla-hub model.layers.*.attention HF layout; Rwkv7Model)
# ---------------------------------------------------------------------------


def _rwkv7_lora_meta(cfg):
    e = cfg["hidden_size"]
    if "lora_rank_decay" in cfg or "head_size" in cfg:
        decay = cfg.get("lora_rank_decay")
        iclr = cfg.get("lora_rank_iclr")
        vmix = cfg.get("lora_rank_value_residual_mix")
        gate = cfg.get("lora_rank_gate")
    else:
        decay = cfg.get("decay_low_rank_dim")
        iclr = cfg.get("a_low_rank_dim")
        vmix = cfg.get("v_low_rank_dim")
        gate = cfg.get("gate_low_rank_dim")
    return [
        ("attention.decay_lora_rank",
         decay if decay is not None else _calc_lora_rank(e, 0.5, 1.8)),
        ("attention.iclr_lora_rank",
         iclr if iclr is not None else _calc_lora_rank(e, 0.5, 1.8)),
        ("attention.value_residual_mix_lora_rank",
         vmix if vmix is not None else _calc_lora_rank(e, 0.5, 1.3)),
        ("attention.gate_lora_rank",
         gate if gate is not None else _calc_lora_rank(e, 0.8, 0.6)),
    ]


def _rwkv7_attn_rows(skip_v_on_first=True):
    """(hf_suffix, gguf_suffix, transform, skip_layer0) rwkv7 time-mix rows."""
    sq = _squeeze
    rows = [
        ("attention.w0", "time_mix_w0.weight", sq, False),
        ("attention.w1", "time_mix_w1.weight", _T, False),
        ("attention.w2", "time_mix_w2.weight", _T, False),
        ("attention.a0", "time_mix_a0.weight", sq, False),
        ("attention.a1", "time_mix_a1.weight", _T, False),
        ("attention.a2", "time_mix_a2.weight", _T, False),
        ("attention.v0", "time_mix_v0.weight", sq, skip_v_on_first),
        ("attention.v1", "time_mix_v1.weight", _T, skip_v_on_first),
        ("attention.v2", "time_mix_v2.weight", _T, skip_v_on_first),
        ("attention.g1", "time_mix_g1.weight", _T, False),
        ("attention.g2", "time_mix_g2.weight", _T, False),
        ("attention.k_k", "time_mix_k_k.weight", sq, False),
        ("attention.k_a", "time_mix_k_a.weight", sq, False),
        ("attention.r_k", "time_mix_r_k.weight",
         lambda t: np.asarray(t, np.float32).reshape(-1), False),
        ("attention.key.weight", "time_mix_key.weight", sq, False),
        ("attention.value.weight", "time_mix_value.weight", sq, False),
        ("attention.receptance.weight", "time_mix_receptance.weight", sq,
         False),
        ("attention.ln_x.weight", "time_mix_ln.weight", sq, False),
        ("attention.ln_x.bias", "time_mix_ln.bias", sq, False),
        ("attention.output.weight", "time_mix_output.weight", sq, False),
    ]
    return rows


def _rwkv7_layer_hook(sd, cfg, attn="attention"):
    """Fused x_{r,w,k,v,a,g} lerp stack + layer-0 dummy-v synthesis
    (Rwkv7Model.modify_tensors)."""
    wkv_has_gate = cfg.get("wkv_has_gate", True)
    lerps = ["r", "w", "k", "v", "a", "g"] if wkv_has_gate else \
        ["r", "w", "k", "v", "a"]

    def hook(put, il, pre):
        xx = f"{pre}.{attn}.x_x"
        if xx in sd:  # already concatenated
            t = np.asarray(sd[xx], np.float32).reshape(len(lerps), 1, 1, -1)
            put(f"blk.{il}.time_mix_lerp_fused.weight", t)
        elif all(f"{pre}.{attn}.x_{i}" in sd for i in lerps):
            t = np.stack([np.asarray(sd[f"{pre}.{attn}.x_{i}"], np.float32)
                          for i in lerps], axis=0)
            put(f"blk.{il}.time_mix_lerp_fused.weight", t)
        if il == 0:
            # dummy v0/v1/v2 on the first layer mirror a0/a1/a2
            for a, v, tf in (("a0", "time_mix_v0.weight", _squeeze),
                             ("a1", "time_mix_v1.weight", _T),
                             ("a2", "time_mix_v2.weight", _T)):
                key = f"{pre}.{attn}.{a}"
                if key in sd:
                    put(f"blk.{il}.{v}", tf(sd[key]))
    return hook


def _convert_rwkv7(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table

    n_layer = cfg["num_hidden_layers"]
    e = cfg["hidden_size"]
    head_size = cfg.get("head_size", cfg.get("head_dim"))
    ln_eps = cfg.get("layer_norm_epsilon", cfg.get("norm_eps"))
    n_ff = (cfg["intermediate_size"]
            if cfg.get("intermediate_size") is not None else e * 4)
    meta = ([
        ("context_length", 1048576),
        ("embedding_length", e),
        ("block_count", n_layer),
        ("attention.layer_norm_epsilon", ln_eps),
        ("wkv.head_size", head_size),
    ] + _rwkv7_lora_meta(cfg) + [
        ("feed_forward_length", n_ff),
        ("attention.head_count", 0),
    ])
    model = [
        ("model.embeddings.weight", "token_embd.weight", None),
        ("model.pre_ln.weight", "token_embd_norm.weight", None),
        ("model.pre_ln.bias", "token_embd_norm.bias", None),
        ("model.layers.0.pre_norm.weight", "token_embd_norm.weight", None),
        ("model.layers.0.pre_norm.bias", "token_embd_norm.bias", None),
        ("model.ln_out.weight", "output_norm.weight", None),
        ("model.ln_out.bias", "output_norm.bias", None),
        ("lm_head.weight", "output.weight", None),
    ]
    base = [
        ("ln1.weight", "attn_norm.weight", None),
        ("ln1.bias", "attn_norm.bias", None),
        ("ln2.weight", "attn_norm_2.weight", None),
        ("ln2.bias", "attn_norm_2.bias", None),
        ("feed_forward.x_k", "channel_mix_lerp_k.weight", _squeeze),
        ("feed_forward.key.weight", "channel_mix_key.weight", None),
        ("feed_forward.value.weight", "channel_mix_value.weight", None),
    ]
    attn_rows = _rwkv7_attn_rows()
    hook = _rwkv7_layer_hook(sd, cfg)

    def layer_hook(put, il, pre):
        for hf, g, tf, skip0 in attn_rows:
            if skip0 and il == 0:
                continue  # dummy v0/v1/v2; synthesized from a* by hook
            key = f"{pre}.{hf}"
            if key in sd:
                put(f"blk.{il}.{g}", sd[key], tf)
        hook(put, il, pre)

    return _convert_table(d, cfg, sd, out_path, outtype, progress, "rwkv7",
                          dict(meta), model, "model.layers", base, n_layer,
                          layer_hook=layer_hook)


# ---------------------------------------------------------------------------
# ARWKV7 hybrid (qwen2 shell + rwkv7 time mix; ARwkv7Model)
# ---------------------------------------------------------------------------


def _convert_arwkv7(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table

    n_layer = cfg["num_hidden_layers"]
    e = cfg["hidden_size"]
    wkv_has_gate = cfg.get("wkv_has_gate", True)
    meta = [
        ("context_length", 1048576),
        ("embedding_length", e),
        ("block_count", n_layer),
        ("attention.layer_norm_rms_epsilon", cfg["rms_norm_eps"]),
        ("wkv.head_size", cfg["head_size"]),
        ("attention.decay_lora_rank", 64),
        ("attention.iclr_lora_rank", 64),
        ("attention.value_residual_mix_lora_rank", 32),
        ("attention.gate_lora_rank", 128 if wkv_has_gate else 0),
        ("feed_forward_length", cfg["intermediate_size"]),
        ("token_shift_count", 1),
        ("attention.head_count", 0),
    ]
    model = [
        ("model.embed_tokens.weight", "token_embd.weight", None),
        ("model.norm.weight", "output_norm.weight", None),
        ("lm_head.weight", "output.weight", None),
    ]
    base = [
        ("input_layernorm.weight", "attn_norm.weight", None),
        ("post_attention_layernorm.weight", "ffn_norm.weight", None),
        ("mlp.gate_proj.weight", "ffn_gate.weight", None),
        ("mlp.up_proj.weight", "ffn_up.weight", None),
        ("mlp.down_proj.weight", "ffn_down.weight", None),
    ]
    attn = "self_attn.time_mixer"
    attn_rows = _rwkv7_attn_rows()
    hook = _rwkv7_layer_hook(sd, cfg, attn=attn)

    def layer_hook(put, il, pre):
        for hf, g, tf, skip0 in attn_rows:
            if skip0 and il == 0:
                continue
            key = f"{pre}.{hf.replace('attention', attn, 1)}"
            if key in sd:
                put(f"blk.{il}.{g}", sd[key], tf)
        hook(put, il, pre)

    return _convert_table(d, cfg, sd, out_path, outtype, progress, "arwkv7",
                          dict(meta), model, "model.layers", base, n_layer,
                          layer_hook=layer_hook)


# ---------------------------------------------------------------------------
# Refact (alibi MQA + swiglu with fused kv / gate_up; RefactModel)
# ---------------------------------------------------------------------------


def _convert_refact(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table

    n_embd = cfg["n_embd"]
    n_layer = cfg["n_layer"]
    n_head = cfg["n_head"]
    hd = n_embd // n_head
    # RefactModel.set_gguf_parameters: llama-style 2/3 swiglu rounding
    inner = 4 * n_embd
    hidden = int(2 * inner / 3)
    ff_dim = 256 * ((hidden + 256 - 1) // 256)
    meta = [
        ("context_length", cfg["n_positions"]),
        ("embedding_length", n_embd),
        ("feed_forward_length", ff_dim),
        ("block_count", n_layer),
        ("attention.head_count", n_head),
        ("attention.head_count_kv", 1),
        ("attention.layer_norm_rms_epsilon", cfg["layer_norm_epsilon"]),
    ]
    model = [
        ("transformer.wte.weight", "token_embd.weight", None),
        ("transformer.ln_f.weight", "output_norm.weight", None),
        ("lm_head.weight", "output.weight", None),
    ]
    rows = [
        ("ln_1.weight", "attn_norm.weight", None),
        ("ln_2.weight", "ffn_norm.weight", None),
        ("attn.q.weight", "attn_q.weight", None),
        ("attn.k.weight", "attn_k.weight", None),
        ("attn.v.weight", "attn_v.weight", None),
        ("attn.c_proj.weight", "attn_output.weight", None),
        ("mlp.linear_1.weight", "ffn_gate.weight", None),
        ("mlp.linear_3.weight", "ffn_up.weight", None),
        ("mlp.c_proj.weight", "ffn_down.weight", None),
    ]

    def hook(put, il, pre):
        kv = f"{pre}.attn.kv.weight"
        if kv in sd:  # fused [k; v] with 1 kv head
            t = np.asarray(sd[kv], np.float32)
            put(f"blk.{il}.attn_k.weight", t[:hd])
            put(f"blk.{il}.attn_v.weight", t[hd:])
        gu = f"{pre}.mlp.gate_up_proj.weight"
        if gu in sd:  # fused [gate; up] split at the rounded swiglu dim
            t = np.asarray(sd[gu], np.float32)
            put(f"blk.{il}.ffn_gate.weight", t[:ff_dim])
            put(f"blk.{il}.ffn_up.weight", t[ff_dim:])

    return _convert_table(d, cfg, sd, out_path, outtype, progress, "refact",
                          dict(meta), model, "transformer.h", rows, n_layer,
                          layer_hook=hook)


# ---------------------------------------------------------------------------
# PLM (MLA attention without q lora, no ffn gate; PLMModel)
# ---------------------------------------------------------------------------


def _convert_plm(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table

    n_layer = cfg["num_hidden_layers"]
    meta = _text_meta(cfg) + [
        ("attention.kv_lora_rank", cfg["kv_lora_rank"]),
        ("attention.key_length",
         cfg["qk_nope_head_dim"] + cfg["qk_rope_head_dim"]),
        ("attention.value_length", cfg["v_head_dim"]),
        ("rope.dimension_count", cfg["qk_rope_head_dim"]),
    ]
    model = [
        ("model.embed_tokens.weight", "token_embd.weight", None),
        ("model.norm.weight", "output_norm.weight", None),
        ("lm_head.weight", "output.weight", None),
    ]
    rows = [
        ("input_layernorm.weight", "attn_norm.weight", None),
        ("self_attn.q_proj.weight", "attn_q.weight", None),
        ("self_attn.kv_a_proj_with_mqa.weight", "attn_kv_a_mqa.weight",
         None),
        ("self_attn.kv_a_layernorm.weight", "attn_kv_a_norm.weight", None),
        ("self_attn.kv_b_proj.weight", "attn_kv_b.weight", None),
        ("self_attn.o_proj.weight", "attn_output.weight", None),
        ("post_attention_layernorm.weight", "ffn_norm.weight", None),
        ("mlp.up_proj.weight", "ffn_up.weight", None),
        ("mlp.down_proj.weight", "ffn_down.weight", None),
    ]
    return _convert_table(d, cfg, sd, out_path, outtype, progress, "plm",
                          dict(meta), model, "model.layers", rows, n_layer)


# ---------------------------------------------------------------------------
# WavTokenizer decoder (vocoder; WavTokenizerDecModel)
# ---------------------------------------------------------------------------


def _convert_wavtokenizer(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import GGUFWriter, _cast, _export_tokenizer

    arch = "wavtokenizer-dec"
    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add("general.name", cfg.get("_name_or_path", d.name) or d.name)
    # base TextModel.set_gguf_parameters keys present in a vocoder config
    w.add(f"{arch}.block_count",
          next(cfg[k] for k in ("num_hidden_layers", "n_layer", "n_layers",
                                "num_layers") if k in cfg))
    if cfg.get("n_embd") is not None:
        w.add(f"{arch}.embedding_length", cfg["n_embd"])
    # WavTokenizerDecModel.set_gguf_parameters
    w.add(f"{arch}.vocab_size", cfg["vocab_size"])
    w.add(f"{arch}.features_length", cfg["n_embd_features"])
    w.add(f"{arch}.feed_forward_length", cfg["n_ff"])
    w.add(f"{arch}.attention.group_norm_epsilon", cfg["group_norm_epsilon"])
    w.add(f"{arch}.attention.group_norm_groups", cfg["group_norm_groups"])
    w.add(f"{arch}.posnet.embedding_length", cfg["posnet"]["n_embd"])
    w.add(f"{arch}.posnet.block_count", cfg["posnet"]["n_layer"])
    w.add(f"{arch}.convnext.embedding_length", cfg["convnext"]["n_embd"])
    w.add(f"{arch}.convnext.block_count", cfg["convnext"]["n_layer"])
    w.add(f"{arch}.attention.causal", False)
    _export_tokenizer(w, d, cfg)

    count = [0]

    def put(gname, arr):
        _cast(np.asarray(arr, np.float32), outtype, gname, w)
        count[0] += 1
        if progress:
            progress(gname)

    model_map = {
        "token_embd": "token_embd",            # codebook (identity name)
        "backbone.embed": "conv1d",
        "backbone.norm": "token_embd_norm",
        "backbone.final_layer_norm": "output_norm",
        "head.out": "output",
    }
    posnet_map = {
        "conv1": "conv1", "conv2": "conv2",
        "norm": "attn_norm",  # attention-block norm (tensor_mapping order)
        "norm1": "norm1", "norm2": "norm2",
        "q": "attn_q", "k": "attn_k", "v": "attn_v",
        "proj_out": "attn_output",
    }
    convnext_map = {
        "dwconv": "dw", "norm": "norm",
        "pwconv1": "pw1", "pwconv2": "pw2", "gamma": "gamma",
    }
    skip_suffixes = ("codebook.cluster_size", "codebook.embed_avg",
                     "codebook.inited")
    for name in sd.names():
        if name.endswith(skip_suffixes):
            continue
        t = sd[name]
        stem, _, suffix = name.rpartition(".")
        if suffix not in ("weight", "bias"):
            stem, suffix = name, ""
        # suffix-less params (convnext gamma) keep their bare name, matching
        # the reference's map_tensor_name output
        sfx = f".{suffix}" if suffix else ""
        parts = stem.split(".")
        if stem in model_map:
            put(f"{model_map[stem]}{sfx}", t)
        elif len(parts) >= 4 and parts[1] == "posnet":
            put(f"posnet.{parts[2]}.{posnet_map[parts[3]]}{sfx}", t)
        elif len(parts) >= 4 and parts[1] == "convnext":
            put(f"convnext.{parts[2]}.{convnext_map[parts[3]]}{sfx}", t)
        else:
            raise ValueError(f"unmapped wavtokenizer tensor {name!r}")
    w.write()
    return {"arch": arch, "layers": cfg["posnet"]["n_layer"],
            "tensors": count[0], "output": out_path}


# ---------------------------------------------------------------------------
# Encoder BERTs: jina-bert-v2, nomic-bert(-moe), neo-bert
# ---------------------------------------------------------------------------


def _pooling_meta(d):
    """sentence-transformers modules.json -> pooling_type
    (TextModel._try_set_pooling_type).  1=mean, 2=cls, 3=last."""
    import json as _json
    import pathlib as _pl

    mod = _pl.Path(d) / "modules.json"
    if not mod.is_file():
        return []
    pooling_path = None
    for m in _json.loads(mod.read_text()):
        if m["type"] == "sentence_transformers.models.Pooling":
            pooling_path = m["path"]
            break
    if pooling_path is None:
        return []
    pool = _json.loads(
        (_pl.Path(d) / pooling_path / "config.json").read_text())
    if pool["pooling_mode_mean_tokens"]:
        return [("pooling_type", 1)]
    if pool["pooling_mode_cls_token"]:
        return [("pooling_type", 2)]
    if pool["pooling_mode_lasttoken"]:
        return [("pooling_type", 3)]
    raise NotImplementedError("unsupported pooling mode")


def _cls_meta(cfg):
    labels = cfg.get("id2label")
    if labels and not (len(labels) == 2 and labels.get("0") == "LABEL_0"):
        return labels, [("classifier.output_labels",
                         [v for k, v in sorted(labels.items(),
                                               key=lambda kv: int(kv[0]))])]
    return None, []


def _convert_jina_bert(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table, _wb

    n_layer = cfg["num_hidden_layers"]
    labels, cls_meta = _cls_meta(cfg)
    meta = (_text_meta(cfg) + [("attention.causal", False)]
            + _pooling_meta(d) + cls_meta)
    model = ([("embeddings.word_embeddings.weight", "token_embd.weight",
               None),
              ("embeddings.LayerNorm.weight", "token_embd_norm.weight",
               None),
              ("embeddings.LayerNorm.bias", "token_embd_norm.bias", None),
              ("embeddings.token_type_embeddings.weight",
               "token_types.weight", None)]
             + _wb("classifier.dense", "cls")
             + _wb("classifier.out_proj", "cls.output")
             + _wb("classifier", "cls.output" if labels else "cls"))
    rows = (_wb("attention.self.query", "attn_q")
            + _wb("attention.self.layer_norm_q", "attn_q_norm")
            + _wb("attention.self.key", "attn_k")
            + _wb("attention.self.layer_norm_k", "attn_k_norm")
            + _wb("attention.self.value", "attn_v")
            + _wb("attention.output.dense", "attn_output")
            + _wb("attention.output.LayerNorm", "attn_output_norm")
            + _wb("layer_norm_1", "attn_norm_2")
            + _wb("mixer.Wqkv", "attn_qkv")
            + _wb("mixer.out_proj", "attn_output")
            # GEGLU stores up|gate fused in one tensor (kept fused, the
            # runtime splits); the older split checkpoints use _v/_w
            + _wb("mlp.gated_layers", "ffn_up")
            + _wb("mlp.up_gated_layer", "ffn_up")
            + _wb("mlp.gated_layers_v", "ffn_up")
            + _wb("mlp.gated_layers_w", "ffn_gate")
            + _wb("mlp.wo", "ffn_down")
            + _wb("mlp.down_layer", "ffn_down")
            + _wb("mlp.layernorm", "layer_output_norm")
            + _wb("layer_norm_2", "layer_output_norm")
            + _wb("output.LayerNorm", "layer_output_norm"))
    return _convert_table(d, cfg, sd, out_path, outtype, progress,
                          "jina-bert-v2", dict(meta), model,
                          "encoder.layer", rows, n_layer)


def _convert_nomic_bert(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table, _wb

    is_moe = bool(cfg.get("moe_every_n_layers"))
    arch = "nomic-bert-moe" if is_moe else "nomic-bert"
    n_layer = cfg["n_layer"]
    # NomicBertModel.__init__ trained-length clamp
    npos = cfg["n_positions"]
    mtp = cfg.get("max_trained_positions", 2048)
    if npos == 8192 and mtp == 2048:
        npos = 2048
    elif npos == 2048 and mtp == 2048:
        npos = 512
    else:
        raise ValueError(
            f"unrecognized parameters: n_positions={npos}, "
            f"max_trained_positions={mtp}")
    cfg = dict(cfg, n_positions=npos)
    meta = (_text_meta(cfg) + [("attention.causal", False)]
            + _pooling_meta(d)
            + [("rope.freq_base", cfg["rotary_emb_base"])])
    if is_moe:
        meta += [("moe_every_n_layers", cfg["moe_every_n_layers"]),
                 ("expert_count", cfg["num_experts"]),
                 ("expert_used_count", cfg["moe_top_k"])]
    model = [
        ("embeddings.word_embeddings.weight", "token_embd.weight", None),
        ("embeddings.token_type_embeddings.weight", "token_types.weight",
         None),
        ("embeddings.position_embeddings.weight", "position_embd.weight",
         None),
        ("emb_ln.weight", "token_embd_norm.weight", None),
        ("emb_ln.bias", "token_embd_norm.bias", None),
    ]
    rows = (_wb("attn.Wqkv", "attn_qkv")
            + _wb("attn.out_proj", "attn_output")
            + _wb("norm1", "attn_output_norm")
            + _wb("norm2", "layer_output_norm")
            + _wb("mlp.fc11", "ffn_up")
            + _wb("mlp.fc1", "ffn_up")
            + _wb("mlp.fc12", "ffn_gate")
            + _wb("mlp.fc2", "ffn_down")
            + _wb("mlp.router.layer", "ffn_gate_inp"))

    def hook(put, il, pre):
        # expert stacks: flat [E*F, D] viewed as [E, F, D]; w2 additionally
        # transposed to [E, D, F] (NomicBertModel.modify_tensors)
        n_exp, n_inner, n_embd = (cfg.get("num_experts"), cfg["n_inner"],
                                  cfg["n_embd"])
        w1 = f"{pre}.mlp.experts.mlp.w1"
        if w1 in sd:
            put(f"blk.{il}.ffn_up_exps.weight",
                np.asarray(sd[w1], np.float32).reshape(n_exp, n_inner,
                                                       n_embd))
        w2 = f"{pre}.mlp.experts.mlp.w2"
        if w2 in sd:
            put(f"blk.{il}.ffn_down_exps.weight",
                np.asarray(sd[w2], np.float32).reshape(n_exp, n_inner,
                                                       n_embd)
                .transpose(0, 2, 1))
        # mlp.experts.bias is dropped by the reference

    return _convert_table(d, cfg, sd, out_path, outtype, progress, arch,
                          dict(meta), model, "encoder.layers", rows,
                          n_layer, layer_hook=hook)


def _convert_neo_bert(d, cfg, sd, out_path, outtype, progress) -> dict:
    from .convert_hf import _convert_table, _wb

    n_layer = cfg["num_hidden_layers"]
    labels, cls_meta = _cls_meta(cfg)
    base = [(k, v) for k, v in _text_meta(cfg)
            if k != "feed_forward_length"]
    meta = (base + [
        ("attention.causal", False),
        # NeoBert.set_gguf_parameters: 2/3 swiglu feed-forward, fixed rope
        ("feed_forward_length", int(2 * cfg["intermediate_size"] / 3)),
        ("rope.freq_base", 10000.0),
        ("rope.scaling.type", "none"),
        ("attention.layer_norm_rms_epsilon", cfg.get("norm_eps", 1e-6)),
        ("pooling_type", 2),  # CLS
    ] + cls_meta + _pooling_meta(d))
    model = ([("model.encoder.weight", "token_embd.weight", None),
              ("model.layer_norm.weight", "enc.output_norm.weight", None),
              ("model.layer_norm.bias", "enc.output_norm.bias", None)]
             + _wb("model.dense", "cls")
             + _wb("model.classifier", "cls.output" if labels else "cls")
             + _wb("classifier", "cls.output" if labels else "cls")
             + _wb("dense", "cls"))
    rows = [
        ("attention_norm.weight", "attn_norm.weight", None),
        ("qkv.weight", "attn_qkv.weight", None),
        ("wo.weight", "attn_output.weight", None),
        ("ffn_norm.weight", "ffn_norm.weight", None),
        ("ffn.w12.weight", "ffn_up.weight", None),
        ("ffn.w3.weight", "ffn_down.weight", None),
    ]
    return _convert_table(d, cfg, sd, out_path, outtype, progress,
                          "neo-bert", dict(meta), model,
                          "model.transformer_encoder", rows, n_layer)


CUSTOM_EXT3 = {
    "Rwkv6ForCausalLM": _convert_rwkv6,
    "RWKV6Qwen2ForCausalLM": _convert_rwkv6qwen2,
    "Rwkv7ForCausalLM": _convert_rwkv7,
    "RWKV7ForCausalLM": _convert_rwkv7,
    "RwkvHybridForCausalLM": _convert_arwkv7,
    "GPTRefactForCausalLM": _convert_refact,
    "PLMForCausalLM": _convert_plm,
    "WavTokenizerDec": _convert_wavtokenizer,
    "JinaBertModel": _convert_jina_bert,
    "JinaBertForMaskedLM": _convert_jina_bert,
    "NomicBertModel": _convert_nomic_bert,
    "NeoBERT": _convert_neo_bert,
    "NeoBERTLMHead": _convert_neo_bert,
    "NeoBERTForSequenceClassification": _convert_neo_bert,
}
