"""llamacog-convert-hf — convert a HuggingFace checkpoint directory to GGUF.

Role of the reference's convert_hf_to_gguf.py (root, 6,560 LoC with 89
registered arches): read config.json + safetensors shards, map tensor names
to the GGUF schema, export the tokenizer, write one GGUF. This covers the
decoder families the runtime has graph support for (llama/mistral, mixtral
MoE, qwen2/qwen3, gemma2/gemma3, phi3); safetensors are parsed directly
(numpy memmap — no torch required), with a torch .bin fallback.

Tokenizers: tokenizer.json (byte-level BPE -> gguf "gpt2" model) or
tokenizer.model (sentencepiece -> gguf "llama" model; the proto is parsed
with a minimal wire-format reader so no sentencepiece dependency).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import struct
import sys

import numpy as np

from ..gguf import GGMLType, GGUFWriter
from ..quant import quantize_tensor

# ---------------------------------------------------------------------------
# weight sources
# ---------------------------------------------------------------------------

_ST_DTYPES = {
    "F64": np.dtype("<f8"), "F32": np.dtype("<f4"), "F16": np.dtype("<f2"),
    "BF16": np.dtype("<u2"), "I64": np.dtype("<i8"), "I32": np.dtype("<i4"),
    "I16": np.dtype("<i2"), "I8": np.dtype("i1"), "U8": np.dtype("u1"),
    "BOOL": np.dtype("?"),
}


class _STFile:
    """One safetensors file: 8-byte header length + JSON header + raw data."""

    def __init__(self, path: pathlib.Path):
        self.mm = np.memmap(path, dtype=np.uint8, mode="r")
        (hlen,) = struct.unpack("<Q", self.mm[:8].tobytes())
        self.header = json.loads(self.mm[8 : 8 + hlen].tobytes())
        self.base = 8 + hlen

    def names(self):
        return [k for k in self.header if k != "__metadata__"]

    def get(self, name: str) -> np.ndarray:
        info = self.header[name]
        a, b = info["data_offsets"]
        raw = self.mm[self.base + a : self.base + b]
        arr = raw.view(_ST_DTYPES[info["dtype"]]).reshape(info["shape"])
        if info["dtype"] == "BF16":  # widen via bit-shift into f32
            out = np.zeros(arr.shape, np.uint32)
            out[...] = arr
            return (out << 16).view(np.float32)
        if info["dtype"] == "F16":
            return arr.astype(np.float32)
        return np.asarray(arr)


class StateDict:
    """Lazy name->f32 array view over safetensors shards (or a torch .bin)."""

    def __init__(self, hf_dir: str):
        d = pathlib.Path(hf_dir)
        self._files: dict[str, _STFile] = {}
        self._where: dict[str, str] = {}
        idx = d / "model.safetensors.index.json"
        if idx.exists():
            wmap = json.loads(idx.read_text())["weight_map"]
            for name, fname in wmap.items():
                self._where[name] = fname
            for fname in set(wmap.values()):
                self._files[fname] = _STFile(d / fname)
        elif (d / "model.safetensors").exists():
            f = _STFile(d / "model.safetensors")
            self._files["model.safetensors"] = f
            for name in f.names():
                self._where[name] = "model.safetensors"
        elif (d / "pytorch_model.bin").exists():
            import torch

            sd = torch.load(d / "pytorch_model.bin", map_location="cpu",
                            weights_only=True)
            self._torch = {k: v.float().numpy() for k, v in sd.items()}
            self._where = {k: "" for k in self._torch}
        else:
            raise FileNotFoundError(f"no model weights found in {hf_dir}")

    def __contains__(self, name: str) -> bool:
        return name in self._where

    def names(self):
        return list(self._where)

    def __getitem__(self, name: str) -> np.ndarray:
        if hasattr(self, "_torch"):
            return self._torch[name]
        return self._files[self._where[name]].get(name)


# ---------------------------------------------------------------------------
# tokenizer export
# ---------------------------------------------------------------------------


def _read_spm_proto(path: pathlib.Path):
    """Minimal sentencepiece ModelProto reader: field 1 = repeated
    SentencePiece{1: piece, 2: score, 3: type}."""
    data = path.read_bytes()
    pieces = []

    def varint(buf, i):
        v = s = 0
        while True:
            b = buf[i]
            v |= (b & 0x7F) << s
            i += 1
            if not b & 0x80:
                return v, i
            s += 7

    i = 0
    while i < len(data):
        tag, i = varint(data, i)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:  # SentencePiece message
            ln, i = varint(data, i)
            end = i + ln
            piece, score, ptype = b"", 0.0, 1
            while i < end:
                t2, i = varint(data, i)
                f2, w2 = t2 >> 3, t2 & 7
                if f2 == 1 and w2 == 2:
                    ln2, i = varint(data, i)
                    piece = data[i : i + ln2]
                    i += ln2
                elif f2 == 2 and w2 == 5:
                    (score,) = struct.unpack("<f", data[i : i + 4])
                    i += 4
                elif f2 == 3 and w2 == 0:
                    ptype, i = varint(data, i)
                elif w2 == 0:
                    _, i = varint(data, i)
                elif w2 == 2:
                    ln2, i = varint(data, i)
                    i += ln2
                elif w2 == 5:
                    i += 4
                elif w2 == 1:
                    i += 8
            pieces.append((piece.decode("utf-8", "replace"), score, ptype))
        elif wire == 2:
            ln, i = varint(data, i)
            i += ln
        elif wire == 0:
            _, i = varint(data, i)
        elif wire == 5:
            i += 4
        elif wire == 1:
            i += 8
    return pieces


# sentencepiece type -> gguf token_type (llama.h llama_token_type)
_SPM_TYPE = {1: 1, 2: 2, 3: 3, 4: 6, 5: 5, 6: 4}  # normal,unk,control,byte,unused,user

# model-name heuristics -> tokenizer.ggml.pre presets
_PRE_HINTS = (
    ("qwen", "qwen2"), ("llama-3", "llama-bpe"), ("llama3", "llama-bpe"),
    ("smollm", "smollm"), ("phi", "default"), ("gpt2", "gpt-2"),
    ("deepseek", "deepseek-llm"), ("olmo", "olmo"), ("command", "command-r"),
)


def _export_rwkv_world(w: GGUFWriter, path: pathlib.Path, cfg: dict):
    """rwkv_vocab_v20230424.txt -> tokenizer model "rwkv"
    (reference TextModel._set_vocab_rwkv_world)."""
    import ast

    vocab_size = cfg.get("vocab_size", 65536)
    tokens = ["<s>"]
    ttypes = [3]  # control
    for line in path.read_text(encoding="utf-8").splitlines():
        parts = line.split(" ")
        token = ast.literal_eval(" ".join(parts[1:-1]))
        token = token.encode("utf-8") if isinstance(token, str) else bytes(token)
        tokens.append(repr(token)[2:-1])  # b'\xff' -> \xff escape text
        ttypes.append(1)
    if len(tokens) > vocab_size:
        raise ValueError(
            f"rwkv vocab has {len(tokens)} tokens > vocab_size {vocab_size}")
    for i in range(len(tokens), vocab_size):
        tokens.append(f"[PAD{i}]")
        ttypes.append(5)  # unused
    w.add("tokenizer.ggml.model", "rwkv")
    w.add("tokenizer.ggml.tokens", tokens)
    w.add("tokenizer.ggml.token_type", np.asarray(ttypes, np.int32))
    w.add("tokenizer.ggml.bos_token_id", 0)
    w.add("tokenizer.ggml.eos_token_id", 0)
    w.add("tokenizer.ggml.eot_token_id", 261)  # '\n\n'
    w.add("tokenizer.chat_template", "rwkv-world")


def _export_tokenizer(w: GGUFWriter, d: pathlib.Path, cfg: dict):
    tj = d / "tokenizer.json"
    tm = d / "tokenizer.model"
    rwkv_vocab = d / "rwkv_vocab_v20230424.txt"
    if rwkv_vocab.exists():
        return _export_rwkv_world(w, rwkv_vocab, cfg)
    tok_cfg = {}
    if (d / "tokenizer_config.json").exists():
        tok_cfg = json.loads((d / "tokenizer_config.json").read_text())
    if tm.exists():
        pieces = _read_spm_proto(tm)
        toks = [p for p, _, _ in pieces]
        w.add("tokenizer.ggml.model", "llama")
        w.add("tokenizer.ggml.tokens", toks)
        w.add("tokenizer.ggml.scores", np.asarray([s for _, s, _ in pieces], np.float32))
        w.add("tokenizer.ggml.token_type",
              np.asarray([_SPM_TYPE.get(t, 1) for _, _, t in pieces], np.int32))
        w.add("tokenizer.ggml.add_bos_token", True)
    elif tj.exists():
        tok = json.loads(tj.read_text())
        model = tok.get("model", {})
        if model.get("type") != "BPE":
            print(f"warning: unsupported tokenizer model {model.get('type')}; "
                  "no tokenizer exported", file=sys.stderr)
            return
        vocab = model["vocab"]
        toks = [None] * len(vocab)
        for t, i in vocab.items():
            toks[i] = t
        ttype = np.ones(len(toks), np.int32)
        for at in tok.get("added_tokens", []):
            i = at["id"]
            if i >= len(toks):
                toks.extend([""] * (i + 1 - len(toks)))
                ttype = np.pad(ttype, (0, i + 1 - len(ttype)), constant_values=1)
            toks[i] = at["content"]
            if at.get("special"):
                ttype[i] = 3  # control
        merges = [" ".join(m) if isinstance(m, list) else m
                  for m in model.get("merges", [])]
        name = str(cfg.get("_name_or_path", "")) + " " + str(
            tok_cfg.get("tokenizer_class", "")
        )
        pre = "default"
        for hint, preset in _PRE_HINTS:
            if hint in name.lower():
                pre = preset
                break
        w.add("tokenizer.ggml.model", "gpt2")
        w.add("tokenizer.ggml.pre", pre)
        w.add("tokenizer.ggml.tokens", [t if t is not None else "" for t in toks])
        w.add("tokenizer.ggml.token_type", ttype)
        w.add("tokenizer.ggml.merges", merges)
        w.add("tokenizer.ggml.add_bos_token",
              bool(tok_cfg.get("add_bos_token", False)))
    else:
        print("warning: no tokenizer files found", file=sys.stderr)
        return
    for key, gkey in (("bos_token_id", "tokenizer.ggml.bos_token_id"),
                      ("eos_token_id", "tokenizer.ggml.eos_token_id"),
                      ("pad_token_id", "tokenizer.ggml.padding_token_id")):
        v = cfg.get(key)
        if isinstance(v, list):
            v = v[0]
        if v is not None:
            w.add(gkey, int(v))
    ct = tok_cfg.get("chat_template")
    if isinstance(ct, str):
        w.add("tokenizer.chat_template", ct)


# ---------------------------------------------------------------------------
# architecture mappings
# ---------------------------------------------------------------------------

_LAYER_MAP = {
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.q_proj.bias": "attn_q.bias",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.k_proj.bias": "attn_k.bias",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.v_proj.bias": "attn_v.bias",
    "self_attn.o_proj.weight": "attn_output.weight",
    "self_attn.o_proj.bias": "attn_output.bias",
    "self_attn.q_norm.weight": "attn_q_norm.weight",
    "self_attn.k_norm.weight": "attn_k_norm.weight",
    "self_attn.qkv_proj.weight": "attn_qkv.weight",  # phi3 fused
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
    "mlp.gate_up_proj.weight": "ffn_up.weight",  # phi3 fused [gate; up]
    "input_layernorm.weight": "attn_norm.weight",
    "input_layernorm.bias": "attn_norm.bias",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "post_attention_layernorm.bias": "ffn_norm.bias",
}

_GEMMA_NORMS = {
    "input_layernorm.weight": "attn_norm.weight",
    "post_attention_layernorm.weight": "post_attention_norm.weight",
    "pre_feedforward_layernorm.weight": "ffn_norm.weight",
    "post_feedforward_layernorm.weight": "post_ffw_norm.weight",
}

# per-gguf-arch additions to the generic layer map
_ARCH_EXTRA_MAPS = {
    # glm4: sandwich norms after the attention/ffn branches
    "glm4": {
        "post_self_attn_layernorm.weight": "post_attention_norm.weight",
        "post_mlp_layernorm.weight": "post_ffw_norm.weight",
    },
    # olmo2: post-norm design — the HF "post_attention_layernorm" is the
    # POST-attention branch norm, not a pre-FFN norm (reference Olmo2Model)
    "olmo2": {
        "post_attention_layernorm.weight": "post_attention_norm.weight",
        "post_feedforward_layernorm.weight": "post_ffw_norm.weight",
    },
    # starcoder2: GPT-style c_fc/c_proj MLP names with biases
    "starcoder2": {
        "mlp.c_fc.weight": "ffn_up.weight",
        "mlp.c_fc.bias": "ffn_up.bias",
        "mlp.c_proj.weight": "ffn_down.weight",
        "mlp.c_proj.bias": "ffn_down.bias",
    },
}

# gemma1/2 tie embeddings; the reference GemmaModel/Gemma2Model classes drop
# lm_head.weight unconditionally (Gemma3Model keeps it)
_SKIP_LM_HEAD = {"gemma", "gemma2"}

# HF architectures[0] -> (gguf arch, norm style). Norm styles:
#   None    — norms stored as-is
#   "bump"  — norms stored +1 (gemma1 / nemotron layernorm1p), standard names
#   "gemma" — +1 norms AND gemma2/3's 4-norm block (post_attention_layernorm
#             is a POST-attention norm, plus pre/post feed-forward norms)
_ARCHES = {
    "LlamaForCausalLM": ("llama", None),
    "LlamaModel": ("llama", None),
    "LLaMAForCausalLM": ("llama", None),
    "VLlama3ForCausalLM": ("llama", None),
    "InternLM3ForCausalLM": ("llama", None),
    "MistralForCausalLM": ("llama", None),
    "MixtralForCausalLM": ("llama", None),
    "Qwen2Model": ("qwen2", None),
    "Qwen2ForCausalLM": ("qwen2", None),
    "Qwen3ForCausalLM": ("qwen3", None),
    "Qwen2MoeForCausalLM": ("qwen2moe", None),
    "Qwen3MoeForCausalLM": ("qwen3moe", None),
    "GemmaForCausalLM": ("gemma", "bump"),
    "Gemma2ForCausalLM": ("gemma2", "gemma"),
    "Gemma3ForCausalLM": ("gemma3", "gemma"),
    "Gemma3ForConditionalGeneration": ("gemma3", "gemma"),
    "Phi3ForCausalLM": ("phi3", None),
    "OlmoForCausalLM": ("olmo", None),
    "Olmo2ForCausalLM": ("olmo2", None),
    "CohereForCausalLM": ("command-r", None),
    "Starcoder2ForCausalLM": ("starcoder2", None),
    "StableLmForCausalLM": ("stablelm", None),
    "StableLMEpochForCausalLM": ("stablelm", None),
    "LlavaStableLMEpochForCausalLM": ("stablelm", None),
    "OLMoForCausalLM": ("olmo", None),
    "GraniteForCausalLM": ("granite", None),
    "GraniteMoeForCausalLM": ("granitemoe", None),
    "GraniteMoeSharedForCausalLM": ("granitemoe", None),
    "ArceeForCausalLM": ("arcee", None),
    "Cohere2ForCausalLM": ("cohere2", None),
    "Glm4ForCausalLM": ("glm4", None),
    # nemotron: layernorm1p — norms stored +1 but standard pre-norm block
    # (reference NemotronModel.modify_tensors, convert_hf_to_gguf.py:5150)
    "NemotronForCausalLM": ("nemotron", "bump"),
    "OlmoeForCausalLM": ("olmoe", None),
    # transformers GlmForCausalLM is registered as arch chatglm by the
    # reference (convert_hf_to_gguf.py:5731)
    "GlmForCausalLM": ("chatglm", None),
    # qwen2vl text side (M-RoPE sections; reference Qwen2VLModel :2739)
    "Qwen2VLModel": ("qwen2vl", None),
    "Qwen2VLForConditionalGeneration": ("qwen2vl", None),
    "Qwen2_5_VLForConditionalGeneration": ("qwen2vl", None),
    "Qwen2_5OmniModel": ("qwen2vl", None),
}

# multimodal wrapper arches: text side = inner text model with the encoder/
# projector tensors dropped and prefixes stripped (reference LlamaModel /
# Qwen2Model / Qwen2VLModel modify_tensors prefix handling)
_MM_TEXT_WRAPPERS = {
    "LlavaForConditionalGeneration": (
        "MistralForCausalLM", [("language_model.", "")],
        ("vision_tower.", "multi_modal_projector.")),
    "Mistral3ForConditionalGeneration": (
        "MistralForCausalLM", [("language_model.", "")],
        ("vision_tower.", "multi_modal_projector.")),
    "Idefics3ForConditionalGeneration": (
        "VLlama3ForCausalLM", [("model.text_model.", "model.")],
        ("model.vision_model.", "model.connector.")),
    "SmolVLMForConditionalGeneration": (
        "VLlama3ForCausalLM", [("model.text_model.", "model.")],
        ("model.vision_model.", "model.connector.")),
    "Qwen2AudioForConditionalGeneration": (
        "Qwen2ForCausalLM", [("language_model.", "")],
        ("audio_tower.", "multi_modal_projector.")),
    "Qwen2_5OmniModel": (
        "Qwen2_5OmniModel", [("thinker.", "")],
        ("visual.", "audio_tower.", "talker.", "token2wav.",
         "thinker.visual.", "thinker.audio_tower.")),
    "Qwen2VLForConditionalGeneration": (
        "Qwen2VLForConditionalGeneration", [], ("visual.",)),
    "Qwen2VLModel": ("Qwen2VLModel", [], ("visual.",)),
    "Qwen2_5_VLForConditionalGeneration": (
        "Qwen2_5_VLForConditionalGeneration", [], ("visual.",)),
}


class _PrefixView:
    """StateDict view: drop skip-prefixed tensors, strip/replace prefixes."""

    def __init__(self, sd, renames, skips):
        self._sd = sd
        self._map = {}
        for n in sd.names():
            if any(n.startswith(s) for s in skips):
                continue
            out = n
            for old, new in renames:
                if out.startswith(old):
                    out = new + out[len(old):]
                    break
            self._map[out] = n

    def names(self):
        return list(self._map)

    def __contains__(self, n):
        return n in self._map

    def __getitem__(self, n):
        return self._sd[self._map[n]]


# gguf arches whose reference converter class derives from LlamaModel and
# therefore always writes rope.dimension_count (= head_dim)
_ROPE_DIM_ARCHES = {"llama", "granite", "granitemoe", "arcee", "deci"}


def permute_rope_rows(arr: np.ndarray, n_head: int) -> np.ndarray:
    """LlamaModel.permute (reference convert_hf_to_gguf.py:1911): reorder
    q/k output rows so ggml's NORM (interleaved) rope reproduces HF's
    rotate-half semantics."""
    d = arr.shape[0] // n_head // 2
    return (arr.reshape(n_head, 2, d, *arr.shape[1:])
            .swapaxes(1, 2)
            .reshape(arr.shape))


def _cast(arr: np.ndarray, outtype: str, name: str, w: GGUFWriter):
    if arr.ndim < 2 or "norm" in name or outtype == "f32":
        w.add_tensor(name, arr.astype(np.float32))
    elif outtype == "f16":
        w.add_tensor(name, arr.astype(np.float16))
    elif outtype == "bf16":
        f = arr.astype(np.float32).view(np.uint32)
        w.add_tensor(name, ((f + 0x7FFF + ((f >> 16) & 1)) >> 16).astype(np.uint16))
    elif outtype == "q8_0":
        if arr.shape[-1] % 32:
            w.add_tensor(name, arr.astype(np.float16))
        else:
            raw = quantize_tensor(arr.astype(np.float32), GGMLType.Q8_0)
            w.add_tensor(name, raw.tobytes(), shape=arr.shape,
                         ggml_type=GGMLType.Q8_0)
    else:
        raise ValueError(f"unknown outtype {outtype}")


def convert(hf_dir: str, out_path: str, outtype: str = "f16",
            progress=None) -> dict:
    d = pathlib.Path(hf_dir)
    cfg = json.loads((d / "config.json").read_text())
    if "text_config" in cfg and "architectures" in cfg:  # gemma3 multimodal
        arch_name = cfg["architectures"][0]
        if arch_name in _ARCHES and _ARCHES[arch_name][0] == "gemma3":
            inner = dict(cfg["text_config"])
            inner["architectures"] = cfg["architectures"]
            cfg = inner
    arch_name = cfg["architectures"][0]
    sd = StateDict(hf_dir)
    if arch_name in _MM_TEXT_WRAPPERS:
        default_inner, renames, skips = _MM_TEXT_WRAPPERS[arch_name]
        tc = (cfg.get("text_config")
              or (cfg.get("thinker_config") or {}).get("text_config") or {})
        # reference picks the TEXT class from text_config.architectures
        # when present (convert_hf_to_gguf.py:6462)
        inner = (tc.get("architectures") or [default_inner])[0]
        cfg = {**cfg, **tc}
        cfg["architectures"] = [inner]
        arch_name = inner
        sd = _PrefixView(sd, renames, skips)
    if arch_name in ("MambaForCausalLM", "MambaLMHeadModel",
                     "FalconMambaForCausalLM"):
        return _convert_mamba(d, cfg, sd, out_path, outtype, progress)
    if arch_name in _CUSTOM:
        return _CUSTOM[arch_name](d, cfg, sd, out_path, outtype, progress)
    if arch_name not in _ARCHES:
        raise NotImplementedError(
            f"{arch_name} not supported "
            f"(have: {sorted(_ARCHES) + sorted(_CUSTOM) + ['MambaForCausalLM']})"
        )
    arch, style = _ARCHES[arch_name]
    gemma = style in ("bump", "gemma")
    w = GGUFWriter(out_path)

    n_layer = cfg["num_hidden_layers"]
    n_head = cfg["num_attention_heads"]
    n_kv = cfg.get("num_key_value_heads", n_head)
    w.add("general.architecture", arch)
    w.add("general.name", cfg.get("_name_or_path", d.name) or d.name)
    w.add(f"{arch}.context_length", cfg.get("max_position_embeddings", 4096))
    w.add(f"{arch}.embedding_length", cfg["hidden_size"])
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.feed_forward_length", cfg["intermediate_size"])
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_kv)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon",
          cfg.get("rms_norm_eps", cfg.get("layer_norm_eps", 1e-6)))
    # LayerNorm arches spell the eps differently per family (reference
    # find_hparam chains); olmo hardcodes 1e-5 (OlmoModel.set_gguf_parameters)
    ln_eps = next((cfg[k] for k in ("layer_norm_eps", "layer_norm_epsilon",
                                    "norm_epsilon", "norm_eps") if cfg.get(k) is not None),
                  1e-5 if arch == "olmo" else None)
    if ln_eps is not None:
        w.add(f"{arch}.attention.layer_norm_epsilon", ln_eps)
    w.add(f"{arch}.rope.freq_base", float(cfg.get("rope_theta", 10000.0)))
    w.add(f"{arch}.vocab_size", cfg["vocab_size"])
    if cfg.get("head_dim") or arch == "llama":
        # transformers' LlamaConfig defaults head_dim = E // n_head, so the
        # reference (loading via AutoConfig) always writes key/value_length
        # for llama-family checkpoints even when config.json omits head_dim
        hd = cfg.get("head_dim") or cfg["hidden_size"] // n_head
        w.add(f"{arch}.attention.key_length", hd)
        w.add(f"{arch}.attention.value_length", hd)
    if cfg.get("sliding_window") and arch in ("gemma2", "gemma3", "cohere2"):
        w.add(f"{arch}.attention.sliding_window", cfg["sliding_window"])
    if cfg.get("logit_scale"):  # command-r / cohere2
        w.add(f"{arch}.logit_scale", float(cfg["logit_scale"]))
    if cfg.get("attn_logit_softcapping"):
        w.add(f"{arch}.attn_logit_softcapping", cfg["attn_logit_softcapping"])
    if cfg.get("final_logit_softcapping"):
        w.add(f"{arch}.final_logit_softcapping", cfg["final_logit_softcapping"])
    if cfg.get("num_local_experts"):
        w.add(f"{arch}.expert_count", cfg["num_local_experts"])
        w.add(f"{arch}.expert_used_count", cfg.get("num_experts_per_tok", 2))
        # HF Mixtral renormalizes the top-k router weights
        w.add(f"{arch}.expert_weights_norm", True)
    pr = next((cfg[k] for k in ("partial_rotary_factor", "rope_pct",
                                "rotary_pct", "rope_percent")
               if cfg.get(k) is not None), None)
    if pr is not None:
        hd = cfg.get("head_dim") or (cfg["hidden_size"] // n_head)
        w.add(f"{arch}.rope.dimension_count", int(hd * pr))
    elif arch in _ROPE_DIM_ARCHES:
        # llama-family classes always record the full rotary dim
        # (reference LlamaModel.set_gguf_parameters)
        hd = cfg.get("head_dim") or (cfg["hidden_size"] // n_head)
        w.add(f"{arch}.rope.dimension_count", int(hd))
    if cfg.get("num_experts"):  # olmoe / qwen2moe / qwen3moe
        w.add(f"{arch}.expert_count", cfg["num_experts"])
        w.add(f"{arch}.expert_used_count", cfg.get("num_experts_per_tok", 8))
        w.add(f"{arch}.expert_weights_norm", bool(cfg.get("norm_topk_prob", False)))
    if cfg.get("moe_intermediate_size"):
        w.add(f"{arch}.expert_feed_forward_length", cfg["moe_intermediate_size"])
    if cfg.get("shared_expert_intermediate_size"):
        w.add(f"{arch}.expert_shared_feed_forward_length",
              cfg["shared_expert_intermediate_size"])
    if cfg.get("clip_qkv"):  # olmo
        w.add(f"{arch}.attention.clamp_kqv", float(cfg["clip_qkv"]))
    if arch in ("granite", "granitemoe"):
        # granite multipliers (reference GraniteModel.set_gguf_parameters)
        for hf_key, gkey in (("logits_scaling", "logit_scale"),
                             ("residual_multiplier", "residual_scale"),
                             ("embedding_multiplier", "embedding_scale"),
                             ("attention_multiplier", "attention.scale")):
            if cfg.get(hf_key) is not None:
                w.add(f"{arch}.{gkey}", float(cfg[hf_key]))
    if arch == "granitemoe" and cfg.get("shared_intermediate_size"):
        w.add(f"{arch}.expert_shared_feed_forward_length",
              cfg["shared_intermediate_size"])
    rs = cfg.get("rope_scaling") or {}
    if rs.get("rope_type", rs.get("type")) in ("linear", "yarn"):
        w.add(f"{arch}.rope.scaling.type", rs.get("rope_type", rs.get("type")))
        w.add(f"{arch}.rope.scaling.factor", rs.get("factor", 1.0))
        if rs.get("original_max_position_embeddings"):
            w.add(f"{arch}.rope.scaling.original_context_length",
                  rs["original_max_position_embeddings"])
    elif arch in ("command-r", "cohere2", "nemotron"):
        # these classes record an explicit "none" when unscaled
        w.add(f"{arch}.rope.scaling.type", "none")
    if arch == "phi3":
        # Phi3MiniModel always records the original context length and a
        # sliding window (0 marks Phi-4)
        w.add(f"{arch}.rope.scaling.original_context_length",
              cfg.get("original_max_position_embeddings",
                      cfg.get("max_position_embeddings", 4096)))
        w.add(f"{arch}.attention.sliding_window", cfg.get("sliding_window") or 0)
    if arch == "stablelm":
        w.add(f"{arch}.use_parallel_residual",
              bool(cfg.get("use_parallel_residual", True)))
    if arch == "qwen2vl":
        # M-RoPE sections, zero-padded to 4 (reference Qwen2VLModel :2744)
        sec = list(rs.get("mrope_section", []))
        sec += [0] * max(0, 4 - len(sec))
        w.add(f"{arch}.rope.dimension_sections", sec)

    _export_tokenizer(w, d, cfg)

    def put(gname, arr):
        _cast(np.asarray(arr), outtype, gname, w)
        if progress:
            progress(gname)

    def bump(x):  # gemma stores norms as (1 + w)
        return x + 1.0

    if (rs.get("rope_type", rs.get("type", "")) or "").lower() == "llama3":
        # llama-3.1 rope: per-dim smoothing factors stored as a tensor
        # (reference LlamaModel.generate_extra_tensors)
        hd = cfg.get("head_dim") or (cfg["hidden_size"] // n_head)
        base = cfg.get("rope_theta", 10000.0)
        freqs = 1.0 / base ** (np.arange(0, hd, 2, dtype=np.float32) / hd)
        factor = rs.get("factor", 8.0)
        lo_f, hi_f = rs.get("low_freq_factor", 1.0), rs.get("high_freq_factor", 4.0)
        old_ctx = cfg.get("original_max_position_embeddings", 8192)
        wavelen = 2 * np.pi / freqs
        smooth = (old_ctx / wavelen - lo_f) / (hi_f - lo_f)
        fac = np.where(wavelen < old_ctx / hi_f, 1.0,
                       np.where(wavelen > old_ctx / lo_f, factor,
                                1.0 / ((1.0 - smooth) / factor + smooth)))
        put("rope_freqs.weight", fac.astype(np.float32))

    put("token_embd.weight", sd["model.embed_tokens.weight"])
    if "model.norm.weight" in sd:  # absent for olmo's non-parametric norms
        onorm = np.asarray(sd["model.norm.weight"], np.float32)
        put("output_norm.weight", bump(onorm) if gemma else onorm)
    if "model.norm.bias" in sd:  # LayerNorm arches (stablelm/nemotron)
        put("output_norm.bias", sd["model.norm.bias"])
    if ("lm_head.weight" in sd and not cfg.get("tie_word_embeddings", False)
            and arch not in _SKIP_LM_HEAD):
        put("output.weight", sd["lm_head.weight"])

    lmap = dict(_LAYER_MAP)
    if style == "gemma":
        lmap.update(_GEMMA_NORMS)
    lmap.update(_ARCH_EXTRA_MAPS.get(arch, {}))
    # ggml-NORM-rope arches (llama family): permute q/k rows so interleaved
    # rope on the stored tensors reproduces HF rotate-half (reference
    # LlamaModel.modify_tensors, convert_hf_to_gguf.py:1938-1941)
    norm_rope = arch in ("llama", "granite", "granitemoe", "minicpm", "deci",
                         "olmo", "arcee")
    count = 0
    for il in range(n_layer):
        pre = f"model.layers.{il}"
        for hf_name, gname in lmap.items():
            key = f"{pre}.{hf_name}"
            if key not in sd:
                continue
            t = np.asarray(sd[key], np.float32)
            if gemma and gname.endswith("norm.weight"):
                t = bump(t)
            if norm_rope and hf_name.startswith("self_attn.q_proj"):
                t = permute_rope_rows(t, n_head)
            elif norm_rope and hf_name.startswith("self_attn.k_proj"):
                t = permute_rope_rows(t, n_kv)
            put(f"blk.{il}.{gname}", t)
            count += 1
        if f"{pre}.mlp.gate.weight" in sd:  # olmoe/qwen-moe MoE experts
            put(f"blk.{il}.ffn_gate_inp.weight", sd[f"{pre}.mlp.gate.weight"])
            n_exp = cfg["num_experts"]
            for gname, hf_w in (("ffn_gate_exps", "gate_proj"),
                                ("ffn_down_exps", "down_proj"),
                                ("ffn_up_exps", "up_proj")):
                stacked = np.stack([
                    np.asarray(sd[f"{pre}.mlp.experts.{e}.{hf_w}.weight"],
                               np.float32)
                    for e in range(n_exp)
                ])
                put(f"blk.{il}.{gname}.weight", stacked)
        gm = f"{pre}.block_sparse_moe.input_linear.weight"
        if gm in sd:  # granitemoe: JetMoe-style fused [E, 2F, D] input_linear
            ff = cfg["intermediate_size"]
            iw = np.asarray(sd[gm], np.float32)
            put(f"blk.{il}.ffn_gate_exps.weight", iw[:, :ff])
            put(f"blk.{il}.ffn_up_exps.weight", iw[:, ff:])
            put(f"blk.{il}.ffn_down_exps.weight",
                sd[f"{pre}.block_sparse_moe.output_linear.weight"])
            put(f"blk.{il}.ffn_gate_inp.weight",
                sd[f"{pre}.block_sparse_moe.router.layer.weight"])
        shm = f"{pre}.shared_mlp.input_linear.weight"
        if shm in sd:  # granitemoeshared
            sff = cfg["shared_intermediate_size"]
            siw = np.asarray(sd[shm], np.float32)
            put(f"blk.{il}.ffn_gate_shexp.weight", siw[:sff])
            put(f"blk.{il}.ffn_up_shexp.weight", siw[sff:])
            put(f"blk.{il}.ffn_down_shexp.weight",
                sd[f"{pre}.shared_mlp.output_linear.weight"])
        if f"{pre}.mlp.shared_expert.gate_proj.weight" in sd:  # qwen2moe
            for gname, hf_w in (("ffn_gate_shexp", "gate_proj"),
                                ("ffn_up_shexp", "up_proj"),
                                ("ffn_down_shexp", "down_proj")):
                put(f"blk.{il}.{gname}.weight",
                    sd[f"{pre}.mlp.shared_expert.{hf_w}.weight"])
            put(f"blk.{il}.ffn_gate_inp_shexp.weight",
                sd[f"{pre}.mlp.shared_expert_gate.weight"])
        gate_inp = f"{pre}.block_sparse_moe.gate.weight"
        if gate_inp in sd:  # mixtral MoE experts
            put(f"blk.{il}.ffn_gate_inp.weight", sd[gate_inp])
            n_exp = cfg["num_local_experts"]
            for gname, hf_w in (("ffn_gate_exps", "w1"), ("ffn_down_exps", "w2"),
                                ("ffn_up_exps", "w3")):
                stacked = np.stack([
                    np.asarray(sd[f"{pre}.block_sparse_moe.experts.{e}.{hf_w}.weight"],
                               np.float32)
                    for e in range(n_exp)
                ])
                put(f"blk.{il}.{gname}.weight", stacked)
    w.write()
    return {"arch": arch, "layers": n_layer, "tensors": count, "output": out_path}


# ---------------------------------------------------------------------------
# GPT-family custom converters (fused-QKV / non-"model.layers" checkpoints)
# ---------------------------------------------------------------------------


def _qkv_headwise(t: np.ndarray, n_head: int) -> np.ndarray:
    """neox/bloom fused QKV stored per-head interleaved [h,(q,k,v),d] ->
    contiguous [q; k; v] rows (reference GPTNeoXModel/BloomModel
    modify_tensors, convert_hf_to_gguf.py:1258-1292,1316-1352)."""
    hd = t.shape[0] // n_head // 3
    r = t.reshape(n_head, 3, hd, *t.shape[1:])
    return np.concatenate(
        [r[:, i].reshape(n_head * hd, *t.shape[1:]) for i in range(3)], axis=0
    )


def _qkv_falcon(t: np.ndarray, n_head: int, n_kv: int) -> np.ndarray:
    """falcon fused QKV: n_kv groups of (n_head/n_kv queries, k, v) ->
    contiguous [q; k; v] (reference FalconModel.modify_tensors
    convert_hf_to_gguf.py:1647-1672, the "jploski" transform)."""
    hd = t.shape[0] // (n_head + 2 * n_kv)
    rest = t.shape[1:]
    qkv = t.reshape(n_kv, n_head // n_kv + 2, hd, *rest)
    q = qkv[:, :-2].reshape(n_head * hd, *rest)
    k = qkv[:, -2].reshape(n_kv * hd, *rest)
    v = qkv[:, -1].reshape(n_kv * hd, *rest)
    return np.concatenate([q, k, v], axis=0)


# GGUF keys llama.cpp reads as f32; JSON configs often carry them as ints
# (e.g. rope_freq_constant: 10000), which would otherwise serialize as u32
_FLOAT_KEY_SUFFIXES = (
    ".freq_base", ".freq_scale", "_epsilon", "scaling.factor",
    ".attn_factor", ".yarn_log_multiplier", "_scale", "logit_scale",
    "_softcapping", "attention.scale",
)


def _coerce_meta(key: str, v):
    if isinstance(v, bool) or not isinstance(v, int):
        return v
    if any(key.endswith(sfx) for sfx in _FLOAT_KEY_SUFFIXES):
        return float(v)
    return v


def _convert_table(d, cfg, sd, out_path, outtype, progress, arch, meta,
                   model_map, layer_prefix, layer_map, n_layer,
                   layer_hook=None) -> dict:
    """Shared driver: write metadata, tokenizer, then map tensors through
    per-arch (hf_name, gguf_name, transform) tables, skipping absent ones
    (bias-free variants). layer_hook(put, il, prefix) handles tensors the
    flat table can't express (stacked/split experts)."""
    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add("general.name", cfg.get("_name_or_path", d.name) or d.name)
    for k, v in meta.items():
        w.add(f"{arch}.{k}", _coerce_meta(k, v))
    w.add(f"{arch}.vocab_size", cfg["vocab_size"])
    _export_tokenizer(w, d, cfg)
    count = [0]

    def put(gname, arr, tf=None):
        t = np.asarray(arr, np.float32)
        _cast(tf(t) if tf else t, outtype, gname, w)
        count[0] += 1
        if progress:
            progress(gname)

    for hf, gname, tf in model_map:
        if hf in sd:
            put(gname, sd[hf], tf)
    for il in range(n_layer):
        for hf, gname, tf in layer_map:
            key = f"{layer_prefix}.{il}.{hf}"
            if key in sd:
                put(f"blk.{il}.{gname}", sd[key], tf)
        if layer_hook is not None:
            layer_hook(put, il, f"{layer_prefix}.{il}")
    w.write()
    return {"arch": arch, "layers": n_layer, "tensors": count[0],
            "output": out_path}


def _wb(hf: str, g: str, tf=None):
    """weight+bias table rows for one projection/norm."""
    return [(f"{hf}.weight", f"{g}.weight", tf), (f"{hf}.bias", f"{g}.bias", tf)]


def _convert_gpt2(d, cfg, sd, out_path, outtype, progress) -> dict:
    n_embd, n_head, n_layer = cfg["n_embd"], cfg["n_head"], cfg["n_layer"]
    meta = {
        "context_length": cfg.get("n_ctx") or cfg.get("n_positions", 1024),
        "embedding_length": n_embd, "block_count": n_layer,
        "feed_forward_length": cfg.get("n_inner") or 4 * n_embd,
        "attention.head_count": n_head, "attention.head_count_kv": n_head,
        "attention.layer_norm_epsilon": cfg.get("layer_norm_epsilon", 1e-5),
    }
    T = np.transpose  # HF Conv1D stores [in, out]
    layer = (_wb("ln_1", "attn_norm")
             + [("attn.c_attn.weight", "attn_qkv.weight", T),
                ("attn.c_attn.bias", "attn_qkv.bias", None),
                ("attn.c_proj.weight", "attn_output.weight", T),
                ("attn.c_proj.bias", "attn_output.bias", None)]
             + _wb("ln_2", "ffn_norm")
             + [("mlp.c_fc.weight", "ffn_up.weight", T),
                ("mlp.c_fc.bias", "ffn_up.bias", None),
                ("mlp.c_proj.weight", "ffn_down.weight", T),
                ("mlp.c_proj.bias", "ffn_down.bias", None)])
    model = ([("transformer.wte.weight", "token_embd.weight", None),
              ("transformer.wpe.weight", "position_embd.weight", None)]
             + _wb("transformer.ln_f", "output_norm"))
    return _convert_table(d, cfg, sd, out_path, outtype, progress, "gpt2",
                          meta, model, "transformer.h", layer, n_layer)


def _convert_gptneox(d, cfg, sd, out_path, outtype, progress) -> dict:
    n_embd, n_layer = cfg["hidden_size"], cfg["num_hidden_layers"]
    n_head = cfg["num_attention_heads"]
    meta = {
        "context_length": cfg.get("max_position_embeddings", 2048),
        "embedding_length": n_embd, "block_count": n_layer,
        "feed_forward_length": cfg["intermediate_size"],
        "attention.head_count": n_head, "attention.head_count_kv": n_head,
        "attention.layer_norm_epsilon": cfg.get("layer_norm_eps", 1e-5),
        "rope.dimension_count":
            int(cfg.get("rotary_pct", 0.25) * (n_embd // n_head)),
        "rope.freq_base": cfg.get("rotary_emb_base", cfg.get("rope_theta", 10000.0)),
        "use_parallel_residual": bool(cfg.get("use_parallel_residual", True)),
    }
    qkv = lambda t: _qkv_headwise(t, n_head)  # noqa: E731
    layer = (_wb("input_layernorm", "attn_norm")
             + _wb("attention.query_key_value", "attn_qkv", qkv)
             + _wb("attention.dense", "attn_output")
             + _wb("post_attention_layernorm", "ffn_norm")
             + _wb("mlp.dense_h_to_4h", "ffn_up")
             + _wb("mlp.dense_4h_to_h", "ffn_down"))
    model = ([("gpt_neox.embed_in.weight", "token_embd.weight", None),
              ("embed_out.weight", "output.weight", None)]
             + _wb("gpt_neox.final_layer_norm", "output_norm"))
    return _convert_table(d, cfg, sd, out_path, outtype, progress, "gptneox",
                          meta, model, "gpt_neox.layers", layer, n_layer)


def _convert_phi2(d, cfg, sd, out_path, outtype, progress) -> dict:
    n_embd, n_layer = cfg["hidden_size"], cfg["num_hidden_layers"]
    n_head = cfg["num_attention_heads"]
    meta = {
        "context_length": cfg.get("max_position_embeddings", 2048),
        "embedding_length": n_embd, "block_count": n_layer,
        "feed_forward_length": cfg.get("intermediate_size") or 4 * n_embd,
        "attention.head_count": n_head, "attention.head_count_kv": n_head,
        "attention.layer_norm_epsilon": cfg.get("layer_norm_eps", 1e-5),
        "rope.dimension_count":
            int(cfg.get("partial_rotary_factor", 0.5) * (n_embd // n_head)),
        "rope.freq_base": cfg.get("rope_theta", 10000.0),
    }
    layer = (_wb("input_layernorm", "attn_norm")
             + _wb("self_attn.q_proj", "attn_q")
             + _wb("self_attn.k_proj", "attn_k")
             + _wb("self_attn.v_proj", "attn_v")
             + _wb("self_attn.dense", "attn_output")
             + _wb("mlp.fc1", "ffn_up")
             + _wb("mlp.fc2", "ffn_down"))
    model = ([("model.embed_tokens.weight", "token_embd.weight", None)]
             + _wb("model.final_layernorm", "output_norm")
             + _wb("lm_head", "output"))
    return _convert_table(d, cfg, sd, out_path, outtype, progress, "phi2",
                          meta, model, "model.layers", layer, n_layer)


def _convert_falcon(d, cfg, sd, out_path, outtype, progress) -> dict:
    n_embd, n_head = cfg["hidden_size"], cfg["num_attention_heads"]
    n_layer = cfg.get("num_hidden_layers") or cfg["n_layer"]
    if cfg.get("new_decoder_architecture"):
        n_kv = cfg.get("num_kv_heads", 1)
    else:
        n_kv = 1 if cfg.get("multi_query", True) else n_head
    meta = {
        "context_length": cfg.get("max_position_embeddings", 2048),
        "embedding_length": n_embd, "block_count": n_layer,
        "feed_forward_length": cfg.get("ffn_hidden_size") or 4 * n_embd,
        "attention.head_count": n_head, "attention.head_count_kv": n_kv,
        "attention.layer_norm_epsilon": cfg.get("layer_norm_epsilon", 1e-5),
        "rope.freq_base": cfg.get("rope_theta", 10000.0),
    }
    qkv = lambda t: _qkv_falcon(t, n_head, n_kv)  # noqa: E731
    layer = (_wb("input_layernorm", "attn_norm")  # 7B single-norm
             + _wb("ln_attn", "attn_norm")  # 40B parallel branch norms
             + _wb("ln_mlp", "attn_norm_2")
             + _wb("self_attention.query_key_value", "attn_qkv", qkv)
             + _wb("self_attention.dense", "attn_output")
             + _wb("mlp.dense_h_to_4h", "ffn_up")
             + _wb("mlp.dense_4h_to_h", "ffn_down"))
    model = ([("transformer.word_embeddings.weight", "token_embd.weight", None),
              ("lm_head.weight", "output.weight", None)]
             + _wb("transformer.ln_f", "output_norm"))
    return _convert_table(d, cfg, sd, out_path, outtype, progress, "falcon",
                          meta, model, "transformer.h", layer, n_layer)


def _convert_bloom(d, cfg, sd, out_path, outtype, progress) -> dict:
    n_embd = cfg.get("hidden_size") or cfg["n_embed"]
    n_head = cfg.get("n_head") or cfg["num_attention_heads"]
    n_layer = cfg.get("n_layer") or cfg["num_hidden_layers"]
    meta = {
        "context_length": cfg.get("seq_length", 2048),
        "embedding_length": n_embd, "block_count": n_layer,
        "feed_forward_length": 4 * n_embd,
        "attention.head_count": n_head, "attention.head_count_kv": n_head,
        "attention.layer_norm_epsilon": cfg.get("layer_norm_epsilon", 1e-5),
    }
    qkv = lambda t: _qkv_headwise(t, n_head)  # noqa: E731
    layer = (_wb("input_layernorm", "attn_norm")
             + _wb("self_attention.query_key_value", "attn_qkv", qkv)
             + _wb("self_attention.dense", "attn_output")
             + _wb("post_attention_layernorm", "ffn_norm")
             + _wb("mlp.dense_h_to_4h", "ffn_up")
             + _wb("mlp.dense_4h_to_h", "ffn_down"))
    model = ([("transformer.word_embeddings.weight", "token_embd.weight", None)]
             + _wb("transformer.word_embeddings_layernorm", "token_embd_norm")
             + _wb("transformer.ln_f", "output_norm"))
    return _convert_table(d, cfg, sd, out_path, outtype, progress, "bloom",
                          meta, model, "transformer.h", layer, n_layer)


def _convert_mpt(d, cfg, sd, out_path, outtype, progress) -> dict:
    n_embd, n_head, n_layer = cfg["d_model"], cfg["n_heads"], cfg["n_layers"]
    ac = cfg.get("attn_config") or {}
    meta = {
        "context_length": cfg.get("max_seq_len", 2048),
        "embedding_length": n_embd, "block_count": n_layer,
        "feed_forward_length": int(cfg.get("expansion_ratio", 4) * n_embd),
        "attention.head_count": n_head,
        "attention.head_count_kv": ac.get("kv_n_heads") or n_head,
        "attention.layer_norm_epsilon": cfg.get("layer_norm_epsilon", 1e-5),
        "attention.max_alibi_bias":
            float(ac.get("alibi_bias_max", 8)) if ac.get("alibi", True) else 0.0,
    }
    if ac.get("clip_qkv"):
        meta["attention.clamp_kqv"] = float(ac["clip_qkv"])
    layer = (_wb("norm_1", "attn_norm")
             + _wb("attn.Wqkv", "attn_qkv")  # already [q; k; v] contiguous
             + _wb("attn.out_proj", "attn_output")
             + _wb("norm_2", "ffn_norm")
             + _wb("ffn.up_proj", "ffn_up")
             + _wb("ffn.down_proj", "ffn_down"))
    model = ([("transformer.wte.weight", "token_embd.weight", None)]
             + _wb("transformer.norm_f", "output_norm"))
    return _convert_table(d, cfg, sd, out_path, outtype, progress, "mpt",
                          meta, model, "transformer.blocks", layer, n_layer)


def _convert_gptj(d, cfg, sd, out_path, outtype, progress) -> dict:
    n_embd, n_head, n_layer = cfg["n_embd"], cfg["n_head"], cfg["n_layer"]
    meta = {
        "context_length": cfg.get("n_positions", 2048),
        "embedding_length": n_embd, "block_count": n_layer,
        "feed_forward_length": cfg.get("n_inner") or 4 * n_embd,
        "attention.head_count": n_head, "attention.head_count_kv": n_head,
        "attention.layer_norm_epsilon": cfg.get("layer_norm_epsilon", 1e-5),
        "rope.dimension_count": cfg.get("rotary_dim") or n_embd // n_head,
    }
    layer = (_wb("ln_1", "attn_norm")
             + [("attn.q_proj.weight", "attn_q.weight", None),
                ("attn.k_proj.weight", "attn_k.weight", None),
                ("attn.v_proj.weight", "attn_v.weight", None),
                ("attn.out_proj.weight", "attn_output.weight", None)]
             + _wb("mlp.fc_in", "ffn_up")
             + _wb("mlp.fc_out", "ffn_down"))
    model = ([("transformer.wte.weight", "token_embd.weight", None)]
             + _wb("transformer.ln_f", "output_norm")
             + _wb("lm_head", "output"))
    return _convert_table(d, cfg, sd, out_path, outtype, progress, "gptj",
                          meta, model, "transformer.h", layer, n_layer)


def _convert_starcoder(d, cfg, sd, out_path, outtype, progress) -> dict:
    """GPTBigCodeForCausalLM (starcoder1): gpt2 block + MQA; c_attn is a
    plain Linear here (no Conv1D transpose), rows already [q; k; v]."""
    n_embd, n_head, n_layer = cfg["n_embd"], cfg["n_head"], cfg["n_layer"]
    n_kv = 1 if cfg.get("multi_query", True) else n_head
    meta = {
        "context_length": cfg.get("n_positions", 8192),
        "embedding_length": n_embd, "block_count": n_layer,
        "feed_forward_length": cfg.get("n_inner") or 4 * n_embd,
        "attention.head_count": n_head, "attention.head_count_kv": n_kv,
        "attention.layer_norm_epsilon": cfg.get("layer_norm_epsilon", 1e-5),
    }
    layer = (_wb("ln_1", "attn_norm")
             + _wb("attn.c_attn", "attn_qkv")
             + _wb("attn.c_proj", "attn_output")
             + _wb("ln_2", "ffn_norm")
             + _wb("mlp.c_fc", "ffn_up")
             + _wb("mlp.c_proj", "ffn_down"))
    model = ([("transformer.wte.weight", "token_embd.weight", None),
              ("transformer.wpe.weight", "position_embd.weight", None),
              ("lm_head.weight", "output.weight", None)]
             + _wb("transformer.ln_f", "output_norm"))
    return _convert_table(d, cfg, sd, out_path, outtype, progress, "starcoder",
                          meta, model, "transformer.h", layer, n_layer)


def _convert_deepseek2(d, cfg, sd, out_path, outtype, progress) -> dict:
    """DeepseekV2/V3 (reference DeepseekV2Model, convert_hf_to_gguf.py:5460):
    MLA low-rank attention + first-k-dense MoE with shared experts and (V3)
    sigmoid gating + e_score_correction_bias."""
    n_embd, n_layer = cfg["hidden_size"], cfg["num_hidden_layers"]
    n_head = cfg["num_attention_heads"]
    qk_rope = cfg.get("qk_rope_head_dim", 64)
    qk_nope = cfg.get("qk_nope_head_dim", 128)
    meta = {
        "context_length": cfg.get("max_position_embeddings", 4096),
        "embedding_length": n_embd, "block_count": n_layer,
        "feed_forward_length": cfg["intermediate_size"],
        # the runtime's decompressed-MHA path caches per-head K/V
        "attention.head_count": n_head, "attention.head_count_kv": 1,
        "attention.layer_norm_rms_epsilon": cfg.get("rms_norm_eps", 1e-6),
        "attention.key_length": qk_nope + qk_rope,
        "attention.value_length": cfg.get("v_head_dim", 128),
        "attention.kv_lora_rank": cfg.get("kv_lora_rank", 512),
        "rope.dimension_count": qk_rope,
        "rope.freq_base": cfg.get("rope_theta", 10000.0),
    }
    if cfg.get("q_lora_rank"):
        meta["attention.q_lora_rank"] = cfg["q_lora_rank"]
    n_exp = cfg.get("n_routed_experts") or 0
    if n_exp:
        meta.update({
            "expert_count": n_exp,
            "expert_used_count": cfg.get("num_experts_per_tok", 6),
            "expert_feed_forward_length": cfg["moe_intermediate_size"],
            "expert_shared_count": cfg.get("n_shared_experts", 0) or 0,
            "expert_weights_scale": float(cfg.get("routed_scaling_factor", 1.0)),
            "expert_weights_norm": bool(cfg.get("norm_topk_prob", False)),
            "leading_dense_block_count": cfg.get("first_k_dense_replace", 0),
        })
        if cfg.get("scoring_func") == "sigmoid":  # V3
            meta["expert_gating_func"] = 2
    rs = cfg.get("rope_scaling") or {}
    if rs.get("type", rs.get("rope_type")) == "yarn":
        meta["rope.scaling.type"] = "yarn"
        meta["rope.scaling.factor"] = rs.get("factor", 1.0)
        if rs.get("original_max_position_embeddings"):
            meta["rope.scaling.original_context_length"] = \
                rs["original_max_position_embeddings"]
        # reference folds mscale_all_dim into the yarn log-multiplier
        meta["rope.scaling.yarn_log_multiplier"] = \
            0.1 * float(rs.get("mscale_all_dim", 1.0))
    layer = ([("input_layernorm.weight", "attn_norm.weight", None),
              ("post_attention_layernorm.weight", "ffn_norm.weight", None),
              ("self_attn.q_proj.weight", "attn_q.weight", None),
              ("self_attn.q_a_proj.weight", "attn_q_a.weight", None),
              ("self_attn.q_a_layernorm.weight", "attn_q_a_norm.weight", None),
              ("self_attn.q_b_proj.weight", "attn_q_b.weight", None),
              ("self_attn.kv_a_proj_with_mqa.weight", "attn_kv_a_mqa.weight", None),
              ("self_attn.kv_a_layernorm.weight", "attn_kv_a_norm.weight", None),
              ("self_attn.kv_b_proj.weight", "attn_kv_b.weight", None),
              ("self_attn.o_proj.weight", "attn_output.weight", None),
              ("mlp.gate_proj.weight", "ffn_gate.weight", None),
              ("mlp.up_proj.weight", "ffn_up.weight", None),
              ("mlp.down_proj.weight", "ffn_down.weight", None),
              ("mlp.gate.weight", "ffn_gate_inp.weight", None),
              ("mlp.gate.e_score_correction_bias", "exp_probs_b.bias", None)]
             + [(f"mlp.shared_experts.{p}_proj.weight", f"ffn_{g}_shexp.weight",
                 None) for p, g in (("gate", "gate"), ("up", "up"),
                                    ("down", "down"))])
    model = [("model.embed_tokens.weight", "token_embd.weight", None),
             ("model.norm.weight", "output_norm.weight", None),
             ("lm_head.weight", "output.weight", None)]

    def experts(put, il, pre):
        if f"{pre}.mlp.experts.0.gate_proj.weight" not in sd:
            return
        for gname, hf_w in (("ffn_gate_exps", "gate_proj"),
                            ("ffn_down_exps", "down_proj"),
                            ("ffn_up_exps", "up_proj")):
            put(f"blk.{il}.{gname}.weight", np.stack([
                np.asarray(sd[f"{pre}.mlp.experts.{e}.{hf_w}.weight"],
                           np.float32) for e in range(n_exp)]))

    return _convert_table(d, cfg, sd, out_path, outtype, progress, "deepseek2",
                          meta, model, "model.layers", layer, n_layer,
                          layer_hook=experts)


def _convert_dbrx(d, cfg, sd, out_path, outtype, progress) -> dict:
    """DBRX (reference DbrxModel, convert_hf_to_gguf.py:4783): fused Wqkv
    with clamp, fused expert mats w1/v1/w2 split to gate/up/down."""
    n_embd, n_head, n_layer = cfg["d_model"], cfg["n_heads"], cfg["n_layers"]
    fc, ac = cfg.get("ffn_config") or {}, cfg.get("attn_config") or {}
    ff = fc.get("ffn_hidden_size", 4 * n_embd)
    n_exp = fc.get("moe_num_experts", 16)
    meta = {
        "context_length": cfg.get("max_seq_len", 2048),
        "embedding_length": n_embd, "block_count": n_layer,
        "feed_forward_length": ff,
        "attention.head_count": n_head,
        "attention.head_count_kv": ac.get("kv_n_heads", 1),
        "attention.layer_norm_epsilon": 1e-5,
        "rope.freq_base": ac.get("rope_theta", 10000.0),
        "expert_count": n_exp,
        "expert_used_count": fc.get("moe_top_k", 4),
        "expert_weights_norm": True,  # moe_normalize_expert_weights=1
    }
    if ac.get("clip_qkv"):
        meta["attention.clamp_kqv"] = float(ac["clip_qkv"])
    layer = [("norm_attn_norm.norm_1.weight", "attn_norm.weight", None),
             # norm_2 = pre-FFN norm, but the reference NAMES it
             # attn_output_norm (llm_build_dbrx, llama-model.cpp:5788)
             ("norm_attn_norm.norm_2.weight", "attn_output_norm.weight", None),
             ("norm_attn_norm.attn.Wqkv.weight", "attn_qkv.weight", None),
             ("norm_attn_norm.attn.out_proj.weight", "attn_output.weight", None),
             ("ffn.router.layer.weight", "ffn_gate_inp.weight", None)]
    model = [("transformer.wte.weight", "token_embd.weight", None),
             ("transformer.norm_f.weight", "output_norm.weight", None),
             ("lm_head.weight", "output.weight", None)]

    def experts(put, il, pre):
        w1 = np.asarray(sd[f"{pre}.ffn.experts.mlp.w1"], np.float32)
        v1 = np.asarray(sd[f"{pre}.ffn.experts.mlp.v1"], np.float32)
        w2 = np.asarray(sd[f"{pre}.ffn.experts.mlp.w2"], np.float32)
        put(f"blk.{il}.ffn_gate_exps.weight", w1.reshape(n_exp, ff, n_embd))
        put(f"blk.{il}.ffn_up_exps.weight", v1.reshape(n_exp, ff, n_embd))
        put(f"blk.{il}.ffn_down_exps.weight",
            w2.reshape(n_exp, ff, n_embd).transpose(0, 2, 1))

    return _convert_table(d, cfg, sd, out_path, outtype, progress, "dbrx",
                          meta, model, "transformer.blocks", layer, n_layer,
                          layer_hook=experts)


def _convert_jamba(d, cfg, sd, out_path, outtype, progress) -> dict:
    """Jamba hybrid attention+mamba (reference JambaModel,
    convert_hf_to_gguf.py:5049): per-layer attn OR ssm tensors, dense or
    MoE FFN."""
    n_embd, n_layer = cfg["hidden_size"], cfg["num_hidden_layers"]
    d_inner = cfg.get("mamba_expand", 2) * n_embd
    n_exp = cfg.get("num_experts", 1)
    dt_rank = cfg.get("mamba_dt_rank") or -(-n_embd // 16)
    meta = {
        "context_length": cfg.get("max_position_embeddings", 4096),
        "embedding_length": n_embd, "block_count": n_layer,
        "feed_forward_length": cfg["intermediate_size"],
        "attention.head_count": cfg["num_attention_heads"],
        "attention.head_count_kv": cfg.get("num_key_value_heads",
                                           cfg["num_attention_heads"]),
        "attention.layer_norm_rms_epsilon": cfg.get("rms_norm_eps", 1e-6),
        "ssm.conv_kernel": cfg.get("mamba_d_conv", 4),
        "ssm.inner_size": d_inner,
        "ssm.state_size": cfg.get("mamba_d_state", 16),
        "ssm.time_step_rank": int(dt_rank),
    }
    if n_exp > 1:
        meta["expert_count"] = n_exp
        meta["expert_used_count"] = cfg.get("num_experts_per_tok", 2)
    layer = ([("input_layernorm.weight", "attn_norm.weight", None),
              ("pre_ff_layernorm.weight", "ffn_norm.weight", None),
              ("self_attn.q_proj.weight", "attn_q.weight", None),
              ("self_attn.k_proj.weight", "attn_k.weight", None),
              ("self_attn.v_proj.weight", "attn_v.weight", None),
              ("self_attn.o_proj.weight", "attn_output.weight", None),
              ("feed_forward.gate_proj.weight", "ffn_gate.weight", None),
              ("feed_forward.up_proj.weight", "ffn_up.weight", None),
              ("feed_forward.down_proj.weight", "ffn_down.weight", None),
              ("feed_forward.router.weight", "ffn_gate_inp.weight", None),
              ("mamba.in_proj.weight", "ssm_in.weight", None),
              ("mamba.conv1d.weight", "ssm_conv1d.weight",
               lambda t: np.squeeze(t, axis=1)),
              ("mamba.conv1d.bias", "ssm_conv1d.bias", None),
              ("mamba.x_proj.weight", "ssm_x.weight", None),
              ("mamba.dt_proj.weight", "ssm_dt.weight", None),
              ("mamba.dt_proj.bias", "ssm_dt.bias", None),
              ("mamba.A_log", "ssm_a", lambda t: -np.exp(t)),
              ("mamba.D", "ssm_d", None),
              ("mamba.out_proj.weight", "ssm_out.weight", None),
              ("mamba.dt_layernorm.weight", "ssm_dt_norm.weight", None),
              ("mamba.b_layernorm.weight", "ssm_b_norm.weight", None),
              ("mamba.c_layernorm.weight", "ssm_c_norm.weight", None)])
    model = [("model.embed_tokens.weight", "token_embd.weight", None),
             ("model.final_layernorm.weight", "output_norm.weight", None),
             ("lm_head.weight", "output.weight", None)]

    def experts(put, il, pre):
        if f"{pre}.feed_forward.experts.0.gate_proj.weight" not in sd:
            return
        for gname, hf_w in (("ffn_gate_exps", "gate_proj"),
                            ("ffn_down_exps", "down_proj"),
                            ("ffn_up_exps", "up_proj")):
            put(f"blk.{il}.{gname}.weight", np.stack([
                np.asarray(sd[f"{pre}.feed_forward.experts.{e}.{hf_w}.weight"],
                           np.float32) for e in range(n_exp)]))

    return _convert_table(d, cfg, sd, out_path, outtype, progress, "jamba",
                          meta, model, "model.layers", layer, n_layer,
                          layer_hook=experts)


_CUSTOM = {
    "GPT2LMHeadModel": _convert_gpt2,
    "GPTNeoXForCausalLM": _convert_gptneox,
    "PhiForCausalLM": _convert_phi2,
    "FalconForCausalLM": _convert_falcon,
    "RWForCausalLM": _convert_falcon,  # pre-rename falcon checkpoints
    "BloomForCausalLM": _convert_bloom,
    "BloomModel": _convert_bloom,
    "MptForCausalLM": _convert_mpt,
    "MPTForCausalLM": _convert_mpt,
    "GPTJForCausalLM": _convert_gptj,
    "GPTBigCodeForCausalLM": _convert_starcoder,
    "DeepseekV2ForCausalLM": _convert_deepseek2,
    "DeepseekV3ForCausalLM": _convert_deepseek2,
    "DbrxForCausalLM": _convert_dbrx,
    "JambaForCausalLM": _convert_jamba,
}


def _convert_mamba(d, cfg, sd, out_path, outtype, progress=None) -> dict:
    """Mamba SSM checkpoints (convert_hf_to_gguf.py MambaModel semantics:
    A stored as -exp(A_log), conv1d squeezed)."""
    arch = "mamba"
    w = GGUFWriter(out_path)
    n_layer = cfg.get("num_hidden_layers") or cfg["n_layer"]
    # state-spaces MambaLMHeadModel checkpoints use d_model/d_conv/d_inner/
    # d_state/dt_rank names (reference MambaModel find_hparam chains)
    d_model = cfg.get("hidden_size") or cfg["d_model"]
    w.add("general.architecture", arch)
    w.add("general.name", cfg.get("_name_or_path", d.name) or d.name)
    w.add(f"{arch}.context_length", 2 ** 20)  # arbitrary (reference value)
    w.add(f"{arch}.embedding_length", d_model)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.feed_forward_length", 0)
    w.add(f"{arch}.attention.head_count", 0)
    w.add(f"{arch}.attention.head_count_kv", 0)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon",
          cfg.get("layer_norm_epsilon", cfg.get("rms_norm_eps", 1e-5)))
    w.add(f"{arch}.ssm.conv_kernel", cfg.get("conv_kernel", cfg.get("d_conv", 4)))
    w.add(f"{arch}.ssm.inner_size",
          cfg.get("intermediate_size", cfg.get("d_inner", 2 * d_model)))
    w.add(f"{arch}.ssm.state_size", cfg.get("state_size", cfg.get("d_state", 16)))
    tr = cfg.get("time_step_rank", cfg.get("dt_rank", "auto"))
    if tr == "auto":
        tr = -(-d_model // 16)
    w.add(f"{arch}.ssm.time_step_rank", int(tr))
    # falconmamba applies RMS norm on the dt/B/C streams
    w.add(f"{arch}.ssm.dt_b_c_rms", cfg.get("model_type") == "falcon_mamba")
    w.add(f"{arch}.vocab_size", cfg["vocab_size"])
    _export_tokenizer(w, d, cfg)

    def put(gname, arr):
        _cast(np.asarray(arr), outtype, gname, w)
        if progress:
            progress(gname)

    # state-spaces checkpoints name the embedding without the plural
    embd_key = ("backbone.embeddings.weight" if "backbone.embeddings.weight" in sd
                else "backbone.embedding.weight")
    embd = np.asarray(sd[embd_key], np.float32)
    put("token_embd.weight", embd)
    put("output_norm.weight", sd["backbone.norm_f.weight"])
    if "lm_head.weight" in sd and not cfg.get("tie_word_embeddings", False):
        head = np.asarray(sd["lm_head.weight"], np.float32)
        # reference MambaModel omits a head identical to the embedding
        if head.shape != embd.shape or not np.array_equal(head, embd):
            put("output.weight", head)
    count = 0
    for il in range(n_layer):
        pre, bl = f"backbone.layers.{il}", f"blk.{il}"
        put(f"{bl}.attn_norm.weight", sd[f"{pre}.norm.weight"])
        put(f"{bl}.ssm_in.weight", sd[f"{pre}.mixer.in_proj.weight"])
        put(f"{bl}.ssm_conv1d.weight",
            np.squeeze(np.asarray(sd[f"{pre}.mixer.conv1d.weight"]), axis=1))
        put(f"{bl}.ssm_conv1d.bias", sd[f"{pre}.mixer.conv1d.bias"])
        put(f"{bl}.ssm_x.weight", sd[f"{pre}.mixer.x_proj.weight"])
        put(f"{bl}.ssm_dt.weight", sd[f"{pre}.mixer.dt_proj.weight"])
        put(f"{bl}.ssm_dt.bias", sd[f"{pre}.mixer.dt_proj.bias"])
        put(f"{bl}.ssm_a", -np.exp(np.asarray(sd[f"{pre}.mixer.A_log"], np.float32)))
        put(f"{bl}.ssm_d", sd[f"{pre}.mixer.D"])
        put(f"{bl}.ssm_out.weight", sd[f"{pre}.mixer.out_proj.weight"])
        count += 10
    w.write()
    return {"arch": arch, "layers": n_layer, "tensors": count, "output": out_path}


# encoder (BERT family) and seq2seq (T5 family) converters live in their own
# module; imported at the end so they can reuse this module's helpers
from .convert_hf_ext import CUSTOM_EXT as _CUSTOM_EXT  # noqa: E402
from .convert_hf_ext2 import CUSTOM_EXT2 as _CUSTOM_EXT2  # noqa: E402
from .convert_hf_ext3 import CUSTOM_EXT3 as _CUSTOM_EXT3  # noqa: E402

_CUSTOM.update(_CUSTOM_EXT)
_CUSTOM.update(_CUSTOM_EXT2)
_CUSTOM.update(_CUSTOM_EXT3)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="llamacog-convert-hf")
    p.add_argument("hf_dir")
    p.add_argument("output")
    p.add_argument("--outtype", choices=("f32", "f16", "bf16", "q8_0"),
                   default="f16")
    p.add_argument("--mmproj", action="store_true",
                   help="convert the vision/audio encoder + projector of a "
                        "multimodal checkpoint into an mmproj GGUF")
    args = p.parse_args(argv)

    def progress(name):
        print(f"  {name}", file=sys.stderr)

    if args.mmproj:
        from .convert_mmproj import convert_mmproj

        stats = convert_mmproj(args.hf_dir, args.output,
                               outtype=args.outtype, progress=progress)
    else:
        stats = convert(args.hf_dir, args.output, outtype=args.outtype,
                        progress=progress)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
