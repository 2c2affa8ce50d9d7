"""GGUF → model params loader.

Maps reference tensor names (gguf-py tensor_mapping / src/llama-arch.cpp
LLM_TN) into the functional param pytree used by models/llama.py. Weights
either stay block-quantized as planar QuantTensors ("quantized" mode — the
production path) or are dequantized to a dense dtype at load ("dequant").
"""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp

from ..gguf import GGMLType, GGUFModelReader
from ..quant.decode_np import dequantize_tensor
from ..quant.planar import from_gguf
from ..tokenizer import Vocab, build_tokenizer
from .config import ModelConfig

# small tensors that are always dense (norms, biases, rope factors, positions)
_ALWAYS_DENSE_SUFFIXES = (
    "_norm.weight", ".bias", "exp_probs_b.bias",
    "rope_freqs.weight", "rope_factors_long.weight", "rope_factors_short.weight",
    "position_embd.weight", "token_types.weight", "cls.weight", "cls.output.weight",
)

_LAYER_TENSORS = {
    "attn_norm": "attn_norm.weight",
    "attn_norm_b": "attn_norm.bias",
    "attn_norm_2": "attn_norm_2.weight",  # falcon-40B parallel branches
    "attn_norm_2_b": "attn_norm_2.bias",
    "attn_qkv": "attn_qkv.weight",  # pre-fused QKV (phi3, gpt2, ...)
    "attn_qkv_b": "attn_qkv.bias",
    "attn_q": "attn_q.weight",
    "attn_k": "attn_k.weight",
    "attn_v": "attn_v.weight",
    "attn_q_b": "attn_q.bias",
    "attn_k_b": "attn_k.bias",
    "attn_v_b": "attn_v.bias",
    "attn_output": "attn_output.weight",
    "attn_output_b": "attn_output.bias",
    "attn_q_norm": "attn_q_norm.weight",
    "attn_k_norm": "attn_k_norm.weight",
    # deepseek2 MLA projections (LLM_TENSOR names src/llama-arch.cpp).
    # NOTE: the MLA q_b *projection* key must not collide with the
    # attn_q.bias key above ("attn_q_b") — a duplicate dict key silently
    # dropped Q biases for every bias-carrying arch (qwen2 et al.)
    "attn_q_a": "attn_q_a.weight",
    "attn_q_a_norm": "attn_q_a_norm.weight",
    "attn_q_b_proj": "attn_q_b.weight",
    "attn_kv_a_mqa": "attn_kv_a_mqa.weight",
    "attn_kv_a_norm": "attn_kv_a_norm.weight",
    "attn_kv_b": "attn_kv_b.weight",
    "attn_post_norm": "post_attention_norm.weight",
    "ffn_post_norm": "post_ffw_norm.weight",
    # bert-family post-LN norms (LLM_ARCH_BERT tensor map)
    "attn_out_norm": "attn_output_norm.weight",
    "attn_out_norm_b": "attn_output_norm.bias",
    "layer_out_norm": "layer_output_norm.weight",
    "layer_out_norm_b": "layer_output_norm.bias",
    "ffn_norm": "ffn_norm.weight",
    "ffn_norm_b": "ffn_norm.bias",
    "ffn_norm_exps": "ffn_norm_exps.weight",  # arctic parallel MoE branch
    # bitnet (llm_build_bitnet :10807): rms sub-norms before the wo/down
    # projections and optional per-projection scalar scales
    "attn_sub_norm": "attn_sub_norm.weight",
    "ffn_sub_norm": "ffn_sub_norm.weight",
    "attn_q_scale": "attn_q.scale",
    "attn_k_scale": "attn_k.scale",
    "attn_v_scale": "attn_v.scale",
    "attn_output_scale": "attn_output.scale",
    "ffn_gate_scale": "ffn_gate.scale",
    "ffn_up_scale": "ffn_up.scale",
    "ffn_down_scale": "ffn_down.scale",
    "attn_q_norm_b": "attn_q_norm.bias",  # chameleon per-head LN bias
    "attn_k_norm_b": "attn_k_norm.bias",
    "ffn_gate": "ffn_gate.weight",
    "ffn_up": "ffn_up.weight",
    "ffn_down": "ffn_down.weight",
    "ffn_gate_b": "ffn_gate.bias",
    "ffn_up_b": "ffn_up.bias",
    "ffn_down_b": "ffn_down.bias",
    "ffn_gate_inp": "ffn_gate_inp.weight",
    "ffn_gate_exps": "ffn_gate_exps.weight",
    "ffn_up_exps": "ffn_up_exps.weight",
    "ffn_down_exps": "ffn_down_exps.weight",
    "ffn_gate_inp_shexp": "ffn_gate_inp_shexp.weight",
    "ffn_gate_shexp": "ffn_gate_shexp.weight",
    "ffn_up_shexp": "ffn_up_shexp.weight",
    "ffn_down_shexp": "ffn_down_shexp.weight",
    "exp_probs_b": "exp_probs_b.bias",
    # SSM (mamba; LLM_TENSOR names src/llama-arch.cpp)
    "ssm_in": "ssm_in.weight",
    "ssm_conv1d": "ssm_conv1d.weight",
    "ssm_conv1d_b": "ssm_conv1d.bias",
    "ssm_x": "ssm_x.weight",
    "ssm_dt": "ssm_dt.weight",
    "ssm_dt_b": "ssm_dt.bias",
    "ssm_a": "ssm_a",
    "ssm_d": "ssm_d",
    "ssm_out": "ssm_out.weight",
    # jamba learned dt/B/C norms
    "ssm_dt_norm": "ssm_dt_norm.weight",
    "ssm_b_norm": "ssm_b_norm.weight",
    "ssm_c_norm": "ssm_c_norm.weight",
}

# model-level (non-blk) optional tensors
_MODEL_TENSORS = {
    "rope_freqs": "rope_freqs.weight",  # llama3.1-style per-dim factors
    "rope_long": "rope_factors_long.weight",  # phi3 longrope
    "rope_short": "rope_factors_short.weight",
    "pos_embd": "position_embd.weight",  # gpt2/bert learned positions
    "output_b": "output.bias",
    "tok_norm": "token_embd_norm.weight",  # bert embedding layernorm
    "tok_norm_b": "token_embd_norm.bias",
    "output_norm_b": "output_norm.bias",
    "token_types": "token_types.weight",  # bert token-type embeddings
    "cls": "cls.weight",  # reranker / classifier head
    "cls_b": "cls.bias",
    "cls_out": "cls.output.weight",
    "cls_out_b": "cls.output.bias",
    "output_norm_enc": "enc.output_norm.weight",  # neo-bert final RMS norm
}


class Model:
    def __init__(self, config: ModelConfig, params: dict, vocab: Vocab | None, tokenizer,
                 metadata: dict | None = None, path: str | None = None):
        self.config = config
        self.params = params
        self.vocab = vocab
        self.tokenizer = tokenizer
        # retained for tools/save_model.py (llama_model_save_to_file parity)
        self.metadata = metadata or {}
        self.path = path


def _fuse_rows(tensors: list) -> "QuantTensor | jnp.ndarray | None":
    """Concat weights along N (output rows) so one matmul serves several.

    Cuts per-step op count (QKV -> 1 matmul, gate+up -> 1), which matters on
    TPU where each kernel launch has fixed cost. Only fuses same-kind
    QuantTensors or same-dtype dense arrays with matching K.
    """
    from ..quant.planar import QuantTensor

    if all(isinstance(t, QuantTensor) for t in tensors):
        kinds = {t.kind for t in tensors}
        ks = {t.shape[-1] for t in tensors}
        if len(kinds) != 1 or len(ks) != 1:
            return None
        n_total = sum(int(np.prod(t.shape[:-1])) for t in tensors)
        planes = {}
        for name in tensors[0].planes:
            # transposed superblock planes ([S, N]) stack rows on axis 1
            ax = 1 if name.endswith("T") else 0
            planes[name] = jnp.concatenate(
                [t.planes[name] for t in tensors], axis=ax)
        return QuantTensor(tensors[0].kind, (n_total, tensors[0].shape[-1]), planes)
    if all(not isinstance(t, QuantTensor) for t in tensors):
        if len({t.shape[-1] for t in tensors}) != 1:
            return None
        return jnp.concatenate([t for t in tensors], axis=0)
    return None


def _load_tensor(reader, name, mode, dtype):
    r, ti = reader.tensors[name]
    data = r.tensor_bytes(name)
    dense = mode == "dequant" or any(name.endswith(s) for s in _ALWAYS_DENSE_SUFFIXES)
    if ti.ggml_type in (GGMLType.F32, GGMLType.F16, GGMLType.BF16) or dense:
        w = dequantize_tensor(data, ti.ggml_type, ti.shape)
        if name.endswith(_ALWAYS_DENSE_SUFFIXES[0]) or name.endswith(".bias"):
            return jnp.asarray(w, dtype=jnp.float32)
        return jnp.asarray(w, dtype=dtype)
    try:
        qt = from_gguf(data, ti.ggml_type, ti.shape)
    except NotImplementedError:
        # formats without a planar kernel layout (e.g. ternary TQ) load dense
        w = dequantize_tensor(data, ti.ggml_type, ti.shape)
        return jnp.asarray(w, dtype=dtype)
    qt.planes = {k: jnp.asarray(v) for k, v in qt.planes.items()}
    return qt


def parse_kv_overrides(specs) -> dict:
    """Parse --override-kv specs `KEY=TYPE:VALUE` (the reference's
    common_params_parser kv-override syntax, common/arg.cpp `--override-kv`;
    types int/float/bool/str as in llama_model_kv_override)."""
    out: dict = {}
    for spec in specs or ():
        key, _, rest = spec.partition("=")
        typ, _, val = rest.partition(":")
        if not key or not val and typ != "str":
            raise ValueError(f"bad kv override '{spec}' (want KEY=TYPE:VALUE)")
        if typ == "int":
            out[key] = int(val)
        elif typ == "float":
            out[key] = float(val)
        elif typ == "bool":
            out[key] = val.lower() in ("1", "true", "yes", "on")
        elif typ == "str":
            out[key] = val
        else:
            raise ValueError(f"bad kv override type '{typ}' in '{spec}'")
    return out


class LoadCancelled(RuntimeError):
    """Raised when a load_model progress_callback returns False (the
    reference's llama_model_params.progress_callback cancel contract,
    exercised upstream by test-model-load-cancel)."""


def load_model(
    path: str,
    mode: str = "quantized",  # "quantized" | "dequant"
    dtype=jnp.bfloat16,
    with_tokenizer: bool = True,
    fuse: bool = True,
    kv_overrides: dict | None = None,
    progress_callback=None,
) -> Model:
    reader = GGUFModelReader(path)
    if kv_overrides:
        reader.metadata.update(kv_overrides)
    cfg = ModelConfig.from_metadata(reader.metadata)
    if cfg.arch in ("t5", "t5encoder", "rwkv6", "rwkv7", "rwkv6qwen2", "arwkv7"):
        def lt(name, optional=False):
            if name not in reader.tensors:
                if optional:
                    return None
                raise KeyError(name)
            return _load_tensor(reader, name, mode, dtype)

        if progress_callback is not None and progress_callback(0.0) is False:
            reader.close()
            raise LoadCancelled("load cancelled before tensors")
        if cfg.arch.startswith(("rwkv", "arwkv")):
            from .rwkv import load_rwkv_params

            params = load_rwkv_params(reader, cfg, lt)
        else:
            from .t5 import load_t5_params

            params = load_t5_params(reader, cfg, lt)
            params["layers"] = []  # keep the pytree shape loaders expect
        if progress_callback is not None:
            progress_callback(1.0)
        vocab = tokenizer = None
        if with_tokenizer and "tokenizer.ggml.tokens" in reader.metadata:
            vocab = Vocab.from_metadata(reader.metadata)
            try:
                tokenizer = build_tokenizer(vocab)
            except NotImplementedError:
                tokenizer = None
        reader.close()
        return Model(cfg, params, vocab, tokenizer,
                 metadata=dict(reader.metadata), path=path)
    params: dict = {"layers": []}
    params["tok_embd"] = _load_tensor(reader, "token_embd.weight", mode, dtype)
    if "output_norm.weight" in reader.tensors:
        params["output_norm"] = _load_tensor(reader, "output_norm.weight", mode, dtype)
    if "output.weight" in reader.tensors:
        params["output"] = _load_tensor(reader, "output.weight", mode, dtype)
    for key, name in _MODEL_TENSORS.items():
        if name in reader.tensors:
            params[key] = _load_tensor(reader, name, mode, dtype)
    # per-tensor loads run in a thread pool: dequant/relayout is numpy/C++
    # (GIL released), so layer loading parallelizes across cores — the role
    # of the reference's threaded load_all_data (llama-model-loader.h:159)
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=min(os.cpu_count() or 1, 16))
    futures: list[dict] = []
    for il in range(cfg.n_layer):
        lf = {}
        for key, suffix in _LAYER_TENSORS.items():
            name = f"blk.{il}.{suffix}"
            if name in reader.tensors:
                lf[key] = pool.submit(_load_tensor, reader, name, mode, dtype)
        futures.append(lf)
    for il in range(cfg.n_layer):
        if progress_callback is not None and \
                progress_callback(il / max(cfg.n_layer, 1)) is False:
            for lf in futures[il:]:
                for f in lf.values():
                    f.cancel()
            pool.shutdown(wait=True, cancel_futures=True)
            reader.close()
            raise LoadCancelled(f"load cancelled at layer {il}")
        layer = {k: f.result() for k, f in futures[il].items()}
        if cfg.qk_norm_full and "attn_q_norm" in layer:
            fuse_qkv = False  # olmo2: full-projection q/k norm needs separate q/k
        else:
            fuse_qkv = fuse
        if "attn_q_scale" in layer:
            fuse_qkv = False  # bitnet per-projection scales must stay split
        if fuse_qkv and all(k in layer for k in ("attn_q", "attn_k", "attn_v")):
            fused = _fuse_rows([layer["attn_q"], layer["attn_k"], layer["attn_v"]])
            if fused is not None:
                layer["attn_qkv"] = fused
                del layer["attn_q"], layer["attn_k"], layer["attn_v"]
                if all(f"attn_{t}_b" in layer for t in "qkv"):
                    layer["attn_qkv_b"] = jnp.concatenate(
                        [layer.pop("attn_q_b"), layer.pop("attn_k_b"), layer.pop("attn_v_b")]
                    )
            else:
                # mixed quant kinds (Q4_K_M stores attn_v as Q6_K): fuse at
                # least q+k — one fewer kernel launch per layer per step
                qk = _fuse_rows([layer["attn_q"], layer["attn_k"]])
                if qk is not None and "attn_q_b" not in layer                         and "attn_q_norm" not in layer:
                    layer["attn_qk"] = qk
                    del layer["attn_q"], layer["attn_k"]
        if fuse and "ffn_gate_exps" in layer and "ffn_up_exps" in layer:
            ge, ue = layer["ffn_gate_exps"], layer["ffn_up_exps"]
            from ..quant.planar import QuantTensor as _QT

            if (isinstance(ge, _QT) and isinstance(ue, _QT)
                    and ge.kind == ue.kind and ge.shape == ue.shape):
                # per-expert [gate; up] fusion: one expert-gather streams
                # both matmuls' rows (halves the gather call count)
                n_exp, F, E = ge.shape
                planes = {}
                for nm in ge.planes:
                    g3 = ge.planes[nm].reshape(n_exp, F, -1)
                    u3 = ue.planes[nm].reshape(n_exp, F, -1)
                    planes[nm] = jnp.concatenate([g3, u3], axis=1).reshape(
                        n_exp * 2 * F, -1
                    )
                layer["ffn_gate_up_exps"] = _QT(ge.kind, (n_exp, 2 * F, E), planes)
                del layer["ffn_gate_exps"], layer["ffn_up_exps"]
        if (fuse and "ffn_gate" in layer and "ffn_up" in layer
                and "ffn_gate_b" not in layer and "ffn_gate_scale" not in layer):
            fused = _fuse_rows([layer["ffn_gate"], layer["ffn_up"]])
            if fused is not None:
                layer["ffn_gate_up"] = fused
                del layer["ffn_gate"], layer["ffn_up"]
        if "ffn_gate" not in layer and "ffn_up" in layer:
            # phi3-style pre-fused [gate; up] (LLM_FFN_SWIGLU split,
            # llama-graph.cpp:583-595): detect by row count 2*n_ff
            rows = int(np.prod(layer["ffn_up"].shape[:-1]))
            if rows == 2 * cfg.n_ff:
                layer["ffn_gate_up"] = layer.pop("ffn_up")
        if cfg.arch == "chameleon" and cfg.post_norm_only:
            # swin_norm: the same attn_norm/ffn_norm tensors apply to the
            # branch OUTPUTS (llm_build_chameleon swin branches)
            if "attn_norm" in layer:
                layer["attn_post_norm"] = layer.pop("attn_norm")
            if "ffn_norm" in layer:
                layer["ffn_post_norm"] = layer.pop("ffn_norm")
        if cfg.arch == "dbrx" and "attn_out_norm" in layer:
            # dbrx stores its pre-FFN norm under the attn_output_norm NAME
            # (llm_build_dbrx applies it to ffn_inp, llama-model.cpp:5788)
            layer["ffn_norm"] = layer.pop("attn_out_norm")
        if cfg.arch == "grok":
            # grok's per-branch post-norms are stored under the bert-style
            # names attn_output_norm/layer_output_norm but apply to the
            # branch output before the residual add (llm_build_grok,
            # llama-model.cpp:5633-5671) — map onto the gemma2-style keys
            if "attn_out_norm" in layer:
                layer["attn_post_norm"] = layer.pop("attn_out_norm")
            if "layer_out_norm" in layer:
                layer["ffn_post_norm"] = layer.pop("layer_out_norm")
        params["layers"].append(layer)
    pool.shutdown(wait=True)
    if progress_callback is not None:
        progress_callback(1.0)
    vocab = tokenizer = None
    if with_tokenizer and "tokenizer.ggml.tokens" in reader.metadata:
        vocab = Vocab.from_metadata(reader.metadata)
        try:
            tokenizer = build_tokenizer(vocab)
        except NotImplementedError:
            tokenizer = None
    reader.close()
    return Model(cfg, params, vocab, tokenizer,
                 metadata=dict(reader.metadata), path=path)
