"""Test-model generators: tiny random-weight llama GGUFs (no network needed).

Plays the role of the reference's tiny stories models
(tools/server/tests/utils.py:46) for offline E2E tests.
"""

from __future__ import annotations

import numpy as np

from ..gguf import GGMLType, GGUFWriter
from ..quant import quantize_tensor


def make_tiny_llama_gguf(
    path,
    n_vocab: int = 256,
    n_embd: int = 64,
    n_layer: int = 2,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 128,
    n_ctx: int = 256,
    quant_type: GGMLType = GGMLType.F32,
    n_expert: int = 0,
    n_expert_used: int = 0,
    seed: int = 0,
    extra_metadata: dict | None = None,
) -> str:
    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_head

    w = GGUFWriter(path)
    w.add("general.architecture", "llama")
    w.add("general.name", "tiny-test")
    w.add("llama.context_length", n_ctx)
    w.add("llama.embedding_length", n_embd)
    w.add("llama.block_count", n_layer)
    w.add("llama.feed_forward_length", n_ff)
    w.add("llama.attention.head_count", n_head)
    w.add("llama.attention.head_count_kv", n_head_kv)
    w.add("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add("llama.rope.freq_base", 10000.0)
    w.add("llama.vocab_size", n_vocab)
    if n_expert:
        w.add("llama.expert_count", n_expert)
        w.add("llama.expert_used_count", n_expert_used)
    # minimal byte-fallback-free vocab: plain byte tokens
    toks = ["<unk>", "<s>", "</s>"] + [f"<0x{i:02X}>" for i in range(n_vocab - 3)]
    w.add("tokenizer.ggml.model", "llama")
    w.add("tokenizer.ggml.tokens", toks)
    w.add("tokenizer.ggml.scores", np.zeros(n_vocab, dtype=np.float32))
    w.add("tokenizer.ggml.token_type", np.array([2, 3, 3] + [6] * (n_vocab - 3), np.int32))
    w.add("tokenizer.ggml.bos_token_id", 1)
    w.add("tokenizer.ggml.eos_token_id", 2)
    w.add("tokenizer.ggml.unknown_token_id", 0)
    for k, v in (extra_metadata or {}).items():
        w.add(k, v)

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    def add_weight(name, arr):
        if quant_type == GGMLType.F32 or arr.ndim == 1 or "norm" in name:
            w.add_tensor(name, arr.astype(np.float32))
        else:
            k = arr.shape[-1]
            blk = 256 if quant_type.name.endswith("_K") or quant_type.name.startswith("IQ") else 32
            if k % blk:
                w.add_tensor(name, arr.astype(np.float32))
            else:
                raw = quantize_tensor(arr, quant_type)
                w.add_tensor(name, raw.tobytes(), shape=arr.shape, ggml_type=quant_type)

    add_weight("token_embd.weight", rand(n_vocab, n_embd))
    add_weight("output_norm.weight", np.ones(n_embd, dtype=np.float32))
    add_weight("output.weight", rand(n_vocab, n_embd))
    for il in range(n_layer):
        p = f"blk.{il}."
        add_weight(p + "attn_norm.weight", np.ones(n_embd, dtype=np.float32))
        add_weight(p + "attn_q.weight", rand(n_head * head_dim, n_embd))
        add_weight(p + "attn_k.weight", rand(n_head_kv * head_dim, n_embd))
        add_weight(p + "attn_v.weight", rand(n_head_kv * head_dim, n_embd))
        add_weight(p + "attn_output.weight", rand(n_embd, n_head * head_dim))
        add_weight(p + "ffn_norm.weight", np.ones(n_embd, dtype=np.float32))
        if n_expert:
            add_weight(p + "ffn_gate_inp.weight", rand(n_expert, n_embd))
            add_weight(p + "ffn_gate_exps.weight", rand(n_expert, n_ff, n_embd))
            add_weight(p + "ffn_up_exps.weight", rand(n_expert, n_ff, n_embd))
            add_weight(p + "ffn_down_exps.weight", rand(n_expert, n_embd, n_ff))
        else:
            add_weight(p + "ffn_gate.weight", rand(n_ff, n_embd))
            add_weight(p + "ffn_up.weight", rand(n_ff, n_embd))
            add_weight(p + "ffn_down.weight", rand(n_embd, n_ff))
    w.write()
    return str(path)
