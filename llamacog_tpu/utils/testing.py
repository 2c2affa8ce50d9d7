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


def make_tiny_rwkv_gguf(
    path,
    version="6",
    n_vocab: int = 64,
    n_embd: int = 32,
    n_layer: int = 2,
    head_size: int = 8,
    n_ff: int = 64,
    seed: int = 0,
) -> str:
    """Tiny random-weight rwkv GGUF (llama-arch.cpp tensor names).
    version: 6 | 7 | "6q" (rwkv6qwen2) | "7a" (arwkv7)."""
    rng = np.random.default_rng(seed)
    H = n_embd // head_size
    version = str(version)
    arch = {"6": "rwkv6", "7": "rwkv7", "6q": "rwkv6qwen2", "7a": "arwkv7"}[version]
    qwen = version in ("6q", "7a")
    v7 = version in ("7", "7a")
    extra, decay_extra, lora = 8, 8, 8

    w = GGUFWriter(path)
    w.add("general.architecture", arch)
    w.add("general.name", "tiny-rwkv-test")
    w.add(f"{arch}.context_length", 256)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", 0)
    w.add(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    w.add(f"{arch}.wkv.head_size", head_size)
    if version == "6":
        w.add(f"{arch}.rescale_every_n_layers", 2)
    w.add(f"{arch}.vocab_size", n_vocab)
    toks = ["<unk>", "<s>", "</s>"] + [f"<0x{i:02X}>" for i in range(n_vocab - 3)]
    w.add("tokenizer.ggml.model", "llama")
    w.add("tokenizer.ggml.tokens", toks)
    w.add("tokenizer.ggml.scores", np.zeros(n_vocab, dtype=np.float32))
    w.add("tokenizer.ggml.token_type", np.array([2, 3, 3] + [6] * (n_vocab - 3), np.int32))
    w.add("tokenizer.ggml.bos_token_id", 1)
    w.add("tokenizer.ggml.eos_token_id", 2)

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.2).astype(np.float32)

    def ones(*shape):
        return np.ones(shape, dtype=np.float32)

    w.add_tensor("token_embd.weight", rand(n_vocab, n_embd))
    if not qwen:
        w.add_tensor("token_embd_norm.weight", ones(n_embd))
        w.add_tensor("token_embd_norm.bias", rand(n_embd) * 0.1)
    w.add_tensor("output_norm.weight", ones(n_embd))
    if not qwen:
        w.add_tensor("output_norm.bias", rand(n_embd) * 0.1)
    w.add_tensor("output.weight", rand(n_vocab, n_embd))
    for il in range(n_layer):
        p = f"blk.{il}."
        w.add_tensor(p + "attn_norm.weight", ones(n_embd))
        if qwen:
            w.add_tensor(p + "ffn_norm.weight", ones(n_embd))
            w.add_tensor(p + "ffn_gate.weight", rand(n_ff, n_embd))
            w.add_tensor(p + "ffn_up.weight", rand(n_ff, n_embd))
            w.add_tensor(p + "ffn_down.weight", rand(n_embd, n_ff))
        else:
            w.add_tensor(p + "attn_norm.bias", rand(n_embd) * 0.1)
            w.add_tensor(p + "attn_norm_2.weight", ones(n_embd))
            w.add_tensor(p + "attn_norm_2.bias", rand(n_embd) * 0.1)
            w.add_tensor(p + "channel_mix_lerp_k.weight", rand(n_embd) * 0.5 + 0.5)
            w.add_tensor(p + "channel_mix_key.weight", rand(n_ff, n_embd))
            w.add_tensor(p + "channel_mix_value.weight", rand(n_embd, n_ff))
        if not (version == "6q"):
            w.add_tensor(p + "time_mix_ln.weight", ones(n_embd))
            w.add_tensor(p + "time_mix_ln.bias", rand(n_embd) * 0.1)
        w.add_tensor(p + "time_mix_key.weight", rand(n_embd, n_embd))
        w.add_tensor(p + "time_mix_value.weight", rand(n_embd, n_embd))
        w.add_tensor(p + "time_mix_receptance.weight", rand(n_embd, n_embd))
        w.add_tensor(p + "time_mix_output.weight", rand(n_embd, n_embd))
        if version == "6q":
            w.add_tensor(p + "time_mix_key.bias", rand(n_embd) * 0.1)
            w.add_tensor(p + "time_mix_value.bias", rand(n_embd) * 0.1)
            w.add_tensor(p + "time_mix_receptance.bias", rand(n_embd) * 0.1)
        if not v7:
            w.add_tensor(p + "time_mix_w1.weight", rand(5 * extra, n_embd))
            w.add_tensor(p + "time_mix_w2.weight", rand(5, n_embd, extra))
            w.add_tensor(p + "time_mix_lerp_x.weight", rand(n_embd) * 0.5 + 0.5)
            w.add_tensor(p + "time_mix_lerp_fused.weight", rand(5, 1, n_embd) * 0.5)
            if version == "6":
                w.add_tensor(p + "time_mix_first.weight", rand(H, head_size))
            w.add_tensor(p + "time_mix_decay.weight", rand(n_embd) - 4.0)
            w.add_tensor(p + "time_mix_decay_w1.weight", rand(decay_extra, n_embd))
            w.add_tensor(p + "time_mix_decay_w2.weight", rand(n_embd, decay_extra))
            w.add_tensor(p + "time_mix_gate.weight", rand(n_embd, n_embd))
            if version == "6":
                w.add_tensor(p + "channel_mix_lerp_r.weight", rand(n_embd) * 0.5 + 0.5)
                w.add_tensor(p + "channel_mix_receptance.weight", rand(n_embd, n_embd))
        else:
            w.add_tensor(p + "time_mix_lerp_fused.weight", rand(6, 1, n_embd) * 0.5)
            w.add_tensor(p + "time_mix_w0.weight", rand(n_embd) - 4.0)
            w.add_tensor(p + "time_mix_w1.weight", rand(lora, n_embd))
            w.add_tensor(p + "time_mix_w2.weight", rand(n_embd, lora))
            w.add_tensor(p + "time_mix_a0.weight", rand(n_embd))
            w.add_tensor(p + "time_mix_a1.weight", rand(lora, n_embd))
            w.add_tensor(p + "time_mix_a2.weight", rand(n_embd, lora))
            if il > 0:
                w.add_tensor(p + "time_mix_v0.weight", rand(n_embd))
                w.add_tensor(p + "time_mix_v1.weight", rand(lora, n_embd))
                w.add_tensor(p + "time_mix_v2.weight", rand(n_embd, lora))
            w.add_tensor(p + "time_mix_g1.weight", rand(lora, n_embd))
            w.add_tensor(p + "time_mix_g2.weight", rand(n_embd, lora))
            w.add_tensor(p + "time_mix_k_k.weight", rand(n_embd) * 0.5 + 0.8)
            w.add_tensor(p + "time_mix_k_a.weight", rand(n_embd) * 0.5 + 0.8)
            w.add_tensor(p + "time_mix_r_k.weight", rand(n_embd))
    w.write()
    return str(path)


def make_tiny_wavtokenizer_gguf(
    path,
    n_vocab: int = 128,
    n_feat: int = 16,
    n_embd: int = 32,
    n_ff: int = 48,
    n_embd_out: int = 18,  # n_fft/2+1 mags + phases for a tiny n_fft=16
    n_convnext: int = 2,
    seed: int = 0,
) -> str:
    """Tiny random wavtokenizer-dec GGUF (llama-arch.cpp:1549 tensor names)."""
    rng = np.random.default_rng(seed)
    arch = "wavtokenizer-dec"
    w = GGUFWriter(path)
    w.add("general.architecture", arch)
    w.add(f"{arch}.vocab_size", n_vocab)
    w.add(f"{arch}.features_length", n_feat)
    w.add(f"{arch}.embedding_length", n_embd_out)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.posnet.embedding_length", n_embd)
    w.add(f"{arch}.posnet.block_count", 6)
    w.add(f"{arch}.convnext.embedding_length", n_embd)
    w.add(f"{arch}.convnext.block_count", n_convnext)
    w.add(f"{arch}.attention.group_norm_groups", 4)
    w.add(f"{arch}.attention.group_norm_epsilon", 1e-6)

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.1).astype(np.float32)

    w.add_tensor("token_embd.weight", rand(n_vocab, n_feat))
    w.add_tensor("conv1d.weight", rand(n_embd, n_feat, 7))
    w.add_tensor("conv1d.bias", rand(n_embd))
    w.add_tensor("token_embd_norm.weight", np.ones(n_embd, np.float32))
    w.add_tensor("token_embd_norm.bias", rand(n_embd))
    w.add_tensor("output_norm.weight", np.ones(n_embd, np.float32))
    w.add_tensor("output_norm.bias", rand(n_embd))
    w.add_tensor("output.weight", rand(n_embd_out, n_embd))
    w.add_tensor("output.bias", rand(n_embd_out))
    for i in range(6):
        p2 = f"posnet.{i}."
        if i in (0, 1, 3, 4):
            w.add_tensor(p2 + "norm1.weight", np.ones(n_embd, np.float32))
            w.add_tensor(p2 + "norm1.bias", rand(n_embd))
            w.add_tensor(p2 + "conv1.weight", rand(n_embd, n_embd, 3))
            w.add_tensor(p2 + "conv1.bias", rand(n_embd))
            w.add_tensor(p2 + "norm2.weight", np.ones(n_embd, np.float32))
            w.add_tensor(p2 + "norm2.bias", rand(n_embd))
            w.add_tensor(p2 + "conv2.weight", rand(n_embd, n_embd, 3))
            w.add_tensor(p2 + "conv2.bias", rand(n_embd))
        elif i == 2:
            w.add_tensor(p2 + "attn_norm.weight", np.ones(n_embd, np.float32))
            w.add_tensor(p2 + "attn_norm.bias", rand(n_embd))
            for nm in ("attn_q", "attn_k", "attn_v", "attn_output"):
                w.add_tensor(p2 + nm + ".weight", rand(n_embd, n_embd, 1))
                w.add_tensor(p2 + nm + ".bias", rand(n_embd))
        else:
            w.add_tensor(p2 + "norm.weight", np.ones(n_embd, np.float32))
            w.add_tensor(p2 + "norm.bias", rand(n_embd))
    for i in range(n_convnext):
        p2 = f"convnext.{i}."
        w.add_tensor(p2 + "dw.weight", rand(n_embd, 1, 7))
        w.add_tensor(p2 + "dw.bias", rand(n_embd))
        w.add_tensor(p2 + "norm.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p2 + "norm.bias", rand(n_embd))
        w.add_tensor(p2 + "pw1.weight", rand(n_ff, n_embd))
        w.add_tensor(p2 + "pw1.bias", rand(n_ff))
        w.add_tensor(p2 + "pw2.weight", rand(n_embd, n_ff))
        w.add_tensor(p2 + "pw2.bias", rand(n_embd))
        w.add_tensor(p2 + "gamma.weight", rand(n_embd))
    w.write()
    return str(path)


def make_tiny_phimoe_gguf(
    path,
    n_vocab: int = 256,
    n_embd: int = 64,
    n_layer: int = 2,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 96,
    n_ctx: int = 256,
    n_expert: int = 4,
    n_expert_used: int = 2,
    seed: int = 0,
) -> str:
    """Tiny random phimoe GGUF (llama-model.cpp:2678 tensor set: RMS norms
    with biases, q/k/v/o biases, output bias, softmax-routed MoE)."""
    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_head
    a = "phimoe"

    w = GGUFWriter(path)
    w.add("general.architecture", a)
    w.add("general.name", "tiny-phimoe")
    w.add(f"{a}.context_length", n_ctx)
    w.add(f"{a}.embedding_length", n_embd)
    w.add(f"{a}.block_count", n_layer)
    w.add(f"{a}.feed_forward_length", n_ff)
    w.add(f"{a}.attention.head_count", n_head)
    w.add(f"{a}.attention.head_count_kv", n_head_kv)
    w.add(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{a}.rope.freq_base", 10000.0)
    w.add(f"{a}.vocab_size", n_vocab)
    w.add(f"{a}.expert_count", n_expert)
    w.add(f"{a}.expert_used_count", n_expert_used)
    toks = ["<unk>", "<s>", "</s>"] + [f"<0x{i:02X}>" for i in range(n_vocab - 3)]
    w.add("tokenizer.ggml.model", "llama")
    w.add("tokenizer.ggml.tokens", toks)
    w.add("tokenizer.ggml.scores", np.zeros(n_vocab, dtype=np.float32))
    w.add("tokenizer.ggml.token_type",
          np.array([2, 3, 3] + [6] * (n_vocab - 3), np.int32))
    w.add("tokenizer.ggml.bos_token_id", 1)
    w.add("tokenizer.ggml.eos_token_id", 2)
    w.add("tokenizer.ggml.unknown_token_id", 0)

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    w.add_tensor("token_embd.weight", rand(n_vocab, n_embd))
    w.add_tensor("output_norm.weight", np.ones(n_embd, dtype=np.float32))
    w.add_tensor("output_norm.bias", rand(n_embd))
    w.add_tensor("output.weight", rand(n_vocab, n_embd))
    w.add_tensor("output.bias", rand(n_vocab))
    for il in range(n_layer):
        p = f"blk.{il}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, dtype=np.float32))
        w.add_tensor(p + "attn_norm.bias", rand(n_embd))
        w.add_tensor(p + "attn_q.weight", rand(n_head * head_dim, n_embd))
        w.add_tensor(p + "attn_q.bias", rand(n_head * head_dim))
        w.add_tensor(p + "attn_k.weight", rand(n_head_kv * head_dim, n_embd))
        w.add_tensor(p + "attn_k.bias", rand(n_head_kv * head_dim))
        w.add_tensor(p + "attn_v.weight", rand(n_head_kv * head_dim, n_embd))
        w.add_tensor(p + "attn_v.bias", rand(n_head_kv * head_dim))
        w.add_tensor(p + "attn_output.weight", rand(n_embd, n_head * head_dim))
        w.add_tensor(p + "attn_output.bias", rand(n_embd))
        w.add_tensor(p + "ffn_norm.weight", np.ones(n_embd, dtype=np.float32))
        w.add_tensor(p + "ffn_norm.bias", rand(n_embd))
        w.add_tensor(p + "ffn_gate_inp.weight", rand(n_expert, n_embd))
        w.add_tensor(p + "ffn_gate_exps.weight", rand(n_expert, n_ff, n_embd))
        w.add_tensor(p + "ffn_up_exps.weight", rand(n_expert, n_ff, n_embd))
        w.add_tensor(p + "ffn_down_exps.weight", rand(n_expert, n_embd, n_ff))
    w.write()
    return str(path)


def _add_tiny_vocab(w, n_vocab: int) -> None:
    n_byte = min(n_vocab - 3, 256)  # ids above 256 bytes become NORMAL tokens
    toks = (["<unk>", "<s>", "</s>"] + [f"<0x{i:02X}>" for i in range(n_byte)]
            + [f"tok{i}" for i in range(n_vocab - 3 - n_byte)])
    w.add("tokenizer.ggml.model", "llama")
    w.add("tokenizer.ggml.tokens", toks)
    w.add("tokenizer.ggml.scores", np.zeros(n_vocab, dtype=np.float32))
    w.add("tokenizer.ggml.token_type",
          np.array([2, 3, 3] + [6] * n_byte + [1] * (n_vocab - 3 - n_byte),
                   np.int32))
    w.add("tokenizer.ggml.bos_token_id", 1)
    w.add("tokenizer.ggml.eos_token_id", 2)
    w.add("tokenizer.ggml.unknown_token_id", 0)


def make_tiny_arch_gguf(
    path,
    arch: str,
    *,
    n_vocab: int = 256,
    n_embd: int = 64,
    n_layer: int = 2,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 96,
    n_ctx: int = 256,
    norm: str = "rms",          # "rms" | "layer"
    norm_bias: bool = False,
    qkv: str = "split",         # "split" | "fused"
    qkv_bias: bool = False,
    o_bias: bool = False,
    gate: bool = True,
    ffn_bias: bool = False,
    ffn_norm: bool = True,
    out_norm_bias: bool = False,
    output: bool = True,        # lm head tensor (else tied to token_embd)
    n_expert: int = 0,
    n_expert_used: int = 0,
    n_expert_shared: int = 0,
    qk_norm: bool = False,      # per-head-dim q/k rms (openelm)
    n_dense_lead: int = 0,      # deepseek: leading dense layers before MoE
    moe_layer_step: int = 0,    # llama4: MoE only on every Nth layer
    exp_probs_b: bool = False,  # deepseek-v3/dots1 selection-bias tensor
    subnorm_scales: bool = False,  # bitnet sub-norms + per-projection scales
    mla: tuple | None = None,   # (q_lora, kv_lora, qk_rope, qk_nope, v_dim):
    # deepseek2/minicpm3 multi-head latent attention projections
    n_ff_meta: int | None = None,  # qwen v1 quirk: metadata n_ff = 2x tensors
    norms: bool = True,         # olmo: no norm tensors (non-parametric LN)
    qk_norm_layer: bool = False,  # chameleon: [n_head, head_dim] LN weights
    moe_extra_dense: bool = False,  # arctic: dense FFN + parallel MoE branch
    post_norms: bool = False,   # grok attn_output_norm/layer_output_norm
    extra_metadata: dict | None = None,
    seed: int = 0,
) -> str:
    """Tiny random GGUF for an arbitrary llama.cpp architecture: metadata
    keys follow `{arch}.*`, tensors follow the per-arch create_tensor lists
    in src/llama-model.cpp. Used by the E2E oracle tests to prove graph
    parity against the compiled reference for arches with no HF oracle."""
    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_head

    w = GGUFWriter(path)
    w.add("general.architecture", arch)
    w.add("general.name", f"tiny-{arch}")
    w.add(f"{arch}.context_length", n_ctx)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.feed_forward_length", n_ff_meta if n_ff_meta else n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    w.add(f"{arch}.vocab_size", n_vocab)
    if n_expert:
        w.add(f"{arch}.expert_count", n_expert)
        w.add(f"{arch}.expert_used_count", n_expert_used)
    for k, v in (extra_metadata or {}).items():
        w.add(k, v)
    _add_tiny_vocab(w, n_vocab)

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    def norm_pair(name, bias):
        if not norms:
            return
        w.add_tensor(name + ".weight", np.ones(n_embd, dtype=np.float32))
        if bias:
            w.add_tensor(name + ".bias", rand(n_embd))

    w.add_tensor("token_embd.weight", rand(n_vocab, n_embd))
    norm_pair("output_norm", norm_bias or out_norm_bias)
    if output:
        w.add_tensor("output.weight", rand(n_vocab, n_embd))
    ff = n_ff
    for il in range(n_layer):
        p = f"blk.{il}."
        norm_pair(p + "attn_norm", norm_bias)
        qdim, kvdim = n_head * head_dim, n_head_kv * head_dim
        if mla is not None:
            qlr, kvlr, rope_d, nope_d, vd = mla
            kl = rope_d + nope_d
            if qlr:  # deepseek2/minicpm3 low-rank q; plm keeps a direct wq
                w.add_tensor(p + "attn_q_a.weight", rand(qlr, n_embd))
                w.add_tensor(p + "attn_q_a_norm.weight",
                             np.ones(qlr, np.float32))
                w.add_tensor(p + "attn_q_b.weight", rand(n_head * kl, qlr))
            else:
                w.add_tensor(p + "attn_q.weight", rand(n_head * kl, n_embd))
            w.add_tensor(p + "attn_kv_a_mqa.weight", rand(kvlr + rope_d, n_embd))
            w.add_tensor(p + "attn_kv_a_norm.weight", np.ones(kvlr, np.float32))
            w.add_tensor(p + "attn_kv_b.weight", rand(n_head * (nope_d + vd), kvlr))
            w.add_tensor(p + "attn_output.weight", rand(n_embd, n_head * vd))
        elif qkv == "fused":
            w.add_tensor(p + "attn_qkv.weight", rand(qdim + 2 * kvdim, n_embd))
            if qkv_bias:
                w.add_tensor(p + "attn_qkv.bias", rand(qdim + 2 * kvdim))
        else:
            for nm, d in (("attn_q", qdim), ("attn_k", kvdim), ("attn_v", kvdim)):
                w.add_tensor(p + nm + ".weight", rand(d, n_embd))
                if qkv_bias:
                    w.add_tensor(p + nm + ".bias", rand(d))
        if qk_norm and mla is None:
            w.add_tensor(p + "attn_q_norm.weight", np.ones(head_dim, np.float32))
            w.add_tensor(p + "attn_k_norm.weight", np.ones(head_dim, np.float32))
        if qk_norm_layer:  # chameleon: per-head LN with weights and biases
            w.add_tensor(p + "attn_q_norm.weight",
                         1.0 + rand(n_head, head_dim))
            w.add_tensor(p + "attn_q_norm.bias", rand(n_head, head_dim))
            w.add_tensor(p + "attn_k_norm.weight",
                         1.0 + rand(n_head_kv, head_dim))
            w.add_tensor(p + "attn_k_norm.bias", rand(n_head_kv, head_dim))
        if mla is None:
            w.add_tensor(p + "attn_output.weight", rand(n_embd, qdim))
        if subnorm_scales:
            w.add_tensor(p + "attn_sub_norm.weight", 1.0 + rand(qdim))
            for nm in ("attn_q", "attn_k", "attn_v", "attn_output"):
                w.add_tensor(p + nm + ".scale",
                             np.asarray([1.0 + 0.1 * il], np.float32))
        if o_bias:
            w.add_tensor(p + "attn_output.bias", rand(n_embd))
        if post_norms:
            w.add_tensor(p + "attn_output_norm.weight",
                         1.0 + rand(n_embd))
            w.add_tensor(p + "layer_output_norm.weight",
                         1.0 + rand(n_embd))
        if ffn_norm:
            norm_pair(p + "ffn_norm", norm_bias)
        if moe_extra_dense:
            # arctic: n_embd-wide dense FFN + rms for the parallel MoE branch
            w.add_tensor(p + "ffn_gate.weight", rand(n_embd, n_embd))
            w.add_tensor(p + "ffn_up.weight", rand(n_embd, n_embd))
            w.add_tensor(p + "ffn_down.weight", rand(n_embd, n_embd))
            w.add_tensor(p + "ffn_norm_exps.weight", np.ones(n_embd, np.float32))
        is_moe = bool(n_expert) and il >= n_dense_lead and (
            moe_layer_step == 0 or (il + 1) % moe_layer_step == 0)
        if is_moe:
            w.add_tensor(p + "ffn_gate_inp.weight", rand(n_expert, n_embd))
            if exp_probs_b:
                w.add_tensor(p + "exp_probs_b.bias", rand(n_expert))
            w.add_tensor(p + "ffn_gate_exps.weight", rand(n_expert, ff, n_embd))
            w.add_tensor(p + "ffn_up_exps.weight", rand(n_expert, ff, n_embd))
            w.add_tensor(p + "ffn_down_exps.weight", rand(n_expert, n_embd, ff))
            if n_expert_shared:
                fs = ff * n_expert_shared
                w.add_tensor(p + "ffn_gate_shexp.weight", rand(fs, n_embd))
                w.add_tensor(p + "ffn_up_shexp.weight", rand(fs, n_embd))
                w.add_tensor(p + "ffn_down_shexp.weight", rand(n_embd, fs))
        elif not moe_extra_dense:  # dense layer
            if subnorm_scales:
                w.add_tensor(p + "ffn_sub_norm.weight", 1.0 + rand(ff))
                for nm in ("ffn_gate", "ffn_up", "ffn_down"):
                    w.add_tensor(p + nm + ".scale",
                                 np.asarray([1.0 - 0.05 * il], np.float32))
            if gate:
                w.add_tensor(p + "ffn_gate.weight", rand(ff, n_embd))
                if ffn_bias:
                    w.add_tensor(p + "ffn_gate.bias", rand(ff))
            w.add_tensor(p + "ffn_up.weight", rand(ff, n_embd))
            w.add_tensor(p + "ffn_down.weight", rand(n_embd, ff))
            if ffn_bias:
                w.add_tensor(p + "ffn_up.bias", rand(ff))
                w.add_tensor(p + "ffn_down.bias", rand(n_embd))
    w.write()
    return str(path)


def make_tiny_bert_gguf(
    path,
    arch: str,  # "bert" | "nomic-bert" | "nomic-bert-moe" | "jina-bert-v2" | "neo-bert"
    *,
    n_vocab: int = 256,
    n_embd: int = 64,
    n_layer: int = 2,
    n_head: int = 4,
    n_head_kv: int | None = None,
    n_ff: int = 96,
    n_ctx: int = 128,
    n_expert: int = 4,
    n_expert_used: int = 2,
    moe_every_n_layers: int = 2,
    jina_gate: bool = True,  # False -> GEGLU split of a doubled ffn_up
    pooling_type: int = 1,  # LLAMA_POOLING_TYPE_MEAN
    seed: int = 0,
) -> str:
    """Tiny random GGUF for the BERT-family encoders, following the per-arch
    create_tensor lists (src/llama-model.cpp:2167-2301 bert/nomic/jina,
    :2230-2255 neo-bert). Used by the llama-embedding oracle tests."""
    rng = np.random.default_rng(seed)
    if n_head_kv is None:
        n_head_kv = n_head
    head_dim = n_embd // n_head
    kvdim = n_head_kv * head_dim
    neo = arch == "neo-bert"
    jina = arch == "jina-bert-v2"
    moe = arch == "nomic-bert-moe"

    w = GGUFWriter(path)
    w.add("general.architecture", arch)
    w.add("general.name", f"tiny-{arch}")
    w.add(f"{arch}.context_length", n_ctx)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.block_count", n_layer)
    w.add(f"{arch}.feed_forward_length", n_ff)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add(f"{arch}.attention.layer_norm_epsilon", 1e-12)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.attention.causal", False)
    w.add(f"{arch}.pooling_type", pooling_type)
    w.add(f"{arch}.vocab_size", n_vocab)
    if not (neo or moe):
        w.add("tokenizer.ggml.token_type_count", 2)
    if not (jina or arch == "bert"):
        w.add(f"{arch}.rope.freq_base", 10000.0)
    if moe:
        w.add(f"{arch}.expert_count", n_expert)
        w.add(f"{arch}.expert_used_count", n_expert_used)
        w.add(f"{arch}.moe_every_n_layers", moe_every_n_layers)
    _add_tiny_vocab(w, n_vocab)

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    w.add_tensor("token_embd.weight", rand(n_vocab, n_embd))
    if neo:
        w.add_tensor("enc.output_norm.weight", (1.0 + rand(n_embd)))
    else:
        if not moe:  # type_embd optional; exercise presence on bert/nomic/jina
            w.add_tensor("token_types.weight", rand(2, n_embd))
        if arch == "bert":
            w.add_tensor("position_embd.weight", rand(n_ctx, n_embd))
        w.add_tensor("token_embd_norm.weight", 1.0 + rand(n_embd))
        w.add_tensor("token_embd_norm.bias", rand(n_embd))
    for il in range(n_layer):
        p = f"blk.{il}."
        if neo:
            w.add_tensor(p + "attn_norm.weight", 1.0 + rand(n_embd))
            w.add_tensor(p + "attn_qkv.weight", rand(n_embd + 2 * kvdim, n_embd))
            w.add_tensor(p + "attn_output.weight", rand(n_embd, n_embd))
            w.add_tensor(p + "ffn_norm.weight", 1.0 + rand(n_embd))
            w.add_tensor(p + "ffn_up.weight", rand(2 * n_ff, n_embd))
            w.add_tensor(p + "ffn_down.weight", rand(n_embd, n_ff))
            continue
        if jina:
            for nm, d in (("attn_q", n_embd), ("attn_k", kvdim), ("attn_v", kvdim)):
                w.add_tensor(p + nm + ".weight", rand(d, n_embd))
                w.add_tensor(p + nm + ".bias", rand(d))
            # optional full-width q/k LayerNorms — exercise them
            w.add_tensor(p + "attn_q_norm.weight", 1.0 + rand(n_embd))
            w.add_tensor(p + "attn_q_norm.bias", rand(n_embd))
            w.add_tensor(p + "attn_k_norm.weight", 1.0 + rand(kvdim))
            w.add_tensor(p + "attn_k_norm.bias", rand(kvdim))
        elif arch == "bert":
            for nm, d in (("attn_q", n_embd), ("attn_k", kvdim), ("attn_v", kvdim)):
                w.add_tensor(p + nm + ".weight", rand(d, n_embd))
                w.add_tensor(p + nm + ".bias", rand(d))
        else:  # nomic: fused qkv; moe variant adds the bias
            w.add_tensor(p + "attn_qkv.weight", rand(n_embd + 2 * kvdim, n_embd))
            if moe:
                w.add_tensor(p + "attn_qkv.bias", rand(n_embd + 2 * kvdim))
        w.add_tensor(p + "attn_output.weight", rand(n_embd, n_embd))
        if arch == "bert" or moe or jina:
            w.add_tensor(p + "attn_output.bias", rand(n_embd))
        w.add_tensor(p + "attn_output_norm.weight", 1.0 + rand(n_embd))
        w.add_tensor(p + "attn_output_norm.bias", rand(n_embd))
        if jina:
            # attn_norm_2 second residual norm (TENSOR_NOT_REQUIRED — present
            # in jina-embeddings-v2-base-code checkpoints)
            w.add_tensor(p + "attn_norm_2.weight", 1.0 + rand(n_embd))
            w.add_tensor(p + "attn_norm_2.bias", rand(n_embd))
        if moe and il % moe_every_n_layers == 1:
            w.add_tensor(p + "ffn_gate_inp.weight", rand(n_expert, n_embd))
            w.add_tensor(p + "ffn_up_exps.weight", rand(n_expert, n_ff, n_embd))
            w.add_tensor(p + "ffn_down_exps.weight", rand(n_expert, n_embd, n_ff))
        elif jina:
            if jina_gate:
                w.add_tensor(p + "ffn_gate.weight", rand(n_ff, n_embd))
                w.add_tensor(p + "ffn_up.weight", rand(n_ff, n_embd))
            else:
                w.add_tensor(p + "ffn_up.weight", rand(2 * n_ff, n_embd))
            w.add_tensor(p + "ffn_down.weight", rand(n_embd, n_ff))
            w.add_tensor(p + "ffn_down.bias", rand(n_embd))
        elif arch == "nomic-bert":
            w.add_tensor(p + "ffn_gate.weight", rand(n_ff, n_embd))
            w.add_tensor(p + "ffn_up.weight", rand(n_ff, n_embd))
            w.add_tensor(p + "ffn_down.weight", rand(n_embd, n_ff))
        else:  # bert / nomic-moe dense layers: gelu MLP with biases
            w.add_tensor(p + "ffn_up.weight", rand(n_ff, n_embd))
            w.add_tensor(p + "ffn_up.bias", rand(n_ff))
            w.add_tensor(p + "ffn_down.weight", rand(n_embd, n_ff))
            w.add_tensor(p + "ffn_down.bias", rand(n_embd))
        w.add_tensor(p + "layer_output_norm.weight", 1.0 + rand(n_embd))
        w.add_tensor(p + "layer_output_norm.bias", rand(n_embd))
    w.write()
    return str(path)
