"""Architecture parity vs HuggingFace transformers (torch CPU).

Plays the role of the reference's model-zoo correctness checks: a tiny
random-weight HF model is converted to GGUF with the same tensor mapping as
convert_hf_to_gguf.py, loaded by our loader, and the full-precision logits
must match the HF forward pass.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy compiles / reference-oracle runs: core profile skips (-m 'not slow')

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from llamacog_tpu.gguf import GGUFWriter
from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.engine import Engine

TOKENS = [3, 17, 42, 99, 7, 64, 28, 101]


def _base_metadata(w: GGUFWriter, arch: str, cfg, n_ff=None, head_dim=None):
    w.add("general.architecture", arch)
    w.add("general.name", f"tiny-{arch}")
    w.add(f"{arch}.context_length", cfg.max_position_embeddings)
    w.add(f"{arch}.embedding_length", cfg.hidden_size)
    w.add(f"{arch}.block_count", cfg.num_hidden_layers)
    w.add(f"{arch}.feed_forward_length", n_ff or cfg.intermediate_size)
    w.add(f"{arch}.attention.head_count", cfg.num_attention_heads)
    w.add(f"{arch}.attention.head_count_kv", cfg.num_key_value_heads)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", getattr(cfg, "rms_norm_eps", 1e-6))
    w.add(f"{arch}.rope.freq_base", getattr(cfg, "rope_theta", 10000.0))
    w.add(f"{arch}.vocab_size", cfg.vocab_size)
    if head_dim:
        w.add(f"{arch}.attention.key_length", head_dim)
        w.add(f"{arch}.attention.value_length", head_dim)


def _add_layer_weights(w, sd, hf_prefix, gguf_prefix, mapping):
    for hf_name, gguf_name in mapping.items():
        key = f"{hf_prefix}.{hf_name}"
        if key in sd:
            w.add_tensor(f"{gguf_prefix}.{gguf_name}", sd[key].float().numpy())


_ATTN_MAP = {
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.q_proj.bias": "attn_q.bias",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.k_proj.bias": "attn_k.bias",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.v_proj.bias": "attn_v.bias",
    "self_attn.o_proj.weight": "attn_output.weight",
    "self_attn.q_norm.weight": "attn_q_norm.weight",
    "self_attn.k_norm.weight": "attn_k_norm.weight",
    "self_attn.qkv_proj.weight": "attn_qkv.weight",
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
    "mlp.gate_up_proj.weight": "ffn_up.weight",  # phi3 fused [gate; up]
    "input_layernorm.weight": "attn_norm.weight",
    "post_attention_layernorm.weight": "ffn_norm.weight",
}

_GEMMA2_NORM_MAP = {
    "input_layernorm.weight": "attn_norm.weight",
    "post_attention_layernorm.weight": "post_attention_norm.weight",
    "pre_feedforward_layernorm.weight": "ffn_norm.weight",
    "post_feedforward_layernorm.weight": "post_ffw_norm.weight",
}


def _permute_qk(t, n_head):
    """Reference LlamaModel.permute: rows reordered so ggml NORM
    (interleaved) rope reproduces HF rotate-half."""
    d = t.shape[0] // n_head // 2
    return t.reshape(n_head, 2, d, *t.shape[1:]).swapaxes(1, 2).reshape(t.shape)


def _convert(model, arch, path, extra_md=None, gemma=False, head_dim=None, n_ff=None,
             permute_qk=False):
    cfg = model.config
    sd = model.state_dict()
    w = GGUFWriter(path)
    _base_metadata(w, arch, cfg, head_dim=head_dim, n_ff=n_ff)
    for k, v in (extra_md or {}).items():
        w.add(k, v)
    w.add_tensor("token_embd.weight", sd["model.embed_tokens.weight"].float().numpy())
    norm = sd["model.norm.weight"].float()
    if gemma:
        norm = norm + 1  # convert_hf_to_gguf.py GemmaModel: norms stored +1
    w.add_tensor("output_norm.weight", norm.numpy())
    if "lm_head.weight" in sd and not cfg.tie_word_embeddings:
        w.add_tensor("output.weight", sd["lm_head.weight"].float().numpy())
    amap = dict(_ATTN_MAP)
    if gemma:
        amap.update(_GEMMA2_NORM_MAP)
    for il in range(cfg.num_hidden_layers):
        pre = f"model.layers.{il}"
        for hf_name, gguf_name in amap.items():
            key = f"{pre}.{hf_name}"
            if key not in sd:
                continue
            t = sd[key].float()
            if gemma and gguf_name.endswith("norm.weight"):
                t = t + 1
            t = t.numpy()
            if permute_qk and gguf_name.startswith("attn_q."):
                t = _permute_qk(t, cfg.num_attention_heads)
            elif permute_qk and gguf_name.startswith("attn_k."):
                t = _permute_qk(t, cfg.num_key_value_heads)
            w.add_tensor(f"blk.{il}.{gguf_name}", t)
        # mixtral MoE
        if f"{pre}.block_sparse_moe.gate.weight" in sd:
            w.add_tensor(
                f"blk.{il}.ffn_gate_inp.weight",
                sd[f"{pre}.block_sparse_moe.gate.weight"].float().numpy(),
            )
            n_exp = cfg.num_local_experts
            for gguf_name, hf_w in (("ffn_gate_exps", "w1"), ("ffn_down_exps", "w2"),
                                    ("ffn_up_exps", "w3")):
                stacked = torch.stack(
                    [sd[f"{pre}.block_sparse_moe.experts.{e}.{hf_w}.weight"] for e in
                     range(n_exp)]
                )
                w.add_tensor(f"blk.{il}.{gguf_name}.weight", stacked.float().numpy())
    w.write()
    return path


def _our_logits(path, n_tokens=len(TOKENS)):
    m = load_model(path, with_tokenizer=False, dtype=jnp.float32)
    eng = Engine(m.params, m.config, batch_size=1, max_seq=64, dtype=jnp.float32)
    return eng.prefill_logits(TOKENS[:n_tokens])


def _hf_logits(model, n_tokens=len(TOKENS)):
    with torch.no_grad():
        out = model(torch.tensor([TOKENS[:n_tokens]]))
    return out.logits[0].float().numpy()


def _assert_close(ours, ref, atol=2e-3):
    np.testing.assert_allclose(ours, ref, atol=atol, rtol=1e-3)


def _randomize_biases(model, seed=7):
    """HF zero-initializes Linear biases in random models, which lets a
    dropped-bias loader bug pass parity silently. Fill every bias with
    nonzero values so the comparison actually exercises them."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith(".bias"):
                p.copy_(torch.randn(p.shape, generator=g) * 0.1)
    return model


def test_qwen2_parity(tmp_path):
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = _randomize_biases(Qwen2ForCausalLM(cfg).eval())
    path = _convert(model, "qwen2", str(tmp_path / "qwen2.gguf"))
    _assert_close(_our_logits(path), _hf_logits(model))


def test_qwen3_parity(tmp_path):
    from transformers import Qwen3Config, Qwen3ForCausalLM

    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    model = Qwen3ForCausalLM(cfg).eval()
    path = _convert(model, "qwen3", str(tmp_path / "qwen3.gguf"), head_dim=16)
    _assert_close(_our_logits(path), _hf_logits(model))


def test_gemma2_parity(tmp_path):
    from transformers import Gemma2Config, Gemma2ForCausalLM

    cfg = Gemma2Config(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        max_position_embeddings=256, sliding_window=8,
        query_pre_attn_scalar=16,  # matches the non-27B rule (head_dim)
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
    )
    torch.manual_seed(2)
    model = Gemma2ForCausalLM(cfg).eval()
    model.config._attn_implementation = "eager"
    path = _convert(
        model, "gemma2", str(tmp_path / "gemma2.gguf"), gemma=True, head_dim=16,
        extra_md={
            "gemma2.attention.sliding_window": 8,
            "gemma2.attn_logit_softcapping": 50.0,
            "gemma2.final_logit_softcapping": 30.0,
        },
    )
    _assert_close(_our_logits(path), _hf_logits(model), atol=5e-3)


def test_gemma3_parity(tmp_path):
    from transformers import Gemma3TextConfig, Gemma3ForCausalLM

    cfg = Gemma3TextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=7,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        max_position_embeddings=256, sliding_window=8,
        query_pre_attn_scalar=16, rope_theta=1_000_000.0, rope_local_base_freq=10000.0,
    )
    torch.manual_seed(3)
    model = Gemma3ForCausalLM(cfg).eval()
    model.config._attn_implementation = "eager"
    path = _convert(
        model, "gemma3", str(tmp_path / "gemma3.gguf"), gemma=True, head_dim=16,
        extra_md={"gemma3.attention.sliding_window": 8},
    )
    _assert_close(_our_logits(path), _hf_logits(model), atol=5e-3)


def test_phi3_parity(tmp_path):
    from transformers import Phi3Config, Phi3ForCausalLM

    cfg = Phi3Config(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        tie_word_embeddings=False, pad_token_id=0,
    )
    torch.manual_seed(4)
    model = Phi3ForCausalLM(cfg).eval()
    path = _convert(model, "phi3", str(tmp_path / "phi3.gguf"))
    _assert_close(_our_logits(path), _hf_logits(model))


def test_mixtral_parity(tmp_path):
    from transformers import MixtralConfig, MixtralForCausalLM

    cfg = MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        num_local_experts=4, num_experts_per_tok=2, tie_word_embeddings=False,
    )
    torch.manual_seed(5)
    model = MixtralForCausalLM(cfg).eval()
    path = _convert(
        model, "llama", str(tmp_path / "mixtral.gguf"), permute_qk=True,
        extra_md={
            "llama.expert_count": 4,
            "llama.expert_used_count": 2,
            "llama.expert_weights_norm": True,  # HF Mixtral normalizes top-k
        },
    )
    _assert_close(_our_logits(path), _hf_logits(model))


def _convert_mamba(tmp_path):
    from transformers import MambaConfig, MambaForCausalLM

    cfg = MambaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        state_size=16, conv_kernel=4, time_step_rank=8,
    )
    torch.manual_seed(6)
    model = MambaForCausalLM(cfg).eval()
    sd = model.state_dict()
    path = str(tmp_path / "mamba.gguf")
    w = GGUFWriter(path)
    arch = "mamba"
    w.add("general.architecture", arch)
    w.add(f"{arch}.context_length", 1024)
    w.add(f"{arch}.embedding_length", cfg.hidden_size)
    w.add(f"{arch}.block_count", cfg.num_hidden_layers)
    w.add(f"{arch}.feed_forward_length", 0)
    w.add(f"{arch}.attention.head_count", 0)
    w.add(f"{arch}.attention.head_count_kv", 0)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", cfg.layer_norm_epsilon)
    w.add(f"{arch}.ssm.conv_kernel", cfg.conv_kernel)
    w.add(f"{arch}.ssm.inner_size", cfg.intermediate_size)
    w.add(f"{arch}.ssm.state_size", cfg.state_size)
    w.add(f"{arch}.ssm.time_step_rank", cfg.time_step_rank)
    w.add(f"{arch}.vocab_size", cfg.vocab_size)
    w.add_tensor("token_embd.weight", sd["backbone.embeddings.weight"].float().numpy())
    w.add_tensor("output_norm.weight", sd["backbone.norm_f.weight"].float().numpy())
    w.add_tensor("output.weight", sd["lm_head.weight"].float().numpy())
    for il in range(cfg.num_hidden_layers):
        pre = f"backbone.layers.{il}"
        bl = f"blk.{il}"
        w.add_tensor(f"{bl}.attn_norm.weight", sd[f"{pre}.norm.weight"].float().numpy())
        w.add_tensor(f"{bl}.ssm_in.weight", sd[f"{pre}.mixer.in_proj.weight"].float().numpy())
        w.add_tensor(
            f"{bl}.ssm_conv1d.weight",
            sd[f"{pre}.mixer.conv1d.weight"].squeeze(1).float().numpy(),
        )
        w.add_tensor(f"{bl}.ssm_conv1d.bias", sd[f"{pre}.mixer.conv1d.bias"].float().numpy())
        w.add_tensor(f"{bl}.ssm_x.weight", sd[f"{pre}.mixer.x_proj.weight"].float().numpy())
        w.add_tensor(f"{bl}.ssm_dt.weight", sd[f"{pre}.mixer.dt_proj.weight"].float().numpy())
        w.add_tensor(f"{bl}.ssm_dt.bias", sd[f"{pre}.mixer.dt_proj.bias"].float().numpy())
        # convert_hf_to_gguf MambaModel: A stored as -exp(A_log)
        w.add_tensor(
            f"{bl}.ssm_a", (-torch.exp(sd[f"{pre}.mixer.A_log"].float())).numpy()
        )
        w.add_tensor(f"{bl}.ssm_d", sd[f"{pre}.mixer.D"].float().numpy())
        w.add_tensor(f"{bl}.ssm_out.weight", sd[f"{pre}.mixer.out_proj.weight"].float().numpy())
    w.write()
    return path, model


def test_mamba_parity(tmp_path):
    path, model = _convert_mamba(tmp_path)
    _assert_close(_our_logits(path), _hf_logits(model), atol=5e-3)


def test_mamba_decode_matches_prefill(tmp_path):
    """State carried across decode steps must reproduce one-shot prefill
    (the recurrent-memory analog of KV-cache consistency)."""
    path, model = _convert_mamba(tmp_path)
    m = load_model(path, with_tokenizer=False, dtype=jnp.float32)
    eng = Engine(m.params, m.config, batch_size=1, max_seq=64, dtype=jnp.float32)
    full = eng.prefill_logits(TOKENS)
    eng2 = Engine(m.params, m.config, batch_size=1, max_seq=64, dtype=jnp.float32)
    last = eng2.prefill(TOKENS[:4])
    np.testing.assert_allclose(last, full[3], atol=1e-4)
    for i, tok in enumerate(TOKENS[4:]):
        logits = eng2.decode_one(np.array([tok]))
        np.testing.assert_allclose(logits[0], full[4 + i], atol=1e-4)


def test_deepseek2_parity(tmp_path):
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    cfg = DeepseekV2Config(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, max_position_embeddings=256,
        kv_lora_rank=32, q_lora_rank=24, qk_rope_head_dim=8, qk_nope_head_dim=16,
        v_head_dim=16, n_routed_experts=None, first_k_dense_replace=2,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(7)
    model = DeepseekV2ForCausalLM(cfg).eval()
    sd = model.state_dict()
    path = str(tmp_path / "dsv2.gguf")
    w = GGUFWriter(path)
    arch = "deepseek2"
    w.add("general.architecture", arch)
    w.add(f"{arch}.context_length", 256)
    w.add(f"{arch}.embedding_length", 64)
    w.add(f"{arch}.block_count", 2)
    w.add(f"{arch}.feed_forward_length", 96)
    w.add(f"{arch}.attention.head_count", 4)
    w.add(f"{arch}.attention.head_count_kv", 1)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", cfg.rms_norm_eps)
    w.add(f"{arch}.attention.key_length", 24)   # qk_nope + qk_rope
    w.add(f"{arch}.attention.value_length", 16)
    w.add(f"{arch}.attention.kv_lora_rank", 32)
    w.add(f"{arch}.attention.q_lora_rank", 24)
    w.add(f"{arch}.rope.dimension_count", 8)
    w.add(f"{arch}.rope.freq_base", cfg.rope_theta)
    w.add(f"{arch}.vocab_size", 128)
    w.add_tensor("token_embd.weight", sd["model.embed_tokens.weight"].float().numpy())
    w.add_tensor("output_norm.weight", sd["model.norm.weight"].float().numpy())
    w.add_tensor("output.weight", sd["lm_head.weight"].float().numpy())
    nmap = {
        "input_layernorm.weight": "attn_norm.weight",
        "post_attention_layernorm.weight": "ffn_norm.weight",
        "self_attn.q_a_proj.weight": "attn_q_a.weight",
        "self_attn.q_a_layernorm.weight": "attn_q_a_norm.weight",
        "self_attn.q_b_proj.weight": "attn_q_b.weight",
        "self_attn.kv_a_proj_with_mqa.weight": "attn_kv_a_mqa.weight",
        "self_attn.kv_a_layernorm.weight": "attn_kv_a_norm.weight",
        "self_attn.kv_b_proj.weight": "attn_kv_b.weight",
        "self_attn.o_proj.weight": "attn_output.weight",
        "mlp.gate_proj.weight": "ffn_gate.weight",
        "mlp.up_proj.weight": "ffn_up.weight",
        "mlp.down_proj.weight": "ffn_down.weight",
    }
    for il in range(2):
        for hf, gg in nmap.items():
            key = f"model.layers.{il}.{hf}"
            if key in sd:
                w.add_tensor(f"blk.{il}.{gg}", sd[key].float().numpy())
    w.write()
    _assert_close(_our_logits(path), _hf_logits(model), atol=5e-3)


_JAMBA_CFG = dict(
    vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=4,
    num_attention_heads=4, num_key_value_heads=2,
    attn_layer_period=2, attn_layer_offset=1,  # layers 1,3 attention
    expert_layer_period=100, expert_layer_offset=0, num_experts=1,
    mamba_d_state=16, mamba_d_conv=4, mamba_expand=2, mamba_dt_rank=8,
    use_mamba_kernels=False, max_position_embeddings=256,
    tie_word_embeddings=False,
)

_JAMBA_WORKER = r"""
import json, sys
import numpy as np
import torch
from transformers import JambaConfig, JambaForCausalLM

cfg = JambaConfig(**json.loads(sys.argv[1]))
torch.set_num_threads(1)
model = JambaForCausalLM(cfg).eval()
model.load_state_dict(torch.load(sys.argv[2], weights_only=True))
tokens = json.loads(sys.argv[3])
with torch.no_grad():
    out = model(torch.tensor([tokens]))
np.save(sys.argv[4], out.logits[0].float().numpy())
"""


def _jamba_golden_logits(model, tmp_path):
    """HF golden logits in a SUBPROCESS with the BLAS/oneDNN thread env
    pinned before torch loads: in-process torch.set_num_threads(1) proved
    insufficient under full-suite load (the four chained selective scans
    amplified reduction-order drift past 3e-2 — round-2 flake history
    9fa7ada/cbff675/00de4ef), and thread env vars only take effect at
    library init."""
    import json
    import os
    import subprocess
    import sys

    sd_path = str(tmp_path / "jamba_sd.pt")
    torch.save(model.state_dict(), sd_path)
    out_path = str(tmp_path / "jamba_golden.npy")
    worker = tmp_path / "jamba_worker.py"
    worker.write_text(_JAMBA_WORKER)
    env = dict(
        os.environ, OMP_NUM_THREADS="1", MKL_NUM_THREADS="1",
        OPENBLAS_NUM_THREADS="1", TF_ENABLE_ONEDNN_OPTS="0",
        ONEDNN_MAX_CPU_ISA="DEFAULT",
    )
    subprocess.run(
        [sys.executable, str(worker), json.dumps(_JAMBA_CFG), sd_path,
         json.dumps(TOKENS), out_path],
        check=True, env=env, timeout=300, capture_output=True,
    )
    return np.load(out_path)


def _build_jamba_gguf(tmp_path):
    """Deterministic tiny Jamba GGUF (seeded torch init); returns
    (gguf_path, torch model)."""
    from transformers import JambaConfig, JambaForCausalLM

    cfg = JambaConfig(**_JAMBA_CFG)
    torch.manual_seed(8)
    model = JambaForCausalLM(cfg).eval()
    sd = model.state_dict()
    d_inner = cfg.mamba_expand * cfg.hidden_size
    path = str(tmp_path / "jamba.gguf")
    w = GGUFWriter(path)
    arch = "jamba"
    w.add("general.architecture", arch)
    w.add(f"{arch}.context_length", 256)
    w.add(f"{arch}.embedding_length", 64)
    w.add(f"{arch}.block_count", 4)
    w.add(f"{arch}.feed_forward_length", 96)
    w.add(f"{arch}.attention.head_count", 4)
    w.add(f"{arch}.attention.head_count_kv", 2)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", cfg.rms_norm_eps)
    w.add(f"{arch}.ssm.conv_kernel", cfg.mamba_d_conv)
    w.add(f"{arch}.ssm.inner_size", d_inner)
    w.add(f"{arch}.ssm.state_size", cfg.mamba_d_state)
    w.add(f"{arch}.ssm.time_step_rank", cfg.mamba_dt_rank)
    w.add(f"{arch}.vocab_size", 128)
    w.add_tensor("token_embd.weight", sd["model.embed_tokens.weight"].float().numpy())
    w.add_tensor("output_norm.weight", sd["model.final_layernorm.weight"].float().numpy())
    w.add_tensor("output.weight", sd["lm_head.weight"].float().numpy())
    for il in range(4):
        pre = f"model.layers.{il}"
        bl = f"blk.{il}"
        w.add_tensor(f"{bl}.attn_norm.weight",
                     sd[f"{pre}.input_layernorm.weight"].float().numpy())
        w.add_tensor(f"{bl}.ffn_norm.weight",
                     sd[f"{pre}.pre_ff_layernorm.weight"].float().numpy())
        for hf, gg in (("feed_forward.gate_proj", "ffn_gate"),
                       ("feed_forward.up_proj", "ffn_up"),
                       ("feed_forward.down_proj", "ffn_down")):
            w.add_tensor(f"{bl}.{gg}.weight", sd[f"{pre}.{hf}.weight"].float().numpy())
        if f"{pre}.self_attn.q_proj.weight" in sd:
            for hf, gg in (("q_proj", "attn_q"), ("k_proj", "attn_k"),
                           ("v_proj", "attn_v"), ("o_proj", "attn_output")):
                w.add_tensor(f"{bl}.{gg}.weight",
                             sd[f"{pre}.self_attn.{hf}.weight"].float().numpy())
        else:
            mx = f"{pre}.mamba"
            w.add_tensor(f"{bl}.ssm_in.weight", sd[f"{mx}.in_proj.weight"].float().numpy())
            w.add_tensor(f"{bl}.ssm_conv1d.weight",
                         sd[f"{mx}.conv1d.weight"].squeeze(1).float().numpy())
            w.add_tensor(f"{bl}.ssm_conv1d.bias", sd[f"{mx}.conv1d.bias"].float().numpy())
            w.add_tensor(f"{bl}.ssm_x.weight", sd[f"{mx}.x_proj.weight"].float().numpy())
            w.add_tensor(f"{bl}.ssm_dt.weight", sd[f"{mx}.dt_proj.weight"].float().numpy())
            w.add_tensor(f"{bl}.ssm_dt.bias", sd[f"{mx}.dt_proj.bias"].float().numpy())
            w.add_tensor(f"{bl}.ssm_a", (-torch.exp(sd[f"{mx}.A_log"].float())).numpy())
            w.add_tensor(f"{bl}.ssm_d", sd[f"{mx}.D"].float().numpy())
            w.add_tensor(f"{bl}.ssm_out.weight", sd[f"{mx}.out_proj.weight"].float().numpy())
            w.add_tensor(f"{bl}.ssm_dt_norm.weight",
                         sd[f"{mx}.dt_layernorm.weight"].float().numpy())
            w.add_tensor(f"{bl}.ssm_b_norm.weight",
                         sd[f"{mx}.b_layernorm.weight"].float().numpy())
            w.add_tensor(f"{bl}.ssm_c_norm.weight",
                         sd[f"{mx}.c_layernorm.weight"].float().numpy())
    w.write()
    return path, model


def test_jamba_hybrid_parity(tmp_path):
    """Hybrid attention+mamba (llama_memory_hybrid role) vs HF Jamba."""
    import jax

    jax.clear_caches()  # see test_convert_jamba_moe's flake note

    path, model = _build_jamba_gguf(tmp_path)
    ref_logits = _jamba_golden_logits(model, tmp_path)
    _assert_close(_our_logits(path), ref_logits, atol=1e-3)


def test_jamba_decode_matches_prefill(tmp_path):
    """Hybrid state consistency: step-by-step decode == one-shot prefill.

    Pure-JAX both sides (no HF golden involved — the round-2 flake lived in
    the nested HF reference computation, now isolated to a pinned
    subprocess in test_jamba_hybrid_parity). Decode and prefill scan the
    SSM state with different lengths, so f32 reassociation differs by a
    small deterministic amount; 1e-3 is the original tight gate."""
    path, _ = _build_jamba_gguf(tmp_path)
    m = load_model(path, with_tokenizer=False, dtype=jnp.float32)
    assert m.config.is_recurrent
    eng = Engine(m.params, m.config, batch_size=1, max_seq=64, dtype=jnp.float32)
    full = eng.prefill_logits(TOKENS)
    eng2 = Engine(m.params, m.config, batch_size=1, max_seq=64, dtype=jnp.float32)
    last = eng2.prefill(TOKENS[:4])
    np.testing.assert_allclose(last, full[3], atol=1e-3, rtol=1e-3)
    for i, t in enumerate(TOKENS[4:6]):
        logits = eng2.decode_one(np.array([t]))
        np.testing.assert_allclose(logits[0], full[4 + i], atol=1e-3, rtol=1e-3)


def test_olmo2_parity(tmp_path):
    from transformers import Olmo2Config, Olmo2ForCausalLM

    cfg = Olmo2Config(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    torch.manual_seed(9)
    model = Olmo2ForCausalLM(cfg).eval()
    sd = model.state_dict()
    path = str(tmp_path / "olmo2.gguf")
    w = GGUFWriter(path)
    arch = "olmo2"
    w.add("general.architecture", arch)
    w.add(f"{arch}.context_length", 256)
    w.add(f"{arch}.embedding_length", 64)
    w.add(f"{arch}.block_count", 2)
    w.add(f"{arch}.feed_forward_length", 96)
    w.add(f"{arch}.attention.head_count", 4)
    w.add(f"{arch}.attention.head_count_kv", 2)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", cfg.rms_norm_eps)
    w.add(f"{arch}.rope.freq_base", cfg.rope_theta)
    w.add(f"{arch}.vocab_size", 128)
    w.add_tensor("token_embd.weight", sd["model.embed_tokens.weight"].float().numpy())
    w.add_tensor("output_norm.weight", sd["model.norm.weight"].float().numpy())
    w.add_tensor("output.weight", sd["lm_head.weight"].float().numpy())
    nmap = {
        "self_attn.q_proj.weight": "attn_q.weight",
        "self_attn.k_proj.weight": "attn_k.weight",
        "self_attn.v_proj.weight": "attn_v.weight",
        "self_attn.o_proj.weight": "attn_output.weight",
        "self_attn.q_norm.weight": "attn_q_norm.weight",
        "self_attn.k_norm.weight": "attn_k_norm.weight",
        "post_attention_layernorm.weight": "post_attention_norm.weight",
        "post_feedforward_layernorm.weight": "post_ffw_norm.weight",
        "mlp.gate_proj.weight": "ffn_gate.weight",
        "mlp.up_proj.weight": "ffn_up.weight",
        "mlp.down_proj.weight": "ffn_down.weight",
    }
    for il in range(2):
        for hf, gg in nmap.items():
            key = f"model.layers.{il}.{hf}"
            if key in sd:
                w.add_tensor(f"blk.{il}.{gg}", sd[key].float().numpy())
    w.write()
    _assert_close(_our_logits(path), _hf_logits(model), atol=3e-3)


def test_command_r_parity(tmp_path):
    from transformers import CohereConfig, CohereForCausalLM

    cfg = CohereConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        logit_scale=0.5, use_qk_norm=False, tie_word_embeddings=True,
    )
    torch.manual_seed(10)
    model = CohereForCausalLM(cfg).eval()
    sd = model.state_dict()
    path = str(tmp_path / "commandr.gguf")
    w = GGUFWriter(path)
    arch = "command-r"
    w.add("general.architecture", arch)
    w.add(f"{arch}.context_length", 256)
    w.add(f"{arch}.embedding_length", 64)
    w.add(f"{arch}.block_count", 2)
    w.add(f"{arch}.feed_forward_length", 96)
    w.add(f"{arch}.attention.head_count", 4)
    w.add(f"{arch}.attention.head_count_kv", 2)
    w.add(f"{arch}.attention.layer_norm_epsilon", cfg.layer_norm_eps)
    w.add(f"{arch}.logit_scale", 0.5)
    w.add(f"{arch}.rope.freq_base", cfg.rope_theta)
    w.add(f"{arch}.vocab_size", 128)
    w.add_tensor("token_embd.weight", sd["model.embed_tokens.weight"].float().numpy())
    w.add_tensor("output_norm.weight", sd["model.norm.weight"].float().numpy())
    nmap = {
        "self_attn.q_proj.weight": "attn_q.weight",
        "self_attn.k_proj.weight": "attn_k.weight",
        "self_attn.v_proj.weight": "attn_v.weight",
        "self_attn.o_proj.weight": "attn_output.weight",
        "input_layernorm.weight": "attn_norm.weight",
        "mlp.gate_proj.weight": "ffn_gate.weight",
        "mlp.up_proj.weight": "ffn_up.weight",
        "mlp.down_proj.weight": "ffn_down.weight",
    }
    for il in range(2):
        for hf, gg in nmap.items():
            key = f"model.layers.{il}.{hf}"
            if key in sd:
                w.add_tensor(f"blk.{il}.{gg}", sd[key].float().numpy())
    w.write()
    _assert_close(_our_logits(path), _hf_logits(model), atol=3e-3)


def _convert_bert(tmp_path, with_cls=False):
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128, type_vocab_size=2,
        layer_norm_eps=1e-12,
    )
    torch.manual_seed(12)
    model = BertModel(cfg, add_pooling_layer=False).eval()
    sd = model.state_dict()
    path = str(tmp_path / "bert.gguf")
    w = GGUFWriter(path)
    arch = "bert"
    w.add("general.architecture", arch)
    w.add(f"{arch}.context_length", 128)
    w.add(f"{arch}.embedding_length", 64)
    w.add(f"{arch}.block_count", 2)
    w.add(f"{arch}.feed_forward_length", 96)
    w.add(f"{arch}.attention.head_count", 4)
    w.add(f"{arch}.attention.head_count_kv", 4)
    w.add(f"{arch}.attention.layer_norm_epsilon", cfg.layer_norm_eps)
    w.add(f"{arch}.vocab_size", 128)
    w.add_tensor("token_embd.weight", sd["embeddings.word_embeddings.weight"].float().numpy())
    w.add_tensor("token_types.weight", sd["embeddings.token_type_embeddings.weight"].float().numpy())
    w.add_tensor("position_embd.weight", sd["embeddings.position_embeddings.weight"].float().numpy())
    w.add_tensor("token_embd_norm.weight", sd["embeddings.LayerNorm.weight"].float().numpy())
    w.add_tensor("token_embd_norm.bias", sd["embeddings.LayerNorm.bias"].float().numpy())
    nmap = {
        "attention.self.query": "attn_q", "attention.self.key": "attn_k",
        "attention.self.value": "attn_v", "attention.output.dense": "attn_output",
        "attention.output.LayerNorm": "attn_output_norm",
        "intermediate.dense": "ffn_up", "output.dense": "ffn_down",
        "output.LayerNorm": "layer_output_norm",
    }
    for il in range(2):
        for hf, gg in nmap.items():
            for sfx in ("weight", "bias"):
                key = f"encoder.layer.{il}.{hf}.{sfx}"
                if key in sd:
                    w.add_tensor(f"blk.{il}.{gg}.{sfx}", sd[key].float().numpy())
    if with_cls:
        rng = np.random.default_rng(13)
        w.add_tensor("cls.weight", (rng.standard_normal((64, 64)) * 0.05).astype(np.float32))
        w.add_tensor("cls.bias", np.zeros(64, np.float32))
        w.add_tensor("cls.output.weight", (rng.standard_normal((1, 64)) * 0.05).astype(np.float32))
        w.add_tensor("cls.output.bias", np.zeros(1, np.float32))
    w.write()
    return path, model


def test_bert_encoder_parity(tmp_path):
    from llamacog_tpu.models.bert import BertEncoder

    path, model = _convert_bert(tmp_path)
    m = load_model(path, with_tokenizer=False, dtype=jnp.float32)
    assert not m.config.causal
    enc = BertEncoder(m.params, m.config)
    toks = [[2, 17, 42, 9, 63], [5, 8, 99]]
    h, valid = enc.hidden(toks)
    import torch as _t

    with _t.no_grad():
        ref0 = model(_t.tensor([toks[0]])).last_hidden_state[0].numpy()
        ref1 = model(_t.tensor([toks[1]])).last_hidden_state[0].numpy()
    np.testing.assert_allclose(np.asarray(h[0, :5]), ref0, atol=3e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(h[1, :3]), ref1, atol=3e-3, rtol=1e-3)


def test_bert_rank_head(tmp_path):
    from llamacog_tpu.models.bert import BertEncoder

    path, _ = _convert_bert(tmp_path, with_cls=True)
    m = load_model(path, with_tokenizer=False, dtype=jnp.float32)
    enc = BertEncoder(m.params, m.config)
    scores = enc.rank([[2, 17, 42], [5, 8, 99, 3]])
    assert scores.shape == (2,)
    assert np.isfinite(scores).all()


def test_t5_parity(tmp_path):
    from transformers import T5Config, T5ForConditionalGeneration

    cfg = T5Config(
        vocab_size=128, d_model=64, d_kv=16, d_ff=96, num_layers=2, num_heads=4,
        relative_attention_num_buckets=32, decoder_start_token_id=0,
        tie_word_embeddings=True, feed_forward_proj="relu",
    )
    torch.manual_seed(14)
    model = T5ForConditionalGeneration(cfg).eval()
    sd = model.state_dict()
    path = str(tmp_path / "t5.gguf")
    w = GGUFWriter(path)
    arch = "t5"
    w.add("general.architecture", arch)
    w.add(f"{arch}.context_length", 256)
    w.add(f"{arch}.embedding_length", 64)
    w.add(f"{arch}.block_count", 2)
    w.add(f"{arch}.feed_forward_length", 96)
    w.add(f"{arch}.attention.head_count", 4)
    w.add(f"{arch}.attention.head_count_kv", 4)
    w.add(f"{arch}.attention.key_length", 16)
    w.add(f"{arch}.attention.value_length", 16)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", cfg.layer_norm_epsilon)
    w.add(f"{arch}.attention.relative_buckets_count", 32)
    w.add(f"{arch}.vocab_size", 128)
    w.add_tensor("token_embd.weight", sd["shared.weight"].float().numpy())
    w.add_tensor("enc.output_norm.weight",
                 sd["encoder.final_layer_norm.weight"].float().numpy())
    w.add_tensor("dec.output_norm.weight",
                 sd["decoder.final_layer_norm.weight"].float().numpy())
    enc_map = {
        "layer.0.SelfAttention.q": "attn_q", "layer.0.SelfAttention.k": "attn_k",
        "layer.0.SelfAttention.v": "attn_v", "layer.0.SelfAttention.o": "attn_o",
        "layer.0.SelfAttention.relative_attention_bias": "attn_rel_b",
        "layer.0.layer_norm": "attn_norm",
        "layer.1.DenseReluDense.wi": "ffn_up",
        "layer.1.DenseReluDense.wo": "ffn_down",
        "layer.1.layer_norm": "ffn_norm",
    }
    dec_map = {
        "layer.0.SelfAttention.q": "attn_q", "layer.0.SelfAttention.k": "attn_k",
        "layer.0.SelfAttention.v": "attn_v", "layer.0.SelfAttention.o": "attn_o",
        "layer.0.SelfAttention.relative_attention_bias": "attn_rel_b",
        "layer.0.layer_norm": "attn_norm",
        "layer.1.EncDecAttention.q": "cross_attn_q",
        "layer.1.EncDecAttention.k": "cross_attn_k",
        "layer.1.EncDecAttention.v": "cross_attn_v",
        "layer.1.EncDecAttention.o": "cross_attn_o",
        "layer.1.layer_norm": "cross_attn_norm",
        "layer.2.DenseReluDense.wi": "ffn_up",
        "layer.2.DenseReluDense.wo": "ffn_down",
        "layer.2.layer_norm": "ffn_norm",
    }
    for il in range(2):
        for hf, gg in enc_map.items():
            key = f"encoder.block.{il}.{hf}.weight"
            if key in sd:
                w.add_tensor(f"enc.blk.{il}.{gg}.weight", sd[key].float().numpy())
        for hf, gg in dec_map.items():
            key = f"decoder.block.{il}.{hf}.weight"
            if key in sd:
                w.add_tensor(f"dec.blk.{il}.{gg}.weight", sd[key].float().numpy())
    w.write()

    from llamacog_tpu.models.t5 import T5Model

    m = load_model(path, with_tokenizer=False, dtype=jnp.float32)
    t5 = T5Model(m.params, m.config)
    enc_ids = [3, 17, 42, 9]
    dec_ids = [0, 5, 8]
    with torch.no_grad():
        ref = model(input_ids=torch.tensor([enc_ids]),
                    decoder_input_ids=torch.tensor([dec_ids])).logits[0].numpy()
    import llamacog_tpu.models.t5 as T5

    toks = jnp.asarray([enc_ids], jnp.int32)
    valid = jnp.ones_like(toks, bool)
    enc_out = T5.t5_encode(m.params, m.config, toks, valid)
    logits = T5.t5_decode(m.params, m.config, jnp.asarray([dec_ids], jnp.int32),
                          enc_out, valid)
    np.testing.assert_allclose(np.asarray(logits[0]), ref, atol=3e-3, rtol=1e-3)
    # greedy generation runs end-to-end
    out = t5.generate_greedy(enc_ids, 4, decoder_start_id=0, eos_id=1)
    assert 1 <= len(out) <= 4


def test_granite_parity(tmp_path):
    from transformers import GraniteConfig, GraniteForCausalLM

    cfg = GraniteConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        logits_scaling=4.0, residual_multiplier=0.5, embedding_multiplier=2.0,
        attention_multiplier=0.2, tie_word_embeddings=False,
    )
    torch.manual_seed(15)
    model = GraniteForCausalLM(cfg).eval()
    path = _convert(
        model, "granite", str(tmp_path / "granite.gguf"), permute_qk=True,
        extra_md={
            "granite.logit_scale": 4.0,
            "granite.residual_scale": 0.5,
            "granite.embedding_scale": 2.0,
            "granite.attention.scale": 0.2,
        },
    )
    _assert_close(_our_logits(path), _hf_logits(model), atol=3e-3)


def _convert_gptneox(model, path):
    cfg = model.config
    sd = model.state_dict()
    n_head = cfg.num_attention_heads
    n_embd = cfg.hidden_size
    hd = n_embd // n_head
    w = GGUFWriter(path)
    arch = "gptneox"
    w.add("general.architecture", arch)
    w.add(f"{arch}.context_length", 256)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.block_count", cfg.num_hidden_layers)
    w.add(f"{arch}.feed_forward_length", cfg.intermediate_size)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_head)
    w.add(f"{arch}.attention.layer_norm_epsilon", cfg.layer_norm_eps)
    w.add(f"{arch}.rope.dimension_count", int(cfg.rotary_pct * hd))
    w.add(f"{arch}.rope.freq_base", getattr(cfg, "rotary_emb_base", 10000.0))
    w.add(f"{arch}.use_parallel_residual", cfg.use_parallel_residual)
    w.add(f"{arch}.vocab_size", cfg.vocab_size)
    w.add_tensor("token_embd.weight", sd["gpt_neox.embed_in.weight"].float().numpy())
    w.add_tensor("output_norm.weight", sd["gpt_neox.final_layer_norm.weight"].float().numpy())
    w.add_tensor("output_norm.bias", sd["gpt_neox.final_layer_norm.bias"].float().numpy())
    w.add_tensor("output.weight", sd["embed_out.weight"].float().numpy())
    for il in range(cfg.num_hidden_layers):
        pre, bl = f"gpt_neox.layers.{il}", f"blk.{il}"
        for hf, gg in (("input_layernorm", "attn_norm"),
                       ("post_attention_layernorm", "ffn_norm")):
            w.add_tensor(f"{bl}.{gg}.weight", sd[f"{pre}.{hf}.weight"].float().numpy())
            w.add_tensor(f"{bl}.{gg}.bias", sd[f"{pre}.{hf}.bias"].float().numpy())
        # interleaved (head, qkv, dim) -> [Q; K; V] (convert_hf GPTNeoXModel)
        qkv = sd[f"{pre}.attention.query_key_value.weight"].float()
        qkv = qkv.reshape(n_head, 3, hd, n_embd)
        w.add_tensor(f"{bl}.attn_qkv.weight", torch.cat(
            [qkv[:, i].reshape(-1, n_embd) for i in range(3)], dim=0).numpy())
        qkvb = sd[f"{pre}.attention.query_key_value.bias"].float().reshape(n_head, 3, hd)
        w.add_tensor(f"{bl}.attn_qkv.bias", torch.cat(
            [qkvb[:, i].reshape(-1) for i in range(3)], dim=0).numpy())
        w.add_tensor(f"{bl}.attn_output.weight", sd[f"{pre}.attention.dense.weight"].float().numpy())
        w.add_tensor(f"{bl}.attn_output.bias", sd[f"{pre}.attention.dense.bias"].float().numpy())
        w.add_tensor(f"{bl}.ffn_up.weight", sd[f"{pre}.mlp.dense_h_to_4h.weight"].float().numpy())
        w.add_tensor(f"{bl}.ffn_up.bias", sd[f"{pre}.mlp.dense_h_to_4h.bias"].float().numpy())
        w.add_tensor(f"{bl}.ffn_down.weight", sd[f"{pre}.mlp.dense_4h_to_h.weight"].float().numpy())
        w.add_tensor(f"{bl}.ffn_down.bias", sd[f"{pre}.mlp.dense_4h_to_h.bias"].float().numpy())
    w.write()
    return path


@pytest.mark.parametrize("par_res", [True, False])
def test_gptneox_parity(tmp_path, par_res):
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    cfg = GPTNeoXConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, rotary_pct=0.5, use_parallel_residual=par_res,
        max_position_embeddings=256,
    )
    torch.manual_seed(11)
    model = GPTNeoXForCausalLM(cfg).eval()
    path = _convert_gptneox(model, str(tmp_path / f"neox{par_res}.gguf"))
    _assert_close(_our_logits(path), _hf_logits(model))


def _convert_falcon(model, path):
    cfg = model.config
    sd = model.state_dict()
    n_head = cfg.num_attention_heads
    n_embd = cfg.hidden_size
    hd = n_embd // n_head
    n_kv = cfg.num_kv_heads if cfg.new_decoder_architecture else (
        cfg.num_kv_heads if getattr(cfg, "multi_query", True) is False else 1)
    w = GGUFWriter(path)
    arch = "falcon"
    w.add("general.architecture", arch)
    w.add(f"{arch}.context_length", 256)
    w.add(f"{arch}.embedding_length", n_embd)
    w.add(f"{arch}.block_count", cfg.num_hidden_layers)
    w.add(f"{arch}.feed_forward_length", 4 * n_embd)
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_kv)
    w.add(f"{arch}.attention.layer_norm_epsilon", cfg.layer_norm_epsilon)
    w.add(f"{arch}.rope.freq_base", getattr(cfg, "rope_theta", 10000.0))
    w.add(f"{arch}.vocab_size", cfg.vocab_size)
    w.add_tensor("token_embd.weight", sd["transformer.word_embeddings.weight"].float().numpy())
    w.add_tensor("output_norm.weight", sd["transformer.ln_f.weight"].float().numpy())
    w.add_tensor("output_norm.bias", sd["transformer.ln_f.bias"].float().numpy())
    w.add_tensor("output.weight", sd["lm_head.weight"].float().numpy())
    for il in range(cfg.num_hidden_layers):
        pre, bl = f"transformer.h.{il}", f"blk.{il}"
        if cfg.new_decoder_architecture:  # 40B: ln_attn + ln_mlp
            w.add_tensor(f"{bl}.attn_norm.weight", sd[f"{pre}.ln_mlp.weight"].float().numpy())
            w.add_tensor(f"{bl}.attn_norm.bias", sd[f"{pre}.ln_mlp.bias"].float().numpy())
            w.add_tensor(f"{bl}.attn_norm_2.weight", sd[f"{pre}.ln_attn.weight"].float().numpy())
            w.add_tensor(f"{bl}.attn_norm_2.bias", sd[f"{pre}.ln_attn.bias"].float().numpy())
        else:
            w.add_tensor(f"{bl}.attn_norm.weight", sd[f"{pre}.input_layernorm.weight"].float().numpy())
            w.add_tensor(f"{bl}.attn_norm.bias", sd[f"{pre}.input_layernorm.bias"].float().numpy())
        # kv-group-interleaved qkv -> [Q; K; V] (convert_hf FalconModel)
        qkv = sd[f"{pre}.self_attention.query_key_value.weight"].float()
        qkv = qkv.view(n_kv, n_head // n_kv + 2, hd, n_embd)
        q = qkv[:, :-2].reshape(n_head * hd, n_embd)
        k = qkv[:, [-2]].reshape(n_kv * hd, n_embd)
        v = qkv[:, [-1]].reshape(n_kv * hd, n_embd)
        w.add_tensor(f"{bl}.attn_qkv.weight", torch.cat([q, k, v], dim=0).numpy())
        w.add_tensor(f"{bl}.attn_output.weight", sd[f"{pre}.self_attention.dense.weight"].float().numpy())
        w.add_tensor(f"{bl}.ffn_up.weight", sd[f"{pre}.mlp.dense_h_to_4h.weight"].float().numpy())
        w.add_tensor(f"{bl}.ffn_down.weight", sd[f"{pre}.mlp.dense_4h_to_h.weight"].float().numpy())
    w.write()
    return path


@pytest.mark.parametrize("new_arch", [False, True])
def test_falcon_parity(tmp_path, new_arch):
    from transformers import FalconConfig, FalconForCausalLM

    cfg = FalconConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_kv_heads=2 if new_arch else 4,
        new_decoder_architecture=new_arch, multi_query=False,
        parallel_attn=True, bias=False, max_position_embeddings=256,
        layer_norm_epsilon=1e-5, alibi=False,
    )
    torch.manual_seed(12)
    model = FalconForCausalLM(cfg).eval()
    path = _convert_falcon(model, str(tmp_path / f"falcon{new_arch}.gguf"))
    _assert_close(_our_logits(path), _hf_logits(model))


# ---------------------------------------------------------------------------
# round-2 arch batch (VERDICT missing #5): bloom, mpt, stablelm, gptj,
# nemotron, olmoe, chatglm/glm — each converted with the same tensor mapping
# as the reference's convert_hf_to_gguf.py registration for that arch
# ---------------------------------------------------------------------------


def test_bloom_parity(tmp_path):
    from transformers import BloomConfig, BloomForCausalLM

    cfg = BloomConfig(vocab_size=128, hidden_size=64, n_layer=2, n_head=4)
    torch.manual_seed(21)
    model = BloomForCausalLM(cfg).eval()
    sd = model.state_dict()
    hd = cfg.hidden_size // cfg.n_head
    path = str(tmp_path / "bloom.gguf")
    w = GGUFWriter(path)
    arch = "bloom"
    w.add("general.architecture", arch)
    w.add(f"{arch}.context_length", 256)
    w.add(f"{arch}.embedding_length", 64)
    w.add(f"{arch}.block_count", 2)
    w.add(f"{arch}.feed_forward_length", 256)
    w.add(f"{arch}.attention.head_count", 4)
    w.add(f"{arch}.attention.head_count_kv", 4)
    w.add(f"{arch}.attention.layer_norm_epsilon", cfg.layer_norm_epsilon)
    w.add(f"{arch}.vocab_size", 128)
    w.add_tensor("token_embd.weight", sd["transformer.word_embeddings.weight"].float().numpy())
    w.add_tensor("token_embd_norm.weight", sd["transformer.word_embeddings_layernorm.weight"].float().numpy())
    w.add_tensor("token_embd_norm.bias", sd["transformer.word_embeddings_layernorm.bias"].float().numpy())
    w.add_tensor("output_norm.weight", sd["transformer.ln_f.weight"].float().numpy())
    w.add_tensor("output_norm.bias", sd["transformer.ln_f.bias"].float().numpy())
    for il in range(2):
        pre = f"transformer.h.{il}"
        bl = f"blk.{il}"
        # BLOOM fuses qkv per-head [h, 3, hd]; reorder to [q; k; v]
        # (reference BloomModel.modify_tensors)
        qkv_w = sd[f"{pre}.self_attention.query_key_value.weight"].float()
        qkv_w = qkv_w.reshape(cfg.n_head, 3, hd, 64)
        w.add_tensor(f"{bl}.attn_qkv.weight", torch.cat(
            [qkv_w[:, 0].reshape(-1, 64), qkv_w[:, 1].reshape(-1, 64),
             qkv_w[:, 2].reshape(-1, 64)]).numpy())
        qkv_b = sd[f"{pre}.self_attention.query_key_value.bias"].float().reshape(cfg.n_head, 3, hd)
        w.add_tensor(f"{bl}.attn_qkv.bias", torch.cat(
            [qkv_b[:, 0].reshape(-1), qkv_b[:, 1].reshape(-1), qkv_b[:, 2].reshape(-1)]).numpy())
        for hf, gg in (("input_layernorm", "attn_norm"),
                       ("post_attention_layernorm", "ffn_norm")):
            w.add_tensor(f"{bl}.{gg}.weight", sd[f"{pre}.{hf}.weight"].float().numpy())
            w.add_tensor(f"{bl}.{gg}.bias", sd[f"{pre}.{hf}.bias"].float().numpy())
        for hf, gg in (("self_attention.dense", "attn_output"),
                       ("mlp.dense_h_to_4h", "ffn_up"),
                       ("mlp.dense_4h_to_h", "ffn_down")):
            w.add_tensor(f"{bl}.{gg}.weight", sd[f"{pre}.{hf}.weight"].float().numpy())
            w.add_tensor(f"{bl}.{gg}.bias", sd[f"{pre}.{hf}.bias"].float().numpy())
    w.write()
    _assert_close(_our_logits(path), _hf_logits(model), atol=3e-3)


def test_mpt_parity(tmp_path):
    from transformers import MptConfig, MptForCausalLM

    cfg = MptConfig(vocab_size=128, d_model=64, n_layers=2, n_heads=4)
    torch.manual_seed(22)
    model = MptForCausalLM(cfg).eval()
    sd = model.state_dict()
    path = str(tmp_path / "mpt.gguf")
    w = GGUFWriter(path)
    arch = "mpt"
    w.add("general.architecture", arch)
    w.add(f"{arch}.context_length", 256)
    w.add(f"{arch}.embedding_length", 64)
    w.add(f"{arch}.block_count", 2)
    w.add(f"{arch}.feed_forward_length", 256)
    w.add(f"{arch}.attention.head_count", 4)
    w.add(f"{arch}.attention.head_count_kv", 4)
    w.add(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    w.add(f"{arch}.attention.max_alibi_bias", 8.0)
    w.add(f"{arch}.vocab_size", 128)
    w.add_tensor("token_embd.weight", sd["transformer.wte.weight"].float().numpy())
    w.add_tensor("output_norm.weight", sd["transformer.norm_f.weight"].float().numpy())
    for il in range(2):
        pre = f"transformer.blocks.{il}"
        bl = f"blk.{il}"
        w.add_tensor(f"{bl}.attn_norm.weight", sd[f"{pre}.norm_1.weight"].float().numpy())
        w.add_tensor(f"{bl}.ffn_norm.weight", sd[f"{pre}.norm_2.weight"].float().numpy())
        w.add_tensor(f"{bl}.attn_qkv.weight", sd[f"{pre}.attn.Wqkv.weight"].float().numpy())
        w.add_tensor(f"{bl}.attn_output.weight", sd[f"{pre}.attn.out_proj.weight"].float().numpy())
        w.add_tensor(f"{bl}.ffn_up.weight", sd[f"{pre}.ffn.up_proj.weight"].float().numpy())
        w.add_tensor(f"{bl}.ffn_down.weight", sd[f"{pre}.ffn.down_proj.weight"].float().numpy())
    w.write()
    _assert_close(_our_logits(path), _hf_logits(model), atol=3e-3)


def test_stablelm_parity(tmp_path):
    from transformers import StableLmConfig, StableLmForCausalLM

    cfg = StableLmConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        partial_rotary_factor=0.25, tie_word_embeddings=False,
    )
    torch.manual_seed(23)
    model = StableLmForCausalLM(cfg).eval()
    path = _convert(model, "stablelm", str(tmp_path / "stablelm.gguf"), extra_md={
        "stablelm.rope.dimension_count": int(16 * 0.25),
        "stablelm.attention.layer_norm_epsilon": cfg.layer_norm_eps,
    })
    _assert_close(_our_logits(path), _hf_logits(model), atol=3e-3)


def test_gptj_parity(tmp_path):
    from transformers import GPTJConfig, GPTJForCausalLM

    cfg = GPTJConfig(vocab_size=128, n_embd=64, n_layer=2, n_head=4, rotary_dim=8,
                     n_positions=256)
    torch.manual_seed(24)
    model = GPTJForCausalLM(cfg).eval()
    sd = model.state_dict()
    path = str(tmp_path / "gptj.gguf")
    w = GGUFWriter(path)
    arch = "gptj"
    w.add("general.architecture", arch)
    w.add(f"{arch}.context_length", 256)
    w.add(f"{arch}.embedding_length", 64)
    w.add(f"{arch}.block_count", 2)
    w.add(f"{arch}.feed_forward_length", 256)
    w.add(f"{arch}.attention.head_count", 4)
    w.add(f"{arch}.attention.head_count_kv", 4)
    w.add(f"{arch}.rope.dimension_count", 8)
    w.add(f"{arch}.attention.layer_norm_epsilon", cfg.layer_norm_epsilon)
    w.add(f"{arch}.vocab_size", 128)
    w.add_tensor("token_embd.weight", sd["transformer.wte.weight"].float().numpy())
    w.add_tensor("output_norm.weight", sd["transformer.ln_f.weight"].float().numpy())
    w.add_tensor("output_norm.bias", sd["transformer.ln_f.bias"].float().numpy())
    w.add_tensor("output.weight", sd["lm_head.weight"].float().numpy())
    w.add_tensor("output.bias", sd["lm_head.bias"].float().numpy())
    for il in range(2):
        pre = f"transformer.h.{il}"
        bl = f"blk.{il}"
        w.add_tensor(f"{bl}.attn_norm.weight", sd[f"{pre}.ln_1.weight"].float().numpy())
        w.add_tensor(f"{bl}.attn_norm.bias", sd[f"{pre}.ln_1.bias"].float().numpy())
        for hf, gg in (("attn.q_proj", "attn_q"), ("attn.k_proj", "attn_k"),
                       ("attn.v_proj", "attn_v"), ("attn.out_proj", "attn_output")):
            w.add_tensor(f"{bl}.{gg}.weight", sd[f"{pre}.{hf}.weight"].float().numpy())
        w.add_tensor(f"{bl}.ffn_up.weight", sd[f"{pre}.mlp.fc_in.weight"].float().numpy())
        w.add_tensor(f"{bl}.ffn_up.bias", sd[f"{pre}.mlp.fc_in.bias"].float().numpy())
        w.add_tensor(f"{bl}.ffn_down.weight", sd[f"{pre}.mlp.fc_out.weight"].float().numpy())
        w.add_tensor(f"{bl}.ffn_down.bias", sd[f"{pre}.mlp.fc_out.bias"].float().numpy())
    w.write()
    _assert_close(_our_logits(path), _hf_logits(model), atol=3e-3)


def test_nemotron_parity(tmp_path):
    from transformers import NemotronConfig, NemotronForCausalLM

    cfg = NemotronConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        partial_rotary_factor=0.5, tie_word_embeddings=False,
    )
    torch.manual_seed(25)
    model = _randomize_biases(NemotronForCausalLM(cfg).eval())
    sd = model.state_dict()
    path = str(tmp_path / "nemotron.gguf")
    w = GGUFWriter(path)
    arch = "nemotron"
    _base_metadata(w, arch, cfg)
    w.add(f"{arch}.rope.dimension_count", 8)
    w.add(f"{arch}.attention.layer_norm_epsilon", cfg.norm_eps)
    w.add_tensor("token_embd.weight", sd["model.embed_tokens.weight"].float().numpy())
    # layernorm1p: norms stored +1 (reference NemotronModel.modify_tensors)
    w.add_tensor("output_norm.weight", (sd["model.norm.weight"].float() + 1).numpy())
    w.add_tensor("output_norm.bias", sd["model.norm.bias"].float().numpy())
    w.add_tensor("output.weight", sd["lm_head.weight"].float().numpy())
    for il in range(2):
        pre = f"model.layers.{il}"
        bl = f"blk.{il}"
        for hf, gg in (("input_layernorm", "attn_norm"),
                       ("post_attention_layernorm", "ffn_norm")):
            w.add_tensor(f"{bl}.{gg}.weight", (sd[f"{pre}.{hf}.weight"].float() + 1).numpy())
            w.add_tensor(f"{bl}.{gg}.bias", sd[f"{pre}.{hf}.bias"].float().numpy())
        for hf, gg in (("self_attn.q_proj", "attn_q"), ("self_attn.k_proj", "attn_k"),
                       ("self_attn.v_proj", "attn_v"), ("self_attn.o_proj", "attn_output"),
                       ("mlp.up_proj", "ffn_up"), ("mlp.down_proj", "ffn_down")):
            w.add_tensor(f"{bl}.{gg}.weight", sd[f"{pre}.{hf}.weight"].float().numpy())
    w.write()
    _assert_close(_our_logits(path), _hf_logits(model), atol=3e-3)


def test_olmoe_parity(tmp_path):
    from transformers import OlmoeConfig, OlmoeForCausalLM

    cfg = OlmoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(26)
    model = OlmoeForCausalLM(cfg).eval()
    sd = model.state_dict()
    path = str(tmp_path / "olmoe.gguf")
    w = GGUFWriter(path)
    arch = "olmoe"
    _base_metadata(w, arch, cfg)
    w.add(f"{arch}.expert_count", 4)
    w.add(f"{arch}.expert_used_count", 2)
    w.add(f"{arch}.expert_weights_norm", cfg.norm_topk_prob)
    w.add_tensor("token_embd.weight", sd["model.embed_tokens.weight"].float().numpy())
    w.add_tensor("output_norm.weight", sd["model.norm.weight"].float().numpy())
    w.add_tensor("output.weight", sd["lm_head.weight"].float().numpy())
    for il in range(2):
        pre = f"model.layers.{il}"
        bl = f"blk.{il}"
        for hf, gg in (("input_layernorm", "attn_norm"),
                       ("post_attention_layernorm", "ffn_norm"),
                       ("self_attn.q_norm", "attn_q_norm"),
                       ("self_attn.k_norm", "attn_k_norm")):
            w.add_tensor(f"{bl}.{gg}.weight", sd[f"{pre}.{hf}.weight"].float().numpy())
        for hf, gg in (("self_attn.q_proj", "attn_q"), ("self_attn.k_proj", "attn_k"),
                       ("self_attn.v_proj", "attn_v"), ("self_attn.o_proj", "attn_output")):
            w.add_tensor(f"{bl}.{gg}.weight", sd[f"{pre}.{hf}.weight"].float().numpy())
        w.add_tensor(f"{bl}.ffn_gate_inp.weight", sd[f"{pre}.mlp.gate.weight"].float().numpy())
        for gg, hf in (("ffn_gate_exps", "gate_proj"), ("ffn_up_exps", "up_proj"),
                       ("ffn_down_exps", "down_proj")):
            stacked = torch.stack([
                sd[f"{pre}.mlp.experts.{e}.{hf}.weight"] for e in range(4)
            ])
            w.add_tensor(f"{bl}.{gg}.weight", stacked.float().numpy())
    w.write()
    _assert_close(_our_logits(path), _hf_logits(model), atol=3e-3)


def test_chatglm_glm4_parity(tmp_path):
    """transformers GlmForCausalLM (GLM-4 family; reference registers it as
    arch 'chatglm', convert_hf_to_gguf.py:5731): interleaved partial rope,
    qkv biases, fused gate_up."""
    from transformers import GlmConfig, GlmForCausalLM

    cfg = GlmConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16, pad_token_id=0,
        partial_rotary_factor=0.5, tie_word_embeddings=False,
    )
    torch.manual_seed(27)
    model = _randomize_biases(GlmForCausalLM(cfg).eval())
    path = _convert(model, "chatglm", str(tmp_path / "chatglm.gguf"), head_dim=16,
                    extra_md={"chatglm.rope.dimension_count": 8})
    _assert_close(_our_logits(path), _hf_logits(model), atol=3e-3)


def test_dbrx_parity(tmp_path):
    """DBRX: LayerNorm (no bias), fused Wqkv with clamp_kqv, MoE with fused
    expert weights split per DbrxModel in the reference converter."""
    from transformers import DbrxConfig, DbrxForCausalLM

    cfg = DbrxConfig(
        d_model=64, n_heads=4, n_layers=2, vocab_size=128, max_seq_len=256,
        ffn_config={"ffn_hidden_size": 96, "moe_num_experts": 4, "moe_top_k": 2},
        attn_config={"kv_n_heads": 2, "clip_qkv": 8.0},
    )
    torch.manual_seed(43)
    model = DbrxForCausalLM(cfg).eval()
    sd = model.state_dict()
    path = str(tmp_path / "dbrx.gguf")
    w = GGUFWriter(path)
    arch = "dbrx"
    w.add("general.architecture", arch)
    w.add(f"{arch}.context_length", 256)
    w.add(f"{arch}.embedding_length", 64)
    w.add(f"{arch}.block_count", 2)
    w.add(f"{arch}.feed_forward_length", 96)
    w.add(f"{arch}.attention.head_count", 4)
    w.add(f"{arch}.attention.head_count_kv", 2)
    w.add(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    w.add(f"{arch}.attention.clamp_kqv", 8.0)
    w.add(f"{arch}.expert_count", 4)
    w.add(f"{arch}.expert_used_count", 2)
    w.add(f"{arch}.expert_weights_norm", True)  # moe_normalize_expert_weights=1
    w.add(f"{arch}.vocab_size", 128)
    w.add_tensor("token_embd.weight", sd["transformer.wte.weight"].float().numpy())
    w.add_tensor("output_norm.weight", sd["transformer.norm_f.weight"].float().numpy())
    w.add_tensor("output.weight", sd["lm_head.weight"].float().numpy())
    for il in range(2):
        pre = f"transformer.blocks.{il}"
        bl = f"blk.{il}"
        w.add_tensor(f"{bl}.attn_norm.weight",
                     sd[f"{pre}.norm_attn_norm.norm_1.weight"].float().numpy())
        w.add_tensor(f"{bl}.ffn_norm.weight",
                     sd[f"{pre}.norm_attn_norm.norm_2.weight"].float().numpy())
        w.add_tensor(f"{bl}.attn_qkv.weight",
                     sd[f"{pre}.norm_attn_norm.attn.Wqkv.weight"].float().numpy())
        w.add_tensor(f"{bl}.attn_output.weight",
                     sd[f"{pre}.norm_attn_norm.attn.out_proj.weight"].float().numpy())
        w.add_tensor(f"{bl}.ffn_gate_inp.weight",
                     sd[f"{pre}.ffn.router.layer.weight"].float().numpy())
        # fused expert params (reference DbrxModel.modify_tensors): w1->gate,
        # v1->up as [n_exp, F, E]; w2->down transposed to [n_exp, E, F]
        w1 = sd[f"{pre}.ffn.experts.mlp.w1"].float().view(4, 96, 64)
        v1 = sd[f"{pre}.ffn.experts.mlp.v1"].float().view(4, 96, 64)
        w2 = sd[f"{pre}.ffn.experts.mlp.w2"].float().view(4, 96, 64).transpose(1, 2)
        w.add_tensor(f"{bl}.ffn_gate_exps.weight", w1.contiguous().numpy())
        w.add_tensor(f"{bl}.ffn_up_exps.weight", v1.contiguous().numpy())
        w.add_tensor(f"{bl}.ffn_down_exps.weight", w2.contiguous().numpy())
    w.write()
    _assert_close(_our_logits(path), _hf_logits(model), atol=3e-3)
