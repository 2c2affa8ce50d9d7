"""LoRA adapter + control vector tests (reference src/llama-adapter.cpp).

The runtime low-rank path (out += scale*B(Ax), llama-graph.cpp:410-431) must
match dense merging of the same adapter, including through fused QKV/gate_up
weights; control vectors shift the residual stream per layer.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from llamacog_tpu.gguf import GGUFWriter
from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.engine import Engine
from llamacog_tpu.runtime.lora import (
    attach_control_vector,
    attach_lora,
    detach_lora,
    load_control_vector,
    load_lora,
    merge_lora,
    set_lora_scale,
)
from llamacog_tpu.utils.testing import make_tiny_llama_gguf

TOKENS = [1, 5, 9, 20]
ALPHA = 8.0
RANK = 4


@pytest.fixture(scope="module")
def tiny_model_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("lora")
    return make_tiny_llama_gguf(str(d / "base.gguf"), n_layer=2), d


def _write_lora(path, base_model_path, targets=("attn_q", "ffn_down")):
    """Random-lora GGUF over selected per-layer weights."""
    m = load_model(base_model_path, with_tokenizer=False, dtype=jnp.float32, fuse=False)
    rng = np.random.default_rng(7)
    w = GGUFWriter(path)
    w.add("general.architecture", "llama")
    w.add("adapter.type", "lora")
    w.add("adapter.lora.alpha", ALPHA)
    for il, layer in enumerate(m.params["layers"]):
        for t in targets:
            wt = np.asarray(layer[t])
            n_out, k = wt.shape
            a = (rng.standard_normal((RANK, k)) * 0.05).astype(np.float32)
            b = (rng.standard_normal((n_out, RANK)) * 0.05).astype(np.float32)
            w.add_tensor(f"blk.{il}.{t}.weight.lora_a", a)
            w.add_tensor(f"blk.{il}.{t}.weight.lora_b", b)
    w.write()
    return path


def _logits(model, prompt=TOKENS):
    eng = Engine(model.params, model.config, batch_size=1, max_seq=64, dtype=jnp.float32)
    return eng.prefill_logits(prompt)


def test_lora_runtime_matches_dense_merge(tiny_model_path):
    base_path, d = tiny_model_path
    lora_path = _write_lora(str(d / "adapter.gguf"), base_path)
    adapter = load_lora(lora_path)
    assert adapter.alpha == ALPHA
    assert len(adapter.ab) == 4  # 2 layers x 2 targets

    # runtime path on fused weights
    m_rt = load_model(base_path, with_tokenizer=False, dtype=jnp.float32)
    n = attach_lora(m_rt.params, adapter)
    assert n == 4
    rt = _logits(m_rt)

    # dense merge path (unfused)
    m_merge = load_model(base_path, with_tokenizer=False, dtype=jnp.float32, fuse=False)
    merged = merge_lora(m_merge.params, adapter)
    assert merged == 4
    dense = _logits(m_merge)
    np.testing.assert_allclose(rt, dense, atol=2e-3, rtol=1e-3)

    # and it actually changes the output
    m_base = load_model(base_path, with_tokenizer=False, dtype=jnp.float32)
    base = _logits(m_base)
    assert np.abs(rt - base).max() > 1e-3


def test_lora_scale_zero_is_identity(tiny_model_path):
    base_path, d = tiny_model_path
    lora_path = _write_lora(str(d / "adapter2.gguf"), base_path)
    adapter = load_lora(lora_path)
    m = load_model(base_path, with_tokenizer=False, dtype=jnp.float32)
    base = _logits(m)
    attach_lora(m.params, adapter)
    set_lora_scale(m.params, adapter, 0.0)
    zeroed = _logits(m)
    np.testing.assert_allclose(zeroed, base, atol=1e-5)
    detach_lora(m.params)
    assert not any(k.endswith("_lora") for layer in m.params["layers"] for k in layer)


def test_lora_fused_qkv_combination(tiny_model_path):
    """Adapters on q/k/v separately must apply through the fused QKV weight."""
    base_path, d = tiny_model_path
    lora_path = _write_lora(
        str(d / "adapter3.gguf"), base_path, targets=("attn_q", "attn_k", "attn_v")
    )
    adapter = load_lora(lora_path)
    m_rt = load_model(base_path, with_tokenizer=False, dtype=jnp.float32)
    assert "attn_qkv" in m_rt.params["layers"][0]  # fusion happened
    attach_lora(m_rt.params, adapter)
    rt = _logits(m_rt)
    m_merge = load_model(base_path, with_tokenizer=False, dtype=jnp.float32, fuse=False)
    merge_lora(m_merge.params, adapter)
    dense = _logits(m_merge)
    np.testing.assert_allclose(rt, dense, atol=2e-3, rtol=1e-3)


def test_control_vector(tiny_model_path):
    base_path, d = tiny_model_path
    m = load_model(base_path, with_tokenizer=False, dtype=jnp.float32)
    n_layer, n_embd = m.config.n_layer, m.config.n_embd
    cv_path = str(d / "cvec.gguf")
    w = GGUFWriter(cv_path)
    w.add("general.architecture", "controlvector")
    rng = np.random.default_rng(3)
    for il in range(n_layer):
        w.add_tensor(f"direction.{il}", rng.standard_normal(n_embd).astype(np.float32))
    w.write()
    dirs = load_control_vector(cv_path)
    assert len(dirs) == n_layer
    base = _logits(m)
    attach_control_vector(m.params, dirs, n_layer, n_embd, strength=0.5, layer_start=0)
    steered = _logits(m)
    assert np.abs(steered - base).max() > 1e-3
    attach_control_vector(m.params, dirs, n_layer, n_embd, strength=0.0, layer_start=0)
    neutral = _logits(m)
    np.testing.assert_allclose(neutral, base, atol=1e-5)


def test_export_lora_tool(tiny_model_path):
    """Merged GGUF (export-lora) must match the runtime lora path."""
    base_path, d = tiny_model_path
    lora_path = _write_lora(str(d / "adapter4.gguf"), base_path)
    adapter = load_lora(lora_path)
    out_path = str(d / "merged.gguf")
    from llamacog_tpu.tools.export_lora import merge_gguf

    stats = merge_gguf(base_path, out_path, [(adapter, 1.0)])
    assert stats["merged"] == 4
    m_merged = load_model(out_path, with_tokenizer=False, dtype=jnp.float32)
    merged_logits = _logits(m_merged)
    m_rt = load_model(base_path, with_tokenizer=False, dtype=jnp.float32)
    attach_lora(m_rt.params, adapter)
    rt_logits = _logits(m_rt)
    np.testing.assert_allclose(merged_logits, rt_logits, atol=5e-3, rtol=1e-2)


def test_convert_lora_from_peft(tmp_path, tiny_model_path):
    """HF PEFT adapter dir -> adapter GGUF (reference convert_lora_to_gguf
    role): converted adapter must load and apply through the runtime path."""
    import json

    import torch

    from llamacog_tpu.models.loader import load_model
    from llamacog_tpu.tools.convert_lora import convert_lora

    base_path, _ = tiny_model_path
    m = load_model(base_path, with_tokenizer=False, dtype=jnp.float32, fuse=False)
    E = m.config.n_embd
    rank = 4
    g = torch.Generator().manual_seed(3)
    sd = {}
    for il in range(m.config.n_layer):
        pre = f"base_model.model.model.layers.{il}.self_attn.q_proj"
        sd[f"{pre}.lora_A.weight"] = torch.randn(rank, E, generator=g) * 0.1
        sd[f"{pre}.lora_B.weight"] = torch.randn(E, rank, generator=g) * 0.1
    peft_dir = tmp_path / "peft"
    peft_dir.mkdir()
    torch.save(sd, peft_dir / "adapter_model.bin")
    (peft_dir / "adapter_config.json").write_text(json.dumps({
        "lora_alpha": 8, "r": rank, "target_modules": ["q_proj"],
    }))
    out = str(tmp_path / "adapter.gguf")
    # the tiny GGUF base model is self-generated (unpermuted), so convert
    # without the llama NORM-rope permute by declaring a NEOX arch
    info = convert_lora(str(peft_dir), out, arch="qwen2")
    assert info["tensors"] == 2 * m.config.n_layer
    assert not info["skipped"]

    adapter = load_lora(out)
    assert adapter.alpha == 8.0
    base = _logits(m)
    n = attach_lora(m.params, adapter, scale=1.0)
    assert n == m.config.n_layer
    with_lora = _logits(m)
    assert np.abs(with_lora - base).max() > 1e-4  # adapter changed the output


def test_convert_lora_permutes_norm_rope(tmp_path):
    """For llama-family (NORM rope) bases, lora_B rows of q/k must be
    permuted exactly like the base weights."""
    import json

    import torch

    from llamacog_tpu.gguf import GGUFModelReader
    from llamacog_tpu.tools.convert_hf import permute_rope_rows
    from llamacog_tpu.tools.convert_lora import convert_lora

    rank, n_head, E = 2, 4, 32
    g = torch.Generator().manual_seed(5)
    B = torch.randn(E, rank, generator=g)
    sd = {
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight":
            torch.randn(rank, E, generator=g),
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": B,
    }
    peft_dir = tmp_path / "peft"
    peft_dir.mkdir()
    torch.save(sd, peft_dir / "adapter_model.bin")
    (peft_dir / "adapter_config.json").write_text(json.dumps({"lora_alpha": 4}))
    out = str(tmp_path / "a.gguf")
    convert_lora(str(peft_dir), out, arch="llama", n_head=n_head, n_head_kv=n_head)
    r = GGUFModelReader(out)
    rd, ti = r.tensors["blk.0.attn_q.weight.lora_b"]
    got = np.frombuffer(rd.tensor_bytes("blk.0.attn_q.weight.lora_b"),
                        dtype=np.float32).reshape(ti.shape)
    np.testing.assert_allclose(got, permute_rope_rows(B.numpy(), n_head))
    r.close()
