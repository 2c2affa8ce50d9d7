"""Model saver tests (llama_model_save_to_file parity, src/llama-model-saver.cpp):
a saved model must reload with identical metadata and logits."""

import numpy as np
import pytest

import jax.numpy as jnp

from llamacog_tpu.gguf import GGMLType
from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.engine import Engine
from llamacog_tpu.tools.save_model import save_model
from llamacog_tpu.utils.testing import make_tiny_llama_gguf


def _logits(path, mode="dequant"):
    m = load_model(path, mode=mode, dtype=jnp.float32)
    eng = Engine(m.params, m.config, max_seq=32, dtype=jnp.float32)
    return np.asarray(eng.prefill([1, 5, 9, 2]))


def test_save_roundtrip_f32(tmp_path):
    src = str(tmp_path / "src.gguf")
    make_tiny_llama_gguf(src, quant_type=GGMLType.F32, seed=7)
    m = load_model(src, mode="dequant", dtype=jnp.float32, fuse=False)
    dst = str(tmp_path / "dst.gguf")
    save_model(m, dst)
    m2 = load_model(dst, mode="dequant", dtype=jnp.float32)
    assert m2.metadata["general.architecture"] == "llama"
    assert m2.config.n_layer == m.config.n_layer
    assert m2.tokenizer is not None  # tokenizer metadata round-tripped
    np.testing.assert_allclose(_logits(src), _logits(dst), atol=1e-5)


def test_save_roundtrip_quantized(tmp_path):
    """QuantTensors re-encode to their original block type on save."""
    from llamacog_tpu.gguf import GGUFModelReader

    src = str(tmp_path / "q8.gguf")
    make_tiny_llama_gguf(src, quant_type=GGMLType.Q8_0, seed=8)
    m = load_model(src, mode="quantized", dtype=jnp.float32, fuse=False)
    dst = str(tmp_path / "q8_out.gguf")
    save_model(m, dst)
    r = GGUFModelReader(dst)
    _, ti = r.tensors["blk.0.attn_q.weight"]
    assert ti.ggml_type == GGMLType.Q8_0
    r.close()
    # Q8_0 re-encode of exactly-representable values is value-stable
    np.testing.assert_allclose(_logits(src, "quantized"),
                               _logits(dst, "quantized"), atol=1e-4)


def test_save_refuses_fused(tmp_path):
    src = str(tmp_path / "f.gguf")
    make_tiny_llama_gguf(src, quant_type=GGMLType.F32, seed=9)
    m = load_model(src, mode="dequant", dtype=jnp.float32, fuse=True)
    if not any(k in m.params["layers"][0] for k in
               ("attn_qk", "ffn_gate_up", "attn_qkv")):
        pytest.skip("loader did not fuse this config")
    with pytest.raises(ValueError, match="fuse"):
        save_model(m, str(tmp_path / "out.gguf"))


def test_save_after_lora_merge(tmp_path):
    """The finetune.cpp:91 use-case: merged adapter weights land in the file."""
    from llamacog_tpu.gguf import GGUFWriter
    from llamacog_tpu.runtime.lora import load_lora, merge_lora

    src = str(tmp_path / "base.gguf")
    make_tiny_llama_gguf(src, quant_type=GGMLType.F32, seed=10)
    base = load_model(src, mode="dequant", dtype=jnp.float32, fuse=False)
    rng = np.random.default_rng(11)
    lora = str(tmp_path / "ad.gguf")
    w = GGUFWriter(lora)
    w.add("general.architecture", "llama")
    w.add("adapter.type", "lora")
    w.add("adapter.lora.alpha", 8.0)
    for il, layer in enumerate(base.params["layers"]):
        n_out, k = np.asarray(layer["attn_q"]).shape
        w.add_tensor(f"blk.{il}.attn_q.weight.lora_a",
                     (rng.standard_normal((4, k)) * 0.05).astype(np.float32))
        w.add_tensor(f"blk.{il}.attn_q.weight.lora_b",
                     (rng.standard_normal((n_out, 4)) * 0.05).astype(np.float32))
    w.write()
    m = load_model(src, mode="dequant", dtype=jnp.float32, fuse=False)
    base_logits = _logits(src)
    merged = merge_lora(m.params, load_lora(lora), scale=1.0)
    assert merged > 0
    dst = str(tmp_path / "merged.gguf")
    save_model(m, dst)
    out = _logits(dst)
    assert np.abs(out - base_logits).max() > 1e-4  # adapter took effect
    eng_m = Engine(m.params, m.config, max_seq=32, dtype=jnp.float32)
    np.testing.assert_allclose(
        out, np.asarray(eng_m.prefill([1, 5, 9, 2])), atol=1e-5)
