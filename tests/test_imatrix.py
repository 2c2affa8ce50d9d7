"""imatrix collector: collect stats, save .dat, reload via the quantize tool."""

import numpy as np
import pytest

import jax.numpy as jnp

from llamacog_tpu.gguf import GGMLType
from llamacog_tpu.models.loader import load_model
from llamacog_tpu.tools.imatrix import collect_imatrix
from llamacog_tpu.tools.quantize import load_imatrix


def test_imatrix_collect_save_load(tmp_path):
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    path = make_tiny_llama_gguf(tmp_path / "t.gguf", quant_type=GGMLType.F32)
    model = load_model(str(path), mode="dequant", dtype=jnp.float32, fuse=False)
    text = "the quick brown fox jumps over the lazy dog " * 20
    col = collect_imatrix(model, text, n_ctx=32, max_chunks=2)
    assert col.ncall == 2
    assert "blk.0.attn_q.weight" in col.values
    assert "blk.0.ffn_down.weight" in col.values
    # activations squared -> strictly positive for used columns
    assert (col.values["blk.0.attn_q.weight"] > 0).all()
    # dims: attn_q input is n_embd
    assert col.values["blk.0.attn_q.weight"].shape == (model.config.n_embd,)

    out = tmp_path / "im.dat"
    col.save(str(out), last_prompt="test")
    loaded = load_imatrix(str(out))
    assert set(loaded) == set(col.values)
    np.testing.assert_allclose(
        loaded["blk.0.attn_q.weight"],
        col.values["blk.0.attn_q.weight"] / col.counts["blk.0.attn_q.weight"],
        rtol=1e-6,
    )


def test_imatrix_matches_manual_sums(tmp_path):
    """Jitted collection must equal a hand-computed per-column sum of
    squared activations for the first matmul (embedding output -> attn_q)."""
    from llamacog_tpu.models.llama import embed_tokens
    from llamacog_tpu.ops.norms import rms_norm
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    path = make_tiny_llama_gguf(tmp_path / "t.gguf", quant_type=GGMLType.F32)
    model = load_model(str(path), mode="dequant", dtype=jnp.float32, fuse=False)
    text = "hello world " * 16
    col = collect_imatrix(model, text, n_ctx=16, max_chunks=1)
    toks = model.tokenizer.tokenize(text, add_special=False)[:16]
    ids = [model.vocab.bos_id] + list(toks[:-1])
    x = embed_tokens(model.params, jnp.asarray([ids]), dtype=jnp.float32)
    h = rms_norm(x, model.params["layers"][0]["attn_norm"],
                 model.config.rms_norm_eps)
    manual = np.asarray((np.asarray(h, np.float64) ** 2).sum(axis=(0, 1)))
    np.testing.assert_allclose(col.values["blk.0.attn_q.weight"], manual,
                               rtol=1e-4)
    np.testing.assert_allclose(col.counts["blk.0.attn_q.weight"], 16.0)


def test_imatrix_moe_expert_entries(tmp_path):
    """MoE expert tensors accumulate per expert into n_exp*K vectors
    (reference MUL_MAT_ID layout, imatrix.cpp:107-140), and quantize
    consumes them per expert."""
    from llamacog_tpu.tools.quantize import quantize_model
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    path = make_tiny_llama_gguf(
        tmp_path / "moe.gguf", quant_type=GGMLType.F32, n_expert=4,
        n_expert_used=2,
    )
    model = load_model(str(path), mode="dequant", dtype=jnp.float32, fuse=False)
    text = "a b c d e f g h " * 16
    col = collect_imatrix(model, text, n_ctx=16, max_chunks=1)
    E = model.config.n_embd
    name = "blk.0.ffn_gate_exps.weight"
    assert name in col.values
    assert col.values[name].shape == (4 * E,)
    out = tmp_path / "im.dat"
    col.save(str(out))
    q = tmp_path / "q.gguf"
    stats = quantize_model(str(path), str(q), "Q8_0", imatrix_path=str(out))
    assert stats["quantized"] > 0
    m2 = load_model(str(q), with_tokenizer=False, dtype=jnp.float32)
    assert m2.config.n_expert == 4
