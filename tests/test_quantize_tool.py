"""Quantize tool E2E: f32 tiny model -> Q4_K_M -> loads and generates."""

import numpy as np
import pytest

import jax.numpy as jnp

from llamacog_tpu.gguf import GGMLType, GGUFReader
from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.engine import Engine
from llamacog_tpu.tools.quantize import quantize_model, tensor_get_type, QuantizeState, use_more_bits
from llamacog_tpu.gguf.constants import LlamaFtype


@pytest.fixture(scope="module")
def f32_model(tmp_path_factory):
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    path = tmp_path_factory.mktemp("q") / "f32.gguf"
    # dims divisible by 256 so K-quants apply
    return make_tiny_llama_gguf(
        path, n_embd=256, n_ff=512, n_head=8, n_head_kv=2, n_layer=2, n_vocab=256
    )


def test_quantize_q4km_roundtrip(f32_model, tmp_path):
    out = tmp_path / "q4km.gguf"
    stats = quantize_model(str(f32_model), str(out), "Q4_K_M")
    assert stats["quantized"] > 0
    assert stats["out_bytes"] < stats["in_bytes"] / 2
    with GGUFReader(out) as r:
        assert r.metadata["general.file_type"] == int(LlamaFtype.MOSTLY_Q4_K_M)
        types = {n: ti.ggml_type for n, ti in r.tensors.items()}
    # policy: output.weight -> Q6_K; attn_v early layers (GQA>=4 + use_more_bits) -> Q6_K
    assert types["output.weight"] == GGMLType.Q6_K
    assert types["blk.0.attn_q.weight"] == GGMLType.Q4_K
    # use_more_bits(i, 2): only layer 1 (>= 7n/8) qualifies
    assert types["blk.0.ffn_down.weight"] == GGMLType.Q4_K
    assert types["blk.1.ffn_down.weight"] == GGMLType.Q6_K
    assert types["blk.1.attn_v.weight"] == GGMLType.Q6_K
    assert types["blk.0.attn_norm.weight"] == GGMLType.F32  # norms never quantized
    # quantized model loads and generates
    m = load_model(str(out), mode="quantized", dtype=jnp.float32)
    e = Engine(m.params, m.config, max_seq=32, dtype=jnp.float32)
    r = e.generate_greedy([1, 2, 3], 4)
    assert len(r.tokens) == 4


def test_quantize_q8_0(f32_model, tmp_path):
    out = tmp_path / "q8.gguf"
    quantize_model(str(f32_model), str(out), "Q8_0")
    # Q8_0 output should be close to the f32 original
    mf = load_model(str(f32_model), mode="dequant", dtype=jnp.float32)
    mq = load_model(str(out), mode="dequant", dtype=jnp.float32)
    ef = Engine(mf.params, mf.config, max_seq=32, dtype=jnp.float32)
    eq = Engine(mq.params, mq.config, max_seq=32, dtype=jnp.float32)
    lf = ef.prefill([1, 2, 3])
    lq = eq.prefill([1, 2, 3])
    assert np.abs(lf - lq).max() < 0.15


def test_use_more_bits_pattern():
    # first 1/8, last 1/8, and every 3rd in between (llama-quant.cpp:185)
    n = 32
    marks = [use_more_bits(i, n) for i in range(n)]
    assert all(marks[:4]) and all(marks[-4:])
    assert sum(marks) > 8


def test_imatrix_to_iquant_to_decode_pipeline(tmp_path):
    """Full calibration workflow end to end: collect an imatrix (jitted),
    quantize to an imatrix-requiring i-quant, load and decode — the
    reference's imatrix -> quantize -> run pipeline."""
    import jax.numpy as jnp

    from llamacog_tpu.models.loader import load_model
    from llamacog_tpu.runtime.engine import Engine
    from llamacog_tpu.tools.imatrix import collect_imatrix
    from llamacog_tpu.tools.quantize import main as quantize_main
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    # i-quant superblocks need K % 256 == 0
    src = str(tmp_path / "f32.gguf")
    make_tiny_llama_gguf(src, n_embd=256, n_head=4, n_head_kv=2, n_ff=512,
                         quant_type=GGMLType.F32)
    model = load_model(src, mode="dequant", dtype=jnp.float32, fuse=False)
    text = "the quick brown fox jumps over the lazy dog " * 30
    col = collect_imatrix(model, text, n_ctx=32, max_chunks=3)
    dat = str(tmp_path / "im.dat")
    col.save(dat, last_prompt="calib")

    out = str(tmp_path / "iq2.gguf")
    assert quantize_main([src, out, "IQ4_XS", "--imatrix", dat]) == 0

    m = load_model(out, with_tokenizer=False, dtype=jnp.float32)
    eng = Engine(m.params, m.config, batch_size=1, max_seq=32,
                 dtype=jnp.float32)
    ref = load_model(src, with_tokenizer=False, dtype=jnp.float32)
    eng_ref = Engine(ref.params, ref.config, batch_size=1, max_seq=32,
                     dtype=jnp.float32)
    toks = [3, 17, 9, 41]
    a = np.asarray(eng.prefill(toks))
    b = np.asarray(eng_ref.prefill(toks))
    assert np.isfinite(a).all()
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    # random gaussian weights quantize worse than real ones; the gate
    # checks the pipeline wiring, not quantization quality
    assert corr > 0.9, f"IQ4_XS logits corr {corr}"
