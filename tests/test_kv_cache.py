"""KV cache tests: quantized Q8_0 cache vs dense, context shift semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from llamacog_tpu.gguf import GGMLType
from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.engine import Engine
from llamacog_tpu.runtime.kv_cache import QuantKVCache


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    path = tmp_path_factory.mktemp("kv") / "tiny.gguf"
    make_tiny_llama_gguf(path, quant_type=GGMLType.F32)
    return load_model(str(path), mode="dequant", dtype=jnp.float32)


def test_q8_cache_quant_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 64)), jnp.float32)
    q, s = QuantKVCache._quant(x)
    y = QuantKVCache._dequant(q, s, jnp.float32)
    err = np.abs(np.asarray(x) - np.asarray(y)).max() / np.abs(np.asarray(x)).max()
    assert err < 0.01  # 8-bit round-trip


def test_q8_kv_close_to_dense(model):
    prompt = [1, 5, 9, 13, 42]
    e_dense = Engine(model.params, model.config, max_seq=64, dtype=jnp.float32)
    e_q8 = Engine(model.params, model.config, max_seq=64, dtype=jnp.float32, kv_type="q8_0")
    ld = e_dense.prefill(prompt)
    lq = e_q8.prefill(prompt)
    # Q8 KV introduces small noise; logits must stay close and argmax stable
    assert np.abs(ld - lq).max() < 0.05
    assert ld.argmax() == lq.argmax()
    # greedy decode works on the quantized cache
    r = e_q8.generate_greedy(prompt, 6)
    assert len(r.tokens) == 6


def test_q8_cache_halves_memory(model):
    cfg = model.config
    e_dense = Engine(model.params, cfg, max_seq=64, dtype=jnp.bfloat16)
    e_q8 = Engine(model.params, cfg, max_seq=64, dtype=jnp.bfloat16, kv_type="q8_0")
    dense_bytes = e_dense.cache.k.nbytes + e_dense.cache.v.nbytes
    q8_bytes = (
        e_q8.cache.k_q.nbytes + e_q8.cache.k_s.nbytes
        + e_q8.cache.v_q.nbytes + e_q8.cache.v_s.nbytes
    )
    assert q8_bytes < dense_bytes * 0.75


def test_context_shift(model):
    e = Engine(model.params, model.config, max_seq=32, dtype=jnp.float32)
    prompt = list(range(1, 17))
    e.prefill(prompt)
    assert e.seq_len[0] == 16
    e.shift_row(0, n_keep=4, n_discard=8)
    assert e.seq_len[0] == 8
    # decoding still works and is finite
    logits = e.decode_one(np.array([5]))
    assert np.isfinite(logits).all()


def test_context_shift_matches_recompute_single_layer(tmp_path):
    """For a 1-layer model, K depends only on embeddings, so shift+re-rope
    must exactly equal a fresh prefill of the kept tokens. (Multi-layer
    caches keep full-history representations — an intentional approximation,
    same as the reference.)"""
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    path = make_tiny_llama_gguf(tmp_path / "l1.gguf", n_layer=1, quant_type=GGMLType.F32)
    m = load_model(str(path), mode="dequant", dtype=jnp.float32)
    e1 = Engine(m.params, m.config, max_seq=32, dtype=jnp.float32)
    prompt = [1, 2, 3, 4, 5, 6, 7, 8]
    e1.prefill(prompt)
    e1.shift_row(0, n_keep=0, n_discard=4)  # keep tokens 5..8 at positions 0..3
    l_shift = e1.decode_one(np.array([9]))[0]

    e2 = Engine(m.params, m.config, max_seq=32, dtype=jnp.float32)
    e2.prefill([5, 6, 7, 8])
    l_fresh = e2.decode_one(np.array([9]))[0]
    np.testing.assert_allclose(l_shift, l_fresh, rtol=2e-3, atol=2e-3)


def test_engine_copy_row(tmp_path):
    import jax.numpy as jnp
    import numpy as np

    from llamacog_tpu.models.loader import load_model
    from llamacog_tpu.runtime.engine import Engine
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    path = make_tiny_llama_gguf(str(tmp_path / "c.gguf"))
    m = load_model(path, with_tokenizer=False, dtype=jnp.float32)
    e = Engine(m.params, m.config, batch_size=2, max_seq=64, dtype=jnp.float32)
    e.prefill([1, 2, 3, 4], row=0)
    e.copy_row(0, 1)
    assert e.seq_len[1] == e.seq_len[0]
    # both rows decode identically from the shared state
    logits = e.decode_one(np.array([5, 5]))
    np.testing.assert_allclose(logits[0], logits[1], atol=1e-5)


@pytest.mark.parametrize("kv", ["q8_0", "q4_0"])
def test_context_shift_quantized_cache(model, kv):
    """On-device context shift (dequant -> gather -> re-rope -> requant)
    through both quantized cache variants."""
    from llamacog_tpu.runtime.kv_cache import Q4KVCache, QuantKVCache

    e = Engine(model.params, model.config, max_seq=32, dtype=jnp.float32,
               kv_type=kv)
    want = Q4KVCache if kv == "q4_0" else QuantKVCache
    assert type(e.cache) is want
    e.prefill(list(range(1, 17)))
    e.shift_row(0, n_keep=4, n_discard=8)
    assert type(e.cache) is want  # shift must not downgrade the cache class
    assert e.seq_len[0] == 8
    logits = e.decode_one(np.array([5]))
    assert np.isfinite(logits).all()
