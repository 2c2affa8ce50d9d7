"""SWA ring cache (llama_kv_cache_unified_iswa role): window-sized ring for
SWA layers must be logit-identical to the full-size cache with window masks,
across prefills and decodes that wrap the ring."""

import numpy as np
import pytest

import jax.numpy as jnp

from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.engine import Engine
from llamacog_tpu.runtime.kv_cache import KVCache, SwaKVCache, make_cache
from llamacog_tpu.utils.testing import make_tiny_llama_gguf


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("swa") / "tiny_swa.gguf"
    # gemma2-style interleaved SWA, window 8
    make_tiny_llama_gguf(
        path, n_embd=64, n_head=4, n_head_kv=2, n_layer=4, n_ff=96,
        extra_metadata={"llama.attention.sliding_window": 8},
    )
    m = load_model(str(path), dtype=jnp.float32)
    m.config.swa_pattern = 2  # every other layer SWA (gemma2 rule)
    return m


def _full_cache_engine(m, max_seq):
    eng = Engine.__new__(Engine)
    # build normally, then force the full-size cache path
    eng.__init__(m.params, m.config, batch_size=2, max_seq=max_seq,
                 dtype=jnp.float32, kv_type="bf16")
    return eng


def test_ring_selected(model):
    eng = Engine(model.params, model.config, batch_size=2, max_seq=64,
                 dtype=jnp.float32)
    assert isinstance(eng.cache, SwaKVCache)
    assert eng.cache.window == 8
    # memory: SWA layers hold window+1 slots, not max_seq
    assert eng.cache.k_swa.shape[2] == 9
    assert eng.cache.full.k.shape[0] == 2  # half the layers stay full-size


def test_ring_matches_full_cache(model):
    ring = Engine(model.params, model.config, batch_size=2, max_seq=64,
                  dtype=jnp.float32)
    full = _full_cache_engine(model, 64)
    assert isinstance(full.cache, KVCache)

    prompt = [3, 9, 17, 4, 25, 11, 7, 2, 13, 40, 41, 42]  # > window
    lr = ring.prefill(prompt)
    lf = full.prefill(prompt)
    np.testing.assert_allclose(lr, lf, rtol=2e-5, atol=2e-5)

    # decode far past the window so the ring wraps several times
    tok = int(np.argmax(lf))
    for _ in range(20):
        lr = ring.decode_one(np.array([tok, 0]))[0]
        lf = full.decode_one(np.array([tok, 0]))[0]
        np.testing.assert_allclose(lr, lf, rtol=2e-5, atol=2e-5)
        tok = int(np.argmax(lf))

    # a second prefill (multi-turn) on top
    lr = ring.prefill([5, 6, 7])
    lf = full.prefill([5, 6, 7])
    np.testing.assert_allclose(lr, lf, rtol=2e-5, atol=2e-5)


def test_ring_multirow_isolation(model):
    ring = Engine(model.params, model.config, batch_size=2, max_seq=64,
                  dtype=jnp.float32)
    full = _full_cache_engine(model, 64)
    ring.prefill([3, 9, 17, 4, 25, 11, 7, 2, 13], row=0)
    full.prefill([3, 9, 17, 4, 25, 11, 7, 2, 13], row=0)
    # prefilling row 1 must not disturb row 0's ring
    ring.prefill([8, 1, 2], row=1)
    full.prefill([8, 1, 2], row=1)
    lr = ring.decode_one(np.array([5, 6]))
    lf = full.decode_one(np.array([5, 6]))
    np.testing.assert_allclose(lr, lf, rtol=2e-5, atol=2e-5)


def test_copy_row_with_ring(model):
    ring = Engine(model.params, model.config, batch_size=2, max_seq=64,
                  dtype=jnp.float32)
    ring.prefill([3, 9, 17, 4, 25, 11, 7, 2, 13, 1], row=0)
    ring.copy_row(0, 1)
    l0 = ring.decode_one(np.array([5, 5]))
    np.testing.assert_allclose(l0[0], l0[1], rtol=1e-6, atol=1e-6)


def test_state_save_restore_with_ring(model, tmp_path):
    from llamacog_tpu.runtime.state import load_row_state, save_row_state

    eng = Engine(model.params, model.config, batch_size=1, max_seq=64,
                 dtype=jnp.float32)
    prompt = [3, 9, 17, 4, 25, 11, 7, 2, 13, 40]
    lg = eng.prefill(prompt)
    p = str(tmp_path / "row.state")
    save_row_state(eng, p, row=0, tokens=prompt)

    eng2 = Engine(model.params, model.config, batch_size=1, max_seq=64,
                  dtype=jnp.float32)
    toks = load_row_state(eng2, p, row=0)
    assert toks == prompt
    l1 = eng.decode_one(np.array([5]))
    l2 = eng2.decode_one(np.array([5]))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6, atol=1e-6)
