"""State save/restore determinism (role of examples/save-load-state)."""

import numpy as np
import pytest

import jax.numpy as jnp

from llamacog_tpu.gguf import GGMLType
from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.engine import Engine
from llamacog_tpu.runtime.state import load_row_state, save_row_state


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    path = tmp_path_factory.mktemp("st") / "tiny.gguf"
    make_tiny_llama_gguf(path, quant_type=GGMLType.F32)
    return load_model(str(path), mode="dequant", dtype=jnp.float32)


def test_save_restore_continues_identically(model, tmp_path):
    prompt = [1, 5, 9, 13]
    e1 = Engine(model.params, model.config, max_seq=64, dtype=jnp.float32)
    e1.prefill(prompt)
    save_row_state(e1, tmp_path / "s.npz", tokens=prompt)
    cont1 = e1.generate_greedy.__wrapped__ if False else None
    l1 = e1.decode_one(np.array([42]))[0]

    e2 = Engine(model.params, model.config, max_seq=64, dtype=jnp.float32)
    toks = load_row_state(e2, tmp_path / "s.npz")
    assert toks == prompt
    assert e2.seq_len[0] == len(prompt)
    l2 = e2.decode_one(np.array([42]))[0]
    np.testing.assert_allclose(l1, l2, rtol=1e-5, atol=1e-5)


def test_save_restore_quantized_cache(model, tmp_path):
    e1 = Engine(model.params, model.config, max_seq=64, dtype=jnp.float32, kv_type="q8_0")
    e1.prefill([1, 2, 3])
    save_row_state(e1, tmp_path / "q.npz")
    l1 = e1.decode_one(np.array([4]))[0]
    e2 = Engine(model.params, model.config, max_seq=64, dtype=jnp.float32, kv_type="q8_0")
    load_row_state(e2, tmp_path / "q.npz")
    l2 = e2.decode_one(np.array([4]))[0]
    np.testing.assert_allclose(l1, l2, rtol=1e-5, atol=1e-5)


def test_kind_mismatch_rejected(model, tmp_path):
    e1 = Engine(model.params, model.config, max_seq=64, dtype=jnp.float32)
    e1.prefill([1, 2])
    save_row_state(e1, tmp_path / "d.npz")
    e2 = Engine(model.params, model.config, max_seq=64, dtype=jnp.float32, kv_type="q8_0")
    with pytest.raises(ValueError):
        load_row_state(e2, tmp_path / "d.npz")


def test_too_long_rejected(model, tmp_path):
    e1 = Engine(model.params, model.config, max_seq=64, dtype=jnp.float32)
    e1.prefill(list(range(1, 40)))
    save_row_state(e1, tmp_path / "l.npz")
    e2 = Engine(model.params, model.config, max_seq=32, dtype=jnp.float32)
    with pytest.raises(ValueError):
        load_row_state(e2, tmp_path / "l.npz")
