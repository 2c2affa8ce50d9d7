"""Training-hook tests (reference llama_opt_* / examples/training/finetune.cpp:
a tiny model must overfit a short repeated sequence)."""

import numpy as np
import pytest

import jax.numpy as jnp

from llamacog_tpu.models.loader import load_model
from llamacog_tpu.train import OptParams, opt_epoch, opt_init
from llamacog_tpu.utils.testing import make_tiny_llama_gguf


@pytest.fixture(scope="module")
def dense_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("train") / "t.gguf"
    make_tiny_llama_gguf(str(path), n_layer=2, n_embd=32, n_head=2, n_head_kv=2,
                         n_ff=64, n_vocab=64)
    return load_model(str(path), mode="dequant", dtype=jnp.float32, with_tokenizer=False)


def test_adamw_overfits(dense_model):
    m = dense_model
    rng = np.random.default_rng(0)
    tokens = np.tile(rng.integers(0, 64, size=16), 16)  # repeated pattern
    st = opt_init(m.params, m.config, OptParams(lr=3e-3), n_ctx=16)
    first = opt_epoch(st, tokens, n_batch=4, shuffle=False)
    for _ in range(15):
        last = opt_epoch(st, tokens, n_batch=4, shuffle=False)
    assert last < first * 0.5, (first, last)


def test_sgd_reduces_loss(dense_model):
    m = dense_model
    rng = np.random.default_rng(1)
    tokens = np.tile(rng.integers(0, 64, size=16), 8)
    st = opt_init(m.params, m.config, OptParams(optimizer="sgd", lr=0.05), n_ctx=16)
    first = opt_epoch(st, tokens, n_batch=2, shuffle=False)
    for _ in range(5):
        last = opt_epoch(st, tokens, n_batch=2, shuffle=False)
    assert last < first


def test_quantized_params_rejected(tmp_path):
    from llamacog_tpu.gguf import GGMLType

    path = str(tmp_path / "q.gguf")
    make_tiny_llama_gguf(path, quant_type=GGMLType.Q4_0)
    m = load_model(path, mode="quantized", with_tokenizer=False)
    with pytest.raises(ValueError, match="dense"):
        opt_init(m.params, m.config)
