"""Perplexity tool tests: the windowed NLL must equal a direct computation."""

import numpy as np
import pytest

import jax.numpy as jnp

from llamacog_tpu.gguf import GGMLType
from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.engine import Engine
from llamacog_tpu.tools.perplexity import compute_kld, compute_perplexity, log_softmax_rows


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    path = tmp_path_factory.mktemp("ppl") / "tiny.gguf"
    make_tiny_llama_gguf(path, quant_type=GGMLType.F32, n_ctx=128)
    model = load_model(str(path), mode="dequant", dtype=jnp.float32)
    engine = Engine(model.params, model.config, max_seq=32, dtype=jnp.float32)
    return model, engine


def test_perplexity_matches_manual(setup):
    model, engine = setup
    text = "hello world, this is a test of perplexity computation" * 4
    n_ctx = 32
    ppl, mean, err, count = compute_perplexity(
        engine, model.tokenizer, model.vocab, text, n_ctx=n_ctx
    )
    assert np.isfinite(ppl) and ppl > 0
    # manual recomputation of chunk 0
    tokens = model.tokenizer.tokenize(text, add_special=False)
    chunk = list(tokens[:n_ctx])
    chunk[0] = model.vocab.bos_id
    engine.clear_row(0)
    logits = engine.prefill_logits(chunk)
    first = n_ctx // 2
    lp = log_softmax_rows(logits[first : n_ctx - 1].astype(np.float64))
    targets = np.array(chunk[first + 1 :])
    manual_nll = -lp[np.arange(len(targets)), targets].sum()
    n_chunks = len(tokens) // n_ctx
    assert count == n_chunks * (n_ctx - 1 - first)
    # chunk-0 contribution should appear in total
    assert manual_nll / count <= mean * n_chunks + 1e-6


def test_prefill_logits_consistent_with_prefill(setup):
    model, engine = setup
    ids = [1, 5, 9, 13]
    engine.clear_row(0)
    all_logits = engine.prefill_logits(ids)
    engine.clear_row(0)
    last = engine.prefill(ids)
    np.testing.assert_allclose(all_logits[-1], last, rtol=1e-5, atol=1e-5)


def test_kld_zero_for_identical():
    lp = log_softmax_rows(np.random.default_rng(0).standard_normal((10, 50)))
    r = compute_kld(lp, lp)
    assert abs(r["kld_mean"]) < 1e-9
    assert r["same_top_p"] == 1.0


def test_kld_positive_for_different():
    rng = np.random.default_rng(0)
    a = log_softmax_rows(rng.standard_normal((10, 50)))
    b = log_softmax_rows(rng.standard_normal((10, 50)))
    r = compute_kld(a, b)
    assert r["kld_mean"] > 0.1
