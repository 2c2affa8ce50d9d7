"""Speculative decoding: with draft == target, output must equal plain greedy
decoding and acceptance must be ~100%."""

import numpy as np
import pytest

import jax.numpy as jnp

from llamacog_tpu.gguf import GGMLType
from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.engine import Engine
from llamacog_tpu.runtime.ngram_cache import NgramCache
from llamacog_tpu.runtime.speculative import SpeculativeDecoder, SpeculativeParams


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    path = tmp_path_factory.mktemp("spec") / "tiny.gguf"
    make_tiny_llama_gguf(path, quant_type=GGMLType.F32)
    return load_model(str(path), mode="dequant", dtype=jnp.float32)


def test_speculative_matches_greedy(model):
    prompt = [1, 5, 9, 13]
    n = 12
    ref = Engine(model.params, model.config, max_seq=64, dtype=jnp.float32)
    expected = ref.generate_greedy(prompt, n).tokens

    target = Engine(model.params, model.config, max_seq=64, dtype=jnp.float32)
    draft = Engine(model.params, model.config, max_seq=64, dtype=jnp.float32)
    spec = SpeculativeDecoder(target, draft, SpeculativeParams(n_draft=4, p_min=0.0))
    got, stats = spec.generate(prompt, n)
    assert got == expected, (got, expected)
    assert stats["drafted"] > 0
    # identical draft model -> high acceptance (final round may truncate at
    # the max-token limit, so not exactly 100%)
    assert stats["accepted"] >= stats["drafted"] * 0.5


def test_ngram_cache_draft():
    c = NgramCache()
    seq = [1, 2, 3, 4, 1, 2, 3, 4, 1, 2, 3, 4]
    c.update(seq)
    draft = c.draft([1, 2, 3], n_draft=4)
    assert draft[:1] == [4]


def test_ngram_cache_save_merge(tmp_path):
    a = NgramCache()
    a.update([1, 2, 3, 1, 2, 3])
    b = NgramCache()
    b.update([1, 2, 4, 1, 2, 4])
    a.save(tmp_path / "a.bin")
    a2 = NgramCache.load(tmp_path / "a.bin")
    a2.merge(b)
    d = a2.parts[(1, 2)]
    assert d.get(3) and d.get(4)
