"""M-RoPE engine plumbing (qwen2vl): image chunks get (t, h, w) positions,
the whole image advances the position counter by one, and the engine path
matches a manually-driven forward with hand-built tables
(mtmd-helper.cpp set_position_mrope_2d + mtmd.cpp get_n_pos semantics)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy compiles / reference-oracle runs: core profile skips (-m 'not slow')

import jax.numpy as jnp

from llamacog_tpu.models.loader import load_model
from llamacog_tpu.mtmd.qwen2vl import mrope_tables
from llamacog_tpu.runtime.engine import Engine
from llamacog_tpu.utils.testing import make_tiny_llama_gguf

SECTIONS = (2, 3, 3)  # head_dim 16 -> 8 rotary pairs


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("mrope") / "tiny_mrope.gguf"
    make_tiny_llama_gguf(
        path, n_embd=64, n_head=4, n_head_kv=2, n_layer=2, n_ff=96,
        extra_metadata={"llama.rope.dimension_sections": [2, 3, 3, 0]},
    )
    return load_model(str(path), dtype=jnp.float32)


def test_sections_parsed(model):
    assert model.config.rope.sections == (2, 3, 3, 0)


def test_text_only_positions_unchanged(model):
    """With no media, pos_offset stays zero and decode behaves normally."""
    eng = Engine(model.params, model.config, batch_size=1, max_seq=32,
                 dtype=jnp.float32)
    eng.prefill([1, 2, 3])
    assert eng.pos_offset[0] == 0
    logits = eng.decode_one(np.array([4]))
    assert np.isfinite(logits).all()


def test_image_chunk_advances_one_position(model):
    rng = np.random.default_rng(0)
    eng = Engine(model.params, model.config, batch_size=1, max_seq=32,
                 dtype=jnp.float32)
    eng.prefill([1, 2, 3])
    embd = rng.standard_normal((4, model.config.n_embd)).astype(np.float32) * 0.1
    logits = eng.prefill_embd(embd, grid=(2, 2))
    assert np.isfinite(logits).all()
    assert eng.seq_len[0] == 7  # cache slots: 3 text + 4 patches
    assert eng.pos_offset[0] == -3  # rope position is 4 (3 text + 1 image)


def test_engine_matches_manual_forward(model):
    """3 text tokens + 2x2 image + 1 text token through the engine must equal
    a manual forward pass with hand-built positions/tables."""
    from llamacog_tpu.models.llama import forward
    from llamacog_tpu.runtime.kv_cache import KVCache

    cfg = model.config
    rng = np.random.default_rng(1)
    embd = rng.standard_normal((4, cfg.n_embd)).astype(np.float32) * 0.1

    eng = Engine(model.params, cfg, batch_size=1, max_seq=32, dtype=jnp.float32)
    eng.prefill([1, 2, 3])
    eng.prefill_embd(embd, grid=(2, 2))
    got = eng.prefill([7])

    # manual: exact-shape forwards, positions by the mrope rules
    cache = KVCache.create(cfg.n_layer, 1, 32, cfg.n_head_kv, cfg.head_dim_k,
                           cfg.head_dim_v, dtype=jnp.float32)
    wp = jnp.zeros((1,), jnp.int32)
    toks = jnp.asarray([[1, 2, 3]], jnp.int32)
    _, cache = forward(model.params, cfg, toks, jnp.asarray([[0, 1, 2]]), cache,
                       wp, dtype=jnp.float32)
    # image patches: t=3, h=3+y, w=3+x
    pos = np.array([[3, 3, 3, 3], [3, 3, 4, 4], [3, 4, 3, 4]], np.int32)
    cos, sin = mrope_tables(jnp.asarray(pos), SECTIONS, cfg.head_dim_k,
                            cfg.rope.freq_base)
    _, cache = forward(
        model.params, cfg, jnp.zeros((1, 4), jnp.int32), jnp.asarray([[3, 3, 3, 3]]),
        cache, jnp.asarray([3]), dtype=jnp.float32,
        input_embd=jnp.asarray(embd[None]), rope_override=(cos, sin),
    )
    # next text token: cache slot 7, rope position 4
    logits, cache = forward(
        model.params, cfg, jnp.asarray([[7]], jnp.int32), jnp.asarray([[4]]),
        cache, jnp.asarray([7]), dtype=jnp.float32,
    )
    ref = np.asarray(logits[0, 0])
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_mrope_equal_components_match_standard_rope(model):
    """Equal (t,h,w) positions must reduce to ordinary RoPE tables."""
    from llamacog_tpu.ops.rope import rope_tables

    cfg = model.config
    p = np.array([5, 6, 7], np.int32)
    pos3 = np.stack([p, p, p], 0)
    cos_m, sin_m = mrope_tables(jnp.asarray(pos3), SECTIONS, cfg.head_dim_k,
                                cfg.rope.freq_base)
    cos_s, sin_s = rope_tables(jnp.asarray(p[None]), cfg.rope, cfg.head_dim_k, None)
    np.testing.assert_allclose(np.asarray(cos_m), np.asarray(cos_s[0]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin_m), np.asarray(sin_s[0]),
                               rtol=1e-6, atol=1e-6)
