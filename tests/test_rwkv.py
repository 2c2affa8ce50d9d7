"""RWKV6/7: wkv recurrence vs direct numpy loops (the reference CPU kernel
semantics, ggml-cpu/ops.cpp :8127/:8546), prefill-vs-stepwise state
equivalence (recurrence correctness), and engine end-to-end."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy compiles / reference-oracle runs: core profile skips (-m 'not slow')

import jax.numpy as jnp

from llamacog_tpu.ops.wkv import wkv6, wkv7


def np_wkv6(k, v, r, u, w, state):
    B, T, H, D = k.shape
    S = state.copy()
    out = np.zeros((B, T, H, D), np.float32)
    for b in range(B):
        for t in range(T):
            for h in range(H):
                for i in range(D):
                    kv = k[b, t, h, i] * v[b, t, h]  # [D]
                    out[b, t, h] += r[b, t, h, i] * (u[h, i] * kv + S[b, h, i])
                    S[b, h, i] = S[b, h, i] * w[b, t, h, i] + kv
    return out, S


def np_gla(k, v, q, g, state, scale):
    B, T, H, D = k.shape
    S = state.copy()
    out = np.zeros((B, T, H, D), np.float32)
    for b in range(B):
        for t in range(T):
            for h in range(H):
                S[b, h] = S[b, h] * g[b, t, h][:, None] + np.outer(k[b, t, h], v[b, t, h])
                out[b, t, h] = scale * (q[b, t, h] @ S[b, h])
    return out, S


def np_wkv7(r, w, k, v, a, b_, state):
    B, T, H, D = k.shape
    S = state.copy()
    out = np.zeros((B, T, H, D), np.float32)
    for b in range(B):
        for t in range(T):
            for h in range(H):
                sa = S[b, h] @ a[b, t, h]  # [Dv]
                S[b, h] = (
                    S[b, h] * w[b, t, h][None, :]
                    + np.outer(v[b, t, h], k[b, t, h])
                    + np.outer(sa, b_[b, t, h])
                )
                out[b, t, h] = S[b, h] @ r[b, t, h]
    return out, S


def _rand(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32) * 0.5


def test_wkv6_matches_numpy():
    B, T, H, D = 2, 5, 3, 4
    k, v, r = _rand((B, T, H, D), 0), _rand((B, T, H, D), 1), _rand((B, T, H, D), 2)
    w = np.exp(-np.exp(_rand((B, T, H, D), 3)))
    u = _rand((H, D), 4)
    s0 = _rand((B, H, D, D), 5)
    ref_o, ref_s = np_wkv6(k, v, r, u, w, s0)
    got_o, got_s = wkv6(*map(jnp.asarray, (k, v, r, u, w, s0)))
    np.testing.assert_allclose(np.asarray(got_o), ref_o, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_s), ref_s, rtol=1e-5, atol=1e-5)


def test_wkv7_matches_numpy():
    B, T, H, D = 2, 5, 3, 4
    r, w, k, v = (_rand((B, T, H, D), i) for i in range(4))
    w = np.exp(-np.abs(w))  # decay in (0, 1]
    kk = _rand((B, T, H, D), 6)
    kk = kk / np.maximum(np.linalg.norm(kk, axis=-1, keepdims=True), 1e-6)
    a_in = -kk
    b_in = kk * 0.5
    s0 = _rand((B, H, D, D), 7)
    ref_o, ref_s = np_wkv7(r, w, k, v, a_in, b_in, s0)
    got_o, got_s = wkv7(*map(jnp.asarray, (r, w, k, v, a_in, b_in, s0)))
    np.testing.assert_allclose(np.asarray(got_o), ref_o, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_s), ref_s, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("version", [6, 7, "6q", "7a"])
def test_prefill_equals_stepwise(tmp_path, version):
    """T tokens at once must produce the same logits/state as T single steps
    (the recurrence has no other ground truth without pretrained weights)."""
    from llamacog_tpu.models.loader import load_model
    from llamacog_tpu.models.rwkv import forward, make_rwkv_cache
    from llamacog_tpu.utils.testing import make_tiny_rwkv_gguf

    path = make_tiny_rwkv_gguf(tmp_path / f"rwkv{version}.gguf", version=version)
    m = load_model(path, dtype=jnp.float32)
    cfg = m.config
    assert cfg.is_recurrent and cfg.wkv_head_size == 8
    toks = np.array([[3, 9, 17, 4, 25, 11]], np.int32)
    active = jnp.ones((1,), bool)

    cache = make_rwkv_cache(cfg, 1)
    full_logits, full_cache = forward(m.params, cfg, jnp.asarray(toks), cache, active)

    cache = make_rwkv_cache(cfg, 1)
    steps = []
    for t in range(toks.shape[1]):
        lg, cache = forward(m.params, cfg, jnp.asarray(toks[:, t : t + 1]), cache, active)
        steps.append(np.asarray(lg[:, 0]))
    step_logits = np.stack(steps, axis=1)
    np.testing.assert_allclose(
        np.asarray(full_logits), step_logits, rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(full_cache.wkv), np.asarray(cache.wkv), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(full_cache.shift), np.asarray(cache.shift), rtol=1e-5, atol=1e-5
    )


def test_gla_matches_numpy():
    from llamacog_tpu.ops.wkv import gated_linear_attn

    B, T, H, D = 2, 5, 3, 4
    k, v, q = _rand((B, T, H, D), 0), _rand((B, T, H, D), 1), _rand((B, T, H, D), 2)
    g = np.exp(-np.abs(_rand((B, T, H, D), 3)))
    s0 = _rand((B, H, D, D), 4)
    ref_o, ref_s = np_gla(k, v, q, g, s0, 0.5)
    got_o, got_s = gated_linear_attn(*map(jnp.asarray, (k, v, q, g, s0)), 0.5)
    np.testing.assert_allclose(np.asarray(got_o), ref_o, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_s), ref_s, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("version", [6, 7, "6q", "7a"])
def test_engine_decode(tmp_path, version):
    from llamacog_tpu.models.loader import load_model
    from llamacog_tpu.runtime.engine import Engine
    from llamacog_tpu.utils.testing import make_tiny_rwkv_gguf

    path = make_tiny_rwkv_gguf(tmp_path / f"rwkv{version}.gguf", version=version)
    m = load_model(path, dtype=jnp.float32)
    eng = Engine(m.params, m.config, batch_size=1, max_seq=64)
    logits = eng.prefill([1, 5, 9, 2])
    assert logits.shape == (m.config.n_vocab,)
    assert np.isfinite(logits).all()
    # continuation changes the distribution (state actually advances)
    logits2 = eng.prefill([7, 3])
    assert np.isfinite(logits2).all()
    assert not np.allclose(logits, logits2)


def test_inactive_rows_keep_state(tmp_path):
    from llamacog_tpu.models.loader import load_model
    from llamacog_tpu.models.rwkv import forward, make_rwkv_cache
    from llamacog_tpu.utils.testing import make_tiny_rwkv_gguf

    path = make_tiny_rwkv_gguf(tmp_path / "rwkv6b.gguf", version=6)
    m = load_model(path, dtype=jnp.float32)
    cache = make_rwkv_cache(m.config, 2)
    toks = np.array([[3, 9], [4, 7]], np.int32)
    active = jnp.asarray([True, False])
    _, cache2 = forward(m.params, m.config, jnp.asarray(toks), cache, active)
    assert not np.allclose(np.asarray(cache2.wkv[:, 0]), 0.0)
    np.testing.assert_array_equal(np.asarray(cache2.wkv[:, 1]), 0.0)
    np.testing.assert_array_equal(np.asarray(cache2.shift[:, 1]), 0.0)
