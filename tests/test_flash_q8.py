"""Quantized-KV flash attention vs the XLA masked path.

Reference semantics: fattn vec kernels reading Q8_0 K/V directly
(ggml-cuda/fattn.cu:133-151, ggml-cpu/ops.cpp:7096). The kernels run in
interpret mode on CPU; logits must match the dequantize-then-attend path
exactly up to f32 accumulation order."""

import numpy as np
import pytest

import jax.numpy as jnp

from llamacog_tpu.ops.pallas import flash_q8
from llamacog_tpu.runtime.kv_cache import QuantKVCache


def _rand_cache_and_qkv(B, S, H, Hkv, Dk, Dv, n_valid, seed=0):
    rng = np.random.default_rng(seed)
    k_dense = rng.standard_normal((B, S, Hkv, Dk)).astype(np.float32)
    v_dense = rng.standard_normal((B, S, Hkv, Dv)).astype(np.float32)
    kq, ks = QuantKVCache._quant(jnp.asarray(k_dense))
    vq, vs = QuantKVCache._quant(jnp.asarray(v_dense))
    # the reference values the kernel should reproduce are the DEQUANTIZED
    # cache contents (quantization error is part of the contract)
    k_ref = np.asarray(QuantKVCache._dequant(kq, ks, jnp.float32))
    v_ref = np.asarray(QuantKVCache._dequant(vq, vs, jnp.float32))
    return kq, ks, vq, vs, k_ref, v_ref


def _ref_attention(q, k_ref, v_ref, k_cur, v_cur, n_valid, scale, rep):
    """Dense reference: softmax over valid cache positions + current block."""
    B, T, H, Dk = q.shape
    S = k_ref.shape[1]
    Hkv = k_ref.shape[2]
    out = np.zeros((B, T, H, v_ref.shape[-1]), np.float32)
    for b in range(B):
        for h in range(H):
            hk = h // rep
            for t in range(T):
                keys = np.concatenate(
                    [k_ref[b, : n_valid[b], hk], k_cur[b, : t + 1, hk]], axis=0
                )
                vals = np.concatenate(
                    [v_ref[b, : n_valid[b], hk], v_cur[b, : t + 1, hk]], axis=0
                )
                s = keys @ q[b, t, h] * scale
                e = np.exp(s - s.max())
                out[b, t, h] = (e / e.sum()) @ vals
    return out


@pytest.mark.parametrize("B", [1, 2])
def test_flash_decode_q8_matches(B):
    S, H, Hkv, Dk, Dv = 64, 8, 2, 32, 32
    rng = np.random.default_rng(1)
    n_valid = np.array([40, 17][:B], np.int32)
    kq, ks, vq, vs, k_ref, v_ref = _rand_cache_and_qkv(B, S, H, Hkv, Dk, Dv, n_valid)
    q = rng.standard_normal((B, 1, H, Dk)).astype(np.float32)
    k_cur = rng.standard_normal((B, 1, Hkv, Dk)).astype(np.float32)
    v_cur = rng.standard_normal((B, 1, Hkv, Dv)).astype(np.float32)
    scale = Dk ** -0.5
    got = np.asarray(flash_q8.flash_decode_q8(
        jnp.asarray(q[:, 0]), kq, ks, vq, vs, jnp.asarray(k_cur[:, 0]),
        jnp.asarray(v_cur[:, 0]), jnp.asarray(n_valid), scale, interpret=True,
    ))
    ref = _ref_attention(q, k_ref, v_ref, k_cur, v_cur, n_valid, scale, H // Hkv)
    np.testing.assert_allclose(got, ref[:, 0], atol=2e-5, rtol=1e-4)


def test_flash_prefill_q8_matches():
    B, S, T, H, Hkv, Dk, Dv = 1, 512, 16, 4, 2, 32, 32
    rng = np.random.default_rng(2)
    n_valid = np.array([300], np.int32)
    kq, ks, vq, vs, k_ref, v_ref = _rand_cache_and_qkv(B, S, H, Hkv, Dk, Dv, n_valid,
                                                       seed=5)
    q = rng.standard_normal((B, T, H, Dk)).astype(np.float32)
    k_cur = rng.standard_normal((B, T, Hkv, Dk)).astype(np.float32)
    v_cur = rng.standard_normal((B, T, Hkv, Dv)).astype(np.float32)
    scale = Dk ** -0.5
    got = np.asarray(flash_q8.flash_prefill_q8(
        jnp.asarray(q), kq, ks, vq, vs, jnp.asarray(k_cur), jnp.asarray(v_cur),
        jnp.asarray(n_valid), scale, interpret=True,
    ))
    ref = _ref_attention(q, k_ref, v_ref, k_cur, v_cur, n_valid, scale, H // Hkv)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_engine_q8_decode_uses_flash(monkeypatch):
    """Engine decode with the Q8 cache must route through flash_decode_q8."""
    import jax.numpy as jnp

    from llamacog_tpu.models.loader import load_model
    from llamacog_tpu.runtime.engine import Engine
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    import tempfile, os
    path = os.path.join(tempfile.mkdtemp(), "tiny.gguf")
    make_tiny_llama_gguf(path, n_embd=128, n_head=4, n_head_kv=2, n_ff=192)
    m = load_model(path, with_tokenizer=False, dtype=jnp.float32)
    assert m.config.head_dim_k % 32 == 0
    calls = []
    orig = flash_q8.flash_decode_q8

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(flash_q8, "flash_decode_q8", spy)
    eng = Engine(m.params, m.config, batch_size=1, max_seq=64,
                 dtype=jnp.float32, kv_type="q8_0")
    eng.prefill([3, 5, 7])
    eng.decode_one(np.array([9]))
    assert calls, "q8 decode did not route through flash_decode_q8"


def test_flash_decode_q8_tiled_matches_untiled():
    """The S-tiled decode variant (VMEM-bounded, scratch-carried online
    softmax) must match the whole-S kernel exactly."""
    import jax.numpy as jnp

    from llamacog_tpu.ops.pallas.flash_q8 import DTS, flash_decode_q8_tiled

    B, H, Hkv, Dk, Dv = 2, 8, 2, 32, 32
    S = 2 * DTS
    rng = np.random.default_rng(7)
    n_valid = np.array([DTS + 37, 170], np.int32)
    kq, ks, vq, vs, k_ref, v_ref = _rand_cache_and_qkv(B, S, H, Hkv, Dk, Dv,
                                                       n_valid, seed=9)
    q = rng.standard_normal((B, H, Dk)).astype(np.float32)
    k_cur = rng.standard_normal((B, Hkv, Dk)).astype(np.float32)
    v_cur = rng.standard_normal((B, Hkv, Dv)).astype(np.float32)
    scale = Dk ** -0.5
    ref = np.asarray(flash_q8.flash_decode_q8(
        jnp.asarray(q), kq, ks, vq, vs, jnp.asarray(k_cur), jnp.asarray(v_cur),
        jnp.asarray(n_valid), scale, interpret=True))
    got = np.asarray(flash_decode_q8_tiled(
        jnp.asarray(q), kq, ks, vq, vs, jnp.asarray(k_cur), jnp.asarray(v_cur),
        jnp.asarray(n_valid), scale, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
