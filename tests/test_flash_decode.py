"""Fused decode-attention kernel vs the reference masked-attention path."""

import numpy as np
import pytest

import jax.numpy as jnp

from llamacog_tpu.ops.attention import masked_attention
from llamacog_tpu.ops.pallas.flash_decode import flash_decode_attention
from llamacog_tpu.runtime.kv_cache import build_causal_mask


@pytest.mark.parametrize("window", [0, 8])
@pytest.mark.parametrize("softcap", [0.0, 30.0])
def test_flash_decode_matches_masked(window, softcap):
    B, S, H, Hkv, Dk, Dv = 2, 64, 8, 4, 16, 16
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, 1, H, Dk)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, Dk)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, Dv)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((B, 1, Hkv, Dk)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, 1, Hkv, Dv)), jnp.float32)
    seq_len = jnp.asarray([13, 40], jnp.int32)
    scale = Dk**-0.5

    mask = build_causal_mask(seq_len, 1, S, seq_len=seq_len,
                             sliding_window=window)
    intra = jnp.zeros((1, 1), jnp.float32)
    ref = masked_attention(q, k, v, mask, scale, logit_softcap=softcap,
                           k_cur=kc, v_cur=vc, intra_mask=intra)
    got = flash_decode_attention(
        q[:, 0], k, v, kc[:, 0], vc[:, 0], seq_len, scale, softcap=softcap,
        window=window, interpret=True,
    )[:, None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def test_flash_decode_engine_path(tmp_path, monkeypatch):
    """Engine decode with the fused kernel enabled matches the XLA path."""
    from llamacog_tpu.models.loader import load_model
    from llamacog_tpu.runtime.engine import Engine
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    path = make_tiny_llama_gguf(str(tmp_path / "t.gguf"))
    m = load_model(path, with_tokenizer=False, dtype=jnp.float32)
    e1 = Engine(m.params, m.config, max_seq=64, dtype=jnp.float32)
    e1.prefill([1, 2, 3])
    ref = e1.decode_one(np.array([5]))
    monkeypatch.setenv("LLAMACOG_FLASH_DECODE", "1")
    e2 = Engine(m.params, m.config, max_seq=64, dtype=jnp.float32)
    e2.prefill([1, 2, 3])
    got = e2.decode_one(np.array([5]))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
