"""Flash prefill kernel vs the masked-attention reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from llamacog_tpu.ops.attention import masked_attention
from llamacog_tpu.ops.pallas.flash_prefill import TS, flash_prefill_attention
from llamacog_tpu.runtime.kv_cache import build_causal_mask


@pytest.mark.parametrize("window", [0, 16])
@pytest.mark.parametrize("softcap", [0.0, 25.0])
@pytest.mark.parametrize("wp", [0, 100])
def test_flash_prefill_matches_masked(window, softcap, wp):
    B, S, T, H, Hkv, Dk, Dv = 2, 2 * TS, 16, 8, 4, 16, 16
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, T, H, Dk)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, Dk)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, Dv)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((B, T, Hkv, Dk)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, T, Hkv, Dv)), jnp.float32)
    seq_len = jnp.asarray([wp, max(wp - 20, 0)], jnp.int32)
    scale = Dk**-0.5

    mask = build_causal_mask(seq_len, T, S, seq_len=seq_len, sliding_window=window)
    ti = np.arange(T)
    ok = (ti[None, :] <= ti[:, None])
    if window > 0:
        ok &= ti[None, :] > ti[:, None] - window
    intra = jnp.asarray(np.where(ok, 0.0, -np.inf), jnp.float32)
    ref = masked_attention(q, k, v, mask, scale, logit_softcap=softcap,
                           k_cur=kc, v_cur=vc, intra_mask=intra)
    got = flash_prefill_attention(q, k, v, kc, vc, seq_len, scale,
                                  softcap=softcap, window=window, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5,
                               rtol=1e-4)
