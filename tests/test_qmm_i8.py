"""int8-MXU prefill (mmq analog) — kernel parity, dispatch, engine logits.

Reference role: ggml-cuda/mmq.cu (int8 prefill GEMMs over quantized
activations). Design + accuracy contract: llamacog_tpu/quant/mmq.py.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llamacog_tpu.ops.pallas.qmm import qmm
from llamacog_tpu.ops.pallas.qmm_i8 import qmm_i8
from llamacog_tpu.quant.mmq import MMQ_MIN_B, attach_mmq_planes, build_mmq_planes
from llamacog_tpu.quant.planar import decode
from llamacog_tpu.utils.synthetic import _rand_qt


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


@pytest.mark.parametrize("kind", ["Q4_K", "Q6_K", "Q8_0", "Q4_0"])
def test_i8_kernel_parity(kind):
    key = jax.random.PRNGKey(3)
    N, K, B = 512, 1024, 256
    qt = _rand_qt(key, kind, N, K)
    extra = build_mmq_planes(qt)
    assert extra is not None and extra["qi8"].shape == (N, K)
    qt.planes.update(extra)
    x = jax.random.normal(jax.random.PRNGKey(4), (B, K), jnp.float32)
    ref = np.asarray(x @ decode(qt, dtype=jnp.float32).T)
    got = np.asarray(qmm_i8(x, qt, interpret=True))
    # error budget: per-block int8 weight requant (~1% rms on top of the
    # 4-8 bit base quant) + per-token int8 activations
    assert _cos(got, ref) > 0.999
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-30)
    assert rel < 0.02, rel


def test_i8_ragged_batch_pads():
    key = jax.random.PRNGKey(5)
    qt = _rand_qt(key, "Q4_K", 256, 1024)
    qt.planes.update(build_mmq_planes(qt))
    x = jax.random.normal(jax.random.PRNGKey(6), (300, 1024), jnp.float32)
    ref = np.asarray(x @ decode(qt, dtype=jnp.float32).T)
    got = np.asarray(qmm_i8(x, qt, interpret=True))
    assert got.shape == (300, 256)
    assert _cos(got, ref) > 0.999


def test_qmm_dispatches_by_batch():
    """qmm routes B >= MMQ_MIN_B through the int8 path when planes exist,
    and keeps the exact classic kernel for decode-sized batches."""
    key = jax.random.PRNGKey(7)
    qt = _rand_qt(key, "Q4_K", 512, 1024)
    x1 = jax.random.normal(jax.random.PRNGKey(8), (2, 1024), jnp.float32)
    xb = jax.random.normal(jax.random.PRNGKey(9), (MMQ_MIN_B, 1024),
                           jnp.float32)
    exact_small = np.asarray(qmm(x1, qt, interpret=True))
    exact_big = np.asarray(qmm(xb, qt, interpret=True))
    qt.planes.update(build_mmq_planes(qt))
    # decode batch: still the exact kernel, bitwise
    np.testing.assert_array_equal(np.asarray(qmm(x1, qt, interpret=True)),
                                  exact_small)
    # prefill batch: int8 path (close, not bitwise)
    got = np.asarray(qmm(xb, qt, interpret=True))
    assert not np.array_equal(got, exact_big)
    assert _cos(got, exact_big) > 0.999


def test_attach_walk_filters():
    key = jax.random.PRNGKey(10)
    good = _rand_qt(key, "Q4_K", 512, 1024)
    vocab = _rand_qt(key, "Q4_K", 32768 + 256, 512)  # vocab-sized: skip
    moe = _rand_qt(key, "Q4_K", 4 * 256, 512)
    moe.shape = (4, 256, 512)  # 3-D expert stack: skip
    params = {"layers": [{"w": good, "head": vocab, "experts": moe}]}
    attach_mmq_planes(params)
    assert "qi8" in good.planes
    assert "qi8" not in vocab.planes
    assert "qi8" not in moe.planes


def test_engine_prefill_logits_close(monkeypatch):
    """LLAMACOG_MMQ=1 engine prefill logits track the exact engine (the
    decode path is untouched by design)."""
    from llamacog_tpu.models.config import ModelConfig, RopeConfig
    from llamacog_tpu.ops import linear
    from llamacog_tpu.runtime.engine import Engine
    from llamacog_tpu.utils.synthetic import make_synthetic_params

    cfg = ModelConfig(
        arch="llama", n_vocab=512, n_ctx_train=128, n_embd=512,
        n_layer=2, n_head=8, n_head_kv=4, n_ff=1024,
        head_dim_k=64, head_dim_v=64, rope=RopeConfig(dim=64),
    )
    monkeypatch.setattr(linear, "_BACKEND", "pallas")
    monkeypatch.setattr(
        "llamacog_tpu.quant.mmq.MMQ_MIN_B", 8, raising=True)
    params = make_synthetic_params(cfg)
    eng = Engine(params, cfg, batch_size=1, max_seq=64)
    toks = list(range(2, 34))
    ref = np.asarray(eng.prefill(toks), np.float32)

    monkeypatch.setenv("LLAMACOG_MMQ", "1")
    params2 = make_synthetic_params(cfg)
    eng2 = Engine(params2, cfg, batch_size=1, max_seq=64)
    got = np.asarray(eng2.prefill(toks), np.float32)
    assert got.shape == ref.shape
    assert _cos(got, ref) > 0.995
