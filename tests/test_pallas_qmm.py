"""Pallas fused dequant-matmul kernels vs the jnp reference decode
(role of reference tests/test-backend-ops.cpp: per-op NMSE gates
cross-checked against the reference backend)."""

import numpy as np
import pytest

import jax.numpy as jnp

from llamacog_tpu.gguf import GGMLType
from llamacog_tpu.ops.pallas.qmm import TILE_DECODERS, qmm
from llamacog_tpu.quant import quantize
from llamacog_tpu.quant.planar import decode, from_gguf

# encoder-backed kinds; i-quants (decode-only) are tested from random blocks below
KINDS = sorted(k for k in TILE_DECODERS if not k.startswith(("IQ1", "IQ2", "IQ3")))


def nmse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return ((a - b) ** 2).sum() / max((b**2).sum(), 1e-20)


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("batch", [1, 8])
def test_qmm_matches_reference(kind, batch, monkeypatch):
    # runtime-only kinds alias a wire format; from_gguf picks the layout
    # from env flags (2-D Q4_K -> Q4_KC and Q6_K -> Q6_KP by default,
    # Q4_KS4 opt-in; see quant/planar.from_gguf)
    if kind == "Q4_KS4":
        monkeypatch.setenv("LLAMACOG_Q4_S4", "1")
    if kind == "Q4_KC":
        monkeypatch.setenv("LLAMACOG_Q4K_CSC", "1")
    if kind == "Q6_KP":
        monkeypatch.setenv("LLAMACOG_Q6K_PACK", "1")
    ttype = getattr(GGMLType, {"Q4_KS4": "Q4_K", "Q4_KC": "Q4_K",
                               "Q6_KP": "Q6_K"}.get(kind, kind))
    N, K = 256, 512
    rng = np.random.default_rng(hash(kind) % 2**31)
    w = rng.standard_normal((N, K)).astype(np.float32)
    x = rng.standard_normal((batch, K)).astype(np.float32)
    qt = from_gguf(quantize(w.reshape(-1), ttype), ttype, (N, K))
    qt.planes = {k: jnp.asarray(v) for k, v in qt.planes.items()}

    # kernel contract: raw codes x scales hit the MXU in bf16, per-group
    # offsets land as an exact f32 correction dot -> bf16-rounding-level
    # noise vs the exact f32 product (see qmm.py header)
    w_f32 = np.asarray(decode(qt, jnp.float32))
    ref = x @ w_f32.T
    got = np.asarray(qmm(jnp.asarray(x), qt, interpret=True))
    assert got.shape == (batch, N)
    err = nmse(got, ref)
    assert err < 2e-4, f"{kind}: nmse {err}"


IQUANT_KINDS = ["IQ2_XXS", "IQ2_XS", "IQ2_S", "IQ3_XXS", "IQ3_S", "IQ1_S", "IQ1_M"]


@pytest.mark.parametrize("kind", IQUANT_KINDS)
def test_qmm_iquant_matches_reference(kind):
    from .test_planar import random_iq_blocks

    ttype = getattr(GGMLType, kind)
    N, K = 256, 512
    rng = np.random.default_rng(hash(kind) % 2**31)
    x = rng.standard_normal((4, K)).astype(np.float32)
    q = random_iq_blocks(ttype, N * K, seed=int(ttype))
    qt = from_gguf(q, ttype, (N, K))
    qt.planes = {k: jnp.asarray(v) for k, v in qt.planes.items()}
    w_f32 = np.asarray(decode(qt, jnp.float32))
    ref = x @ w_f32.T
    got = np.asarray(qmm(jnp.asarray(x), qt, interpret=True))
    err = nmse(got, ref)
    assert err < 2e-4, f"{kind}: nmse {err}"


def test_qmm_row_tiled_large_batch():
    """Prefill-sized activations ([B,K] too big for one VMEM block) route
    through the row-tiled grid and must match the reference decode."""
    ttype = GGMLType.Q4_0
    N, K, B = 256, 4096, 2048
    rng = np.random.default_rng(42)
    w = rng.standard_normal((N, K)).astype(np.float32)
    x = (rng.standard_normal((B, K)) * 0.1).astype(np.float32)
    qt = from_gguf(quantize(w.reshape(-1), ttype), ttype, (N, K))
    qt.planes = {k: jnp.asarray(v) for k, v in qt.planes.items()}
    ref = x @ np.asarray(decode(qt, jnp.float32)).T
    got = np.asarray(qmm(jnp.asarray(x), qt, interpret=True))
    assert nmse(got, ref) < 2e-4


def test_qmm_multi_matches_qmm():
    """Fused multi-weight call (mixed kinds, one launch) vs per-weight qmm."""
    import jax

    from llamacog_tpu.ops.pallas.qmm import qmm, qmm_multi
    from llamacog_tpu.utils.synthetic import _rand_qt

    key = jax.random.PRNGKey(3)
    K = 256
    qts = [
        _rand_qt(jax.random.fold_in(key, 0), "Q4_K", 512, K),
        _rand_qt(jax.random.fold_in(key, 1), "Q6_K", 128, K),
        _rand_qt(jax.random.fold_in(key, 2), "Q8_0", 256, K),
    ]
    for B in (1, 4):
        x = jax.random.normal(jax.random.fold_in(key, 9 + B), (B, K),
                              jnp.bfloat16)
        outs = qmm_multi(x, qts, interpret=True)
        for qt, got in zip(qts, outs):
            want = qmm(x, qt, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-5)


def test_qmm_multi_falls_back_at_long_prefill_batch():
    """The fused multi-weight launch keeps full [B, K] activation blocks
    resident; at long-prefill chunk sizes that blows VMEM (measured on
    chip: B=4096, K=4096 -> 2x32MB single-buffered x windows). The caller
    contract is to return None so qmatmul row-tiles per weight."""
    import jax.numpy as jnp

    from llamacog_tpu.ops import linear
    from llamacog_tpu.utils.synthetic import _rand_qt
    import jax

    w = _rand_qt(jax.random.PRNGKey(0), "Q4_K", 256, 4096)
    old = linear._BACKEND
    linear.set_backend("pallas")
    try:
        x_small = jnp.ones((8, 4096), jnp.bfloat16)
        x_big = jnp.ones((4096, 4096), jnp.bfloat16)
        assert linear.qmatmul_multi(x_big, [w, w]) is None
        # small B still rides the fused kernel (interpret on CPU)
        outs = linear.qmatmul_multi(x_small, [w, w])
        assert outs is not None and outs[0].shape == (8, 256)
    finally:
        linear.set_backend(old)
