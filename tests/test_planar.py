"""Planar relayout + jnp decode must match the numpy reference decoder exactly."""

import numpy as np
import pytest

from llamacog_tpu.gguf import GGMLType, row_nbytes
from llamacog_tpu.quant import dequantize, quantize
from llamacog_tpu.quant.planar import decode, from_gguf

TYPES = [
    GGMLType.F32,
    GGMLType.F16,
    GGMLType.BF16,
    GGMLType.Q4_0,
    GGMLType.Q4_1,
    GGMLType.Q5_0,
    GGMLType.Q5_1,
    GGMLType.Q8_0,
    GGMLType.Q2_K,
    GGMLType.Q3_K,
    GGMLType.Q4_K,
    GGMLType.Q5_K,
    GGMLType.Q6_K,
    GGMLType.IQ4_NL,
    GGMLType.IQ4_XS,
    GGMLType.TQ1_0,
    GGMLType.TQ2_0,
]


@pytest.mark.parametrize("ttype", TYPES, ids=lambda t: t.name)
def test_planar_decode_matches_numpy(ttype):
    N, K = 4, 512
    rng = np.random.default_rng(int(ttype))
    x = rng.standard_normal(N * K).astype(np.float32)
    try:
        q = quantize(x, ttype)
    except NotImplementedError:
        pytest.skip("no encoder")
    ref = dequantize(q, ttype, N * K).reshape(N, K)
    qt = from_gguf(q, ttype, (N, K))
    got = np.asarray(decode(qt, dtype=np.float32))
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)


def test_planar_bytes_smaller_than_dense():
    N, K = 8, 1024
    x = np.random.default_rng(0).standard_normal(N * K).astype(np.float32)
    qt = from_gguf(quantize(x, GGMLType.Q4_K), GGMLType.Q4_K, (N, K))
    # Q4_K planar = 4 bits payload + 2x f32 per 32 group = 6 bpw < bf16
    assert qt.nbytes < N * K * 2


IQUANT_TYPES = [
    GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
    GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S, GGMLType.IQ1_M,
]


def random_iq_blocks(ttype, n, seed=0):
    """Random bytes are valid i-quant blocks (grid indices are masked);
    clamp the f16 super-scale exponent so values stay finite."""
    from llamacog_tpu.gguf import GGML_TYPE_TRAITS

    rng = np.random.default_rng(seed)
    raw = rng.integers(0, 256, size=row_nbytes(ttype, n), dtype=np.uint8)
    if ttype != GGMLType.IQ1_M:
        raw.reshape(-1, GGML_TYPE_TRAITS[ttype].type_size)[:, 1] &= 0x3B
    else:
        # the f16 super-scale's high nibble lives in byte 55 (scales[7] high)
        raw.reshape(-1, GGML_TYPE_TRAITS[ttype].type_size)[:, 55] &= 0x3B
    return raw


@pytest.mark.parametrize("ttype", IQUANT_TYPES, ids=lambda t: t.name)
def test_planar_iquant_decode_matches_numpy(ttype):
    N, K = 4, 512
    q = random_iq_blocks(ttype, N * K, seed=int(ttype))
    ref = dequantize(q, ttype, N * K).reshape(N, K)
    qt = from_gguf(q, ttype, (N, K))
    got = np.asarray(decode(qt, dtype=np.float32))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)
