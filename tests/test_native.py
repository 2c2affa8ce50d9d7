"""Native (C++) codec parity: liblcg_codecs decode must match the numpy
reference decoders bit-for-bit (which are themselves oracle-verified)."""

import numpy as np
import pytest

from llamacog_tpu import native
from llamacog_tpu.gguf import GGMLType, row_nbytes
from llamacog_tpu.quant import dequantize, quantize

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native codec library unavailable (no g++?)"
)

N = 256 * 16


@pytest.mark.parametrize(
    "ttype",
    sorted(native.NATIVE_DECODE_TYPES - {GGMLType.F16, GGMLType.BF16},
           key=lambda t: t.value),
    ids=lambda t: t.name,
)
def test_native_decode_matches_numpy(ttype):
    rng = np.random.default_rng(int(ttype))
    x = rng.standard_normal(N).astype(np.float32)
    try:
        q = quantize(x, ttype)
    except NotImplementedError:
        pytest.skip("no encoder")
    ref = dequantize(q, ttype, N)
    got = native.dequantize(q, ttype, N)
    assert got is not None
    np.testing.assert_array_equal(got, ref, err_msg=ttype.name)


@pytest.mark.parametrize("ttype", [GGMLType.F16, GGMLType.BF16], ids=lambda t: t.name)
def test_native_decode_floats(ttype):
    rng = np.random.default_rng(int(ttype))
    x = rng.standard_normal(N).astype(np.float32)
    q = quantize(x, ttype)
    ref = dequantize(q, ttype, N)
    got = native.dequantize(q, ttype, N)
    assert got is not None
    np.testing.assert_array_equal(got, ref)


def test_native_q8_0_encode_matches_numpy():
    rng = np.random.default_rng(9)
    x = rng.standard_normal(N).astype(np.float32)
    ref = quantize(x, GGMLType.Q8_0)
    got = native.quantize_q8_0(x)
    assert got is not None
    np.testing.assert_array_equal(got, ref)


def test_native_multithreaded_consistent():
    rng = np.random.default_rng(11)
    x = rng.standard_normal(256 * 256).astype(np.float32)
    q = quantize(x, GGMLType.Q4_K)
    a = native.dequantize(q, GGMLType.Q4_K, x.size, nthreads=1)
    b = native.dequantize(q, GGMLType.Q4_K, x.size, nthreads=8)
    np.testing.assert_array_equal(a, b)


def test_native_rejects_bad_input():
    assert native.dequantize(np.zeros(10, np.uint8), GGMLType.Q4_0, 33) is None
