"""Quant codec tests.

Mirrors reference tests/test-quantize-fns.cpp: synthetic-data round-trip RMSE
gates, plus bit-exact decode parity and near-exact encode parity against the
compiled reference oracle (tests/oracle).
"""

import numpy as np
import pytest

from llamacog_tpu.gguf import GGML_TYPE_TRAITS, GGMLType, row_nbytes
from llamacog_tpu.quant import dequantize, quantize

from .oracle import get_oracle

TEST_SIZE = 32 * 128  # reference test-quantize-fns.cpp:102


def generate_data(offset: float, n: int) -> np.ndarray:
    # identical to reference tests/test-quantize-fns.cpp:31-35
    return (0.1 + 2 * np.cos(np.arange(n) + offset)).astype(np.float32)


def array_rmse(a, b):
    # reference metric: sqrt(sum((a-b)^2)) / n     (test-quantize-fns.cpp:38-45)
    return np.sqrt(np.sum((a.astype(np.float64) - b.astype(np.float64)) ** 2)) / a.size


# thresholds from reference tests/test-quantize-fns.cpp:17-22
MAX_TOTAL_ERROR = {
    GGMLType.Q4_0: 0.002,
    GGMLType.Q4_1: 0.002,
    GGMLType.Q5_0: 0.002,
    GGMLType.Q5_1: 0.002,
    GGMLType.Q8_0: 0.002,
    GGMLType.Q2_K: 0.0075,
    GGMLType.Q3_K: 0.0040,
    GGMLType.Q4_K: 0.002,
    GGMLType.Q5_K: 0.002,
    GGMLType.Q6_K: 0.002,
    GGMLType.Q8_K: 0.002,
    GGMLType.IQ4_NL: 0.002,
}

ROUNDTRIP_TYPES = sorted(MAX_TOTAL_ERROR, key=lambda t: t.value)

ORACLE_NAMES = {
    GGMLType.Q4_0: "q4_0",
    GGMLType.Q4_1: "q4_1",
    GGMLType.Q5_0: "q5_0",
    GGMLType.Q5_1: "q5_1",
    GGMLType.Q8_0: "q8_0",
    GGMLType.Q2_K: "q2_K",
    GGMLType.Q3_K: "q3_K",
    GGMLType.Q4_K: "q4_K",
    GGMLType.Q5_K: "q5_K",
    GGMLType.Q6_K: "q6_K",
    GGMLType.Q8_K: "q8_K",
    GGMLType.IQ4_NL: "iq4_nl",
    GGMLType.IQ4_XS: "iq4_xs",
    GGMLType.TQ1_0: "tq1_0",
    GGMLType.TQ2_0: "tq2_0",
}


@pytest.mark.parametrize("ttype", ROUNDTRIP_TYPES, ids=lambda t: t.name)
def test_roundtrip_error(ttype):
    x = generate_data(0.0, TEST_SIZE)
    q = quantize(x, ttype)
    assert q.size == row_nbytes(ttype, TEST_SIZE)
    y = dequantize(q, ttype, TEST_SIZE)
    err = array_rmse(x, y)
    assert err < MAX_TOTAL_ERROR[ttype], f"{ttype.name}: rmse {err}"


@pytest.mark.parametrize("ttype", ROUNDTRIP_TYPES, ids=lambda t: t.name)
def test_decode_matches_oracle_bitexact(ttype):
    """Our decoder on oracle-encoded blocks must match the oracle decoder exactly."""
    oracle = get_oracle()
    if oracle is None:
        pytest.skip("reference oracle unavailable")
    name = ORACLE_NAMES[ttype]
    x = generate_data(1.0, TEST_SIZE)
    nbytes = row_nbytes(ttype, TEST_SIZE)
    q_ref = oracle.quantize_row(name, x, nbytes)
    y_ref = oracle.dequantize_row(name, q_ref, TEST_SIZE)
    y_ours = dequantize(q_ref, ttype, TEST_SIZE)
    np.testing.assert_array_equal(y_ours, y_ref, err_msg=f"{ttype.name} decode mismatch")


@pytest.mark.parametrize(
    "ttype", [GGMLType.IQ4_XS, GGMLType.TQ1_0, GGMLType.TQ2_0], ids=lambda t: t.name
)
def test_decode_matches_oracle_extra_types(ttype):
    """Decode-only types: encode with the oracle, compare decoders."""
    oracle = get_oracle()
    if oracle is None:
        pytest.skip("reference oracle unavailable")
    name = ORACLE_NAMES[ttype]
    x = generate_data(0.3, TEST_SIZE)
    nbytes = row_nbytes(ttype, TEST_SIZE)
    if ttype in (GGMLType.TQ1_0, GGMLType.TQ2_0):
        # ternary input so the encoder is exact
        x = np.sign(x).astype(np.float32)
        q_ref = oracle.quantize_row(name, x, nbytes)
    else:
        q_ref = oracle.quantize(name, x, nbytes)
    y_ref = oracle.dequantize_row(name, q_ref, TEST_SIZE)
    y_ours = dequantize(q_ref, ttype, TEST_SIZE)
    np.testing.assert_array_equal(y_ours, y_ref, err_msg=f"{ttype.name} decode mismatch")


@pytest.mark.parametrize("ttype", ROUNDTRIP_TYPES, ids=lambda t: t.name)
def test_encode_matches_oracle(ttype):
    """Our encoder must match the reference encoder within the reference's own
    divergence gate (MAX_QUANTIZATION_REFERENCE_ERROR=0.0001,
    test-quantize-fns.cpp:17)."""
    oracle = get_oracle()
    if oracle is None:
        pytest.skip("reference oracle unavailable")
    name = ORACLE_NAMES[ttype]
    x = generate_data(2.0, TEST_SIZE)
    nbytes = row_nbytes(ttype, TEST_SIZE)
    if ttype == GGMLType.IQ4_NL:
        # our encoder follows the quantize-tool path (quantize_iq4_nl, ntry=7),
        # not quantize_row_iq4_nl_ref (ntry=-1)
        q_ref = oracle.quantize(name, x, nbytes)
    else:
        q_ref = oracle.quantize_row(name, x, nbytes)
    q_ours = quantize(x, ttype)
    y_ref = oracle.dequantize_row(name, q_ref, TEST_SIZE)
    y_ours = dequantize(q_ours, ttype, TEST_SIZE)
    err = array_rmse(y_ours, y_ref)
    assert err < 0.0001, f"{ttype.name}: encoder divergence {err}"


def test_encode_iq4_xs_matches_oracle():
    oracle = get_oracle()
    if oracle is None:
        pytest.skip("reference oracle unavailable")
    x = generate_data(2.0, TEST_SIZE)
    nbytes = row_nbytes(GGMLType.IQ4_XS, TEST_SIZE)
    q_ref = oracle.quantize("iq4_xs", x, nbytes)
    q_ours = quantize(x, GGMLType.IQ4_XS)
    y_ref = oracle.dequantize_row("iq4_xs", q_ref, TEST_SIZE)
    y_ours = dequantize(q_ours, GGMLType.IQ4_XS, TEST_SIZE)
    err = array_rmse(y_ours, y_ref)
    assert err < 0.0001, f"IQ4_XS: encoder divergence {err}"


@pytest.mark.parametrize(
    "ttype",
    [GGMLType.Q4_0, GGMLType.Q8_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1],
    ids=lambda t: t.name,
)
def test_encode_bitexact_simple_types(ttype):
    """The non-search formats should encode bit-exactly vs the reference."""
    oracle = get_oracle()
    if oracle is None:
        pytest.skip("reference oracle unavailable")
    name = ORACLE_NAMES[ttype]
    rng = np.random.default_rng(7)
    x = rng.standard_normal(TEST_SIZE).astype(np.float32)
    q_ref = oracle.quantize_row(name, x, row_nbytes(ttype, TEST_SIZE))
    q_ours = quantize(x, ttype)
    np.testing.assert_array_equal(q_ours, q_ref)


def test_f16_bf16_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(512).astype(np.float32)
    for t in (GGMLType.F16, GGMLType.BF16, GGMLType.F32):
        q = quantize(x, t)
        y = dequantize(q, t, 512)
        if t == GGMLType.F32:
            np.testing.assert_array_equal(x, y)
        else:
            assert array_rmse(x, y) < 0.001


def test_all_zero_blocks():
    x = np.zeros(256, dtype=np.float32)
    for t in ROUNDTRIP_TYPES:
        q = quantize(x, t)
        y = dequantize(q, t, 256)
        assert np.all(np.isfinite(y)), t.name
        np.testing.assert_allclose(y, 0.0, atol=1e-6, err_msg=t.name)


# ---------------------------------------------------------------------------
# i-quant decode parity: any byte pattern is a decodable block (grid indices
# are masked to table size), so random-byte decode parity is the strongest
# check — bit-exact against dequantize_row_iq* in the compiled reference.
# ---------------------------------------------------------------------------

IQUANT_TYPES = {
    GGMLType.IQ2_XXS: "iq2_xxs",
    GGMLType.IQ2_XS: "iq2_xs",
    GGMLType.IQ2_S: "iq2_s",
    GGMLType.IQ3_XXS: "iq3_xxs",
    GGMLType.IQ3_S: "iq3_s",
    GGMLType.IQ1_S: "iq1_s",
    GGMLType.IQ1_M: "iq1_m",
}


@pytest.mark.parametrize("ttype", sorted(IQUANT_TYPES, key=lambda t: t.value), ids=lambda t: t.name)
def test_iquant_decode_random_bytes_bitexact(ttype):
    oracle = get_oracle()
    if oracle is None:
        pytest.skip("reference oracle unavailable")
    rng = np.random.default_rng(ttype.value)
    nbytes = row_nbytes(ttype, TEST_SIZE)
    raw = rng.integers(0, 256, size=nbytes, dtype=np.uint8)
    # keep f16 scale fields finite: clear the exponent's top bit of d
    # (first two bytes for all iq types except IQ1_M whose scale nibbles are
    # packed in the trailing scale bytes)
    if ttype != GGMLType.IQ1_M:
        from llamacog_tpu.gguf import GGML_TYPE_TRAITS

        ts = GGML_TYPE_TRAITS[ttype].type_size
        raw.reshape(-1, ts)[:, 1] &= 0x7B
    y_ref = oracle.dequantize_row(IQUANT_TYPES[ttype], raw, TEST_SIZE)
    y_ours = dequantize(raw, ttype, TEST_SIZE)
    np.testing.assert_array_equal(y_ours, y_ref, err_msg=f"{ttype.name} decode mismatch")


@pytest.mark.parametrize(
    "ttype",
    [GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S, GGMLType.IQ3_XXS, GGMLType.IQ3_S],
    ids=lambda t: t.name,
)
def test_iquant_decode_encoded_blocks_bitexact(ttype):
    """Decode parity on real encoder output (needs imatrix for iq2/iq1)."""
    oracle = get_oracle()
    if oracle is None:
        pytest.skip("reference oracle unavailable")
    name = IQUANT_TYPES[ttype]
    x = generate_data(0.5, TEST_SIZE)
    imatrix = np.abs(generate_data(1.5, TEST_SIZE)) + 0.1
    nbytes = row_nbytes(ttype, TEST_SIZE)
    try:
        q_ref = oracle.quantize_imatrix(name, x, nbytes, imatrix)
    except Exception:
        pytest.skip("oracle imatrix quantize unavailable")
    y_ref = oracle.dequantize_row(name, q_ref, TEST_SIZE)
    y_ours = dequantize(q_ref, ttype, TEST_SIZE)
    np.testing.assert_array_equal(y_ours, y_ref, err_msg=f"{ttype.name} decode mismatch")
