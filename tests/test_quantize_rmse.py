"""Round-trip RMSE gates per quant format — the reference's
tests/test-quantize-fns.cpp thresholds (:17-22) on its synthetic data
(0.1 + 2*cos(i), :31). These are the BASELINE.md unit-level correctness
gates; formats whose reference encoder requires an imatrix get one built
from the same data."""

import numpy as np
import pytest

from llamacog_tpu.gguf import GGMLType
from llamacog_tpu.quant import dequantize_tensor, quantize_tensor

MAX_TOTAL = 0.002
MAX_2BIT = 0.0075
MAX_3BIT = 0.0040
MAX_3BIT_XXS = 0.0050

# format -> threshold (test-quantize-fns.cpp main(), per-type switch)
GATES = {
    GGMLType.Q4_0: MAX_TOTAL, GGMLType.Q4_1: MAX_TOTAL,
    GGMLType.Q5_0: MAX_TOTAL, GGMLType.Q5_1: MAX_TOTAL,
    GGMLType.Q8_0: MAX_TOTAL,
    GGMLType.Q2_K: MAX_2BIT, GGMLType.Q3_K: MAX_3BIT,
    GGMLType.Q4_K: MAX_TOTAL, GGMLType.Q5_K: MAX_TOTAL,
    GGMLType.Q6_K: MAX_TOTAL,
    GGMLType.IQ4_NL: MAX_TOTAL, GGMLType.IQ4_XS: MAX_TOTAL,
    GGMLType.IQ3_XXS: MAX_3BIT_XXS, GGMLType.IQ3_S: MAX_3BIT,
    GGMLType.IQ2_S: MAX_2BIT,
}
# iq2_xxs/xs and iq1 are codebook-lossy by design; the reference skips them
# in this test (test-quantize-fns.cpp:137-147 qfns.from_float == NULL there
# without init). We still gate them loosely to catch regressions.
LOOSE_GATES = {
    GGMLType.IQ2_XXS: 0.008, GGMLType.IQ2_XS: 0.008,
    GGMLType.IQ1_S: 0.5, GGMLType.IQ1_M: 0.5,
}

N = 32 * 128  # test-quantize-fns.cpp:103


def _data(offset=0.0):
    i = np.arange(N, dtype=np.float32)
    return (0.1 + 2.0 * np.cos(i + offset)).astype(np.float32)


def _rmse(x, y):
    # reference array_rmse (:38-46): sqrt(sum(diff^2)) / n  (NOT /sqrt(n))
    return float(np.sqrt(np.sum((x - y) ** 2, dtype=np.float64)) / x.size)


@pytest.mark.parametrize("t,gate", sorted(GATES.items(), key=lambda kv: kv[0]),
                         ids=[t.name for t, _ in sorted(GATES.items(), key=lambda kv: kv[0])])
def test_roundtrip_rmse(t, gate):
    x = _data()
    qw = np.abs(_data(1.0)) + 0.1
    raw = quantize_tensor(x.reshape(1, -1), t, quant_weights=qw)
    y = dequantize_tensor(raw, t, (1, N)).reshape(-1)
    err = _rmse(x, y)
    assert err < gate, f"{t.name}: rmse {err} >= {gate}"


@pytest.mark.parametrize("t,gate", sorted(LOOSE_GATES.items(), key=lambda kv: kv[0]),
                         ids=[t.name for t, _ in sorted(LOOSE_GATES.items(), key=lambda kv: kv[0])])
def test_roundtrip_rmse_codebook(t, gate):
    x = _data()
    qw = np.abs(_data(1.0)) + 0.1
    raw = quantize_tensor(x.reshape(1, -1), t, quant_weights=qw)
    y = dequantize_tensor(raw, t, (1, N)).reshape(-1)
    err = _rmse(x, y)
    assert err < gate, f"{t.name}: rmse {err} >= {gate}"


def test_tq_encoders_bit_exact_vs_oracle():
    """TQ1_0/TQ2_0 encoders match quantize_row_tq*_ref byte-for-byte."""
    from .oracle import get_oracle

    o = get_oracle()
    if o is None:
        pytest.skip("oracle unavailable")
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(256 * 8) * 0.5).astype(np.float32)
    for name, t, bb in (("tq1_0", GGMLType.TQ1_0, 54), ("tq2_0", GGMLType.TQ2_0, 66)):
        mine = quantize_tensor(x, t)
        ref = o.quantize_row(name, x, 8 * bb)
        np.testing.assert_array_equal(np.asarray(mine), ref, err_msg=name)


def test_tq_roundtrip_ternary_gate():
    """MAX_QUANTIZATION_TOTAL_ERROR_TERNARY = 0.01 (test-quantize-fns.cpp:19)."""
    x = _data()
    for t in (GGMLType.TQ1_0, GGMLType.TQ2_0):
        raw = quantize_tensor(x.reshape(1, -1), t)
        y = dequantize_tensor(raw, t, (1, N)).reshape(-1)
        err = _rmse(x, y)
        assert err < 0.01, f"{t.name}: {err}"
