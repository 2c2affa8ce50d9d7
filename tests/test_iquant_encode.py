"""I-quant encoder tests: round-trip through our decoder, byte-level and
quality parity against the compiled reference oracle (ggml-quants.c
quantize_iq2_xxs/... with and without an importance matrix)."""

import numpy as np
import pytest

from llamacog_tpu.gguf import GGMLType
from llamacog_tpu.quant import decode_np as D
from llamacog_tpu.quant import encode_iq as E
from llamacog_tpu.quant import quantize_tensor, dequantize_tensor

from .oracle import get_oracle

CASES = [
    # (name, encode fn, decode fn, block bytes, ggml type)
    ("iq2_xxs", E.quant_iq2_xxs, D.dequant_iq2_xxs, 66, GGMLType.IQ2_XXS),
    ("iq2_xs", E.quant_iq2_xs, D.dequant_iq2_xs, 74, GGMLType.IQ2_XS),
    ("iq2_s", E.quant_iq2_s, D.dequant_iq2_s, 82, GGMLType.IQ2_S),
    ("iq3_xxs", E.quant_iq3_xxs, D.dequant_iq3_xxs, 98, GGMLType.IQ3_XXS),
    ("iq3_s", E.quant_iq3_s, D.dequant_iq3_s, 110, GGMLType.IQ3_S),
    ("iq1_s", E.quant_iq1_s, D.dequant_iq1_s, 50, GGMLType.IQ1_S),
    ("iq1_m", E.quant_iq1_m, D.dequant_iq1_m, 56, GGMLType.IQ1_M),
]

# worst acceptable weighted-MSE ratio vs the reference encoder: float
# accumulation order differs, so rare near-tie candidate flips are expected
MAX_ERR_RATIO = 1.02


def _data(n, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(n).astype(np.float32)
    qw = (np.abs(rng.standard_normal(n)) + 0.1).astype(np.float32)
    return x, qw


@pytest.mark.parametrize("name,enc,dec,bb,gt", CASES, ids=[c[0] for c in CASES])
def test_roundtrip_decodes(name, enc, dec, bb, gt):
    n = 1024
    x, qw = _data(n)
    blob = enc(x, qw)
    assert blob.size == (n // 256) * bb
    y = dec(blob, n)
    assert np.isfinite(y).all()
    # coarse sanity: a (1-3)-bit quantizer should track the sign structure
    corr = np.corrcoef(x, y)[0, 1]
    assert corr > 0.75, f"{name}: corr {corr}"


@pytest.mark.parametrize("name,enc,dec,bb,gt", CASES, ids=[c[0] for c in CASES])
def test_zero_and_constant_blocks(name, enc, dec, bb, gt):
    n = 512
    x = np.zeros(n, np.float32)
    y = dec(enc(x, None), n)
    assert np.allclose(y, 0.0)
    # one zero sub-block inside a live superblock
    x, qw = _data(n)
    x[:32] = 0.0
    y = dec(enc(x, qw), n)
    assert np.isfinite(y).all()


@pytest.mark.parametrize("name,enc,dec,bb,gt", CASES, ids=[c[0] for c in CASES])
def test_parity_vs_oracle_imatrix(name, enc, dec, bb, gt):
    o = get_oracle()
    if o is None:
        pytest.skip("oracle unavailable")
    n = 256 * 8
    x, qw = _data(n, seed=11)
    ours = enc(x, qw)
    ref = o.quantize_imatrix(name, x, (n // 256) * bb, qw)
    # most blocks should be byte-identical; all must be quality-equivalent
    ident = float((ours == ref).mean())
    assert ident > 0.95, f"{name}: only {ident:.3f} bytes identical"
    ym = o.dequantize_row(name, ours, n)
    yo = o.dequantize_row(name, ref, n)
    em = float(np.mean(qw * (x - ym) ** 2))
    eo = float(np.mean(qw * (x - yo) ** 2))
    assert em <= eo * MAX_ERR_RATIO, f"{name}: err {em} vs oracle {eo}"
    # and our decoder must agree bit-exactly with the reference decoder
    np.testing.assert_allclose(dec(ours, n), ym, rtol=0, atol=0)


@pytest.mark.parametrize(
    "name,enc,dec,bb,gt",
    [c for c in CASES if c[0] in ("iq3_xxs", "iq3_s", "iq1_m")],
    ids=["iq3_xxs", "iq3_s", "iq1_m"],
)
def test_parity_vs_oracle_no_imatrix(name, enc, dec, bb, gt):
    """Formats whose reference encoder accepts a NULL imatrix."""
    o = get_oracle()
    if o is None:
        pytest.skip("oracle unavailable")
    o._init_iq_grids(name)
    n = 256 * 8
    x, _ = _data(n, seed=5)
    ours = enc(x, None)
    ref = o.quantize(name, x, (n // 256) * bb)
    ident = float((ours == ref).mean())
    assert ident > 0.95, f"{name}: only {ident:.3f} bytes identical"
    ym = o.dequantize_row(name, ours, n)
    yo = o.dequantize_row(name, ref, n)
    em = float(np.mean((x - ym) ** 2))
    eo = float(np.mean((x - yo) ** 2))
    assert em <= eo * MAX_ERR_RATIO


def test_quantize_tensor_dispatch():
    x, qw = _data(512)
    raw = quantize_tensor(x.reshape(2, 256), GGMLType.IQ3_XXS, quant_weights=qw[:256])
    back = dequantize_tensor(raw, GGMLType.IQ3_XXS, (2, 256))
    assert back.shape == (2, 256)
    assert np.isfinite(back).all()


def test_multirow_tiles_imatrix():
    """Per-row imatrix weights must tile across rows like the reference
    (quantize_iq* is called once per row with the same quant_weights)."""
    n_per_row = 256
    x, qw = _data(n_per_row * 3, seed=9)
    qw_row = qw[:n_per_row]
    full = E.quant_iq2_xxs(x, qw_row)
    rows = [
        E.quant_iq2_xxs(x[i * n_per_row : (i + 1) * n_per_row], qw_row)
        for i in range(3)
    ]
    np.testing.assert_array_equal(full, np.concatenate(rows))
