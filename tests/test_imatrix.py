"""imatrix collector: collect stats, save .dat, reload via the quantize tool."""

import numpy as np
import pytest

import jax.numpy as jnp

from llamacog_tpu.gguf import GGMLType
from llamacog_tpu.models.loader import load_model
from llamacog_tpu.tools.imatrix import collect_imatrix
from llamacog_tpu.tools.quantize import load_imatrix


def test_imatrix_collect_save_load(tmp_path):
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    path = make_tiny_llama_gguf(tmp_path / "t.gguf", quant_type=GGMLType.F32)
    model = load_model(str(path), mode="dequant", dtype=jnp.float32, fuse=False)
    text = "the quick brown fox jumps over the lazy dog " * 20
    col = collect_imatrix(model, text, n_ctx=32, max_chunks=2)
    assert col.ncall == 2
    assert "blk.0.attn_q.weight" in col.values
    assert "blk.0.ffn_down.weight" in col.values
    # activations squared -> strictly positive for used columns
    assert (col.values["blk.0.attn_q.weight"] > 0).all()
    # dims: attn_q input is n_embd
    assert col.values["blk.0.attn_q.weight"].shape == (model.config.n_embd,)

    out = tmp_path / "im.dat"
    col.save(str(out), last_prompt="test")
    loaded = load_imatrix(str(out))
    assert set(loaded) == set(col.values)
    np.testing.assert_allclose(
        loaded["blk.0.attn_q.weight"],
        col.values["blk.0.attn_q.weight"] / col.counts["blk.0.attn_q.weight"],
        rtol=1e-6,
    )
