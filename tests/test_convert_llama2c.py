"""convert-llama2c-to-ggml role: round-trip a tiny llama through the
llama2.c wire format and assert engine logits match the original GGUF."""
import struct

import numpy as np
import pytest

from llamacog_tpu.gguf import GGMLType
from llamacog_tpu.gguf.reader import GGUFReader
from llamacog_tpu.quant.decode_np import dequantize
from llamacog_tpu.tools.convert_llama2c import convert, load_llama2c_vocab
from llamacog_tpu.utils.testing import make_tiny_llama_gguf

CFG = dict(n_vocab=96, n_embd=64, n_layer=2, n_head=4, n_head_kv=2, n_ff=96)


def _tensor_f32(r: GGUFReader, name: str) -> np.ndarray:
    ti = r.tensors[name]
    return dequantize(r.tensor_bytes(name), ti.ggml_type,
                      ti.n_elements).reshape(ti.shape)


def _write_llama2c(src_gguf: str, bin_path: str, shared: bool) -> None:
    with GGUFReader(src_gguf) as r:
        g = lambda n: _tensor_f32(r, n)
        dim, n_layer = CFG["n_embd"], CFG["n_layer"]
        head_size = dim // CFG["n_head"]
        vocab_field = CFG["n_vocab"] if shared else -CFG["n_vocab"]
        with open(bin_path, "wb") as f:
            f.write(struct.pack("<7i", dim, CFG["n_ff"], n_layer,
                                CFG["n_head"], CFG["n_head_kv"], vocab_field, 128))
            def wr(a):
                f.write(np.ascontiguousarray(a, dtype="<f4").tobytes())
            wr(g("token_embd.weight"))
            wr(np.stack([g(f"blk.{i}.attn_norm.weight") for i in range(n_layer)]))
            for nm in ("attn_q", "attn_k", "attn_v", "attn_output"):
                wr(np.stack([g(f"blk.{i}.{nm}.weight") for i in range(n_layer)]))
            wr(np.stack([g(f"blk.{i}.ffn_norm.weight") for i in range(n_layer)]))
            for nm in ("ffn_gate", "ffn_down", "ffn_up"):
                wr(np.stack([g(f"blk.{i}.{nm}.weight") for i in range(n_layer)]))
            wr(g("output_norm.weight"))
            wr(np.zeros(128 * head_size, dtype="<f4"))  # freq_cis skip region
            if not shared:
                wr(g("output.weight"))


@pytest.mark.parametrize("shared", [True, False])
def test_llama2c_roundtrip_logits(tmp_path, shared):
    src = str(tmp_path / "src.gguf")
    make_tiny_llama_gguf(src, quant_type=GGMLType.F32, **CFG)
    binp = str(tmp_path / "model.bin")
    _write_llama2c(src, binp, shared)
    out = str(tmp_path / "out.gguf")
    convert(binp, src, out, outtype="f32")  # vocab copied from the source GGUF

    import jax.numpy as jnp

    from llamacog_tpu.models.loader import load_model
    from llamacog_tpu.runtime.engine import Engine

    if shared:
        # tied classifier: the converted output head must BE the embedding
        # table; the source's independent head can't match logits, so check
        # the tie plus that the converted model loads and decodes
        with GGUFReader(out) as r:
            np.testing.assert_array_equal(_tensor_f32(r, "output.weight"),
                                          _tensor_f32(r, "token_embd.weight"))
        m = load_model(out, dtype=jnp.float32)
        e = Engine(m.params, m.config, batch_size=1, max_seq=64)
        assert np.asarray(e.prefill_logits(list(range(3, 19)))).shape == (16, CFG["n_vocab"])
        return
    logits = []
    for path in (src, out):
        m = load_model(path, dtype=jnp.float32)
        e = Engine(m.params, m.config, batch_size=1, max_seq=64)
        logits.append(np.asarray(e.prefill_logits(list(range(3, 19)))))
    np.testing.assert_allclose(logits[0][-1], logits[1][-1], rtol=2e-4, atol=2e-4)


def test_tokenizer_bin_vocab(tmp_path):
    # build a tokenizer.bin and check the reference's special-token handling
    path = str(tmp_path / "tok.bin")
    toks = [("ignored", 0.0), ("ignored", -1.0), ("ignored", -2.0),
            ("<0x41>", -3.0), ("hi there", -4.0), ("", -5.0)]
    with open(path, "wb") as f:
        f.write(struct.pack("<i", 16))
        for text, score in toks:
            b = text.encode()
            f.write(struct.pack("<f", score) + struct.pack("<i", len(b)) + b)
    texts, scores, types = load_llama2c_vocab(path, len(toks))
    assert texts[:3] == ["<unk>", "<s>", "</s>"]
    assert types[:3] == [2, 3, 3]
    assert types[3] == 6  # byte token
    assert texts[4] == "hi▁there" and types[4] == 1  # whitespace escape
    assert types[5] == 3  # empty -> control
    assert scores[4] == -4.0
