"""Legacy GGJT -> GGUF converter (convert_llama_ggml_to_gguf role):
synthesize a GGJTv3 file from a tiny GGUF's tensors and assert logit parity."""
import struct

import numpy as np
import pytest

from llamacog_tpu.gguf import GGMLType
from llamacog_tpu.gguf.reader import GGUFReader
from llamacog_tpu.tools.convert_ggml import convert
from llamacog_tpu.utils.testing import make_tiny_llama_gguf

CFG = dict(n_vocab=96, n_embd=64, n_layer=2, n_head=4, n_head_kv=4, n_ff=96)

_LEGACY = [
    ("token_embd.weight", b"tok_embeddings.weight"),
    ("output_norm.weight", b"norm.weight"),
    ("output.weight", b"output.weight"),
]
for i in range(CFG["n_layer"]):
    _LEGACY += [
        (f"blk.{i}.attn_q.weight", f"layers.{i}.attention.wq.weight".encode()),
        (f"blk.{i}.attn_k.weight", f"layers.{i}.attention.wk.weight".encode()),
        (f"blk.{i}.attn_v.weight", f"layers.{i}.attention.wv.weight".encode()),
        (f"blk.{i}.attn_output.weight", f"layers.{i}.attention.wo.weight".encode()),
        (f"blk.{i}.attn_norm.weight", f"layers.{i}.attention_norm.weight".encode()),
        (f"blk.{i}.ffn_gate.weight", f"layers.{i}.feed_forward.w1.weight".encode()),
        (f"blk.{i}.ffn_down.weight", f"layers.{i}.feed_forward.w2.weight".encode()),
        (f"blk.{i}.ffn_up.weight", f"layers.{i}.feed_forward.w3.weight".encode()),
        (f"blk.{i}.ffn_norm.weight", f"layers.{i}.ffn_norm.weight".encode()),
    ]


def _raw_legacy_vocab(n: int) -> list[bytes]:
    """Raw pieces as stored in real legacy files."""
    pieces = [b"<unk>", b"<s>", b"</s>"]
    pieces += [bytes([i - 3]) for i in range(3, n - 2)]
    pieces += [b"", b"hello world"]  # control-typed empty + space escaping
    return pieces


def _write_ggjt(src_gguf: str, out_bin: str, ftype: int) -> None:
    with GGUFReader(src_gguf) as r, open(out_bin, "wb") as f:
        f.write(b"tjgg" + struct.pack("<I", 3))
        f.write(struct.pack("<7I", CFG["n_vocab"], CFG["n_embd"], 256,
                            CFG["n_head"], CFG["n_layer"],
                            CFG["n_embd"] // CFG["n_head"], ftype))
        # RAW legacy SPM pieces (what real pre-GGUF files carry): plain
        # specials at 0-2, raw single bytes at 3-258, unescaped spaces in
        # word pieces — the converter must re-derive the GGUF forms
        for tokid, piece in enumerate(_raw_legacy_vocab(CFG["n_vocab"])):
            f.write(struct.pack("<I", len(piece)) + piece
                    + struct.pack("<f", -float(tokid)))
        for gguf_name, legacy in _LEGACY:
            ti = r.tensors[gguf_name]
            dims = tuple(reversed(ti.shape))  # ne order
            f.write(struct.pack("<3I", len(dims), len(legacy), int(ti.ggml_type)))
            f.write(struct.pack(f"<{len(dims)}I", *dims))
            f.write(legacy)
            pos = f.tell()
            f.write(b"\0" * (((pos + 31) & ~31) - pos))
            f.write(bytes(r.tensor_bytes(gguf_name)))


@pytest.mark.parametrize("qt", [GGMLType.F32, GGMLType.Q4_0])
def test_ggjt_roundtrip_logits(tmp_path, qt):
    src = str(tmp_path / "src.gguf")
    make_tiny_llama_gguf(src, quant_type=qt, **CFG)
    binp = str(tmp_path / "legacy.bin")
    _write_ggjt(src, binp, ftype=0 if qt == GGMLType.F32 else 2)
    out = str(tmp_path / "out.gguf")
    info = convert(binp, out, eps=1e-5)  # match the tiny model's rms eps
    assert info["format"] == "GGJTv3"

    # reference add_vocab transforms (convert_llama_ggml_to_gguf.py:287-339)
    with GGUFReader(out) as r2:
        toks = r2.metadata["tokenizer.ggml.tokens"]
        tt = list(r2.metadata["tokenizer.ggml.token_type"])
        scores = list(r2.metadata["tokenizer.ggml.scores"])
    assert toks[:3] == ["<unk>", "<s>", "</s>"] and tt[:3] == [2, 3, 3]
    assert toks[3] == "<0x00>" and toks[10] == "<0x07>" and tt[3] == 6
    assert toks[-2] == "" and tt[-2] == 3
    assert toks[-1] == "hello▁world" and tt[-1] == 1
    assert scores[5] == -5.0  # scores carried through

    import jax.numpy as jnp

    from llamacog_tpu.models.loader import load_model
    from llamacog_tpu.runtime.engine import Engine

    logits = []
    for path in (src, out):
        m = load_model(path, dtype=jnp.float32, mode="dequant")
        e = Engine(m.params, m.config, batch_size=1, max_seq=64)
        logits.append(np.asarray(e.prefill_logits(list(range(3, 19)))))
    np.testing.assert_allclose(logits[0], logits[1], rtol=2e-4, atol=2e-4)


def test_rejects_invalid_ftype(tmp_path):
    src = str(tmp_path / "src.gguf")
    make_tiny_llama_gguf(src, quant_type=GGMLType.F32, **CFG)
    binp = str(tmp_path / "legacy.bin")
    _write_ggjt(src, binp, ftype=6)  # 5/6 never existed in the legacy enum
    with pytest.raises(ValueError, match="invalid legacy ftype"):
        convert(binp, str(tmp_path / "out.gguf"))


def test_rejects_old_quantized(tmp_path):
    src = str(tmp_path / "src.gguf")
    make_tiny_llama_gguf(src, quant_type=GGMLType.Q4_0, **CFG)
    binp = str(tmp_path / "legacy.bin")
    _write_ggjt(src, binp, ftype=2)
    # downgrade the version header to v2: quant layouts changed in v3
    with open(binp, "r+b") as f:
        f.seek(4)
        f.write(struct.pack("<I", 2))
    with pytest.raises(ValueError, match="GGJTv3"):
        convert(binp, str(tmp_path / "out.gguf"))
