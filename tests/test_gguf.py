"""GGUF reader/writer tests: real reference files + round-trips + fuzzing.

Mirrors the role of reference tests/test-gguf.cpp.
"""

import numpy as np
import pytest

from llamacog_tpu.gguf import (
    GGMLType,
    GGUFFormatError,
    GGUFReader,
    GGUFValueType,
    GGUFWriter,
    row_nbytes,
)


def test_read_reference_vocab_gguf(reference_models_dir):
    path = reference_models_dir / "ggml-vocab-llama-spm.gguf"
    with GGUFReader(path) as r:
        assert r.metadata["general.architecture"] == "llama"
        assert r.metadata["tokenizer.ggml.model"] == "llama"
        toks = r.metadata["tokenizer.ggml.tokens"]
        assert len(toks) == 32000
        assert toks[1] == "<s>"
        scores = r.metadata["tokenizer.ggml.scores"]
        assert scores.dtype == np.float32
        assert len(scores) == 32000


def test_read_all_reference_vocabs(reference_models_dir):
    count = 0
    for p in sorted(reference_models_dir.glob("ggml-vocab-*.gguf")):
        with GGUFReader(p) as r:
            assert "tokenizer.ggml.tokens" in r.metadata, p.name
            count += 1
    assert count >= 10


def test_roundtrip(tmp_path):
    path = tmp_path / "t.gguf"
    w = GGUFWriter(path)
    w.add("general.architecture", "llama")
    w.add("llama.block_count", 2)
    w.add("a.float", 1.5)
    w.add("a.bool", True)
    w.add("a.neg", -7)
    w.add("a.big", 2**40)
    w.add("a.strings", ["x", "yy", "zzz"])
    w.add("a.ints", np.arange(5, dtype=np.int32))
    w.add("a.floats", np.array([0.5, 1.5], dtype=np.float32))
    t0 = np.arange(64, dtype=np.float32).reshape(4, 16)
    t1 = (np.arange(32) % 7).astype(np.float16).reshape(2, 16)
    w.add_tensor("t0", t0)
    w.add_tensor("t1", t1)
    raw = bytes(range(row_nbytes(GGMLType.Q8_0, 32) * 2))
    w.add_tensor("tq", raw, shape=(2, 32), ggml_type=GGMLType.Q8_0)
    w.write()

    with GGUFReader(path) as r:
        assert r.metadata["general.architecture"] == "llama"
        assert r.metadata["llama.block_count"] == 2
        assert r.metadata["a.float"] == 1.5
        assert r.metadata["a.bool"] is True
        assert r.metadata["a.neg"] == -7
        assert r.metadata["a.big"] == 2**40
        assert r.metadata["a.strings"] == ["x", "yy", "zzz"]
        np.testing.assert_array_equal(r.metadata["a.ints"], np.arange(5, dtype=np.int32))
        assert r.tensors["t0"].shape == (4, 16)
        assert r.tensors["t0"].ggml_type == GGMLType.F32
        got0 = r.tensor_bytes("t0").view(np.float32).reshape(4, 16)
        np.testing.assert_array_equal(got0, t0)
        got1 = r.tensor_bytes("t1").view(np.float16).reshape(2, 16)
        np.testing.assert_array_equal(got1, t1)
        assert r.tensors["tq"].ggml_type == GGMLType.Q8_0
        assert bytes(r.tensor_bytes("tq")) == raw


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b"XXXX" + b[4:],  # bad magic
        lambda b: b[:4] + b"\x09\x00\x00\x00" + b[8:],  # bad version
        lambda b: b[:40],  # truncated
        lambda b: b[:12] + b"\xff\xff\xff\xff\xff\xff\xff\x7f" + b[20:],  # huge n_kv
    ],
)
def test_invalid_files_rejected(tmp_path, mutate):
    path = tmp_path / "ok.gguf"
    w = GGUFWriter(path)
    w.add("k", 1)
    w.add_tensor("t", np.zeros((4, 8), dtype=np.float32))
    w.write()
    data = path.read_bytes()
    bad = tmp_path / "bad.gguf"
    bad.write_bytes(mutate(data))
    with pytest.raises((GGUFFormatError, ValueError)):
        GGUFReader(bad)


def test_truncated_tensor_data_rejected(tmp_path):
    path = tmp_path / "ok.gguf"
    w = GGUFWriter(path)
    w.add_tensor("t", np.zeros((16, 32), dtype=np.float32))
    w.write()
    data = path.read_bytes()
    bad = tmp_path / "bad.gguf"
    bad.write_bytes(data[:-1024])
    with pytest.raises(GGUFFormatError):
        GGUFReader(bad)
