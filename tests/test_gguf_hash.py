"""gguf-hash tool: per-tensor/model hashes + UUIDv5 (examples/gguf-hash role)."""
import hashlib
import uuid

import numpy as np

from llamacog_tpu.gguf.reader import GGUFModelReader
from llamacog_tpu.tools.gguf_hash import (
    UUID_NAMESPACE_LLAMA_CPP, hash_gguf, model_uuid,
)
from llamacog_tpu.utils.testing import make_tiny_llama_gguf


def _model(tmp_path):
    path = str(tmp_path / "hash_me.gguf")
    make_tiny_llama_gguf(path, n_vocab=64, n_embd=32, n_layer=1, n_head=2,
                         n_head_kv=2, n_ff=48)
    return path


def test_per_tensor_and_model_hash(tmp_path):
    path = _model(tmp_path)
    result = hash_gguf(path, ("sha256", "sha1"))
    with GGUFModelReader(path) as r:
        names = list(r.tensors)
        # independent recomputation for one tensor and for the model stream
        t0 = bytes(r.tensor_bytes(names[0]))
        assert result["sha256"][names[0]] == hashlib.sha256(t0).hexdigest()
        model = hashlib.sha1()
        for n in names:
            model.update(bytes(r.tensor_bytes(n)))
    assert result["sha1"][""] == model.hexdigest()
    assert set(result["sha256"]) == set(names) | {""}


def test_uuid_is_v5_and_deterministic(tmp_path):
    path = _model(tmp_path)
    u1, u2 = model_uuid(path), model_uuid(path)
    assert u1 == u2
    assert u1.version == 5
    assert u1.variant == uuid.RFC_4122
    # reproduce independently: sha1(namespace || tensor data), RFC 9562 bits
    h = hashlib.sha1(UUID_NAMESPACE_LLAMA_CPP.bytes)
    with GGUFModelReader(path) as r:
        for n in r.tensors:
            h.update(bytes(r.tensor_bytes(n)))
    b = bytearray(h.digest()[:16])
    b[6] = (b[6] & 0x0F) | 0x50
    b[8] = (b[8] & 0x3F) | 0x80
    assert u1 == uuid.UUID(bytes=bytes(b))


def test_content_change_changes_hash(tmp_path):
    p1 = _model(tmp_path)
    import shutil
    p2 = str(tmp_path / "hash_me2.gguf")
    shutil.copy(p1, p2)
    # flip one byte in the tensor blob
    with GGUFModelReader(p1) as r:
        name = next(iter(r.tensors))
        rd, ti = r.tensors[name]
        off = rd.data_offset + ti.offset
    with open(p2, "r+b") as f:
        f.seek(off)
        c = f.read(1)
        f.seek(off)
        f.write(bytes([c[0] ^ 0xFF]))
    assert hash_gguf(p1)["sha256"][""] != hash_gguf(p2)["sha256"][""]
