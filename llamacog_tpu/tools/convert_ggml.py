"""Convert legacy pre-GGUF llama files (GGML/GGMF/GGJT v1-3) to GGUF
(reference convert_llama_ggml_to_gguf.py).

Wire format (GGMLModel.load :145-200): magic `lmgg`/`fmgg`+v1/`tjgg`+v1-3,
7×u32 hparams (n_vocab, n_embd, n_mult, n_head, n_layer, n_rot, ftype),
vocab entries (u32 len + bytes [+ f32 score unless bare GGML]), then
tensors: 3×u32 (n_dims, name_len, dtype) + u32 dims[n_dims] (ne order,
innermost first) + name [+ pad to 32B for GGJT] + raw block data.
Quantized payloads changed in GGJTv2 and again in v3, so only ALL_F32 /
MOSTLY_F16 convert from older files (validate_conversion :175-185); v3
quant blocks are byte-compatible and copy through untouched.
"""

from __future__ import annotations

import argparse
import mmap
import os
import struct
import sys

import numpy as np

from ..gguf.constants import GGML_TYPE_TRAITS, GGMLType
from ..gguf.writer import GGUFWriter

# legacy llama.cpp tensor names -> GGUF names (gguf-py tensor_mapping legacy
# entries: tok_embeddings/norm/output/layers.N.*)
_TOP = {
    b"tok_embeddings.weight": "token_embd.weight",
    b"norm.weight": "output_norm.weight",
    b"output.weight": "output.weight",
}
_LAYER = {
    "attention.wq.weight": "attn_q.weight",
    "attention.wk.weight": "attn_k.weight",
    "attention.wv.weight": "attn_v.weight",
    "attention.wo.weight": "attn_output.weight",
    "attention_norm.weight": "attn_norm.weight",
    "feed_forward.w1.weight": "ffn_gate.weight",
    "feed_forward.w2.weight": "ffn_down.weight",
    "feed_forward.w3.weight": "ffn_up.weight",
    "ffn_norm.weight": "ffn_norm.weight",
}

_FTYPE_OK_OLD = (0, 1)  # ALL_F32, MOSTLY_F16
_FTYPE_BAD_V2 = (2, 3, 4, 7)  # Q4_0/Q4_1/Q4_1_SOME_F16/Q8_0 changed in v3
# legacy GGMLFType enum (convert_llama_ggml_to_gguf.py:27-44); 5/6 were
# removed upstream and never shipped in files
_FTYPE_VALID = frozenset(range(0, 5)) | frozenset(range(7, 19))


def _map_name(name: bytes) -> str:
    if name in _TOP:
        return _TOP[name]
    s = name.decode("utf-8", errors="replace")
    if s.startswith("layers."):
        _, idx, rest = s.split(".", 2)
        mapped = _LAYER.get(rest)
        if mapped:
            return f"blk.{idx}.{mapped}"
    raise ValueError(f"unmapped legacy tensor name {name!r}")


def convert(in_path: str, out_path: str, *, context_length: int = 2048,
            gqa: int = 1, eps: float = 5e-6) -> dict:
    with open(in_path, "rb") as f:
        data = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    magic = bytes(data[:4])
    if magic == b"GGUF":
        raise ValueError("file is already GGUF")
    if magic == b"lmgg":
        fmt, version, off = "GGML", 1, 4
    elif magic == b"fmgg":
        (version,) = struct.unpack_from("<I", data, 4)
        if version != 1:
            raise ValueError(f"unexpected GGMF version {version}")
        fmt, off = "GGMF", 8
    elif magic == b"tjgg":
        (version,) = struct.unpack_from("<I", data, 4)
        if not 1 <= version <= 3:
            raise ValueError(f"unexpected GGJT version {version}")
        fmt, off = "GGJT", 8
    else:
        raise ValueError(f"not a legacy GGML file (magic {magic!r})")

    n_vocab, n_embd, n_mult, n_head, n_layer, n_rot, ftype = struct.unpack_from(
        "<7I", data, off)
    off += 28
    if ftype not in _FTYPE_VALID:
        raise ValueError(f"invalid legacy ftype {ftype}")
    if (fmt != "GGJT" or version < 2) and ftype not in _FTYPE_OK_OLD:
        raise ValueError("quantizations changed in GGJTv2; only F32/F16 "
                         "convert from older files")
    if fmt == "GGJT" and version == 2 and ftype in _FTYPE_BAD_V2:
        raise ValueError("Q4/Q8 layouts changed in GGJTv3; v2 quantized "
                         "files are not convertible")

    has_scores = fmt != "GGML"
    # legacy files store raw SPM piece bytes with no token types; re-derive
    # the GGUF form the way the reference does (convert_llama_ggml_to_gguf.py
    # add_vocab :287-339): ids 0-2 become <unk>/<s>/</s> (UNKNOWN/CONTROL),
    # empty pieces are CONTROL, single-byte ids 3-258 become '<0xXX>' BYTE
    # tokens, and spaces in normal pieces are escaped to U+2581
    tokens, scores, ttypes = [], [], []
    for tokid in range(n_vocab):
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        vbytes = bytes(data[off:off + ln])
        off += ln
        if has_scores:
            (sc,) = struct.unpack_from("<f", data, off)
            off += 4
        else:
            sc = 0.0
        tt = 1  # normal
        if tokid <= 2:
            vbytes, tt = ((b"<unk>", 2), (b"<s>", 3), (b"</s>", 3))[tokid]
        elif not vbytes:
            tt = 3  # control
        elif 3 <= tokid <= 258 and len(vbytes) == 1:
            vbytes, tt = f"<0x{vbytes[0]:02X}>".encode(), 6  # byte
        else:
            vbytes = vbytes.replace(b" ", b"\xe2\x96\x81")
        tokens.append(vbytes.decode("utf-8", errors="replace"))
        scores.append(sc)
        ttypes.append(tt)

    pad32 = fmt == "GGJT"
    tensors = []  # (gguf_name, numpy_shape, GGMLType, start, nbytes)
    while off < len(data):
        n_dims, name_len, dtype = struct.unpack_from("<3I", data, off)
        off += 12
        if not 0 <= n_dims <= 4 or name_len >= 4096:
            raise ValueError(f"corrupt tensor header at {off - 12}")
        dims = struct.unpack_from(f"<{n_dims}I", data, off)
        off += 4 * n_dims
        name = bytes(data[off:off + name_len])
        off += name_len
        if pad32:
            off = (off + 31) & ~31
        tt = GGMLType(dtype)
        traits = GGML_TYPE_TRAITS[tt]
        n_elems = int(np.prod(dims)) if dims else 1
        nbytes = n_elems * traits.type_size // traits.block_size
        tensors.append((_map_name(name), tuple(reversed(dims)), tt, off, nbytes))
        off += nbytes

    ffs = [sh[0] for nm, sh, *_ in tensors if nm == "blk.0.ffn_gate.weight"]
    if not ffs:
        raise ValueError("missing layer 0 FF tensor (layers.0.feed_forward.w1)")
    n_ff = ffs[0]
    n_kv_head = n_head
    if gqa > 1:
        assert n_head % gqa == 0, f"GQA {gqa} does not divide n_head {n_head}"
        n_kv_head = n_head // gqa

    w = GGUFWriter(out_path)
    w.add("general.architecture", "llama")
    w.add("general.name", os.path.basename(in_path))
    w.add("general.description",
          f"converted from legacy {fmt}v{version} format")
    w.add("general.file_type", ftype)
    w.add("llama.context_length", context_length)
    w.add("llama.embedding_length", n_embd)
    w.add("llama.block_count", n_layer)
    w.add("llama.feed_forward_length", int(n_ff))
    w.add("llama.rope.dimension_count", n_embd // n_head)
    w.add("llama.attention.head_count", n_head)
    w.add("llama.attention.head_count_kv", n_kv_head)
    w.add("llama.attention.layer_norm_rms_epsilon", np.float32(eps))
    w.add("tokenizer.ggml.model", "llama")
    w.add("tokenizer.ggml.pre", "default")
    w.add("tokenizer.ggml.tokens", tokens)
    w.add("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add("tokenizer.ggml.token_type", np.asarray(ttypes, np.int32))
    w.add("tokenizer.ggml.bos_token_id", 1)
    w.add("tokenizer.ggml.eos_token_id", 2)
    w.add("tokenizer.ggml.unknown_token_id", 0)

    for nm, shape, tt, start, nbytes in tensors:
        w.add_tensor(nm, bytes(data[start:start + nbytes]), shape, tt)
    w.write()
    return {"format": f"{fmt}v{version}", "ftype": ftype,
            "n_tensors": len(tensors), "n_vocab": n_vocab}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="llamacog-convert-ggml",
        description="Convert legacy GGML/GGMF/GGJT llama files to GGUF")
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("-c", "--context-length", type=int, default=2048)
    p.add_argument("--gqa", type=int, default=1,
                   help="grouped-query attention factor (70B = 8)")
    p.add_argument("--eps", type=float, default=5e-6)
    a = p.parse_args(argv)
    info = convert(a.input, a.output, context_length=a.context_length,
                   gqa=a.gqa, eps=a.eps)
    print(f"converted {info['format']} ({info['n_tensors']} tensors) "
          f"-> {a.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
