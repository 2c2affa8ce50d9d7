"""Per-tensor and whole-model hashing of a GGUF (reference
examples/gguf-hash/gguf-hash.cpp): prints `<algo>  <hex>  <model>:<tensor>`
lines plus an overall model hash over the concatenated tensor data (in
tensor-info order), and a deterministic UUIDv5 (sha1-based, RFC 9562) over
the same data under the llama.cpp namespace (gguf-hash's --uuid mode)."""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import uuid

from ..gguf.reader import GGUFModelReader

# UUIDv5 namespace used by the reference (gguf-hash.cpp UUID_NAMESPACE_LLAMA_CPP:
# ef001206-dadc-5f6d-a15f-3359e577d4e5) so our UUIDs match its output byte-for-byte
UUID_NAMESPACE_LLAMA_CPP = uuid.UUID("ef001206-dadc-5f6d-a15f-3359e577d4e5")


def hash_gguf(path: str, algos=("sha256",)) -> dict:
    """{algo: {tensor_name: hex, "": model_hex}} over mmapped tensor bytes."""
    reader = GGUFModelReader(path)  # split-aware (-NNNNN-of-NNNNN)
    out: dict[str, dict[str, str]] = {a: {} for a in algos}
    model = {a: hashlib.new(a) for a in algos}
    try:
        for name in reader.tensors:
            data = reader.tensor_bytes(name)
            for a in algos:
                h = hashlib.new(a)
                h.update(data)
                out[a][name] = h.hexdigest()
                model[a].update(data)
        for a in algos:
            out[a][""] = model[a].hexdigest()
    finally:
        reader.close()
    return out


def model_uuid(path: str) -> uuid.UUID:
    """UUIDv5: sha1 over the namespace bytes then every tensor's raw data in
    tensor order, version/variant bits stamped — byte-identical to
    gguf-hash.cpp generate_uuidv5 (:270-285, sha1 feed :322-326)."""
    reader = GGUFModelReader(path)
    h = hashlib.sha1(UUID_NAMESPACE_LLAMA_CPP.bytes)
    try:
        for name in reader.tensors:
            h.update(reader.tensor_bytes(name))
    finally:
        reader.close()
    b = bytearray(h.digest()[:16])
    b[6] = (b[6] & 0x0F) | 0x50
    b[8] = (b[8] & 0x3F) | 0x80
    return uuid.UUID(bytes=bytes(b))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="llamacog-gguf-hash",
        description="Hash GGUF tensor data (gguf-hash role)")
    p.add_argument("model", help="GGUF file")
    p.add_argument("--sha256", action="store_true", help="use sha256 (default)")
    p.add_argument("--sha1", action="store_true", help="use sha1")
    p.add_argument("--all", action="store_true", help="run every algorithm")
    p.add_argument("--uuid", action="store_true", help="print the model UUIDv5 only")
    p.add_argument("--no-layer", action="store_true",
                   help="skip per-tensor lines, print only the model hash")
    args = p.parse_args(argv)

    if args.uuid:
        print(f"UUIDv5  {model_uuid(args.model)}  {args.model}")
        return 0

    algos = []
    if args.sha1 or args.all:
        algos.append("sha1")
    if args.sha256 or args.all or not algos:
        algos.append("sha256")

    base = os.path.basename(args.model)
    result = hash_gguf(args.model, tuple(algos))
    for a in algos:
        if not args.no_layer:
            for name, hexd in result[a].items():
                if name:
                    print(f"{a}  {hexd}  {base}:{name}")
        print(f"{a}  {result[a]['']}  {base}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
