"""gguf-split: shard a GGUF into `-NNNNN-of-NNNNN` pieces or merge them back.

Equivalent of the reference's tools/gguf-split/gguf-split.cpp: tensors are
distributed by count (--split-max-tensors) or payload size
(--split-max-size); the first shard carries the full metadata, every shard
gets split.no / split.count / split.tensors.count keys (read back by
GGUFModelReader, llamacog_tpu/gguf/reader.py).
"""

from __future__ import annotations

import argparse
import re
import sys

from ..gguf import GGUFModelReader, GGUFWriter

SPLIT_RE = re.compile(r"^(.*)-(\d{5})-of-(\d{5})\.gguf$")


def _shard_name(base: str, i: int, n: int) -> str:
    return f"{base}-{i + 1:05d}-of-{n:05d}.gguf"


def split_gguf(
    in_path: str,
    out_base: str,
    max_tensors: int = 128,
    max_size: int | None = None,
) -> list[str]:
    reader = GGUFModelReader(in_path)
    names = reader.names()
    # plan shards
    groups: list[list[str]] = [[]]
    acc = 0
    for name in names:
        ti = reader.tensor_info(name)
        if groups[-1] and (
            (max_size and acc + ti.nbytes > max_size)
            or (not max_size and len(groups[-1]) >= max_tensors)
        ):
            groups.append([])
            acc = 0
        groups[-1].append(name)
        acc += ti.nbytes
    n = len(groups)
    outs = []
    for i, group in enumerate(groups):
        path = _shard_name(out_base, i, n)
        w = GGUFWriter(path)
        if i == 0:
            for key, val in reader.metadata.items():
                if not key.startswith("split."):
                    w.add(key, val)
        w.add("split.no", i)
        w.add("split.count", n)
        w.add("split.tensors.count", len(names))
        for name in group:
            ti = reader.tensor_info(name)
            w.add_tensor(
                name, bytes(reader.tensor_bytes(name)), shape=ti.shape,
                ggml_type=ti.ggml_type,
            )
        w.write()
        outs.append(path)
    reader.close()
    return outs


def merge_gguf(first_shard: str, out_path: str) -> int:
    m = SPLIT_RE.match(first_shard)
    if not m:
        raise ValueError(f"{first_shard}: not a -NNNNN-of-NNNNN.gguf shard")
    reader = GGUFModelReader(first_shard)
    w = GGUFWriter(out_path)
    for key, val in reader.metadata.items():
        if not key.startswith("split."):
            w.add(key, val)
    count = 0
    for name in reader.names():
        ti = reader.tensor_info(name)
        w.add_tensor(
            name, bytes(reader.tensor_bytes(name)), shape=ti.shape,
            ggml_type=ti.ggml_type,
        )
        count += 1
    w.write()
    reader.close()
    return count


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="llamacog-gguf-split")
    p.add_argument("--split", action="store_true")
    p.add_argument("--merge", action="store_true")
    p.add_argument("--split-max-tensors", type=int, default=128)
    p.add_argument("--split-max-size", type=str, default=None, help="e.g. 500M, 2G")
    p.add_argument("input")
    p.add_argument("output")
    args = p.parse_args(argv)
    if args.merge:
        n = merge_gguf(args.input, args.output)
        print(f"merged {n} tensors -> {args.output}", file=sys.stderr)
        return 0
    max_size = None
    if args.split_max_size:
        m = re.match(r"^(\d+)([MG])?$", args.split_max_size)
        if not m:
            print("bad --split-max-size", file=sys.stderr)
            return 1
        max_size = int(m.group(1)) * (1 << 30 if m.group(2) == "G" else 1 << 20)
    outs = split_gguf(
        args.input, args.output, max_tensors=args.split_max_tensors, max_size=max_size
    )
    print(f"wrote {len(outs)} shards: {outs[0]} ...", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
