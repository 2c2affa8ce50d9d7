"""export-lora: merge LoRA adapter(s) into a base GGUF.

Equivalent of the reference's tools/export-lora/export-lora.cpp: streams the
base model tensor-by-tensor, adds scale * B·A (scale = adapter_scale *
alpha/rank, llama-adapter.h:50-55) to every targeted weight, and writes the
result (merged tensors stored as F16, like the reference's default).

Usage: python -m llamacog_tpu.tools.export_lora -m base.gguf \
           --lora adapter.gguf [--lora-scaled adapter2.gguf 0.5] -o merged.gguf
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..gguf import GGMLType, GGUFModelReader, GGUFWriter
from ..quant.decode_np import dequantize_tensor
from ..quant.encode_np import quantize_tensor
from ..runtime.lora import LoraAdapter, load_lora


def merge_gguf(
    in_path: str,
    out_path: str,
    adapters: list[tuple[LoraAdapter, float]],
    progress=None,
) -> dict:
    reader = GGUFModelReader(in_path)
    w = GGUFWriter(out_path)
    for key, val in reader.metadata.items():
        w.add(key, val)
    stats = {"tensors": 0, "merged": 0}
    names = reader.names()
    for idx, name in enumerate(names):
        ti = reader.tensor_info(name)
        raw = reader.tensor_bytes(name)
        stats["tensors"] += 1
        deltas = []
        for adapter, scale in adapters:
            pair = adapter.ab.get(name)
            if pair is not None:
                a, b = pair
                rank = a.shape[0]
                s = scale * (adapter.alpha / rank if adapter.alpha else 1.0)
                deltas.append(s * (b.astype(np.float64) @ a.astype(np.float64)))
        if not deltas:
            w.add_tensor(name, bytes(raw), shape=ti.shape, ggml_type=ti.ggml_type)
            continue
        f32 = dequantize_tensor(raw, ti.ggml_type, ti.shape).astype(np.float64)
        for d in deltas:
            f32 = f32 + d.reshape(ti.shape)
        merged = f32.astype(np.float32)
        out_type = GGMLType.F32 if ti.ggml_type == GGMLType.F32 else GGMLType.F16
        qdata = quantize_tensor(merged, out_type)
        w.add_tensor(name, qdata.tobytes(), shape=ti.shape, ggml_type=out_type)
        stats["merged"] += 1
        if progress:
            progress(idx + 1, len(names), name)
    w.write()
    reader.close()
    return stats


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="llamacog-export-lora")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--lora", action="append", default=[], help="adapter GGUF (scale 1.0)")
    p.add_argument(
        "--lora-scaled", action="append", nargs=2, default=[],
        metavar=("PATH", "SCALE"), help="adapter GGUF with user scale",
    )
    args = p.parse_args(argv)
    adapters = [(load_lora(a), 1.0) for a in args.lora]
    adapters += [(load_lora(a), float(s)) for a, s in args.lora_scaled]
    if not adapters:
        print("no --lora adapters given", file=sys.stderr)
        return 1
    stats = merge_gguf(args.model, args.output, adapters)
    print(f"merged {stats['merged']}/{stats['tensors']} tensors -> {args.output}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
