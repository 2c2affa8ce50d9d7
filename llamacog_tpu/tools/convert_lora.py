"""HF PEFT LoRA adapter -> GGUF adapter converter.

Role of the reference's convert_lora_to_gguf.py: reads a PEFT directory
(adapter_config.json + adapter_model.safetensors / .bin) and writes the
llama.cpp adapter-GGUF format the runtime LoRA path consumes
(runtime/lora.load_lora): `blk.N.<tensor>.weight.lora_a/.lora_b` tensors
plus `adapter.type=lora` / `adapter.lora.alpha` metadata.

For ggml-NORM-rope base arches (llama family) the q/k lora_B rows are
permuted exactly like the base weights (reference convert_lora reuses
LlamaModel.modify_tensors, so adapters ship permuted too).

Usage: python -m llamacog_tpu.tools.convert_lora <peft_dir> -o adapter.gguf
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

from ..gguf import GGUFWriter
from .convert_hf import _STFile, permute_rope_rows

# PEFT module name -> GGUF tensor base (reference gguf-py tensor_mapping)
_TARGET_MAP = {
    "q_proj": "attn_q.weight",
    "k_proj": "attn_k.weight",
    "v_proj": "attn_v.weight",
    "o_proj": "attn_output.weight",
    "gate_proj": "ffn_gate.weight",
    "up_proj": "ffn_up.weight",
    "down_proj": "ffn_down.weight",
    "lm_head": "output.weight",
}

_NORM_ROPE_ARCHES = ("llama", "granite", "minicpm", "deci")


def _adapter_tensors(d: pathlib.Path) -> dict[str, np.ndarray]:
    st = d / "adapter_model.safetensors"
    if st.exists():
        f = _STFile(st)
        return {n: f.get(n) for n in f.names()}
    binf = d / "adapter_model.bin"
    if binf.exists():
        import torch

        sd = torch.load(binf, map_location="cpu", weights_only=True)
        return {k: v.float().numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no adapter_model.safetensors/.bin in {d}")


def _parse_name(name: str):
    """'base_model.model.model.layers.3.self_attn.q_proj.lora_A.weight'
    -> ('blk.3.attn_q.weight', 'a').  lm_head and embed are model-level."""
    half = None
    if ".lora_A." in name or name.endswith(".lora_A.weight"):
        half = "a"
    elif ".lora_B." in name or name.endswith(".lora_B.weight"):
        half = "b"
    if half is None:
        return None, None
    parts = name.split(".")
    if "layers" in parts:
        il = int(parts[parts.index("layers") + 1])
        for mod, gguf in _TARGET_MAP.items():
            if mod in parts:
                return f"blk.{il}.{gguf}", half
        return None, None
    for mod, gguf in _TARGET_MAP.items():
        if mod in parts:
            return gguf, half
    return None, None


def convert_lora(peft_dir: str, out_path: str, arch: str = "llama",
                 n_head: int | None = None, n_head_kv: int | None = None) -> dict:
    d = pathlib.Path(peft_dir)
    acfg = json.loads((d / "adapter_config.json").read_text())
    alpha = float(acfg.get("lora_alpha", acfg.get("alpha", 1.0)))
    tensors = _adapter_tensors(d)

    # head counts for the q/k permute, from the base model config if present
    base_cfg = {}
    base = acfg.get("base_model_name_or_path")
    if base and (pathlib.Path(base) / "config.json").exists():
        base_cfg = json.loads((pathlib.Path(base) / "config.json").read_text())
    nh = n_head or base_cfg.get("num_attention_heads")
    nkv = n_head_kv or base_cfg.get("num_key_value_heads", nh)

    w = GGUFWriter(out_path)
    w.add("general.architecture", arch)
    w.add("general.type", "adapter")
    w.add("adapter.type", "lora")
    w.add("adapter.lora.alpha", alpha)
    count = 0
    skipped = []
    for name, arr in sorted(tensors.items()):
        base_name, half = _parse_name(name)
        if base_name is None:
            skipped.append(name)
            continue
        arr = np.asarray(arr, np.float32)
        if half == "b" and arch in _NORM_ROPE_ARCHES and nh:
            # lora_B rows live in the weight's output space: permute like
            # the base q/k weights (NORM-rope convention)
            if ".attn_q." in f".{base_name}." and arr.shape[0] % (2 * nh) == 0:
                arr = permute_rope_rows(arr, nh)
            elif ".attn_k." in f".{base_name}." and nkv and arr.shape[0] % (2 * nkv) == 0:
                arr = permute_rope_rows(arr, nkv)
        w.add_tensor(f"{base_name}.lora_{half}", arr)
        count += 1
    w.write()
    return {"tensors": count, "alpha": alpha, "skipped": skipped}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="llamacog-convert-lora")
    p.add_argument("peft_dir")
    p.add_argument("-o", "--outfile", required=True)
    p.add_argument("--arch", default="llama",
                   help="base model GGUF architecture (for rope permutes)")
    p.add_argument("--n-head", type=int, default=None)
    p.add_argument("--n-head-kv", type=int, default=None)
    args = p.parse_args(argv)
    info = convert_lora(args.peft_dir, args.outfile, arch=args.arch,
                        n_head=args.n_head, n_head_kv=args.n_head_kv)
    print(f"wrote {args.outfile}: {info['tensors']} tensors, "
          f"alpha {info['alpha']}", file=sys.stderr)
    for s in info["skipped"]:
        print(f"  skipped: {s}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
