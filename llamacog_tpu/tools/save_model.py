"""llamacog-save-model — write a loaded model back to GGUF.

TPU equivalent of the reference model saver (src/llama-model-saver.cpp,
`llama_model_save_to_file` include/llama.h; used by examples/training/
finetune.cpp:91 to persist finetuned weights): all source metadata
(hparams + tokenizer) round-trips verbatim, and the tensors are serialized
from the in-memory param pytree — so LoRA merges, control vectors, or
finetuned weights end up in the file. Dense arrays are written as F32/F16;
planar QuantTensors are re-encoded to their original block type.

The model must be loaded with ``fuse=False`` (fused qkv/gate_up tensors have
no canonical GGUF names to map back to).
"""

from __future__ import annotations

import numpy as np

from ..gguf import GGMLType, GGUFWriter
from ..quant import quantize_tensor

_FUSED_KEYS = ("attn_qk", "ffn_gate_up", "ffn_gate_up_exps")


def _to_numpy(arr, ftype: str) -> np.ndarray:
    a = np.asarray(arr, dtype=np.float32)
    return a.astype(np.float16) if ftype == "f16" and a.ndim >= 2 else a


def _write_param(w: GGUFWriter, name: str, value, ftype: str) -> None:
    from ..quant.planar import QuantTensor, decode

    if isinstance(value, QuantTensor):
        # runtime-only kinds alias their wire format (Q4_KS4 re-encodes as
        # Q4_K; decode() handles the planar variant)
        t = GGMLType[{"Q4_KS4": "Q4_K", "Q4_KC": "Q4_K",
                      "Q6_KP": "Q6_K"}.get(value.kind, value.kind)]
        dense = np.asarray(decode(value), np.float32)
        w.add_tensor(name, quantize_tensor(dense, t).tobytes(),
                     shape=value.shape, ggml_type=t)
    else:
        w.add_tensor(name, _to_numpy(value, ftype))


def save_model(model, path: str, ftype: str = "f32") -> None:
    """Serialize ``model`` (models/loader.Model) to a GGUF at ``path``.

    ftype: "f32" or "f16" — storage type for dense (non-QuantTensor) weights;
    1-D tensors (norms, biases) always stay F32 like the reference writer.
    """
    from ..models.loader import _LAYER_TENSORS, _MODEL_TENSORS

    if not model.metadata:
        raise ValueError("model has no retained metadata (reload with load_model)")
    for layer in model.params.get("layers", []):
        for k in _FUSED_KEYS:
            if k in layer:
                raise ValueError(
                    f"cannot save fused tensor {k!r}: reload with fuse=False")

    w = GGUFWriter(path)
    for key, value in model.metadata.items():
        w.add(key, value)

    core = {"tok_embd": "token_embd.weight", "output_norm": "output_norm.weight",
            "output": "output.weight"}
    name_of = {**core, **_MODEL_TENSORS}
    for key, value in model.params.items():
        if key == "layers":
            continue
        if key not in name_of:
            raise ValueError(f"no GGUF name for model tensor {key!r}")
        _write_param(w, name_of[key], value, ftype)
    for il, layer in enumerate(model.params.get("layers", [])):
        for key, value in layer.items():
            if value is None:
                continue
            if key not in _LAYER_TENSORS:
                raise ValueError(f"no GGUF name for layer tensor {key!r}")
            _write_param(w, f"blk.{il}.{_LAYER_TENSORS[key]}", value, ftype)
    w.write()


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(prog="llamacog-save-model")
    p.add_argument("-m", "--model", required=True, help="source GGUF")
    p.add_argument("-o", "--output", required=True, help="destination GGUF")
    p.add_argument("--ftype", choices=("f32", "f16"), default="f32")
    p.add_argument("--lora", action="append", default=[],
                   help="LoRA adapter GGUF to merge before saving")
    p.add_argument("--lora-scale", type=float, default=1.0)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ..models.loader import load_model

    model = load_model(args.model, mode="dequant", dtype=jnp.float32, fuse=False)
    if args.lora:
        from ..runtime.lora import load_lora, merge_lora

        for lp in args.lora:
            merge_lora(model.params, load_lora(lp), strength=args.lora_scale)
    save_model(model, args.output, ftype=args.ftype)
    print(f"saved {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
