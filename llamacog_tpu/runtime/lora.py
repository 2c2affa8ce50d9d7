"""LoRA adapters + control vectors (reference: src/llama-adapter.cpp).

LoRA GGUFs carry `adapter.type = "lora"`, `adapter.lora.alpha`, and tensor
pairs `<base>.lora_a` / `<base>.lora_b` (llama-adapter.cpp:219-237). At
matmul time the reference computes  out += scale * B(A x)  with
scale = adapter_scale * alpha / rank (llama-adapter.h:50-55,
llama-graph.cpp:410-431). Here adapters attach to the param pytree as
`<key>_lora` entries consumed by models/llama._linear — the low-rank path
rides inside the same jitted step, and scale is a traced array so changing
it does NOT recompile.

Fused weights (QKV / gate_up, models/loader.py) take combined adapters:
A's concatenated over the rank axis, B's placed block-wise into the fused
output rows.

Control vectors are GGUFs with `direction.<layer>` tensors added to the
residual stream per layer (llama_adapter_cvec::apply_to,
llama-adapter.cpp:21-28).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import jax.numpy as jnp


@dataclass
class LoraAdapter:
    alpha: float
    # base tensor name (e.g. "blk.0.attn_q.weight") -> (A [r, K], B [N, r])
    ab: dict[str, tuple[np.ndarray, np.ndarray]] = field(default_factory=dict)
    path: str = ""
    scale: float = 1.0  # adapter-level user scale (llama_set_adapter_lora)


def load_lora(path: str) -> LoraAdapter:
    from ..gguf import GGUFModelReader
    from ..quant.decode_np import dequantize_tensor

    r = GGUFModelReader(path)
    md = r.metadata
    if str(md.get("adapter.type", "")) != "lora":
        raise ValueError(f"{path}: not a lora adapter GGUF (adapter.type missing)")
    alpha = float(md.get("adapter.lora.alpha", 0.0))
    halves: dict[str, dict[str, np.ndarray]] = {}
    for name in r.tensors:
        rd, ti = r.tensors[name]
        data = dequantize_tensor(rd.tensor_bytes(name), ti.ggml_type, ti.shape)
        if name.endswith(".lora_a"):
            halves.setdefault(name[: -len(".lora_a")], {})["a"] = data
        elif name.endswith(".lora_b"):
            halves.setdefault(name[: -len(".lora_b")], {})["b"] = data
    r.close()
    ab = {}
    for base, d in halves.items():
        if "a" not in d or "b" not in d:
            raise ValueError(f"{path}: LoRA tensor {base} missing lora_a or lora_b")
        ab[base] = (d["a"], d["b"])
    return LoraAdapter(alpha=alpha, ab=ab, path=path)


# param key <-> GGUF base-name suffix (subset of loader._LAYER_TENSORS)
_KEY_TO_SUFFIX = {
    "attn_q": "attn_q.weight",
    "attn_k": "attn_k.weight",
    "attn_v": "attn_v.weight",
    "attn_qkv": "attn_qkv.weight",
    "attn_output": "attn_output.weight",
    "ffn_gate": "ffn_gate.weight",
    "ffn_up": "ffn_up.weight",
    "ffn_down": "ffn_down.weight",
}


def _lora_entry(a: np.ndarray, b: np.ndarray, alpha: float, scale: float) -> dict:
    # fold alpha/rank into B so the traced `scale` leaf is exactly the user
    # scale — set_lora_scale can then swap it uniformly without recompiling
    rank = a.shape[0]
    factor = (alpha / rank) if alpha else 1.0
    return {
        "a": jnp.asarray(a, jnp.float32),
        "b": jnp.asarray(np.asarray(b, np.float32) * factor, jnp.float32),
        "scale": jnp.asarray(scale, jnp.float32),
    }


def _combined(parts: list[tuple[np.ndarray, np.ndarray] | None],
              out_dims: list[int], alpha: float, scale: float) -> dict | None:
    """Combine per-part loras into one for a row-fused weight: concat A over
    rank, block-place B into the fused output rows."""
    if all(p is None for p in parts):
        return None
    ranks = [0 if p is None else p[0].shape[0] for p in parts]
    K = next(p[0].shape[1] for p in parts if p is not None)
    A = np.zeros((sum(ranks), K), np.float32)
    B = np.zeros((sum(out_dims), sum(ranks)), np.float32)
    r0, n0 = 0, 0
    # reference scale divides by each pair's own rank; fold it into B so one
    # combined entry keeps per-part semantics
    for p, n_out, r in zip(parts, out_dims, ranks):
        if p is not None:
            a, b = p
            A[r0 : r0 + r] = a
            factor = (alpha / r) if alpha else 1.0
            B[n0 : n0 + n_out, r0 : r0 + r] = b * factor
        r0 += r
        n0 += n_out
    return {
        "a": jnp.asarray(A, jnp.float32),
        "b": jnp.asarray(B, jnp.float32),
        "scale": jnp.asarray(scale, jnp.float32),
    }


def attach_lora(params: dict, adapter: LoraAdapter, scale: float | None = None) -> int:
    """Attach adapter weights to a loaded param pytree in place.

    Returns the number of weights that received a lora term."""
    from ..quant.planar import QuantTensor

    scale = adapter.scale if scale is None else scale
    n_attached = 0
    for il, layer in enumerate(params.get("layers", [])):
        pre = f"blk.{il}."
        for key in list(layer.keys()):
            if key.endswith("_lora") or key not in _KEY_TO_SUFFIX:
                continue
            pair = adapter.ab.get(pre + _KEY_TO_SUFFIX[key])
            if pair is not None:
                layer[key + "_lora"] = _lora_entry(*pair, adapter.alpha, scale)
                n_attached += 1
        # fused QKV: combine attn_q/k/v adapters
        if "attn_qkv" in layer and (pre + "attn_qkv.weight") not in adapter.ab:
            w = layer["attn_qkv"]
            n_total = int(np.prod(w.shape[:-1])) if isinstance(w, QuantTensor) else w.shape[0]
            parts = [adapter.ab.get(pre + f"attn_{t}.weight") for t in "qkv"]
            if any(p is not None for p in parts):
                n_q = next(p[1].shape[0] for p in parts if p is not None)
                # infer K/V rows from whichever adapters exist; assume GQA
                # layout [Nq; Nkv; Nkv]
                n_kv = (n_total - (parts[0][1].shape[0] if parts[0] else 0)) // 2 \
                    if parts[0] else None
                if parts[0] is None:
                    n_kv = next(p[1].shape[0] for p in parts[1:] if p is not None)
                    n_q = n_total - 2 * n_kv
                entry = _combined(parts, [n_q, n_kv, n_kv], adapter.alpha, scale)
                if entry is not None:
                    layer["attn_qkv_lora"] = entry
                    n_attached += 1
        # fused gate_up
        if "ffn_gate_up" in layer:
            parts = [
                adapter.ab.get(pre + "ffn_gate.weight"),
                adapter.ab.get(pre + "ffn_up.weight"),
            ]
            if any(p is not None for p in parts):
                w = layer["ffn_gate_up"]
                n_total = int(np.prod(w.shape[:-1])) if isinstance(w, QuantTensor) else w.shape[0]
                half = n_total // 2
                entry = _combined(parts, [half, half], adapter.alpha, scale)
                if entry is not None:
                    layer["ffn_gate_up_lora"] = entry
                    n_attached += 1
    # model-level tensors
    for key, name in (("output", "output.weight"), ("tok_embd", "token_embd.weight")):
        pair = adapter.ab.get(name)
        if pair is not None and key in params:
            params[key + "_lora"] = _lora_entry(*pair, adapter.alpha, scale)
            n_attached += 1
    return n_attached


def detach_lora(params: dict) -> None:
    for layer in params.get("layers", []):
        for key in [k for k in layer if k.endswith("_lora")]:
            del layer[key]
    for key in [k for k in params if isinstance(k, str) and k.endswith("_lora")]:
        del params[key]


def set_lora_scale(params: dict, adapter: LoraAdapter, scale: float) -> None:
    """Update the traced scale leaf in place (no recompilation — alpha/rank
    was folded into B at attach time, so `scale` is purely the user scale)."""
    adapter.scale = scale
    s = jnp.asarray(scale, jnp.float32)
    for layer in params.get("layers", []):
        for key in [k for k in layer if k.endswith("_lora")]:
            layer[key] = {**layer[key], "scale": s}
    for key in [k for k in params if isinstance(k, str) and k.endswith("_lora")]:
        params[key] = {**params[key], "scale": s}


def merge_lora(params: dict, adapter: LoraAdapter, scale: float = 1.0) -> int:
    """export-lora equivalent: fold B·A into dense weights (dense mode only)."""
    from ..quant.planar import QuantTensor

    merged = 0
    for il, layer in enumerate(params.get("layers", [])):
        pre = f"blk.{il}."
        for key, suffix in _KEY_TO_SUFFIX.items():
            pair = adapter.ab.get(pre + suffix)
            if pair is None or key not in layer:
                continue
            w = layer[key]
            if isinstance(w, QuantTensor):
                raise ValueError(
                    "merge_lora requires dense weights (load with mode='dequant')"
                )
            a, b = pair
            rank = a.shape[0]
            s = scale * (adapter.alpha / rank if adapter.alpha else 1.0)
            layer[key] = w + jnp.asarray(s * (b @ a), w.dtype)
            merged += 1
    return merged


# ---------------------------------------------------------------------------
# control vectors (llama_adapter_cvec; file format of common_control_vector_load:
# GGUF with one f32 `direction.<il>` tensor per layer)
# ---------------------------------------------------------------------------

def load_control_vector(path: str) -> dict[int, np.ndarray]:
    from ..gguf import GGUFModelReader
    from ..quant.decode_np import dequantize_tensor

    r = GGUFModelReader(path)
    out = {}
    for name in r.tensors:
        if not name.startswith("direction."):
            continue
        il = int(name.split(".")[1])
        rd, ti = r.tensors[name]
        out[il] = dequantize_tensor(rd.tensor_bytes(name), ti.ggml_type, ti.shape)
    r.close()
    return out


def attach_control_vector(
    params: dict, directions: dict[int, np.ndarray], n_layer: int, n_embd: int,
    strength: float = 1.0, layer_start: int = 1, layer_end: int = -1,
) -> None:
    """Install `params["cvec"]` [n_layer, n_embd]; the forward pass adds row
    il to the residual stream after layer il (build_cvec)."""
    if layer_end < 0:
        layer_end = n_layer
    cv = np.zeros((n_layer, n_embd), np.float32)
    for il, vec in directions.items():
        if layer_start <= il < layer_end and 0 <= il < n_layer:
            cv[il] = strength * vec.reshape(-1)[:n_embd]
    params["cvec"] = jnp.asarray(cv)


def detach_control_vector(params: dict) -> None:
    params.pop("cvec", None)
