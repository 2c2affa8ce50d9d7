"""llamacog-quantize — re-quantize a GGUF model.

Implements the reference's streaming quantizer (src/llama-quant.cpp:522) with
its per-tensor type policy (llama_tensor_get_type :178-467): e.g. Q4_K_M
bumps attn_v / ffn_down to Q6_K in the first/last n/8 layers and every third
in between (use_more_bits), the output tensor to Q6_K, Q8_0 fallback when a
row size doesn't divide the superblock. Supports imatrix importance files
(tools/imatrix .dat format, SURVEY §8.4).
"""

from __future__ import annotations

import argparse
import json
import struct
import sys
import time

import numpy as np

from ..gguf import GGML_TYPE_TRAITS, GGMLType, GGUFModelReader, GGUFWriter, LlamaFtype
from ..quant import QUANT_FNS, dequantize_tensor, quantize_tensor

# ftype -> default (base) tensor type
FTYPE_BASE = {
    LlamaFtype.ALL_F32: GGMLType.F32,
    LlamaFtype.MOSTLY_F16: GGMLType.F16,
    LlamaFtype.MOSTLY_BF16: GGMLType.BF16,
    LlamaFtype.MOSTLY_Q4_0: GGMLType.Q4_0,
    LlamaFtype.MOSTLY_Q4_1: GGMLType.Q4_1,
    LlamaFtype.MOSTLY_Q5_0: GGMLType.Q5_0,
    LlamaFtype.MOSTLY_Q5_1: GGMLType.Q5_1,
    LlamaFtype.MOSTLY_Q8_0: GGMLType.Q8_0,
    LlamaFtype.MOSTLY_Q2_K: GGMLType.Q2_K,
    LlamaFtype.MOSTLY_Q2_K_S: GGMLType.Q2_K,
    LlamaFtype.MOSTLY_Q3_K_S: GGMLType.Q3_K,
    LlamaFtype.MOSTLY_Q3_K_M: GGMLType.Q3_K,
    LlamaFtype.MOSTLY_Q3_K_L: GGMLType.Q3_K,
    LlamaFtype.MOSTLY_Q4_K_S: GGMLType.Q4_K,
    LlamaFtype.MOSTLY_Q4_K_M: GGMLType.Q4_K,
    LlamaFtype.MOSTLY_Q5_K_S: GGMLType.Q5_K,
    LlamaFtype.MOSTLY_Q5_K_M: GGMLType.Q5_K,
    LlamaFtype.MOSTLY_Q6_K: GGMLType.Q6_K,
    LlamaFtype.MOSTLY_IQ4_NL: GGMLType.IQ4_NL,
    LlamaFtype.MOSTLY_IQ4_XS: GGMLType.IQ4_XS,
    LlamaFtype.MOSTLY_IQ2_XXS: GGMLType.IQ2_XXS,
    LlamaFtype.MOSTLY_IQ2_XS: GGMLType.IQ2_XS,
    LlamaFtype.MOSTLY_IQ2_S: GGMLType.IQ2_XS,  # llama-quant.cpp:593
    LlamaFtype.MOSTLY_IQ2_M: GGMLType.IQ2_S,
    LlamaFtype.MOSTLY_IQ3_XXS: GGMLType.IQ3_XXS,
    LlamaFtype.MOSTLY_IQ3_XS: GGMLType.IQ3_S,
    LlamaFtype.MOSTLY_IQ3_S: GGMLType.IQ3_S,
    LlamaFtype.MOSTLY_IQ3_M: GGMLType.IQ3_S,
    LlamaFtype.MOSTLY_IQ1_S: GGMLType.IQ1_S,
    LlamaFtype.MOSTLY_IQ1_M: GGMLType.IQ1_M,
    LlamaFtype.MOSTLY_TQ1_0: GGMLType.TQ1_0,
    LlamaFtype.MOSTLY_TQ2_0: GGMLType.TQ2_0,
}

FTYPE_NAMES = {
    "F32": LlamaFtype.ALL_F32, "F16": LlamaFtype.MOSTLY_F16, "BF16": LlamaFtype.MOSTLY_BF16,
    "Q4_0": LlamaFtype.MOSTLY_Q4_0, "Q4_1": LlamaFtype.MOSTLY_Q4_1,
    "Q5_0": LlamaFtype.MOSTLY_Q5_0, "Q5_1": LlamaFtype.MOSTLY_Q5_1,
    "Q8_0": LlamaFtype.MOSTLY_Q8_0,
    "Q2_K": LlamaFtype.MOSTLY_Q2_K, "Q2_K_S": LlamaFtype.MOSTLY_Q2_K_S,
    "Q3_K_S": LlamaFtype.MOSTLY_Q3_K_S, "Q3_K_M": LlamaFtype.MOSTLY_Q3_K_M,
    "Q3_K_L": LlamaFtype.MOSTLY_Q3_K_L,
    "Q4_K_S": LlamaFtype.MOSTLY_Q4_K_S, "Q4_K_M": LlamaFtype.MOSTLY_Q4_K_M,
    "Q5_K_S": LlamaFtype.MOSTLY_Q5_K_S, "Q5_K_M": LlamaFtype.MOSTLY_Q5_K_M,
    "Q6_K": LlamaFtype.MOSTLY_Q6_K,
    "IQ4_NL": LlamaFtype.MOSTLY_IQ4_NL, "IQ4_XS": LlamaFtype.MOSTLY_IQ4_XS,
    "IQ2_XXS": LlamaFtype.MOSTLY_IQ2_XXS, "IQ2_XS": LlamaFtype.MOSTLY_IQ2_XS,
    "IQ2_S": LlamaFtype.MOSTLY_IQ2_S, "IQ2_M": LlamaFtype.MOSTLY_IQ2_M,
    "IQ3_XXS": LlamaFtype.MOSTLY_IQ3_XXS, "IQ3_XS": LlamaFtype.MOSTLY_IQ3_XS,
    "IQ3_S": LlamaFtype.MOSTLY_IQ3_S, "IQ3_M": LlamaFtype.MOSTLY_IQ3_M,
    "IQ1_S": LlamaFtype.MOSTLY_IQ1_S, "IQ1_M": LlamaFtype.MOSTLY_IQ1_M,
    "TQ1_0": LlamaFtype.MOSTLY_TQ1_0, "TQ2_0": LlamaFtype.MOSTLY_TQ2_0,
}

# ftypes built on the 1-3 bpw codebook quants (llama-quant.cpp i-quant gates)
_LOWBIT_IQ = frozenset({
    LlamaFtype.MOSTLY_IQ2_XXS, LlamaFtype.MOSTLY_IQ2_XS, LlamaFtype.MOSTLY_IQ2_S,
    LlamaFtype.MOSTLY_IQ2_M, LlamaFtype.MOSTLY_IQ1_S, LlamaFtype.MOSTLY_IQ1_M,
})

F = LlamaFtype
T = GGMLType


def use_more_bits(i_layer: int, n_layers: int) -> bool:
    return (
        i_layer < n_layers // 8
        or i_layer >= 7 * n_layers // 8
        or (i_layer - n_layers // 8) % 3 == 2
    )


class QuantizeState:
    def __init__(self, n_layer: int, n_gqa: int, n_expert: int, has_output: bool,
                 has_imatrix: bool):
        self.n_layer = n_layer
        self.n_gqa = n_gqa
        self.n_expert = n_expert
        self.has_output = has_output
        self.has_imatrix = has_imatrix
        self.i_attn_v = 0
        self.i_ffn_down = 0


def tensor_get_type(qs: QuantizeState, base: GGMLType, name: str, shape, ftype: LlamaFtype
                    ) -> GGMLType:
    """Per-tensor type selection (llama-quant.cpp:178-467, llama-family subset)."""
    new_type = base
    nx = shape[-1]

    def layer_of(name: str) -> int:
        try:
            return int(name.split(".")[1])
        except (IndexError, ValueError):
            return 0

    if name == "output.weight" or (not qs.has_output and name == "token_embd.weight"):
        qk = GGML_TYPE_TRAITS[new_type].block_size
        if nx % qk != 0:
            new_type = T.Q8_0
        elif ftype in _LOWBIT_IQ or ftype == F.MOSTLY_IQ3_XXS:
            new_type = T.Q5_K
        elif new_type not in (T.Q8_0, T.F16, T.BF16, T.F32):
            new_type = T.Q6_K
    elif name == "token_embd.weight":
        if ftype in (F.MOSTLY_IQ2_XXS, F.MOSTLY_IQ2_XS, F.MOSTLY_IQ1_S, F.MOSTLY_IQ1_M):
            new_type = T.Q2_K
        elif ftype in (F.MOSTLY_IQ2_S, F.MOSTLY_IQ2_M, F.MOSTLY_IQ3_XXS):
            new_type = T.IQ3_S
        elif ftype in (F.MOSTLY_TQ1_0, F.MOSTLY_TQ2_0):
            new_type = T.Q4_K  # llama-quant.cpp:241
    elif ftype in _LOWBIT_IQ:
        # 1-2 bpw ftypes: dedicated bump rules (llama-quant.cpp:246-277)
        if "attn_v.weight" in name:
            if qs.n_gqa >= 4 or qs.n_expert >= 4:
                new_type = T.Q4_K
            else:
                new_type = T.IQ3_S if ftype in (F.MOSTLY_IQ2_S, F.MOSTLY_IQ2_M) else T.Q2_K
            qs.i_attn_v += 1
        elif qs.n_expert == 8 and "attn_k.weight" in name:
            new_type = T.Q4_K
        elif "ffn_down" in name:
            if qs.i_ffn_down < qs.n_layer // 8:
                new_type = T.IQ3_S if ftype in (F.MOSTLY_IQ2_S, F.MOSTLY_IQ2_M) else T.Q2_K
            qs.i_ffn_down += 1
        elif "attn_output.weight" in name:
            if qs.n_expert == 8:
                new_type = T.Q5_K
            elif ftype in (F.MOSTLY_IQ1_S, F.MOSTLY_IQ1_M):
                new_type = T.IQ2_XXS
            elif ftype in (F.MOSTLY_IQ2_S, F.MOSTLY_IQ2_M):
                new_type = T.IQ3_S
    elif "attn_v.weight" in name:
        if ftype == F.MOSTLY_Q2_K:
            new_type = T.Q4_K if qs.n_gqa >= 4 else T.Q3_K
        elif ftype == F.MOSTLY_Q2_K_S and qs.n_gqa >= 4:
            new_type = T.Q4_K
        elif ftype == F.MOSTLY_Q3_K_M:
            new_type = T.Q5_K if qs.i_attn_v < 2 else T.Q4_K
        elif ftype == F.MOSTLY_Q3_K_L:
            new_type = T.Q5_K
        elif ftype == F.MOSTLY_IQ3_XXS:
            new_type = (T.Q4_K if qs.n_gqa >= 4
                        else T.IQ3_XXS if qs.has_imatrix else T.IQ3_S)
        elif ftype in (F.MOSTLY_IQ3_XS, F.MOSTLY_IQ3_S) and qs.n_gqa >= 4:
            new_type = T.Q4_K
        elif ftype == F.MOSTLY_IQ3_M:
            new_type = T.Q4_K
        elif ftype in (F.MOSTLY_IQ4_NL, F.MOSTLY_IQ4_XS) and qs.n_gqa >= 4:
            new_type = T.Q5_K
        elif ftype in (F.MOSTLY_Q4_K_M, F.MOSTLY_Q5_K_M) and use_more_bits(
            qs.i_attn_v, qs.n_layer
        ):
            new_type = T.Q6_K
        elif ftype == F.MOSTLY_Q4_K_S and qs.i_attn_v < 4:
            new_type = T.Q5_K
        if qs.n_expert == 8:
            new_type = T.Q8_0
        qs.i_attn_v += 1
    elif "attn_k.weight" in name:
        if qs.n_expert == 8:
            new_type = T.Q8_0
        elif ftype == F.MOSTLY_IQ3_XS:
            new_type = T.IQ3_XXS
        elif ftype == F.MOSTLY_IQ3_XXS:
            new_type = T.IQ2_S
    elif "attn_q.weight" in name:
        if ftype == F.MOSTLY_IQ3_XS:
            new_type = T.IQ3_XXS
        elif ftype == F.MOSTLY_IQ3_XXS:
            new_type = T.IQ2_S
    elif "ffn_down" in name:
        i_layer, n_layer = (
            (layer_of(name), qs.n_layer) if qs.n_expert > 1 else (qs.i_ffn_down, qs.n_layer)
        )
        if ftype == F.MOSTLY_Q2_K:
            new_type = T.Q3_K
        elif ftype == F.MOSTLY_Q2_K_S:
            if i_layer < n_layer // 8:
                new_type = T.Q4_K
        elif ftype == F.MOSTLY_IQ3_XXS and not qs.has_imatrix:
            new_type = T.Q4_K if i_layer < n_layer // 8 else T.Q3_K
        elif ftype == F.MOSTLY_IQ3_M and (
            i_layer < n_layer // 8
            or (qs.n_expert == 8 and use_more_bits(i_layer, n_layer))
        ):
            new_type = T.Q4_K
        elif ftype == F.MOSTLY_Q3_K_M:
            new_type = (
                T.Q5_K if i_layer < n_layer // 16
                else T.Q4_K if use_more_bits(i_layer, n_layer) else T.Q4_K
            )
        elif ftype == F.MOSTLY_Q3_K_L:
            new_type = T.Q5_K
        elif ftype == F.MOSTLY_Q4_K_M:
            if use_more_bits(i_layer, n_layer):
                new_type = T.Q6_K
        elif (
            i_layer < n_layer // 8
            and ftype in (F.MOSTLY_IQ4_NL, F.MOSTLY_IQ4_XS)
            and not qs.has_imatrix
        ):
            new_type = T.Q5_K
        elif ftype == F.MOSTLY_Q5_K_M and use_more_bits(i_layer, n_layer):
            new_type = T.Q6_K
        elif ftype == F.MOSTLY_Q4_K_S and i_layer < n_layer // 8:
            new_type = T.Q5_K
        elif ftype in (F.MOSTLY_Q4_0, F.MOSTLY_Q5_0) and qs.has_imatrix and i_layer < n_layer // 8:
            new_type = T.Q4_1 if ftype == F.MOSTLY_Q4_0 else T.Q5_1
        qs.i_ffn_down += 1
    elif "attn_output.weight" in name:
        if qs.n_expert == 8:
            if ftype in (F.MOSTLY_Q2_K, F.MOSTLY_Q3_K_S, F.MOSTLY_Q3_K_M,
                         F.MOSTLY_IQ4_NL, F.MOSTLY_IQ4_XS, F.MOSTLY_Q4_K_S,
                         F.MOSTLY_Q4_K_M, F.MOSTLY_IQ3_XS, F.MOSTLY_IQ3_XXS,
                         F.MOSTLY_IQ3_S, F.MOSTLY_IQ3_M):
                new_type = T.Q5_K
        else:
            if ftype == F.MOSTLY_Q2_K:
                new_type = T.Q3_K
            elif ftype == F.MOSTLY_IQ3_XXS:
                new_type = T.IQ3_S
            elif ftype == F.MOSTLY_Q3_K_M:
                new_type = T.Q4_K
            elif ftype == F.MOSTLY_Q3_K_L:
                new_type = T.Q5_K
            elif ftype == F.MOSTLY_IQ3_M:
                new_type = T.Q4_K
    elif "attn_qkv.weight" in name:
        if ftype in (F.MOSTLY_Q3_K_M, F.MOSTLY_Q3_K_L, F.MOSTLY_IQ3_M):
            new_type = T.Q4_K
        elif ftype == F.MOSTLY_Q4_K_M:
            new_type = T.Q5_K
        elif ftype == F.MOSTLY_Q5_K_M:
            new_type = T.Q6_K
    # fall back when row size doesn't divide the block size
    qk = GGML_TYPE_TRAITS[new_type].block_size
    if nx % qk != 0:
        for fb in (T.Q4_0, T.Q5_0, T.Q8_0, T.F16):
            if nx % GGML_TYPE_TRAITS[fb].block_size == 0:
                new_type = fb
                break
        else:
            new_type = T.F16
    return new_type


def load_imatrix(path: str) -> dict[str, np.ndarray]:
    """Parse the reference imatrix .dat format (tools/imatrix/imatrix.cpp:262)."""
    data: dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        (n_entries,) = struct.unpack("<i", f.read(4))
        for _ in range(n_entries):
            (ln,) = struct.unpack("<i", f.read(4))
            name = f.read(ln).decode("utf-8")
            (ncall,) = struct.unpack("<i", f.read(4))
            (nval,) = struct.unpack("<i", f.read(4))
            vals = np.frombuffer(f.read(4 * nval), dtype="<f4").copy()
            if ncall > 0:
                vals = vals / ncall
            data[name] = vals
    return data


# tensors never quantized (llama-quant.cpp quantize gate)
_SKIP_SUFFIXES = ("_norm.weight", ".bias", "rope_freqs.weight", "exp_probs_b.bias")


def quantize_model(
    in_path: str,
    out_path: str,
    ftype_name: str,
    imatrix_path: str | None = None,
    output_type: str | None = None,
    token_embd_type: str | None = None,
    progress=None,
) -> dict:
    ftype = FTYPE_NAMES[ftype_name.upper()]
    base = FTYPE_BASE[ftype]
    if base not in QUANT_FNS and base not in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
        raise NotImplementedError(f"no encoder for {base.name}")
    reader = GGUFModelReader(in_path)
    md = dict(reader.metadata)
    arch = md.get("general.architecture", "llama")
    n_layer = int(md.get(f"{arch}.block_count", 0))
    n_head = int(md.get(f"{arch}.attention.head_count", 1))
    hkv = md.get(f"{arch}.attention.head_count_kv", n_head)
    try:
        n_head_kv = int(hkv)
    except TypeError:
        n_head_kv = int(hkv[0])
    n_expert = int(md.get(f"{arch}.expert_count", 0) or 0)
    imatrix = load_imatrix(imatrix_path) if imatrix_path else {}

    qs = QuantizeState(
        n_layer=n_layer,
        n_gqa=n_head // max(n_head_kv, 1),
        n_expert=n_expert,
        has_output="output.weight" in reader.tensors,
        has_imatrix=bool(imatrix),
    )

    w = GGUFWriter(out_path)
    for key, val in md.items():
        if key == "general.file_type":
            continue
        w.add(key, val)
    w.add("general.file_type", int(ftype))
    w.add("general.quantization_version", 2)

    stats = {"tensors": 0, "quantized": 0, "in_bytes": 0, "out_bytes": 0}
    names = reader.names()
    for idx, name in enumerate(names):
        ti = reader.tensor_info(name)
        raw = reader.tensor_bytes(name)
        stats["tensors"] += 1
        stats["in_bytes"] += ti.nbytes
        quantizable = (
            ti.ggml_type in (GGMLType.F32, GGMLType.F16, GGMLType.BF16)
            or ti.ggml_type in QUANT_FNS
        ) and not any(name.endswith(s) for s in _SKIP_SUFFIXES) and len(ti.shape) >= 2
        if not quantizable:
            w.add_tensor(name, bytes(raw), shape=ti.shape, ggml_type=ti.ggml_type)
            stats["out_bytes"] += ti.nbytes
            continue
        new_type = tensor_get_type(qs, base, name, ti.shape, ftype)
        if name == "output.weight" and output_type:
            new_type = GGMLType[output_type.upper()]
        if name == "token_embd.weight" and token_embd_type:
            new_type = GGMLType[token_embd_type.upper()]
        if new_type == ti.ggml_type:
            w.add_tensor(name, bytes(raw), shape=ti.shape, ggml_type=ti.ggml_type)
            stats["out_bytes"] += ti.nbytes
            continue
        f32 = dequantize_tensor(raw, ti.ggml_type, ti.shape)
        qw = imatrix.get(name)
        if (qw is not None and len(ti.shape) == 3
                and qw.size == ti.shape[0] * ti.shape[-1]):
            # stacked experts with a per-expert imatrix (n_exp*K vals, the
            # reference MUL_MAT_ID layout): quantize each expert with its
            # own importance row (llama-quant.cpp expert handling)
            n_exp = ti.shape[0]
            qwe = qw.reshape(n_exp, ti.shape[-1])
            f3 = f32.reshape(n_exp, -1, ti.shape[-1])
            qdata = np.concatenate([
                quantize_tensor(f3[e], new_type, quant_weights=qwe[e]).reshape(-1)
                for e in range(n_exp)
            ])
        else:
            if qw is not None and qw.size != ti.shape[-1]:
                qw = None  # stale imatrix entry for a reshaped tensor
            qdata = quantize_tensor(f32, new_type, quant_weights=qw)
        w.add_tensor(name, qdata.tobytes(), shape=ti.shape, ggml_type=new_type)
        stats["quantized"] += 1
        stats["out_bytes"] += qdata.nbytes
        if progress:
            progress(idx + 1, len(names), name, ti.ggml_type.name, new_type.name)
    w.write()
    reader.close()
    return stats


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="llamacog-quantize")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("ftype", help="e.g. Q4_K_M, Q8_0, Q4_0, IQ4_XS")
    p.add_argument("--imatrix", help="importance matrix .dat file")
    p.add_argument("--output-tensor-type")
    p.add_argument("--token-embedding-type")
    args = p.parse_args(argv)

    t0 = time.time()

    def progress(i, n, name, old, new):
        print(f"[{i:4d}/{n}] {name}: {old} -> {new}", file=sys.stderr)

    stats = quantize_model(
        args.input, args.output, args.ftype, imatrix_path=args.imatrix,
        output_type=args.output_tensor_type, token_embd_type=args.token_embedding_type,
        progress=progress,
    )
    stats["seconds"] = round(time.time() - t0, 2)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
