"""Synthetic random-weight models built directly as planar QuantTensors.

Benchmarking the north-star config (Llama-3-8B Q4_K_M, BASELINE.md) needs
8B-scale weights; generating a real 4.9 GB GGUF through the numpy encoders
on one CPU core takes hours. Decode throughput depends only on plane shapes
and dtypes, never on values, so this builds the post-load planar form
(quant/planar.py) directly on device with random bytes.

Per-tensor quant policy mirrors llama_tensor_get_type for Q4_K_M
(/root/reference/src/llama-quant.cpp:178-467): attn_v and output are Q6_K,
ffn_down is Q6_K on the use_more_bits layers (i < n/8, i >= 7n/8,
(i - n/8) % 3 == 2), everything else Q4_K. Like a real mixed-type load,
q/k/v stay unfused (loader._fuse_rows only fuses same-kind tensors) while
ffn gate+up fuse.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig, RopeConfig
from ..quant.planar import QuantTensor

# plane shapes per kind for a logical [N, K] tensor (quant/planar.from_gguf)
_PLANES = {
    "Q4_K": (("qs", 2, jnp.uint8), ("scales", 32, jnp.float32),
             ("dmin_sb", 256, jnp.float32), ("m", 32, jnp.uint8)),
    # 2-D Q4_K tensors use the native-s4 layout (quant/planar.from_gguf)
    "Q4_KS4": (("qsv", 2, jnp.uint8), ("scales", 32, jnp.float32),
               ("dmin_sb", 256, jnp.float32), ("m", 32, jnp.uint8)),
    # compact-scales Q4_K (2-D default): 6-bit sc u8 + ONE merged
    # transposed d/dmin superblock plane ddm_sbT [2S, N]
    "Q4_KC": (("qs", 2, jnp.uint8), ("scq", 32, jnp.uint8),
              ("ddm_sbT", 128, jnp.float32), ("m", 32, jnp.uint8)),
    "Q5_K": (("qs", 2, jnp.uint8), ("qh", 8, jnp.uint8),
             ("scales", 32, jnp.float32),
             ("dmin_sb", 256, jnp.float32), ("m", 32, jnp.uint8)),
    "Q6_K": (("qs", 1, jnp.int8), ("d_sb", 256, jnp.float32), ("sc", 16, jnp.int8)),
    # packed 6-bit Q6_K (2-D default): 4-bit qs + 2-bit qh payload planes
    "Q6_KP": (("qs", 2, jnp.uint8), ("qh", 4, jnp.uint8),
              ("d_sb", 256, jnp.float32), ("sc", 16, jnp.int8)),
    "Q2_K": (("qs", 4, jnp.uint8), ("scales", 16, jnp.float32), ("mins", 16, jnp.float32)),
    "Q3_K": (("qs", 2, jnp.uint8), ("scales", 16, jnp.float32)),
    "Q4_0": (("qs", 2, jnp.uint8), ("d", 32, jnp.float32)),
    "Q4_1": (("qs", 2, jnp.uint8), ("d", 32, jnp.float32), ("m", 32, jnp.float32)),
    "Q5_0": (("qs", 2, jnp.uint8), ("qh", 8, jnp.uint8), ("d", 32, jnp.float32)),
    "Q5_1": (("qs", 2, jnp.uint8), ("qh", 8, jnp.uint8), ("d", 32, jnp.float32), ("m", 32, jnp.float32)),
    "Q8_0": (("qs", 1, jnp.int8), ("d", 32, jnp.float32)),
    "IQ4_XS": (("qs", 1, jnp.int8), ("scales", 32, jnp.float32)),
    "IQ4_NL": (("qs", 1, jnp.int8), ("d", 32, jnp.float32)),
    "IQ2_XXS": (("qs", 1, jnp.int8), ("scales", 32, jnp.float32)),
    "IQ2_XS": (("qs", 1, jnp.int8), ("scales", 16, jnp.float32)),
    "IQ2_S": (("qs", 1, jnp.int8), ("scales", 16, jnp.float32)),
    "IQ3_XXS": (("qs", 1, jnp.int8), ("scales", 32, jnp.float32)),
    "IQ3_S": (("qs", 1, jnp.int8), ("scales", 32, jnp.float32)),
    "IQ1_S": (("qs", 4, jnp.uint8), ("scales", 32, jnp.float32), ("mins", 32, jnp.float32)),
    "IQ1_M": (("qs", 4, jnp.uint8), ("scales", 8, jnp.float32), ("mins", 8, jnp.float32)),
}


def _rand_qt(key, kind: str, n: int, k: int, expert: bool = False) -> QuantTensor:
    import os as _os
    if (kind == "Q4_K" and not expert
            and _os.environ.get("LLAMACOG_Q4K_CSC") == "1"
            and _os.environ.get("LLAMACOG_Q4_S4") != "1"):
        # opt-in compact-scales layout (quant/planar.from_gguf Q4_KC):
        # streams 0.375 b/w of scale data instead of the f32 plane's 1.0,
        # but measured r5 the 8B decode kernels sit at the VPU/DMA
        # crossover and the [TN, G] recombine costs more than the bytes
        # save (gate_up in-model 108 -> 129 us; e2e 104.1 -> 101.9 t/s)
        kind = "Q4_KC"
    if (kind == "Q6_K" and not expert
            and _os.environ.get("LLAMACOG_Q6K_PACK") == "1"):
        # opt-in packed 6-bit payload (quant/planar.from_gguf Q6_KP):
        # 6.625 b/w streamed vs the int8 predecode's 8.625, but the 4+2
        # reassembly is VPU-bound (head 753 -> 909 us standalone; e2e
        # 104.1 -> 97.0 t/s) — int8 predecode stays the default
        kind = "Q6_KP"
    if (kind == "Q4_K" and not expert and n % 2 == 0
            and _os.environ.get("LLAMACOG_Q4_S4") == "1"):
        # opt-in native-s4 layout (in-kernel pltpu.bitcast of the
        # row-pair-packed qsv plane, quant/planar.from_gguf). Measured
        # r5: correct at every shape, but the re-tiled CLASSIC kernel
        # beats it (gate_up tn1024: 94 us classic vs 108 us s4 best —
        # scripts/exp_s4_ab.py, exp_tn_sweep.py), so classic stays the
        # default and s4 remains available for experimentation.
        kind = "Q4_KS4"
    planes = {}
    for i, (name, div, dt) in enumerate(_PLANES[kind]):
        sub = jax.random.fold_in(key, i)
        # qsv row-pair packs two weight rows per stored row: [N/2, K];
        # ddm_sbT is the merged transposed d/dmin plane [2S, N]
        if name == "qsv":
            shape = (n // 2, k)
        elif name == "ddm_sbT":
            shape = (2 * (k // 256), n)
        else:
            shape = (n, k // div)
        if name in ("dmin_sb", "d_sb") and not expert:
            # 2-D tensors store superblock planes transposed [S, N]
            # (quant/planar._sb_scale_plane: keeps the minor dim a
            # multiple of 128 so XLA assigns the default {1,0} layout)
            name, shape = name + "T", (k // div, n)
        if dt in (jnp.uint8, jnp.int8):
            hi = 127 if dt == jnp.int8 else 255
            planes[name] = jax.random.randint(sub, shape, 0, hi, dtype=jnp.int32).astype(dt)
        else:
            # small positive scales keep logits finite through 32 layers
            planes[name] = jax.random.uniform(sub, shape, jnp.float32, 1e-4, 1e-3)
    return QuantTensor(kind, (n, k), planes)


def _use_more_bits(i: int, n: int) -> bool:
    return i < n // 8 or i >= 7 * n // 8 or (i - n // 8) % 3 == 2


def llama3_8b_config() -> ModelConfig:
    return ModelConfig(
        arch="llama", n_vocab=128256, n_ctx_train=8192, n_embd=4096,
        n_layer=32, n_head=32, n_head_kv=8, n_ff=14336,
        head_dim_k=128, head_dim_v=128,
        rope=RopeConfig(dim=128, freq_base=500000.0),
    )


def llama3_70b_config() -> ModelConfig:
    """Llama-3-70B geometry (BASELINE config 5) — for the static memory
    planner and depth-scaled layout tests; full weights don't fit one
    chip."""
    return ModelConfig(
        arch="llama", n_vocab=128256, n_ctx_train=8192, n_embd=8192,
        n_layer=80, n_head=64, n_head_kv=8, n_ff=28672,
        head_dim_k=128, head_dim_v=128,
        rope=RopeConfig(dim=128, freq_base=500000.0),
    )


def mixtral_shaped_config(n_layer: int = 8) -> ModelConfig:
    """Mixtral-8x7B layer geometry (BASELINE config 4), depth-scaled so the
    experts fit one v5e's HBM (8x7B full is ~26 GB quantized)."""
    return ModelConfig(
        arch="llama", n_vocab=32000, n_ctx_train=8192, n_embd=4096,
        n_layer=n_layer, n_head=32, n_head_kv=8, n_ff=14336,
        head_dim_k=128, head_dim_v=128, n_expert=8, n_expert_used=2,
        expert_weights_norm=True, rope=RopeConfig(dim=128, freq_base=1e6),
    )


def make_synthetic_params(cfg: ModelConfig, seed: int = 0,
                          quant_mix: str = "q4_k_m") -> dict:
    """Random planar params for the generalized llama forward.

    quant_mix: "q4_k_m" (Q4_K/Q6_K per-tensor policy) or any format name
    in _PLANES (uniform body of that kind + Q6_K output; "iq4_xs" is
    BASELINE's "8B i-quants" config). Decode cost depends on plane bytes
    only, so the policy tails don't matter for throughput.

    The whole pytree is built inside one jit so a tunneled chip pays one
    dispatch round-trip, not one per plane."""
    return jax.jit(lambda s: _make_synthetic_params(cfg, s, quant_mix))(seed)


def _make_synthetic_params(cfg: ModelConfig, seed, quant_mix="q4_k_m") -> dict:
    key = jax.random.PRNGKey(seed)
    E, F = cfg.n_embd, cfg.n_ff
    kv = cfg.n_head_kv * cfg.head_dim_k
    iq = quant_mix != "q4_k_m"
    body = quant_mix.upper() if iq else "Q4_K"
    params: dict = {"layers": []}
    k0 = jax.random.fold_in(key, 10_000)
    params["tok_embd"] = _rand_qt(jax.random.fold_in(k0, 0), body, cfg.n_vocab, E)
    params["output"] = _rand_qt(jax.random.fold_in(k0, 1), "Q6_K", cfg.n_vocab, E)
    params["output_norm"] = jnp.ones((E,), jnp.float32)
    for il in range(cfg.n_layer):
        lk = jax.random.fold_in(key, il)
        if iq:
            down_kind = v_kind = body
        else:
            down_kind = "Q6_K" if _use_more_bits(il, cfg.n_layer) else "Q4_K"
            v_kind = "Q6_K"
        layer = {
            "attn_norm": jnp.ones((E,), jnp.float32),
            "ffn_norm": jnp.ones((E,), jnp.float32),
            # q+k fused (same kind), v separate Q6_K — what loader produces
            # for a real Q4_K_M checkpoint
            "attn_qk": _rand_qt(jax.random.fold_in(lk, 0), body,
                                cfg.n_head * cfg.head_dim_k + kv, E),
            "attn_v": _rand_qt(jax.random.fold_in(lk, 2), v_kind, kv, E),
            "attn_output": _rand_qt(jax.random.fold_in(lk, 3), body, E, cfg.n_head * cfg.head_dim_v),
        }
        if cfg.n_expert > 0:
            n_exp = cfg.n_expert
            layer["ffn_gate_inp"] = (
                jax.random.normal(jax.random.fold_in(lk, 6), (n_exp, E)) * 0.02
            ).astype(jnp.float32)
            gu = _rand_qt(jax.random.fold_in(lk, 7), body, n_exp * 2 * F, E,
                          expert=True)
            de = _rand_qt(jax.random.fold_in(lk, 9), down_kind, n_exp * E, F,
                          expert=True)
            gu.shape = (n_exp, 2 * F, E)
            de.shape = (n_exp, E, F)
            layer["ffn_gate_up_exps"] = gu
            layer["ffn_down_exps"] = de
        else:
            layer["ffn_gate_up"] = _rand_qt(jax.random.fold_in(lk, 4), body, 2 * F, E)
            layer["ffn_down"] = _rand_qt(jax.random.fold_in(lk, 5), down_kind, E, F)
        params["layers"].append(layer)
    return params
