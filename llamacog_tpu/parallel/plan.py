"""Static memory planner for PP x TP serving layouts.

The reference serves 70B-class models by splitting layers/rows across
GPUs or rpc hosts (--split-mode row, ggml-cuda.cu:768-892; rpc
ggml-rpc.cpp) and simply fails at load when a device is too small. Here
the plan is computed up front from plane shapes alone (no allocation):
per-stage-per-chip bytes = row-sharded planar weights + this stage's KV
at the target depth + activation working set, checked against the chip's
HBM. `required_mesh` returns the smallest (pp, tp) layout that fits.

Plane shape math mirrors utils/synthetic._PLANES (which mirrors
quant/planar.from_gguf) so the plan prices the ACTUAL runtime layout,
including its relayout overhead vs the GGUF wire format (f32 scale
planes, int8-predecoded Q6_K).
"""

from __future__ import annotations

from dataclasses import dataclass

_DTYPE_BYTES = {"uint8": 1, "int8": 1, "float32": 4, "int32": 4,
                "bfloat16": 2, "float16": 2}


def qt_nbytes(kind: str, n: int, k: int) -> int:
    """Planar bytes of a [n, k] QuantTensor of `kind` (runtime layout)."""
    import jax.numpy as jnp

    from ..utils.synthetic import _PLANES

    total = 0
    for name, div, dt in _PLANES[kind]:
        if name == "qsv":
            shape = (n // 2, k)
        elif name == "ddm_sbT":
            shape = (2 * (k // 256), n)
        else:
            shape = (n, k // div)
        total += shape[0] * shape[1] * jnp.dtype(dt).itemsize
    return total


@dataclass
class StagePlan:
    stage: int
    layers: int
    weight_bytes: int      # per chip (row-sharded over tp)
    kv_bytes: int          # per chip (head-sharded over tp)
    act_bytes: int         # per chip working set (replicated)

    @property
    def total(self) -> int:
        return self.weight_bytes + self.kv_bytes + self.act_bytes


def _layer_bytes(cfg, quant_mix: str, il: int) -> int:
    from ..utils.synthetic import _use_more_bits

    E, F = cfg.n_embd, cfg.n_ff
    kv = cfg.n_head_kv * cfg.head_dim_k
    if quant_mix == "q4_k_m":
        down_kind, v_kind, body = (
            "Q6_K" if _use_more_bits(il, cfg.n_layer) else "Q4_K",
            "Q6_K", "Q4_K")
    else:
        body = down_kind = v_kind = quant_mix.upper()
    return (
        qt_nbytes(body, cfg.n_head * cfg.head_dim_k + kv, E)   # q+k fused
        + qt_nbytes(v_kind, kv, E)                             # v
        + qt_nbytes(body, E, cfg.n_head * cfg.head_dim_v)      # wo
        + qt_nbytes(body, 2 * F, E)                            # gate+up fused
        + qt_nbytes(down_kind, E, F)                           # down
        + 2 * E * 4                                            # norms f32
    )


def plan_stages(cfg, pp: int, tp: int, max_seq: int, batch: int = 1,
                quant_mix: str = "q4_k_m", kv_kind: str = "bf16",
                chunk: int = 2048) -> list[StagePlan]:
    """Per-stage-per-chip byte plan for a pp-stage x tp-chip layout."""
    kv_elt = {"bf16": 2.0, "f16": 2.0, "q8_0": 1.125, "q4_0": 0.625,
              "q4_1": 0.75, "q5_0": 0.75, "q5_1": 0.875}[kv_kind]
    # flat-plane padding: group planes [S, Hkv*G] f32 pad Hkv*G -> next
    # multiple of 128 lanes (kv_cache.QuantKVCache docstring)
    hg = cfg.n_head_kv * max(1, cfg.head_dim_k // 32)
    if kv_kind not in ("bf16", "f16") and hg % 128:
        pad = (-(-hg // 128) * 128) / hg
        kv_elt = (kv_elt - 0.125) + 0.125 * pad
    per_kv_head = cfg.head_dim_k + cfg.head_dim_v
    layers = [cfg.n_layer // pp + (1 if s < cfg.n_layer % pp else 0)
              for s in range(pp)]
    E = cfg.n_embd
    plans = []
    il0 = 0
    for s in range(pp):
        w = sum(_layer_bytes(cfg, quant_mix, il0 + i) for i in range(layers[s]))
        w = w // tp  # row-sharded over the stage's tp chips
        if s == 0:
            w += qt_nbytes("Q4_K" if quant_mix == "q4_k_m" else
                           quant_mix.upper(), cfg.n_vocab, E)  # embd (repl.)
        if s == pp - 1:
            w += qt_nbytes("Q6_K" if quant_mix == "q4_k_m" else
                           quant_mix.upper(), cfg.n_vocab, E) // tp  # head
        kv_b = int(layers[s] * batch * max_seq
                   * (cfg.n_head_kv // max(1, min(tp, cfg.n_head_kv)))
                   * per_kv_head * kv_elt)
        # activations: chunked-prefill residual + qkv/ffn temps (f32-ish
        # worst case x4 buffers) + logits on the last stage
        act = batch * chunk * E * 4 * 4
        if s == pp - 1:
            act += batch * chunk * cfg.n_vocab * 4
        plans.append(StagePlan(s, layers[s], int(w), kv_b, int(act)))
        il0 += layers[s]
    return plans


def fits(cfg, pp: int, tp: int, max_seq: int, hbm_bytes: int = 16 << 30,
         headroom: float = 0.9, **kw) -> bool:
    """True when every stage's per-chip total fits `headroom` of HBM."""
    return all(p.total <= hbm_bytes * headroom
               for p in plan_stages(cfg, pp, tp, max_seq, **kw))


def required_mesh(cfg, max_seq: int, n_chips_options=((2, 4), (4, 2), (4, 4), (8, 2)),
                  hbm_bytes: int = 16 << 30, **kw) -> tuple[int, int] | None:
    """Smallest (pp, tp) layout from the candidates that fits; None if none
    does (the caller should fail the load like the reference does)."""
    for pp, tp in sorted(n_chips_options, key=lambda x: x[0] * x[1]):
        if fits(cfg, pp, tp, max_seq, hbm_bytes=hbm_bytes, **kw):
            return (pp, tp)
    return None
