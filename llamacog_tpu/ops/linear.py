"""Quantized linear layers.

`qmatmul(x, w)` computes x @ W^T for W either a dense array [N, K] or a
QuantTensor. Backend selection:

  * "xla": dequantize with the jnp decoder and let XLA fuse (baseline path;
    correct everywhere, good for prefill where dequant amortizes).
  * "pallas": fused dequant-matmul TPU kernels (ops/pallas/).

This mirrors the reference's mmq/mmvq split (ggml-cuda/mmq.cu, mmvq.cu):
kernels choose a matvec-shaped or tile-GEMM-shaped strategy by batch size.
"""

from __future__ import annotations

import os
from typing import Any

import jax.numpy as jnp

from ..quant.planar import QuantTensor, decode

_BACKEND = os.environ.get("LLAMACOG_MATMUL_BACKEND", "auto")
_HOOK = None  # activation observer (imatrix collector); unjitted paths only


def set_backend(name: str) -> None:
    global _BACKEND
    assert name in ("auto", "xla", "pallas")
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def set_hook(hook) -> None:
    """Install an (weight, activations) observer — the analog of the
    reference's scheduler eval-callback (ggml-backend.h:282, used by
    tools/imatrix)."""
    global _HOOK
    _HOOK = hook


def get_hook():
    return _HOOK


def qmatmul(x: jnp.ndarray, w: Any, compute_dtype=None) -> jnp.ndarray:
    """x: [..., K] @ W[N, K]^T -> [..., N]. Compute dtype follows x."""
    if compute_dtype is None:
        compute_dtype = x.dtype
    if _HOOK is not None:
        _HOOK(w, x)
    if isinstance(w, QuantTensor):
        backend = _BACKEND
        if backend == "auto":
            import jax

            backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        if w.pspec is not None:
            # TP-sharded planes: the kernel must run per-shard under
            # shard_map (a plain pallas_call would force an all-gather);
            # un-shardable layouts/kinds fall through to the XLA decode
            # path, which partitions correctly under SPMD
            from ..parallel.pallas_shard import sharded_qmm
            from ..parallel.sharding import get_active_mesh

            mesh = get_active_mesh()
            if mesh is not None and backend == "pallas":
                out = sharded_qmm(x, w, mesh)
                if out is not None:
                    return out.astype(x.dtype)
        elif backend == "pallas":
            from .pallas.dispatch import pallas_qmatmul, supports

            if supports(w.kind):
                return pallas_qmatmul(x, w)
        wd = decode(w, dtype=compute_dtype)
    else:
        wd = w.astype(compute_dtype) if w.dtype != compute_dtype else w
    return jnp.matmul(
        x.astype(compute_dtype), wd.T, preferred_element_type=jnp.float32
    ).astype(x.dtype)


def qmatmul_multi(x: jnp.ndarray, ws) -> list | None:
    """Fused multi-weight qmatmul: ONE Pallas launch for several weights
    sharing the activation (ops/pallas/qmm.qmm_multi), mixed kinds OK.
    Returns None when any weight can't ride the fused kernel (caller falls
    back to per-weight qmatmul). The role of one CUDA stream batching the
    q/k/v matvecs: fewer launches + one x round-trip per group."""
    if os.environ.get("LLAMACOG_QMM_MULTI", "1") != "1":
        return None  # measurement toggle: per-weight launches (PERF.md r4)
    backend = _BACKEND
    if backend == "auto":
        import jax

        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend != "pallas":
        return None
    from .pallas.qmm import supports
    if not all(isinstance(w, QuantTensor) and w.pspec is None
               and supports(w.kind) and w.shape[-1] == x.shape[-1]
               for w in ws):
        return None
    import numpy as _np
    B = int(_np.prod(x.shape[:-1])) if x.ndim > 1 else 1
    from ..quant.mmq import MMQ_MIN_B
    if B >= MMQ_MIN_B and all("qi8" in w.planes for w in ws):
        # mmq planes attached (quant/mmq.py) and batch above the int8
        # crossover: per-weight qmm rides the int8 prefill kernel instead
        return None
    if B * x.shape[-1] * 2 > 12 * 1024 * 1024:
        # the fused launch keeps each tensor's FULL [B, K] activation block
        # resident (no row-tiling path); long-prefill chunks blow VMEM
        # (measured: 4096-token chunk = 2x32MB single-buffered x windows).
        # Per-weight qmm row-tiles instead.
        return None
    if _HOOK is not None:  # after the checks: the fallback path re-fires it
        for w in ws:
            _HOOK(w, x)
    import jax

    from .pallas.qmm import qmm_multi

    outs = qmm_multi(x, ws, interpret=jax.default_backend() != "tpu")
    return [o.astype(x.dtype) for o in outs]
