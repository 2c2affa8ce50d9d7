"""int8-MXU prefill relayout — the TPU analog of the reference's mmq path.

The reference speeds up prefill GEMMs by quantizing activations to q8_1
and running integer dot products (ggml/src/ggml-cuda/mmq.cu,
ggml-cuda/quantize.cu: per-32 activation blocks matched to the weight
blocks, dp4a/int8 tensor cores). That block structure is CUDA-shaped: a
32-wide integer dot is a warp primitive there, but on a 128x128 systolic
array a 32-wide contraction runs the MXU at a fraction of peak — far
more than int8's 2x rate gain (v5e: 394 int8 TOPS vs 197 bf16 TFLOPS,
measured 2.04x in scripts/exp_i8_mxu.py).

So the TPU design re-expresses the weights once at load instead:

  * exact planar dequant (bit-identical to the decode the classic kernel
    performs) -> symmetric int8 with one scale per (row, MMQ_KB columns),
    stored as planes "qi8" int8 [N, K] (natural column order - no
    activation permute) and "ws8T" f32 [K/MMQ_KB, N] (transposed so the
    kernel combine is a [1, TN] lane-wide broadcast);
  * activations quantize per token: one max-abs scale per row, int8
    payload (half the bytes of the bf16 x block);
  * the kernel (ops/pallas/qmm_i8.py) runs K/MMQ_KB int8 x int8 -> int32
    MXU dots and folds the two scale vectors into the f32 accumulate.

Accuracy: the weight requant adds ~1% rms on top of the 4-6 bit
quantization already present; activations get per-token 8-bit treatment
(the reference's q8_1 activations are per-32 - finer-grained, but its
K-quant GEMMs also requantize activations; see tests/test_qmm_i8.py for
the measured logit agreement). Decode (B <= 8) never uses this path -
matvecs are HBM-bound and int8 planes stream MORE bytes than Q4_K.

Opt-in: LLAMACOG_MMQ=1 (Engine attaches planes at init; costs ~1.03
bytes/weight of extra HBM for the covered tensors). The dispatch
threshold MMQ_MIN_B=256 is the measured bf16-MXU/int8 crossover.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .planar import QuantTensor, decode

MMQ_KB = 512       # columns per weight scale block (scripts/exp_i8_mxu.py:
                   # the per-block combine hides fully under the MXU at 8
                   # blocks/4096 cols, so the finer grain is free)
MMQ_MIN_B = 256    # tokens: below this bf16 MXU time ~ int8 DMA time
MMQ_MAX_N = 32768  # skip vocab-sized tensors (prefill computes 1 row there)


@functools.partial(jax.jit, static_argnames=("gp",))
def _build(qt: QuantTensor, gp: int):
    """One fused dequant -> block-requant pass (jitted: the aux data
    (kind, shape) is static, so a model load compiles this once per
    distinct tensor geometry instead of running hundreds of eager ops
    per tensor over a tunneled device)."""
    N, K = int(np.prod(qt.shape[:-1])), qt.shape[-1]
    w = decode(qt, dtype=jnp.float32).reshape(N, K)
    wb = w.reshape(N, gp, MMQ_KB)
    s = jnp.max(jnp.abs(wb), axis=2) / 127.0
    s = jnp.where(s == 0, 1.0, s)
    qi = jnp.clip(jnp.round(wb / s[:, :, None]), -127, 127)
    return qi.astype(jnp.int8).reshape(N, K), s.T.astype(jnp.float32)


def build_mmq_planes(qt: QuantTensor) -> dict | None:
    """Exact dequant -> per-(row, MMQ_KB-col) symmetric int8 planes, or
    None when the tensor shape/kind can't ride the int8 kernel."""
    if len(qt.shape) != 2:
        return None
    N, K = int(np.prod(qt.shape[:-1])), qt.shape[-1]
    if K % MMQ_KB or K < MMQ_KB or not (256 <= N < MMQ_MAX_N) or N % 256:
        return None
    try:
        qi, wsT = _build(qt, K // MMQ_KB)
    except (NotImplementedError, KeyError):
        return None
    return {"qi8": qi, "ws8T": wsT}


def attach_mmq_planes(params):
    """Walk a params tree and attach mmq planes to every eligible 2-D
    QuantTensor in place (planes ride the pytree; classic decode paths
    ignore the extra keys). Returns the same tree."""
    n_done = 0

    def walk(node):
        nonlocal n_done
        if isinstance(node, QuantTensor):
            if node.pspec is None and "qi8" not in node.planes:
                extra = build_mmq_planes(node)
                if extra is not None:
                    node.planes.update(extra)
                    n_done += 1
            return
        if isinstance(node, dict):
            for v in node.values():
                walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(params)
    return params
