"""Backend dispatch for quantized matmul kernels."""

from __future__ import annotations

import jax

from .qmm import qmm, supports  # noqa: F401


def pallas_qmatmul(x, qt):
    # interpret mode on CPU so tests/dev work without a TPU
    interpret = jax.default_backend() != "tpu"
    return qmm(x, qt, interpret=interpret).astype(x.dtype)
