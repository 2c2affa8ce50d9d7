"""Activation observer hook (reference examples/eval-callback): watch every
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
matmul's inputs during a forward pass — the imatrix collector uses this."""
from _common import get_model_path

import numpy as np

import jax.numpy as jnp

from llamacog_tpu.models.loader import load_model
from llamacog_tpu.ops import linear
from llamacog_tpu.runtime.engine import Engine

model = load_model(get_model_path(dense=True), mode="dequant", dtype=jnp.float32)
seen = []
linear.set_hook(lambda w, x: seen.append((getattr(w, "shape", None), x.shape)))
try:
    engine = Engine(model.params, model.config, batch_size=1, max_seq=64,
                    dtype=jnp.float32)
    engine.prefill([1, 5, 9])
finally:
    linear.set_hook(None)
for wshape, xshape in seen[:8]:
    print(f"matmul: W{tuple(wshape)} @ x{tuple(xshape)}")
print(f"... {len(seen)} matmuls observed")
