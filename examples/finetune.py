"""AdamW finetuning via the training hooks (reference examples/training/finetune)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import get_model_path

import numpy as np

import jax.numpy as jnp

from llamacog_tpu.models.loader import load_model
from llamacog_tpu.train import OptParams, opt_epoch, opt_init

model = load_model(get_model_path(dense=True), mode="dequant", dtype=jnp.float32)
tokens = np.tile(np.arange(2, 18), 16)
state = opt_init(model.params, model.config, OptParams(lr=1e-3), n_ctx=16)
for epoch in range(4):
    loss = opt_epoch(state, tokens, n_batch=4)
    print(f"epoch {epoch}: loss {loss:.4f}")
