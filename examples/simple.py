"""Minimal API usage (reference examples/simple): load, tokenize, greedy decode."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import get_model_path

import jax.numpy as jnp

from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.engine import Engine

model = load_model(get_model_path())
prompt = "Hello my name is"
ids = model.tokenizer.tokenize(prompt, add_special=True)
engine = Engine(model.params, model.config, batch_size=1, max_seq=256)
result = engine.generate_greedy(ids, 32, eog_ids={model.vocab.eos_id})
print(prompt + model.vocab.detokenize(result.tokens))
