"""State snapshot determinism (reference examples/save-load-state): decode,
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
save, decode more; restore and re-decode -> identical continuation."""
import tempfile

from _common import get_model_path

import numpy as np

from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.engine import Engine
from llamacog_tpu.runtime.state import load_row_state, save_row_state

model = load_model(get_model_path())
engine = Engine(model.params, model.config, batch_size=1, max_seq=256)
ids = model.tokenizer.tokenize("The quick brown fox", add_special=True)
logits = engine.prefill(ids)
first = int(np.argmax(logits))
path = tempfile.mktemp(suffix=".state")
save_row_state(engine, path, tokens=ids)
cont_a = engine.generate_greedy([first], 8).tokens
load_row_state(engine, path)
cont_b = engine.generate_greedy([first], 8).tokens
print("run A:", cont_a)
print("run B:", cont_b)
assert cont_a == cont_b, "state restore must be deterministic"
print("state restore deterministic ✓")
