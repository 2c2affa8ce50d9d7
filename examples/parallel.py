"""Multi-client continuous batching simulation (reference examples/parallel):
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
clients with different prompts/lengths share one decode batch."""
from _common import get_model_path

import numpy as np

from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.engine import Engine

model = load_model(get_model_path())
engine = Engine(model.params, model.config, batch_size=3, max_seq=256)
clients = [("Client A asks:", 10), ("B says:", 16), ("Long question from C:", 6)]
toks = np.zeros(3, dtype=np.int64)
remaining = []
for row, (prompt, n) in enumerate(clients):
    ids = model.tokenizer.tokenize(prompt, add_special=True)
    logits = engine.prefill(ids, row=row)
    toks[row] = int(np.argmax(logits))
    remaining.append(n)
outs = [[int(toks[i])] for i in range(3)]
while any(r > 0 for r in remaining):
    active = np.array([r > 0 for r in remaining])
    logits = engine.decode_one(toks, active=active)
    for i in range(3):
        if remaining[i] > 0:
            toks[i] = int(np.argmax(logits[i]))
            outs[i].append(int(toks[i]))
            remaining[i] -= 1
for (prompt, _), out in zip(clients, outs):
    print(prompt, "->", model.vocab.detokenize(out))
