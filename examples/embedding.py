"""Pooled embeddings + cosine retrieval (reference examples/embedding, retrieval)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import get_model_path

import numpy as np

from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.engine import Engine

model = load_model(get_model_path())
engine = Engine(model.params, model.config, batch_size=1, max_seq=128)
docs = ["the cat sat", "quantum field theory", "a cat on a mat"]
vecs = []
for d in docs:
    ids = model.tokenizer.tokenize(d, add_special=True)
    v = engine.embed(ids, pooling="mean")
    vecs.append(v / np.linalg.norm(v))
    engine.clear_row(0)
q = vecs[0]
sims = [float(q @ v) for v in vecs]
for d, s in zip(docs, sims):
    print(f"{s:+.3f}  {d}")
