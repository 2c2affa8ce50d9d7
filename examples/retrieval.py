"""Chunked document retrieval (reference examples/retrieval/retrieval.cpp):
split context files into chunks, embed each, then answer interactive-style
queries by cosine top-k over the chunk embeddings."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import get_model_path

import numpy as np

from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.engine import Engine

CORPUS = """The TPU's MXU is a systolic array for matrix multiplies.
HBM bandwidth is the usual bottleneck for decode.
Cats are small domesticated carnivores.
The cat purred on the windowsill in the afternoon sun.
XLA compiles traced JAX programs into fused TPU executables.
Dogs bark; cats meow."""

# --chunk-separator splitting (retrieval.cpp chunks on a separator token)
chunks = [c.strip() for c in CORPUS.split("\n") if c.strip()]

model = load_model(get_model_path())
engine = Engine(model.params, model.config, batch_size=1, max_seq=128)


def embed(text: str) -> np.ndarray:
    ids = model.tokenizer.tokenize(text, add_special=True)
    v = engine.embed(ids, pooling="mean")
    engine.clear_row(0)
    return v / np.linalg.norm(v)


emb = np.stack([embed(c) for c in chunks])
for query in ("what limits decode speed?", "tell me about cats"):
    q = embed(query)
    sims = emb @ q
    order = np.argsort(-sims)[:3]
    print(f"query: {query}")
    for i in order:
        print(f"  {sims[i]:+.3f}  {chunks[i]}")
