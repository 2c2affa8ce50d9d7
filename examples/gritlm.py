"""GritLM-style dual mode (reference examples/gritlm/gritlm.cpp): the same
model serves instruction-prefixed embeddings (mean-pooled over the sample
part only) and plain text generation."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import get_model_path

import numpy as np

from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.engine import Engine

model = load_model(get_model_path())
engine = Engine(model.params, model.config, batch_size=1, max_seq=160)
tok = model.tokenizer


def gritlm_instruction(instruction: str) -> str:
    # gritlm.cpp: "<|user|>\n" + instruction + "\n<|embed|>\n" (or bare embed tag)
    return ("<|user|>\n" + instruction + "\n<|embed|>\n") if instruction else "<|embed|>\n"


def embed(text: str, instruction: str) -> np.ndarray:
    """Mean-pool ONLY over the sample tokens, not the instruction prefix
    (gritlm.cpp computes n_inst and skips those positions)."""
    prefix = tok.tokenize(gritlm_instruction(instruction), add_special=True)
    full = prefix + tok.tokenize(text, add_special=False)
    hs = engine.embed(full, pooling="none")  # [n, E] per-token hidden states
    v = hs[len(prefix):].mean(axis=0)
    engine.clear_row(0)
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


instruction = "Given a scientific paper title, retrieve the paper's abstract"
docs = [
    "A purely peer-to-peer version of electronic cash",
    "Attention is all you need: transformer architectures",
]
queries = ["Bitcoin: A Peer-to-Peer Electronic Cash System",
           "Generative Representational Instruction Tuning"]
d_emb = np.stack([embed(d, "") for d in docs])
for q in queries:
    qv = embed(q, instruction)
    sims = d_emb @ qv
    print(f"query: {q}")
    for d, s in sorted(zip(docs, sims), key=lambda t: -t[1]):
        print(f"  {s:+.3f}  {d}")

# generation mode with the same engine (gritlm.cpp second phase)
engine.reset()
ids = tok.tokenize("<|user|>\nPlease write me a poem\n<|assistant|>\n", add_special=True)
res = engine.generate_greedy(ids, 16)
print("generated:", model.vocab.detokenize(res.tokens))
