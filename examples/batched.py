"""One prompt -> N parallel sampled continuations (reference examples/batched)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import get_model_path

import numpy as np

from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.engine import Engine
from llamacog_tpu.runtime.sampler import SamplerChain, SamplerParams

N_PARALLEL, N_NEW = 4, 24
model = load_model(get_model_path())
ids = model.tokenizer.tokenize("The meaning of life is", add_special=True)
engine = Engine(model.params, model.config, batch_size=N_PARALLEL, max_seq=256)
for row in range(N_PARALLEL):
    last = engine.prefill(ids, row=row)
chains = [SamplerChain(SamplerParams(temp=0.8, seed=i), model.config.n_vocab)
          for i in range(N_PARALLEL)]
toks = np.array([c.sample(last) for c in chains])
outs = [[int(t)] for t in toks]
for _ in range(N_NEW - 1):
    logits = engine.decode_one(toks)
    toks = np.array([c.sample(logits[i]) for i, c in enumerate(chains)])
    for i, t in enumerate(toks):
        outs[i].append(int(t))
for i, out in enumerate(outs):
    print(f"[{i}]", model.vocab.detokenize(out))
