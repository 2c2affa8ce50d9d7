"""Lookahead decoding (reference examples/lookahead: n-gram Jacobi).

Each step verifies the best cached n-gram continuation AND advances a
Jacobi guess window of depth N in the same batched target call: la[i]
predicts block[i+1], so the window positions yield a refined trajectory
(fixed-point iteration) that is cached in an n-gram pool keyed by its
preceding token. Verified prefixes are accepted in blocks with KV rollback
past the rejected tail — same mechanism as runtime/speculative.py but the
"draft model" is the target's own past trajectories.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import get_model_path

import numpy as np

from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.engine import Engine

W, N = 4, 3  # pool depth per key, lookahead window
MAX_NEW = 24

model = load_model(get_model_path())
engine = Engine(model.params, model.config, batch_size=1, max_seq=512)
ids = model.tokenizer.tokenize("the quick brown fox jumps over the lazy",
                               add_special=True)
logits = engine.prefill(ids)
out = [int(np.argmax(logits))]

pool: dict[int, list[list[int]]] = {}  # token -> candidate continuations
window = [out[0]] * N  # Jacobi guess window (converges under iteration)
n_accept = n_drafted = 0

while len(out) < MAX_NEW:
    cur = out[-1]
    cands = pool.get(cur, [])
    draft = cands[-1] if cands else []
    block = [cur] + draft + window
    save = int(engine.seq_len[0])
    la = engine.prefill_logits(block)  # one call: verify draft + refine window
    n_drafted += len(draft)
    good = 0
    for j, d in enumerate(draft):
        if int(np.argmax(la[j])) == d:
            good += 1
        else:
            break
    out.extend(draft[:good])
    n_accept += good
    nxt = int(np.argmax(la[good]))
    out.append(nxt)
    engine.seq_len[0] = save + 1 + good  # KV rollback past rejected tail
    # Jacobi update: la[len(draft)+j] is the model's prediction at window
    # slot j given the current window prefix — one fixed-point sweep.
    window = [int(np.argmax(la[len(draft) + j])) for j in range(N)]
    pool.setdefault(nxt, []).append(list(window))
    pool[nxt] = pool[nxt][-W:]

text = b"".join(model.vocab.token_to_piece(t) for t in out)
print(text.decode("utf-8", errors="replace"))
print(f"[lookahead] drafted {n_drafted}, accepted {n_accept}")
