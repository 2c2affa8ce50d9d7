"""n-gram lookup decoding (reference examples/lookup + common/ngram-cache):
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
draft from prompt n-grams, verify with one batched target step."""
from _common import get_model_path

import numpy as np

from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.engine import Engine
from llamacog_tpu.runtime.ngram_cache import NgramCache

model = load_model(get_model_path())
engine = Engine(model.params, model.config, batch_size=1, max_seq=512)
ids = model.tokenizer.tokenize("the cat sat on the mat and the cat sat on", add_special=True)
cache = NgramCache()
cache.update(ids)
logits = engine.prefill(ids)
out = [int(np.argmax(logits))]
n_accept = n_drafted = 0
while len(out) < 24:
    draft = cache.draft(ids + out, n_draft=4)
    if draft:
        n_drafted += len(draft)
        block = [out[-1]] + draft
        logits_all = engine.prefill_logits(block)
        good = 0
        for j, d in enumerate(draft):
            if int(np.argmax(logits_all[j])) == d:
                good += 1
            else:
                break
        accepted = draft[:good] + [int(np.argmax(logits_all[good]))]
        # rewind cache to drop the unaccepted tail
        engine.seq_len[0] -= len(block) - (good + 1)
        out.extend(accepted)
        n_accept += good
        cache.update(ids + out)
    else:
        logits = engine.decode_one(np.array([out[-1]]))
        out.append(int(np.argmax(logits[0])))
print(model.vocab.detokenize(out))
print(f"accepted {n_accept}/{n_drafted} drafted tokens")
