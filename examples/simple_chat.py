"""Minimal multi-turn chat loop (reference examples/simple-chat/simple-chat.cpp):
apply the model's chat template per turn, generate greedily, keep the KV
cache across turns (only the new turn's tokens are prefilled)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import get_model_path

import numpy as np

from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.chat import apply_builtin_template, detect_template
from llamacog_tpu.runtime.engine import Engine

model = load_model(get_model_path())
engine = Engine(model.params, model.config, batch_size=1, max_seq=256)
tok = model.tokenizer
tmpl = detect_template(model.config.metadata.get("tokenizer.chat_template", "")) or "llama2"

messages: list[dict] = []
n_cached = 0  # tokens already in the KV cache (simple-chat prev_len)
# interactive when run with "-", scripted turns otherwise
turns = sys.stdin if "-" in sys.argv[1:] else ["hello there", "what can you do?"]
for user_text in (l.strip() for l in turns):
    if not user_text:
        continue
    messages.append({"role": "user", "content": user_text})
    prompt = apply_builtin_template(tmpl, messages, add_assistant=True)
    ids = tok.tokenize(prompt, add_special=True)
    new_ids = ids[n_cached:]  # incremental: only feed the delta
    res = engine.generate_greedy(new_ids, 24, eog_ids=tuple(tok.eog_ids)
                                 if hasattr(tok, "eog_ids") else ())
    reply = model.vocab.detokenize(res.tokens)
    print(f"> {user_text}\n{reply}\n")
    messages.append({"role": "assistant", "content": reply})
    n_cached = len(ids) + len(res.tokens)
