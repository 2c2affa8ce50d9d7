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
# chars of the rendered template already in the KV cache (simple-chat.cpp
# prev_len): tracking a CHAR offset and tokenizing only the string delta is
# retokenization-safe — token counts of the reply can change when the next
# turn's template re-renders it, so a token-count offset would misalign
prev_len = 0
# interactive when run with "-", scripted turns otherwise
turns = sys.stdin if "-" in sys.argv[1:] else ["hello there", "what can you do?"]
for user_text in (l.strip() for l in turns):
    if not user_text:
        continue
    messages.append({"role": "user", "content": user_text})
    prompt = apply_builtin_template(tmpl, messages, add_assistant=True)
    new_ids = tok.tokenize(prompt[prev_len:], add_special=prev_len == 0)
    res = engine.generate_greedy(new_ids, 24, eog_ids=tuple(tok.eog_ids)
                                 if hasattr(tok, "eog_ids") else ())
    reply = model.vocab.detokenize(res.tokens)
    print(f"> {user_text}\n{reply}\n")
    messages.append({"role": "assistant", "content": reply})
    prev_len = len(apply_builtin_template(tmpl, messages, add_assistant=False))
