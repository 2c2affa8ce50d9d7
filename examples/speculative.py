"""Draft-model speculative decoding (reference examples/speculative-simple):
here draft == target on a tiny model, so everything is accepted."""
import os
import sys
sys.path.insert(0, os.path.dirname(__file__))
from _common import get_model_path

from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.engine import Engine
from llamacog_tpu.runtime.speculative import SpeculativeDecoder, SpeculativeParams

path = get_model_path()
model = load_model(path)
target = Engine(model.params, model.config, batch_size=1, max_seq=256)
draft = Engine(model.params, model.config, batch_size=1, max_seq=256)
dec = SpeculativeDecoder(target, draft, SpeculativeParams(n_draft=4, p_min=0.0))
ids = model.tokenizer.tokenize("Once upon a time", add_special=True)
out, stats = dec.generate(ids, 24)
print(model.vocab.detokenize(out))
print("accept rate:", f"{stats['accepted']}/{stats['drafted']}")
