"""Long-context retrieval shape (reference examples/passkey): plant a passkey
deep in filler context and check the model still decodes past it."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import get_model_path

import numpy as np

from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.engine import Engine

model = load_model(get_model_path())
engine = Engine(model.params, model.config, batch_size=1, max_seq=512)
filler = model.tokenizer.tokenize("The grass is green. " * 40, add_special=True)
passkey = model.tokenizer.tokenize("The passkey is 42417.", add_special=False)
tail = model.tokenizer.tokenize(" What is the passkey?", add_special=False)
ids = (filler[:200] + passkey + filler[:100] + tail)[:480]
logits = engine.prefill(ids)
out = engine.generate_greedy([int(np.argmax(logits))], 8)
print(f"context {len(ids)} tokens -> decoded {len(out.tokens)} tokens past it")
