"""Pipeline parallelism (layer-stage split + micro-batch pipelining) parity:
the staged engine must reproduce the single-device engine exactly.

Reference role: split-mode LAYER + the scheduler's n_copies micro-batch
pipelining (ggml-backend.cpp:620, llama-context.cpp:235-265). Runs on the
8-device virtual CPU mesh from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy compiles / reference-oracle runs: core profile skips (-m 'not slow')

from llamacog_tpu.models.config import ModelConfig, RopeConfig
from llamacog_tpu.parallel.pipeline import PipelineEngine, split_stages
from llamacog_tpu.runtime.engine import Engine


def _tiny_cfg(n_layer=4):
    return ModelConfig(
        arch="llama", n_vocab=96, n_ctx_train=256, n_embd=32, n_layer=n_layer,
        n_head=4, n_head_kv=2, n_ff=48, head_dim_k=8, head_dim_v=8,
        rope=RopeConfig(dim=8, interleaved=True),
    )


def _tiny_params(cfg, seed=0):
    rng = np.random.default_rng(seed)

    def r(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)

    layers = []
    for _ in range(cfg.n_layer):
        layers.append({
            "attn_norm": 1.0 + r(cfg.n_embd),
            "attn_q": r(cfg.n_head * cfg.head_dim_k, cfg.n_embd),
            "attn_k": r(cfg.n_head_kv * cfg.head_dim_k, cfg.n_embd),
            "attn_v": r(cfg.n_head_kv * cfg.head_dim_v, cfg.n_embd),
            "attn_output": r(cfg.n_embd, cfg.n_head * cfg.head_dim_v),
            "ffn_norm": 1.0 + r(cfg.n_embd),
            "ffn_gate": r(cfg.n_ff, cfg.n_embd),
            "ffn_up": r(cfg.n_ff, cfg.n_embd),
            "ffn_down": r(cfg.n_embd, cfg.n_ff),
        })
    return {
        "tok_embd": r(cfg.n_vocab, cfg.n_embd),
        "output_norm": 1.0 + r(cfg.n_embd),
        "output": r(cfg.n_vocab, cfg.n_embd),
        "layers": layers,
    }


def test_split_stages():
    assert split_stages(8, 2) == [(0, 4), (4, 8)]
    assert split_stages(7, 2) == [(0, 4), (4, 7)]
    assert split_stages(5, 4) == [(0, 2), (2, 3), (3, 4), (4, 5)]
    with pytest.raises(ValueError):
        split_stages(2, 3)


@pytest.mark.parametrize("n_stages,chunk", [(2, 8), (4, 4)])
def test_pipeline_matches_single_device(n_stages, chunk):
    cfg = _tiny_cfg(n_layer=4)
    params = _tiny_params(cfg, seed=1)
    prompt = [3, 17, 29, 5, 88, 41, 2, 9, 55, 60]

    ref = Engine(params, cfg, batch_size=1, max_seq=64, dtype=jnp.float32)
    ref_logits = ref.prefill(prompt)
    ref_toks = [int(np.argmax(ref_logits))]
    for _ in range(5):
        lg = ref.decode_one(np.array([ref_toks[-1]]))
        ref_toks.append(int(np.argmax(lg[0])))

    pipe = PipelineEngine(params, cfg, n_stages=n_stages, batch_size=1,
                          max_seq=64, dtype=jnp.float32, chunk=chunk)
    toks = pipe.generate_greedy(prompt, 6)
    assert toks == ref_toks

    # stage weights actually live on distinct devices (layer-split placement)
    devs = {next(iter(
        sp["layers"][0]["attn_q"].devices())) for sp in pipe.stage_params}
    assert len(devs) == n_stages


def test_pipeline_stage_count_matches_layers():
    cfg = _tiny_cfg(n_layer=5)
    params = _tiny_params(cfg, seed=2)
    pipe = PipelineEngine(params, cfg, n_stages=3, batch_size=1,
                          max_seq=32, dtype=jnp.float32, chunk=16)
    assert [hi - lo for lo, hi in pipe.bounds] == [2, 2, 1]
    logits = pipe.prefill([4, 8, 15, 16, 23, 42])
    assert logits.shape == (cfg.n_vocab,)
    assert np.isfinite(logits).all()
