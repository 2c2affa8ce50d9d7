"""On-device speculative loop: greedy-exactness and acceptance accounting.

The acceptance rule keeps only tokens the target itself would pick, so
OnDeviceSpeculative.generate_greedy must emit exactly the same tokens as
Engine.decode_greedy_tokens — for ANY draft model. With the draft sharing
the target's weights, every draft must be accepted (rate 1.0)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy compiles / reference-oracle runs: core profile skips (-m 'not slow')


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    import jax.numpy as jnp

    from llamacog_tpu.gguf import GGMLType
    from llamacog_tpu.models.loader import load_model
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    path = tmp_path_factory.mktemp("spec") / "tiny.gguf"
    make_tiny_llama_gguf(path, quant_type=GGMLType.Q4_0, n_layer=4)
    return load_model(str(path), mode="quantized", dtype=jnp.float32)


def _greedy_ref(model, prompt, n):
    import jax.numpy as jnp

    from llamacog_tpu.runtime.engine import Engine

    eng = Engine(model.params, model.config, batch_size=1, max_seq=256,
                 dtype=jnp.float32)
    logits = eng.prefill(prompt)
    first = int(np.argmax(logits))
    toks = eng.decode_greedy_tokens(np.array([first]), n)
    return first, toks[0]


def _spec(model, prompt, n, draft_params, draft_cfg, k):
    import jax.numpy as jnp

    from llamacog_tpu.runtime.engine import Engine
    from llamacog_tpu.runtime.speculative import OnDeviceSpeculative

    tgt = Engine(model.params, model.config, batch_size=1, max_seq=256,
                 dtype=jnp.float32)
    dft = Engine(draft_params, draft_cfg, batch_size=1, max_seq=256,
                 dtype=jnp.float32)
    logits = tgt.prefill(prompt)
    dft.prefill(prompt)
    first = int(np.argmax(logits))
    spec = OnDeviceSpeculative(tgt, dft, k=k)
    toks, stats = spec.generate_greedy(first, n)
    return first, toks, stats, tgt


def test_same_weights_draft_is_greedy_exact_and_fully_accepted(tiny):
    prompt = list(range(2, 18))
    n = 24
    f_ref, ref = _greedy_ref(tiny, prompt, n)
    f_sp, toks, stats, tgt = _spec(tiny, prompt, n, tiny.params,
                                   tiny.config, k=4)
    assert f_ref == f_sp
    np.testing.assert_array_equal(toks, ref)
    assert stats["accept_rate"] == 1.0
    # seq_len advanced to cover prompt + first + emitted (may overshoot by
    # up to one round's k, never more)
    assert len(prompt) + 1 + n <= int(tgt.seq_len[0]) <= len(prompt) + 1 + n + 4


def test_truncated_draft_is_greedy_exact(tiny):
    from dataclasses import replace

    from llamacog_tpu.runtime.speculative import truncated_draft_params

    prompt = list(range(2, 14))
    n = 20
    _, ref = _greedy_ref(tiny, prompt, n)
    d_params = truncated_draft_params(tiny.params, 2)
    d_cfg = replace(tiny.config, n_layer=2)
    _, toks, stats, _ = _spec(tiny, prompt, n, d_params, d_cfg, k=3)
    np.testing.assert_array_equal(toks, ref)
    assert 0.0 <= stats["accept_rate"] <= 1.0
    assert stats["rounds"] >= 1


def test_k1_and_larger_k_agree(tiny):
    prompt = list(range(3, 11))
    n = 12
    _, ref = _greedy_ref(tiny, prompt, n)
    for k in (1, 6):
        _, toks, _, _ = _spec(tiny, prompt, n, tiny.params, tiny.config, k=k)
        np.testing.assert_array_equal(toks, ref)
