"""Sharded Engine (TP over a virtual 8-device CPU mesh) must match the
single-device engine bit-for-bit-ish (same math, XLA collectives)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy compiles / reference-oracle runs: core profile skips (-m 'not slow')

import jax

if len(jax.devices()) < 8:
    pytest.skip("needs 8 virtual devices (conftest sets host platform count)",
                allow_module_level=True)

import jax.numpy as jnp

from llamacog_tpu.models.loader import load_model
from llamacog_tpu.parallel.sharding import make_mesh
from llamacog_tpu.runtime.engine import Engine
from llamacog_tpu.utils.testing import make_tiny_llama_gguf


def test_sharded_engine_matches_single(tmp_path):
    path = make_tiny_llama_gguf(
        str(tmp_path / "t.gguf"), n_embd=64, n_head=8, n_head_kv=4, n_ff=128,
    )
    m = load_model(path, with_tokenizer=False, dtype=jnp.float32)
    ref_eng = Engine(m.params, m.config, batch_size=2, max_seq=64, dtype=jnp.float32)
    ref = ref_eng.prefill([1, 2, 3, 4])

    m2 = load_model(path, with_tokenizer=False, dtype=jnp.float32)
    mesh = make_mesh(2, 4)
    tp_eng = Engine(m2.params, m2.config, batch_size=2, max_seq=64,
                    dtype=jnp.float32, mesh=mesh)
    got = tp_eng.prefill([1, 2, 3, 4])
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)

    # decode path too
    r1 = ref_eng.decode_one(np.array([5, 5]))
    r2 = tp_eng.decode_one(np.array([5, 5]))
    np.testing.assert_allclose(r2, r1, atol=2e-4, rtol=1e-4)

    # on-device greedy loop under sharding
    t1 = ref_eng.decode_greedy_tokens(np.array([7, 7]), 4)
    t2 = tp_eng.decode_greedy_tokens(np.array([7, 7]), 4)
    np.testing.assert_array_equal(t1, t2)


def test_sharded_moe_engine(tmp_path):
    path = make_tiny_llama_gguf(
        str(tmp_path / "moe.gguf"), n_embd=64, n_head=8, n_head_kv=4, n_ff=128,
        n_expert=8, n_expert_used=2,
    )
    m = load_model(path, with_tokenizer=False, dtype=jnp.float32)
    ref = Engine(m.params, m.config, batch_size=1, max_seq=32,
                 dtype=jnp.float32).prefill([1, 2, 3])
    m2 = load_model(path, with_tokenizer=False, dtype=jnp.float32)
    eng = Engine(m2.params, m2.config, batch_size=1, max_seq=32,
                 dtype=jnp.float32, mesh=make_mesh(1, 8))
    np.testing.assert_allclose(eng.prefill([1, 2, 3]), ref, atol=2e-4, rtol=1e-4)


def test_sharded_server_e2e(tmp_path):
    """Server with a (1, 4) mesh: full HTTP round-trip over sharded compute."""
    import json as _json
    import threading
    import urllib.request

    from llamacog_tpu.server.server import serve

    path = make_tiny_llama_gguf(str(tmp_path / "srv.gguf"), n_embd=64, n_head=8,
                                n_head_kv=4, n_ff=128)
    model = load_model(path, dtype=jnp.float32)
    ctx, httpd = serve(model, port=0, n_slots=2, ctx_size=64, dtype=jnp.float32,
                       mesh=make_mesh(1, 4))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{httpd.server_address[1]}/completion",
            data=_json.dumps({"prompt": "ab", "n_predict": 4,
                              "ignore_eos": True}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            body = _json.loads(r.read())
        assert body["tokens_predicted"] == 4
    finally:
        ctx.stop()
        httpd.shutdown()


@pytest.mark.parametrize("quant", ["Q4_0", "Q8_0"])
def test_sharded_pallas_qmm_matches_single(tmp_path, quant):
    """With quantized weights and the kernel backend forced, the TP engine
    must run the qmm kernels inside shard_map (row/col layouts) and match
    the unsharded kernel engine."""
    from llamacog_tpu.gguf import GGMLType
    from llamacog_tpu.ops import linear
    from llamacog_tpu.quant.planar import QuantTensor

    path = make_tiny_llama_gguf(
        str(tmp_path / f"q_{quant}.gguf"), n_embd=64, n_head=8, n_head_kv=4,
        n_ff=128, quant_type=getattr(GGMLType, quant),
    )
    linear.set_backend("pallas")
    try:
        m = load_model(path, with_tokenizer=False, dtype=jnp.float32)
        ref_eng = Engine(m.params, m.config, batch_size=2, max_seq=64,
                         dtype=jnp.float32)
        ref = ref_eng.prefill([1, 2, 3, 4])
        m2 = load_model(path, with_tokenizer=False, dtype=jnp.float32)
        tp_eng = Engine(m2.params, m2.config, batch_size=2, max_seq=64,
                        dtype=jnp.float32, mesh=make_mesh(2, 4))
        tags = {w.pspec for layer in tp_eng.params["layers"]
                for w in layer.values() if isinstance(w, QuantTensor)}
        assert "row" in tags
        got = tp_eng.prefill([1, 2, 3, 4])
        np.testing.assert_allclose(got, ref, atol=3e-3, rtol=1e-3)
        r1 = ref_eng.decode_one(np.array([5, 5]))
        r2 = tp_eng.decode_one(np.array([5, 5]))
        np.testing.assert_allclose(r2, r1, atol=3e-3, rtol=1e-3)
    finally:
        linear.set_backend("auto")


def test_sharded_pallas_moe_matches_single(tmp_path):
    """EP: quantized experts run qmm_gather/qmm_ragged inside shard_map with
    local-expert masking + psum, matching the unsharded sparse path."""
    from llamacog_tpu.gguf import GGMLType
    from llamacog_tpu.ops import linear
    from llamacog_tpu.quant.planar import QuantTensor

    path = make_tiny_llama_gguf(
        str(tmp_path / "moe_q.gguf"), n_embd=64, n_head=8, n_head_kv=4,
        n_ff=128, n_expert=8, n_expert_used=2, quant_type=GGMLType.Q8_0,
    )
    linear.set_backend("pallas")
    try:
        m = load_model(path, with_tokenizer=False, dtype=jnp.float32)
        ref_eng = Engine(m.params, m.config, batch_size=1, max_seq=32,
                         dtype=jnp.float32)
        ref = ref_eng.prefill([1, 2, 3])
        m2 = load_model(path, with_tokenizer=False, dtype=jnp.float32)
        tp_eng = Engine(m2.params, m2.config, batch_size=1, max_seq=32,
                        dtype=jnp.float32, mesh=make_mesh(1, 8))
        tags = {w.pspec for layer in tp_eng.params["layers"]
                for w in layer.values() if isinstance(w, QuantTensor)}
        assert "expert" in tags
        # psum accumulation order differs from the single-device sum: allow
        # a slightly wider f32 tolerance than the TP tests
        got = tp_eng.prefill([1, 2, 3])
        np.testing.assert_allclose(got, ref, atol=6e-3, rtol=1e-3)
        r1 = ref_eng.decode_one(np.array([5]))
        r2 = tp_eng.decode_one(np.array([5]))
        np.testing.assert_allclose(r2, r1, atol=6e-3, rtol=1e-3)
    finally:
        linear.set_backend("auto")
