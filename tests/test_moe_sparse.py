"""Sparse MoE expert compute (mul_mat_id analog) vs dense reference.

Covers ops/pallas/qmm_id.py (scalar-prefetch gather + ragged grouped GEMM,
both in interpret mode on CPU) and the models/llama.py _ffn_moe_sparse
dispatch (sort / pad / unsort) against an all-expert dense evaluation.
Reference semantics: ggml mul_mat_id (ggml.h:460) + build_moe_ffn
(src/llama-graph.cpp:642-760)."""

import numpy as np
import pytest

import jax.numpy as jnp

from llamacog_tpu.gguf import GGMLType
from llamacog_tpu.ops.pallas import qmm_id
from llamacog_tpu.quant import quantize
from llamacog_tpu.quant.planar import decode, from_gguf


def nmse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return ((a - b) ** 2).sum() / max((b**2).sum(), 1e-20)


def make_experts(kind, n_exp, n, k, seed=0):
    ttype = getattr(GGMLType, kind)
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((n_exp, n, k)).astype(np.float32)
    qt = from_gguf(quantize(w.reshape(-1), ttype), ttype, (n_exp, n, k))
    qt.planes = {kk: jnp.asarray(v) for kk, v in qt.planes.items()}
    wd = np.asarray(decode(qt, jnp.float32)).reshape(n_exp, n, k)
    return qt, wd


@pytest.mark.parametrize("kind", ["Q4_0", "Q4_K", "Q8_0"])
def test_qmm_gather_interpret(kind):
    n_exp, N, K = 4, 256, 512
    qt, wd = make_experts(kind, n_exp, N, K, seed=hash(kind) % 2**31)
    rng = np.random.default_rng(1)
    S = 6
    x = rng.standard_normal((S, K)).astype(np.float32)
    ids = rng.integers(0, n_exp, S).astype(np.int32)
    ref = np.stack([x[s] @ wd[ids[s]].T for s in range(S)])
    got = np.asarray(qmm_id.qmm_gather(jnp.asarray(x), jnp.asarray(ids), qt,
                                       interpret=True))
    assert got.shape == (S, N)
    assert nmse(got, ref) < 2e-4


def test_qmm_gather_xla_matches():
    n_exp, N, K = 4, 128, 256
    qt, wd = make_experts("Q4_K", n_exp, N, K, seed=3)
    rng = np.random.default_rng(2)
    S = 5
    x = rng.standard_normal((S, K)).astype(np.float32)
    ids = rng.integers(0, n_exp, S).astype(np.int32)
    ref = np.stack([x[s] @ wd[ids[s]].T for s in range(S)])
    got = np.asarray(qmm_id.qmm_gather_xla(jnp.asarray(x), jnp.asarray(ids), qt,
                                           dtype=jnp.float32))
    assert nmse(got, ref) < 2e-4


def test_qmm_ragged_interpret():
    n_exp, N, K = 3, 256, 512
    qt, wd = make_experts("Q4_0", n_exp, N, K, seed=11)
    rng = np.random.default_rng(4)
    tt = 8
    tile_expert = np.array([0, 0, 1, 2, 2, 2], dtype=np.int32)
    S_pad = len(tile_expert) * tt
    xs = rng.standard_normal((S_pad, K)).astype(np.float32)
    ids_rows = np.repeat(tile_expert, tt)
    ref = np.stack([xs[s] @ wd[ids_rows[s]].T for s in range(S_pad)])
    got = np.asarray(qmm_id.qmm_ragged(jnp.asarray(xs), jnp.asarray(tile_expert),
                                       qt, tt, interpret=True))
    assert got.shape == (S_pad, N)
    assert nmse(got, ref) < 2e-4


def _dense_moe_ref(layer, x, cfg):
    """All-expert dense evaluation with the same router (the old path)."""
    import jax

    from llamacog_tpu.models.llama import _act, _moe_router

    B, T, E = x.shape
    top_i, gate_w = _moe_router(layer, x, cfg)
    wg = decode(layer["ffn_gate_exps"], jnp.float32)
    wu = decode(layer["ffn_up_exps"], jnp.float32)
    wd = decode(layer["ffn_down_exps"], jnp.float32)
    gate = jnp.einsum("bte,nfe->btnf", x, wg)
    up = jnp.einsum("bte,nfe->btnf", x, wu)
    act = _act(gate, cfg.ffn_act).astype(x.dtype) * up
    expert_out = jnp.einsum("btnf,nef->btne", act, wd)
    onehot = jax.nn.one_hot(top_i, cfg.n_expert, dtype=gate_w.dtype) * gate_w[..., None]
    return jnp.einsum("btne,btn->bte", expert_out.astype(jnp.float32),
                      onehot.sum(axis=2))


def _moe_layer(kind, n_exp, E, F, seed=0):
    rng = np.random.default_rng(seed)
    gate_qt, _ = make_experts(kind, n_exp, F, E, seed=seed + 1)
    up_qt, _ = make_experts(kind, n_exp, F, E, seed=seed + 2)
    down_qt, _ = make_experts(kind, n_exp, E, F, seed=seed + 3)
    return {
        "ffn_gate_inp": jnp.asarray(rng.standard_normal((n_exp, E)).astype(np.float32) * 0.1),
        "ffn_gate_exps": gate_qt,
        "ffn_up_exps": up_qt,
        "ffn_down_exps": down_qt,
    }


@pytest.mark.parametrize("T", [2, 48])  # 2*k=4 -> gather path; 48*2=96 -> ragged path
def test_ffn_moe_sparse_matches_dense(T):
    from llamacog_tpu.models.config import ModelConfig
    from llamacog_tpu.models.llama import _ffn_moe

    E, F, n_exp = 256, 512, 4
    cfg = ModelConfig(
        arch="llama", n_vocab=64, n_ctx_train=64, n_embd=E, n_layer=1,
        n_head=4, n_head_kv=4, n_ff=F, head_dim_k=64, head_dim_v=64,
        n_expert=n_exp, n_expert_used=2, expert_weights_norm=True,
    )
    layer = _moe_layer("Q8_0", n_exp, E, F, seed=7)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, T, E)).astype(np.float32) * 0.3)
    ref = np.asarray(_dense_moe_ref(layer, x, cfg))
    got = np.asarray(_ffn_moe(layer, x, cfg))
    assert got.shape == ref.shape
    assert nmse(got, ref) < 5e-4, nmse(got, ref)


def test_ffn_moe_sparse_jit():
    """The sparse path must trace under jit (static shapes everywhere)."""
    import jax

    from llamacog_tpu.models.config import ModelConfig
    from llamacog_tpu.models.llama import _ffn_moe

    E, F, n_exp = 256, 512, 4
    cfg = ModelConfig(
        arch="llama", n_vocab=64, n_ctx_train=64, n_embd=E, n_layer=1,
        n_head=4, n_head_kv=4, n_ff=F, head_dim_k=64, head_dim_v=64,
        n_expert=n_exp, n_expert_used=2,
    )
    layer = _moe_layer("Q4_K", n_exp, E, F, seed=17)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 40, E)).astype(np.float32) * 0.3)
    f = jax.jit(lambda lx: _ffn_moe(layer, lx, cfg))
    out = np.asarray(f(x))
    ref = np.asarray(_dense_moe_ref(layer, x, cfg))
    assert nmse(out, ref) < 5e-4


@pytest.mark.parametrize("kind", ["Q4_0", "Q4_K", "Q6_K"])
def test_qmm_gather_offset_interpret(kind):
    """Offset-qmm variant: per-row 1-D-grid kernels with a scalar-prefetched
    expert base must match the dense per-expert reference."""
    n_exp, N, K = 4, 256, 512
    qt, wd = make_experts(kind, n_exp, N, K, seed=hash(kind) % 2**31)
    rng = np.random.default_rng(2)
    S = 4
    x = rng.standard_normal((S, K)).astype(np.float32)
    ids = rng.integers(0, n_exp, S).astype(np.int32)
    ref = np.stack([x[s] @ wd[ids[s]].T for s in range(S)])
    got = np.asarray(qmm_id.qmm_gather_offset(jnp.asarray(x), jnp.asarray(ids),
                                              qt, interpret=True))
    assert got.shape == (S, N)
    assert nmse(got, ref) < 2e-4
