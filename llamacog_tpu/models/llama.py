"""Generalized transformer forward pass (functional JAX).

Covers the llama-family graph builders of the reference (llm_build_llama,
src/llama-model.cpp:4691) plus the per-arch variants expressed as
ModelConfig feature flags (_apply_arch_defaults):

* qwen2/qwen2moe (QKV biases, shared-expert sigmoid gate,
  llm_build_qwen2 :6856, :7095)
* qwen3/qwen3moe (per-head Q/K RMS norm, :7254)
* gemma/gemma2/gemma3 (sqrt(n_embd) input scale, gated-GELU FFN,
  post-attention/post-FFN norms, interleaved SWA, per-layer rope base,
  attention-scale override, logit softcaps; :8600-8984)
* phi2 (LayerNorm, parallel residual, :7503), phi3 (fused QKV, fused
  gate_up SWIGLU, longrope factors, :7634)
* gpt2/starcoder (LayerNorm + learned positions, no rope, :7907) and
  starcoder2 (LayerNorm + rope + biases, :8984)
* mixtral/deepseek MoE (build_moe_ffn, src/llama-graph.cpp:642)

Params are a plain pytree of dense arrays and/or QuantTensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import masked_attention
from ..ops.linear import qmatmul, qmatmul_multi
from ..ops.norms import layer_norm, rms_norm
from ..quant.planar import QuantTensor, decode
from ..runtime.kv_cache import KVCache
from .config import ModelConfig


def embed_tokens(params: dict, tokens: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    emb = params["tok_embd"]
    if isinstance(emb, QuantTensor):
        # gather plane rows first, decode only the looked-up tokens —
        # never dequantize the whole [V, E] table inside the step
        from ..quant.planar import decode_rows

        return decode_rows(emb, tokens, dtype=dtype)
    return jnp.take(emb, tokens, axis=0).astype(dtype)


def _act(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    if kind == "silu":
        return jax.nn.silu(xf)
    if kind == "gelu":
        return jax.nn.gelu(xf, approximate=True)  # ggml_gelu is the tanh approx
    if kind == "gelu_quick":
        return xf * jax.nn.sigmoid(1.702 * xf)
    if kind == "relu":
        return jax.nn.relu(xf)
    if kind == "relu2":
        return jnp.square(jax.nn.relu(xf))
    raise ValueError(f"unknown activation {kind}")


def _norm(x: jnp.ndarray, layer: dict, key: str, cfg: ModelConfig) -> jnp.ndarray:
    if cfg.norm_type == "layer":
        # weight may be absent entirely (olmo's non-parametric LayerNorm)
        return layer_norm(x, layer.get(key), layer.get(key + "_b"), cfg.norm_eps)
    return rms_norm(x, layer[key], cfg.rms_norm_eps, layer.get(key + "_b"))


def _linear_multi(x: jnp.ndarray, layer: dict, keys) -> list:
    """Same-input projections through ONE fused Pallas launch (mixed quant
    kinds OK) when none carries bias/lora/scale extras; otherwise falls
    back to per-key _linear. Used for attn q/k/v and split ffn gate/up."""
    if all(layer.get(k + "_scale") is None and layer.get(k + "_b") is None
           and layer.get(k + "_lora") is None for k in keys):
        outs = qmatmul_multi(x, [layer[k] for k in keys])
        if outs is not None:
            return outs
    return [_linear(x, layer, k) for k in keys]


def _linear(x: jnp.ndarray, layer: dict, key: str) -> jnp.ndarray:
    out = qmatmul(x, layer[key])
    sc = layer.get(key + "_scale")
    if sc is not None:  # bitnet per-projection scalar scale
        out = out * sc.astype(out.dtype)
    b = layer.get(key + "_b")
    if b is not None:
        out = out + b.astype(out.dtype)
    lora = layer.get(key + "_lora")
    if lora is not None:
        # out += scale * B(A x)  (build_lora_mm, src/llama-graph.cpp:410-431)
        xa = x.astype(jnp.float32) @ lora["a"].T
        out = out + (lora["scale"] * (xa @ lora["b"].T)).astype(out.dtype)
    return out


def _ffn(layer: dict, x: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Gated (SwiGLU/GeGLU) or plain MLP, per available tensors."""
    if "ffn_gate_up" in layer:
        gu = _linear(x, layer, "ffn_gate_up")
        gate, up = jnp.split(gu, 2, axis=-1)
        h = (_act(gate, cfg.ffn_act) * up.astype(jnp.float32)).astype(x.dtype)
    elif "ffn_gate" in layer:
        gate, up = _linear_multi(x, layer, ("ffn_gate", "ffn_up"))
        h = (_act(gate, cfg.ffn_act) * up.astype(jnp.float32)).astype(x.dtype)
    else:
        up = _linear(x, layer, "ffn_up")
        h = _act(up, cfg.ffn_act).astype(x.dtype)
    if "ffn_sub_norm" in layer:  # bitnet: norm before down (:10929)
        h = rms_norm(h, layer["ffn_sub_norm"], cfg.rms_norm_eps)
    return _linear(h, layer, "ffn_down")


def _moe_router(layer: dict, x: jnp.ndarray, cfg: ModelConfig):
    """Top-k routing (build_moe_ffn, src/llama-graph.cpp:642-760): softmax or
    sigmoid gating, optional DeepSeek-V3 selection bias, weight norm/scale."""
    logits = qmatmul(x, layer["ffn_gate_inp"]).astype(jnp.float32)  # [..,n_exp]
    if cfg.expert_gating_func == "sigmoid":
        probs = jax.nn.sigmoid(logits)
    else:
        probs = jax.nn.softmax(logits, axis=-1)
    if "exp_probs_b" in layer:  # DeepSeek-V3 group-selection bias
        sel = probs + layer["exp_probs_b"].astype(jnp.float32)
    else:
        sel = probs
    _, top_i = jax.lax.top_k(sel, cfg.n_expert_used)
    gate_w = jnp.take_along_axis(probs, top_i, axis=-1)  # pre-bias probs
    if cfg.expert_weights_norm:
        gate_w = gate_w / (gate_w.sum(axis=-1, keepdims=True) + 1e-20)
    return top_i, gate_w * cfg.expert_weights_scale


def _matmul_id(rows: jnp.ndarray, ids: jnp.ndarray, qt) -> jnp.ndarray:
    """[S,K] rows x per-row expert -> [S,N]; streams only selected experts."""
    from ..ops.pallas import qmm_id as qid

    if qt.pspec == "expert":
        from ..parallel.pallas_shard import sharded_qmm_gather
        from ..parallel.sharding import get_active_mesh

        mesh = get_active_mesh()
        if mesh is not None:
            out = sharded_qmm_gather(rows, ids, qt, mesh)
            if out is not None:
                return out
    if qid.supports(qt.kind) and jax.default_backend() == "tpu":
        if rows.shape[0] <= qid.GATHER_OFFSET_MAX:
            return qid.qmm_gather_offset(rows, ids, qt)
        if rows.shape[0] <= qid.GATHER_SLICE_MAX:
            return qid.qmm_gather_slice(rows, ids, qt)
        return qid.qmm_gather(rows, ids, qt)
    return qid.qmm_gather_xla(rows, ids, qt, dtype=rows.dtype)


def _matmul_ragged(xs: jnp.ndarray, tile_expert: jnp.ndarray, qt, tt: int):
    from ..ops.pallas import qmm_id as qid

    if qt.pspec == "expert":
        from ..parallel.pallas_shard import sharded_qmm_ragged
        from ..parallel.sharding import get_active_mesh

        mesh = get_active_mesh()
        if mesh is not None:
            out = sharded_qmm_ragged(xs, tile_expert, qt, tt, mesh)
            if out is not None:
                return out
    if qid.supports(qt.kind) and jax.default_backend() == "tpu":
        return qid.qmm_ragged(xs, tile_expert, qt, tt)
    ids_rows = jnp.repeat(tile_expert, tt, total_repeat_length=xs.shape[0])
    return qid.qmm_gather_xla(xs, ids_rows, qt, dtype=xs.dtype)


# decode-vs-prefill crossover and prefill token-tile size for the sparse
# MoE paths (row counts are static under jit, so this is a trace-time choice)
_MOE_GATHER_MAX = 32
_MOE_TILE = 64


def _ffn_moe_sparse(layer: dict, x: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Sparse MoE over stacked *quantized* experts: only the top-k experts'
    weight bytes are streamed (reference mul_mat_id semantics, ggml.h:460).

    Decode (few rows): per-(token,slot) expert-gathered matvecs via the
    scalar-prefetch qmm_gather kernel. Prefill: tokens sorted by expert and
    padded to _MOE_TILE multiples, then grouped-GEMM via qmm_ragged — each
    used expert's weights are read once.
    """
    B, T, E = x.shape
    n_exp, k = cfg.n_expert, cfg.n_expert_used
    S = B * T
    xf = x.reshape(S, E)
    top_i, gate_w = _moe_router(layer, xf, cfg)  # [S,k]
    wg = layer.get("ffn_gate_exps")
    wu = layer.get("ffn_up_exps")
    wd = layer["ffn_down_exps"]
    Sp = S * k
    ids = top_i.reshape(Sp)
    rows = jnp.repeat(xf, k, axis=0)  # [(s,slot)] pair rows
    if cfg.moe_weight_before:  # llama4: weights scale the expert input
        rows = rows * gate_w.reshape(Sp, 1).astype(rows.dtype)
    wgu = layer.get("ffn_gate_up_exps")
    from ..ops import linear as _lin

    _hk = _lin.get_hook()  # imatrix collector (expert-aware, ids per row)
    if _hk is not None:
        _hk(wgu if wgu is not None else wg, rows, ids)
        if wgu is None:
            _hk(wu, rows, ids)
    if Sp <= _MOE_GATHER_MAX:
        if wgu is not None:  # fused per-expert [gate; up] rows
            gu = _matmul_id(rows, ids, wgu)
            gate, up = jnp.split(gu, 2, axis=-1)
        else:
            gate = _matmul_id(rows, ids, wg)
            up = _matmul_id(rows, ids, wu)
        h = (_act(gate, cfg.ffn_act) * up).astype(x.dtype)  # [Sp, F]
        if _hk is not None:
            _hk(wd, h, ids)
        down = _matmul_id(h, ids, wd)  # [Sp, E] f32
    else:
        tt = _MOE_TILE
        order = jnp.argsort(ids, stable=True)
        sids = ids[order]
        counts = jnp.bincount(ids, length=n_exp)
        padded = ((counts + tt - 1) // tt) * tt
        offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                jnp.cumsum(padded)[:-1].astype(jnp.int32)])
        starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                  jnp.cumsum(counts)[:-1].astype(jnp.int32)])
        rank = jnp.arange(Sp, dtype=jnp.int32) - starts[sids]
        dest = offs[sids] + rank  # position in the padded-sorted buffer
        s_pad = ((Sp + n_exp * (tt - 1)) + tt - 1) // tt * tt  # static bound
        xs = jnp.zeros((s_pad, E), x.dtype).at[dest].set(rows[order])
        ends = (offs + padded).astype(jnp.int32)
        tile_start = jnp.arange(s_pad // tt, dtype=jnp.int32) * tt
        tile_expert = jnp.clip(
            jnp.searchsorted(ends, tile_start, side="right"), 0, n_exp - 1
        ).astype(jnp.int32)
        if wgu is not None:
            gu = _matmul_ragged(xs, tile_expert, wgu, tt)
            gate, up = jnp.split(gu, 2, axis=-1)
        else:
            gate = _matmul_ragged(xs, tile_expert, wg, tt)
            up = _matmul_ragged(xs, tile_expert, wu, tt)
        h = (_act(gate, cfg.ffn_act) * up).astype(x.dtype)  # [s_pad, F]
        if _hk is not None:  # per-pair down inputs for the collector
            _hk(wd, h[dest], ids[order])
        down_pad = _matmul_ragged(h, tile_expert, wd, tt)  # [s_pad, E]
        inv = jnp.argsort(order, stable=True)
        down = down_pad[dest][inv]  # back to (s,slot) pair order
    if cfg.moe_weight_before:
        out = down.reshape(S, k, E).sum(axis=1)
    else:
        out = (down.reshape(S, k, E) * gate_w[..., None]).sum(axis=1)
    return out.reshape(B, T, E)


def _ffn_moe(layer: dict, x: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """MoE FFN. Quantized experts take the sparse top-k path (only selected
    experts' bytes stream); dense (bf16/f32) experts keep the all-expert
    einsum, whose dense matmuls map well onto the MXU and EP-shard cleanly."""
    B, T, E = x.shape
    n_exp, k = cfg.n_expert, cfg.n_expert_used
    if isinstance(layer.get("ffn_gate_up_exps", layer.get("ffn_gate_exps")),
                  QuantTensor):
        out = _ffn_moe_sparse(layer, x, cfg).astype(jnp.float32)
    else:
        top_i, gate_w = _moe_router(layer, x, cfg)  # [B,T,k]
        wg = layer["ffn_gate_exps"]
        wu = layer["ffn_up_exps"]
        wd = layer["ffn_down_exps"]
        # wg/wu: [n_exp, F, E], wd: [n_exp, E, F]
        from ..ops import linear as _lin

        _hk = _lin.get_hook()
        if _hk is not None:  # dense path evaluates every expert on every token
            xr = x.reshape(-1, E)
            all_ids = jnp.tile(jnp.arange(n_exp), xr.shape[0])
            xrep = jnp.repeat(xr, n_exp, axis=0)
            _hk(wg, xrep, all_ids)
            _hk(wu, xrep, all_ids)
        onehot = jax.nn.one_hot(top_i, n_exp, dtype=gate_w.dtype) * gate_w[..., None]
        comb = onehot.sum(axis=2)  # [B,T,n_exp]
        if cfg.moe_weight_before:
            # llama4: gating weights scale the expert INPUT, outputs sum
            # unweighted (build_moe_ffn weight_before_ffn, llama-graph.cpp);
            # unselected experts see zero input and contribute zero
            xin = x[:, :, None, :] * comb[..., None].astype(x.dtype)
            gate = jnp.einsum("btne,nfe->btnf", xin, wg)
            up = jnp.einsum("btne,nfe->btnf", xin, wu)
            act = _act(gate, cfg.ffn_act).astype(x.dtype) * up
            expert_out = jnp.einsum("btnf,nef->btne", act, wd)
            out = expert_out.astype(jnp.float32).sum(axis=2)
        else:
            gate = jnp.einsum("bte,nfe->btnf", x, wg)
            up = jnp.einsum("bte,nfe->btnf", x, wu)
            act = _act(gate, cfg.ffn_act).astype(x.dtype) * up
            if _hk is not None:
                _hk(wd, act.reshape(-1, act.shape[-1]),
                    jnp.tile(jnp.arange(n_exp), B * T))
            expert_out = jnp.einsum("btnf,nef->btne", act, wd)  # [B,T,n_exp,E]
            # combine selected experts
            out = jnp.einsum("btne,btn->bte", expert_out.astype(jnp.float32), comb)
    if "ffn_up_shexp" in layer:  # shared expert branch
        shexp = {
            "ffn_gate": layer["ffn_gate_shexp"],
            "ffn_up": layer["ffn_up_shexp"],
            "ffn_down": layer["ffn_down_shexp"],
        }
        sh_out = _ffn(shexp, x, cfg).astype(jnp.float32)
        if "ffn_gate_inp_shexp" in layer:
            # qwen2moe: sigmoid-gated shared expert (llama-model.cpp:7202-7218)
            g = qmatmul(x, layer["ffn_gate_inp_shexp"]).astype(jnp.float32)
            sh_out = sh_out * jax.nn.sigmoid(g)
        out = out + sh_out
    return out.astype(x.dtype)


def _rope_factors(params: dict, cfg: ModelConfig, max_seq: int):
    """llama_model::get_rope_factors (src/llama-model.cpp:4676): rope_freqs
    if present, else long/short factors chosen by context length."""
    if "rope_freqs" in params:
        return params["rope_freqs"]
    if "rope_long" in params or "rope_short" in params:
        if cfg.rope.orig_ctx_len and max_seq > cfg.rope.orig_ctx_len:
            return params.get("rope_long", params.get("rope_short"))
        return params.get("rope_short", params.get("rope_long"))
    return None


def _alibi_slopes(n_head: int, max_bias: float) -> jnp.ndarray:
    """ggml soft_max_ext slopes: m0^(h+1) for the first 2^floor(log2 H)
    heads, then m1^(2(h-n2)+1) (ggml-cpu/ops.cpp soft_max)."""
    import math

    n2 = 2 ** math.floor(math.log2(n_head))
    m0 = 2.0 ** (-max_bias / n2)
    m1 = 2.0 ** (-max_bias / (2 * n2))
    slopes = [
        m0 ** (h + 1) if h < n2 else m1 ** (2 * (h - n2) + 1)
        for h in range(n_head)
    ]
    return jnp.asarray(slopes, jnp.float32)


def _build_masks(cfg: ModelConfig, write_pos: jnp.ndarray, t: int, s_max: int):
    """(old-cache mask [B,T,S], intra-block mask [T,T]) pairs for normal and
    SWA layers. The cache is read as-is (old contents only) and the current
    block's keys are attended explicitly, so the old mask allows exactly the
    slots below write_pos."""
    from ..runtime.kv_cache import build_causal_mask

    w = cfg.sliding_window
    mask = build_causal_mask(write_pos, t, s_max, seq_len=write_pos)
    ti = jnp.arange(t)
    ok = ti[None, :] <= ti[:, None]  # [T,T] keys j <= queries i
    intra = jnp.where(ok, 0.0, -jnp.inf).astype(jnp.float32)
    if cfg.use_alibi:
        # ALiBi: allowed cells hold -|pos_q - pos_k| so the attention can
        # add slope*mask (set_input_kq_mask use_alibi values)
        pos_q = write_pos[:, None, None] + ti[None, :, None]
        pos_k = jnp.arange(s_max)[None, None, :]
        mask = jnp.where(
            mask > -1e29, -(pos_q - pos_k).astype(jnp.float32), -jnp.inf
        )
        intra = jnp.where(
            ok, -(ti[:, None] - ti[None, :]).astype(jnp.float32), -jnp.inf
        )
    if w <= 0:
        return (mask, intra), (mask, intra)
    if cfg.swa_type == "chunked":
        # llama4: attend only within the query's w-sized chunk —
        # pos_k >= floor(pos_q / w) * w (LLAMA_SWA_TYPE_CHUNKED masking)
        pos_q = write_pos[:, None, None] + ti[None, :, None]  # [B,T,1]
        chunk_start = (pos_q // w) * w
        pos_k = jnp.arange(s_max)[None, None, :]
        swa_mask = jnp.where(
            (mask > -1e29) & (pos_k >= chunk_start), 0.0, -jnp.inf
        ).astype(jnp.float32)
        # intra-block chunking depends on absolute positions → [B,T,T]
        pos_kc = write_pos[:, None, None] + ti[None, None, :]
        intra_swa = jnp.where(
            (ok[None]) & (pos_kc >= chunk_start), 0.0, -jnp.inf
        ).astype(jnp.float32)
        return (mask, intra), (swa_mask, intra_swa)
    swa_mask = build_causal_mask(write_pos, t, s_max, seq_len=write_pos, sliding_window=w)
    ok_swa = ok & (ti[None, :] > ti[:, None] - w)
    intra_swa = jnp.where(ok_swa, 0.0, -jnp.inf).astype(jnp.float32)
    return (mask, intra), (swa_mask, intra_swa)


def forward(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [B, T]
    positions: jnp.ndarray,  # [B, T] absolute positions
    cache: KVCache,
    write_pos: jnp.ndarray,  # [B] cache write offsets (= valid old length)
    dtype=jnp.bfloat16,
    return_hidden: bool = False,
    input_embd: jnp.ndarray | None = None,  # [B, T, E] pre-computed embeddings
    # (multimodal image chunks; llama_batch.embd path)
    rope_override: tuple | None = None,  # (cos, sin) [..., T, dim/2]: M-RoPE
    # tables built by the caller (mtmd image chunks, ggml_rope_multi path)
    write_mask: jnp.ndarray | None = None,  # [B] bool: rows whose K/V land
    # in the cache (prefill of one row must not clamp-write the others)
    n_new: jnp.ndarray | None = None,  # [B] real (unpadded) tokens in this
    # block; SWA ring writes must not let pads wrap over live slots
    logits_last: jnp.ndarray | None = None,  # [B] position per row: compute
    # the LM head only there (a padded 8k prefill would otherwise
    # materialize [T, V] logits — 4.2 GB at Llama-3 vocab; the reference
    # equivalent is batch.logits selecting output rows)
    kv_cap: int | None = None,  # STATIC bound on the attended cache prefix
    # (the reference's padded n_kv heuristic, llama-kv-cache-unified.h:297):
    # a 16k-allocated cache at depth 1k must not read 16k of K/V per step
    layer_offset: int = 0,  # pipeline parallelism: params["layers"] is a
    # contiguous stage slice; absolute layer index = local + offset (keeps
    # SWA patterns / NoPE steps / per-layer head arrays correct per stage)
    return_raw: bool = False,  # pipeline stages: return the residual stream
    # before the final norm/head (the inter-stage activation handoff)
) -> tuple[jnp.ndarray, KVCache]:
    """Returns (logits [B, T, V] f32, updated cache); with return_hidden,
    the first element is the final-norm hidden state [B, T, E] instead
    (embeddings path, reference llama_context::encode pooling).

    KV writes are deferred: layers read the old cache and attend to the
    current block explicitly; one bulk write_all lands all layers' K/V."""
    B, T = tokens.shape
    H, Hkv = cfg.n_head, cfg.n_head_kv
    Dk, Dv = cfg.head_dim_k, cfg.head_dim_v
    scale = cfg.kq_scale
    from ..ops.pallas import flash_decode, flash_prefill, flash_q8
    from ..runtime.kv_cache import QuantKVCache as _QKV

    if kv_cap is not None and (
        kv_cap >= int(cache.max_seq)
        or not isinstance(cache, (KVCache, _QKV))
    ):
        kv_cap = None  # ring/SWA caches keep full reads
    s_eff = kv_cap if kv_cap is not None else int(cache.max_seq)

    chunked_swa = cfg.swa_type == "chunked" and cfg.sliding_window > 0
    # stacked decode reads layer il straight out of the whole-cache planes
    # (no per-layer XLA slice copy) — dense and quantized caches both
    use_flash_stacked = (not chunked_swa
                         and flash_q8.stacked_decode_supported(cfg, cache, T))
    use_flash_q8 = (not chunked_swa and not use_flash_stacked
                    and flash_q8.decode_supported(cfg, cache, T))
    use_flash_q8_prefill = (not chunked_swa and not use_flash_q8
                            and flash_q8.prefill_supported(cfg, cache, T, s_eff))
    use_flash = not chunked_swa and flash_decode.supported(cfg, cache, T)
    use_flash_prefill = (not chunked_swa and not use_flash
                         and flash_prefill.supported(cfg, cache, T, s_eff))
    any_flash = (use_flash or use_flash_prefill or use_flash_q8
                 or use_flash_q8_prefill or use_flash_stacked)
    if any_flash:
        mask = intra = swa_mask = intra_swa = None
        _interp = jax.default_backend() != "tpu"
    else:
        (mask, intra), (swa_mask, intra_swa) = _build_masks(
            cfg, write_pos, T, s_eff
        )
        from ..runtime.kv_cache import SwaKVCache, build_swa_ring_mask

        if isinstance(cache, SwaKVCache):
            # SWA layers read a window-sized ring, not the full store
            swa_mask = build_swa_ring_mask(
                write_pos, T, cache.window, cfg.sliding_window
            )

    alibi = _alibi_slopes(H, cfg.max_alibi_bias) if cfg.use_alibi else None

    def _attend(q, k, v, il, is_swa):
        """Attention over cache row `il` (LOCAL layer index — pipeline stages
        hold a stage-sliced cache, so absolute indices would clamp onto the
        wrong row) + the current block, picking the
        best kernel: flash reading quantized KV planes directly (never
        materializing a dequantized cache), dense flash, or the XLA masked
        fallback."""
        win = cfg.sliding_window if is_swa else 0
        if use_flash_stacked:
            return flash_q8.decode_from_cache(
                q[:, 0], cache, il, k[:, 0], v[:, 0], write_pos, scale,
                softcap=cfg.attn_logit_softcap, window=win,
                interpret=_interp, kv_cap=kv_cap,
            )[:, None]
        if use_flash_q8:
            return flash_q8.flash_decode_q8_auto(
                q[:, 0], tuple(p[il] for p in cache.k_planes),
                tuple(p[il] for p in cache.v_planes),
                k[:, 0], v[:, 0], write_pos, scale,
                softcap=cfg.attn_logit_softcap, window=win, interpret=_interp,
                kv_cap=kv_cap, kinds=cache.kinds,
            )[:, None]
        if use_flash_q8_prefill:
            return flash_q8.flash_prefill_q8(
                q, tuple(p[il] for p in cache.k_planes),
                tuple(p[il] for p in cache.v_planes),
                k, v, write_pos, scale, softcap=cfg.attn_logit_softcap,
                window=win, interpret=_interp, kv_cap=kv_cap,
                kinds=cache.kinds,
            )
        k_old, v_old = cache.read(il)
        if kv_cap is not None:  # XLA fuses the slice into the reads
            k_old = k_old[:, :kv_cap]
            v_old = v_old[:, :kv_cap]
        if use_flash:
            return flash_decode.flash_decode_attention(
                q[:, 0], k_old, v_old, k[:, 0], v[:, 0], write_pos, scale,
                softcap=cfg.attn_logit_softcap, window=win, interpret=_interp,
            )[:, None]
        if use_flash_prefill:
            return flash_prefill.flash_prefill_attention(
                q, k_old, v_old, k, v, write_pos, scale,
                softcap=cfg.attn_logit_softcap, window=win, interpret=_interp,
            )
        m, im = (swa_mask, intra_swa) if is_swa else (mask, intra)
        hkv_l = k.shape[2]
        if hkv_l != Hkv:  # per-layer KV heads: read only this layer's slice
            k_old = k_old[:, :, :hkv_l]
            v_old = v_old[:, :, :hkv_l]
        al = alibi if alibi is None else alibi[: q.shape[2]]
        return masked_attention(
            q, k_old, v_old, m, scale, logit_softcap=cfg.attn_logit_softcap,
            k_cur=k, v_cur=v, intra_mask=im, alibi_slopes=al,
        )

    new_ks, new_vs = [], []

    if input_embd is not None:
        x = input_embd.astype(dtype)
    else:
        x = embed_tokens(params, tokens, dtype=dtype)
        if cfg.embd_scale != 1.0:
            x = x * jnp.asarray(cfg.embd_scale, dtype)
    if cfg.learned_pos_embd and "pos_embd" in params:
        pe = params["pos_embd"]
        if isinstance(pe, QuantTensor):
            pe = decode(pe, dtype=dtype)
        x = x + jnp.take(pe, positions, axis=0).astype(dtype)
    if "tok_norm" in params:
        x = layer_norm(x, params["tok_norm"], params.get("tok_norm_b"), cfg.norm_eps)
    freq_factors = _rope_factors(params, cfg, int(cache.max_seq))
    # rope tables shared by all layers (computed once per step)
    from ..ops.rope import apply_rope_tables, rope_tables

    if rope_override is not None:
        rtab = rope_override
    else:
        rtab = rope_tables(positions, cfg.rope, Dk, freq_factors) if cfg.rope.enabled else None
    rtab_swa = (
        rope_tables(positions, cfg.rope_swa, Dk, freq_factors)
        if cfg.rope.enabled and cfg.rope_freq_base_swa > 0.0 and rope_override is None
        else rtab
    )
    rdim = cfg.rope.dim or Dk
    for il_loc, layer in enumerate(params["layers"]):
        il = il_loc + layer_offset  # absolute index for per-layer config
        x_in = x  # layer input (arctic's parallel MoE branch reads it)
        # olmo2: post-norm design — attention reads the raw residual stream
        h = x if cfg.post_norm_only else _norm(x, layer, "attn_norm", cfg)
        par_ffn_h = h  # parallel residual: FFN input (phi2/falcon-7b share h)
        if cfg.parallel_residual:
            if "attn_norm_2" in layer:
                # falcon-40B: attention gets its own norm, FFN keeps attn_norm
                # (llm_build_falcon :5443-5450)
                par_ffn_h = h
                h = _norm(x, layer, "attn_norm_2", cfg)
            elif "ffn_norm" in layer:
                # gptneox use_parallel_residual: x + attn(ln1 x) + ffn(ln2 x)
                par_ffn_h = _norm(x, layer, "ffn_norm", cfg)
        if "attn_kv_a_mqa" in layer:
            # deepseek2 MLA, decompressed-MHA form (llm_build_deepseek2
            # non-MLA branch, src/llama-model.cpp:10630-10745)
            rope_dim = cfg.rope.dim
            nope = Dk - rope_dim
            if "attn_q_a" in layer:
                qa = rms_norm(qmatmul(h, layer["attn_q_a"]), layer["attn_q_a_norm"],
                              cfg.rms_norm_eps)
                q = qmatmul(qa, layer["attn_q_b_proj"])
            else:
                q = qmatmul(h, layer["attn_q"])
            q = q.reshape(B, T, H, Dk)
            q_nope, q_pe = q[..., :nope], q[..., nope:]
            kv_pe = qmatmul(h, layer["attn_kv_a_mqa"])  # [B,T, lora_kv + rope]
            kv_cmpr, k_pe = (
                kv_pe[..., : cfg.n_lora_kv],
                kv_pe[..., cfg.n_lora_kv :].reshape(B, T, 1, rope_dim),
            )
            is_swa = cfg.is_swa(il)
            tab = rtab_swa if is_swa else rtab
            q_pe = apply_rope_tables(q_pe, tab, rope_dim,
                                     interleaved=cfg.rope.interleaved)
            k_pe = apply_rope_tables(k_pe, tab, rope_dim,
                                     interleaved=cfg.rope.interleaved)
            kv_cmpr = rms_norm(kv_cmpr, layer["attn_kv_a_norm"], cfg.rms_norm_eps)
            kv = qmatmul(kv_cmpr, layer["attn_kv_b"]).reshape(B, T, H, nope + Dv)
            k_nope, v = kv[..., :nope], kv[..., nope:]
            # rope part first (matches the reference's cache layout)
            q = jnp.concatenate([q_pe, q_nope], axis=-1)
            k = jnp.concatenate(
                [jnp.broadcast_to(k_pe, (B, T, H, rope_dim)), k_nope], axis=-1
            )
            new_ks.append(k)
            new_vs.append(v)
            attn = _attend(q, k, v, il_loc, is_swa)
            attn = _linear(attn.reshape(B, T, H * Dv), layer, "attn_output")
            if cfg.post_norms and "attn_post_norm" in layer:
                attn = _norm(attn, layer, "attn_post_norm", cfg)
            x = x + attn
            h = _norm(x, layer, "ffn_norm", cfg)
            if cfg.n_expert > 0 and "ffn_gate_inp" in layer:
                ffn = _ffn_moe(layer, h, cfg)
            else:
                ffn = _ffn(layer, h, cfg)
            x = x + ffn
            if "cvec" in params:
                x = x + params["cvec"][il_loc].astype(x.dtype)
            continue
        if not any(kk in layer for kk in ("attn_qkv", "attn_qk", "attn_q")):
            # Deci per-layer variants: cache writes must still line up
            new_ks.append(jnp.zeros((B, T, Hkv, Dk), x.dtype))
            new_vs.append(jnp.zeros((B, T, Hkv, Dv), x.dtype))
            if "attn_output" in layer:
                # "linear attention" (n_head > 0, n_head_kv == 0,
                # llm_build_deci): wo over the attn-normed input + residual
                h = _norm(x, layer, "attn_norm", cfg)
                x = x + _linear(h, layer, "attn_output")
            if not any(kk in layer for kk in ("ffn_gate_up", "ffn_up",
                                              "ffn_gate_inp")):
                continue  # FFN-free layer (Nemotron-Ultra style)
            h = _norm(x, layer, "ffn_norm", cfg) if "ffn_norm" in layer else x
            ffn = _ffn_moe(layer, h, cfg) if (
                cfg.n_expert > 0 and "ffn_gate_inp" in layer) else _ffn(layer, h, cfg)
            x = x + ffn
            continue
        if "attn_qkv" in layer:
            qkv = _linear(h, layer, "attn_qkv")
            h_l, hkv_l = cfg.n_head_at(il), cfg.n_head_kv_at(il)
            q, k, v = jnp.split(
                qkv, [h_l * Dk, h_l * Dk + hkv_l * Dk], axis=-1
            )
            q = q.reshape(B, T, -1, Dk)
            k = k.reshape(B, T, -1, Dk)
            v = v.reshape(B, T, -1, Dv)
        elif "attn_qk" in layer:
            # q+k fused when v's quant kind differs (loader mixed-kind
            # fuse); qk and v ride ONE phase-partitioned pallas launch
            qk, v = _linear_multi(h, layer, ("attn_qk", "attn_v"))
            h_l = cfg.n_head_at(il)
            q, k = jnp.split(qk, [h_l * Dk], axis=-1)
            q = q.reshape(B, T, -1, Dk)
            k = k.reshape(B, T, -1, Dk)
            v = v.reshape(B, T, -1, Dv)
        else:
            q, k, v = _linear_multi(h, layer, ("attn_q", "attn_k", "attn_v"))
            if cfg.qk_norm_full and "attn_q_norm" in layer:
                # olmo2: norm over the whole projection, not per head
                q = rms_norm(q, layer["attn_q_norm"], cfg.rms_norm_eps)
                k = rms_norm(k, layer["attn_k_norm"], cfg.rms_norm_eps)
            # reshape by weight row count, not globals: per-layer head
            # arrays make H/Hkv vary by layer
            q = q.reshape(B, T, -1, Dk)
            k = k.reshape(B, T, -1, Dk)
            v = v.reshape(B, T, -1, Dv)
        if cfg.attn_clamp > 0.0:  # mpt/dbrx clamp_kqv
            q = jnp.clip(q, -cfg.attn_clamp, cfg.attn_clamp)
            k = jnp.clip(k, -cfg.attn_clamp, cfg.attn_clamp)
            v = jnp.clip(v, -cfg.attn_clamp, cfg.attn_clamp)
        if cfg.qk_norm_layer and "attn_q_norm" in layer:
            # chameleon: per-head LayerNorm, [n_head, head_dim] weights
            # broadcast over [B,T,H,D] (llm_build_chameleon :12865-12890)
            q = layer_norm(q, layer["attn_q_norm"], layer.get("attn_q_norm_b"),
                           cfg.norm_eps)
            k = layer_norm(k, layer["attn_k_norm"], layer.get("attn_k_norm_b"),
                           cfg.norm_eps)
        elif not cfg.qk_norm_full and "attn_q_norm" in layer:
            q = rms_norm(q, layer["attn_q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k, layer["attn_k_norm"], cfg.rms_norm_eps)
        is_swa = cfg.is_swa(il)
        # llama4 NoPE layers: every n_no_rope_layer_step-th layer skips rope
        # and scales Q by the position temperature instead
        # (llm_build_llama_iswa :4875,4925-4930)
        use_rope_l = not (cfg.n_no_rope_layer_step > 0
                          and (il + 1) % cfg.n_no_rope_layer_step == 0)
        if rtab is not None and use_rope_l:
            tab = rtab_swa if is_swa else rtab
            q = apply_rope_tables(q, tab, rdim, interleaved=cfg.rope.interleaved)
            k = apply_rope_tables(k, tab, rdim, interleaved=cfg.rope.interleaved)
            if cfg.use_kq_norm:  # Llama4TextL2Norm (weightless rms)
                q = rms_norm(q, None, cfg.rms_norm_eps)
                k = rms_norm(k, None, cfg.rms_norm_eps)
        elif not use_rope_l and cfg.use_attn_temp:
            # build_inp_attn_scale (llama-graph.cpp:58-62)
            tsc = (jnp.log(jnp.floor(
                (positions.astype(jnp.float32) + 1.0)
                / cfg.n_attn_temp_floor_scale) + 1.0)
                * cfg.f_attn_temp_scale + 1.0)
            q = q * tsc[:, :, None, None].astype(q.dtype)
        if k.shape[2] < Hkv:  # per-layer KV heads: pad to the cache width
            pad = [(0, 0)] * 4
            pad[2] = (0, Hkv - k.shape[2])
            new_ks.append(jnp.pad(k, pad))
            new_vs.append(jnp.pad(v, pad))
        else:
            new_ks.append(k)
            new_vs.append(v)
        attn = _attend(q, k, v, il_loc, is_swa)
        # flatten by the ACTUAL head count: per-layer head arrays (openelm/
        # deci) make this differ from the global H
        attn = attn.reshape(B, T, attn.shape[2] * Dv)
        if "attn_sub_norm" in layer:  # bitnet: norm before wo (:10892)
            attn = rms_norm(attn, layer["attn_sub_norm"], cfg.rms_norm_eps)
        attn = _linear(attn, layer, "attn_output")
        if cfg.post_norms and "attn_post_norm" in layer:
            attn = _norm(attn, layer, "attn_post_norm", cfg)
        if cfg.residual_scale != 1.0:  # granite branch scaling
            attn = attn * jnp.asarray(cfg.residual_scale, attn.dtype)
        if cfg.parallel_residual:
            # phi2-style: FFN reads the same attn_norm output, one residual add
            ffn = _ffn(layer, par_ffn_h, cfg)
            x = x + attn + ffn
            if "cvec" in params:
                x = x + params["cvec"][il_loc].astype(x.dtype)
            continue
        x = x + attn
        if "ffn_norm" in layer or cfg.nonparam_norms:
            h = _norm(x, layer, "ffn_norm", cfg)
        else:
            h = x
        if (cfg.n_expert > 0 and "ffn_gate_inp" in layer
                and "ffn_norm_exps" not in layer):
            ffn = _ffn_moe(layer, h, cfg)
        else:
            ffn = _ffn(layer, h, cfg)
        if cfg.post_norms and "ffn_post_norm" in layer:
            ffn = _norm(ffn, layer, "ffn_post_norm", cfg)
        if cfg.residual_scale != 1.0:
            ffn = ffn * jnp.asarray(cfg.residual_scale, ffn.dtype)
        x = x + ffn
        if "ffn_norm_exps" in layer:
            # arctic (llm_build_arctic :10330-10352): the dense FFN above is
            # sequential; a MoE branch reads the rms-normed LAYER INPUT and
            # its output is added on top
            moe_h = rms_norm(x_in, layer["ffn_norm_exps"], cfg.rms_norm_eps)
            x = x + _ffn_moe(layer, moe_h, cfg)
        if "cvec" in params:  # control vector (build_cvec, llama-adapter.cpp:21)
            x = x + params["cvec"][il_loc].astype(x.dtype)

    cache = cache.write_all(jnp.stack(new_ks), jnp.stack(new_vs), write_pos,
                            active=write_mask, n_new=n_new)
    if return_raw:  # pipeline stage handoff: pre-final-norm residual stream
        return x, cache
    if logits_last is not None and not return_hidden:
        idx = logits_last.reshape(B, 1, 1).astype(jnp.int32)
        x = jnp.take_along_axis(x, jnp.broadcast_to(idx, (B, 1, x.shape[-1])),
                                axis=1)
    if cfg.norm_type == "layer":
        # output_norm may be absent entirely (olmo's non-parametric LN)
        x = layer_norm(x, params.get("output_norm"), params.get("output_norm_b"),
                       cfg.norm_eps)
    else:
        x = rms_norm(x, params["output_norm"], cfg.rms_norm_eps,
                     params.get("output_norm_b"))
    if return_hidden:
        return x.astype(jnp.float32), cache
    out_w = params.get("output", params["tok_embd"])
    logits = qmatmul(x, out_w).astype(jnp.float32)
    if "output_b" in params:
        logits = logits + params["output_b"].astype(jnp.float32)
    if "output_lora" in params and "output" in params:
        lo = params["output_lora"]
        logits = logits + lo["scale"] * ((x.astype(jnp.float32) @ lo["a"].T) @ lo["b"].T)
    if cfg.logit_scale != 1.0:  # command-r (f_logit_scale)
        logits = logits * cfg.logit_scale
    if cfg.final_logit_softcap > 0.0:
        logits = cfg.final_logit_softcap * jnp.tanh(logits / cfg.final_logit_softcap)
    if cfg.arch == "chameleon" and cfg.n_vocab > 8196:
        # image-token suppression for text-only output: ids [4, 8196) get
        # -FLT_MAX (llm_build_chameleon, llama-model.cpp:12979-12990)
        tok = jnp.arange(cfg.n_vocab)
        img = (tok >= 4) & (tok < 8196)
        logits = jnp.where(img, jnp.float32(-3.4028235e38), logits)
    return logits, cache
