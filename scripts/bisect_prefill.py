"""Bisect the 8B prefill budget: time back-to-back T=512 forwards with
pieces of the layer knocked out (monkeypatched to zeros), differenced
against the full step.

Run: python scripts/bisect_prefill.py [variants...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    import llamacog_tpu.models.llama as L
    from llamacog_tpu.utils.synthetic import (
        llama3_8b_config,
        make_synthetic_params,
    )

    variants = sys.argv[1:] or ["base", "noattn", "noffn", "nohead",
                                 "nonorm", "nopermute"]
    cfg = llama3_8b_config()
    t0 = time.time()
    params = make_synthetic_params(cfg)
    jax.block_until_ready(params["layers"][0]["attn_qk"].planes[next(iter(params["layers"][0]["attn_qk"].planes))])
    print(f"[build] {time.time()-t0:.0f}s", file=sys.stderr)

    T, S = 512, 1024
    from llamacog_tpu.runtime.kv_cache import KVCache

    cache = KVCache.create(cfg.n_layer, 1, S, cfg.n_head_kv,
                           cfg.head_dim_k, cfg.head_dim_v)
    toks = jnp.arange(2, 2 + T, dtype=jnp.int32)[None, :]
    wp = jnp.zeros((1,), jnp.int32)
    sl = jnp.full((1,), T, jnp.int32)

    orig_attn = L.masked_attention
    orig_ffn = L._ffn
    from llamacog_tpu.ops.pallas import flash_prefill

    orig_flash = flash_prefill.flash_prefill_attention

    def attn_zero(q, k_old, v_old, m, scale, **kw):
        B, t = q.shape[0], q.shape[1]
        H = q.shape[2]
        Dv = (kw.get("v_cur") if kw.get("v_cur") is not None else v_old).shape[-1]
        return jnp.zeros((B, t, H, Dv), q.dtype)

    def flash_zero(q, *a, **kw):
        return jnp.zeros(q.shape[:-1] + (cfg.head_dim_v,), q.dtype)

    def ffn_zero(layer, x, cfg_):
        return jnp.zeros_like(x)

    import llamacog_tpu.ops.norms as NORMS
    orig_rms = NORMS.rms_norm

    def rms_identity(x, w, eps, b=None):
        return x.astype(jnp.float32)

    import llamacog_tpu.quant.planar as PL
    orig_perm = PL.permute_activation

    def perm_identity(x, qt):
        return x

    for variant in variants:
        L.masked_attention = attn_zero if variant == "noattn" else orig_attn
        flash_prefill.flash_prefill_attention = (
            flash_zero if variant == "noattn" else orig_flash)
        L._ffn = ffn_zero if variant == "noffn" else orig_ffn
        NORMS.rms_norm = rms_identity if variant == "nonorm" else orig_rms
        L.rms_norm = NORMS.rms_norm
        PL.permute_activation = (perm_identity if variant == "nopermute"
                                 else orig_perm)
        import llamacog_tpu.ops.pallas.qmm as QMM
        QMM.permute_activation = PL.permute_activation
        raw = variant == "nohead"
        if variant == "noqkv":
            # skip attention entirely including q/k/v/o projections: replace
            # the attention branch contribution with zeros via masked_attention
            # AND zero q/k/v projections is invasive; approximate by noattn
            L.masked_attention = attn_zero
            flash_prefill.flash_prefill_attention = flash_zero

        @jax.jit
        def step(params, cache, _raw=raw):
            positions = wp[:, None] + jnp.arange(T)[None, :]
            out, c2 = L.forward(params, cfg, toks, positions, cache, wp,
                                dtype=jnp.bfloat16, n_new=sl - wp,
                                logits_last=None if _raw else sl - 1,
                                return_hidden=_raw)
            return out

        out = step(params, cache)  # compile
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(3):
            t1 = time.time()
            for _ in range(4):
                out = step(params, cache)
            jax.block_until_ready(out)
            best = min(best, (time.time() - t1) / 4)
        print(f"{variant:8s}: {best*1e3:7.2f} ms per pp{T} "
              f"({T/best:7.0f} t/s)")

    L.masked_attention = orig_attn
    L._ffn = orig_ffn
    flash_prefill.flash_prefill_attention = orig_flash


if __name__ == "__main__":
    main()
