"""Bisect the 8B Q4_K_M decode step: differenced chained on-device loops
(16 vs 144 iterations, so dispatch RTT and warmup cancel) with components
knocked out.

Run: python scripts/bisect_decode8b.py [variants...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    import llamacog_tpu.models.llama as L
    from llamacog_tpu.runtime.engine import Engine
    from llamacog_tpu.utils.synthetic import (
        llama3_8b_config,
        make_synthetic_params,
    )

    variants = sys.argv[1:] or ["base", "noattn", "scoresonly", "nosoftmax",
                                "nocur"]
    cfg = llama3_8b_config()
    t0 = time.time()
    params = make_synthetic_params(cfg)
    jax.block_until_ready(params["layers"][0]["attn_qk"].planes[next(iter(params["layers"][0]["attn_qk"].planes))])
    print(f"[build] {time.time()-t0:.0f}s", file=sys.stderr)

    eng = Engine(params, cfg, batch_size=1, max_seq=1024)
    eng.prefill(list(range(2, 130)))
    cache0 = eng.cache
    seq0 = jnp.asarray(eng.seq_len)

    orig_attn = L.masked_attention
    orig_ffn = L._ffn
    from llamacog_tpu.ops.pallas import flash_decode, flash_prefill

    def attn_zero(q, k_old, v_old, m, scale, **kw):
        B, T = q.shape[0], q.shape[1]
        H = q.shape[2]
        Dv = (kw.get("v_cur") if kw.get("v_cur") is not None else v_old).shape[-1]
        return jnp.zeros((B, T, H, Dv), q.dtype)

    def ffn_zero(layer, x, cfg_):
        return jnp.zeros_like(x)

    def attn_scores_only(q, k, v, mask, scale, k_cur=None, v_cur=None, **kw):
        B, T, H, Dk = q.shape
        Hkv = k.shape[2]
        rep = H // Hkv
        qf = q.astype(jnp.float32).reshape(B, T, Hkv, rep, Dk)
        s_ = jnp.einsum("bthrd,bshd->bhrts", qf, k.astype(jnp.float32))
        Dv = (v_cur if v_cur is not None else v).shape[-1]
        return (s_.sum() * 0 + jnp.zeros((B, T, H, Dv), jnp.float32)).astype(q.dtype)

    def attn_nosoftmax(q, k, v, mask, scale, k_cur=None, v_cur=None, **kw):
        B, T, H, Dk = q.shape
        Hkv = k.shape[2]
        rep = H // Hkv
        qf = q.astype(jnp.float32).reshape(B, T, Hkv, rep, Dk)
        probs = jnp.einsum("bthrd,bshd->bhrts", qf, k.astype(jnp.float32)) * scale
        out = jnp.einsum("bhrts,bshd->bthrd", probs, v.astype(jnp.float32))
        return out.reshape(B, T, H, -1).astype(q.dtype)

    import llamacog_tpu.ops.attention as ATT
    orig_ma = ATT.masked_attention

    def attn_nocur(q, k, v, mask, scale, k_cur=None, v_cur=None, **kw):
        return orig_ma(q, k, v, mask, scale, **kw)

    def timed(fn, *args):
        t0 = time.time()
        out = fn(*args)
        v = int(np.asarray(out).sum())
        return time.time() - t0, v

    for variant in variants:
        repl = {"noattn": attn_zero, "scoresonly": attn_scores_only,
                "nosoftmax": attn_nosoftmax, "nocur": attn_nocur}.get(variant)
        L.masked_attention = repl if repl is not None else orig_attn
        L._ffn = ffn_zero if variant == "noffn" else orig_ffn
        raw = variant == "nohead"

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(params, cache, tok, seq_len, n, _v=variant, _raw=raw):
            def body(i, state):
                cache, tok, seq_len, acc = state
                out, cache = L.forward(
                    params, cfg, tok[:, None], seq_len[:, None], cache,
                    seq_len, dtype=jnp.bfloat16, kv_cap=1024,
                    return_hidden=_raw,
                )
                if _v in ("noargmax", "nohead"):
                    nxt = (out[:, 0, :8].sum(-1) * 0 + 5).astype(jnp.int32)
                else:
                    nxt = jnp.argmax(out[:, 0], axis=-1).astype(jnp.int32)
                return (cache, nxt, seq_len + 1, acc + nxt)
            cache, tok, seq_len, acc = jax.lax.fori_loop(
                0, n, body, (cache, tok, seq_len, jnp.zeros((1,), jnp.int32)))
            return acc

        run = lambda n: timed(loop, params, cache0, jnp.array([5], jnp.int32),
                              seq0, n)
        run(16)
        best = 1e9
        for _ in range(2):
            t16, _ = run(16)
            t144, _ = run(144)
            best = min(best, (t144 - t16) / 128 * 1e3)
        print(f"{variant:10s}: {best:6.2f} ms/tok")

    L.masked_attention = orig_attn
    L._ffn = orig_ffn


if __name__ == "__main__":
    main()
