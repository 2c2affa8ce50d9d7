"""Bisect the fixed per-token cost in mixtral-geometry sparse-MoE decode.

Measured (round 2, current kernels): base 3.80 / nomoe 0.32 / noattn 3.55 /
nohead 3.40 ms/tok at 8 layers — MoE-DMA-bound, no fixed intercept. (An
earlier ~11 ms "intercept" was a warmup-shape recompile artifact in the old
bench, not a real cost.) This harness times chained
on-device greedy loops (16 vs 144 iterations, differenced, so dispatch RTT
and warmup cancel) with pieces of the step knocked out via monkeypatching,
to locate the intercept.

Run: python scripts/bisect_moe.py [n_layer] [variants...]
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import os

    import jax

    if "--tiny" in sys.argv or os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon TPU plugin ignores JAX_PLATFORMS; force CPU via config
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import llamacog_tpu.models.llama as L
    from llamacog_tpu.runtime.engine import Engine
    from llamacog_tpu.utils.synthetic import make_synthetic_params, mixtral_shaped_config

    args = [a for a in sys.argv[1:] if a != "--tiny"]
    tiny = "--tiny" in sys.argv  # CPU smoke mode: shrunken geometry
    n_layer = int(args[0]) if args else 2
    variants = args[1:] or ["base", "noargmax", "nohead", "nomoe",
                            "noattn", "headonly"]
    cfg = mixtral_shaped_config(n_layer=n_layer)
    if tiny:
        import dataclasses
        cfg = dataclasses.replace(cfg, n_vocab=512, n_embd=256, n_head=4,
                                  n_head_kv=2, n_ff=512, head_dim_k=64,
                                  head_dim_v=64)
    t0 = time.time()
    params = make_synthetic_params(cfg)
    jax.block_until_ready(params["layers"][0]["ffn_gate_up_exps"].planes["qs"])
    print(f"[build] {time.time()-t0:.0f}s", file=sys.stderr)

    eng = Engine(params, cfg, batch_size=1, max_seq=1024)
    eng.prefill(list(range(2, 66)))
    cache0 = eng.cache
    seq0 = jnp.asarray(eng.seq_len)

    orig_moe = L._ffn_moe
    orig_attn = L.masked_attention

    def moe_zero(layer, x, cfg_):
        # keep the router (cheap) but skip the expert matmuls entirely
        return jnp.zeros_like(x, dtype=jnp.float32)

    def attn_zero(q, k_old, v_old, m, scale, **kw):
        B, T = q.shape[0], q.shape[1]
        H = q.shape[2]
        Dv = (kw.get("v_cur") if kw.get("v_cur") is not None else v_old).shape[-1]
        return jnp.zeros((B, T, H, Dv), q.dtype)

    def timed(fn, *args):
        t0 = time.time()
        out = fn(*args)
        v = int(np.asarray(out).sum())  # value fetch = real sync on tunnel
        return time.time() - t0, v

    for variant in variants:
        L._ffn_moe = moe_zero if variant == "nomoe" else orig_moe
        L.masked_attention = attn_zero if variant == "noattn" else orig_attn
        raw = variant == "nohead"

        if variant == "headonly":
            # embed -> LM-head qmm -> argmax chain, no transformer layers
            @functools.partial(jax.jit, static_argnames=("n",))
            def loop(params, tok, n):
                from llamacog_tpu.ops.linear import qmatmul

                def body(i, state):
                    tok, acc = state
                    x = L.embed_tokens(params, tok[:, None], dtype=jnp.bfloat16)
                    x = L.rms_norm(x, params["output_norm"], cfg.rms_norm_eps)
                    logits = qmatmul(x, params["output"]).astype(jnp.float32)
                    nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                    return (nxt, acc + nxt)
                tok, acc = jax.lax.fori_loop(0, n, body, (tok, jnp.zeros((1,), jnp.int32)))
                return acc
            run = lambda n: timed(loop, params, jnp.array([5], jnp.int32), n)
        else:
            @functools.partial(jax.jit, static_argnames=("n",))
            def loop(params, cache, tok, seq_len, n, _v=variant, _raw=raw):
                def body(i, state):
                    cache, tok, seq_len, acc = state
                    out, cache = L.forward(
                        params, cfg, tok[:, None], seq_len[:, None], cache,
                        seq_len, dtype=jnp.bfloat16, kv_cap=1024,
                        return_raw=_raw,
                    )
                    if _v == "noargmax":
                        nxt = (out[:, 0, :8].sum(-1) * 0 + 5).astype(jnp.int32)
                    elif _raw:
                        nxt = (out[:, 0, :8].sum(-1) * 0 + 5).astype(jnp.int32)
                    else:
                        nxt = jnp.argmax(out[:, 0], axis=-1).astype(jnp.int32)
                    return (cache, nxt, seq_len + 1, acc + nxt)
                cache, tok, seq_len, acc = jax.lax.fori_loop(
                    0, n, body, (cache, tok, seq_len, jnp.zeros((1,), jnp.int32)))
                return acc
            run = lambda n: timed(loop, params, cache0, jnp.array([5], jnp.int32), seq0, n)

        run(16)  # compile
        best = 1e9
        for _ in range(2):
            t16, _ = run(16)
            t144, _ = run(144)
            best = min(best, (t144 - t16) / 128 * 1e3)
        print(f"{variant:10s}: {best:6.2f} ms/tok")

    L._ffn_moe = orig_moe
    L.masked_attention = orig_attn


if __name__ == "__main__":
    main()
