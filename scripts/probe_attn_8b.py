"""Size the 8B decode attention cost: dense vs q8_0 KV vs attention knocked
out, same build, back-to-back on the chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def measure(engine, n=512, label=""):
    prompt = list(range(2, 130))
    engine.prefill(prompt)
    engine.decode_greedy_tokens(np.array([5]), n)  # compile+warm
    best = 1e9
    for _ in range(2):
        engine.reset()
        engine.prefill(prompt)
        t1 = time.time()
        engine.decode_greedy_tokens(np.array([7]), n)
        best = min(best, time.time() - t1)
    print(f"{label:24s}: {n/best:7.1f} t/s ({best/n*1e3:.2f} ms/tok)")
    return best / n


def main():
    import llamacog_tpu.models.llama as L
    from llamacog_tpu.runtime.engine import Engine
    from llamacog_tpu.utils.synthetic import llama3_8b_config, make_synthetic_params

    cfg = llama3_8b_config()
    t0 = time.time()
    params = make_synthetic_params(cfg)
    jax.block_until_ready(params["layers"][0]["attn_qk"].planes["qs"])
    print(f"[build] {time.time()-t0:.0f}s", file=sys.stderr)

    kvs = sys.argv[1].split(",") if len(sys.argv) > 1 else ["dense", "q8_0"]
    for kv in kvs:
        eng = Engine(params, cfg, batch_size=1, max_seq=1024, kv_type=kv)
        measure(eng, label=f"kv={kv}")
        del eng

    # attention knocked out entirely (sizes the prize)
    orig = L.masked_attention
    from llamacog_tpu.ops.pallas import flash_q8

    def attn_zero(q, k_old, v_old, m, scale, **kw):
        B, T, H = q.shape[0], q.shape[1], q.shape[2]
        Dv = (kw.get("v_cur") if kw.get("v_cur") is not None else v_old).shape[-1]
        return jnp.zeros((B, T, H, Dv), q.dtype)

    L.masked_attention = attn_zero
    os.environ["LLAMACOG_FLASH_Q8"] = "0"
    eng = Engine(params, cfg, batch_size=1, max_seq=1024)
    measure(eng, label="noattn (masked path)")
    L.masked_attention = orig
    os.environ["LLAMACOG_FLASH_Q8"] = "1"


if __name__ == "__main__":
    main()
