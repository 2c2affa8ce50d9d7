"""Long-context measurement on the 8B-shaped synthetic model (VERDICT #9).

Measures prefill TTFT at 4k/8k prompts and steady-state decode t/s at
multiple context depths. Run on the TPU: python scripts/bench_longctx.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    from llamacog_tpu.runtime.engine import Engine
    from llamacog_tpu.utils.synthetic import llama3_8b_config, make_synthetic_params

    max_seq = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    kv = sys.argv[2] if len(sys.argv) > 2 else "dense"
    cfg = llama3_8b_config()
    t0 = time.time()
    params = make_synthetic_params(cfg)
    jax.block_until_ready(params["layers"][0]["attn_qk"].planes[next(iter(params["layers"][0]["attn_qk"].planes))])
    print(f"[build] {time.time()-t0:.0f}s", file=sys.stderr)
    eng = Engine(params, cfg, batch_size=1, max_seq=max_seq, kv_type=kv)

    for plen in (4096, 8192):
        if plen > max_seq - 64:
            continue
        prompt = list(np.arange(2, 2 + plen) % 30000)
        eng.reset()
        eng.prefill(prompt)  # warmup/compile
        eng.reset()
        t0 = time.time()
        eng.prefill(prompt)
        dt = time.time() - t0
        print(f"prefill pp{plen}: {dt*1e3:.0f} ms TTFT ({plen/dt:.0f} t/s)")

    for depth in (1024, 8192, max_seq - 256):
        if depth > max_seq - 128:
            depth = max_seq - 256
        eng.reset()
        eng.seq_len[:] = depth  # decode against `depth` tokens of context
        eng.decode_greedy_tokens(np.array([5]), 128)  # warmup (same static n as timed)
        eng.reset()
        eng.seq_len[:] = depth
        n = 128
        t0 = time.time()
        eng.decode_greedy_tokens(np.array([7]), n)
        dt = time.time() - t0
        print(f"decode d={depth} ({kv}): {n/dt:.1f} t/s ({dt/n*1e3:.2f} ms/tok)")


if __name__ == "__main__":
    main()
