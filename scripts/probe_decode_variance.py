"""Probe run-to-run variance of the 8B Q4_K_M single-stream decode rate.

Builds the synthetic model once, then runs many timed decode segments,
printing each segment's t/s.  Used to diagnose the round-2 gap between
the driver-recorded bench (99.3 t/s) and the builder's 121-125 t/s.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax


def main():
    from llamacog_tpu.runtime.engine import Engine
    from llamacog_tpu.utils.synthetic import llama3_8b_config, make_synthetic_params

    n_seg = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_tok = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    config = llama3_8b_config()
    t0 = time.time()
    params = make_synthetic_params(config)
    jax.block_until_ready(params["layers"][0]["attn_qk"].planes["qs"])
    print(f"[build] {time.time()-t0:.1f}s", file=sys.stderr)

    engine = Engine(params, config, batch_size=1, max_seq=1024)
    prompt = list(range(2, 130))
    engine.prefill(prompt)
    engine.decode_greedy_tokens(np.array([5]), n_tok)  # compile + warmup
    cache0 = engine._greedy_loop._cache_size()

    rates = []
    for i in range(n_seg):
        engine.reset()
        engine.prefill(prompt)
        t1 = time.time()
        engine.decode_greedy_tokens(np.array([7]), n_tok)
        dt = time.time() - t1
        rates.append(n_tok / dt)
        print(f"[seg {i}] {n_tok/dt:7.1f} t/s ({dt/n_tok*1e3:.2f} ms/tok)")
    assert engine._greedy_loop._cache_size() == cache0, "recompile in timed region!"
    rates.sort()
    med = rates[len(rates) // 2]
    print(f"min {rates[0]:.1f}  med {med:.1f}  max {rates[-1]:.1f} t/s")


if __name__ == "__main__":
    main()
