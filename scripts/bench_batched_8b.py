"""Batched decode throughput at the north-star 8B Q4_K_M config.

Single-stream decode is weight-DMA-bound (bench.py: 0.92 of the HBM
roofline); batched streams share each step's 6 GB weight read, so
aggregate tokens/s should scale with B until compute (VPU dequant + MXU
matvec batch) catches up.  This measures that curve on the chip.

Usage: python scripts/bench_batched_8b.py [B ...]   (default 1 2 4 8 16)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax


def main():
    bs = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8, 16]
    from llamacog_tpu.runtime.engine import Engine
    from llamacog_tpu.utils.synthetic import (
        llama3_8b_config,
        make_synthetic_params,
    )

    config = llama3_8b_config()
    t0 = time.time()
    params = make_synthetic_params(config)
    jax.block_until_ready(params["layers"][0]["attn_qk"].planes[next(iter(params["layers"][0]["attn_qk"].planes))])
    print(f"[build] {time.time()-t0:.1f}s", file=sys.stderr)

    n = 256
    for b in bs:
        engine = Engine(params, config, batch_size=b, max_seq=1024)
        for row in range(b):
            engine.prefill([2, 3, 5, 7], row=row)
        first = np.full((b,), 11, np.int32)
        engine.decode_greedy_tokens(first, n)  # compile + warmup
        t1 = time.time()
        out = engine.decode_greedy_tokens(np.full((b,), 13, np.int32), n)
        dt = time.time() - t1
        assert out.shape == (b, n)
        total = b * n / dt
        print(f"B={b:3d}: {total:8.1f} t/s total "
              f"({n/dt:6.1f} t/s/stream, {dt/n*1e3:.2f} ms/step)")
        del engine  # free this B's cache before the next alloc
        engine = None


if __name__ == "__main__":
    main()
