"""Dump the optimized HLO of the 8B decode step (AOT, abstract inputs).

Finds where HLO-level slice/copy ops on weight planes come from — the
profiler showed `%slice-start` ops copying TN-row chunks of the planar
weight planes per token (scripts/profile_decode8b.py), which should not
exist: Pallas kernels DMA their own tiles.

Run: python scripts/dump_decode_hlo.py [n_layer] [out.txt]
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n_layer = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/decode_hlo.txt"

    from llamacog_tpu.runtime.engine import Engine
    from llamacog_tpu.utils.synthetic import llama3_8b_config, make_synthetic_params

    cfg = llama3_8b_config()
    cfg.n_layer = n_layer
    params = make_synthetic_params(cfg)
    eng = Engine(params, cfg, batch_size=1, max_seq=1024)

    tok = jnp.zeros((1,), jnp.int32)
    seq_len = jnp.zeros((1,), jnp.int32)
    pos_off = jnp.zeros((1,), jnp.int32)
    lowered = eng._greedy_loop.__wrapped__.lower(
        params, eng.cache, tok, seq_len, pos_off, 8, kv_cap=2048
    ) if hasattr(eng._greedy_loop, "__wrapped__") else None
    if lowered is None:
        # scoped() wraps the jit fn; call .lower on the underlying jit
        fn = eng._greedy_loop
        while hasattr(fn, "func"):
            fn = fn.func
        lowered = fn.lower(params, eng.cache, tok, seq_len, pos_off, 8,
                           kv_cap=2048)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out_path}")

    # summarize: slice/copy instructions touching big arrays
    for pat in ("slice-start", "copy-start", "dynamic-slice"):
        lines = [l.strip() for l in txt.splitlines() if pat in l and "=" in l]
        print(f"\n== {pat}: {len(lines)}")
        for l in lines[:8]:
            print("  ", l[:220])


if __name__ == "__main__":
    main()
