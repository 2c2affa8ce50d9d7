"""Per-op device-time budget of the 8B pp512 prefill step.

Captures an XPlane trace of Engine.prefill at T=512 and aggregates the
synchronous "XLA Ops" line (scripts/parse_xplane.py semantics) — names
the norm/rope/permute/KV-write glue between the GEMM kernels that the
knockout bisect (scripts/bisect_prefill.py) only bounds in aggregate.

Run: python scripts/profile_prefill8b.py [T]
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRACE = "/tmp/llamacog_trace_pp8b"


def main():
    t_len = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    import jax

    from llamacog_tpu.runtime.engine import Engine
    from llamacog_tpu.utils.synthetic import llama3_8b_config, make_synthetic_params

    cfg = llama3_8b_config()
    t0 = time.time()
    params = make_synthetic_params(cfg)
    jax.block_until_ready(params["layers"][0]["attn_qk"].planes[next(iter(params["layers"][0]["attn_qk"].planes))])
    print(f"[build] {time.time()-t0:.0f}s", file=sys.stderr)
    eng = Engine(params, cfg, batch_size=1, max_seq=2048)
    toks = list(range(2, 2 + t_len))
    eng.prefill(toks)  # compile+warm
    eng.reset()
    # timed (no trace): median of 5
    times = []
    for _ in range(5):
        eng.reset()
        t1 = time.time()
        eng.prefill(toks)
        times.append(time.time() - t1)
    med = sorted(times)[2]
    print(f"[timed] pp{t_len}: {med*1e3:.1f} ms median "
          f"({t_len/med:.0f} t/s; min {min(times)*1e3:.0f} max {max(times)*1e3:.0f})",
          file=sys.stderr)
    eng.reset()
    os.system(f"rm -rf {TRACE}")
    with jax.profiler.trace(TRACE):
        eng.prefill(toks)
    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(__file__), "parse_xplane.py"),
                    TRACE, "1"])


if __name__ == "__main__":
    main()
