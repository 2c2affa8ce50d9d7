"""Per-quant-format decode throughput sweep at 8B layer geometry.

Uniform-body synthetic models (utils/synthetic.py quant_mix) at the 8B
shape with n_layer=8 (build-time economy; per-layer cost is what matters),
tg128 single stream.  Reports t/s and the fraction of each format's own
HBM roofline, catching any kernel whose decode cost is VPU-bound.

Usage: python scripts/bench_formats.py [KIND ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

HBM_BW = float(os.environ.get("LLAMACOG_HBM_BW", 819e9))

DEFAULT = ["q4_0", "q8_0", "q2_k", "q3_k", "q4_k", "q5_k", "q6_k",
           "iq2_xs", "iq3_s", "iq4_xs", "iq1_s"]


def main():
    kinds = [k.lower() for k in sys.argv[1:]] or DEFAULT
    from bench import streamed_bytes  # repo-root bench.py helpers

    from llamacog_tpu.models.config import ModelConfig, RopeConfig
    from llamacog_tpu.runtime.engine import Engine
    from llamacog_tpu.utils.synthetic import make_synthetic_params

    cfg = ModelConfig(
        arch="llama", n_vocab=128256, n_ctx_train=8192, n_embd=4096,
        n_layer=8, n_head=32, n_head_kv=8, n_ff=14336,
        head_dim_k=128, head_dim_v=128,
        rope=RopeConfig(dim=128, freq_base=500000.0),
    )
    n = 128
    print(f"{'kind':8s} {'GB/step':>8s} {'t/s':>8s} {'roofline':>9s} {'frac':>6s}")
    for kind in kinds:
        t0 = time.time()
        params = make_synthetic_params(cfg, quant_mix=kind)
        jax.block_until_ready(params["layers"][0]["attn_qk"].planes[next(iter(params["layers"][0]["attn_qk"].planes))])
        wbytes = streamed_bytes(params)
        engine = Engine(params, cfg, batch_size=1, max_seq=256)
        engine.prefill([2, 3, 5])
        engine.decode_greedy_tokens(np.array([7]), n)  # compile+warmup
        t1 = time.time()
        engine.decode_greedy_tokens(np.array([11]), n)
        dt = time.time() - t1
        tps = n / dt
        roof = HBM_BW / wbytes
        print(f"{kind:8s} {wbytes/1e9:8.2f} {tps:8.1f} {roof:9.1f} "
              f"{tps/roof:6.3f}   (build+compile {time.time()-t0:.0f}s)")
        del engine, params


if __name__ == "__main__":
    main()
