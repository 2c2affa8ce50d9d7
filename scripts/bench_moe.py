"""On-chip sparse-MoE decode validation (BASELINE config 4, depth-scaled).

Mixtral layer geometry with quantized experts: decode must stream only the
top-k experts' bytes. Reported ms/step vs the sparse and dense byte floors
shows which regime the kernel hits. Run: python scripts/bench_moe.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    from llamacog_tpu.runtime.engine import Engine
    from llamacog_tpu.quant.planar import QuantTensor
    from llamacog_tpu.utils.synthetic import make_synthetic_params, mixtral_shaped_config

    cfg = mixtral_shaped_config(n_layer=int(sys.argv[1]) if len(sys.argv) > 1 else 8)
    t0 = time.time()
    params = make_synthetic_params(cfg)
    jax.block_until_ready(params["layers"][0]["ffn_gate_up_exps"].planes["qs"])
    print(f"[build] {time.time()-t0:.0f}s", file=sys.stderr)

    def nbytes(t):
        return t.nbytes if isinstance(t, QuantTensor) else t.size * t.dtype.itemsize

    expert_bytes = attn_bytes = 0
    for layer in params["layers"]:
        for k, w in layer.items():
            if k.endswith("_exps"):
                expert_bytes += nbytes(w)
            else:
                attn_bytes += nbytes(w)
    head = nbytes(params["output"])
    k_frac = cfg.n_expert_used / cfg.n_expert
    sparse = expert_bytes * k_frac + attn_bytes + head
    dense = expert_bytes + attn_bytes + head
    print(f"expert bytes {expert_bytes/1e9:.2f} GB; sparse/step {sparse/1e9:.2f} GB; "
          f"dense/step {dense/1e9:.2f} GB")

    eng = Engine(params, cfg, batch_size=1, max_seq=1024)
    eng.prefill(list(range(2, 66)))
    n = 128
    eng.decode_greedy_tokens(np.array([5]), n)  # warmup/compile (same static n!)
    dt = 1e9
    for _ in range(2):
        t0 = time.time()
        eng.decode_greedy_tokens(np.array([7]), n)
        dt = min(dt, (time.time() - t0) / n)
    bw = 819e9
    print(f"decode: {dt*1e3:.2f} ms/tok ({1/dt:.1f} t/s); "
          f"sparse floor {sparse/bw*1e3:.2f} ms, dense floor {dense/bw*1e3:.2f} ms")
    if dt < dense / bw:
        print("=> faster than the all-expert byte floor: sparsity confirmed")


if __name__ == "__main__":
    main()
