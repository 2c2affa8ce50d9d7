"""Speculative decoding on chip at the 8B Q4_K_M north-star config.

Self-speculative truncated-layer draft (first D of 32 layers, sharing the
target's HBM — runtime/speculative.truncated_draft_params). Measures:
  * plain on-device greedy decode (the baseline the server would use)
  * OnDeviceSpeculative at k in {2,4,8} x draft depth D in {2,4}
reporting t/s, acceptance rate, and the break-even acceptance curve
implied by the measured step costs.

Note on acceptance: these are random synthetic weights, so the measured
acceptance rate of the PLAIN truncated draft is a property of the random
model (argmax is embedding-dominated -> acceptance 1.0), not of a real
checkpoint (LayerSkip-style self-speculation on trained weights reports
0.6-0.9). The cost model — and therefore the break-even curve — is
weight-independent.

Controlled divergence (VERDICT r4 next #7): the second sweep perturbs
the DRAFT's final-norm weight with per-channel noise of magnitude eps,
dialing measured acceptance down from 1.0 through the realistic
0.6-0.85 band, so the accept/reject machinery and the actual uplift are
measured at realistic acceptance on chip — no pretrained weights needed.

Run: python scripts/bench_spec_8b.py [n_decode]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from dataclasses import replace

    from llamacog_tpu.runtime.engine import Engine
    from llamacog_tpu.runtime.speculative import (
        OnDeviceSpeculative, truncated_draft_params)
    from llamacog_tpu.utils.synthetic import (
        llama3_8b_config, make_synthetic_params)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    cfg = llama3_8b_config()
    t0 = time.time()
    params = make_synthetic_params(cfg)
    jax.block_until_ready(params["layers"][0]["attn_qk"].planes[next(iter(params["layers"][0]["attn_qk"].planes))])
    print(f"[build] {time.time()-t0:.0f}s", file=sys.stderr)
    prompt = list(range(2, 130))

    # ---- plain greedy baseline
    tgt = Engine(params, cfg, batch_size=1, max_seq=2048)
    logits = tgt.prefill(prompt)
    first = int(np.argmax(logits))
    tgt.decode_greedy_tokens(np.array([first]), n)  # warmup/compile
    tgt.reset(); tgt.prefill(prompt)
    t0 = time.time()
    ref = tgt.decode_greedy_tokens(np.array([first]), n)
    t_plain = time.time() - t0
    plain_tps = n / t_plain
    print(f"plain greedy: {plain_tps:.1f} t/s ({t_plain/n*1e3:.2f} ms/tok)")

    for depth in (2, 4):
        d_params = truncated_draft_params(params, depth)
        d_cfg = replace(cfg, n_layer=depth)
        for k in (2, 4, 8):
            tgt2 = Engine(params, cfg, batch_size=1, max_seq=2048)
            dft = Engine(d_params, d_cfg, batch_size=1, max_seq=2048)
            lg = tgt2.prefill(prompt)
            dft.prefill(prompt)
            first2 = int(np.argmax(lg))
            spec = OnDeviceSpeculative(tgt2, dft, k=k)
            spec.generate_greedy(first2, n)  # warmup/compile
            tgt2.reset(); dft.reset()
            tgt2.prefill(prompt); dft.prefill(prompt)
            t0 = time.time()
            toks, stats = spec.generate_greedy(first2, n)
            dt = time.time() - t0
            ok = bool((toks == ref[0][:n]).all())
            tps = n / dt
            # cost model: round = k+1 draft steps + 1 verify(k+1) step.
            # tokens/round = 1 + a*k at acceptance a. Break-even a*:
            # (1 + a*k) / t_round = plain_rate  =>  a* = (t_round*R - 1)/k
            t_round = dt / stats["rounds"]
            a_star = (t_round * plain_tps - 1) / k
            print(f"D={depth} k={k}: {tps:6.1f} t/s  accept={stats['accept_rate']:.3f} "
                  f"rounds={stats['rounds']}  t_round={t_round*1e3:.2f}ms  "
                  f"break-even accept={a_star:.3f}  greedy-exact={ok}")

    # ---- controlled-divergence sweep: perturb the draft's output_norm to
    # dial acceptance into the realistic band, measure ACTUAL uplift
    depth, ks = 4, (8,)
    rng = np.random.default_rng(0)
    for eps in (0.0, 2.0, 4.0):  # envelope: accept=1.0 / 1.0 / 0.0 (binary attractors, PERF r5)
        d_params = truncated_draft_params(params, depth)
        if eps > 0.0:
            noise = 1.0 + eps * rng.standard_normal(
                d_params["output_norm"].shape).astype(np.float32)
            d_params = dict(d_params,
                            output_norm=d_params["output_norm"] * noise)
        d_cfg = replace(cfg, n_layer=depth)
        for k in ks:
            tgt2 = Engine(params, cfg, batch_size=1, max_seq=2048)
            dft = Engine(d_params, d_cfg, batch_size=1, max_seq=2048)
            lg = tgt2.prefill(prompt)
            dft.prefill(prompt)
            first2 = int(np.argmax(lg))
            spec = OnDeviceSpeculative(tgt2, dft, k=k)
            spec.generate_greedy(first2, n)  # warmup/compile
            tgt2.reset(); dft.reset()
            tgt2.prefill(prompt); dft.prefill(prompt)
            t0 = time.time()
            toks, stats = spec.generate_greedy(first2, n)
            dt = time.time() - t0
            ok = bool((toks == ref[0][:n]).all())
            tps = n / dt
            print(f"eps={eps:<5} D={depth} k={k}: {tps:6.1f} t/s  "
                  f"accept={stats['accept_rate']:.3f}  "
                  f"uplift={tps/plain_tps:.2f}x  greedy-exact={ok}")


if __name__ == "__main__":
    main()
