"""llamacog-profile — JAX profiler harness (SURVEY §5.1 tracing role).

Captures an XPlane trace of prefill + decode steps (viewable in
TensorBoard/Perfetto) and prints a wall-clock phase summary. The
per-node-observation role of the reference's scheduler eval-callback
(ggml-backend.h:282) is covered by ops/linear.set_hook, which fires at
trace time inside jit (see tools/imatrix.py).

Usage: python -m llamacog_tpu.tools.profile -m model.gguf [--trace-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="llamacog-profile")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("--trace-dir", default="/tmp/llamacog_trace")
    p.add_argument("-c", "--ctx-size", type=int, default=1024)
    p.add_argument("-p", "--n-prompt", type=int, default=128)
    p.add_argument("-n", "--n-decode", type=int, default=64)
    p.add_argument("--device", choices=("auto", "cpu", "tpu"), default="auto")
    args = p.parse_args(argv)
    if args.device != "auto":
        import jax

        jax.config.update("jax_platforms", args.device)
    import jax
    import numpy as np

    from ..models.loader import load_model
    from ..runtime.engine import Engine

    t0 = time.time()
    model = load_model(args.model)
    t_load = time.time() - t0
    eng = Engine(model.params, model.config, batch_size=1, max_seq=args.ctx_size)
    prompt = list(range(2, 2 + args.n_prompt))

    # warmup/compile outside the trace so the capture shows steady state
    eng.prefill(prompt)
    eng.decode_greedy_tokens(np.array([5]), args.n_decode)
    eng.reset()

    with jax.profiler.trace(args.trace_dir):
        t1 = time.time()
        eng.prefill(prompt)
        t_prefill = time.time() - t1
        t2 = time.time()
        eng.decode_greedy_tokens(np.array([7]), args.n_decode)
        t_decode = time.time() - t2
    print(json.dumps({
        "load_s": round(t_load, 2),
        "prefill_ms": round(t_prefill * 1e3, 1),
        "prefill_tps": round(args.n_prompt / t_prefill, 1),
        "decode_ms_per_tok": round(t_decode / args.n_decode * 1e3, 2),
        "decode_tps": round(args.n_decode / t_decode, 1),
        "trace_dir": args.trace_dir,
    }))
    print(f"open with: tensorboard --logdir {args.trace_dir}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
