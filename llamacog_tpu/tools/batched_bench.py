"""batched-bench: parallel-sequence throughput grid.

Equivalent of the reference's tools/batched-bench (llama-batched-bench):
for each (PP, TG, PL) combination, time prompt processing of PL sequences of
PP tokens and TG decode steps at batch PL, and print the S_PP / S_TG / S
table (md or jsonl).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def run_grid(model_path: str, n_pp: list[int], n_tg: list[int], n_pl: list[int],
             ctx_size: int = 2048, dtype_name: str = "bf16", out=sys.stdout):
    import jax.numpy as jnp

    from ..models.loader import load_model
    from ..runtime.engine import Engine

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    model = load_model(model_path, dtype=dtype)
    rows = []
    for pl in sorted(set(n_pl)):
        engine = Engine(model.params, model.config, batch_size=pl, max_seq=ctx_size,
                        dtype=dtype)
        for pp in n_pp:
            for tg in n_tg:
                if pp + tg + 1 > ctx_size:
                    continue
                # warmup pass with identical shapes: exclude XLA compilation
                # from the timings (llama-bench also warms up)
                engine.reset()
                prompt = list(range(2, 2 + pp))
                engine.prefill(prompt, row=0)
                engine.decode_greedy_tokens(np.full(pl, 5, dtype=np.int32), tg)
                engine.reset()
                t0 = time.time()
                for row in range(pl):
                    engine.prefill(prompt, row=row)
                t_pp = time.time() - t0
                t0 = time.time()
                engine.decode_greedy_tokens(np.full(pl, 5, dtype=np.int32), tg)
                t_tg = time.time() - t0
                rows.append({
                    "PP": pp, "TG": tg, "B": pl,
                    "N_KV": pl * (pp + tg),
                    "T_PP s": round(t_pp, 3),
                    "S_PP t/s": round(pl * pp / t_pp, 2),
                    "T_TG s": round(t_tg, 3),
                    "S_TG t/s": round(pl * tg / t_tg, 2),
                    "T s": round(t_pp + t_tg, 3),
                    "S t/s": round(pl * (pp + tg) / (t_pp + t_tg), 2),
                })
    return rows


def print_md(rows, out=sys.stdout):
    if not rows:
        return
    cols = list(rows[0].keys())
    out.write("| " + " | ".join(cols) + " |\n")
    out.write("|" + "|".join(["---"] * len(cols)) + "|\n")
    for r in rows:
        out.write("| " + " | ".join(str(r[c]) for c in cols) + " |\n")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="llamacog-batched-bench")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-c", "--ctx-size", type=int, default=2048)
    p.add_argument("-npp", type=str, default="128,256")
    p.add_argument("-ntg", type=str, default="128")
    p.add_argument("-npl", type=str, default="1,2,4")
    p.add_argument("--output", choices=("md", "jsonl"), default="md")
    p.add_argument("--device", choices=("auto", "cpu", "tpu"), default="auto")
    args = p.parse_args(argv)
    if args.device != "auto":
        import jax

        jax.config.update("jax_platforms", args.device)
    parse = lambda s: [int(v) for v in s.split(",") if v]  # noqa: E731
    rows = run_grid(args.model, parse(args.npp), parse(args.ntg), parse(args.npl),
                    ctx_size=args.ctx_size)
    if args.output == "jsonl":
        for r in rows:
            print(json.dumps(r))
    else:
        print_md(rows)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
