"""llamacog-bench — throughput benchmark matrix (reference: tools/llama-bench).

Sweeps prompt-processing (pp) and token-generation (tg) sizes with warmup
and repetitions, reporting mean ± stddev tokens/s in markdown/json/csv.
"""

from __future__ import annotations

import argparse
import json
import statistics
import time

import numpy as np


def _fill_depth(engine, depth: int) -> None:
    """Pre-populate row 0's cache with `depth` tokens (llama-bench -d:
    measurements at an existing KV depth, tools/llama-bench README "-d")."""
    engine.clear_row(0)
    if depth > 0:
        engine.prefill(list((np.arange(depth) % 97 + 3).astype(int)))


def run_pp(engine, n_tokens: int, reps: int, depth: int = 0) -> list[float]:
    res = []
    toks = list((np.arange(n_tokens) % 100 + 3).astype(int))
    for _ in range(reps):
        _fill_depth(engine, depth)
        t0 = time.time()
        engine.prefill(toks)
        res.append(n_tokens / (time.time() - t0))
    return res


def run_tg(engine, n_tokens: int, reps: int, depth: int = 0) -> list[float]:
    res = []
    for _ in range(reps):
        _fill_depth(engine, depth)
        engine.prefill([3, 4, 5, 6])
        tok = np.array([5] * engine.batch_size)
        t0 = time.time()
        for _ in range(n_tokens):
            logits = engine.decode_one(tok)
            tok = np.array([int(np.argmax(logits[0]))] * engine.batch_size)
        res.append(n_tokens / (time.time() - t0))
    return res


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="llamacog-bench")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-p", "--pp", type=int, nargs="*", default=[128, 512])
    p.add_argument("-n", "--tg", type=int, nargs="*", default=[32, 128])
    p.add_argument("-r", "--reps", type=int, default=3)
    p.add_argument("-d", "--depth", type=int, nargs="*", default=[0],
                   help="KV depths to test at (llama-bench -d sweep)")
    p.add_argument("-c", "--ctx-size", type=int, default=2048)
    p.add_argument("--mode", choices=("quantized", "dequant"), default="quantized")
    p.add_argument("-o", "--output", choices=("md", "json", "csv", "sql"), default="md")
    p.add_argument("--device", choices=("auto", "cpu", "tpu"), default="auto")
    p.add_argument("--kv-type", default="dense")
    args = p.parse_args(argv)
    if args.device != "auto":
        import jax

        jax.config.update("jax_platforms", args.device)
    import jax
    import jax.numpy as jnp

    from ..models.loader import load_model
    from ..runtime.engine import Engine

    t0 = time.time()
    model = load_model(args.model, mode=args.mode, dtype=jnp.bfloat16)
    engine = Engine(model.params, model.config, max_seq=args.ctx_size,
                    kv_type=args.kv_type)
    load_s = time.time() - t0

    rows = []
    for d in args.depth:
        tag = f" @ d{d}" if d else ""
        for n in args.pp:
            run_pp(engine, n, 1, d)  # warmup/compile
            vals = run_pp(engine, n, args.reps, d)
            rows.append((f"pp{n}{tag}", statistics.mean(vals),
                         statistics.stdev(vals) if len(vals) > 1 else 0.0))
        for n in args.tg:
            run_tg(engine, min(n, 4), 1, d)  # warmup/compile
            vals = run_tg(engine, n, args.reps, d)
            rows.append((f"tg{n}{tag}", statistics.mean(vals),
                         statistics.stdev(vals) if len(vals) > 1 else 0.0))

    meta = {
        "model": model.config.metadata.get("general.name", args.model),
        "backend": jax.default_backend(),
        "load_s": round(load_s, 2),
    }
    if args.output == "json":
        print(json.dumps({"meta": meta,
                          "results": [{"test": t, "t/s": round(m, 2),
                                       "stddev": round(s, 2)} for t, m, s in rows]}))
    elif args.output == "sql":
        # llama-bench --output sql role: one table, one INSERT per test
        print("CREATE TABLE IF NOT EXISTS test (model TEXT, backend TEXT, "
              "test TEXT, avg_ts REAL, stddev_ts REAL);")
        for t, m, s_ in rows:
            mq = meta["model"].replace("'", "''")
            print(f"INSERT INTO test VALUES('{mq}', '{meta['backend']}', "
                  f"'{t}', {m:.2f}, {s_:.2f});")
    elif args.output == "csv":
        print("test,tps,stddev")
        for t, m, s in rows:
            print(f"{t},{m:.2f},{s:.2f}")
    else:
        print(f"| model | backend | test | t/s |")
        print(f"|---|---|---|---|")
        for t, m, s in rows:
            print(f"| {meta['model']} | {meta['backend']} | {t} | {m:.2f} ± {s:.2f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
