"""llamacog-imatrix — importance matrix collection.

Role of the reference tools/imatrix: accumulate per-input-column mean squared
activations for every weight matmul (collector semantics of
imatrix.cpp:38-209, which hooks the scheduler eval callback). Here the hook
is a collector installed on qmatmul (ops/linear.py); the calibration forward
runs unjitted so the hook sees real arrays.

Output: the reference .dat format (imatrix.cpp save_imatrix :262-289) —
consumed by llamacog-quantize --imatrix and by llama.cpp itself.
"""

from __future__ import annotations

import argparse
import json
import struct
import sys

import numpy as np

from ..ops import linear


class ImatrixCollector:
    def __init__(self, params: dict):
        self.name_by_id: dict[int, str] = {}
        self.values: dict[str, np.ndarray] = {}
        self.counts: dict[str, int] = {}
        self.ncall = 0

        def reg(w, name):
            self.name_by_id[id(w)] = name
            if hasattr(w, "planes"):
                for p in w.planes.values():
                    self.name_by_id[id(p)] = name

        if "output" in params:
            reg(params["output"], "output.weight")
        for il, layer in enumerate(params["layers"]):
            for key, w in layer.items():
                if key.endswith("_norm") or key == "exp_probs_b":
                    continue
                reg(w, f"blk.{il}.{key}.weight")

    def __call__(self, w, x) -> None:
        name = self.name_by_id.get(id(w))
        if name is None:
            return
        xa = np.asarray(x, dtype=np.float32).reshape(-1, x.shape[-1])
        sq = (xa * xa).sum(axis=0)
        if name not in self.values:
            self.values[name] = sq
            self.counts[name] = xa.shape[0]
        else:
            self.values[name] += sq
            self.counts[name] += xa.shape[0]

    def save(self, path: str, last_prompt: str = "") -> None:
        """Reference .dat format: n_entries, {len,name,ncall,nval,vals}, last_call, fname."""
        entries = sorted(self.values)
        with open(path, "wb") as f:
            f.write(struct.pack("<i", len(entries)))
            for name in entries:
                vals = self.values[name] / max(self.counts[name], 1) * max(self.ncall, 1)
                nb = name.encode("utf-8")
                f.write(struct.pack("<i", len(nb)))
                f.write(nb)
                f.write(struct.pack("<i", max(self.ncall, 1)))
                f.write(struct.pack("<i", len(vals)))
                f.write(vals.astype("<f4").tobytes())
            f.write(struct.pack("<i", max(self.ncall, 1)))
            pb = last_prompt.encode("utf-8")[:255]
            f.write(struct.pack("<i", len(pb)))
            f.write(pb)


def collect_imatrix(model, text: str, n_ctx: int = 512, max_chunks: int = 0,
                    progress=None) -> ImatrixCollector:
    import jax.numpy as jnp

    from ..models.llama import forward
    from ..runtime.kv_cache import KVCache

    collector = ImatrixCollector(model.params)
    tokens = model.tokenizer.tokenize(text, add_special=False, parse_special=False)
    n_chunk = max(len(tokens) // n_ctx, 1)
    if max_chunks:
        n_chunk = min(n_chunk, max_chunks)
    cfg = model.config
    old_hook = linear.get_hook()
    linear.set_hook(collector)
    try:
        for c in range(n_chunk):
            chunk = tokens[c * n_ctx : (c + 1) * n_ctx]
            if not chunk:
                break
            if model.vocab.add_bos and model.vocab.bos_id >= 0:
                chunk = [model.vocab.bos_id] + list(chunk[:-1])
            t = len(chunk)
            cache = KVCache.create(
                cfg.n_layer, 1, t, cfg.n_head_kv, cfg.head_dim_k, cfg.head_dim_v,
                dtype=jnp.float32,
            )
            toks = jnp.asarray(np.asarray(chunk, dtype=np.int32)[None, :])
            wp = jnp.zeros((1,), jnp.int32)
            pos = wp[:, None] + jnp.arange(t)[None, :]
            forward(model.params, cfg, toks, pos, cache, wp, dtype=jnp.float32)
            collector.ncall += 1
            if progress:
                progress(c + 1, n_chunk)
    finally:
        linear.set_hook(old_hook)
    return collector


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="llamacog-imatrix")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-f", "--file", required=True)
    p.add_argument("-o", "--output", default="imatrix.dat")
    p.add_argument("-c", "--ctx-size", type=int, default=512)
    p.add_argument("--max-chunks", type=int, default=0)
    p.add_argument("--device", choices=("auto", "cpu", "tpu"), default="auto")
    args = p.parse_args(argv)
    if args.device != "auto":
        import jax

        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp

    from ..models.loader import load_model

    model = load_model(args.model, mode="dequant", dtype=jnp.float32)
    text = open(args.file, encoding="utf-8").read()

    def progress(done, total):
        print(f"[{done}/{total}]", file=sys.stderr)

    col = collect_imatrix(model, text, n_ctx=args.ctx_size, max_chunks=args.max_chunks,
                          progress=progress)
    col.save(args.output, last_prompt=args.file)
    print(json.dumps({"entries": len(col.values), "chunks": col.ncall,
                      "output": args.output}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
