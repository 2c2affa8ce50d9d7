"""llamacog-imatrix — importance matrix collection.

Role of the reference tools/imatrix: accumulate per-input-column mean
squared activations for every weight matmul (collector semantics of
imatrix.cpp:38-209, which hooks the scheduler eval callback).

Collection runs JITTED: the qmatmul hook (ops/linear.py) fires at trace
time, recording a per-matmul column sum-of-squares expression; the jitted
chunk step returns the whole stats dict as outputs, so a calibration pass
runs at compiled-forward speed instead of op-by-op interpretation (the
eval-callback role becomes "collect during trace, return as outputs").
MoE expert tensors accumulate per expert into an [n_exp*K] vector like the
reference's MUL_MAT_ID handling (imatrix.cpp:107-140).

Output: the reference .dat format (imatrix.cpp save_imatrix :262-289) —
consumed by llamacog-quantize --imatrix and by llama.cpp itself.
"""

from __future__ import annotations

import argparse
import functools
import json
import struct
import sys

import numpy as np

from ..ops import linear


def _register(params: dict) -> dict[int, str]:
    """id(weight or plane) -> GGUF tensor name, matching the reference's
    entry naming. Works on concrete params and on the traced pytree inside
    jit (the hook sees the same objects the trace reads)."""
    names: dict[int, str] = {}

    def reg(w, name):
        names[id(w)] = name
        if hasattr(w, "planes"):
            for p in w.planes.values():
                names[id(p)] = name

    if "output" in params:
        reg(params["output"], "output.weight")
    for il, layer in enumerate(params["layers"]):
        for key, w in layer.items():
            if key.endswith("_norm") or key == "exp_probs_b":
                continue
            reg(w, f"blk.{il}.{key}.weight")
    return names


class ImatrixCollector:
    def __init__(self, params: dict):
        self.name_by_id = _register(params)
        self.values: dict[str, np.ndarray] = {}
        self.counts: dict[str, np.ndarray] = {}
        self.ncall = 0

    def _add(self, name: str, sq: np.ndarray, cnt: np.ndarray) -> None:
        if name not in self.values:
            self.values[name] = np.asarray(sq, np.float64).copy()
            self.counts[name] = np.asarray(cnt, np.float64).copy()
        else:
            self.values[name] += sq
            self.counts[name] += cnt

    def __call__(self, w, x, ids=None) -> None:
        """Unjitted-path hook (w, activations[, per-row expert ids])."""
        name = self.name_by_id.get(id(w))
        if name is None:
            return
        xa = np.asarray(x, dtype=np.float32).reshape(-1, x.shape[-1])
        if ids is None:
            sq = (xa * xa).sum(axis=0)
            cnt = np.full(xa.shape[1], xa.shape[0], np.float64)
        else:
            n_exp = w.shape[0]
            k = xa.shape[1]
            sq = np.zeros((n_exp, k), np.float64)
            cnt = np.zeros((n_exp, k), np.float64)
            np.add.at(sq, np.asarray(ids), xa.astype(np.float64) ** 2)
            np.add.at(cnt, np.asarray(ids), 1.0)
            sq, cnt = sq.reshape(-1), cnt.reshape(-1)
        self._add(name, sq, cnt)

    def absorb(self, stats: dict) -> None:
        """Merge one jitted chunk's {name: (sumsq, counts)} outputs."""
        for name, (sq, cnt) in stats.items():
            self._add(name, np.asarray(sq), np.asarray(cnt))
        self.ncall += 1

    def save(self, path: str, last_prompt: str = "") -> None:
        """Reference .dat format: n_entries, {len,name,ncall,nval,vals}, last_call, fname."""
        entries = sorted(self.values)
        with open(path, "wb") as f:
            f.write(struct.pack("<i", len(entries)))
            for name in entries:
                vals = self.values[name] / np.maximum(self.counts[name], 1) * max(self.ncall, 1)
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


def _make_stats_step(cfg, dtype):
    """Jitted chunk forward returning {name: (sumsq[K or n_exp*K], counts)}.

    The linear-hook fires during TRACING; each call appends a traced
    reduction to the accumulator dict, which the jit returns as outputs —
    one compile per chunk-length bucket, then calibration runs at full
    compiled speed."""
    import jax
    import jax.numpy as jnp

    from ..models.llama import forward
    from ..runtime.kv_cache import KVCache

    @functools.partial(jax.jit, static_argnames=("t",))
    def step(params, toks, t):
        names = _register(params)
        acc: dict[str, tuple] = {}

        def hook(w, x, ids=None):
            nm = names.get(id(w))
            if nm is None:
                return
            xa = x.astype(jnp.float32).reshape(-1, x.shape[-1])
            if ids is None:
                sq = jnp.sum(xa * xa, axis=0)
                cnt = jnp.full((xa.shape[1],), float(xa.shape[0]), jnp.float32)
            else:
                n_exp = w.shape[0]
                sq2 = jnp.zeros((n_exp, xa.shape[1]), jnp.float32).at[ids].add(xa * xa)
                c2 = jnp.zeros((n_exp, xa.shape[1]), jnp.float32).at[ids].add(1.0)
                sq, cnt = sq2.reshape(-1), c2.reshape(-1)
            if nm in acc:
                psq, pc = acc[nm]
                acc[nm] = (psq + sq, pc + cnt)
            else:
                acc[nm] = (sq, cnt)

        cache = KVCache.create(
            cfg.n_layer, 1, t, cfg.n_head_kv, cfg.head_dim_k, cfg.head_dim_v,
            dtype=dtype,
        )
        wp = jnp.zeros((1,), jnp.int32)
        pos = wp[:, None] + jnp.arange(t)[None, :]
        old = linear.get_hook()
        linear.set_hook(hook)
        try:
            forward(params, cfg, toks, pos, cache, wp, dtype=dtype)
        finally:
            linear.set_hook(old)
        return acc

    return step


def collect_imatrix(model, text: str, n_ctx: int = 512, max_chunks: int = 0,
                    progress=None) -> ImatrixCollector:
    import jax.numpy as jnp

    collector = ImatrixCollector(model.params)
    tokens = model.tokenizer.tokenize(text, add_special=False, parse_special=False)
    n_chunk = max(len(tokens) // n_ctx, 1)
    if max_chunks:
        n_chunk = min(n_chunk, max_chunks)
    step = _make_stats_step(model.config, jnp.float32)
    for c in range(n_chunk):
        chunk = tokens[c * n_ctx : (c + 1) * n_ctx]
        if not chunk:
            break
        if model.vocab.add_bos and model.vocab.bos_id >= 0:
            chunk = [model.vocab.bos_id] + list(chunk[:-1])
        toks = jnp.asarray(np.asarray(chunk, dtype=np.int32)[None, :])
        stats = step(model.params, toks, len(chunk))
        collector.absorb(stats)
        if progress:
            progress(c + 1, n_chunk)
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
