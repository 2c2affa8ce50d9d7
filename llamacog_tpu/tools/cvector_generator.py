"""cvector-generator: build a control vector from positive/negative prompt
pairs (reference tools/cvector-generator/cvector-generator.cpp: per-layer
hidden-state differences -> PCA principal direction -> `direction.<il>`
tensors in a GGUF, loadable via runtime/lora.load_control_vector).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def collect_layer_diffs(model, prompts_pos: list[str], prompts_neg: list[str],
                        ctx_size: int = 256, dtype=None):
    """Per layer: rows of (hidden_pos - hidden_neg) at the last token."""
    import jax.numpy as jnp

    from ..models.llama import forward
    from ..runtime.kv_cache import KVCache

    cfg = model.config
    diffs: list[list[np.ndarray]] = [[] for _ in range(cfg.n_layer)]

    def last_hiddens(text: str) -> list[np.ndarray]:
        ids = model.tokenizer.tokenize(text, add_special=True)
        t = len(ids)
        cache = KVCache.create(cfg.n_layer, 1, t, cfg.n_head_kv, cfg.head_dim_k,
                               cfg.head_dim_v, dtype=jnp.float32)
        toks = jnp.asarray(np.asarray(ids, np.int32)[None])
        wp = jnp.zeros((1,), jnp.int32)
        pos = wp[:, None] + jnp.arange(t)[None, :]
        # observe the residual stream: rerun forward per layer prefix
        outs = []
        params = dict(model.params)
        for nl in range(1, cfg.n_layer + 1):
            params["layers"] = model.params["layers"][:nl]
            h, _ = forward(params, cfg, toks, pos, cache, wp, dtype=jnp.float32,
                           return_hidden=True)
            outs.append(np.asarray(h[0, -1]))
        return outs

    for p, n in zip(prompts_pos, prompts_neg):
        hp = last_hiddens(p)
        hn = last_hiddens(n)
        for il in range(cfg.n_layer):
            diffs[il].append(hp[il] - hn[il])
    return [np.stack(d) for d in diffs]


def pca_direction(rows: np.ndarray) -> np.ndarray:
    """First principal component via power iteration on the (uncentered)
    covariance — the reference's PCA over diff matrices."""
    x = rows.astype(np.float64)
    cov = x.T @ x
    v = np.ones(cov.shape[0])
    v /= np.linalg.norm(v)
    for _ in range(100):
        v2 = cov @ v
        nrm = np.linalg.norm(v2)
        if nrm < 1e-12:
            break
        v2 /= nrm
        if np.abs(v2 @ v) > 1.0 - 1e-10:
            v = v2
            break
        v = v2
    # orient: positive prompts should project positively
    if np.mean(x @ v) < 0:
        v = -v
    return v.astype(np.float32)


def generate_cvector(model_path: str, out_path: str, prompts_pos: list[str],
                     prompts_neg: list[str]) -> int:
    import jax.numpy as jnp

    from ..gguf import GGUFWriter
    from ..models.loader import load_model

    model = load_model(model_path, mode="dequant", dtype=jnp.float32)
    diffs = collect_layer_diffs(model, prompts_pos, prompts_neg)
    w = GGUFWriter(out_path)
    w.add("general.architecture", "controlvector")
    w.add("controlvector.model_hint", model.config.arch)
    w.add("controlvector.layer_count", model.config.n_layer)
    for il, rows in enumerate(diffs):
        w.add_tensor(f"direction.{il}", pca_direction(rows))
    w.write()
    return model.config.n_layer


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="llamacog-cvector-generator")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-o", "--output", default="control_vector.gguf")
    p.add_argument("--positive-file", required=True)
    p.add_argument("--negative-file", required=True)
    p.add_argument("--device", choices=("auto", "cpu", "tpu"), default="auto")
    args = p.parse_args(argv)
    if args.device != "auto":
        import jax

        jax.config.update("jax_platforms", args.device)
    pos = [l for l in open(args.positive_file, encoding="utf-8").read().splitlines() if l]
    neg = [l for l in open(args.negative_file, encoding="utf-8").read().splitlines() if l]
    if len(pos) != len(neg):
        print("positive and negative files must have the same number of lines",
              file=sys.stderr)
        return 1
    n = generate_cvector(args.model, args.output, pos, neg)
    print(f"wrote {n} directions -> {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
