"""llamacog-perplexity — wikitext-style perplexity and KL-divergence.

Protocol matches the reference exactly (tools/perplexity/perplexity.cpp:441,
SURVEY §8.3): the corpus is tokenized once; split into non-overlapping n_ctx
chunks; each chunk is decoded with a cleared KV cache and its first token
replaced by BOS; NLL accumulates only over the second half of each chunk
(logit at position j predicts token j+1, j in [n_ctx/2, n_ctx-1)).

The --save-logits / --kl-divergence pair mirrors --kl-divergence-base:
full-vocab log-probs are stored per position for later KLD/Δp stats against
a higher-precision run.
"""

from __future__ import annotations

import argparse
import json
import math
import sys

import numpy as np


def log_softmax_rows(logits: np.ndarray) -> np.ndarray:
    m = logits.max(axis=-1, keepdims=True)
    x = logits - m
    return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))


def compute_perplexity(
    engine,
    tokenizer,
    vocab,
    text: str,
    n_ctx: int = 512,
    logits_hook=None,
    progress=None,
):
    """Returns (ppl, nll_mean, nll_std_err, count)."""
    tokens = tokenizer.tokenize(text, add_special=False, parse_special=False)
    n_chunk = len(tokens) // n_ctx
    if n_chunk < 1:
        raise ValueError(f"corpus too small: {len(tokens)} tokens < n_ctx {n_ctx}")
    first = n_ctx // 2
    nll = 0.0
    nll2 = 0.0
    count = 0
    for c in range(n_chunk):
        chunk = list(tokens[c * n_ctx : (c + 1) * n_ctx])
        if vocab.add_bos and vocab.bos_id >= 0:
            chunk[0] = vocab.bos_id
        engine.clear_row(0)
        logits = engine.prefill_logits(chunk, row=0)  # [n_ctx, V] f32
        lp = log_softmax_rows(logits[first : n_ctx - 1].astype(np.float64))
        targets = np.asarray(chunk[first + 1 : n_ctx])
        tl = lp[np.arange(lp.shape[0]), targets]
        nll += -tl.sum()
        nll2 += (tl**2).sum()
        count += tl.shape[0]
        if logits_hook is not None:
            logits_hook(c, lp, targets)
        if progress is not None:
            progress(c + 1, n_chunk, math.exp(nll / count))
    mean = nll / count
    var = nll2 / count - mean * mean
    return math.exp(mean), mean, math.sqrt(max(var, 0.0) / count), count


def compute_kld(base_logprobs: np.ndarray, cur_logprobs: np.ndarray) -> dict:
    """KLD and top-token agreement between two [N, V] log-prob sets."""
    p = np.exp(base_logprobs)
    kld = (p * (base_logprobs - cur_logprobs)).sum(axis=-1)
    same_top = (base_logprobs.argmax(-1) == cur_logprobs.argmax(-1)).mean()
    return {
        "kld_mean": float(kld.mean()),
        "kld_max": float(kld.max()),
        "kld_p99": float(np.quantile(kld, 0.99)),
        "same_top_p": float(same_top),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="llamacog-perplexity")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-f", "--file", required=True, help="text corpus")
    p.add_argument("-c", "--ctx-size", type=int, default=512)
    p.add_argument("--mode", choices=("quantized", "dequant"), default="quantized")
    p.add_argument("--dtype", choices=("bf16", "f32"), default="bf16")
    p.add_argument("--device", choices=("auto", "cpu", "tpu"), default="auto")
    p.add_argument("--save-logits", help="save per-position log-probs (npz)")
    p.add_argument("--kl-divergence-base", help="compare against saved log-probs (npz)")
    p.add_argument("--max-chunks", type=int, default=0)
    args = p.parse_args(argv)

    if args.device != "auto":
        import jax

        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp

    from ..models.loader import load_model
    from ..runtime.engine import Engine

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = load_model(args.model, mode=args.mode, dtype=dtype)
    engine = Engine(model.params, model.config, max_seq=args.ctx_size, dtype=dtype)

    text = open(args.file, encoding="utf-8").read()
    if args.max_chunks:
        toks = model.tokenizer.tokenize(text, add_special=False)
        toks = toks[: args.max_chunks * args.ctx_size]
        text = model.vocab.detokenize(toks)

    saved: list[np.ndarray] = []

    def hook(c, lp, targets):
        if args.save_logits:
            saved.append(lp.astype(np.float16))

    def progress(done, total, ppl):
        print(f"[{done}/{total}] ppl={ppl:.4f}", file=sys.stderr)

    ppl, mean, err, count = compute_perplexity(
        engine, model.tokenizer, model.vocab, text, n_ctx=args.ctx_size,
        logits_hook=hook, progress=progress,
    )
    result = {"ppl": round(ppl, 6), "nll": round(mean, 6), "err": round(err, 6), "tokens": count}

    if args.save_logits:
        np.savez_compressed(args.save_logits, logprobs=np.concatenate(saved, axis=0))
        print(f"saved log-probs to {args.save_logits}", file=sys.stderr)
    if args.kl_divergence_base:
        base = np.load(args.kl_divergence_base)["logprobs"].astype(np.float64)
        cur_chunks: list[np.ndarray] = []

        def hook2(c, lp, targets):
            cur_chunks.append(lp.astype(np.float16))

        # recompute with hook capturing (saved during main pass if also saving)
        if not saved:
            engine.clear_row(0)
            compute_perplexity(
                engine, model.tokenizer, model.vocab, text, n_ctx=args.ctx_size,
                logits_hook=hook2,
            )
            cur = np.concatenate(cur_chunks, axis=0).astype(np.float64)
        else:
            cur = np.concatenate(saved, axis=0).astype(np.float64)
        n = min(len(base), len(cur))
        result.update(compute_kld(base[:n], cur[:n]))

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
