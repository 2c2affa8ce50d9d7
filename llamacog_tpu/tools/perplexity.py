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


def _common_prefix(seqs: list[list[int]]) -> int:
    n = min(len(s) for s in seqs)
    for k in range(n):
        t = seqs[0][k]
        if any(s[k] != t for s in seqs[1:]):
            return k
    return n


def _score_endings(engine, seqs: list[list[int]], prefix: int) -> list[float]:
    """Mean log-prob per ending: the first ending token is scored from the
    logit at the prefix's last position, the rest from the ending's own rows
    (reference hellaswag_score, tools/perplexity/perplexity.cpp:962-969).
    The common prefix is prefilled once and reused via KV rollback."""
    prefix = max(prefix, 1)  # BOS normally guarantees ≥1; degrade gracefully
    engine.clear_row(0)
    lp_pre = log_softmax_rows(
        np.asarray(engine.prefill_logits(seqs[0][:prefix], row=0), np.float64))
    save = int(engine.seq_len[0])
    out = []
    for s in seqs:
        tail = list(s[prefix:])
        total = lp_pre[-1][tail[0]]
        if len(tail) > 1:
            engine.seq_len[0] = save
            la = log_softmax_rows(
                np.asarray(engine.prefill_logits(tail, row=0), np.float64))
            total += sum(la[j][tail[j + 1]] for j in range(len(tail) - 1))
        out.append(total / len(tail))
    engine.seq_len[0] = save
    return out


def _wilson(freq: float, n: int) -> tuple[float, float]:
    za = 1.95996398454
    z = za * za / n
    cnf = z * math.sqrt(n * (4.0 * freq * (1 - freq) + z)) / (za + za)
    return (freq + z * 0.5 - cnf) / (1.0 + z), (freq + z * 0.5 + cnf) / (1.0 + z)


def score_hellaswag(engine, tokenizer, text: str, n_tasks: int = 0,
                    progress=None) -> dict:
    """HellaSwag acc_norm over the reference's 6-line-per-task format
    (tools/perplexity/perplexity.cpp:741: context / gold index / 4 endings);
    ending picked by max mean token log-prob."""
    lines = text.splitlines()
    if len(lines) % 6:
        raise ValueError("hellaswag input: line count not a multiple of 6")
    total = len(lines) // 6
    if n_tasks:
        total = min(n_tasks, total)
    acc = 0
    for i in range(total):
        ctx_str, gold = lines[6 * i], int(lines[6 * i + 1])
        seqs = [tokenizer.tokenize(ctx_str + " " + lines[6 * i + 2 + j],
                                   add_special=True) for j in range(4)]
        scores = _score_endings(engine, seqs, _common_prefix(seqs))
        acc += int(np.argmax(scores)) == gold
        if progress is not None:
            progress(i + 1, total, acc / (i + 1))
    freq = acc / total
    lo, hi = _wilson(freq, total)
    return {"hellaswag_acc": round(100 * freq, 4), "tasks": total,
            "ci95": [round(100 * lo, 4), round(100 * hi, 4)]}


def _parse_winogrande_csv(text: str) -> list[dict]:
    """index,sentence-with-_,choice1,choice2,answer(1|2); the sentence may be
    double-quoted (reference load_winogrande_from_csv)."""
    import csv as _csv
    import io

    tasks = []
    for row in _csv.reader(io.StringIO(text)):
        if len(row) < 5 or "_" not in row[1]:
            continue
        first, _, second = row[1].partition("_")
        try:
            answer = int(row[4])
        except ValueError:
            continue
        if answer not in (1, 2):
            continue
        tasks.append({"first": first, "second": second,
                      "choices": [row[2], row[3]], "answer": answer})
    return tasks


def score_winogrande(engine, tokenizer, text: str, n_tasks: int = 0,
                     progress=None) -> dict:
    """Winogrande: each task scores full = first+choice+second for both
    choices by mean log-prob over the SECOND part (after the choice when both
    tails are long enough — k_min_trailing_ctx=3 — else after the common
    prefix), excluding the final token when >1 remain (reference
    winogrande_score, tools/perplexity/perplexity.cpp:1098,1227-1266)."""
    tasks = _parse_winogrande_csv(text)
    if n_tasks:
        tasks = tasks[:n_tasks]
    if not tasks:
        raise ValueError("no winogrande tasks parsed")
    k_min_trailing = 3
    n_correct = 0
    for i, t in enumerate(tasks):
        seqs = [tokenizer.tokenize(t["first"] + c + t["second"],
                                   add_special=True) for c in t["choices"]]
        n_bases = [len(tokenizer.tokenize(t["first"] + c, add_special=True))
                   for c in t["choices"]]
        prefix = _common_prefix(seqs)
        skip_choice = all(len(s) - prefix > k_min_trailing for s in seqs)
        scores = []
        for s, n_base_full in zip(seqs, n_bases):
            n_base = n_base_full if skip_choice else prefix
            last = 1 if len(s) - n_base > 1 else 0
            engine.clear_row(0)
            lp = log_softmax_rows(
                np.asarray(engine.prefill_logits(list(s), row=0), np.float64))
            sc = sum(lp[j][s[j + 1]]
                     for j in range(n_base - 1, len(s) - 1 - last))
            scores.append(sc / (len(s) - n_base - last))
        n_correct += (1 if scores[0] > scores[1] else 2) == t["answer"]
        if progress is not None:
            progress(i + 1, len(tasks), n_correct / (i + 1))
    p = n_correct / len(tasks)
    sigma = 100.0 * math.sqrt(p * (1 - p) / max(len(tasks) - 1, 1))
    return {"winogrande_acc": round(100 * p, 4), "tasks": len(tasks),
            "sigma": round(sigma, 4)}


def score_multiple_choice(engine, tokenizer, text: str, n_tasks: int = 0,
                          progress=None) -> dict:
    """MMLU-style multiple choice from JSONL lines
    {"question": str, "answers": [str], "label": int} — same scoring as the
    reference's binary-format multiple_choice_score
    (tools/perplexity/perplexity.cpp:1343-1402: tokenize question+" "+answer
    with BOS, mean log-prob per answer past the common prefix, argmax)."""
    tasks = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        d = json.loads(line)
        if d.get("question") and d.get("answers"):
            tasks.append(d)
    if n_tasks:
        tasks = tasks[:n_tasks]
    if not tasks:
        raise ValueError("no multiple-choice tasks parsed")
    acc = 0
    for i, t in enumerate(tasks):
        seqs = [tokenizer.tokenize(t["question"] + " " + a, add_special=True)
                for a in t["answers"]]
        scores = _score_endings(engine, seqs, _common_prefix(seqs))
        acc += int(np.argmax(scores)) == int(t["label"])
        if progress is not None:
            progress(i + 1, len(tasks), acc / (i + 1))
    freq = acc / len(tasks)
    lo, hi = _wilson(freq, len(tasks))
    return {"multiple_choice_acc": round(100 * freq, 4), "tasks": len(tasks),
            "ci95": [round(100 * lo, 4), round(100 * hi, 4)]}


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
    p.add_argument("--hellaswag", action="store_true",
                   help="score HellaSwag acc_norm (6-line-per-task file)")
    p.add_argument("--winogrande", action="store_true",
                   help="score Winogrande (csv: idx,sentence-with-_,c1,c2,answer)")
    p.add_argument("--multiple-choice", action="store_true",
                   help="score multiple choice (jsonl: question/answers/label)")
    p.add_argument("--n-tasks", type=int, default=0,
                   help="limit number of tasks for the task scorers")
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

    if args.hellaswag or args.winogrande or args.multiple_choice:
        def tprog(done, total, acc):
            print(f"[{done}/{total}] acc={100 * acc:.2f}%", file=sys.stderr)

        if args.hellaswag:
            res = score_hellaswag(engine, model.tokenizer, text,
                                  n_tasks=args.n_tasks, progress=tprog)
        elif args.winogrande:
            res = score_winogrande(engine, model.tokenizer, text,
                                   n_tasks=args.n_tasks, progress=tprog)
        else:
            res = score_multiple_choice(engine, model.tokenizer, text,
                                        n_tasks=args.n_tasks, progress=tprog)
        print(json.dumps(res))
        return 0

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
