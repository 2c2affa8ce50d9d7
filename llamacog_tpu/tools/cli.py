"""llamacog-cli — minimal generation CLI (reference: tools/main/main.cpp).

Usage:
    python -m llamacog_tpu.tools.cli --model m.gguf --prompt "..." -n 64
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="llamacog-cli", description="TPU-native llama inference")
    p.add_argument("-m", "--model", required=True, help="GGUF model path")
    p.add_argument("-p", "--prompt", default="", help="prompt text")
    p.add_argument("-n", "--n-predict", type=int, default=64, help="tokens to generate")
    p.add_argument("-c", "--ctx-size", type=int, default=2048)
    p.add_argument("--temp", type=float, default=0.8)
    p.add_argument("--top-k", type=int, default=40)
    p.add_argument("--top-p", type=float, default=0.95)
    p.add_argument("--min-p", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--greedy", action="store_true", help="greedy decoding (temp 0)")
    p.add_argument("--mode", choices=("quantized", "dequant"), default="quantized")
    p.add_argument("--dtype", choices=("bf16", "f32"), default="bf16")
    p.add_argument("--no-display-prompt", action="store_true")
    p.add_argument("--verbose", "-v", action="store_true")
    p.add_argument(
        "--device", choices=("auto", "cpu", "tpu"), default="auto",
        help="device platform (auto = first available accelerator)",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.device != "auto":
        import jax

        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp
    import numpy as np

    from ..models.loader import load_model
    from ..runtime.engine import Engine
    from ..runtime.sampler import SamplerChain, SamplerParams

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    t0 = time.time()
    model = load_model(args.model, mode=args.mode, dtype=dtype)
    t_load = time.time() - t0
    if args.verbose:
        print(f"[load] {t_load*1000:.0f} ms | arch={model.config.arch} "
              f"layers={model.config.n_layer} embd={model.config.n_embd}", file=sys.stderr)

    tok = model.tokenizer
    if tok is None:
        print("error: model has no supported tokenizer", file=sys.stderr)
        return 1
    prompt_ids = tok.tokenize(args.prompt, add_special=True, parse_special=True)
    engine = Engine(model.params, model.config, max_seq=args.ctx_size, dtype=dtype)

    params = SamplerParams(
        temp=0.0 if args.greedy else args.temp,
        top_k=args.top_k,
        top_p=args.top_p,
        min_p=args.min_p,
        seed=args.seed,
    )
    sampler = SamplerChain(params, n_vocab=model.config.n_vocab)

    if not args.no_display_prompt:
        sys.stdout.write(args.prompt)
        sys.stdout.flush()

    t1 = time.time()
    logits = engine.prefill(prompt_ids)
    t_prefill = time.time() - t1

    n_gen = 0
    t2 = time.time()
    text_parts = []
    tok_id = sampler.sample(logits)
    for _ in range(args.n_predict):
        piece = model.vocab.token_to_piece(tok_id).decode("utf-8", errors="replace")
        sys.stdout.write(piece)
        sys.stdout.flush()
        text_parts.append(piece)
        n_gen += 1
        sampler.accept(tok_id)
        if model.vocab.is_eog(tok_id):
            break
        if int(engine.seq_len[0]) >= args.ctx_size:
            break
        logits = engine.decode_one(np.array([tok_id]))[0]
        tok_id = sampler.sample(logits)
    t_gen = time.time() - t2
    sys.stdout.write("\n")
    if args.verbose or True:
        pp_tps = len(prompt_ids) / t_prefill if t_prefill > 0 else 0.0
        tg_tps = n_gen / t_gen if t_gen > 0 else 0.0
        print(
            f"[perf] prompt: {len(prompt_ids)} tok, {pp_tps:.2f} t/s | "
            f"gen: {n_gen} tok, {tg_tps:.2f} t/s | load {t_load:.2f}s",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
