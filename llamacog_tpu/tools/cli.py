"""llamacog-cli — minimal generation CLI (reference: tools/main/main.cpp).

Usage:
    python -m llamacog_tpu.tools.cli --model m.gguf --prompt "..." -n 64
"""

from __future__ import annotations

import argparse
import sys
import time


def _kv_type_arg(ctk: str, ctv: str | None) -> str:
    """-ctk/-ctv flag values -> Engine kv_type ("k:v" when they differ);
    make_cache resolves dense kinds and picks the cache class."""
    ctv = ctv or ctk
    return ctk if ctk == ctv else f"{ctk}:{ctv}"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="llamacog-cli", description="TPU-native llama inference")
    p.add_argument("-m", "--model", required=True, help="GGUF model path")
    p.add_argument("-p", "--prompt", default="", help="prompt text")
    p.add_argument("-f", "--file", default=None, help="prompt from file")
    p.add_argument("-n", "--n-predict", type=int, default=64, help="tokens to generate")
    p.add_argument("-c", "--ctx-size", type=int, default=2048)
    p.add_argument("-i", "--interactive", action="store_true",
                   help="interactive mode (read more input after each reply)")
    p.add_argument("-cnv", "--conversation", action="store_true",
                   help="chat mode: wrap turns with the model's chat template")
    p.add_argument("--chat-template", default=None,
                   help="builtin chat template name (overrides the GGUF's)")
    p.add_argument("-r", "--reverse-prompt", action="append", default=[],
                   help="stop generating and return control at this string")
    p.add_argument("--prompt-cache", default=None,
                   help="session file: restore matching prompt prefix, save on exit "
                        "(tools/main/main.cpp:236-254)")
    p.add_argument("--keep", type=int, default=0,
                   help="tokens kept from the initial prompt on context shift")
    p.add_argument("-sys", "--system-prompt", default=None, help="chat system prompt")
    p.add_argument("--temp", type=float, default=0.8)
    p.add_argument("--top-k", type=int, default=40)
    p.add_argument("--top-p", type=float, default=0.95)
    p.add_argument("--min-p", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--greedy", action="store_true", help="greedy decoding (temp 0)")
    p.add_argument("--mode", choices=("quantized", "dequant"), default="quantized")
    p.add_argument("--dtype", choices=("bf16", "f32"), default="bf16")
    p.add_argument("--override-kv", action="append", default=[],
                   metavar="KEY=TYPE:VALUE",
                   help="override a GGUF metadata key (types int/float/bool/str)")
    _KV_TYPES = ("f16", "bf16", "q8_0", "q4_0", "q4_1", "q5_0", "q5_1")
    p.add_argument("-ctk", "--cache-type-k",
                   choices=_KV_TYPES, default="bf16",
                   help="K cache type (q8_0 halves KV HBM, q4_0 quarters)")
    p.add_argument("-ctv", "--cache-type-v",
                   choices=_KV_TYPES, default=None,
                   help="V cache type (defaults to the K type; the reference "
                   "accepts independent K/V types, common/arg.cpp:2093-2130)")
    p.add_argument("-md", "--model-draft", default=None,
                   help="draft model GGUF for --spec-ondevice")
    p.add_argument("--spec-ondevice", type=int, default=0, metavar="N",
                   help="on-device speculative decoding (draft+verify fused "
                   "in one jit; greedy only). Draft = -md model if given, "
                   "else the target's first N layers")
    p.add_argument("--spec-k", type=int, default=4,
                   help="draft tokens per on-device speculative round")
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
    from ..models.loader import parse_kv_overrides

    model = load_model(args.model, mode=args.mode, dtype=dtype,
                       kv_overrides=parse_kv_overrides(args.override_kv))
    t_load = time.time() - t0
    if args.verbose:
        print(f"[load] {t_load*1000:.0f} ms | arch={model.config.arch} "
              f"layers={model.config.n_layer} embd={model.config.n_embd}", file=sys.stderr)

    tok = model.tokenizer
    if tok is None:
        print("error: model has no supported tokenizer", file=sys.stderr)
        return 1
    kv_type = _kv_type_arg(args.cache_type_k, args.cache_type_v)
    engine = Engine(model.params, model.config, max_seq=args.ctx_size,
                    dtype=dtype, kv_type=kv_type)

    spec = draft_engine = None
    if args.spec_ondevice:
        if not (args.greedy or args.temp <= 0.0):
            print("warning: --spec-ondevice is greedy-exact only; "
                  "ignoring it for sampled decoding (set --greedy)",
                  file=sys.stderr)
        else:
            from dataclasses import replace as _replace

            from ..runtime.speculative import (OnDeviceSpeculative,
                                               truncated_draft_params)

            if args.model_draft:
                dm = load_model(args.model_draft, mode=args.mode, dtype=dtype)
                d_params, d_cfg = dm.params, dm.config
            else:
                d_params = truncated_draft_params(model.params,
                                                  args.spec_ondevice)
                d_cfg = _replace(model.config, n_layer=args.spec_ondevice)
            draft_engine = Engine(d_params, d_cfg, max_seq=args.ctx_size,
                                  dtype=dtype)
            spec = OnDeviceSpeculative(engine, draft_engine, k=args.spec_k)

    params = SamplerParams(
        temp=0.0 if args.greedy else args.temp,
        top_k=args.top_k,
        top_p=args.top_p,
        min_p=args.min_p,
        seed=args.seed,
    )
    sampler = SamplerChain(params, n_vocab=model.config.n_vocab)

    prompt_text = args.prompt
    if args.file:
        prompt_text = open(args.file, encoding="utf-8").read()

    messages = []
    if args.conversation and args.system_prompt:
        messages.append({"role": "system", "content": args.system_prompt})

    def render_chat(user_text: str) -> str:
        from ..runtime.chat import apply_builtin_template, render_template

        messages.append({"role": "user", "content": user_text})
        if args.chat_template:
            return apply_builtin_template(args.chat_template, messages, True)
        v = model.vocab
        return render_template(
            v.chat_template if v else None, messages, add_generation_prompt=True,
            bos_token=v.tokens[v.bos_id] if v and v.bos_id >= 0 else "",
            eos_token=v.tokens[v.eos_id] if v and v.eos_id >= 0 else "",
        )

    history: list[int] = []  # tokens currently in the KV row

    # prompt-cache restore (reference tools/main/main.cpp:236-254)
    if args.prompt_cache:
        import os

        from ..runtime.state import load_row_state

        if os.path.exists(args.prompt_cache):
            try:
                history = load_row_state(engine, args.prompt_cache)
                if args.verbose:
                    print(f"[cache] restored {len(history)} tokens", file=sys.stderr)
            except Exception as e:
                print(f"[cache] ignoring invalid session file: {e}", file=sys.stderr)
                history = []

    def feed(ids: list[int]):
        """Prefill ids, reusing any cached common prefix; returns last logits."""
        nonlocal history
        n_common = 0
        limit = min(len(history), len(ids) - 1)
        while n_common < limit and history[n_common] == ids[n_common]:
            n_common += 1
        engine.seq_len[0] = n_common
        logits = engine.prefill(ids[n_common:])
        if draft_engine is not None:  # draft row stays in lockstep
            draft_engine.seq_len[0] = n_common
            draft_engine.prefill(ids[n_common:])
        history = list(ids)
        return logits, len(ids) - n_common

    spec_totals = {"drafted": 0, "accepted": 0, "rounds": 0}

    def generate(logits) -> tuple[str, int]:
        """Stream tokens until EOG / limit / reverse prompt; returns (text, n)."""
        nonlocal history
        text, n_gen = "", 0
        tok_id = sampler.sample(logits)
        pending: list[int] = []  # spec mode: device-generated lookahead
        limit = args.n_predict if args.n_predict >= 0 else 1 << 30
        for _ in range(limit):
            piece = model.vocab.token_to_piece(tok_id).decode("utf-8", errors="replace")
            sampler.accept(tok_id)
            history.append(tok_id)
            n_gen += 1
            if model.vocab.is_eog(tok_id):
                break
            sys.stdout.write(piece)
            sys.stdout.flush()
            text += piece
            if any(text.endswith(r) for r in args.reverse_prompt):
                break
            if int(engine.seq_len[0]) + 1 >= args.ctx_size:
                # context shift: drop the oldest half beyond --keep
                # (tools/main/main.cpp context-shift; engine re-rotates K)
                n_keep = args.keep
                n_discard = (int(engine.seq_len[0]) - n_keep) // 2
                engine.shift_row(0, n_keep, n_discard)
                if draft_engine is not None:
                    draft_engine.shift_row(0, n_keep, n_discard)
                    pending = []  # positions moved; regenerate
                history = history[:n_keep] + history[n_keep + n_discard:]
                if args.verbose:
                    print(f"\n[ctx shift] discarded {n_discard}", file=sys.stderr)
            if spec is not None:
                if not pending:
                    room = args.ctx_size - int(engine.seq_len[0]) - spec.k - 2
                    if room >= 2:
                        n = max(1, min(16, limit - n_gen + 1, room))
                        pre_t = int(engine.seq_len[0])
                        pre_d = int(draft_engine.seq_len[0])
                        toks, st = spec.generate_greedy(tok_id, n)
                        # rewind past-n overshoot (whole rounds only) so the
                        # next input lands at the right slot
                        engine.seq_len[0] = pre_t + n
                        draft_engine.seq_len[0] = pre_d + n
                        for key in ("drafted", "accepted", "rounds"):
                            spec_totals[key] += st[key]
                        pending = [int(t) for t in toks]
                    else:
                        logits = engine.decode_one(np.array([tok_id]))[0]
                        draft_engine.decode_one(np.array([tok_id]))
                        pending = [int(np.argmax(logits))]
                tok_id = pending.pop(0)
                continue
            logits = engine.decode_one(np.array([tok_id]))[0]
            tok_id = sampler.sample(logits)
        return text, n_gen

    interactive = args.interactive or args.conversation
    first_input = prompt_text
    total_gen, t_gen_total = 0, 0.0
    t_prefill, n_prompt = 0.0, 0
    while True:
        if not first_input and interactive:
            try:
                sys.stdout.write("\n> ")
                sys.stdout.flush()
                first_input = input()
            except EOFError:
                break
            if not first_input.strip():
                continue
        if args.conversation:
            text_in = render_chat(first_input)
        else:
            text_in = first_input
            if not args.no_display_prompt:
                sys.stdout.write(text_in)
                sys.stdout.flush()
        ids = tok.tokenize(text_in, add_special=not args.conversation,
                           parse_special=True)
        if args.conversation and model.vocab.add_bos and model.vocab.bos_id >= 0:
            if not ids or ids[0] != model.vocab.bos_id:
                ids = [model.vocab.bos_id] + ids
        if not ids:
            # untokenizable prompt (or empty with no BOS): seed with BOS so
            # the engine always has one real token, as llama-cli does
            if model.vocab.bos_id >= 0:
                ids = [model.vocab.bos_id]
            else:
                sys.exit("error: prompt tokenized to zero tokens and the "
                         "vocab has no BOS token to seed generation")
        t1 = time.time()
        logits, n_fed = feed(ids)
        t_prefill += time.time() - t1
        n_prompt += n_fed
        t2 = time.time()
        text, n_gen = generate(logits)
        t_gen_total += time.time() - t2
        total_gen += n_gen
        if args.conversation:
            messages.append({"role": "assistant", "content": text})
        first_input = ""
        if not interactive:
            break
    sys.stdout.write("\n")

    if args.prompt_cache:
        from ..runtime.state import save_row_state

        save_row_state(engine, args.prompt_cache, tokens=history)
        if args.verbose:
            print(f"[cache] saved {len(history)} tokens", file=sys.stderr)

    pp_tps = n_prompt / t_prefill if t_prefill > 0 else 0.0
    tg_tps = total_gen / t_gen_total if t_gen_total > 0 else 0.0
    print(
        f"[perf] prompt: {n_prompt} tok, {pp_tps:.2f} t/s | "
        f"gen: {total_gen} tok, {tg_tps:.2f} t/s | load {t_load:.2f}s",
        file=sys.stderr,
    )
    if spec is not None and spec_totals["drafted"]:
        print(
            f"[spec] drafted {spec_totals['drafted']}, accepted "
            f"{spec_totals['accepted']} "
            f"({spec_totals['accepted'] / spec_totals['drafted']:.0%}) over "
            f"{spec_totals['rounds']} rounds",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
