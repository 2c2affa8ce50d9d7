"""tokenize CLI (reference tools/tokenize/tokenize.cpp): print token ids and
pieces for a prompt, or detokenize ids."""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="llamacog-tokenize")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-p", "--prompt", default=None)
    p.add_argument("-f", "--file", default=None)
    p.add_argument("--ids", action="store_true", help="print bare id array only")
    p.add_argument("--detokenize", type=str, default=None,
                   help="comma-separated ids to detokenize")
    p.add_argument("--no-bos", action="store_true")
    p.add_argument("--no-parse-special", action="store_true")
    p.add_argument("--show-count", action="store_true")
    args = p.parse_args(argv)

    from ..gguf import GGUFModelReader
    from ..tokenizer import Vocab, build_tokenizer

    reader = GGUFModelReader(args.model)
    vocab = Vocab.from_metadata(reader.metadata)
    tok = build_tokenizer(vocab)
    reader.close()

    if args.detokenize is not None:
        ids = [int(t) for t in args.detokenize.split(",") if t]
        print(vocab.detokenize(ids))
        return 0

    if args.file:
        text = open(args.file, encoding="utf-8").read()
    elif args.prompt is not None:
        text = args.prompt
    else:
        text = sys.stdin.read()
    ids = tok.tokenize(
        text, add_special=not args.no_bos, parse_special=not args.no_parse_special
    )
    if args.ids:
        print("[" + ", ".join(map(str, ids)) + "]")
    else:
        for t in ids:
            piece = vocab.detokenize([t])
            print(f"{t:>8} -> {piece!r}")
    if args.show_count:
        print(f"Total number of tokens: {len(ids)}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
