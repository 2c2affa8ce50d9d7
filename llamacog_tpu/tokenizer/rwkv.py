"""RWKV-World tokenizer: greedy longest-match over raw bytes
(reference llm_tokenizer_rwkv, src/llama-vocab.cpp:1146; vocab tokens are
byte strings, matched with a trie — here a length-bucketed dict)."""

from __future__ import annotations

from .vocab import Vocab


def _unescape_rwkv_token(escaped: str) -> bytes:
    """GGUF rwkv vocab stores escape-coded text (\\xNN, \\t, \\n, \\\\) —
    reference llama_unescape_rwkv_token (src/llama-vocab.cpp:1092)."""
    out = bytearray()
    i, n = 0, len(escaped)
    while i < n:
        c = escaped[i]
        if c == "\\" and i + 1 < n:
            nxt = escaped[i + 1]
            if nxt == "x" and i + 3 < n:
                out.append(int(escaped[i + 2 : i + 4], 16))
                i += 4
                continue
            if nxt == "t":
                out.append(9)
            elif nxt == "n":
                out.append(10)
            elif nxt == "r":
                out.append(13)
            else:
                out.append(ord(nxt))
            i += 2
            continue
        out += c.encode("utf-8", errors="surrogateescape")
        i += 1
    return bytes(out)


class RwkvTokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self.token_ids: dict[bytes, int] = {}
        self.max_len = 1
        for i, tok in enumerate(vocab.tokens):
            b = _unescape_rwkv_token(tok)
            self.token_ids[b] = i
            self.max_len = max(self.max_len, len(b))

    def tokenize(self, text: str, add_special: bool = True,
                 parse_special: bool = True) -> list[int]:
        ids: list[int] = []
        for frag in self.vocab.partition_specials(text, parse_special):
            if isinstance(frag, int):
                ids.append(frag)
                continue
            data = frag.encode("utf-8")
            pos = 0
            while pos < len(data):
                for ln in range(min(self.max_len, len(data) - pos), 0, -1):
                    tid = self.token_ids.get(data[pos : pos + ln])
                    if tid is not None:
                        ids.append(tid)
                        pos += ln
                        break
                else:
                    pos += 1  # unmatchable byte: skip (reference behavior)
        return ids
