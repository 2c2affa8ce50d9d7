"""WordPiece (WPM/BERT) tokenizer.

Longest-match wordpiece over NFD-normalized, lowercased, punctuation-split
words with a phantom ▁ prefix (llama.cpp src/llama-vocab.cpp:625-737).
"""

from __future__ import annotations

import unicodedata

from .vocab import SPM_SPACE, Vocab

_CJK_RANGES = (
    (0x04E00, 0x09FFF),
    (0x03400, 0x04DBF),
    (0x20000, 0x2A6DF),
    (0x2A700, 0x2B73F),
    (0x2B740, 0x2B81F),
    (0x2B920, 0x2CEAF),  # quirk preserved from HF rust code (should be 0x2B820)
    (0x0F900, 0x0FAFF),
    (0x2F800, 0x2FA1F),
)


def _is_chinese_char(cp: int) -> bool:
    return any(a <= cp <= b for a, b in _CJK_RANGES)


class WpmTokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self.max_token_len = max((len(t) for t in vocab.tokens), default=0)

    @staticmethod
    def preprocess(text: str) -> list[str]:
        words: list[str] = [""]
        # the reference's NFD table maps each codepoint to a SINGLE base
        # codepoint (first of the canonical decomposition), dropping accents
        # (unicode.cpp unicode_cpts_normalize_nfd)
        for ch in text:
            ch = unicodedata.normalize("NFD", ch)[0]
            cp = ord(ch)
            cat = unicodedata.category(ch)
            if ch.isspace() or cat == "Zs":
                if words[-1]:
                    words.append("")
                continue
            if cp == 0 or cp == 0xFFFD or cat in ("Cc", "Cf"):
                continue
            s = ch.lower()
            if cat.startswith("P") or (cp < 0x7F and cat.startswith("S")) or _is_chinese_char(cp):
                if words[-1]:
                    words.append("")
                words[-1] = s
                words.append("")
            else:
                words[-1] += s
        if words and not words[-1]:
            words.pop()
        return words

    def _tokenize_fragment(self, text: str, output: list[int]) -> None:
        v = self.vocab
        for word in self.preprocess(text):
            if not word:
                continue
            word1 = SPM_SPACE + word
            # llama.cpp scans byte positions; operate on utf-8 bytes for parity
            data = word1.encode("utf-8")
            n = len(data)
            start_len = len(output)
            i = 0
            ok = True
            while i < n:
                match = False
                for j in range(min(n, i + self.max_token_len + 1), i, -1):
                    tid = v.bytes_to_token(data[i:j])
                    if tid >= 0:
                        output.append(tid)
                        i = j
                        match = True
                        break
                if not match:
                    del output[start_len:]
                    ok = False
                    break
            if not ok or len(output) == start_len:
                output.append(v.unk_id)

    def tokenize(
        self, text: str, add_special: bool = True, parse_special: bool = False
    ) -> list[int]:
        v = self.vocab
        output: list[int] = []
        if add_special and v.bos_id >= 0:
            output.append(v.bos_id)
        for frag in v.partition_specials(text, parse_special):
            if isinstance(frag, int):
                output.append(frag)
            else:
                self._tokenize_fragment(frag, output)
        if add_special and v.sep_id >= 0:
            output.append(v.sep_id)
        return output
