"""UGM (unigram LM / T5-SentencePiece) tokenizer.

Semantics per the reference's llm_tokenizer_ugm (src/llama-vocab.cpp:742):
Viterbi over token scores — for each position keep the best-scoring
tokenization of the prefix; characters with no vocab match consume one
codepoint as UNK with score min_score - 10 (unknown_token_score_penalty).
Space is normalized to the escaped-space symbol U+2581; consecutive UNKs
merge into one token.
"""

from __future__ import annotations

from .vocab import TokenAttr, Vocab

ESCAPED_SPACE = "▁"
UNKNOWN_PENALTY = 10.0  # llama-vocab.cpp:62


class UgmTokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self.token_ids: dict[str, int] = {}
        self.max_token_len = 1
        min_score = float("inf")
        scores = vocab.scores if vocab.scores is not None else [0.0] * len(vocab.tokens)
        for i, (tok, score) in enumerate(zip(vocab.tokens, scores)):
            if vocab.attrs[i] & (TokenAttr.CONTROL | TokenAttr.UNKNOWN | TokenAttr.UNUSED):
                continue
            self.token_ids[tok] = i
            self.max_token_len = max(self.max_token_len, len(tok))
            if score < min_score:
                min_score = float(score)
        if min_score == float("inf"):
            min_score = 0.0
        self.unknown_score = min_score - UNKNOWN_PENALTY

    def _normalize(self, text: str) -> str:
        # simplified precompiled_charsmap: whitespace -> escaped space, with
        # an optional leading space (add_space_prefix)
        out = text
        if self.vocab.add_space_prefix and out and not out.startswith(" "):
            out = " " + out
        return out.replace(" ", ESCAPED_SPACE)

    def tokenize(self, text: str, add_special: bool = True,
                 parse_special: bool = True) -> list[int]:
        ids: list[int] = []
        for frag in self.vocab.partition_specials(text, parse_special):
            if isinstance(frag, int):
                ids.append(frag)
            else:
                ids.extend(self._tokenize_chunk(frag))
        if add_special and self.vocab.add_eos and self.vocab.eos_id >= 0:
            ids.append(self.vocab.eos_id)  # T5 appends </s>
        if add_special and self.vocab.add_bos and self.vocab.bos_id >= 0:
            ids.insert(0, self.vocab.bos_id)
        return ids

    def _tokenize_chunk(self, text: str) -> list[int]:
        s = self._normalize(text)
        n = len(s)
        if n == 0:
            return []
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        back: list[tuple[int, int] | None] = [None] * (n + 1)  # (start, token_id|-1)
        best[0] = 0.0
        for i in range(n):
            if best[i] == NEG:
                continue
            # all vocab tokens matching at i
            for j in range(i + 1, min(i + self.max_token_len, n) + 1):
                tid = self.token_ids.get(s[i:j])
                if tid is None:
                    continue
                sc = best[i] + float(self.vocab.scores[tid])
                if sc > best[j]:
                    best[j] = sc
                    back[j] = (i, tid)
            # unknown fallback: one codepoint
            j = i + 1
            sc = best[i] + self.unknown_score
            if sc > best[j]:
                best[j] = sc
                back[j] = (i, -1)
        # walk back
        out: list[int] = []
        pos = n
        while pos > 0:
            start, tid = back[pos]
            out.append(tid)
            pos = start
        out.reverse()
        # merge consecutive UNKs into one (llama-vocab.cpp ugm tokenize tail)
        merged: list[int] = []
        unk = self.vocab.unk_id if self.vocab.unk_id >= 0 else 0
        for tid in out:
            if tid < 0:
                if merged and merged[-1] == unk:
                    continue
                merged.append(unk)
            else:
                merged.append(tid)
        return merged
