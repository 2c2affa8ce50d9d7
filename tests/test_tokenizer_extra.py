"""UGM (T5) and RWKV tokenizer tests (synthetic vocabs; reference semantics
per llm_tokenizer_ugm / llm_tokenizer_rwkv, src/llama-vocab.cpp:742,1146)."""

import numpy as np

from llamacog_tpu.tokenizer import build_tokenizer
from llamacog_tpu.tokenizer.vocab import Vocab


def _ugm_vocab():
    toks = ["<unk>", "<s>", "</s>", "▁", "▁hello", "▁world", "he", "llo",
            "wor", "ld", "o", "h", "e", "l", "w", "r", "d", "▁h"]
    scores = [0.0, 0.0, 0.0, -3.0, -1.0, -1.2, -4.0, -4.0,
              -4.0, -4.0, -6.0, -6.0, -6.0, -6.0, -6.0, -6.0, -6.0, -5.0]
    md = {
        "tokenizer.ggml.model": "t5",
        "tokenizer.ggml.tokens": toks,
        "tokenizer.ggml.scores": np.asarray(scores, np.float32),
        "tokenizer.ggml.token_type": np.asarray([2, 3, 3] + [1] * 15, np.int32),
        "tokenizer.ggml.unknown_token_id": 0,
        "tokenizer.ggml.bos_token_id": -1,
        "tokenizer.ggml.eos_token_id": 2,
        "tokenizer.ggml.add_eos_token": True,
        "tokenizer.ggml.add_space_prefix": True,
        "general.architecture": "t5",
    }
    return Vocab.from_metadata(md)


def test_ugm_viterbi_prefers_high_score():
    v = _ugm_vocab()
    tok = build_tokenizer(v)
    ids = tok.tokenize("hello world", add_special=False)
    # whole-word pieces score far better than char spellings
    assert v.tokens[ids[0]] == "▁hello"
    assert v.tokens[ids[1]] == "▁world"


def test_ugm_appends_eos():
    v = _ugm_vocab()
    tok = build_tokenizer(v)
    ids = tok.tokenize("hello", add_special=True)
    assert ids[-1] == 2  # </s>


def test_ugm_unknown_chars_merge():
    v = _ugm_vocab()
    tok = build_tokenizer(v)
    ids = tok.tokenize("hello ZZ", add_special=False)
    # the two Z's (not in vocab) merge into ONE unk
    assert ids.count(0) == 1


def _rwkv_vocab():
    toks = ["<unk>", "Hello", "Hell", "He", "llo", " world", " ", "w", "o",
            "r", "l", "d", "H", "e"]
    md = {
        "tokenizer.ggml.model": "rwkv",
        "tokenizer.ggml.tokens": toks,
        "tokenizer.ggml.token_type": np.asarray([2] + [1] * 13, np.int32),
        "general.architecture": "rwkv6",
    }
    return Vocab.from_metadata(md)


def test_rwkv_greedy_longest_match():
    v = _rwkv_vocab()
    tok = build_tokenizer(v)
    ids = tok.tokenize("Hello world", add_special=False)
    assert [v.tokens[i] for i in ids] == ["Hello", " world"]


def test_rwkv_falls_through_lengths():
    v = _rwkv_vocab()
    tok = build_tokenizer(v)
    ids = tok.tokenize("Hellw", add_special=False)
    assert [v.tokens[i] for i in ids] == ["Hell", "w"]
