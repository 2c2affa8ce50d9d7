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


def test_rwkv_escaped_vocab_roundtrip():
    """Reference-made rwkv vocabs store escape-coded byte strings
    (llama_unescape_rwkv_token, src/llama-vocab.cpp:1092); tokenize and
    token_to_piece must both decode them."""
    toks = ["<s>", "Hello", "\\xe4\\xb8\\x96", "\\n\\n", "\\\\", " "]
    md = {
        "tokenizer.ggml.model": "rwkv",
        "tokenizer.ggml.tokens": toks,
        "tokenizer.ggml.token_type": np.asarray([3, 1, 1, 1, 1, 1], np.int32),
        "general.architecture": "rwkv6",
    }
    v = Vocab.from_metadata(md)
    tok = build_tokenizer(v)
    ids = tok.tokenize("Hello 世", add_special=False)
    assert [v.tokens[i] for i in ids] == ["Hello", " ", "\\xe4\\xb8\\x96"]
    assert v.token_to_piece(ids[-1]) == "世".encode()
    ids2 = tok.tokenize("\n\n", add_special=False)
    assert [v.tokens[i] for i in ids2] == ["\\n\\n"]
    assert v.token_to_piece(tok.tokenize("\\", add_special=False)[0]) == b"\\"


def test_convert_rwkv_world_vocab_export(tmp_path):
    """convert_hf exports rwkv_vocab_v20230424.txt checkpoints as
    tokenizer model "rwkv" with reference escape coding."""
    import json as _json

    from llamacog_tpu.gguf import GGUFWriter
    from llamacog_tpu.tools.convert_hf import _export_rwkv_world

    # tiny vocab file in the reference's "<id> <repr> <len>" format
    lines = []
    for i, b in enumerate([b"A", b"\n", b"\xe4\xb8\x96", b"ab"], start=0):
        lines.append(f"{i} {b!r} {len(b)}")
    vf = tmp_path / "rwkv_vocab_v20230424.txt"
    vf.write_text("\n".join(lines), encoding="utf-8")

    out = tmp_path / "v.gguf"
    w = GGUFWriter(str(out))
    w.add("general.architecture", "rwkv6")
    _export_rwkv_world(w, vf, {"vocab_size": 8})
    w.add_tensor("token_embd.weight", np.zeros((8, 4), np.float32))
    w.write()

    from llamacog_tpu.gguf import GGUFReader

    r = GGUFReader(str(out))
    md = r.metadata
    assert md["tokenizer.ggml.model"] == "rwkv"
    toks = list(md["tokenizer.ggml.tokens"])
    assert toks[0] == "<s>" and len(toks) == 8
    assert toks[2] == "\\n"          # escape-coded newline
    assert toks[3] == "\\xe4\\xb8\\x96"
    assert toks[-1].startswith("[PAD")
    v = Vocab.from_metadata(md)
    tok = build_tokenizer(v)
    assert v.token_to_piece(tok.tokenize("世", add_special=False)[0]) \
        == "世".encode()
