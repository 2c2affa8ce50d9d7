"""Tokenizer golden tests against the reference's vocab GGUFs + .inp/.out
pairs (role of reference test-tokenizer-0)."""

import pathlib

import pytest

from llamacog_tpu.gguf import GGUFReader
from llamacog_tpu.tokenizer import tokenizer_from_metadata

SEP = "__ggml_vocab_test__"

# vocabs with both .gguf and goldens present in the reference tree
GOLDEN_VOCABS = [
    "llama-spm",
    "gpt-2",
    "deepseek-coder",
    "deepseek-llm",
    "falcon",
    "mpt",
    "starcoder",
    "refact",
    "phi-3",
    "bert-bge",
]


def load_goldens(models_dir: pathlib.Path, name: str):
    inp = (models_dir / f"ggml-vocab-{name}.gguf.inp").read_text(encoding="utf-8")
    out = (models_dir / f"ggml-vocab-{name}.gguf.out").read_text(encoding="utf-8")
    texts = inp.split(SEP + "\n")
    # each case in .out is one line of space-separated ids
    id_lines = out.splitlines()
    texts = [t[:-1] if t.endswith("\n") else t for t in texts]
    cases = []
    for text, line in zip(texts, id_lines):
        ids = [int(x) for x in line.split()]
        cases.append((text, ids))
    return cases


@pytest.mark.parametrize("name", GOLDEN_VOCABS)
def test_tokenizer_goldens(reference_models_dir, name):
    gguf_path = reference_models_dir / f"ggml-vocab-{name}.gguf"
    if not gguf_path.exists():
        pytest.skip(f"{gguf_path.name} not in reference tree")
    if not (reference_models_dir / f"ggml-vocab-{name}.gguf.inp").exists():
        pytest.skip("no goldens")
    with GGUFReader(gguf_path) as r:
        md = r.metadata
    try:
        vocab, tok = tokenizer_from_metadata(md)
    except NotImplementedError as e:
        pytest.skip(str(e))
    cases = load_goldens(reference_models_dir, name)
    assert cases
    fails = []
    for text, expected in cases:
        got = tok.tokenize(text, add_special=False, parse_special=False)
        if got != expected:
            fails.append((text, expected, got))
    assert not fails, f"{len(fails)}/{len(cases)} mismatches; first: {fails[0]!r}"


def test_detokenize_roundtrip(reference_models_dir):
    with GGUFReader(reference_models_dir / "ggml-vocab-llama-spm.gguf") as r:
        vocab, tok = tokenizer_from_metadata(r.metadata)
    for text in ["Hello world", "  leading spaces", "emoji 🚀 test", "tabs\tand\nnewlines"]:
        ids = tok.tokenize(text, add_special=False, parse_special=False)
        back = vocab.detokenize(ids)
        assert back == text, (text, back, ids)


def test_special_token_parsing(reference_models_dir):
    with GGUFReader(reference_models_dir / "ggml-vocab-llama-spm.gguf") as r:
        vocab, tok = tokenizer_from_metadata(r.metadata)
    ids = tok.tokenize("<s>hi</s>", add_special=False, parse_special=True)
    assert ids[0] == vocab.bos_id
    assert ids[-1] == vocab.eos_id
    # without parse_special, control tokens are tokenized as text
    ids2 = tok.tokenize("<s>hi</s>", add_special=False, parse_special=False)
    assert ids2[0] != vocab.bos_id
