"""GBNF grammar tests (roles of reference test-grammar-parser,
test-grammar-integration, test-gbnf-validator)."""

import pathlib

import pytest

from llamacog_tpu.runtime.grammar import GrammarParseError, grammar_from_gbnf, parse_gbnf

GRAMMARS_DIR = pathlib.Path("/root/reference/grammars")


def accepts(g, text: str, complete: bool = True) -> bool:
    st = grammar_from_gbnf(g) if isinstance(g, str) else g
    try:
        st.accept_text(text.encode("utf-8"))
    except ValueError:
        return False
    return st.can_end if complete else True


def test_literal():
    g = 'root ::= "hello"'
    assert accepts(g, "hello")
    assert not accepts(g, "hell")
    assert not accepts(g, "helloo")


def test_alternation_and_groups():
    g = 'root ::= ("a" | "b") "c"'
    assert accepts(g, "ac")
    assert accepts(g, "bc")
    assert not accepts(g, "cc")


def test_char_classes():
    g = "root ::= [a-z0-9]+"
    assert accepts(g, "abc123")
    assert not accepts(g, "ABC")
    g2 = 'root ::= [^\\n]+ "\\n"'
    assert accepts(g2, "hello\n")
    assert not accepts(g2, "he\nllo\n")


def test_repetitions():
    assert accepts('root ::= "a"*', "")
    assert accepts('root ::= "a"*', "aaaa")
    assert not accepts('root ::= "a"+', "")
    assert accepts('root ::= "a"+', "aaa")
    assert accepts('root ::= "a"?', "")
    assert accepts('root ::= "a"?', "a")
    assert not accepts('root ::= "a"?', "aa")
    g = 'root ::= "a"{2,3}'
    assert not accepts(g, "a")
    assert accepts(g, "aa")
    assert accepts(g, "aaa")
    assert not accepts(g, "aaaa")
    g2 = 'root ::= "x"{2}'
    assert accepts(g2, "xx")
    assert not accepts(g2, "x")
    g3 = 'root ::= "x"{2,}'
    assert accepts(g3, "xxxxx")
    assert not accepts(g3, "x")


def test_rule_refs_and_recursion():
    g = """
root ::= expr
expr ::= term ([-+] term)*
term ::= [0-9]+ | "(" expr ")"
"""
    assert accepts(g, "1+2-3")
    assert accepts(g, "(1+2)-3")
    assert not accepts(g, "1++2")


def test_nonterminal_repetition_applies_to_last_char_of_literal():
    # per GBNF: "ab"? means a then optional b? No — applies to last char
    g = 'root ::= "ab"?'
    # reference parser applies ? to the last char of the literal
    assert accepts(g, "a")
    assert accepts(g, "ab")
    assert not accepts(g, "")


def test_unicode():
    g = "root ::= [ぁ-ゟ]+"
    assert accepts(g, "ぁあぃ")
    assert not accepts(g, "abc")


def test_dot_any():
    g = 'root ::= . . .'
    assert accepts(g, "x7é")
    assert not accepts(g, "xy")


def test_undefined_rule_rejected():
    with pytest.raises(GrammarParseError):
        parse_gbnf("root ::= missing")


def test_no_root_rejected():
    with pytest.raises(GrammarParseError):
        parse_gbnf('start ::= "a"')


@pytest.mark.parametrize(
    "text,ok",
    [
        ('{"a": 1}', True),
        ('{"a": [1, 2.5, -3e4], "b": {"c": null}}', True),
        ('{"s": "he\\"llo", "t": true}', True),
        ("[1, 2, 3]", False),  # json.gbnf root accepts only objects
        ('"just a string"', False),
        ("{", False),
        ('{"a": }', False),
        ("{'a': 1}", False),
        ("01", False),
    ],
)
def test_reference_json_grammar(text, ok):
    path = GRAMMARS_DIR / "json.gbnf"
    if not path.exists():
        pytest.skip("reference grammars not available")
    g = grammar_from_gbnf(path.read_text())
    assert accepts(g, text) == ok, text


def test_partial_utf8_across_tokens():
    st = grammar_from_gbnf("root ::= [ぁ-ゟ]+")
    data = "ぁあ".encode("utf-8")
    # feed byte-by-byte (simulating tokens that split multibyte chars)
    for i in range(len(data)):
        st.accept_text(data[i : i + 1])
    assert st.can_end


def test_vocab_integration(reference_models_dir):
    from llamacog_tpu.gguf import GGUFReader
    from llamacog_tpu.tokenizer import tokenizer_from_metadata

    with GGUFReader(reference_models_dir / "ggml-vocab-llama-spm.gguf") as r:
        vocab, tok = tokenizer_from_metadata(r.metadata)
    # SPM token pieces carry the leading space; allow it in the grammar
    st = grammar_from_gbnf('root ::= " "? ("yes" | "no")', vocab)
    yes_ids = tok.tokenize("yes", add_special=False)
    for t in yes_ids:
        assert st.accepts_token(t)
        st.accept_token(t)
    assert st.can_end
    assert st.accepts_token(vocab.eos_id)  # EOG allowed once complete
