"""JSON-schema→GBNF tests (role of reference test-json-schema-to-grammar):
the generated grammar must accept conforming JSON and reject violations."""

import json

import pytest

from llamacog_tpu.runtime.grammar import grammar_from_gbnf
from llamacog_tpu.runtime.json_schema import json_schema_to_gbnf


def check(schema, text) -> bool:
    gbnf = json_schema_to_gbnf(schema)
    st = grammar_from_gbnf(gbnf)
    try:
        st.accept_text(text.encode())
    except ValueError:
        return False
    return st.can_end


def test_const():
    s = {"const": "hello"}
    assert check(s, '"hello"')
    assert not check(s, '"world"')


def test_enum():
    s = {"enum": ["red", "green", 42]}
    assert check(s, '"red"')
    assert check(s, "42")
    assert not check(s, '"blue"')


def test_integer_number():
    assert check({"type": "integer"}, "-42")
    assert not check({"type": "integer"}, "4.5")
    assert check({"type": "number"}, "-3.5e2")


def test_boolean_null():
    assert check({"type": "boolean"}, "true")
    assert not check({"type": "boolean"}, "maybe")
    assert check({"type": "null"}, "null")


def test_string():
    assert check({"type": "string"}, '"hi there"')
    assert not check({"type": "string"}, "hi")


def test_object_required():
    s = {
        "type": "object",
        "properties": {"a": {"type": "integer"}, "b": {"type": "string"}},
        "required": ["a", "b"],
    }
    assert check(s, '{"a": 1, "b": "x"}')
    assert not check(s, '{"a": 1}')
    assert not check(s, '{"a": "str", "b": "x"}')


def test_array_typed_items():
    s = {"type": "array", "items": {"type": "integer"}}
    assert check(s, "[1, 2, 3]")
    assert check(s, "[]")
    assert not check(s, '["a"]')


def test_array_min_max():
    s = {"type": "array", "items": {"type": "integer"}, "minItems": 2, "maxItems": 3}
    assert not check(s, "[1]")
    assert check(s, "[1, 2]")
    assert check(s, "[1, 2, 3]")
    assert not check(s, "[1, 2, 3, 4]")


def test_anyof():
    s = {"anyOf": [{"type": "integer"}, {"type": "string"}]}
    assert check(s, "3")
    assert check(s, '"x"')
    assert not check(s, "true")


def test_refs():
    s = {
        "$defs": {"pos": {"type": "integer"}},
        "type": "object",
        "properties": {"x": {"$ref": "#/$defs/pos"}},
        "required": ["x"],
    }
    assert check(s, '{"x": 5}')
    assert not check(s, '{"x": "no"}')


def test_freeform_value():
    assert check({}, '{"anything": [1, "two", null, {"nested": true}]}')
    assert check({}, "[]")
