"""json-partial / regex-partial / partial-stop tests (reference
tests/test-json-partial.cpp, test-regex-partial.cpp behaviors)."""

import pytest

from llamacog_tpu.runtime.partial import (
    PartialRegex,
    parse_json_partial,
    partial_stop_match,
)


def test_json_complete():
    val, end, healed = parse_json_partial('{"a": 1} trailing')
    assert val == {"a": 1} and not healed and end == 8


def test_json_truncated_object():
    val, _, healed = parse_json_partial('{"name": "get_weather", "arguments": {"city": "Par')
    assert healed
    assert val["name"] == "get_weather"
    assert val["arguments"]["city"] == "Par"


def test_json_truncated_array_and_key():
    val, _, healed = parse_json_partial('[1, 2, {"k":')
    assert healed and val == [1, 2, {"k": None}]
    val, _, _ = parse_json_partial('[1, 2,')
    assert val == [1, 2]


def test_json_garbage_raises():
    with pytest.raises(ValueError):
        parse_json_partial("}{")


def test_partial_stop_match():
    assert partial_stop_match("hello <|im", "<|im_end|>") == 4
    assert partial_stop_match("hello", "<|im_end|>") == 0
    assert partial_stop_match("x<", "<|im_end|>") == 1


def test_partial_regex():
    pr = PartialRegex(r"<tool_call>")
    m, start = pr.match("text <tool_call> more")
    assert m is not None and start == -1
    m, start = pr.match("text <tool_")
    assert m is None and start == 5
    m, start = pr.match("no markers here")
    assert m is None and start == -1
