"""Chat template + output parsing tests.

Goldens come from the reference's tests/test-chat-template.cpp (the canonical
6-message conversation at :33-39 and the expected_output strings); parsing
cases mirror tests/test-chat-parser.cpp behaviors.
"""

from llamacog_tpu.runtime.chat import (
    apply_builtin_template,
    detect_template,
    parse_reasoning,
    parse_tool_calls,
    render_template,
)

MESSAGES = [
    {"role": "system", "content": "You are a helpful assistant"},
    {"role": "user", "content": "Hello"},
    {"role": "assistant", "content": "Hi there"},
    {"role": "user", "content": "Who are you"},
    {"role": "assistant", "content": "   I am an assistant   "},
    {"role": "user", "content": "Another question"},
]


def test_chatml_golden():
    out = apply_builtin_template("chatml", MESSAGES, True)
    assert out == (
        "<|im_start|>system\nYou are a helpful assistant<|im_end|>\n"
        "<|im_start|>user\nHello<|im_end|>\n"
        "<|im_start|>assistant\nHi there<|im_end|>\n"
        "<|im_start|>user\nWho are you<|im_end|>\n"
        "<|im_start|>assistant\n   I am an assistant   <|im_end|>\n"
        "<|im_start|>user\nAnother question<|im_end|>\n"
        "<|im_start|>assistant\n"
    )


def test_llama3_golden():
    out = apply_builtin_template("llama3", MESSAGES, True)
    assert out == (
        "<|start_header_id|>system<|end_header_id|>\n\nYou are a helpful assistant<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\nHello<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\nHi there<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\nWho are you<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\nI am an assistant<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\nAnother question<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\n"
    )


def test_phi3_golden():
    out = apply_builtin_template("phi3", MESSAGES, True)
    assert out == (
        "<|system|>\nYou are a helpful assistant<|end|>\n"
        "<|user|>\nHello<|end|>\n"
        "<|assistant|>\nHi there<|end|>\n"
        "<|user|>\nWho are you<|end|>\n"
        "<|assistant|>\n   I am an assistant   <|end|>\n"
        "<|user|>\nAnother question<|end|>\n"
        "<|assistant|>\n"
    )


def test_granite_golden():
    out = apply_builtin_template("granite", MESSAGES, True)
    assert out == (
        "<|start_of_role|>system<|end_of_role|>You are a helpful assistant<|end_of_text|>\n"
        "<|start_of_role|>user<|end_of_role|>Hello<|end_of_text|>\n"
        "<|start_of_role|>assistant<|end_of_role|>Hi there<|end_of_text|>\n"
        "<|start_of_role|>user<|end_of_role|>Who are you<|end_of_text|>\n"
        "<|start_of_role|>assistant<|end_of_role|>I am an assistant<|end_of_text|>\n"
        "<|start_of_role|>user<|end_of_role|>Another question<|end_of_text|>\n"
        "<|start_of_role|>assistant<|end_of_role|>\n"
    )


def test_detect_template_heuristics():
    # key fragments from real tokenizer.chat_template strings
    assert detect_template("{{'<|im_start|>' + message['role']}}") == "chatml"
    assert detect_template("... <|im_start|> ... <|im_sep|> ...") == "phi4"
    assert detect_template("[INST] <<SYS>> {{x}}") == "llama2-sys"
    assert detect_template("{% if x %}[INST]{% endif %}content.strip()") == "llama2-sys-strip"
    assert detect_template("<|start_header_id|>{{role}}<|end_header_id|>") == "llama3"
    assert detect_template("{{'<start_of_turn>' + role}}") == "gemma"
    assert detect_template("<|assistant|> ... <|end|>") == "phi3"
    assert detect_template("<|user|>\n{{c}}<|endoftext|>") == "zephyr"
    assert detect_template("USER: ASSISTANT: SYSTEM: ") == "vicuna-orca"
    assert detect_template("### Instruction:<|EOT|>") == "deepseek"
    assert detect_template("<|START_OF_TURN_TOKEN|><|USER_TOKEN|>") == "command-r"
    assert detect_template("<|start_of_role|>") == "granite"


def test_jinja_render_matches_builtin_chatml():
    tmpl = (
        "{% for message in messages %}{{'<|im_start|>' + message['role'] + '\n'"
        " + message['content'] + '<|im_end|>' + '\n'}}{% endfor %}"
        "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}{% endif %}"
    )
    out = render_template(tmpl, MESSAGES, add_generation_prompt=True)
    assert out == apply_builtin_template("chatml", MESSAGES, True)


def test_jinja_fallback_to_builtin_on_error():
    # template that raises at render time -> detection fallback (chatml-like)
    tmpl = "<|im_start|>{{ raise_exception('nope') }}"
    out = render_template(tmpl, MESSAGES, add_generation_prompt=True)
    assert out.endswith("<|im_start|>assistant\n")


def test_parse_reasoning_deepseek():
    content, reasoning = parse_reasoning(
        "<think>I reason here</think>The answer is 4.", "deepseek"
    )
    assert reasoning == "I reason here"
    assert content == "The answer is 4."


def test_parse_reasoning_rr():
    # fork's Relevance Realization format (common/common.h:223)
    content, reasoning = parse_reasoning("<rr>triadic loop</rr>ok", "rr")
    assert reasoning == "triadic loop"
    assert content == "ok"


def test_parse_reasoning_unclosed():
    content, reasoning = parse_reasoning("<think>still going", "deepseek")
    assert reasoning == "still going"
    assert content == ""


def test_parse_reasoning_in_content():
    content, reasoning = parse_reasoning(
        "<think>x</think>y", "deepseek", reasoning_in_content=True
    )
    assert reasoning == ""
    assert content == "<think>x</think>y"


def test_parse_tool_calls_hermes():
    msg = parse_tool_calls(
        'before <tool_call>{"name": "get_weather", "arguments": {"city": "Paris"}}'
        "</tool_call> after"
    )
    assert len(msg.tool_calls) == 1
    assert msg.tool_calls[0]["name"] == "get_weather"
    assert '"city": "Paris"' in msg.tool_calls[0]["arguments"]


def test_parse_tool_calls_mistral():
    msg = parse_tool_calls('[TOOL_CALLS] [{"name": "f", "arguments": {"x": 1}}]')
    assert len(msg.tool_calls) == 1
    assert msg.tool_calls[0]["name"] == "f"


def test_parse_tool_calls_bare_json():
    msg = parse_tool_calls('{"name": "f", "parameters": {"x": 1}}')
    assert len(msg.tool_calls) == 1
    assert msg.content == ""


def test_parse_tool_calls_none():
    msg = parse_tool_calls("just some text")
    assert msg.tool_calls == []
    assert msg.content == "just some text"


def test_new_builtin_templates():
    """The 9 templates added for full parity with llama-chat.cpp's ~40."""
    from llamacog_tpu.runtime.chat import apply_builtin_template, detect_template

    chat = [{"role": "system", "content": "s"}, {"role": "user", "content": "u"}]
    expect = {
        "chatglm3": "[gMASK]sop<|system|>\n s<|user|>\n u<|assistant|>",
        "glmedge": "<|system|>\ns<|user|>\nu<|assistant|>",
        "minicpm": "s<用户>u<AI>",
        "megrez": ("<|role_start|>system<|role_end|>s<|turn_end|>"
                   "<|role_start|>user<|role_end|>u<|turn_end|>"
                   "<|role_start|>assistant<|role_end|>"),
        "bailing": "<role>SYSTEM</role>s<role>HUMAN</role>u<role>ASSISTANT</role>",
        "llama4": ("<|header_start|>system<|header_end|>\n\ns<|eot|>"
                   "<|header_start|>user<|header_end|>\n\nu<|eot|>"
                   "<|header_start|>assistant<|header_end|>\n\n"),
        "smolvlm": "<|im_start|>s\n\nUser: u<end_of_utterance>\nAssistant:",
        "gigachat": ("<s>s<|message_sep|>user<|role_sep|>u<|message_sep|>"
                     "available functions<|role_sep|>[]<|message_sep|>"
                     "assistant<|role_sep|>"),
    }
    for name, want in expect.items():
        got = apply_builtin_template(name, chat)
        assert got == want, f"{name}: {got!r}"
    assert detect_template("x<|header_start|>y<|header_end|>") == "llama4"
    assert detect_template("[gMASK]sop ...") == "chatglm3"
    assert detect_template("a<end_of_utterance>b") == "smolvlm"
    assert detect_template("<role>HUMAN</role>") == "bailing"
