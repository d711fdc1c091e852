"""Reasoning + function-call parser units (reference
`srt/parser/reasoning_parser.py`, `srt/function_call/`)."""

import json

import pytest

from sglang_tpu.parser.function_call import FunctionCallParser
from sglang_tpu.parser.reasoning_parser import ReasoningParser

# ------------------------------------------------------------- reasoning


def test_reasoning_oneshot_with_tags():
    p = ReasoningParser("qwen3")
    r = p.parse("<think>step one\nstep two</think>\nThe answer is 4.")
    assert r.reasoning == "step one\nstep two"
    assert r.content == "The answer is 4."


def test_reasoning_forced_no_open_tag():
    p = ReasoningParser("deepseek-r1")
    r = p.parse("thinking hard...</think>42")
    assert r.reasoning == "thinking hard..."
    assert r.content == "42"


def test_reasoning_unclosed():
    p = ReasoningParser("deepseek-r1")
    r = p.parse("still thinking")
    assert r.reasoning == "still thinking" and r.content == ""


def test_reasoning_streaming():
    p = ReasoningParser("qwen3")
    chunks = ["<thi", "nk>abc", " def</th", "ink>gh", "i"]
    reasoning, content = "", ""
    for c in chunks:
        rd, cd = p.parse_stream_chunk(c)
        reasoning += rd
        content += cd
    assert reasoning == "abc def"
    assert content == "ghi"


def test_reasoning_streaming_no_think():
    p = ReasoningParser("qwen3")
    rd, cd = p.parse_stream_chunk("plain answer")
    assert rd == "" and cd == "plain answer"


# ------------------------------------------------------------- tool calls

TOOLS = [
    {
        "type": "function",
        "function": {"name": "get_weather", "parameters": {"type": "object"}},
    }
]


def test_hermes_tool_call():
    p = FunctionCallParser(TOOLS, "hermes")
    text = 'Sure!\n<tool_call>\n{"name": "get_weather", "arguments": {"city": "SF"}}\n</tool_call>'
    assert p.has_tool_call(text)
    normal, calls = p.parse_non_stream(text)
    assert normal == "Sure!"
    assert len(calls) == 1
    assert calls[0]["function"]["name"] == "get_weather"
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "SF"}


def test_llama3_tool_call():
    p = FunctionCallParser(TOOLS, "llama3")
    text = '{"name": "get_weather", "parameters": {"city": "NYC"}}'
    assert p.has_tool_call(text)
    normal, calls = p.parse_non_stream(text)
    assert normal == ""
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "NYC"}


def test_mistral_tool_call():
    p = FunctionCallParser(TOOLS, "mistral")
    text = '[TOOL_CALLS] [{"name": "get_weather", "arguments": {"city": "LA"}}]'
    normal, calls = p.parse_non_stream(text)
    assert len(calls) == 1
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "LA"}


def test_unknown_tool_filtered():
    p = FunctionCallParser(TOOLS, "hermes")
    text = '<tool_call>{"name": "rm_rf", "arguments": {}}</tool_call>'
    _, calls = p.parse_non_stream(text)
    assert calls == []


def test_no_tool_call_passthrough():
    p = FunctionCallParser(TOOLS, "hermes")
    text = "just a normal answer"
    assert not p.has_tool_call(text)
    normal, calls = p.parse_non_stream(text)
    assert normal == text and calls == []


# ------------------------------------------------- streaming tool calls


def _push_all(parser, text, chunk=3):
    """Feed text in small chunks; collect text + tool deltas."""
    out_text, deltas = [], []
    for i in range(0, len(text), chunk):
        t, d = parser.push(text[i : i + chunk])
        out_text.append(t)
        deltas.extend(d)
    t, d = parser.finish()
    out_text.append(t)
    deltas.extend(d)
    return "".join(out_text), deltas


def _reassemble(deltas):
    """Rebuild complete calls from OpenAI streaming deltas."""
    calls = {}
    for d in deltas:
        c = calls.setdefault(d["index"], {"name": "", "arguments": ""})
        fn = d.get("function", {})
        if fn.get("name"):
            c["name"] = fn["name"]
        c["arguments"] += fn.get("arguments", "")
    return [calls[i] for i in sorted(calls)]


def test_streaming_hermes_incremental():
    import json

    from sglang_tpu.parser.function_call import StreamingFunctionCallParser

    p = StreamingFunctionCallParser(format="hermes")
    text = (
        'Sure, checking. <tool_call>{"name": "get_weather", '
        '"arguments": {"city": "Paris", "unit": "c"}}</tool_call> done '
        '<tool_call>{"name": "get_time", "arguments": {}}</tool_call>'
    )
    normal, deltas = _push_all(p, text, chunk=2)
    assert "Sure, checking." in normal and "done" in normal
    assert "<tool_call>" not in normal
    calls = _reassemble(deltas)
    assert [c["name"] for c in calls] == ["get_weather", "get_time"]
    assert json.loads(calls[0]["arguments"]) == {"city": "Paris", "unit": "c"}
    assert json.loads(calls[1]["arguments"] or "{}") == {}
    # name arrived BEFORE the arguments finished streaming
    name_pos = next(i for i, d in enumerate(deltas) if d.get("function", {}).get("name"))
    arg_frags = [i for i, d in enumerate(deltas) if d.get("function", {}).get("arguments")]
    assert len(arg_frags) > 1  # truly incremental, not one blob
    assert name_pos < arg_frags[-1]


def test_streaming_hermes_string_escapes_and_partial_tag():
    import json

    from sglang_tpu.parser.function_call import StreamingFunctionCallParser

    p = StreamingFunctionCallParser(format="hermes")
    text = (
        'a < b and <tool <tool_call>{"name": "f", '
        '"arguments": {"s": "br{ace \\" ok]"}}</tool_call>'
    )
    normal, deltas = _push_all(p, text, chunk=1)
    assert normal.startswith("a < b and <tool ")
    calls = _reassemble(deltas)
    assert json.loads(calls[0]["arguments"]) == {"s": 'br{ace " ok]'}


def test_streaming_non_hermes_buffers_to_finish():
    import json

    from sglang_tpu.parser.function_call import StreamingFunctionCallParser

    p = StreamingFunctionCallParser(format="mistral")
    text = '[TOOL_CALLS] [{"name": "f", "arguments": {"x": 1}}]'
    normal, deltas = _push_all(p, text, chunk=4)
    calls = _reassemble(deltas)
    assert calls and calls[0]["name"] == "f"
    assert json.loads(calls[0]["arguments"]) == {"x": 1}


def test_streaming_plain_text_passthrough():
    from sglang_tpu.parser.function_call import StreamingFunctionCallParser

    p = StreamingFunctionCallParser(format="hermes")
    normal, deltas = _push_all(p, "just a plain answer with no calls", chunk=5)
    assert normal == "just a plain answer with no calls"
    assert not deltas and not p.seen_call


# ------------------------- model-specific tool-call detectors (F3 breadth)

def _parse(fmt, text, tools=None):
    from sglang_tpu.parser.function_call import FunctionCallParser

    p = FunctionCallParser(tools=tools, format=fmt)
    assert p.has_tool_call(text)
    return p.parse_non_stream(text)


def test_deepseekv3_detector():
    text = (
        "I'll check the weather.<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>"
        "function<｜tool▁sep｜>get_weather\n```json\n"
        '{"location": "Tokyo"}\n```<｜tool▁call▁end｜>\n'
        "<｜tool▁call▁begin｜>function<｜tool▁sep｜>get_weather\n```json\n"
        '{"location": "Paris"}\n```<｜tool▁call▁end｜><｜tool▁calls▁end｜>'
    )
    normal, calls = _parse("deepseekv3", text)
    assert normal == "I'll check the weather."
    assert [c["function"]["name"] for c in calls] == ["get_weather"] * 2
    import json
    assert json.loads(calls[1]["function"]["arguments"]) == {"location": "Paris"}


def test_deepseekv31_detector():
    text = (
        "thinking done<｜tool▁call▁begin｜>search<｜tool▁sep｜>"
        '{"q": "tpu"}<｜tool▁call▁end｜>'
    )
    normal, calls = _parse("deepseekv31", text)
    assert normal == "thinking done"
    assert calls[0]["function"]["name"] == "search"
    assert calls[0]["function"]["arguments"] == '{"q": "tpu"}'


def test_kimi_k2_detector():
    text = (
        "ok<|tool_calls_section_begin|><|tool_call_begin|>functions.add:0"
        '<|tool_call_argument_begin|>{"a": 1, "b": 2}<|tool_call_end|>'
        "<|tool_calls_section_end|>"
    )
    normal, calls = _parse("kimi_k2", text)
    assert normal == "ok"
    assert calls[0]["function"]["name"] == "add"
    assert calls[0]["function"]["arguments"] == '{"a": 1, "b": 2}'


def test_glm4_moe_detector():
    import json
    text = (
        "done\n<tool_call>get_weather\n"
        "<arg_key>city</arg_key>\n<arg_value>Beijing</arg_value>\n"
        "<arg_key>days</arg_key>\n<arg_value>3</arg_value>\n</tool_call>"
    )
    normal, calls = _parse("glm45", text)
    assert normal == "done"
    assert calls[0]["function"]["name"] == "get_weather"
    assert json.loads(calls[0]["function"]["arguments"]) == {
        "city": "Beijing", "days": 3,
    }


def test_qwen3_coder_detector():
    import json
    text = (
        "<tool_call><function=read_file>\n"
        "<parameter=path>/tmp/x.py</parameter>\n"
        "<parameter=limit>10</parameter>\n"
        "</function></tool_call>"
    )
    normal, calls = _parse("qwen3_coder", text)
    assert calls[0]["function"]["name"] == "read_file"
    assert json.loads(calls[0]["function"]["arguments"]) == {
        "path": "/tmp/x.py", "limit": 10,
    }


def test_pythonic_detector():
    import json
    text = '[get_weather(city="SF", units="c"), tides(hours=[1, 2])]'
    normal, calls = _parse("llama4", text)
    assert normal == ""
    assert [c["function"]["name"] for c in calls] == ["get_weather", "tides"]
    assert json.loads(calls[1]["function"]["arguments"]) == {"hours": [1, 2]}


def test_gpt_oss_detector():
    text = (
        "<|channel|>commentary to=functions.get_time <|constrain|>json"
        '<|message|>{"tz": "UTC"}<|call|>'
        "<|channel|>final<|message|>It is noon."
    )
    normal, calls = _parse("gpt-oss", text)
    assert calls[0]["function"]["name"] == "get_time"
    assert calls[0]["function"]["arguments"] == '{"tz": "UTC"}'
    assert normal == "It is noon."


def test_new_detectors_flush_via_streaming_finish():
    from sglang_tpu.parser.function_call import StreamingFunctionCallParser

    sp = StreamingFunctionCallParser(format="kimi_k2")
    text = (
        "pre<|tool_calls_section_begin|><|tool_call_begin|>functions.f:0"
        '<|tool_call_argument_begin|>{"x": 1}<|tool_call_end|>'
        "<|tool_calls_section_end|>"
    )
    for ch in text:
        t, d = sp.push(ch)
        assert d == []
    normal, deltas = sp.finish()
    assert normal == "pre"
    assert deltas[0]["function"]["name"] == "f"
