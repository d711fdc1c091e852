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
