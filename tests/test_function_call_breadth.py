"""Tool-call detector breadth (round 5): step3, internlm, hunyuan,
minimax-m2, lfm2, mimo, gemma, json_array — full-parse and
streaming-increment (chunked push + finish) per detector."""

import json

import pytest

from sglang_tpu.parser.function_call import (
    DETECTORS,
    FunctionCallParser,
    StreamingFunctionCallParser,
)

TOOLS = [
    {"type": "function", "function": {"name": "get_weather"}},
    {"type": "function", "function": {"name": "search"}},
]

CASES = {
    "step3": (
        "let me check.<｜tool_calls_begin｜>\n"
        "<｜tool_call_begin｜>function<｜tool_sep｜>"
        '<steptml:invoke name="get_weather">\n'
        '<steptml:parameter name="city">Paris</steptml:parameter>\n'
        '<steptml:parameter name="days">3</steptml:parameter>\n'
        "</steptml:invoke><｜tool_call_end｜>\n<｜tool_calls_end｜>",
        [("get_weather", {"city": "Paris", "days": 3})],
        "let me check.",
    ),
    "internlm": (
        'I will search.<|action_start|> <|plugin|>{"name": "search", '
        '"parameters": {"q": "tpu"}}<|action_end|>',
        [("search", {"q": "tpu"})],
        "I will search.",
    ),
    "hunyuan": (
        "checking<tool_calls>\n<tool_call>get_weather<tool_sep>\n"
        "<arg_key>city</arg_key>\n<arg_value>Tokyo</arg_value>\n"
        "<arg_key>days</arg_key>\n<arg_value>2</arg_value>\n"
        "</tool_call>\n</tool_calls>",
        [("get_weather", {"city": "Tokyo", "days": 2})],
        "checking",
    ),
    "minimax-m2": (
        'ok<minimax:tool_call>\n<invoke name="search">\n'
        '<parameter name="q">jax</parameter>\n</invoke>\n'
        "</minimax:tool_call>",
        [("search", {"q": "jax"})],
        "ok",
    ),
    "lfm2": (
        'sure<|tool_call_start|>[get_weather(city="Oslo", days=1)]'
        "<|tool_call_end|>",
        [("get_weather", {"city": "Oslo", "days": 1})],
        "sure",
    ),
    "mimo": (
        "<tool_call><function=get_weather><parameter=city>Rome</parameter>"
        "</function></tool_call>",
        [("get_weather", {"city": "Rome"})],
        "",
    ),
    "gemma": (
        '<|tool_call>{"name": "search", "arguments": {"q": "moe"}}'
        "<tool_call|>",
        [("search", {"q": "moe"})],
        "",
    ),
    "json_array": (
        '[{"name": "search", "arguments": {"q": "kv"}},'
        ' {"name": "get_weather", "arguments": {"city": "NYC"}}]',
        [("search", {"q": "kv"}), ("get_weather", {"city": "NYC"})],
        "",
    ),
}


@pytest.mark.parametrize("fmt", sorted(CASES))
def test_detector_full_parse(fmt):
    text, want, want_normal = CASES[fmt]
    p = FunctionCallParser(TOOLS, fmt)
    assert p.has_tool_call(text)
    normal, calls = p.parse_non_stream(text)
    got = [
        (c["function"]["name"], json.loads(c["function"]["arguments"]))
        for c in calls
    ]
    assert got == want
    assert normal == want_normal


@pytest.mark.parametrize("fmt", sorted(CASES))
@pytest.mark.parametrize("chunk", [1, 7])
def test_detector_streaming_increments(fmt, chunk):
    """Push the output in small increments; the assembled stream must
    produce the same calls as the full parse (buffered formats flush on
    finish — a valid single-chunk stream)."""
    text, want, _ = CASES[fmt]
    sp = StreamingFunctionCallParser(TOOLS, fmt)
    deltas = []
    for i in range(0, len(text), chunk):
        _, cds = sp.push(text[i : i + chunk])
        deltas.extend(cds)
    _, cds = sp.finish()
    deltas.extend(cds)
    # reassemble OpenAI streaming chunks by index
    by_idx = {}
    for d in deltas:
        e = by_idx.setdefault(d["index"], {"name": "", "arguments": ""})
        fn = d.get("function", {})
        if fn.get("name"):
            e["name"] = fn["name"]
        e["arguments"] += fn.get("arguments", "")
    got = [
        (e["name"], json.loads(e["arguments"]) if e["arguments"] else {})
        for _, e in sorted(by_idx.items())
    ]
    assert got == want


def test_detector_count_meets_breadth_bar():
    """VERDICT round-4 item 7: >= 20 registered format families."""
    assert len(DETECTORS) >= 20, sorted(DETECTORS)


def test_unknown_tool_filtered():
    p = FunctionCallParser(TOOLS, "step3")
    text = CASES["step3"][0].replace("get_weather", "rm_rf")
    _, calls = p.parse_non_stream(text)
    assert calls == []
