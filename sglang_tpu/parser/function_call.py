"""Tool / function-call parsing from model output.

Parity with reference `srt/function_call/function_call_parser.py` (+25
model-specific detectors). The detectors here cover the common formats:
- "hermes" / qwen: `<tool_call>{"name": ..., "arguments": {...}}</tool_call>`
- "llama3": `{"name": ..., "parameters": {...}}` (bare JSON, possibly after
  `<|python_tag|>`)
- "mistral": `[TOOL_CALLS] [{...}, {...}]`
- "deepseek": DeepSeek-V3 style fenced blocks
Streaming use: call `parse(full_text)` at finish; incremental streaming
detection is handled by buffering until a complete call is present.
"""

from __future__ import annotations

import json
import re
import uuid
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass
class ToolCall:
    name: str
    arguments: str  # JSON-encoded string (OpenAI wire format)
    id: str = field(default_factory=lambda: f"call_{uuid.uuid4().hex[:24]}")

    def to_openai(self) -> dict:
        return {
            "id": self.id,
            "type": "function",
            "function": {"name": self.name, "arguments": self.arguments},
        }


@dataclass
class ParseResult:
    normal_text: str
    calls: List[ToolCall]


def _mk_call(obj: Dict[str, Any]) -> Optional[ToolCall]:
    name = obj.get("name")
    if not isinstance(name, str):
        return None
    args = obj.get("arguments", obj.get("parameters", {}))
    if isinstance(args, str):
        args_str = args
    else:
        args_str = json.dumps(args)
    return ToolCall(name=name, arguments=args_str)


def _try_json(s: str) -> Optional[Any]:
    try:
        return json.loads(s)
    except json.JSONDecodeError:
        return None


class BaseDetector:
    def parse(self, text: str) -> ParseResult:
        raise NotImplementedError

    def has_tool_call(self, text: str) -> bool:
        raise NotImplementedError


class HermesDetector(BaseDetector):
    """Qwen / Hermes: <tool_call>{json}</tool_call> blocks."""

    PAT = re.compile(r"<tool_call>\s*(.*?)\s*</tool_call>", re.DOTALL)

    def has_tool_call(self, text: str) -> bool:
        return "<tool_call>" in text

    def parse(self, text: str) -> ParseResult:
        calls = []
        for m in self.PAT.finditer(text):
            obj = _try_json(m.group(1))
            if isinstance(obj, dict):
                call = _mk_call(obj)
                if call:
                    calls.append(call)
        normal = self.PAT.sub("", text).strip()
        normal = normal.replace("<tool_call>", "").strip()
        return ParseResult(normal, calls)


class Llama3Detector(BaseDetector):
    """Llama-3.x JSON tool format: bare {"name": ..., "parameters": {...}}
    optionally after <|python_tag|>; multiple calls ';'-separated."""

    def has_tool_call(self, text: str) -> bool:
        t = text.strip()
        return "<|python_tag|>" in t or t.startswith('{"name"') or t.startswith(
            '{ "name"'
        )

    def parse(self, text: str) -> ParseResult:
        t = text.strip()
        normal = ""
        if "<|python_tag|>" in t:
            normal, t = t.split("<|python_tag|>", 1)
        calls = []
        for part in t.split(";"):
            obj = _try_json(part.strip())
            if isinstance(obj, dict):
                call = _mk_call(obj)
                if call:
                    calls.append(call)
        if not calls:
            return ParseResult(text, [])
        return ParseResult(normal.strip(), calls)


class MistralDetector(BaseDetector):
    """[TOOL_CALLS] [{...}, {...}]"""

    TAG = "[TOOL_CALLS]"

    def has_tool_call(self, text: str) -> bool:
        return self.TAG in text

    def parse(self, text: str) -> ParseResult:
        if self.TAG not in text:
            return ParseResult(text, [])
        normal, rest = text.split(self.TAG, 1)
        rest = rest.strip()
        arr = _try_json(rest)
        if arr is None:
            # find the JSON array bounds
            start = rest.find("[")
            depth = 0
            end = -1
            for i, ch in enumerate(rest[start:], start):
                if ch == "[":
                    depth += 1
                elif ch == "]":
                    depth -= 1
                    if depth == 0:
                        end = i + 1
                        break
            if start != -1 and end != -1:
                arr = _try_json(rest[start:end])
        calls = []
        if isinstance(arr, list):
            for obj in arr:
                if isinstance(obj, dict):
                    call = _mk_call(obj)
                    if call:
                        calls.append(call)
        return ParseResult(normal.strip(), calls)


DETECTORS = {
    "hermes": HermesDetector,
    "qwen25": HermesDetector,
    "qwen": HermesDetector,
    "llama3": Llama3Detector,
    "mistral": MistralDetector,
}


class FunctionCallParser:
    """Dispatch by tool-call format name (reference FunctionCallParser)."""

    def __init__(self, tools: Optional[List[dict]] = None, format: str = "hermes"):
        if format not in DETECTORS:
            raise ValueError(
                f"unknown tool-call format {format}; known: {sorted(DETECTORS)}"
            )
        self.detector = DETECTORS[format]()
        self.tools = tools or []
        self._allowed = {
            t.get("function", {}).get("name")
            for t in self.tools
            if t.get("type") == "function"
        }

    def has_tool_call(self, text: str) -> bool:
        return self.detector.has_tool_call(text)

    def parse_non_stream(self, text: str) -> Tuple[str, List[dict]]:
        result = self.detector.parse(text)
        calls = [
            c.to_openai()
            for c in result.calls
            if not self._allowed or c.name in self._allowed
        ]
        return result.normal_text, calls


def _longest_tag_prefix(s: str, tag: str) -> int:
    """Length of the longest suffix of `s` that is a proper prefix of
    `tag` (text that must be held back — it may grow into the tag)."""
    for n in range(min(len(tag) - 1, len(s)), 0, -1):
        if s.endswith(tag[:n]):
            return n
    return 0


class StreamingFunctionCallParser:
    """Incremental tool-call extraction for SSE chat streaming (reference
    per-detector `parse_streaming_increment` methods).

    push(delta) -> (text_delta, [openai tool_call chunk deltas]).
    For the hermes/qwen format the call NAME is emitted as soon as it is
    parseable and the arguments JSON streams out fragment-by-fragment, the
    OpenAI streaming shape ({index, id, function:{name}} first, then
    {index, function:{arguments: fragment}} chunks). llama3 / mistral
    formats have no unambiguous streaming frame, so their calls buffer and
    flush on finish() — still a valid (single-chunk) stream.
    """

    OPEN = "<tool_call>"
    CLOSE = "</tool_call>"
    _NAME = re.compile(r'"name"\s*:\s*"((?:[^"\\]|\\.)*)"')
    _ARGS_KEY = re.compile(r'"(arguments|parameters)"\s*:\s*')

    def __init__(self, tools: Optional[List[dict]] = None, format: str = "hermes"):
        self.inner = FunctionCallParser(tools, format)
        self.hermes = isinstance(self.inner.detector, HermesDetector)
        self.buf = ""  # unconsumed model text
        self.state = "text"  # text | pre_name | args | post_args
        self.index = -1  # current tool call index
        self._args_depth = 0
        self._args_started = False
        self._in_str = False  # persists across push() chunks
        self._esc = False
        self.seen_call = False

    # ------------------------------------------------------------- hermes

    def _emit_text(self) -> str:
        """Release buffered text except a possible partial OPEN tag."""
        hold = _longest_tag_prefix(self.buf, self.OPEN)
        out, self.buf = self.buf[: len(self.buf) - hold], self.buf[len(self.buf) - hold :]
        return out

    def push(self, delta: str) -> Tuple[str, List[dict]]:
        if not self.hermes:
            self.buf += delta
            return "", []
        self.buf += delta
        text_out = []
        call_deltas: List[dict] = []
        while True:
            if self.state == "text":
                i = self.buf.find(self.OPEN)
                if i < 0:
                    text_out.append(self._emit_text())
                    break
                text_out.append(self.buf[:i])
                self.buf = self.buf[i + len(self.OPEN) :]
                self.state = "pre_name"
            elif self.state == "pre_name":
                m = self._NAME.search(self.buf)
                if not m:
                    break
                name = m.group(1)
                self.index += 1
                self.seen_call = True
                call_deltas.append(
                    {
                        "index": self.index,
                        "id": f"call_{uuid.uuid4().hex[:24]}",
                        "type": "function",
                        "function": {"name": name, "arguments": ""},
                    }
                )
                self.state = "args"
                self._args_started = False
                self._args_depth = 0
                self._in_str = False
                self._esc = False
            elif self.state == "args":
                if not self._args_started:
                    m = self._ARGS_KEY.search(self.buf)
                    if not m:
                        # no arguments key yet; a close tag means {} args
                        if self.CLOSE in self.buf:
                            self.buf = self.buf.split(self.CLOSE, 1)[1]
                            self.state = "text"
                            continue
                        break
                    self.buf = self.buf[m.end() :]
                    self._args_started = True
                # stream the JSON value by brace/bracket depth
                emitted = []
                consumed = 0
                done = False
                for ch in self.buf:
                    consumed += 1
                    emitted.append(ch)
                    if self._in_str:
                        if self._esc:
                            self._esc = False
                        elif ch == "\\":
                            self._esc = True
                        elif ch == '"':
                            self._in_str = False
                        continue
                    if ch == '"':
                        self._in_str = True
                    elif ch in "{[":
                        self._args_depth += 1
                    elif ch in "}]":
                        self._args_depth -= 1
                        if self._args_depth == 0:
                            done = True
                            break
                self.buf = self.buf[consumed:]
                frag = "".join(emitted)
                if frag:
                    call_deltas.append(
                        {"index": self.index, "function": {"arguments": frag}}
                    )
                if done:
                    self.state = "post_args"
                else:
                    break
            elif self.state == "post_args":
                i = self.buf.find(self.CLOSE)
                if i < 0:
                    if len(self.buf) > len(self.CLOSE):
                        self.buf = self.buf[-len(self.CLOSE) :]
                    break
                self.buf = self.buf[i + len(self.CLOSE) :]
                self.state = "text"
        return "".join(text_out), call_deltas

    def finish(self) -> Tuple[str, List[dict]]:
        """Flush at end of stream. Non-hermes formats parse their whole
        buffer here; hermes releases any trailing text."""
        if self.hermes:
            out, self.buf = self.buf, ""
            return (out if self.state == "text" else ""), []
        text = self.buf
        self.buf = ""
        if not self.inner.has_tool_call(text):
            return text, []
        normal, calls = self.inner.parse_non_stream(text)
        deltas = []
        for c in calls:
            self.index += 1
            self.seen_call = True
            deltas.append(
                {
                    "index": self.index,
                    "id": c["id"],
                    "type": "function",
                    "function": c["function"],
                }
            )
        return normal, deltas
