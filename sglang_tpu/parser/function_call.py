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


class DeepSeekV3Detector(BaseDetector):
    """DeepSeek-V3/R1 (reference `deepseekv3_detector.py`):
    <｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function<｜tool▁sep｜>NAME
    ```json
    {args}
    ```<｜tool▁call▁end｜>…<｜tool▁calls▁end｜>"""

    BOT = "<｜tool▁calls▁begin｜>"
    CALL = re.compile(r"<｜tool▁call▁begin｜>.*?<｜tool▁call▁end｜>", re.DOTALL)
    DETAIL = re.compile(
        r"<｜tool▁call▁begin｜>(.*)<｜tool▁sep｜>(.*?)\n```json\n(.*)\n```",
        re.DOTALL,
    )

    def has_tool_call(self, text: str) -> bool:
        return self.BOT in text

    def parse(self, text: str) -> ParseResult:
        if self.BOT not in text:
            return ParseResult(text, [])
        normal, rest = text.split(self.BOT, 1)
        calls = []
        for blk in self.CALL.findall(rest):
            m = self.DETAIL.search(blk)
            if m:
                args = _try_json(m.group(3).strip())
                calls.append(
                    ToolCall(
                        name=m.group(2).strip(),
                        arguments=json.dumps(args)
                        if args is not None
                        else m.group(3).strip(),
                    )
                )
        return ParseResult(normal.strip(), calls)


class DeepSeekV31Detector(BaseDetector):
    """DeepSeek-V3.1/V3.2: <｜tool▁call▁begin｜>NAME<｜tool▁sep｜>{args}
    <｜tool▁call▁end｜> (no json fence, no function keyword)."""

    BOT = "<｜tool▁call▁begin｜>"
    DETAIL = re.compile(
        r"<｜tool▁call▁begin｜>(.*?)<｜tool▁sep｜>(.*?)<｜tool▁call▁end｜>",
        re.DOTALL,
    )

    def has_tool_call(self, text: str) -> bool:
        return self.BOT in text

    def parse(self, text: str) -> ParseResult:
        if self.BOT not in text:
            return ParseResult(text, [])
        normal = text.split(self.BOT, 1)[0]
        calls = []
        for name, args in self.DETAIL.findall(text):
            obj = _try_json(args.strip())
            calls.append(
                ToolCall(
                    name=name.strip(),
                    arguments=json.dumps(obj) if obj is not None else args.strip(),
                )
            )
        return ParseResult(normal.strip(), calls)


class KimiK2Detector(BaseDetector):
    """Kimi K2 (reference `kimik2_detector.py`):
    <|tool_calls_section_begin|><|tool_call_begin|>functions.NAME:IDX
    <|tool_call_argument_begin|>{args}<|tool_call_end|>…
    <|tool_calls_section_end|>"""

    BOT = "<|tool_calls_section_begin|>"
    CALL = re.compile(
        r"<\|tool_call_begin\|>\s*(?P<id>[^\s<|]+)\s*"
        r"<\|tool_call_argument_begin\|>\s*(?P<args>\{.*?\})\s*"
        r"<\|tool_call_end\|>",
        re.DOTALL,
    )
    ID = re.compile(r"^functions\.(?P<name>.+):\d+$")

    def has_tool_call(self, text: str) -> bool:
        return self.BOT in text

    def parse(self, text: str) -> ParseResult:
        if self.BOT not in text:
            return ParseResult(text, [])
        normal = text.split(self.BOT, 1)[0]
        calls = []
        for m in self.CALL.finditer(text):
            mid = self.ID.match(m.group("id"))
            name = mid.group("name") if mid else m.group("id")
            calls.append(ToolCall(name=name, arguments=m.group("args")))
        return ParseResult(normal.strip(), calls)


class Glm4MoeDetector(BaseDetector):
    """GLM-4.5/4.6 (reference `glm4_moe_detector.py`):
    <tool_call>NAME\n<arg_key>K</arg_key>\n<arg_value>V</arg_value>…
    </tool_call> — XML arg pairs converted to a JSON object (values parsed
    as JSON when possible, else kept as strings)."""

    CALL = re.compile(r"<tool_call>(.*?)</tool_call>", re.DOTALL)
    KV = re.compile(
        r"<arg_key>(.*?)</arg_key>\s*<arg_value>(.*?)</arg_value>", re.DOTALL
    )

    def has_tool_call(self, text: str) -> bool:
        return "<tool_call>" in text and "<arg_key>" in text

    def parse(self, text: str) -> ParseResult:
        calls = []
        for blk in self.CALL.findall(text):
            head = blk.split("<arg_key>", 1)[0].strip()
            if not head:
                continue
            args = {}
            for k, v in self.KV.findall(blk):
                v = v.strip()
                parsed = _try_json(v)
                args[k.strip()] = parsed if parsed is not None else v
            calls.append(ToolCall(name=head, arguments=json.dumps(args)))
        normal = self.CALL.sub("", text).strip()
        return ParseResult(normal, calls)


class Qwen3CoderDetector(BaseDetector):
    """Qwen3-Coder (reference `qwen3_coder_detector.py`):
    <tool_call><function=NAME><parameter=K>V</parameter>…</function>
    </tool_call>"""

    CALL = re.compile(r"<tool_call>(.*?)</tool_call>", re.DOTALL)
    FUNC = re.compile(r"<function=(.*?)>(.*?)</function>", re.DOTALL)
    PARAM = re.compile(
        r"<parameter=(.*?)>(.*?)(?:</parameter>|(?=<parameter=)|$)", re.DOTALL
    )

    def has_tool_call(self, text: str) -> bool:
        return "<tool_call>" in text and "<function=" in text

    def parse(self, text: str) -> ParseResult:
        calls = []
        for blk in self.CALL.findall(text):
            for fm in self.FUNC.finditer(blk):
                args = {}
                for k, v in self.PARAM.findall(fm.group(2)):
                    v = v.strip("\n")
                    parsed = _try_json(v)
                    args[k.strip()] = parsed if parsed is not None else v
                calls.append(
                    ToolCall(name=fm.group(1).strip(), arguments=json.dumps(args))
                )
        normal = self.CALL.sub("", text).strip()
        return ParseResult(normal, calls)


class PythonicDetector(BaseDetector):
    """Llama-4 pythonic format (reference `pythonic_detector.py`):
    [tool1(a=1, b="x"), tool2(c=[1,2])] — parsed via ast, values must be
    literals."""

    PAT = re.compile(r"\[[a-zA-Z_]\w*\(.*\)\s*\]", re.DOTALL)

    def has_tool_call(self, text: str) -> bool:
        return bool(self.PAT.search(text.strip()))

    def parse(self, text: str) -> ParseResult:
        import ast

        m = self.PAT.search(text.strip())
        if not m:
            return ParseResult(text, [])
        try:
            tree = ast.parse(m.group(0), mode="eval")
        except SyntaxError:
            return ParseResult(text, [])
        calls = []
        if isinstance(tree.body, ast.List):
            for node in tree.body.elts:
                if not (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Name)
                ):
                    continue
                try:
                    args = {
                        kw.arg: ast.literal_eval(kw.value)
                        for kw in node.keywords
                    }
                except (ValueError, SyntaxError):
                    continue
                calls.append(
                    ToolCall(name=node.func.id, arguments=json.dumps(args))
                )
        if not calls:
            return ParseResult(text, [])
        normal = (text[: m.start()] + text[m.end():]).strip()
        return ParseResult(normal, calls)


class GptOssDetector(BaseDetector):
    """gpt-oss harmony commentary channel (reference `gpt_oss_detector.py`):
    <|channel|>commentary to=functions.NAME <|constrain|>json
    <|message|>{args}<|call|>"""

    PAT = re.compile(
        r"<\|channel\|>commentary to=(?:functions\.)?([\w.]+)\s*"
        r"(?:<\|constrain\|>\s*\w+\s*)?<\|message\|>(.*?)(?:<\|call\|>|$)",
        re.DOTALL,
    )

    def has_tool_call(self, text: str) -> bool:
        return "<|channel|>commentary to=" in text

    def parse(self, text: str) -> ParseResult:
        calls = []
        for name, args in self.PAT.findall(text):
            obj = _try_json(args.strip())
            calls.append(
                ToolCall(
                    name=name,
                    arguments=json.dumps(obj) if obj is not None else args.strip(),
                )
            )
        normal = self.PAT.sub("", text)
        # strip harmony final-channel framing from the normal text
        normal = re.sub(r"<\|channel\|>final<\|message\|>", "", normal)
        return ParseResult(normal.strip(), calls)


class Step3Detector(BaseDetector):
    """Step-3 (reference `step3_detector.py`): unicode-fenced blocks with
    steptml XML invocations:
    <｜tool_calls_begin｜><｜tool_call_begin｜>function<｜tool_sep｜>
    <steptml:invoke name="NAME"><steptml:parameter name="K">V
    </steptml:parameter></steptml:invoke><｜tool_call_end｜>..."""

    BOT = "<｜tool_calls_begin｜>"
    EOT = "<｜tool_calls_end｜>"
    INVOKE = re.compile(
        r'<steptml:invoke name="([^"]+)">(.+?)</steptml:invoke>', re.DOTALL
    )
    PARAM = re.compile(
        r'<steptml:parameter name="([^"]+)">([^<]*)</steptml:parameter>',
        re.DOTALL,
    )

    def has_tool_call(self, text: str) -> bool:
        return self.BOT in text

    def parse(self, text: str) -> ParseResult:
        if self.BOT not in text:
            return ParseResult(text, [])
        normal, rest = text.split(self.BOT, 1)
        body = rest.split(self.EOT, 1)[0]
        calls = []
        for name, inner in self.INVOKE.findall(body):
            args = {}
            for k, v in self.PARAM.findall(inner):
                parsed = _try_json(v.strip())
                args[k] = parsed if parsed is not None else v.strip()
            calls.append(ToolCall(name=name, arguments=json.dumps(args)))
        return ParseResult(normal.strip(), calls)


class InternLMDetector(BaseDetector):
    """InternLM2/Interns1 (reference `internlm_detector.py`):
    <|action_start|> <|plugin|>{json}<|action_end|>"""

    BOT = "<|action_start|>"
    PAT = re.compile(
        r"<\|action_start\|>\s*<\|plugin\|>\s*(.*?)\s*<\|action_end\|>",
        re.DOTALL,
    )

    def has_tool_call(self, text: str) -> bool:
        return self.BOT in text

    def parse(self, text: str) -> ParseResult:
        calls = []
        for blob in self.PAT.findall(text):
            obj = _try_json(blob)
            if isinstance(obj, dict):
                call = _mk_call(obj)
                if call:
                    calls.append(call)
        normal = self.PAT.sub("", text)
        normal = normal.split(self.BOT, 1)[0]
        return ParseResult(normal.strip(), calls)


class HunyuanDetector(BaseDetector):
    """Hunyuan (reference `hunyuan_detector.py`):
    <tool_calls><tool_call>NAME<tool_sep><arg_key>K</arg_key>
    <arg_value>V</arg_value></tool_call></tool_calls>"""

    BOT = "<tool_calls>"
    CALL = re.compile(r"<tool_call>(.*?)</tool_call>", re.DOTALL)
    ARG = re.compile(
        r"<arg_key>(.*?)</arg_key>\s*<arg_value>(.*?)</arg_value>",
        re.DOTALL,
    )

    def has_tool_call(self, text: str) -> bool:
        return self.BOT in text

    def parse(self, text: str) -> ParseResult:
        if self.BOT not in text:
            return ParseResult(text, [])
        normal, rest = text.split(self.BOT, 1)
        body = rest.split("</tool_calls>", 1)[0]
        calls = []
        for blk in self.CALL.findall(body):
            name = blk.split("<tool_sep>", 1)[0].strip()
            args = {}
            for k, v in self.ARG.findall(blk):
                parsed = _try_json(v.strip())
                args[k.strip()] = parsed if parsed is not None else v.strip()
            if name:
                calls.append(ToolCall(name=name, arguments=json.dumps(args)))
        return ParseResult(normal.strip(), calls)


class MinimaxM2Detector(BaseDetector):
    """MiniMax-M2 (reference `minimax_m2.py`):
    <minimax:tool_call><invoke name="NAME"><parameter name="K">V
    </parameter></invoke></minimax:tool_call>"""

    BOT = "<minimax:tool_call>"
    BLOCK = re.compile(
        r"<minimax:tool_call>(.*?)(?:</minimax:tool_call>|$)", re.DOTALL
    )
    INVOKE = re.compile(
        r'<invoke name="([^"]+)"\s*>(.*?)</invoke>', re.DOTALL
    )
    PARAM = re.compile(
        r'<parameter name="([^"]+)"\s*>(.*?)</parameter>', re.DOTALL
    )

    def has_tool_call(self, text: str) -> bool:
        return self.BOT in text

    def parse(self, text: str) -> ParseResult:
        calls = []
        for body in self.BLOCK.findall(text):
            for name, inner in self.INVOKE.findall(body):
                args = {}
                for k, v in self.PARAM.findall(inner):
                    parsed = _try_json(v.strip())
                    args[k] = parsed if parsed is not None else v.strip()
                calls.append(ToolCall(name=name, arguments=json.dumps(args)))
        normal = self.BLOCK.sub("", text)
        return ParseResult(normal.replace(self.BOT, "").strip(), calls)


class Lfm2Detector(BaseDetector):
    """LFM2 (reference `lfm2_detector.py`): pythonic calls inside
    <|tool_call_start|>[f(a=1)]<|tool_call_end|> fences."""

    BOT = "<|tool_call_start|>"
    EOT = "<|tool_call_end|>"
    PAT = re.compile(
        r"<\|tool_call_start\|>(.*?)<\|tool_call_end\|>", re.DOTALL
    )

    def has_tool_call(self, text: str) -> bool:
        return self.BOT in text

    def parse(self, text: str) -> ParseResult:
        calls = []
        for body in self.PAT.findall(text):
            inner = PythonicDetector().parse(body.strip())
            calls.extend(inner.calls)
            if not inner.calls:
                obj = _try_json(body.strip())
                if isinstance(obj, dict):
                    call = _mk_call(obj)
                    if call:
                        calls.append(call)
        normal = self.PAT.sub("", text).replace(self.BOT, "")
        return ParseResult(normal.strip(), calls)


class MimoDetector(BaseDetector):
    """MiMo (reference `mimo_detector.py`):
    <tool_call><function=NAME><parameter=K>V</parameter></function>
    </tool_call> — Qwen3-Coder XML inside hermes-style fences, but ALSO
    accepts plain JSON bodies."""

    CALL = re.compile(r"<tool_call>(.*?)</tool_call>", re.DOTALL)
    FUNC = re.compile(r"<function=([^>]+)>(.*?)</function>", re.DOTALL)
    PARAM = re.compile(r"<parameter=([^>]+)>(.*?)</parameter>", re.DOTALL)

    def has_tool_call(self, text: str) -> bool:
        return "<tool_call>" in text

    def parse(self, text: str) -> ParseResult:
        calls = []
        for blk in self.CALL.findall(text):
            matched = False
            for name, inner in self.FUNC.findall(blk):
                args = {}
                for k, v in self.PARAM.findall(inner):
                    parsed = _try_json(v.strip())
                    args[k.strip()] = (
                        parsed if parsed is not None else v.strip()
                    )
                calls.append(
                    ToolCall(name=name.strip(), arguments=json.dumps(args))
                )
                matched = True
            if not matched:
                obj = _try_json(blk.strip())
                if isinstance(obj, dict):
                    call = _mk_call(obj)
                    if call:
                        calls.append(call)
        normal = self.CALL.sub("", text).strip()
        return ParseResult(normal, calls)


class GemmaDetector(BaseDetector):
    """Gemma-3/4 tool format (reference `gemma4_detector.py`):
    <|tool_call>{json}<tool_call|> (asymmetric fence tokens)."""

    BOT = "<|tool_call>"
    EOT = "<tool_call|>"
    PAT = re.compile(
        r"<\|tool_call>\s*(.*?)\s*(?:<tool_call\|>|$)", re.DOTALL
    )

    def has_tool_call(self, text: str) -> bool:
        return self.BOT in text

    def parse(self, text: str) -> ParseResult:
        calls = []
        for blob in self.PAT.findall(text):
            obj = _try_json(blob)
            if obj is None:
                inner = PythonicDetector().parse(f"[{blob}]")
                calls.extend(inner.calls)
                continue
            if isinstance(obj, dict):
                obj = [obj]
            if isinstance(obj, list):
                for o in obj:
                    if isinstance(o, dict):
                        call = _mk_call(o)
                        if call:
                            calls.append(call)
        normal = self.PAT.sub("", text).strip()
        return ParseResult(normal, calls)


class JsonArrayDetector(BaseDetector):
    """Bare JSON-array tool calls (reference `json_array_parser.py`):
    [{"name": ..., "arguments"|"parameters": ...}, ...] — used by
    constrained-decoding tool choice."""

    def has_tool_call(self, text: str) -> bool:
        t = text.strip()
        return t.startswith("[") and '"name"' in t

    def parse(self, text: str) -> ParseResult:
        t = text.strip()
        start = t.find("[")
        if start < 0:
            return ParseResult(text, [])
        arr = _try_json(t[start:])
        if arr is None:
            # trailing text after the array: find balanced bounds
            depth = 0
            for i, ch in enumerate(t[start:], start):
                if ch == "[":
                    depth += 1
                elif ch == "]":
                    depth -= 1
                    if depth == 0:
                        arr = _try_json(t[start : i + 1])
                        break
        calls = []
        if isinstance(arr, list):
            for obj in arr:
                if isinstance(obj, dict):
                    call = _mk_call(obj)
                    if call:
                        calls.append(call)
        if not calls:
            return ParseResult(text, [])
        return ParseResult(t[:start].strip(), calls)


DETECTORS = {
    "hermes": HermesDetector,
    "qwen25": HermesDetector,
    "qwen": HermesDetector,
    "llama3": Llama3Detector,
    "llama4": PythonicDetector,
    "pythonic": PythonicDetector,
    "mistral": MistralDetector,
    "deepseekv3": DeepSeekV3Detector,
    "deepseekv31": DeepSeekV31Detector,
    "deepseekv32": DeepSeekV31Detector,
    "kimi_k2": KimiK2Detector,
    "glm45": Glm4MoeDetector,
    "glm4_moe": Glm4MoeDetector,
    "qwen3_coder": Qwen3CoderDetector,
    "gpt-oss": GptOssDetector,
    "gpt_oss": GptOssDetector,
    "step3": Step3Detector,
    "internlm": InternLMDetector,
    "interns1": InternLMDetector,
    "hunyuan": HunyuanDetector,
    "minimax-m2": MinimaxM2Detector,
    "minimax_m2": MinimaxM2Detector,
    "lfm2": Lfm2Detector,
    "mimo": MimoDetector,
    "gemma": GemmaDetector,
    "gemma4": GemmaDetector,
    "json_array": JsonArrayDetector,
    "llama32": Llama3Detector,
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
