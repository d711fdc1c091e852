"""Reasoning-content splitting (<think> ... </think>).

Parity with reference `srt/parser/reasoning_parser.py` (DeepSeek-R1 /
Qwen3-style thinking blocks): separates chain-of-thought from the final
answer, both for complete outputs and incrementally for streaming.
DeepSeek-R1 may start mid-think (no opening tag) — `force_reasoning`
models treat the stream as reasoning until `</think>`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple


@dataclass
class ReasoningParseResult:
    reasoning: str
    content: str


class ReasoningParser:
    THINK_OPEN = "<think>"
    THINK_CLOSE = "</think>"

    def __init__(self, model_type: str = "deepseek-r1"):
        # deepseek-r1 emits reasoning WITHOUT an opening tag after the
        # prompt template; qwen3 includes <think> in the output
        self.force_reasoning = model_type in ("deepseek-r1", "deepseek_r1")
        self.reset()

    def reset(self):
        self._in_reasoning = self.force_reasoning
        self._seen_close = False
        self._buffer = ""  # holds possible partial tags during streaming

    # ------------------------------------------------------------- one-shot

    def parse(self, text: str) -> ReasoningParseResult:
        t = text
        if t.startswith(self.THINK_OPEN):
            t = t[len(self.THINK_OPEN):]
            in_r = True
        else:
            in_r = self.force_reasoning
        if not in_r:
            return ReasoningParseResult("", text)
        if self.THINK_CLOSE in t:
            reasoning, content = t.split(self.THINK_CLOSE, 1)
            return ReasoningParseResult(reasoning.strip(), content.lstrip("\n"))
        return ReasoningParseResult(t.strip(), "")

    # ------------------------------------------------------------ streaming

    def parse_stream_chunk(self, new_text: str) -> Tuple[str, str]:
        """Returns (reasoning_delta, content_delta) for an incremental
        chunk. Partial tags are buffered until disambiguated."""
        self._buffer += new_text
        reasoning_out = []
        content_out = []
        while self._buffer:
            if self._seen_close or not self._in_reasoning:
                if not self._seen_close and self._buffer.startswith(
                    self.THINK_OPEN
                ):
                    self._buffer = self._buffer[len(self.THINK_OPEN):]
                    self._in_reasoning = True
                    continue
                if not self._seen_close and _is_prefix_of(
                    self._buffer, self.THINK_OPEN
                ):
                    break  # possible tag start: wait for more text
                content_out.append(self._buffer)
                self._buffer = ""
            else:
                idx = self._buffer.find(self.THINK_CLOSE)
                if idx != -1:
                    reasoning_out.append(self._buffer[:idx])
                    self._buffer = self._buffer[idx + len(self.THINK_CLOSE):]
                    self._in_reasoning = False
                    self._seen_close = True
                    continue
                # emit all but a possible partial closing tag at the tail
                keep = _partial_suffix_len(self._buffer, self.THINK_CLOSE)
                emit = self._buffer[: len(self._buffer) - keep]
                if emit:
                    reasoning_out.append(emit)
                    self._buffer = self._buffer[len(emit):]
                break
        return "".join(reasoning_out), "".join(content_out)


def _is_prefix_of(s: str, tag: str) -> bool:
    return len(s) < len(tag) and tag.startswith(s)


def _partial_suffix_len(s: str, tag: str) -> int:
    """Length of the longest suffix of `s` that is a proper prefix of
    `tag`."""
    for n in range(min(len(tag) - 1, len(s)), 0, -1):
        if s.endswith(tag[:n]):
            return n
    return 0
