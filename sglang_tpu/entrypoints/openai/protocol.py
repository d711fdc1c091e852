"""OpenAI-compatible API schemas.

Parity with reference `srt/entrypoints/openai/protocol.py` (pydantic request/
response models for /v1/completions, /v1/chat/completions, /v1/models),
trimmed to the fields the engine implements; unknown fields are ignored.
"""

from __future__ import annotations

import time
import uuid
from typing import Any, Dict, List, Optional, Union

from pydantic import BaseModel, ConfigDict, Field


class OpenAIBase(BaseModel):
    model_config = ConfigDict(extra="ignore")


class CompletionRequest(OpenAIBase):
    model: str = ""
    prompt: Union[str, List[str], List[int], List[List[int]]] = ""
    max_tokens: Optional[int] = 128
    temperature: float = 1.0
    top_p: float = 1.0
    n: int = 1
    stream: bool = False
    logprobs: Optional[int] = None
    echo: bool = False
    stop: Optional[Union[str, List[str]]] = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    seed: Optional[int] = None
    user: Optional[str] = None
    # extensions (reference supports the same passthroughs)
    top_k: int = -1
    min_p: float = 0.0
    min_tokens: int = 0
    regex: Optional[str] = None
    ebnf: Optional[str] = None
    json_schema: Optional[str] = None
    ignore_eos: bool = False
    stop_token_ids: Optional[List[int]] = None
    skip_special_tokens: bool = True

    def to_sampling_dict(self) -> Dict[str, Any]:
        return dict(
            max_new_tokens=self.max_tokens if self.max_tokens is not None else 128,
            min_new_tokens=self.min_tokens,
            temperature=self.temperature,
            top_p=self.top_p,
            top_k=self.top_k,
            min_p=self.min_p,
            frequency_penalty=self.frequency_penalty,
            presence_penalty=self.presence_penalty,
            repetition_penalty=self.repetition_penalty,
            stop=self.stop,
            stop_token_ids=self.stop_token_ids,
            ignore_eos=self.ignore_eos,
            skip_special_tokens=self.skip_special_tokens,
            regex=self.regex,
            ebnf=self.ebnf,
            json_schema=self.json_schema,
        )


class ChatMessage(OpenAIBase):
    role: str
    content: Optional[Union[str, List[Dict[str, Any]]]] = None
    name: Optional[str] = None
    tool_calls: Optional[List[Dict[str, Any]]] = None
    tool_call_id: Optional[str] = None

    def text(self) -> str:
        if self.content is None:
            return ""
        if isinstance(self.content, str):
            return self.content
        return "".join(
            part.get("text", "") for part in self.content if part.get("type") == "text"
        )


class ResponseFormat(OpenAIBase):
    type: str = "text"  # "text" | "json_object" | "json_schema"
    json_schema: Optional[Dict[str, Any]] = None


class ChatCompletionRequest(OpenAIBase):
    model: str = ""
    messages: List[ChatMessage] = Field(default_factory=list)
    max_tokens: Optional[int] = None
    max_completion_tokens: Optional[int] = None
    temperature: float = 1.0
    top_p: float = 1.0
    n: int = 1
    stream: bool = False
    stream_options: Optional[Dict[str, Any]] = None
    stop: Optional[Union[str, List[str]]] = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    logprobs: bool = False
    top_logprobs: Optional[int] = None
    seed: Optional[int] = None
    response_format: Optional[ResponseFormat] = None
    tools: Optional[List[Dict[str, Any]]] = None
    tool_choice: Optional[Union[str, Dict[str, Any]]] = "auto"
    user: Optional[str] = None
    # extensions
    top_k: int = -1
    min_p: float = 0.0
    min_tokens: int = 0
    regex: Optional[str] = None
    ebnf: Optional[str] = None
    ignore_eos: bool = False
    stop_token_ids: Optional[List[int]] = None
    skip_special_tokens: bool = True

    def max_new_tokens(self) -> int:
        return self.max_completion_tokens or self.max_tokens or 128

    def to_sampling_dict(self) -> Dict[str, Any]:
        json_schema = None
        if self.response_format is not None:
            if self.response_format.type == "json_schema" and self.response_format.json_schema:
                import json as _json

                schema = self.response_format.json_schema.get("schema")
                json_schema = _json.dumps(schema) if schema else None
            elif self.response_format.type == "json_object":
                json_schema = '{"type": "object"}'
        return dict(
            max_new_tokens=self.max_new_tokens(),
            min_new_tokens=self.min_tokens,
            temperature=self.temperature,
            top_p=self.top_p,
            top_k=self.top_k,
            min_p=self.min_p,
            frequency_penalty=self.frequency_penalty,
            presence_penalty=self.presence_penalty,
            repetition_penalty=self.repetition_penalty,
            stop=self.stop,
            stop_token_ids=self.stop_token_ids,
            ignore_eos=self.ignore_eos,
            skip_special_tokens=self.skip_special_tokens,
            regex=self.regex,
            ebnf=self.ebnf,
            json_schema=json_schema,
        )


def completion_id() -> str:
    return f"cmpl-{uuid.uuid4().hex}"


def chat_id() -> str:
    return f"chatcmpl-{uuid.uuid4().hex}"


def usage_dict(prompt_tokens: int, completion_tokens: int, cached: int = 0) -> dict:
    return {
        "prompt_tokens": prompt_tokens,
        "completion_tokens": completion_tokens,
        "total_tokens": prompt_tokens + completion_tokens,
        "prompt_tokens_details": {"cached_tokens": cached},
    }


def now() -> int:
    return int(time.time())
