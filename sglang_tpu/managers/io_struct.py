"""Request/response message vocabulary.

Parity with reference `srt/managers/io_struct.py` (`GenerateReqInput:135`,
`TokenizedGenerateReqInput:711`, `BatchTokenIDOutput:1073`,
`BatchStrOutput:1145`, finish reasons). The TPU engine is single-process per
host so these are plain dataclasses passed by reference, not ZMQ-pickled.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union

from sglang_tpu.sampling.sampling_params import SamplingParams


@dataclass
class GenerateReqInput:
    text: Optional[Union[str, List[str]]] = None
    input_ids: Optional[Union[List[int], List[List[int]]]] = None
    sampling_params: Optional[Union[Dict, List[Dict]]] = None
    rid: Optional[Union[str, List[str]]] = None
    return_logprob: bool = False
    logprob_start_len: int = -1
    top_logprobs_num: int = 0
    stream: bool = False
    lora_path: Optional[str] = None
    session_params: Optional[Dict] = None
    priority: int = 0
    # multimodal: processor-normalized pixel values [3,S,S] or [N,3,S,S]
    image_data: object = None
    # precomputed input embeddings [T, H] replacing token-id lookup
    # (reference /generate input_embeds)
    input_embeds: object = None

    def is_batch(self) -> bool:
        if self.text is not None:
            return not isinstance(self.text, str)
        return bool(self.input_ids) and isinstance(self.input_ids[0], list)

    def regenerate_rid(self):
        self.rid = uuid.uuid4().hex
        return self.rid

    def unbatch(self) -> List["GenerateReqInput"]:
        """Split a batched request into single requests."""
        if not self.is_batch():
            if self.rid is None:
                self.regenerate_rid()
            return [self]
        n = len(self.text) if self.text is not None else len(self.input_ids)
        outs = []
        for i in range(n):
            sp = (
                self.sampling_params[i]
                if isinstance(self.sampling_params, list)
                else self.sampling_params
            )
            rid = self.rid[i] if isinstance(self.rid, list) else uuid.uuid4().hex
            outs.append(
                GenerateReqInput(
                    text=self.text[i] if self.text is not None else None,
                    input_ids=self.input_ids[i] if self.input_ids is not None else None,
                    sampling_params=sp,
                    rid=rid,
                    return_logprob=self.return_logprob,
                    logprob_start_len=self.logprob_start_len,
                    top_logprobs_num=self.top_logprobs_num,
                    stream=self.stream,
                    lora_path=self.lora_path,
                    priority=self.priority,
                )
            )
        return outs


@dataclass
class TokenizedGenerateReqInput:
    rid: str
    input_ids: List[int]
    sampling_params: SamplingParams
    return_logprob: bool = False
    logprob_start_len: int = -1
    top_logprobs_num: int = 0
    stream: bool = False
    lora_path: Optional[str] = None
    priority: int = 0
    session_id: Optional[str] = None
    arrival_time: float = 0.0
    # multimodal: precomputed image embeddings + their prompt positions
    mm_embeds: object = None  # np [M, H]
    mm_positions: object = None  # np [M] indices into input_ids
    # Qwen2-VL M-RoPE: [3, T] prompt positions + the decode-time offset
    mrope_positions: object = None
    mrope_delta: object = None


@dataclass
class EmbeddingReqInput:
    text: Optional[Union[str, List[str]]] = None
    input_ids: Optional[Union[List[int], List[List[int]]]] = None
    rid: Optional[Union[str, List[str]]] = None


class FinishReason:
    """Finish condition taxonomy (reference `schedule_batch.py:1148-1244`
    FINISH_MATCHED_TOKEN / FINISH_MATCHED_STR / FINISH_LENGTH / FINISH_ABORT)."""

    def __init__(self, kind: str, matched: Any = None, message: str = ""):
        self.kind = kind  # "stop" | "length" | "abort"
        self.matched = matched
        self.message = message

    def to_json(self):
        d = {"type": self.kind}
        if self.matched is not None:
            d["matched"] = self.matched
        if self.message:
            d["message"] = self.message
        return d

    def __repr__(self):
        return f"FinishReason({self.kind}, {self.matched})"


@dataclass
class ReqOutput:
    """Per-request incremental output (token-id level)."""

    rid: str
    output_ids: List[int]  # full output so far
    new_token_ids: List[int]  # tokens added since last emit
    finished: bool
    finish_reason: Optional[FinishReason] = None
    prompt_tokens: int = 0
    completion_tokens: int = 0
    cached_tokens: int = 0
    # logprobs
    output_token_logprobs: Optional[List[float]] = None
    output_top_logprobs: Optional[List] = None
    input_token_logprobs: Optional[List[float]] = None
    # e2e timing
    ttft: Optional[float] = None


@dataclass
class ReqStrOutput:
    """Detokenized incremental output."""

    rid: str
    output_str: str  # full decoded text so far (stop-trimmed)
    new_text: str  # increment since last emit
    finished: bool
    finish_reason: Optional[FinishReason] = None
    prompt_tokens: int = 0
    completion_tokens: int = 0
    cached_tokens: int = 0
    output_ids: List[int] = field(default_factory=list)
    output_token_logprobs: Optional[List[float]] = None
    output_top_logprobs: Optional[List] = None
    input_token_logprobs: Optional[List[float]] = None
    ttft: Optional[float] = None


@dataclass
class AbortReq:
    rid: str


@dataclass
class FlushCacheReq:
    pass


@dataclass
class GetServerInfoReq:
    pass
