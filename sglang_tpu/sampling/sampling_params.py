"""Per-request sampling parameters.

Parity with reference `python/sglang/srt/sampling/sampling_params.py`
(`SamplingParams`): validation/normalization of temperature/top-k/top-p/min-p,
penalties, stop conditions, and structured-output constraints
(regex / JSON-schema / EBNF — compiled by the grammar backend, §2 G).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Union

TOP_K_ALL = 1 << 30


@dataclass
class SamplingParams:
    max_new_tokens: int = 128
    min_new_tokens: int = 0
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    min_p: float = 0.0
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    repetition_penalty: float = 1.0
    stop: Optional[Union[str, List[str]]] = None
    stop_token_ids: Optional[List[int]] = None
    ignore_eos: bool = False
    skip_special_tokens: bool = True
    spaces_between_special_tokens: bool = True
    no_stop_trim: bool = False
    # Structured outputs (exactly one may be set)
    regex: Optional[str] = None
    json_schema: Optional[str] = None
    ebnf: Optional[str] = None
    structural_tag: Optional[str] = None
    # named server-registered jittable logit processor + its per-request
    # parameters (reference custom_logit_processor)
    custom_logit_processor: Optional[str] = None
    custom_params: Optional[List[float]] = None
    # Logit bias: token id -> additive bias
    logit_bias: Optional[Dict[int, float]] = None
    n: int = 1
    # Logprobs
    return_logprob: bool = False
    top_logprobs_num: int = 0

    # normalized fields
    stop_strs: List[str] = field(default_factory=list, repr=False)
    stop_str_max_len: int = field(default=0, repr=False)

    def __post_init__(self):
        self.normalize()

    def normalize(self):
        if self.temperature < 0:
            raise ValueError("temperature must be non-negative")
        if not 0 < self.top_p <= 1.0:
            raise ValueError("top_p must be in (0, 1]")
        if not 0 <= self.min_p <= 1.0:
            raise ValueError("min_p must be in [0, 1]")
        if self.top_k == 0 or self.top_k < -1:
            raise ValueError("top_k must be -1 (disable) or >= 1")
        if self.top_k == -1:
            self.top_k = TOP_K_ALL
        if self.max_new_tokens < 0:
            raise ValueError("max_new_tokens must be >= 0")
        if self.repetition_penalty <= 0:
            raise ValueError("repetition_penalty must be > 0")
        if self.n < 1:
            raise ValueError("n must be >= 1")
        n_constraints = sum(
            x is not None
            for x in (self.regex, self.json_schema, self.ebnf, self.structural_tag)
        )
        if n_constraints > 1:
            raise ValueError(
                "at most one of regex / json_schema / ebnf / structural_tag"
            )
        # Greedy when temperature == 0 — emulate with argmax sampling.
        if self.temperature == 0.0:
            self.top_k = 1
            self.temperature = 1.0
        if self.stop is None:
            self.stop_strs = []
        elif isinstance(self.stop, str):
            self.stop_strs = [self.stop]
        else:
            self.stop_strs = list(self.stop)
        self.stop_str_max_len = max((len(s) for s in self.stop_strs), default=0)
        if self.stop_token_ids is None:
            self.stop_token_ids = []
        if self.logit_bias is not None:
            self.logit_bias = {int(k): float(v) for k, v in self.logit_bias.items()}

    @property
    def is_greedy(self) -> bool:
        return self.top_k == 1

    @property
    def needs_grammar(self) -> bool:
        return any(
            x is not None
            for x in (self.regex, self.json_schema, self.ebnf, self.structural_tag)
        )

    @classmethod
    def from_dict(cls, d: Optional[dict]) -> "SamplingParams":
        if not d:
            return cls()
        valid = {f.name for f in cls.__dataclass_fields__.values()}
        return cls(**{k: v for k, v in d.items() if k in valid})
