"""DSL primitives + program state + backends.

Parity with reference `lang/api.py` (`@sgl.function`, `gen`, `select`,
roles) and `lang/interpreter.py` (program execution, forks) — imperative
rather than traced: each `s += gen(...)` executes immediately against the
backend, and `select` scores each choice by total logprob (reference
`lang/choices.py` token-length-normalized logprob scoring).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Union


# ----------------------------------------------------------------- pieces


@dataclass
class Gen:
    name: Optional[str] = None
    max_tokens: int = 128
    temperature: float = 0.0
    top_p: float = 1.0
    top_k: int = -1
    stop: Optional[Union[str, List[str]]] = None
    regex: Optional[str] = None
    json_schema: Optional[str] = None
    ignore_eos: bool = False


@dataclass
class Select:
    name: Optional[str]
    choices: List[str]


@dataclass
class RoleBlock:
    role: str
    parts: List[Any]  # strings / Gen / Select


def gen(name: Optional[str] = None, **kwargs) -> Gen:
    return Gen(name=name, **kwargs)


def select(name: Optional[str] = None, choices: Optional[List[str]] = None) -> Select:
    return Select(name=name, choices=choices or [])


def system(*parts) -> RoleBlock:
    return RoleBlock("system", list(parts))


def user(*parts) -> RoleBlock:
    return RoleBlock("user", list(parts))


def assistant(*parts) -> RoleBlock:
    return RoleBlock("assistant", list(parts))


# ---------------------------------------------------------------- backends


class Backend:
    def generate(self, prompt: str, g: Gen) -> str:
        raise NotImplementedError

    def score(self, prompt: str, continuations: List[str]) -> List[float]:
        """Average per-token logprob of each continuation given prompt."""
        raise NotImplementedError

    def apply_chat_template(self, messages: List[dict], add_gen: bool) -> str:
        raise NotImplementedError


class EngineBackend(Backend):
    """Run programs against an in-process `sglang_tpu.Engine`."""

    def __init__(self, engine):
        self.engine = engine

    def generate(self, prompt: str, g: Gen) -> str:
        out = self.engine.generate(
            prompt,
            sampling_params=dict(
                max_new_tokens=g.max_tokens,
                temperature=g.temperature,
                top_p=g.top_p,
                top_k=g.top_k,
                stop=g.stop,
                regex=g.regex,
                json_schema=g.json_schema,
                ignore_eos=g.ignore_eos,
            ),
        )
        return out["text"]

    def score(self, prompt: str, continuations: List[str]) -> List[float]:
        return self.engine.score(prompt, continuations)

    def apply_chat_template(self, messages, add_gen):
        return self.engine.tokenizer.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=add_gen
        )


class RuntimeEndpoint(Backend):
    """Run programs against a live sglang_tpu HTTP server."""

    def __init__(self, base_url: str, timeout: float = 300.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def _post(self, route: str, payload: dict):
        import json as _json
        import urllib.request

        req = urllib.request.Request(
            self.base_url + route,
            data=_json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return _json.loads(r.read())

    def generate(self, prompt: str, g: Gen) -> str:
        out = self._post(
            "/generate",
            {
                "text": prompt,
                "sampling_params": dict(
                    max_new_tokens=g.max_tokens,
                    temperature=g.temperature,
                    top_p=g.top_p,
                    top_k=g.top_k,
                    stop=g.stop,
                    regex=g.regex,
                    json_schema=g.json_schema,
                    ignore_eos=g.ignore_eos,
                ),
            },
        )
        return out["text"]

    def score(self, prompt: str, continuations: List[str]) -> List[float]:
        out = self._post(
            "/v1/score", {"prompt": prompt, "choices": continuations}
        )
        return out["scores"]

    def apply_chat_template(self, messages, add_gen):
        # server-side templates are applied by /v1/chat/completions; the DSL
        # uses a simple role concatenation for raw /generate
        text = "".join(
            f"<|{m['role']}|>\n{m['content']}\n" for m in messages
        )
        return text + ("<|assistant|>\n" if add_gen else "")


# ------------------------------------------------------------------ state


class ProgramState:
    def __init__(self, backend: Backend):
        self.backend = backend
        self.text = ""  # raw accumulated text (non-chat mode)
        self.messages: List[dict] = []  # chat mode
        self.captures: Dict[str, str] = {}
        self._chat_mode = False

    # `s += thing`
    def __iadd__(self, other):
        self._consume(other)
        return self

    def _consume(self, other):
        if isinstance(other, str):
            if self._chat_mode:
                raise ValueError("use role blocks in chat mode")
            self.text += other
        elif isinstance(other, Gen):
            self._run_gen(other, prompt=self.text, into_text=True)
        elif isinstance(other, Select):
            self._run_select(other, prompt=self.text, into_text=True)
        elif isinstance(other, RoleBlock):
            self._chat_mode = True
            self._consume_role(other)
        else:
            raise TypeError(type(other))

    def _consume_role(self, block: RoleBlock):
        content = ""
        for part in block.parts:
            if isinstance(part, str):
                content += part
            elif isinstance(part, (Gen, Select)):
                # prompt = conversation so far + generation header + the
                # partial content of this block as assistant prefill
                prompt = (
                    self.backend.apply_chat_template(self.messages, add_gen=True)
                    + content
                )
                if isinstance(part, Gen):
                    content += self._run_gen(part, prompt=prompt, into_text=False)
                else:
                    content += self._run_select(part, prompt=prompt, into_text=False)
            else:
                raise TypeError(type(part))
        self.messages.append({"role": block.role, "content": content})

    def _run_gen(self, g: Gen, prompt: str, into_text: bool) -> str:
        out = self.backend.generate(prompt, g)
        if g.name:
            self.captures[g.name] = out
        if into_text:
            self.text += out
        return out

    def _run_select(self, sel: Select, prompt: str, into_text: bool) -> str:
        scores = self.backend.score(prompt, sel.choices)
        best = sel.choices[max(range(len(scores)), key=lambda i: scores[i])]
        if sel.name:
            self.captures[sel.name] = best
        if into_text:
            self.text += best
        return best

    def fork(self, n: int) -> List["ProgramState"]:
        """Branch into n independent states sharing the current prefix and
        the SAME backend (KV reuse across forks comes from the radix cache,
        reference `lang/interpreter` fork)."""
        forks = []
        for _ in range(n):
            st = ProgramState(self.backend)
            st.text = self.text
            st.messages = [dict(m) for m in self.messages]
            st.captures = dict(self.captures)
            st._chat_mode = self._chat_mode
            forks.append(st)
        return forks

    def __getitem__(self, name: str) -> str:
        return self.captures[name]

    def text_or_messages(self):
        return self.messages if self._chat_mode else self.text


class SglFunction:
    def __init__(self, fn):
        self.fn = fn

    def run(self, *args, backend: Backend, **kwargs) -> ProgramState:
        state = ProgramState(backend)
        self.fn(state, *args, **kwargs)
        return state

    def run_batch(self, arg_list: List[dict], backend: Backend) -> List[ProgramState]:
        return [self.run(backend=backend, **kw) for kw in arg_list]


def function(fn) -> SglFunction:
    return SglFunction(fn)
