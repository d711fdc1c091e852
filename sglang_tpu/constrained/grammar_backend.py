"""Grammar backend + per-request grammar objects.

Parity with reference `constrained/base_grammar_backend.py:42
BaseGrammarObject` / `:131 BaseGrammarBackend` and the scheduler-side
`GrammarManager` compile cache: compiled (regex -> DFA -> TokenFSM)
artifacts are cached by constraint key; each request gets a lightweight
`NativeGrammar` cursor over the shared FSM.
"""

from __future__ import annotations

import threading
from typing import Dict, Optional, Tuple

import numpy as np

from sglang_tpu.constrained.json_schema import schema_to_regex
from sglang_tpu.constrained.regex_engine import compile_regex
from sglang_tpu.constrained.token_fsm import TokenFSM
from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


class NativeGrammar:
    """Per-request cursor over a shared TokenFSM (reference
    BaseGrammarObject: fill_vocab_mask / accept_token / rollback)."""

    def __init__(self, fsm: TokenFSM):
        self.fsm = fsm
        self.state = 0
        self.finished = False
        self._history = [0]  # state stack for spec-decode rollback

    def vocab_mask(self) -> np.ndarray:
        return self.fsm.mask_for_state(self.state)

    def accept_token(self, token_id: int) -> bool:
        nxt = self.fsm.advance(self.state, token_id)
        if nxt < 0:
            self.finished = True  # dead: constrained stream must stop
            return False
        self.state = nxt
        self._history.append(nxt)
        if token_id in self.fsm.eos_ids:
            self.finished = True
        return True

    def rollback(self, n: int) -> None:
        for _ in range(n):
            if len(self._history) > 1:
                self._history.pop()
        self.state = self._history[-1]
        self.finished = False

    def is_accepting(self) -> bool:
        return self.fsm.dfa.accepting[self.state]

    def jump_forward(self) -> Tuple[str, int]:
        return self.fsm.jump_forward(self.state)


class GrammarBackend:
    """Compile cache keyed by (kind, spec) — reference `GrammarManager`'s
    cache + queue, synchronous here (compiles are host-side and the DFA
    cache makes repeats free; async compile is a scheduler upgrade)."""

    def __init__(self, tokenizer):
        self.tokenizer = tokenizer
        self._cache: Dict[Tuple[str, str], TokenFSM] = {}
        self._lock = threading.Lock()

    def get(self, kind: str, spec: str) -> Optional[NativeGrammar]:
        key = (kind, spec)
        with self._lock:
            fsm = self._cache.get(key)
        if fsm is None:
            if kind == "regex":
                dfa = compile_regex(spec)
            elif kind == "json_schema":
                dfa = compile_regex(schema_to_regex(spec))
            elif kind == "ebnf":
                from sglang_tpu.constrained.ebnf import compile_ebnf

                dfa = compile_ebnf(spec)
            elif kind == "structural_tag":
                from sglang_tpu.constrained.structural_tag import (
                    compile_structural_tag,
                )

                dfa = compile_structural_tag(spec)
            else:
                raise ValueError(f"unknown grammar kind {kind}")
            fsm = TokenFSM(dfa, self.tokenizer)
            logger.info(
                "compiled %s grammar: %d DFA states", kind, dfa.num_states
            )
            with self._lock:
                self._cache[key] = fsm
        return NativeGrammar(fsm)


def create_grammar_backend(server_args, tokenizer) -> Optional[GrammarBackend]:
    if server_args.grammar_backend == "none" or tokenizer is None:
        return None
    return GrammarBackend(tokenizer)
