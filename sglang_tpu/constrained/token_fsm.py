"""DFA x token-vocabulary product: per-state vocab masks.

Native replacement for the reference's xgrammar token-bitmask generation
(`constrained/xgrammar_backend.py:188 fill_vocab_mask`): for a DFA state,
a token is allowed iff consuming ALL its characters stays alive in the DFA.
Masks are computed lazily per state and cached (grammars typically visit a
tiny fraction of states during decoding), using a token trie so shared
prefixes are walked once.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from sglang_tpu.constrained.regex_engine import DFA


class _TrieNode:
    __slots__ = ("children", "token_ids")

    def __init__(self):
        self.children: Dict[str, "_TrieNode"] = {}
        self.token_ids: List[int] = []


def _vocab_size(tokenizer) -> int:
    # len(tokenizer) undercounts when the vocab has id holes
    return max(max(tokenizer.get_vocab().values()) + 1, len(tokenizer))


def _token_strings(tokenizer) -> List[Optional[str]]:
    """Decoded surface string per token id (None for special tokens)."""
    vocab_size = _vocab_size(tokenizer)
    special = set(tokenizer.all_special_ids or [])
    strings: List[Optional[str]] = [None] * vocab_size
    # batch-decode is much faster than per-id decode for big vocabs
    ids = [i for i in range(vocab_size) if i not in special]
    toks = tokenizer.convert_ids_to_tokens(ids)
    for i, tok in zip(ids, toks):
        if tok is None:
            continue
        try:
            s = tokenizer.convert_tokens_to_string([tok])
        except Exception:
            continue
        strings[i] = s
    return strings


class TokenFSM:
    """Token-level view of a character DFA for one tokenizer."""

    _trie_cache: Dict[int, Tuple[_TrieNode, int, List[int]]] = {}

    def __init__(self, dfa: DFA, tokenizer):
        self.dfa = dfa
        self.tokenizer = tokenizer
        self.vocab_size = _vocab_size(tokenizer)
        self.eos_ids = [tokenizer.eos_token_id] if tokenizer.eos_token_id is not None else []
        key = id(tokenizer)
        if key not in TokenFSM._trie_cache:
            TokenFSM._trie_cache[key] = self._build_trie(tokenizer)
        self.trie, _, _ = TokenFSM._trie_cache[key]
        self._mask_cache: Dict[int, np.ndarray] = {}
        self._advance_cache: Dict[Tuple[int, int], int] = {}
        self._token_strs: List[Optional[str]] = None

    @staticmethod
    def _build_trie(tokenizer):
        strings = _token_strings(tokenizer)
        root = _TrieNode()
        for tid, s in enumerate(strings):
            if s is None or s == "":
                continue
            node = root
            for ch in s:
                nxt = node.children.get(ch)
                if nxt is None:
                    nxt = _TrieNode()
                    node.children[ch] = nxt
                node = nxt
            node.token_ids.append(tid)
        return root, len(strings), strings

    # ----------------------------------------------------------------- mask

    def mask_for_state(self, state: int) -> np.ndarray:
        """Boolean [vocab] mask of allowed tokens at `state`. EOS is allowed
        iff the state is accepting. Cached per state."""
        cached = self._mask_cache.get(state)
        if cached is not None:
            return cached
        mask = np.zeros(self.vocab_size, dtype=bool)
        stack = [(self.trie, state)]
        while stack:
            node, st = stack.pop()
            for ch, child in node.children.items():
                nxt = self.dfa.step(st, ord(ch))
                if nxt < 0:
                    continue
                if child.token_ids:
                    mask[child.token_ids] = True
                stack.append((child, nxt))
        if self.dfa.accepting[state]:
            for e in self.eos_ids:
                mask[e] = True
        self._mask_cache[state] = mask
        return mask

    def token_string(self, token_id: int) -> Optional[str]:
        """Decoded surface string of one token (None for specials)."""
        if self._token_strs is None:
            self._token_strs = TokenFSM._trie_cache[id(self.tokenizer)][2]
        if 0 <= token_id < len(self._token_strs):
            return self._token_strs[token_id]
        return None

    def advance(self, state: int, token_id: int) -> int:
        """DFA state after consuming `token_id` (or -1 dead / unchanged for
        EOS)."""
        if token_id in self.eos_ids:
            return state
        key = (state, token_id)
        cached = self._advance_cache.get(key)
        if cached is not None:
            return cached
        if self._token_strs is None:
            self._token_strs = TokenFSM._trie_cache[id(self.tokenizer)][2]
        s = self._token_strs[token_id]
        nxt = self.dfa.step_string(state, s) if s else state
        self._advance_cache[key] = nxt
        return nxt

    def jump_forward(self, state: int) -> Tuple[str, int]:
        """Longest forced character string from `state` (single outgoing
        single-codepoint transition chain, non-accepting) — the reference's
        jump-forward decoding (`outlines_jump_forward.py`)."""
        out = []
        seen = set()
        while state not in seen:
            seen.add(state)
            if self.dfa.accepting[state]:
                break
            row = self.dfa.transitions[state]
            if len(row) != 1:
                break
            (lo, hi), tgt = row[0]
            if lo != hi:
                break
            out.append(chr(lo))
            state = tgt
        return "".join(out), state
