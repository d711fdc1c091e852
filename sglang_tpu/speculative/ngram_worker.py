"""NGRAM speculative decoding.

Parity with reference `speculative/ngram_worker.py` (+ `cpp_ngram/ngram.cpp`):
draft tokens are proposed by matching the sequence's own trailing n-gram
against its history and copying what followed; the target model verifies
the whole draft in ONE ragged extend forward (our unified extend mode gives
per-sequence q_len = 1 + k natively — no dedicated verify kernel needed,
TARGET_VERIFY is just an extend batch).

Acceptance (greedy): the target's argmax at draft position i must equal the
next draft token; the first mismatch position contributes the target's own
token (standard self-speculation — output is IDENTICAL to plain greedy
decoding, so speculation is a pure latency optimization).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


class NgramProposer:
    def __init__(
        self,
        min_match: int = 1,
        max_match: int = 4,
        num_draft_tokens: int = 4,
        max_history: int = 8192,
    ):
        self.min_match = min_match
        self.max_match = max_match
        self.num_draft = num_draft_tokens
        self._native_lib = False  # lazily resolved (None = unavailable)

    def _native(self):
        if self._native_lib is False:
            try:
                from sglang_tpu.csrc import get_native_lib

                self._native_lib = get_native_lib()
            except Exception:
                self._native_lib = None
        return self._native_lib

    def propose(self, tokens: Sequence[int]) -> List[int]:
        """Draft continuation for `tokens` by longest-suffix n-gram match.

        Searches for the most recent earlier occurrence of the trailing
        n-gram (longest n first) and returns up to `num_draft` tokens that
        followed it. Uses the C++ matcher when available (reference
        `speculative/cpp_ngram/ngram.cpp`).
        """
        lib = self._native()
        if lib is not None:
            import ctypes

            arr = np.asarray(tokens, dtype=np.int32)
            out = np.zeros(self.num_draft, dtype=np.int32)
            p = ctypes.POINTER(ctypes.c_int32)
            n = lib.ngram_propose(
                arr.ctypes.data_as(p),
                len(arr),
                self.min_match,
                self.max_match,
                self.num_draft,
                out.ctypes.data_as(p),
            )
            return out[:n].tolist()
        n_tok = len(tokens)
        if n_tok < self.min_match + 1:
            return []
        toks = list(tokens)
        for n in range(min(self.max_match, n_tok - 1), self.min_match - 1, -1):
            suffix = toks[-n:]
            # scan backwards for the previous occurrence of `suffix`
            limit = n_tok - n  # exclude the suffix occurrence itself
            for start in range(limit - 1, -1, -1):
                if toks[start : start + n] == suffix:
                    cont = toks[start + n : start + n + self.num_draft]
                    if cont:
                        return cont
                    break
        return []


def accept_draft_greedy(
    target_ids: np.ndarray,  # [1 + k] target argmax at each verified position
    draft: Sequence[int],  # [k] proposed tokens
) -> List[int]:
    """Tokens to append: target's token after the pending input, plus one
    more per consecutive draft hit (reference `speculative_sampling.cu`
    greedy accept path)."""
    out = [int(target_ids[0])]
    for i, d in enumerate(draft):
        if int(d) != out[-1]:
            break
        out.append(int(target_ids[i + 1]))
    return out
