"""Incremental detokenization with stop-string trimming.

Parity with reference `srt/managers/detokenizer_manager.py:75
DetokenizerManager` (incremental decode + stop-str trim `:154`) — but run
in-process on the `Req` (the reference keeps the same two-offset state in a
`DecodeStatus` per rid; the TPU engine is single-process so the state lives
directly on the request).

The two-offset incremental algorithm: `surr_offset` marks a safe decode
restart point (never inside a multi-byte/multi-token grapheme), `read_offset`
marks how many tokens are already reflected in `decoded_text`. Each step
decodes `ids[surr:]`, and emits the part beyond the previously-decoded
context unless it ends in a UTF-8 replacement char (incomplete grapheme).
"""

from __future__ import annotations

from typing import List, Optional, Tuple


class IncrementalDecoder:
    def __init__(
        self,
        tokenizer,
        skip_special_tokens: bool = True,
        spaces_between_special_tokens: bool = True,
    ):
        self.tokenizer = tokenizer
        self.skip_special_tokens = skip_special_tokens
        self.spaces_between_special_tokens = spaces_between_special_tokens
        self.decoded_text = ""
        self.surr_offset = 0
        self.read_offset = 0
        self.sent_offset = 0  # chars already emitted to the client

    def _decode(self, ids: List[int]) -> str:
        return self.tokenizer.decode(
            ids,
            skip_special_tokens=self.skip_special_tokens,
            spaces_between_special_tokens=self.spaces_between_special_tokens,
        )

    def step(self, output_ids: List[int]) -> str:
        """Incorporate the latest `output_ids`; returns newly finalized text
        (may be empty while a grapheme is incomplete)."""
        if self.tokenizer is None:
            return ""
        surr_ids = output_ids[self.surr_offset : self.read_offset]
        read_ids = output_ids[self.surr_offset :]
        surr_text = self._decode(surr_ids) if surr_ids else ""
        full_text = self._decode(read_ids) if read_ids else ""
        if full_text.endswith("�"):
            return ""  # wait for more tokens to complete the grapheme
        new_text = full_text[len(surr_text) :]
        if new_text:
            self.decoded_text += new_text
            self.surr_offset = self.read_offset
            self.read_offset = len(output_ids)
        elif len(output_ids) > self.read_offset:
            # decoded nothing new yet; advance read pointer so surr context
            # stays a bounded window
            self.read_offset = len(output_ids)
        return new_text

    def find_stop(
        self, stop_strs: List[str], stop_str_max_len: int
    ) -> Optional[Tuple[str, int]]:
        """Search the tail of decoded text for a stop string. Returns
        (matched_stop, char_index) or None. Only the last
        `stop_str_max_len + longest new chunk` window needs scanning."""
        if not stop_strs:
            return None
        text = self.decoded_text
        window_start = max(0, self.sent_offset - stop_str_max_len)
        best = None
        for s in stop_strs:
            idx = text.find(s, window_start)
            if idx != -1 and (best is None or idx < best[1]):
                best = (s, idx)
        return best

    def emit(self, trim_at: Optional[int] = None) -> str:
        """Text newly available for the client (after optional stop trim)."""
        end = len(self.decoded_text) if trim_at is None else trim_at
        chunk = self.decoded_text[self.sent_offset : end]
        self.sent_offset = end
        return chunk
