"""Forward modes and the device-side batch.

Parity with reference `python/sglang/srt/model_executor/forward_batch_info.py`
(`ForwardMode:80`, `ForwardBatch:279`). TPU-native differences:
- `ForwardBatch` is a registered JAX dataclass whose array fields are the
  *only* traced inputs; every shape is bucketed static (the analogue of the
  reference's CUDA-graph padding).
- Padded tokens write their KV to page 0 (a reserved garbage page) and
  padded sequences carry seq_len 0, so one jitted step handles any actual
  batch <= bucket.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class ForwardMode(enum.IntEnum):
    EXTEND = 1  # prefill / chunked-prefill continuation (ragged packed tokens)
    DECODE = 2  # one token per running sequence
    IDLE = 3  # no work (multi-host lockstep filler)
    TARGET_VERIFY = 4  # speculative: verify draft tokens with the target model
    DRAFT_EXTEND = 5  # speculative: extend the draft model's KV

    def is_extend(self) -> bool:
        return self in (
            ForwardMode.EXTEND,
            ForwardMode.TARGET_VERIFY,
            ForwardMode.DRAFT_EXTEND,
        )

    def is_decode(self) -> bool:
        return self == ForwardMode.DECODE


@jax.tree_util.register_dataclass
@dataclass
class ForwardBatch:
    """Device-side batch for one jitted model step.

    Shapes: T = padded token count, B = padded sequence count,
    P = max pages per sequence (static from context length).
    For DECODE, T == B.
    """

    # Per-token
    input_ids: jax.Array  # [T] int32
    positions: jax.Array  # [T] int32
    out_cache_loc: jax.Array  # [T] int32 flat KV slot (page * page_size + offset)

    # Per-sequence attention metadata
    page_table: jax.Array  # [B, P] int32 page indices
    seq_lens: jax.Array  # [B] int32 total kv length after this step (0 = padding)
    cu_q_lens: jax.Array  # [B + 1] int32 prefix sum of query lengths
    # seq index for every packed token (padding tokens -> B-1 slot is fine
    # since their seq_len is 0); used by extend attention to map token->seq.
    token_to_seq: jax.Array  # [T] int32

    # Static (hashable) metadata
    mode: ForwardMode = field(metadata=dict(static=True), default=ForwardMode.DECODE)

    @property
    def num_tokens(self) -> int:
        return self.input_ids.shape[0]

    @property
    def num_seqs(self) -> int:
        return self.seq_lens.shape[0]


def make_decode_batch(
    input_ids: np.ndarray,
    positions: np.ndarray,
    out_cache_loc: np.ndarray,
    page_table: np.ndarray,
    seq_lens: np.ndarray,
) -> ForwardBatch:
    b = len(input_ids)
    return ForwardBatch(
        input_ids=jnp.asarray(input_ids, jnp.int32),
        positions=jnp.asarray(positions, jnp.int32),
        out_cache_loc=jnp.asarray(out_cache_loc, jnp.int32),
        page_table=jnp.asarray(page_table, jnp.int32),
        seq_lens=jnp.asarray(seq_lens, jnp.int32),
        cu_q_lens=jnp.arange(b + 1, dtype=jnp.int32),
        token_to_seq=jnp.arange(b, dtype=jnp.int32),
        mode=ForwardMode.DECODE,
    )


def make_extend_batch(
    input_ids: np.ndarray,
    positions: np.ndarray,
    out_cache_loc: np.ndarray,
    page_table: np.ndarray,
    seq_lens: np.ndarray,
    cu_q_lens: np.ndarray,
    mode: ForwardMode = ForwardMode.EXTEND,
) -> ForwardBatch:
    t = len(input_ids)
    b = len(seq_lens)
    # token -> seq map: number of cu_q_lens entries <= token index, minus 1
    token_to_seq = (
        np.searchsorted(np.asarray(cu_q_lens), np.arange(t), side="right") - 1
    )
    token_to_seq = np.clip(token_to_seq, 0, b - 1)
    return ForwardBatch(
        input_ids=jnp.asarray(input_ids, jnp.int32),
        positions=jnp.asarray(positions, jnp.int32),
        out_cache_loc=jnp.asarray(out_cache_loc, jnp.int32),
        page_table=jnp.asarray(page_table, jnp.int32),
        seq_lens=jnp.asarray(seq_lens, jnp.int32),
        cu_q_lens=jnp.asarray(cu_q_lens, jnp.int32),
        token_to_seq=jnp.asarray(token_to_seq, jnp.int32),
        mode=mode,
    )
