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
    # 0 = padding, 1 = prompt token, 2 = output token re-entering via extend
    # (retraction re-prefill) — drives penalty-count accumulation.
    token_kind: jax.Array = None  # [T] int32
    # per-token LoRA adapter slot (None when no adapters are live; the
    # zero-adapter slot absorbs non-LoRA requests)
    lora_ids: jax.Array = None  # [T] int32
    # multimodal: precomputed image embeddings scattered over packed rows
    # (None for text-only batches -> its own jit variant via the treedef)
    mm_embeds: jax.Array = None  # [M, H] f32
    mm_rows: jax.Array = None  # [M] i32 packed-row index (-1 = padding)
    # multimodal rotary (Qwen2-VL M-RoPE): 3D positions on extend, or the
    # per-sequence all-axes offset on decode
    mrope_positions: jax.Array = None  # [3, T] i32
    mrope_delta: jax.Array = None  # [B] i32

    # Ragged-attention block map (host-built; consumed by the Pallas kernel
    # as scalar-prefetch metadata — one entry per (seq, q-block) work unit).
    blk_seq: jax.Array = None  # [NB] i32 seq index
    blk_qoff: jax.Array = None  # [NB] i32 packed q row offset
    blk_nrows: jax.Array = None  # [NB] i32 valid rows (0 = padding block)
    blk_pos0: jax.Array = None  # [NB] i32 absolute position of first row

    # recurrent-state slot per sequence (hybrid linear-attention models:
    # indexes the conv/delta-rule state pools; None for pure-attention
    # models -> absent from the treedef)
    state_slots: jax.Array = None  # [B] i32
    # extend KV-write jobs (host-built): page j receives kv rows
    # wr_src[j, off] at offset off (-1 = keep old). Lets write_kv_pages
    # gather-merge-rewrite whole pages instead of scattering token rows —
    # XLA's row scatter runs at ~5 GB/s on v5e (153 ms of a 380 ms
    # 4096-token prefill round, profiled).
    wr_pages: jax.Array = None  # [J] i32 page ids (pad -> page 0)
    wr_src: jax.Array = None  # [J, page_size] i32 source token (-1 = keep)
    # dLLM block diffusion: per-token mask positions that OVERRIDE
    # fb.positions in the attention mask only (rope keeps true positions).
    # Setting every block row's mask position to block_end-1 makes the
    # block bidirectional while the prefix stays causal.
    mask_positions: jax.Array = None  # [T] i32
    # chain-tail decode (ops/chain_tail.py): 0-based step index within the
    # fused K-step chain; non-None switches the attention backend to the
    # tail-buffered KV write + state-merge path.
    tail_step: jax.Array = None  # [] i32

    # Static (hashable) metadata
    mode: ForwardMode = field(metadata=dict(static=True), default=ForwardMode.DECODE)

    @property
    def num_tokens(self) -> int:
        return self.input_ids.shape[0]

    @property
    def num_seqs(self) -> int:
        return self.seq_lens.shape[0]


# Q-block row counts for the ragged paged attention kernel. Extend blocks are
# MXU-sized; decode blocks are 1 valid row each so stay small to bound the
# wasted compute on padded rows.
EXTEND_QBLK = 128
DECODE_QBLK = 8


def build_write_jobs(
    out_cache_loc: np.ndarray, n_valid: int, page_size: int, jmax: int
):
    """Group the first `n_valid` tokens' KV-write slots by page.

    Returns (wr_pages [jmax] i32, wr_src [jmax, page_size] i32): page
    wr_pages[j] takes kv row wr_src[j, off] at offset off; -1 keeps the
    page's old value. Padding jobs point at the reserved garbage page 0
    with an all-(-1) row. The extend allocator hands every sequence its
    own pages (radix sharing is page-aligned), so each real page appears
    in exactly one job.

    jmax sizing: each sequence's extend writes one contiguous slot run
    (tail-page partial fill + fresh pages), touching at most
    n_i//page_size + 2 pages (the run may both start AND end mid-page on
    chunked-prefill continuations), so t//page_size + 2*b bounds the
    batch. Speculative verify/draft batches write non-contiguous runs
    (committed boundary + scratch pages) and must NOT use this path —
    `make_extend_batch` skips job building for those modes, falling back
    to the row-scatter write.
    """
    loc = np.asarray(out_cache_loc[:n_valid])
    pages = loc // page_size
    offs = loc % page_size
    uniq, inv = np.unique(pages, return_inverse=True)
    j = len(uniq)
    assert j <= jmax, (j, jmax)
    wr_pages = np.zeros(jmax, dtype=np.int32)
    wr_pages[:j] = uniq
    wr_src = np.full((jmax, page_size), -1, dtype=np.int32)
    wr_src[inv, offs] = np.arange(n_valid, dtype=np.int32)
    return wr_pages, wr_src


def build_attn_blocks(
    cu_q_lens: np.ndarray, seq_lens: np.ndarray, qblk: int, nb: int
):
    """Flatten (seq, q-block) work units for the ragged kernel grid.

    Blocks are emitted in ascending packed-q order — the kernel relies on
    this so each block's tail-row garbage is overwritten by the next block.
    """
    b = len(seq_lens)
    blk_seq = np.zeros(nb, dtype=np.int32)
    blk_qoff = np.zeros(nb, dtype=np.int32)
    blk_nrows = np.zeros(nb, dtype=np.int32)
    blk_pos0 = np.zeros(nb, dtype=np.int32)
    n = 0
    for i in range(b):
        ql = int(cu_q_lens[i + 1] - cu_q_lens[i])
        pos_start = int(seq_lens[i]) - ql
        for j in range(0, ql, qblk):
            assert n < nb, f"attn block overflow: nb={nb}"
            blk_seq[n] = i
            blk_qoff[n] = int(cu_q_lens[i]) + j
            blk_nrows[n] = min(qblk, ql - j)
            blk_pos0[n] = pos_start + j
            n += 1
    return blk_seq, blk_qoff, blk_nrows, blk_pos0


def make_decode_batch(
    input_ids: np.ndarray,
    positions: np.ndarray,
    out_cache_loc: np.ndarray,
    page_table: np.ndarray,
    seq_lens: np.ndarray,
    lora_ids: Optional[np.ndarray] = None,
) -> ForwardBatch:
    b = len(input_ids)
    cu = np.arange(b + 1, dtype=np.int32)
    # decode: one block per sequence; padding rows (seq_len 0) get nrows=0
    # so the kernel skips them entirely (no DMA, no compute)
    blk_seq = np.arange(b, dtype=np.int32)
    blk_qoff = np.arange(b, dtype=np.int32)
    blk_nrows = (np.asarray(seq_lens) > 0).astype(np.int32)
    blk_pos0 = np.asarray(seq_lens, dtype=np.int32) - 1
    return ForwardBatch(
        input_ids=jnp.asarray(input_ids, jnp.int32),
        positions=jnp.asarray(positions, jnp.int32),
        out_cache_loc=jnp.asarray(out_cache_loc, jnp.int32),
        page_table=jnp.asarray(page_table, jnp.int32),
        seq_lens=jnp.asarray(seq_lens, jnp.int32),
        cu_q_lens=jnp.asarray(cu),
        token_to_seq=jnp.arange(b, dtype=jnp.int32),
        token_kind=jnp.asarray(
            np.where(np.asarray(seq_lens) > 0, 2, 0).astype(np.int32)
        ),
        blk_seq=jnp.asarray(blk_seq),
        blk_qoff=jnp.asarray(blk_qoff),
        blk_nrows=jnp.asarray(blk_nrows),
        blk_pos0=jnp.asarray(blk_pos0),
        lora_ids=jnp.asarray(lora_ids, jnp.int32) if lora_ids is not None else None,
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
    output_start: Optional[np.ndarray] = None,  # [B] prompt length per seq
    lora_ids: Optional[np.ndarray] = None,  # [T] per-token adapter slot
    page_size: int = 0,  # > 0: build per-page KV write jobs
) -> ForwardBatch:
    t = len(input_ids)
    b = len(seq_lens)
    # token -> seq map: number of cu_q_lens entries <= token index, minus 1
    token_to_seq = (
        np.searchsorted(np.asarray(cu_q_lens), np.arange(t), side="right") - 1
    )
    token_to_seq = np.clip(token_to_seq, 0, b - 1)
    total = int(np.asarray(cu_q_lens)[-1])
    valid = np.arange(t) < total
    if output_start is not None:
        is_out = np.asarray(positions) >= np.asarray(output_start)[token_to_seq]
    else:
        is_out = np.zeros(t, dtype=bool)
    token_kind = np.where(valid, np.where(is_out, 2, 1), 0).astype(np.int32)
    # verify batches have tiny per-seq q_lens; small blocks bound the wasted
    # compute on padded rows (same reason decode uses DECODE_QBLK)
    qblk = DECODE_QBLK if mode == ForwardMode.TARGET_VERIFY else EXTEND_QBLK
    nb = t // qblk + b  # worst-case block count (all seqs unaligned)
    blk_seq, blk_qoff, blk_nrows, blk_pos0 = build_attn_blocks(
        cu_q_lens, seq_lens, qblk, nb
    )
    return ForwardBatch(
        input_ids=jnp.asarray(input_ids, jnp.int32),
        positions=jnp.asarray(positions, jnp.int32),
        out_cache_loc=jnp.asarray(out_cache_loc, jnp.int32),
        page_table=jnp.asarray(page_table, jnp.int32),
        seq_lens=jnp.asarray(seq_lens, jnp.int32),
        cu_q_lens=jnp.asarray(cu_q_lens, jnp.int32),
        token_to_seq=jnp.asarray(token_to_seq, jnp.int32),
        token_kind=jnp.asarray(token_kind),
        blk_seq=jnp.asarray(blk_seq),
        blk_qoff=jnp.asarray(blk_qoff),
        blk_nrows=jnp.asarray(blk_nrows),
        blk_pos0=jnp.asarray(blk_pos0),
        lora_ids=jnp.asarray(lora_ids, jnp.int32) if lora_ids is not None else None,
        mode=mode,
        **(
            dict(
                zip(
                    ("wr_pages", "wr_src"),
                    map(
                        jnp.asarray,
                        build_write_jobs(
                            out_cache_loc,
                            total,
                            page_size,
                            t // page_size + 2 * b,
                        ),
                    ),
                )
            )
            # spec verify/draft batches write non-contiguous per-seq runs
            # (scratch pages) — row-scatter handles those (tiny batches)
            if page_size > 0 and mode == ForwardMode.EXTEND
            else {}
        ),
    )
