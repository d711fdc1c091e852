"""dLLM — diffusion language model decoding (F8, reference `srt/dllm/`:
LLaDA-class block diffusion, `algorithm/low_confidence.py`).

Semi-autoregressive block diffusion: generation advances one BLOCK at a
time. Within a block, positions start as MASK tokens and iteratively
"denoise": each iteration runs the model over the block with
bidirectional intra-block attention (causal to the prefix), computes
per-position argmax + confidence, and commits positions whose confidence
clears the threshold (always at least the single most-confident one), so
a block finishes in <= block_size iterations. Committed blocks become
ordinary causal prefix for the next block — KV written in place.

Algorithms:
- "low_confidence": threshold on softmax(argmax) (reference default)
- "joint_threshold": threshold on the joint (product) confidence of the
  remaining masked positions, committing the largest high-confidence set
  (reference `algorithm/joint_threshold.py`)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from sglang_tpu.utils import cdiv, get_logger

logger = get_logger(__name__)


@dataclass
class DllmConfig:
    block_size: int = 32
    mask_id: int = 0
    threshold: float = 0.95
    algorithm: str = "low_confidence"  # | joint_threshold


def _softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def diffusion_generate(
    runner,
    allocator,
    prompt_ids: List[int],
    max_new_tokens: int,
    cfg: DllmConfig,
    eos_token_ids: Optional[set] = None,
) -> List[int]:
    """Block-diffusion decode of one sequence. Returns generated ids
    (truncated at the first EOS). Pages allocate from `allocator` and are
    freed before returning (no radix interaction — diffusion KV is
    rewritten across iterations, so prefix sharing is unsound mid-block)."""
    ps = allocator.page_size
    p_len = len(prompt_ids)
    total = p_len + cdiv(max_new_tokens, cfg.block_size) * cfg.block_size
    pages = allocator.alloc(cdiv(total, ps))
    if pages is None:
        raise RuntimeError("dLLM: KV pool exhausted")
    try:
        pt = np.zeros((1, runner.max_pages_per_req), dtype=np.int32)
        pt[0, : len(pages)] = pages

        def slot(p):
            return pages[p // ps] * ps + p % ps

        # causal prompt prefill (writes prefix KV)
        runner.forward_extend_hidden(
            np.asarray(prompt_ids, dtype=np.int32),
            np.arange(p_len, dtype=np.int32),
            np.asarray([slot(p) for p in range(p_len)], dtype=np.int32),
            pt,
            np.array([p_len], dtype=np.int32),
            np.array([p_len], dtype=np.int32),
        )
        out: List[int] = []
        eos = eos_token_ids or set()
        n_blocks = cdiv(max_new_tokens, cfg.block_size)
        for bi in range(n_blocks):
            start = p_len + bi * cfg.block_size
            end = start + cfg.block_size
            block = np.full(cfg.block_size, cfg.mask_id, dtype=np.int32)
            committed = np.zeros(cfg.block_size, dtype=bool)
            positions = np.arange(start, end, dtype=np.int32)
            mask_pos = np.full(cfg.block_size, end - 1, dtype=np.int32)
            loc = np.asarray([slot(p) for p in range(start, end)], np.int32)
            for _ in range(cfg.block_size):
                if committed.all():
                    break
                logits = runner.forward_dllm_block(
                    block, positions, mask_pos, loc, pt,
                    np.array([end], dtype=np.int32),
                    np.array([cfg.block_size], dtype=np.int32),
                )
                probs = _softmax(logits.astype(np.float64))
                guess = probs.argmax(-1).astype(np.int32)
                conf = probs[np.arange(cfg.block_size), guess]
                conf = np.where(committed, -np.inf, conf)
                if cfg.algorithm == "joint_threshold":
                    # commit the largest high-confidence prefix of the
                    # confidence-sorted candidates whose joint product
                    # clears the threshold (at least one)
                    order = np.argsort(-conf)
                    joint = np.cumprod(conf[order])
                    k = max(1, int((joint > cfg.threshold).sum()))
                    pick = order[:k]
                    take = np.zeros_like(committed)
                    take[pick] = True
                    take &= ~committed
                else:
                    take = conf > cfg.threshold
                    if not take.any():
                        take[int(np.argmax(conf))] = True
                block = np.where(take, guess, block)
                committed |= take
            # commit the block causally (rewrite KV with final tokens so
            # the next block's prefix attention is exact)
            runner.forward_extend_hidden(
                block, positions,
                loc, pt,
                np.array([end], dtype=np.int32),
                np.array([cfg.block_size], dtype=np.int32),
            )
            for tok in block.tolist():
                out.append(int(tok))
                if int(tok) in eos or len(out) >= max_new_tokens:
                    return out[: max_new_tokens]
        return out[:max_new_tokens]
    finally:
        allocator.free(pages)
