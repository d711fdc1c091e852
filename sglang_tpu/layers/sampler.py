"""On-device token sampling.

Parity with reference `srt/layers/sampler.py:57 Sampler` (penalties ->
grammar mask -> top-k/top-p/min-p sampling -> logprob capture) and the
flashinfer sampling kernels (sgl-kernel sampling ops).

TPU design: one descending sort of the logits row serves top-k, top-p and
min-p simultaneously (rank / cumulative-probability / max-probability masks
over the sorted order), then a Gumbel-max draw picks the token — no
rejection loops, fully static shapes, batch-invariant by construction.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sglang_tpu.sampling.sampling_batch_info import SamplingBatchInfo

NEG_INF = -1e30


def apply_vocab_mask(logits: jax.Array, vocab_mask: jax.Array) -> jax.Array:
    """Grammar bitmask application (reference sgl-kernel
    `apply_token_bitmask_inplace_cuda.cu`, §2 G4): mask=True keeps a token."""
    return jnp.where(vocab_mask, logits, NEG_INF)


def apply_packed_vocab_mask(logits: jax.Array, packed: jax.Array) -> jax.Array:
    """Unpack a big-endian bitmask [B, ceil(V/8)] uint8 on device and mask
    logits — 8x smaller host->HBM transfer than a bool [B, V]."""
    b, v = logits.shape
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # big-endian bit order
    bits = (packed[:, :, None] >> shifts[None, None, :]) & 1
    mask = bits.reshape(b, -1)[:, :v].astype(bool)
    return jnp.where(mask, logits, NEG_INF)


def apply_logit_bias(logits: jax.Array, bias: jax.Array) -> jax.Array:
    return logits + bias


def apply_penalties(
    logits: jax.Array,  # [B, V] f32
    counts: jax.Array,  # [S+1, V] i32 (slot-indexed token counts)
    info: SamplingBatchInfo,
) -> jax.Array:
    """Frequency / presence / repetition penalties (reference
    `sampling/penaltylib/orchestrator.py` + `layers/sampler.py:93`)."""
    cnt = counts[info.slot_ids].astype(jnp.float32)  # [B, V]
    seen = cnt > 0
    logits = logits - info.freq_pen[:, None] * cnt
    logits = logits - info.pres_pen[:, None] * seen.astype(jnp.float32)
    rep = info.rep_pen[:, None]
    scaled = jnp.where(logits > 0, logits / rep, logits * rep)
    return jnp.where(seen, scaled, logits)


def apply_sparse_bias(logits: jax.Array, info: SamplingBatchInfo) -> jax.Array:
    """Per-request logit_bias + min_new_tokens EOS blocking, applied from
    padded sparse (id, value) pairs (reference dense vocab-bias tensors,
    `sampling_batch_info.py apply_logits_bias:252`)."""
    b = logits.shape[0]
    rows = jnp.arange(b, dtype=jnp.int32)[:, None]
    logits = logits.at[rows, info.bias_ids].add(info.bias_vals)
    # blocked ids get -inf weight (pad entries have mask 0)
    logits = logits.at[rows, info.block_ids].add(info.block_mask * NEG_INF)
    return logits


def update_counts_extend(
    counts: jax.Array,  # [S+1, V]
    input_ids: jax.Array,  # [T]
    token_slot_ids: jax.Array,  # [T] slot per packed token (pad -> S)
    token_kind: jax.Array,  # [T] 0 pad / 1 prompt / 2 output
    slot_ids: jax.Array,  # [B]
    fresh_mask: jax.Array,  # [B]
) -> jax.Array:
    """Zero fresh slots, then scatter-add *output* tokens re-entering via
    extend (retraction re-prefill). Prompt tokens are not counted —
    freq/presence/repetition apply to generated text (vLLM/OpenAI
    semantics; the reference counts prompt only for repetition)."""
    keep = jnp.where(fresh_mask, 0, 1).astype(counts.dtype)
    counts = counts.at[slot_ids].multiply(keep[:, None])
    inc = (token_kind == 2).astype(counts.dtype)
    return counts.at[token_slot_ids, input_ids].add(inc)


def update_counts_sampled(
    counts: jax.Array,
    next_ids: jax.Array,  # [B]
    info: SamplingBatchInfo,
) -> jax.Array:
    return counts.at[info.slot_ids, next_ids].add(
        info.count_mask.astype(counts.dtype)
    )


def sample(
    logits: jax.Array,  # [B, V] f32
    info: SamplingBatchInfo,
    rng_key: jax.Array,
    counts: Optional[jax.Array] = None,
    custom_procs: tuple = (),
) -> Tuple[jax.Array, jax.Array]:
    """Returns (next_token_ids [B] i32, token_logprobs [B] f32).

    Order (reference `layers/sampler.py:57`): penalties -> custom logit
    processors -> logit bias / grammar mask -> temperature ->
    top-k/top-p/min-p -> draw."""
    if info.need_penalties and counts is not None:
        logits = apply_penalties(logits, counts, info)
    if info.need_custom and custom_procs:
        # per-row dispatch over registered jittable processors
        # (reference custom_logit_processor, `sampling_batch_info.py`):
        # fn(logits [B,V], params [B,P]) -> logits, applied to the rows
        # that selected it
        for i, fn in enumerate(custom_procs):
            sel = (info.proc_ids == i)[:, None]
            logits = jnp.where(sel, fn(logits, info.proc_params), logits)
    if info.need_bias:
        logits = apply_sparse_bias(logits, info)
    if info.need_grammar:
        logits = apply_packed_vocab_mask(logits, info.vocab_mask_packed)
    if info.is_all_greedy:
        next_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        tok_lp = jnp.take_along_axis(logprobs, next_ids[:, None], axis=-1)[:, 0]
        return next_ids, tok_lp

    b, v = logits.shape
    scaled = logits / jnp.maximum(info.temperature[:, None], 1e-6)
    # one descending sort serves top-k / top-p / min-p
    sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
    sorted_idx = jnp.argsort(scaled, axis=-1)[:, ::-1].astype(jnp.int32)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    ranks = jax.lax.broadcasted_iota(jnp.int32, (b, v), 1)
    keep = ranks < info.top_k[:, None]
    if info.need_top_p:
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with cumulative prob >= top_p (always
        # keep rank 0)
        keep &= (cum - probs) < info.top_p[:, None]
    if info.need_min_p:
        keep &= probs >= info.min_p[:, None] * probs[:, :1]
    keep = keep.at[:, 0].set(True)
    masked = jnp.where(keep, sorted_logits, NEG_INF)
    # Gumbel-max draw over the sorted/masked logits
    gumbel = jax.random.gumbel(rng_key, (b, v), dtype=jnp.float32)
    choice = jnp.argmax(masked + gumbel, axis=-1)
    next_ids = jnp.take_along_axis(sorted_idx, choice[:, None], axis=-1)[:, 0]
    # logprob of the chosen token under the (unmasked) temperature-scaled dist
    logprobs = jax.nn.log_softmax(scaled, axis=-1)
    tok_lp = jnp.take_along_axis(logprobs, next_ids[:, None], axis=-1)[:, 0]
    return next_ids, tok_lp


def top_logprobs(
    logits: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Top-k logprobs for logprob-returning requests: ([B,k] vals, [B,k] ids)."""
    lp = jax.nn.log_softmax(logits, axis=-1)
    vals, ids = jax.lax.top_k(lp, k)
    return vals, ids.astype(jnp.int32)
