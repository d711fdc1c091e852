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


def apply_logit_bias(logits: jax.Array, bias: jax.Array) -> jax.Array:
    return logits + bias


def sample(
    logits: jax.Array,  # [B, V] f32
    info: SamplingBatchInfo,
    rng_key: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (next_token_ids [B] i32, token_logprobs [B] f32)."""
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
