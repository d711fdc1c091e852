"""Reference (pure jnp) paged attention — the correctness oracle.

Role parity with reference `layers/attention/torch_native_backend.py:286`
(the SDPA oracle every optimized backend is validated against). Gathers KV
pages densely per sequence; O(B * max_ctx) memory, intended for tests,
CPU execution, and validating the Pallas backend — not the serving hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sglang_tpu.layers.attention.base import AttentionBackend
from sglang_tpu.model_executor.forward_batch_info import ForwardBatch

_NEG = -1e30


def _pool_kvh(pages) -> int:
    """KV head count from the pool: axis 1 is 2*kvh, except int4 pools
    where K/V nibble-pair into kvh rows."""
    vals = pages[0] if isinstance(pages, tuple) else pages
    if isinstance(pages, tuple) and vals.dtype == jnp.uint8:
        return vals.shape[1]
    return vals.shape[1] // 2


def _gather_kv(pages, page_table: jax.Array):
    """pages [P, 2kvh, ps, d] (head-major) or (values, scales) int8 tuple,
    page_table [B, Pmax] -> k, v: [B, K, kvh, d]."""
    scales = None
    if isinstance(pages, tuple):
        pages, scales = pages
    b, pmax = page_table.shape
    _, two_kvh, ps, d = pages.shape
    kv = pages[page_table]  # [B, Pmax, H, ps, d]
    if scales is not None:
        if pages.dtype == jnp.uint8:
            # int4: a byte row nibble-pairs head h's K (low) and V
            # (high); rebuild the [.., 2kvh, ps, d] layout
            from sglang_tpu.layers.attention.base import unpack_int4

            k4, v4 = unpack_int4(kv)
            kv = jnp.concatenate([k4, v4], axis=2)
            two_kvh = kv.shape[2]
        # per-page scale plane [P, rows, 128]: one row per (K then V)
        # head, token offsets on lanes 0..ps-1, rows padded to 8
        sc = scales[page_table][:, :, :two_kvh, :ps]  # [B, Pmax, 2kvh, ps]
        kv = kv.astype(jnp.float32) * sc[..., None]
    kv = jnp.transpose(kv, (0, 1, 3, 2, 4)).reshape(b, pmax * ps, two_kvh, d)
    kvh = two_kvh // 2
    k = kv[:, :, :kvh, :]
    v = kv[:, :, kvh:, :]
    return k, v


def _masked_attention(qg, k, v, mask, sm_scale, logit_cap, sinks=None):
    """qg [.., kvh, qpk, d]; k/v [.., K, kvh, d]; mask broadcastable to
    logits. `sinks` [kvh, qpk]: per-q-head softmax slot joining the
    denominator only (gpt-oss)."""
    logits = (
        jnp.einsum(
            "...hgd,...khd->...hgk",
            qg.astype(jnp.float32),
            k.astype(jnp.float32),
        )
        * sm_scale
    )
    if logit_cap > 0:
        logits = logit_cap * jnp.tanh(logits / logit_cap)
    logits = jnp.where(mask, logits, _NEG)
    if sinks is not None:
        m = jnp.maximum(
            jnp.max(logits, axis=-1, keepdims=True), sinks[..., None]
        )
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True) + jnp.exp(
            sinks[..., None] - m
        )
        probs = p / denom
    else:
        probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("...hgk,...khd->...hgd", probs, v.astype(jnp.float32))


class ReferenceAttentionBackend(AttentionBackend):
    def forward_decode(
        self, q, pages, fb: ForwardBatch, sm_scale, sliding_window=-1,
        logit_cap=0.0, sinks=None,
    ):
        b, qh, d = q.shape
        kvh = _pool_kvh(pages)
        qpk = qh // kvh
        k, v = _gather_kv(pages, fb.page_table)  # [B, K, kvh, d]
        kmax = k.shape[1]
        kv_idx = jnp.arange(kmax, dtype=jnp.int32)[None, :]
        mask = kv_idx < fb.seq_lens[:, None]  # [B, K]
        if sliding_window > 0:
            mask &= kv_idx >= (fb.seq_lens[:, None] - sliding_window)
        qg = q.reshape(b, kvh, qpk, d)
        out = _masked_attention(
            qg, k, v, mask[:, None, None, :], sm_scale, logit_cap,
            sinks=None if sinks is None else sinks.reshape(kvh, qpk),
        )
        return out.reshape(b, qh, d).astype(q.dtype)

    def forward_decode_state(
        self, q, pages, fb: ForwardBatch, sm_scale, sliding_window=-1,
        logit_cap=0.0,
    ):
        """Decode partial with softmax state (out, m, l) — the oracle side
        of the chain-tail merge (`ops/chain_tail.py merge_states`)."""
        b, qh, d = q.shape
        kvh = _pool_kvh(pages)
        qpk = qh // kvh
        k, v = _gather_kv(pages, fb.page_table)  # [B, K, kvh, d]
        kmax = k.shape[1]
        kv_idx = jnp.arange(kmax, dtype=jnp.int32)[None, :]
        mask = kv_idx < fb.seq_lens[:, None]  # [B, K]
        if sliding_window > 0:
            mask &= kv_idx >= (fb.seq_lens[:, None] - sliding_window)
        qg = q.reshape(b, kvh, qpk, d)
        logits = (
            jnp.einsum(
                "bhgd,bkhd->bhgk",
                qg.astype(jnp.float32),
                k.astype(jnp.float32),
            )
            * sm_scale
        )
        if logit_cap > 0:
            logits = logit_cap * jnp.tanh(logits / logit_cap)
        logits = jnp.where(mask[:, None, None, :], logits, _NEG)
        m = jnp.max(logits, axis=-1)  # [B, kvh, qpk]
        p = jnp.exp(logits - m[..., None])
        # masked lanes contribute exp(_NEG - m); zero them exactly so empty
        # rows report l == 0 (the merge treats that as an absent partial)
        p = jnp.where(mask[:, None, None, :], p, 0.0)
        l = jnp.sum(p, axis=-1)
        acc = jnp.einsum("bhgk,bkhd->bhgd", p, v.astype(jnp.float32))
        out = acc / jnp.maximum(l, 1e-10)[..., None]
        return (
            out.reshape(b, qh, d).astype(q.dtype),
            m.reshape(b, qh),
            l.reshape(b, qh),
        )

    def forward_extend(
        self, q, pages, fb: ForwardBatch, sm_scale, sliding_window=-1,
        logit_cap=0.0, sinks=None,
    ):
        t, qh, d = q.shape
        kvh = _pool_kvh(pages)
        qpk = qh // kvh
        k, v = _gather_kv(pages, fb.page_table)  # [B, K, kvh, d]
        k = k[fb.token_to_seq]  # [T, K, kvh, d]
        v = v[fb.token_to_seq]
        kmax = k.shape[1]
        kv_idx = jnp.arange(kmax, dtype=jnp.int32)[None, :]
        # causal: token at absolute position p attends to kv slots <= p.
        # dLLM block diffusion overrides the mask position (bidirectional
        # within the active block) while rope keeps true positions.
        mask_pos = (
            fb.mask_positions if fb.mask_positions is not None else fb.positions
        )
        mask = kv_idx <= mask_pos[:, None]  # [T, K]
        if sliding_window > 0:
            mask &= kv_idx > (fb.positions[:, None] - sliding_window)
        qg = q.reshape(t, kvh, qpk, d)
        out = _masked_attention(
            qg, k, v, mask[:, None, None, :], sm_scale, logit_cap,
            sinks=None if sinks is None else sinks.reshape(kvh, qpk),
        )
        return out.reshape(t, qh, d).astype(q.dtype)
