"""Attention backend interface + shared KV page write.

Parity with reference `layers/attention/base_attn_backend.py:18
AttentionBackend` (init_forward_metadata / forward_extend / forward_decode).
TPU design: a backend is a pure function family used inside the jitted model
step; there is no CUDA-graph capture hook because bucketed `jax.jit` *is*
the graph capture.

KV page layout (all backends): `[num_pages, 2 * kv_heads, page_size, head_dim]`
(HEAD-major) with K heads first (indices 0..kvh-1) and V heads second
(kvh..2kvh-1) — one contiguous page holds K and V for all heads so a single
DMA streams both, and each head's K/V is a contiguous (page_size, head_dim)
plane: Pallas kernels slice heads on the free outer dim of their VMEM
scratch (token-major layout forced a sublane-gather relayout per head per
KV chunk, 2.3-2.8x slower decode attention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sglang_tpu.model_executor.forward_batch_info import ForwardBatch


def write_kv_pages(
    pages: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    out_cache_loc: jax.Array,
) -> jax.Array:
    """Scatter new K/V into the paged pool (in-place when `pages` is donated).

    pages: [num_pages, 2*kv_heads, page_size, head_dim] (head-major)
    k_new/v_new: [T, kv_heads, head_dim]; out_cache_loc: [T] flat slot ids.
    Reference analogue: `memory_pool.py set_kv_buffer`.
    """
    import os

    if os.environ.get("SGLANG_TPU_SKIP_KV_WRITE") == "1":  # ablation only
        return pages
    scales = None
    if isinstance(pages, tuple):  # int8 KV: (values, per-token-head scales)
        pages, scales = pages
    num_pages, two_kvh, page_size, d = pages.shape
    t, kvh, _ = k_new.shape
    kv = jnp.concatenate([k_new, v_new], axis=1)  # [T, 2kvh, d], K block first
    page = out_cache_loc // page_size
    off = out_cache_loc % page_size
    # flat-row scatter: row index of (token, head) in the [P*2kvh*ps, d]
    # view. The 2D formulation keeps XLA on the default layout — a
    # mixed slice/gather scatter (pages.at[page, :, off]) made XLA pick a
    # {3,1,2,0} layout for the pool, breaking donation aliasing (full KV
    # copy per step -> OOM).
    h = jnp.arange(two_kvh, dtype=out_cache_loc.dtype)
    rows = (page[:, None] * two_kvh + h[None, :]) * page_size + off[:, None]
    if scales is not None:
        # symmetric per-(token, head) int8: scale = max|x| / 127
        kvf = kv.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(kvf), axis=-1), 1e-8) / 127.0
        q = jnp.clip(jnp.round(kvf / s[..., None]), -127, 127).astype(jnp.int8)
        flat = pages.reshape(num_pages * two_kvh * page_size, d)
        flat = flat.at[rows.reshape(-1)].set(q.reshape(t * two_kvh, d))
        # scales live as a per-page plane [P, S, 128] f32 (flat order:
        # head-major then token offset, padded to whole (8, 128) tiles)
        blob = scales.shape[1] * scales.shape[2]
        srow = page[:, None] * blob + h[None, :] * page_size + off[:, None]
        sflat = scales.reshape(num_pages * blob)
        sflat = sflat.at[srow.reshape(-1)].set(s.reshape(t * two_kvh))
        return (flat.reshape(pages.shape), sflat.reshape(scales.shape))
    flat = pages.reshape(num_pages * two_kvh * page_size, d)
    flat = flat.at[rows.reshape(-1)].set(
        kv.reshape(t * two_kvh, d).astype(pages.dtype)
    )
    return flat.reshape(pages.shape)


class AttentionBackend:
    """Stateless attention compute over the paged KV pool."""

    def forward_extend(
        self,
        q: jax.Array,  # [T, q_heads, head_dim] packed ragged tokens
        pages: jax.Array,  # [num_pages, page_size, 2*kv_heads, head_dim]
        fb: ForwardBatch,
        sm_scale: float,
        sliding_window: int = -1,
        logit_cap: float = 0.0,
    ) -> jax.Array:  # [T, q_heads, head_dim]
        raise NotImplementedError

    def forward_decode(
        self,
        q: jax.Array,  # [B, q_heads, head_dim]
        pages: jax.Array,
        fb: ForwardBatch,
        sm_scale: float,
        sliding_window: int = -1,
        logit_cap: float = 0.0,
    ) -> jax.Array:  # [B, q_heads, head_dim]
        raise NotImplementedError

    def __call__(self, q, k_new, v_new, pages, fb, sm_scale, **kw):
        """Write new KV then attend. Returns (out, updated_pages)."""
        pages = write_kv_pages(pages, k_new, v_new, fb.out_cache_loc)
        if fb.mode.is_decode():
            out = self.forward_decode(q, pages, fb, sm_scale, **kw)
        else:
            out = self.forward_extend(q, pages, fb, sm_scale, **kw)
        return out, pages
