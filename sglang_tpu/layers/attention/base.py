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


def pack_int4(qk: jax.Array, qv: jax.Array) -> jax.Array:
    """Nibble values in [-7, 7] -> packed uint8: the byte at (token,
    head h, dim j) holds K head h's dim j in the LOW nibble and V head
    h's dim j in the HIGH nibble. Both planes keep the full 128-lane
    head_dim (Mosaic rejects 64-lane HBM slices), and the kernels unpack
    K and V from the SAME bytes with no concat or interleave."""
    lo = qk.astype(jnp.int32) & 15
    hi = qv.astype(jnp.int32) & 15
    return (lo | (hi << 4)).astype(jnp.uint8)


def unpack_int4(b: jax.Array):
    """Packed uint8 -> (k, v) f32 values, same shape as `b` each
    (inverse of `pack_int4`; XLA paths — the Pallas kernels carry their
    own arithmetic unpack)."""
    bi = b.astype(jnp.int32)
    lo = bi & 15
    hi = (bi >> 4) & 15

    def se(n):  # sign-extend 0..15 -> -8..7
        return (n - 16 * (n >> 3)).astype(jnp.float32)

    return se(lo), se(hi)


def quantize_kv_rows(kv: jax.Array, int4: bool):
    """Symmetric per-(token, head) quantization of [T, 2kvh, d] rows
    (K heads first). Returns (stored values, scales [T, 2kvh] f32);
    int4 stores [T, kvh, d] uint8 (K/V nibble-paired), int8 stores
    [T, 2kvh, d] int8."""
    kvf = kv.astype(jnp.float32)
    qmax = 7.0 if int4 else 127.0
    s = jnp.maximum(jnp.max(jnp.abs(kvf), axis=-1), 1e-8) / qmax
    q = jnp.clip(jnp.round(kvf / s[..., None]), -qmax, qmax)
    if int4:
        kvh = kv.shape[1] // 2
        return pack_int4(q[:, :kvh], q[:, kvh:]), s
    return q.astype(jnp.int8), s


def write_kv_pages(
    pages: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    out_cache_loc: jax.Array,
    one_per_page: bool = False,
    write_jobs=None,
) -> jax.Array:
    """Scatter new K/V into the paged pool (in-place when `pages` is donated).

    pages: [num_pages, 2*kv_heads, page_size, head_dim] (head-major)
    k_new/v_new: [T, kv_heads, head_dim]; out_cache_loc: [T] flat slot ids.
    Reference analogue: `memory_pool.py set_kv_buffer`.

    `one_per_page=True` (decode steps: each batch row appends one token to
    its own tail page; padding rows park on the reserved garbage page 0)
    switches to the Pallas RMW write kernel — XLA's row scatter runs at
    ~4.7 GB/s inside the fused decode step on v5e (165 us/layer at bs=128,
    profiled), which made the KV write cost more than the attention.
    """
    import os

    if os.environ.get("SGLANG_TPU_SKIP_KV_WRITE") == "1":  # ablation only
        return pages
    if (
        one_per_page
        and jax.default_backend() == "tpu"
        and os.environ.get("SGLANG_TPU_KV_WRITE") != "xla"
    ):
        vals = pages[0] if isinstance(pages, tuple) else pages
        ps_ok = vals.shape[2] <= 128 and 128 % vals.shape[2] == 0
        # hardware lane tiling needs a 128-multiple head dim; smaller
        # geometries (tiny draft/test models) fall back to the XLA scatter
        # (Mosaic: "unsupported shape cast" at d=64 on v5e)
        ps_ok = ps_ok and vals.shape[3] % 128 == 0
        if ps_ok and vals.dtype in (
            jnp.uint8, jnp.int8, jnp.bfloat16, jnp.float32
        ):
            from sglang_tpu.ops.kv_write import paged_kv_write

            kv = jnp.concatenate([k_new, v_new], axis=1)
            return paged_kv_write(pages, kv, out_cache_loc)
    if write_jobs is not None and write_jobs[0] is not None:
        return _write_kv_jobs(pages, k_new, v_new, *write_jobs)
    scales = None
    if isinstance(pages, tuple):  # int8/int4 KV: (values, scales)
        pages, scales = pages
    # heads_dim is 2*kvh, except int4 where K/V nibble-pair into kvh rows
    num_pages, heads_dim, page_size, d = pages.shape
    t, kvh, _ = k_new.shape
    kv = jnp.concatenate([k_new, v_new], axis=1)  # [T, 2kvh, d], K block first
    page = out_cache_loc // page_size
    off = out_cache_loc % page_size
    # flat-row scatter: row index of (token, head) in the [P*H*ps, d]
    # view. The 2D formulation keeps XLA on the default layout — a
    # mixed slice/gather scatter (pages.at[page, :, off]) made XLA pick a
    # {3,1,2,0} layout for the pool, breaking donation aliasing (full KV
    # copy per step -> OOM).
    h = jnp.arange(heads_dim, dtype=out_cache_loc.dtype)
    rows = (page[:, None] * heads_dim + h[None, :]) * page_size + off[:, None]
    if scales is not None:
        # symmetric per-(token, head) int8/int4: scale = max|x| / qmax
        q, s = quantize_kv_rows(kv, int4=pages.dtype == jnp.uint8)
        flat = pages.reshape(num_pages * heads_dim * page_size, d)
        flat = flat.at[rows.reshape(-1)].set(q.reshape(t * heads_dim, d))
        # scales live as a per-page plane [P, rows, 128] f32 — one row per
        # (K then V) head, token offsets on lanes 0..ps-1
        sh = jnp.arange(s.shape[1], dtype=out_cache_loc.dtype)
        blob = scales.shape[1] * scales.shape[2]
        srow = page[:, None] * blob + sh[None, :] * 128 + off[:, None]
        sflat = scales.reshape(num_pages * blob)
        sflat = sflat.at[srow.reshape(-1)].set(s.reshape(t * s.shape[1]))
        return (flat.reshape(pages.shape), sflat.reshape(scales.shape))
    flat = pages.reshape(num_pages * heads_dim * page_size, d)
    flat = flat.at[rows.reshape(-1)].set(
        kv.reshape(t * heads_dim, d).astype(pages.dtype)
    )
    return flat.reshape(pages.shape)


def _write_kv_jobs(pages, k_new, v_new, wr_pages, wr_src):
    """Extend KV write as gather -> merge -> whole-page scatter.

    XLA's scatter cost is per-ROW: scattering J whole pages (J ~ tokens/ps)
    instead of T*2kvh token rows is ~800x fewer rows (153 ms -> ~3 ms per
    4096-token prefill round on v5e). wr_src[j, off] names the kv row that
    lands at offset `off` of page wr_pages[j] (-1 keeps the old value);
    padding jobs point at garbage page 0 with all -1 (their gathered page
    rewrites unchanged, so duplicate page-0 scatter rows carry identical
    values).
    """
    scales = None
    if isinstance(pages, tuple):
        pages, scales = pages
    ps = pages.shape[2]
    kvh2 = pages.shape[1]
    kv = jnp.concatenate([k_new, v_new], axis=1)  # [T, 2kvh, d]
    sel = wr_src >= 0  # [J, ps]
    src = jnp.maximum(wr_src, 0)
    if scales is not None:
        q, s = quantize_kv_rows(kv, int4=pages.dtype == jnp.uint8)
    else:
        s = None
        q = kv.astype(pages.dtype)
    newb = jnp.swapaxes(q[src], 1, 2)  # [J, 2kvh, ps, d]
    old = pages[wr_pages]
    merged = jnp.where(sel[:, None, :, None], newb, old)
    pages = pages.at[wr_pages].set(merged)
    if scales is None:
        return pages
    rows = scales.shape[1]
    s_g = jnp.swapaxes(s[src], 1, 2)  # [J, 2kvh, ps]
    sh = s_g.shape[1]  # scale heads = 2kvh even when values nibble-pair
    s_full = jnp.pad(s_g, ((0, 0), (0, rows - sh), (0, 128 - ps)))
    sel_full = jnp.pad(
        jnp.broadcast_to(sel[:, None, :], (sel.shape[0], sh, ps)),
        ((0, 0), (0, rows - sh), (0, 128 - ps)),
    )
    old_s = scales[wr_pages]
    merged_s = jnp.where(sel_full, s_full, old_s)
    return pages, scales.at[wr_pages].set(merged_s)


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

    def forward_decode_state(
        self, q, pages, fb: ForwardBatch, sm_scale, sliding_window=-1,
        logit_cap=0.0,
    ):
        """Decode attention over the pool WITHOUT sinks, also returning
        the softmax state: (out [B,qh,d], m [B,qh] f32, l [B,qh] f32) for
        partial-attention merging (chain-tail decode)."""
        raise NotImplementedError

    def _forward_chain_tail(self, q, k_new, v_new, kv, fb, sm_scale, **kw):
        """Chain-tail decode step (ops/chain_tail.py): append the new KV
        row to the chain's tail buffer instead of page-RMW'ing the pool,
        attend = pool partial (fixed pre-chain context) merged with a
        dense partial over the tail rows written so far."""
        import dataclasses

        from sglang_tpu.ops.chain_tail import (
            ChainTailKV,
            merge_states,
            quantize_rows,
            tail_attention_state,
        )

        import os as _os

        ablate = _os.environ.get("SGLANG_TAIL_ABLATE", "")
        pool = kv.pool
        vals = pool[0] if isinstance(pool, tuple) else pool
        step = kv.step
        rows, srow = quantize_rows(k_new, v_new, vals.dtype)
        # pool part: context BEFORE the chain (fixed across all K steps)
        pool_lens = jnp.maximum(fb.seq_lens - (step + 1), 0)
        fb_pool = dataclasses.replace(fb, seq_lens=pool_lens)
        sinks = kw.pop("sinks", None)
        kw.pop("sliding_window", None)  # tail path requires full attention
        if "poolstate" in ablate:  # timing only: plain kernel, no state
            out = self.forward_decode(q, pool, fb_pool, sm_scale, **kw)
            return out, ChainTailKV(
                pool=pool, vals=rows, scales=srow, step=step
            )
        out_p, m_p, l_p = self.forward_decode_state(
            q, pool, fb_pool, sm_scale, **kw
        )
        ctx = fb.page_table.shape[1] * vals.shape[2]
        if "tailattn" in ablate:  # timing only: skip tail + merge
            return out_p, ChainTailKV(
                pool=pool, vals=rows, scales=srow, step=step
            )
        acc_t, m_t, l_t = tail_attention_state(
            q, kv.vals, kv.scales, rows, srow, step, fb.seq_lens, ctx,
            sm_scale, logit_cap=kw.get("logit_cap", 0.0),
        )
        out = merge_states(
            out_p, m_p, l_p, acc_t, m_t, l_t,
            sinks=None if sinks is None else sinks.astype(jnp.float32),
            out_dtype=q.dtype,
        )
        # output carries just the NEW row; the layer scan stacks them and
        # the chain scan appends to the tail once per step
        return out, ChainTailKV(pool=pool, vals=rows, scales=srow, step=step)

    def __call__(self, q, k_new, v_new, pages, fb, sm_scale, **kw):
        """Write new KV then attend. Returns (out, updated_pages)."""
        from sglang_tpu.ops.chain_tail import ChainTailKV

        if isinstance(pages, ChainTailKV):
            return self._forward_chain_tail(
                q, k_new, v_new, pages, fb, sm_scale, **kw
            )
        pages = write_kv_pages(
            pages, k_new, v_new, fb.out_cache_loc,
            one_per_page=fb.mode.is_decode(),
            write_jobs=(fb.wr_pages, fb.wr_src),
        )
        if fb.mode.is_decode():
            out = self.forward_decode(q, pages, fb, sm_scale, **kw)
        else:
            out = self.forward_extend(q, pages, fb, sm_scale, **kw)
        return out, pages
