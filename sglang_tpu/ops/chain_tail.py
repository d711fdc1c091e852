"""Chain-tail KV batching for fused multi-step decode.

Problem (measured, docs/PERFORMANCE.md round 4): each decode step's KV
write is a page READ-MODIFY-WRITE (packed int8/bf16 tilings make
single-sublane HBM writes illegal on Mosaic), so every token rewrites its
whole ~131 KB page — ~1.1 GB/step of page-RMW traffic at bs=128, ~2.0 of
~20.8 ms/step, the second-largest device cost after the weight reads.

Fix: inside one K-step fused decode chain the K new tokens of a row land
in (at most) two consecutive pages. So:

- per step, the new (already-quantized) K/V row is APPENDED to a small
  contiguous tail buffer `[L, bs, K, 2kvh, d]` (plus a `[L, bs, K, 2kvh]`
  f32 scale buffer for int8 KV) — a dynamic-slice update, no page RMW;
- attention = pool part (the Pallas decode kernel over the FIXED pre-chain
  context, emitting softmax state) merged with a tiny dense attention over
  the tail rows written so far — the classic attention-state merge
  (reference `sgl-kernel/csrc/attention/merge_attn_states.cu` role);
- after the K-step scan, the tail FLUSHES into the paged pool with ONE
  page RMW per touched page per row (1-2 pages instead of K) — a ~K-fold
  reduction of the page-RMW traffic.

Numerical contract: the quantization formula and the attention arithmetic
(bf16 MXU dots with f32 accumulation, scales folded outside the dot)
match `layers/attention/base.py write_kv_pages` and
`ops/paged_decode_attention.py` exactly; only the softmax partial-merge
order differs (same online-softmax algebra the pool kernel itself uses
across chunks).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@jax.tree_util.register_dataclass
@dataclass
class ChainTailKV:
    """Per-layer KV view inside a chain step. On INPUT to the attention
    backend: the (unmodified) paged pool, this layer's READ-ONLY
    head-major tail slice `[bs, 2kvh, K, d]` (steps < `step` populated),
    and the step index. On OUTPUT: `vals`/`scales` carry just the NEW row
    `[bs, 2kvh, d]` — the layer scan stacks them and the chain scan
    appends them to the tail at `step` (one update per step; a per-layer
    tail carry measured +2.7 ms/step of XLA copies)."""

    pool: object  # [P, 2kvh, ps, d] or (values, scales_plane) int8 tuple
    vals: jax.Array  # in: [bs, 2kvh, K, d]; out: [bs, 2kvh, d]
    scales: Optional[jax.Array]  # in: [bs, 2kvh, K] f32; out: [bs, 2kvh]
    step: jax.Array  # [] i32 chain step (0-based)


def quantize_rows(
    k_new: jax.Array, v_new: jax.Array, pool_dtype
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """New K/V rows -> pool storage format. Identical math to
    `write_kv_pages` (per-(token, head) symmetric int8, scale=max|x|/127)."""
    kv = jnp.concatenate([k_new, v_new], axis=1)  # [bs, 2kvh, d]
    if pool_dtype == jnp.int8:
        kvf = kv.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(kvf), axis=-1), 1e-8) / 127.0
        q = jnp.clip(jnp.round(kvf / s[..., None]), -127, 127).astype(
            jnp.int8
        )
        return q, s
    return kv.astype(pool_dtype), None


def tail_attention_state(
    q: jax.Array,  # [bs, qh, d]
    vals: jax.Array,  # [bs, 2kvh, K, d] tail slice (steps < step populated)
    scales: Optional[jax.Array],  # [bs, 2kvh, K] f32
    cur_vals: jax.Array,  # [bs, 2kvh, d] THIS step's quantized row
    cur_scales: Optional[jax.Array],  # [bs, 2kvh] f32
    step: jax.Array,  # [] i32
    seq_lens: jax.Array,  # [bs] TOTAL kv len incl. this step (0 = padding)
    ctx: int,
    sm_scale: float,
    logit_cap: float = 0.0,
):
    """Dense attention over the chain's tail rows: earlier steps
    (j < step) from the head-major tail buffer, plus the current token's
    own K/V folded in as one extra score lane. The `[bs, 2kvh, K, d]`
    layout makes BOTH einsums batch on (b, h) with d contracted — no
    relayouts (the step-major layout measured 4.4 ms/step of XLA
    transpose/concat traffic at bs=128, eating the entire KV-write win).
    Returns (acc [bs, qh, d] f32 UN-normalized, m [bs, qh], l [bs, qh]).
    Arithmetic mirrors the pool kernel: bf16 x bf16 dots with f32
    accumulation, per-(token, head) scales folded in f32 outside the dot,
    probabilities cast to bf16 before the value matmul."""
    bs, qh, d = q.shape
    K = vals.shape[2]
    kvh = vals.shape[1] // 2
    g = qh // kvh
    qg = q.reshape(bs, kvh, g, d)
    k_t = vals[:, :kvh].astype(q.dtype)  # [bs, kvh, K, d]
    v_t = vals[:, kvh:].astype(q.dtype)
    s = jnp.einsum(
        "bhgd,bhkd->bhgk", qg, k_t, preferred_element_type=jnp.float32
    )  # [bs, kvh, g, K]
    if scales is not None:
        s = s * scales[:, :kvh, None, :]  # [bs, kvh, 1, K]
    # current token's own K/V: one extra lane, computed closed-form
    k_cur = cur_vals[:, :kvh].astype(q.dtype)  # [bs, kvh, d]
    s_self = jnp.einsum(
        "bhgd,bhd->bhg", qg, k_cur, preferred_element_type=jnp.float32
    )
    if cur_scales is not None:
        s_self = s_self * cur_scales[:, :kvh, None]
    s = jnp.concatenate([s, s_self[..., None]], axis=-1) * sm_scale
    if logit_cap > 0:
        s = logit_cap * jnp.tanh(s / logit_cap)
    j = jnp.arange(K + 1, dtype=jnp.int32)
    # tail row j holds the token at absolute position (seq-1-step)+j;
    # valid when already written this chain (j < step), or the current
    # token itself (lane K); context-capped like the pool write path
    first = seq_lens - 1 - step  # [bs]
    valid_row = seq_lens[:, None] > 0
    mask = (
        ((j[None, :] < step) | (j[None, :] == K))
        & valid_row
        & ((first[:, None] + jnp.minimum(j, step)[None, :]) < ctx)
    )  # [bs, K+1]
    s = jnp.where(mask[:, None, None, :], s, NEG_INF)
    m = jnp.max(s, axis=-1)  # [bs, kvh, g]
    p = jnp.exp(s - m[..., None])
    p = jnp.where(mask[:, None, None, :], p, 0.0)
    l = jnp.sum(p, axis=-1)
    if scales is not None:
        pv = p[..., :K] * scales[:, kvh:, None, :]
        pv_self = p[..., K] * cur_scales[:, kvh:, None]
    else:
        pv = p[..., :K]
        pv_self = p[..., K]
    acc = jnp.einsum(
        "bhgk,bhkd->bhgd",
        pv.astype(q.dtype),
        v_t,
        preferred_element_type=jnp.float32,
    )
    # self value contribution: per-element bf16 product, f32 accumulate
    # (matches the MXU's per-lane product of the fused kernel)
    acc = acc + (
        pv_self.astype(q.dtype).astype(jnp.float32)[..., None]
        * cur_vals[:, kvh:].astype(q.dtype).astype(jnp.float32)[
            :, :, None, :
        ]
    )
    return (
        acc.reshape(bs, qh, d),
        m.reshape(bs, qh),
        l.reshape(bs, qh),
    )


def merge_states(
    out_p: jax.Array,  # [bs, qh, d] pool partial, NORMALIZED (acc_p / l_p)
    m_p: jax.Array,  # [bs, qh]
    l_p: jax.Array,  # [bs, qh]
    acc_t: jax.Array,  # [bs, qh, d] tail partial, UN-normalized (f32)
    m_t: jax.Array,
    l_t: jax.Array,
    sinks: Optional[jax.Array] = None,  # [qh]
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Online-softmax merge of two attention partials (+ optional sink
    slot joining the denominator once). NEG_INF is a finite sentinel so
    empty partials merge as exp(0)*0 = 0 instead of NaN."""
    m = jnp.maximum(m_p, m_t)
    if sinks is not None:
        m = jnp.maximum(m, sinks[None, :])
    a_p = jnp.exp(m_p - m) * l_p
    a_t = jnp.exp(m_t - m)
    denom = a_p + a_t * l_t
    if sinks is not None:
        denom = denom + jnp.exp(sinks[None, :] - m)
    num = (
        out_p.astype(jnp.float32) * a_p[..., None]
        + acc_t * a_t[..., None]
    )
    return (num / jnp.maximum(denom, 1e-10)[..., None]).astype(out_dtype)


def build_tail_flush_jobs(
    base: jax.Array,  # [bs] kv len after the chain's FIRST step (0 = pad)
    page_table: jax.Array,  # [bs, pmax]
    k_steps: int,
    ps: int,
    ctx: int,
):
    """Device-side analogue of `build_write_jobs` for a chain's tail: the
    K tokens of row r occupy offsets [first, first+K) (first = base-1),
    touching pages p0 and possibly p0+1. Returns
    (wr_pages [2*bs] i32, wr_src [2*bs, ps] i32) where wr_src[j, off]
    names the flattened tail row (r*K + step) landing at offset `off` of
    page wr_pages[j] (-1 keeps the old value; dead jobs park on garbage
    page 0 with all -1)."""
    bs, pmax = page_table.shape
    valid = base > 0
    first = jnp.where(valid, base - 1, 0)
    p0 = first // ps
    off0 = first % ps
    rows = jnp.arange(bs, dtype=jnp.int32)
    off = jnp.arange(ps, dtype=jnp.int32)[None, :]  # [1, ps]

    def job(page_idx, tok0):
        # tok0: chain-step index of the token at offset 0 of this page
        pi = jnp.clip(page_idx, 0, pmax - 1)
        step = off - tok0[:, None]  # [bs, ps] chain step at each offset
        pos = first[:, None] + step  # absolute token position
        ok = (
            (step >= 0)
            & (step < k_steps)
            & (pos < ctx)
            & valid[:, None]
            & (page_idx[:, None] < pmax)
        )
        # tail layout is step-major [K, bs, ...]: flat row = step*bs + r
        src = jnp.where(ok, step * bs + rows[:, None], -1)
        page = jnp.where(
            ok.any(axis=1), page_table[rows, pi], 0
        ).astype(jnp.int32)
        return page, src.astype(jnp.int32)

    # token at offset `off` of page p0 is chain step (off - off0)
    pg_a, src_a = job(p0, off0)
    # page p0+1 starts at chain step (ps - off0)
    pg_b, src_b = job(p0 + 1, off0 - ps)
    wr_pages = jnp.concatenate([pg_a, pg_b])  # [2*bs]
    wr_src = jnp.concatenate([src_a, src_b], axis=0)  # [2*bs, ps]
    return wr_pages, wr_src


def flush_tail(
    kv_layers,  # fused pool [L*P, 2kvh, ps, d] or (values, scales_plane)
    tail_vals: jax.Array,  # [L, bs, 2kvh, K, d] (head-major)
    tail_scales: Optional[jax.Array],  # [L, bs, 2kvh, K] f32
    wr_pages: jax.Array,  # [J] per-layer page ids (layer 0 space)
    wr_src: jax.Array,  # [J, ps] flat tail row = step*bs + r (-1 = keep)
    num_pages: int,  # pages PER LAYER in the fused pool
):
    """Scatter the chain tail into the paged pool: per layer, gather the
    J touched pages, merge the tail rows at their offsets, write the pages
    back (the pre-quantized twin of `_write_kv_jobs`). Runs as a scan over
    layers to cap the gather scratch at J pages."""
    pool, plane = (
        kv_layers if isinstance(kv_layers, tuple) else (kv_layers, None)
    )
    L, bs, kvh2, K, d = tail_vals.shape
    ps = pool.shape[2]
    sel = wr_src >= 0  # [J, ps]
    src = jnp.maximum(wr_src, 0)
    idx = jnp.arange(L, dtype=jnp.int32)
    xs = (
        (idx, tail_vals, tail_scales)
        if tail_scales is not None
        else (idx, tail_vals)
    )

    def body(carry, xs):
        pool, plane = carry
        if tail_scales is not None:
            i, tv, ts = xs
        else:
            i, tv = xs
            ts = None
        pg = wr_pages + i * num_pages  # garbage page 0 -> layer i's page 0
        # [bs, kvh2, K, d] -> step-major flat rows (step*bs + r)
        flat = jnp.transpose(tv, (2, 0, 1, 3)).reshape(K * bs, kvh2, d)
        newb = jnp.swapaxes(flat[src], 1, 2)
        old = pool[pg]
        merged = jnp.where(sel[:, None, :, None], newb, old)
        pool = pool.at[pg].set(merged)
        if plane is not None:
            rows = plane.shape[1]
            sf = jnp.transpose(ts, (2, 0, 1)).reshape(K * bs, kvh2)
            s_g = jnp.swapaxes(sf[src], 1, 2)
            s_full = jnp.pad(
                s_g, ((0, 0), (0, rows - kvh2), (0, 128 - ps))
            )
            sel_full = jnp.pad(
                jnp.broadcast_to(
                    sel[:, None, :], (sel.shape[0], kvh2, ps)
                ),
                ((0, 0), (0, rows - kvh2), (0, 128 - ps)),
            )
            old_s = plane[pg]
            merged_s = jnp.where(sel_full, s_full, old_s)
            plane = plane.at[pg].set(merged_s)
        return (pool, plane), None

    (pool, plane), _ = jax.lax.scan(body, (pool, plane), xs)
    if isinstance(kv_layers, tuple):
        return (pool, plane)
    return pool
