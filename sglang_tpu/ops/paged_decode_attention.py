"""Decode-specialized paged attention (R rows per grid block).

The unified ragged kernel (`ragged_paged_attention.py`) maps ONE sequence
per grid block; in decode mode that means `batch` sequential blocks per
layer, and the fixed per-block cost (scratch init, q/out DMA latency,
Mosaic block dispatch) dominates the step: measured ~14-23 us/block, i.e.
~1.8 ms/layer at batch 128 — far above the HBM-bandwidth roofline of the
actual KV reads.

This kernel amortizes that cost across R=8 decode rows per block:
- Grid: (batch/R,). Each block DMAs its R q rows once, then streams each
  row's KV pages through a double-buffered VMEM window; the first chunk
  of row r+1 is prefetched while row r's last chunk computes, so the DMA
  pipeline never drains at row boundaries.
- Per row, per KV head: one [kvblk, d] x [g, d]^T score matmul and one
  [kvblk, d]^T x [kvblk, g] value matmul with online softmax in f32 —
  identical math to the unified kernel (shared oracle tests).
- FP8-stored KV upcasts right after the DMA (dequant rides the kernel).

Role parity: reference decode-attention kernels
(`layers/attention/triton_ops/decode_attention.py`, flashinfer decode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _pda_kernel(
    # scalar prefetch
    seq_lens_ref,  # [bb]
    page_table_ref,  # [bb, pmax]
    # inputs (HBM)
    q_hbm,  # [bb, qh, d]
    pages_hbm,  # [P, 2*kvh, ps, d] (head-major)
    sinks_vmem,  # [1, qh] f32, or None
    # output (HBM)
    out_hbm,  # [bb, qh, d]
    # scratch
    q_v,  # [R, qh, d]
    kv_v,  # [2, 2*kvh, kvblk, d] (head-major)
    o_v,  # [R, qh, d]
    q_sem,
    kv_sems,  # [2, pblk]
    o_sem,
    *,
    R: int,
    ps: int,
    pblk: int,
    kvh: int,
    g: int,
    d: int,
    sm_scale: float,
    logit_cap: float,
    window: int,
):
    b = pl.program_id(0)
    kvblk = pblk * ps
    row0 = b * R

    q_dma = pltpu.make_async_copy(q_hbm.at[pl.ds(row0, R)], q_v, q_sem)
    q_dma.start()

    def n_kv_of(r):
        return pl.cdiv(seq_lens_ref[row0 + r], kvblk)

    def lo_of(r):
        if window <= 0:
            return 0
        return jnp.maximum(seq_lens_ref[row0 + r] - window, 0) // kvblk

    def kv_dma(r, chunk, slot, p):
        # head-major pool pages [P, 2kvh, ps, d] land in a head-major VMEM
        # scratch [2, 2kvh, kvblk, d], so per-head K/V slices are FREE
        # outer-dim refs — slicing the middle head dim of a
        # [kvblk, 2kvh, d] buffer costs a sublane-gather relayout per head
        # per chunk, which dominated the first version of this kernel.
        page_id = page_table_ref[row0 + r, chunk * pblk + p]
        return pltpu.make_async_copy(
            pages_hbm.at[page_id],
            kv_v.at[slot, :, pl.ds(p * ps, ps), :],
            kv_sems.at[slot, p],
        )

    def start_chunk(r, chunk, slot):
        for p in range(pblk):
            kv_dma(r, chunk, slot, p).start()

    # global double-buffer over the flattened (row, chunk) stream: slot
    # parity advances once per chunk across ALL rows, so the prefetch of
    # the next row's first chunk lands in the right buffer.
    def first_live(r):
        # chunk count of row r (0 when the row is padding)
        return n_kv_of(r) - lo_of(r)

    # start the very first live chunk (if any row is live); unrolled over
    # the static R (Mosaic does not lower lax.scan with extensive ins/outs)
    started = jnp.zeros((), jnp.bool_)
    for r in range(R):
        live = jnp.logical_and(jnp.logical_not(started), first_live(r) > 0)

        @pl.when(live)
        def _(r=r):
            start_chunk(r, lo_of(r), 0)

        started = jnp.logical_or(started, live)

    q_dma.wait()
    o_v[...] = jnp.zeros_like(o_v)

    # flat (row, chunk) walk: cum[r] = live chunks before row r, computed
    # ONCE as unrolled scalars; flat index -> (row, chunk) is then O(R)
    cums = [jnp.zeros((), jnp.int32)]
    for rr in range(R):
        cums.append(cums[-1] + first_live(rr))
    total = cums[R]

    def row_of_flat(f):
        row = jnp.zeros((), jnp.int32)
        for rr in range(R - 1):
            row = jnp.where(f >= cums[rr + 1], rr + 1, row)
        return row

    def cum_at(row):
        t = jnp.zeros((), jnp.int32)
        for rr in range(R):
            t = t + jnp.where(row == rr, cums[rr], 0)
        return t

    # per-row lo (window start chunk), computed once
    los = [lo_of(rr) for rr in range(R)]

    def lo_at(row):
        t = jnp.zeros((), jnp.int32)
        for rr in range(R):
            t = t + jnp.where(row == rr, los[rr], 0)
        return t

    def body(f, carry):
        m, l, acc, prev_r = carry
        slot = jax.lax.rem(f, 2)
        r = row_of_flat(f)
        c = lo_at(r) + (f - cum_at(r))

        # prefetch next flat chunk
        @pl.when(f + 1 < total)
        def _():
            nf = f + 1
            nr = row_of_flat(nf)
            nc = lo_at(nr) + (nf - cum_at(nr))
            start_chunk(nr, nc, jax.lax.rem(nf, 2))

        for p in range(pblk):
            kv_dma(r, c, slot, p).wait()

        # new row: flush the previous row's output, reset the softmax state
        fresh = jnp.logical_or(f == 0, r != prev_r)

        @pl.when(jnp.logical_and(fresh, f > 0))
        def _():
            _flush(prev_r, m, l, acc)

        m = tuple(jnp.where(fresh, jnp.full_like(x, NEG_INF), x) for x in m)
        l = tuple(jnp.where(fresh, jnp.zeros_like(x), x) for x in l)
        acc = tuple(jnp.where(fresh, jnp.zeros_like(x), x) for x in acc)

        seq = seq_lens_ref[row0 + r]
        kv_pos = c * kvblk
        # scores live as [g, kvblk]: kvblk on LANES (full vector width),
        # g on sublanes — the [kvblk, g] orientation wasted 124/128 lanes
        kv_ids = kv_pos + jax.lax.broadcasted_iota(jnp.int32, (g, kvblk), 1)
        mask = kv_ids < seq
        if window > 0:
            mask &= kv_ids >= seq - window

        # per-head state is carried as tuples (static kvh) — stacked-array
        # .at[h].set would lower to scatter, which Mosaic can't
        new_m, new_l, new_acc = [], [], []
        for h in range(kvh):
            k_h = kv_v[slot, h].astype(q_v.dtype)  # [kvblk, d]
            v_h = kv_v[slot, kvh + h].astype(q_v.dtype)
            qf = q_v[r, h * g : (h + 1) * g, :]  # [g, d]
            s = jax.lax.dot_general(
                qf,
                k_h,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [g, kvblk]
            s = s * sm_scale
            if logit_cap > 0:
                s = logit_cap * jnp.tanh(s / logit_cap)
            s = jnp.where(mask, s, NEG_INF)
            m_prev = m[h]  # [g, 1]
            m_h = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p_ = jnp.exp(s - m_h)
            corr = jnp.exp(m_prev - m_h)
            l_h = l[h] * corr + jnp.sum(p_, axis=1, keepdims=True)
            a_h = acc[h] * corr + jax.lax.dot_general(
                p_.astype(q_v.dtype),
                v_h,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [g, d]
            new_m.append(m_h)
            new_l.append(l_h)
            new_acc.append(a_h)
        return tuple(new_m), tuple(new_l), tuple(new_acc), r

    def _flush(r, m, l, acc):
        for h in range(kvh):
            l_h = l[h]  # [g, 1]
            if sinks_vmem is not None:
                sink = sinks_vmem[:, h * g : (h + 1) * g]  # [1, g]
                l_h = l_h + jnp.exp(sink.reshape(g, 1) - m[h])
            l_h = jnp.maximum(l_h, 1e-10)
            o_v[r, h * g : (h + 1) * g, :] = (acc[h] / l_h).astype(o_v.dtype)

    m0 = tuple(jnp.full((g, 1), NEG_INF, jnp.float32) for _ in range(kvh))
    l0 = tuple(jnp.zeros((g, 1), jnp.float32) for _ in range(kvh))
    a0 = tuple(jnp.zeros((g, d), jnp.float32) for _ in range(kvh))
    m, l, acc, last_r = jax.lax.fori_loop(
        0, total, body, (m0, l0, a0, jnp.zeros((), jnp.int32))
    )

    @pl.when(total > 0)
    def _():
        _flush(last_r, m, l, acc)

    o_dma = pltpu.make_async_copy(o_v, out_hbm.at[pl.ds(row0, R)], o_sem)
    o_dma.start()
    o_dma.wait()


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "logit_cap", "window", "interpret"),
)
def paged_decode_attention(
    q: jax.Array,  # [bb, qh, d]; bb must be a multiple of 8
    pages: jax.Array,  # [P, 2*kvh, ps, d] (head-major pool layout)
    seq_lens: jax.Array,  # [bb] (0 = padding row)
    page_table: jax.Array,  # [bb, pmax]
    *,
    sm_scale: float,
    logit_cap: float = 0.0,
    window: int = -1,
    interpret: bool = False,
    sinks: jax.Array = None,
) -> jax.Array:
    bb, qh, d = q.shape
    num_pages, two_kvh, ps, _ = pages.shape
    kvh = two_kvh // 2
    g = qh // kvh
    R = 8
    assert bb % R == 0, bb
    pblk = max(1, 256 // ps)
    assert page_table.shape[1] % pblk == 0

    has_sinks = sinks is not None
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if has_sinks:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bb // R,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((R, qh, d), q.dtype),  # q_v
            pltpu.VMEM((2, two_kvh, pblk * ps, d), pages.dtype),  # kv_v
            pltpu.VMEM((R, qh, d), q.dtype),  # o_v
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, pblk)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    if not has_sinks:
        base_kernel = _pda_kernel

        def _kernel_no_sinks(*refs, **kw):
            scalars = refs[:2]
            q_ref, pages_ref = refs[2], refs[3]
            rest = refs[4:]
            return base_kernel(*scalars, q_ref, pages_ref, None, *rest, **kw)

        kernel_fn = _kernel_no_sinks
    else:
        kernel_fn = _pda_kernel
    kernel = functools.partial(
        kernel_fn,
        R=R,
        ps=ps,
        pblk=pblk,
        kvh=kvh,
        g=g,
        d=d,
        sm_scale=sm_scale,
        logit_cap=logit_cap,
        window=window,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bb, qh, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bb * qh * d * 512,
            bytes_accessed=int(pages.nbytes),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        seq_lens,
        page_table,
        q,
        pages,
        *([sinks.reshape(1, qh).astype(jnp.float32)] if has_sinks else []),
    )
