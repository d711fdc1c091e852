"""Ragged paged attention — the engine's hot attention kernel.

Role parity with the reference's paged-attention kernel family
(`sgl-kernel` flashinfer/fa3 backends + `layers/attention/triton_ops/`
{extend,decode}_attention.py), redesigned as ONE unified Pallas TPU kernel
(the "Ragged Paged Attention" design, PAPERS.md): prefill-extend and decode
are both expressed as a flat list of (sequence, q-block) work units over a
shared paged KV pool, so a single kernel + compiled shape serves both modes.

Design:
- Grid: one step per q-block. Scalar-prefetched block metadata
  (`blk_seq/qoff/nrows/pos0`, built host-side by `build_attn_blocks`)
  locates each block's q rows and its sequence's page list.
- q and KV pages live in HBM (`pl.ANY`); the kernel DMAs q once per block
  and streams KV pages through a double-buffered VMEM window, overlapping
  DMA with the flash-attention accumulation (online softmax in f32).
- GQA: scores are computed per KV head over the flattened (row, q-head-in-
  group) axis, transposed layout [kv_chunk, qg] so the running max/sum
  reductions are along the sublane axis and m/l live as [1, qg] rows.
- Tail rows of a block (beyond `nrows`) compute garbage that the NEXT block
  overwrites (blocks are emitted in ascending packed-q order and the grid
  runs sequentially); the final block's tail lands in the caller's padding.
- FP8 KV: pages are stored fp8_e4m3/e5m2 and upcast to bf16 in VMEM right
  after the DMA (dequant rides the kernel, reference `memory_pool.py:710`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _upcast(x, dtype):
    from sglang_tpu.ops.paged_decode_attention import fast_upcast

    return fast_upcast(x, dtype)


def _unpack4(x, dtype):
    from sglang_tpu.ops.paged_decode_attention import unpack_int4_kv_kernel

    return unpack_int4_kv_kernel(x, dtype)


def _rpa_kernel(
    # scalar prefetch
    blk_seq_ref,
    blk_qoff_ref,
    blk_nrows_ref,
    blk_pos0_ref,
    page_table_ref,
    # inputs (HBM)
    q_hbm,
    pages_hbm,
    scales_hbm,  # [P, S, 128] f32 per-page scale plane (int8 KV), or None
    sinks_vmem,  # [1, qh] f32 VMEM, or None (no attention sinks)
    # output (HBM)
    out_hbm,
    # scratch
    q_v,
    kv_v,
    sc_v,  # [2, pblk, S, 128] f32, or None
    o_v,
    m_scr,
    l_scr,
    acc_scr,
    q_sem,
    kv_sems,
    sc_sems,  # [2, pblk], or None
    o_sem,
    *,
    qblk: int,
    ps: int,
    pblk: int,
    kvh: int,
    g: int,
    d: int,
    int4: bool,
    sm_scale: float,
    logit_cap: float,
    window: int,
):
    b = pl.program_id(0)
    nrows = blk_nrows_ref[b]
    kvblk = pblk * ps
    qg = qblk * g

    @pl.when(nrows > 0)
    def _run():
        i = blk_seq_ref[b]
        qoff = blk_qoff_ref[b]
        pos0 = blk_pos0_ref[b]
        kv_hi = pos0 + nrows  # kv tokens needed (causal upper bound)
        kv_lo_blk = 0
        if window > 0:
            # sliding window: first kv chunk that any row still attends to
            kv_lo_blk = jnp.maximum(pos0 - window + 1, 0) // kvblk
        n_kv = pl.cdiv(kv_hi, kvblk)

        q_dma = pltpu.make_async_copy(
            q_hbm.at[pl.ds(qoff, qblk)], q_v, q_sem
        )
        q_dma.start()

        def kv_dma(chunk, slot, p):
            # head-major page [2kvh, ps, d] -> head-major VMEM scratch
            # [2, 2kvh, kvblk, d]: head slices are free outer-dim refs
            page_id = page_table_ref[i, chunk * pblk + p]
            return pltpu.make_async_copy(
                pages_hbm.at[page_id],
                kv_v.at[slot, :, pl.ds(p * ps, ps), :],
                kv_sems.at[slot, p],
            )

        def sc_dma(chunk, slot, p):
            # one page's [S, 128] scale plane moves as whole (8, 128)
            # tiles (sub-tile HBM slices are rejected by Mosaic on hw)
            page_id = page_table_ref[i, chunk * pblk + p]
            return pltpu.make_async_copy(
                scales_hbm.at[page_id],
                sc_v.at[slot, p],
                sc_sems.at[slot, p],
            )

        def start_chunk(chunk, slot):
            for p in range(pblk):
                kv_dma(chunk, slot, p).start()
                if scales_hbm is not None:
                    sc_dma(chunk, slot, p).start()

        # never start a DMA that the loop won't wait on (n_kv can be 0 for
        # padding rows; an unwaited semaphore wedges the core)
        @pl.when(n_kv > kv_lo_blk)
        def _():
            start_chunk(kv_lo_blk, jax.lax.rem(kv_lo_blk, 2))

        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        q_dma.wait()

        def body(c, _):
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_kv)
            def _():
                start_chunk(c + 1, jax.lax.rem(c + 1, 2))

            for p in range(pblk):
                kv_dma(c, slot, p).wait()
                if scales_hbm is not None:
                    sc_dma(c, slot, p).wait()

            # int8 KV: per-(token, head) scales arrive lane-major
            # [2kvh, kvblk]; ONE transpose per chunk puts kv tokens on
            # sublanes so per-head [kvblk, 1] columns slice for free.
            # The plane is row-per-head [rows, 128] (offsets on lanes),
            # so each piece is a static [1, ps] lane slice.
            sc_t = None
            if scales_hbm is not None:
                def _sc(hh, p):
                    return sc_v[slot, p, hh : hh + 1, 0:ps]

                sc_lane = jnp.concatenate(
                    [
                        jnp.concatenate(
                            [_sc(hh, p) for p in range(pblk)], axis=1
                        )
                        for hh in range(2 * kvh)
                    ],
                    axis=0,
                )  # [2kvh, kvblk] lane-major
                sc_t = jnp.transpose(sc_lane)  # [kvblk, 2kvh] f32

            # positions of this chunk's kv tokens / this block's q rows
            kv_pos = pl.multiple_of(c * kvblk, kvblk)
            kv_ids = kv_pos + jax.lax.broadcasted_iota(
                jnp.int32, (kvblk, qg), 0
            )
            q_ids = pos0 + jax.lax.broadcasted_iota(
                jnp.int32, (kvblk, qg), 1
            ) // g
            mask = kv_ids <= q_ids
            if window > 0:
                mask &= kv_ids > q_ids - window

            for h in range(kvh):
                # compute dtype follows q (f32 in parity tests, bf16 serving);
                # fp8-stored KV upcasts here — dequant rides the kernel
                if int4:
                    # one nibble-paired head row carries K (low) + V (high)
                    k_h, v_h = _unpack4(kv_v[slot, h], q_v.dtype)
                else:
                    k_h = _upcast(kv_v[slot, h], q_v.dtype)  # [kvblk, d]
                    v_h = _upcast(kv_v[slot, kvh + h], q_v.dtype)
                qf = q_v[:, h * g : (h + 1) * g, :].reshape(qg, d)
                s = jax.lax.dot_general(
                    k_h,
                    qf,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [kvblk, qg]
                if sc_t is not None:
                    s = s * sc_t[:, h : h + 1]  # per-kv-token K scale
                s = s * sm_scale
                if logit_cap > 0:
                    s = logit_cap * jnp.tanh(s / logit_cap)
                s = jnp.where(mask, s, NEG_INF)
                m_prev = m_scr[h]  # [1, qg]
                m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
                p_ = jnp.exp(s - m_new)
                corr = jnp.exp(m_prev - m_new)
                l_scr[h] = l_scr[h] * corr + jnp.sum(p_, axis=0, keepdims=True)
                pv = p_
                if sc_t is not None:
                    pv = p_ * sc_t[:, kvh + h : kvh + h + 1]  # V scale
                acc_scr[h] = acc_scr[h] * corr + jax.lax.dot_general(
                    v_h,
                    pv.astype(q_v.dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [d, qg]
                m_scr[h] = m_new

        jax.lax.fori_loop(kv_lo_blk, n_kv, body, None)

        for h in range(kvh):
            l = l_scr[h]
            if sinks_vmem is not None:
                # attention sink (gpt-oss): one extra softmax slot per q
                # head that contributes to the denominator only
                sink = sinks_vmem[:, h * g : (h + 1) * g]  # [1, g]
                sink_row = jnp.tile(sink, (1, qblk))  # col rq -> sink[rq % g]
                l = l + jnp.exp(sink_row - m_scr[h])
            l = jnp.maximum(l, 1e-10)  # [1, qg]
            out_t = acc_scr[h] / l  # [d, qg]
            o_v[:, h * g : (h + 1) * g, :] = (
                out_t.T.reshape(qblk, g, d).astype(o_v.dtype)
            )
        o_dma = pltpu.make_async_copy(
            o_v, out_hbm.at[pl.ds(qoff, qblk)], o_sem
        )
        o_dma.start()
        o_dma.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "qblk",
        "sm_scale",
        "logit_cap",
        "window",
        "interpret",
    ),
)
def ragged_paged_attention(
    q: jax.Array,  # [Tp, qh, d] — caller MUST pad rows so qoff+qblk <= Tp
    pages,  # [P, 2*kvh, ps, d] (head-major), or (values, scales) for int8 KV
    blk_seq: jax.Array,  # [NB]
    blk_qoff: jax.Array,
    blk_nrows: jax.Array,
    blk_pos0: jax.Array,
    page_table: jax.Array,  # [B, Pmax]
    *,
    qblk: int,
    sm_scale: float,
    logit_cap: float = 0.0,
    window: int = -1,
    interpret: bool = False,
    sinks: jax.Array = None,  # [qh] f32 per-q-head attention sinks
) -> jax.Array:
    scales = None
    if isinstance(pages, tuple):
        pages, scales = pages
    tp, qh, d = q.shape
    num_pages, heads_axis, ps, d_store = pages.shape
    int4 = scales is not None and pages.dtype == jnp.uint8
    assert d_store == d, (d_store, d)
    kvh = heads_axis if int4 else heads_axis // 2
    g = qh // kvh
    nb = blk_seq.shape[0]
    pblk = max(1, 128 // ps)
    assert page_table.shape[1] % pblk == 0, (
        f"page_table cols {page_table.shape[1]} not a multiple of pblk {pblk}"
    )
    kvblk = pblk * ps
    qg = qblk * g

    has_sinks = sinks is not None
    has_scales = scales is not None
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if has_scales:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    if has_sinks:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    scratch_shapes = [
        pltpu.VMEM((qblk, qh, d), q.dtype),  # q_v
        pltpu.VMEM((2, heads_axis, kvblk, d), pages.dtype),  # kv_v
    ]
    if has_scales:
        assert ps <= 128 and 128 % ps == 0, "int8 KV needs ps in {8..128}"
        scratch_shapes.append(
            pltpu.VMEM((2, pblk) + scales.shape[1:], jnp.float32)
        )
    scratch_shapes += [
        pltpu.VMEM((qblk, qh, d), q.dtype),  # o_v
        pltpu.VMEM((kvh, 1, qg), jnp.float32),  # m
        pltpu.VMEM((kvh, 1, qg), jnp.float32),  # l
        pltpu.VMEM((kvh, d, qg), jnp.float32),  # acc
        pltpu.SemaphoreType.DMA(()),  # q
        pltpu.SemaphoreType.DMA((2, pblk)),  # kv double buffer
    ]
    if has_scales:
        scratch_shapes.append(pltpu.SemaphoreType.DMA((2, pblk)))
    scratch_shapes.append(pltpu.SemaphoreType.DMA(()))  # out
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch_shapes,
    )

    def _kernel(*refs, **kw):
        # splice optional refs (scales input/scratch/sem, sinks) into the
        # full positional signature
        scalars = refs[:5]
        i = 5
        q_ref, pages_ref = refs[i], refs[i + 1]
        i += 2
        scales_ref = None
        if has_scales:
            scales_ref = refs[i]
            i += 1
        sinks_ref = None
        if has_sinks:
            sinks_ref = refs[i]
            i += 1
        out_ref = refs[i]
        i += 1
        q_v, kv_v = refs[i], refs[i + 1]
        i += 2
        sc_v = None
        if has_scales:
            sc_v = refs[i]
            i += 1
        o_v, m_scr, l_scr, acc_scr = refs[i : i + 4]
        i += 4
        q_sem, kv_sems = refs[i], refs[i + 1]
        i += 2
        sc_sems = None
        if has_scales:
            sc_sems = refs[i]
            i += 1
        o_sem = refs[i]
        return _rpa_kernel(
            *scalars, q_ref, pages_ref, scales_ref, sinks_ref, out_ref,
            q_v, kv_v, sc_v, o_v, m_scr, l_scr, acc_scr,
            q_sem, kv_sems, sc_sems, o_sem, **kw,
        )

    kernel = functools.partial(
        _kernel,
        qblk=qblk,
        ps=ps,
        pblk=pblk,
        kvh=kvh,
        g=g,
        d=d,
        int4=int4,
        sm_scale=sm_scale,
        logit_cap=logit_cap,
        window=window,
    )
    flops = 4 * int(jnp.size(q)) * 2048  # rough; helps the scheduler
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tp, qh, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=int(pages.nbytes), transcendentals=0
        ),
        interpret=interpret,
    )(
        blk_seq,
        blk_qoff,
        blk_nrows,
        blk_pos0,
        page_table,
        q,
        pages,
        *([scales] if has_scales else []),
        *([sinks.reshape(1, qh).astype(jnp.float32)] if has_sinks else []),
    )
