"""Decode-specialized paged attention (R rows per grid block).

The unified ragged kernel (`ragged_paged_attention.py`) maps ONE sequence
per grid block; in decode mode that means `batch` sequential blocks per
layer, and the fixed per-block cost (scratch init, q/out DMA latency,
Mosaic block dispatch) dominates the step: measured ~14-23 us/block, i.e.
~1.8 ms/layer at batch 128 — far above the HBM-bandwidth roofline of the
actual KV reads.

This kernel amortizes that cost across R=8 decode rows per block:
- Grid: (batch/R,). Each block DMAs its R q rows once, then streams the
  flattened (row, chunk) KV stream through an nbuf-deep VMEM ring buffer
  (nbuf chosen per-config under a VMEM budget); chunk f+nbuf-1 is in
  flight while chunk f computes, so the DMA pipeline never drains at row
  boundaries.
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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def fast_upcast(x, target_dtype):
    """fp8(e4m3/e5m2) -> bf16 without Mosaic's float8 convert.

    Mosaic's native float8->bfloat16 convert costs ~120 us per 512 KB
    chunk (measured: 66 GB/s effective KV read vs 574 GB/s for bf16 KV),
    and integer bit-reconstruction is no better: 16-bit shifts don't
    legalize and 8->32-bit widening is a sublane-unpack relayout."""
    if x.dtype == target_dtype:
        return x
    if x.dtype == jnp.float8_e4m3fn:
        shift = 4
    elif x.dtype == jnp.float8_e5m2:
        shift = 5
    else:
        return x.astype(target_dtype)
    # Decode arithmetically in bf16: int8->bf16 convert is the ONE fast
    # 8->16-bit primitive Mosaic has (hardware path, used by the int8
    # weight matmuls); 16-bit shifts don't legalize and 8->32 widening is
    # a sublane-unpack relayout. Every fp8 value is exactly representable
    # in bf16, and all intermediates below are integers < 128 or powers of
    # two, so the pipeline is EXACT (including denormals).
    mant_bits = 7 - shift  # e4m3: 3, e5m2: 2
    ebias = 7.0 if shift == 4 else 15.0
    mdiv = float(1 << mant_bits)
    # Pure f32 arithmetic, no booleans: Mosaic mis-relayouts i1 vectors
    # ("Non-singleton logical dimension is replicated..."), and bf16 lacks
    # the mantissa to keep the 8-bit integer math exact. All selects are
    # 0/1-indicator multiplies; jnp.exp2 is avoided (polynomial approx,
    # not exact on integers) via binary decomposition of the exponent.
    uf = pltpu.bitcast(x, jnp.int8).astype(jnp.float32)  # -128..127 exact
    m = uf + 128.0  # raw byte value 0..255
    pos01 = jnp.floor(m * (1.0 / 256.0) + 0.5)  # 1 when sign bit clear
    sign = pos01 * 2.0 - 1.0
    mag = m - 128.0 * pos01  # exp:mant bits as an integer
    e = jnp.floor(mag / mdiv)
    mfrac = (mag - e * mdiv) / mdiv  # mant / 2^mant_bits, exact
    t = e
    scale = jnp.full_like(m, float(2.0**-ebias))
    max_e = (1 << (4 if shift == 4 else 5)) - 1
    for bit, mul in ((16.0, 65536.0), (8.0, 256.0), (4.0, 16.0), (2.0, 4.0)):
        if max_e < bit:
            continue
        b = jnp.floor(t / bit)  # 0 or 1
        t = t - b * bit
        scale = scale * (1.0 + b * (mul - 1.0))
    scale = scale * (1.0 + t)  # t in {0, 1}: *1 or *2
    v = scale * (1.0 + mfrac)
    # denormals (e == 0): value = mfrac * 2^(1 - ebias), exact
    z01 = jnp.maximum(1.0 - e, 0.0)  # 1 iff e == 0
    v = v * (1.0 - z01) + z01 * mfrac * float(2.0 ** (1.0 - ebias))
    return (sign * v).astype(target_dtype)


def unpack_int4_kv_kernel(x_u8, target_dtype):
    """Packed int4 KV bytes -> (k, v) planes, in-kernel. A byte holds
    the K value in its low nibble and the V value of the SAME (token,
    head, dim) in its high nibble (`layers/attention/base.py pack_int4`),
    so both planes keep full 128-lane rows and the unpack needs no
    concat or interleave. Arithmetic rides the int8->f32 hardware
    convert plus a handful of exact f32 ops (the fp8 lesson above:
    per-element bit surgery must stay off the slow paths); every
    intermediate is an integer < 256, so the pipeline is exact.

    Note the int8 view + 128 equals byte XOR 0x80 (the convert reads the
    sign bit): that flips the HIGH nibble's top bit, and the flip plus
    the high nibble's sign-extension cancel into a single -8.

    The widen rides int8->bf16 (the one fast 8->16-bit Mosaic convert;
    int8->f32 directly is the sublane-unpack relayout that sank the
    first fp8 path) then the cheap bf16->f32 extension; v5e has no bf16
    ALU (floor), so the nibble arithmetic itself runs in f32. Every
    intermediate is an integer <= 255 (exact in both types) and the two
    divides are powers of two."""
    m = (
        pltpu.bitcast(x_u8, jnp.int8)
        .astype(jnp.bfloat16)
        .astype(jnp.float32)
        + 128.0
    )
    hi_x = jnp.floor(m * (1.0 / 16.0))  # V nibble ^ 8, 0..15
    lo = m - hi_x * 16.0  # true K nibble 0..15
    k = lo - 16.0 * jnp.floor(lo * 0.125)  # sign-extend -> -8..7
    v = hi_x - 8.0  # (n ^ 8) sign-extended == n - 8
    return k.astype(target_dtype), v.astype(target_dtype)


def _pda_kernel(
    # scalar prefetch
    seq_lens_ref,  # [bb]
    page_table_ref,  # [bb, pmax]
    # inputs (HBM)
    q_hbm,  # [bb, qh, d]
    pages_hbm,  # [P, 2*kvh, ps, d] (head-major)
    scales_hbm,  # [P, S, 128] f32 per-page scale plane (int8 KV), or None
    sinks_vmem,  # [1, qh] f32, or None
    # output (HBM)
    out_hbm,  # [bb, qh, d]
    st_hbm,  # [bb, qh, 128] f32 (m lane 0, l lane 1), or None
    # scratch
    q_v,  # [R, qh, d]
    kv_v,  # [NBUF, 2*kvh, kvblk, d] (head-major)
    sc_v,  # [NBUF, pblk, S, 128] f32, or None
    o_v,  # [R, qh, d]
    st_v,  # [R, qh, 128] f32, or None
    q_sem,
    kv_sems,  # [NBUF, pblk]
    sc_sems,  # [NBUF, pblk], or None
    o_sem,
    st_sem,
    *,
    R: int,
    ps: int,
    pblk: int,
    nbuf: int,
    kvh: int,
    g: int,
    d: int,
    int4: bool,
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

    def sc_dma(r, chunk, slot, p):
        # one page's [S, 128] scale plane moves as whole (8, 128) tiles
        # (sub-tile HBM slices are rejected by Mosaic on hardware)
        page_id = page_table_ref[row0 + r, chunk * pblk + p]
        return pltpu.make_async_copy(
            scales_hbm.at[page_id],
            sc_v.at[slot, p],
            sc_sems.at[slot, p],
        )

    def start_chunk(r, chunk, slot):
        for p in range(pblk):
            kv_dma(r, chunk, slot, p).start()
            if scales_hbm is not None:
                sc_dma(r, chunk, slot, p).start()

    # NBUF-deep ring buffer over the flattened (row, chunk) stream: the
    # slot index advances once per chunk across ALL rows, so chunk f+nbuf-1
    # is in flight while chunk f computes — a chunk's 2*pblk DMAs cost
    # ~2 us of latency each, far above their transfer time, so decode
    # attention is DMA-LATENCY-bound and pipeline depth (not bandwidth)
    # sets the kernel's speed.
    def first_live(r):
        # chunk count of row r (0 when the row is padding)
        return n_kv_of(r) - lo_of(r)

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

    def start_flat(f, slot):
        r = row_of_flat(f)
        start_chunk(r, lo_at(r) + (f - cum_at(r)), slot)

    # prime the ring: chunks 0..nbuf-2 in flight before the walk starts
    # (unrolled over the static nbuf; each is one slot of the ring)
    for f0 in range(nbuf - 1):

        @pl.when(f0 < total)
        def _(f0=f0):
            start_flat(jnp.int32(f0), f0 % nbuf)

    q_dma.wait()
    o_v[...] = jnp.zeros_like(o_v)
    if st_v is not None:
        # rows the walk never reaches (pool_len 0) must merge as "empty":
        # m = -inf (lane 0), l = 0 (lane 1)
        lane0 = jax.lax.broadcasted_iota(jnp.int32, st_v.shape, 2) == 0
        st_v[...] = jnp.where(lane0, NEG_INF, 0.0)

    # static block-diagonal head mask: q row i belongs to kv head i//g,
    # lane j of the stacked [kvh*kvblk] axis belongs to kv head j//kvblk.
    # Fusing all kvh heads into ONE [qh, d] x [d, kvh*kvblk] score matmul
    # (and one value matmul) replaces 2*kvh tiny [g, d] dots per chunk —
    # those were MXU-latency-bound (~24 us/chunk vs ~1 us of DMA), which
    # capped decode attention at ~200 GB/s. The off-diagonal FLOPs are
    # free: the chunk is latency-bound, not FLOP-bound.
    S = kvh * kvblk
    qh = kvh * g
    qrow_head = jax.lax.broadcasted_iota(jnp.int32, (qh, S), 0) // g
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (qh, S), 1) // kvblk
    head_mask = qrow_head == lane_head
    lane_off = jax.lax.broadcasted_iota(jnp.int32, (qh, S), 1) % kvblk

    def body(f, carry):
        m, l, acc, prev_r = carry
        slot = jax.lax.rem(f, nbuf)
        r = row_of_flat(f)
        c = lo_at(r) + (f - cum_at(r))

        # keep the ring full: start chunk f+nbuf-1 (it lands in the slot
        # consumed at iteration f-1 — the same one-iteration reuse gap as
        # a classic double buffer)
        @pl.when(f + nbuf - 1 < total)
        def _():
            start_flat(f + nbuf - 1, jax.lax.rem(f + nbuf - 1, nbuf))

        for p in range(pblk):
            kv_dma(r, c, slot, p).wait()
            if scales_hbm is not None:
                sc_dma(r, c, slot, p).wait()

        # new row: flush the previous row's output, reset the softmax state
        fresh = jnp.logical_or(f == 0, r != prev_r)

        @pl.when(jnp.logical_and(fresh, f > 0))
        def _():
            _flush(prev_r, m, l, acc)

        m = jnp.where(fresh, jnp.full_like(m, NEG_INF), m)
        l = jnp.where(fresh, jnp.zeros_like(l), l)
        acc = jnp.where(fresh, jnp.zeros_like(acc), acc)

        seq = seq_lens_ref[row0 + r]
        kv_ids = c * kvblk + lane_off
        mask = head_mask & (kv_ids < seq)
        if window > 0:
            mask &= kv_ids >= seq - window

        if int4:
            # int4 pages carry kvh nibble-paired head rows
            k_all, v_all = unpack_int4_kv_kernel(
                kv_v[slot].reshape(S, d), q_v.dtype
            )
        else:
            k_all = fast_upcast(kv_v[slot, :kvh].reshape(S, d), q_v.dtype)
            v_all = fast_upcast(kv_v[slot, kvh:].reshape(S, d), q_v.dtype)
        qf = q_v[r]  # [qh, d]
        s = jax.lax.dot_general(
            qf,
            k_all,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [qh, S]
        if scales_hbm is not None:
            # int8 KV: fold the per-(token, head) K scales into the scores
            # — the plane is row-per-head [rows, 128] (offsets on lanes),
            # so each piece is a static [1, ps] lane slice, assembling the
            # [1, kvh*kvblk] row with no sublane->lane relayout
            def _sc(hh, p):
                return sc_v[slot, p, hh : hh + 1, 0:ps]

            ks_row = jnp.concatenate(
                [_sc(h, p) for h in range(kvh) for p in range(pblk)],
                axis=1,
            )  # [1, kvh*kvblk] f32
            s = s * ks_row
        s = s * sm_scale
        if logit_cap > 0:
            s = logit_cap * jnp.tanh(s / logit_cap)
        s = jnp.where(mask, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))  # [qh, 1]
        p_ = jnp.exp(s - m_new)  # off-block lanes are exactly 0
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p_, axis=1, keepdims=True)
        pv = p_
        if scales_hbm is not None:
            # fold the per-(token, head) V scales into the probabilities
            vs_row = jnp.concatenate(
                [_sc(kvh + h, p) for h in range(kvh) for p in range(pblk)],
                axis=1,
            )  # [1, kvh*kvblk] f32
            pv = p_ * vs_row
        acc_new = acc * corr + jax.lax.dot_general(
            pv.astype(q_v.dtype),
            v_all,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [qh, d]
        return m_new, l_new, acc_new, r

    def _flush(r, m, l, acc):
        if st_v is not None:
            # state output mode: emit (m, l) and the sink-free normalized
            # partial — the caller merges with the chain-tail attention
            # (and applies sinks once, at the merge)
            lane = jax.lax.broadcasted_iota(jnp.int32, (qh, 128), 1)
            st_v[r] = jnp.where(
                lane == 0,
                jnp.broadcast_to(m, (qh, 128)),
                jnp.where(lane == 1, jnp.broadcast_to(l, (qh, 128)), 0.0),
            )
            o_v[r] = (acc / jnp.maximum(l, 1e-10)).astype(o_v.dtype)
            return
        if sinks_vmem is not None:
            sink = sinks_vmem[:, :].reshape(qh, 1)
            l = l + jnp.exp(sink - m)
        l = jnp.maximum(l, 1e-10)
        o_v[r] = (acc / l).astype(o_v.dtype)

    m0 = jnp.full((qh, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((qh, 1), jnp.float32)
    a0 = jnp.zeros((qh, d), jnp.float32)
    m, l, acc, last_r = jax.lax.fori_loop(
        0, total, body, (m0, l0, a0, jnp.zeros((), jnp.int32))
    )

    @pl.when(total > 0)
    def _():
        _flush(last_r, m, l, acc)

    o_dma = pltpu.make_async_copy(o_v, out_hbm.at[pl.ds(row0, R)], o_sem)
    o_dma.start()
    if st_v is not None:
        st_dma = pltpu.make_async_copy(
            st_v, st_hbm.at[pl.ds(row0, R)], st_sem
        )
        st_dma.start()
        st_dma.wait()
    o_dma.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "logit_cap", "window", "interpret", "return_state"
    ),
)
def paged_decode_attention(
    q: jax.Array,  # [bb, qh, d]; bb must be a multiple of 8
    pages,  # [P, 2*kvh, ps, d] (head-major), or (values, scales) for int8 KV
    seq_lens: jax.Array,  # [bb] (0 = padding row)
    page_table: jax.Array,  # [bb, pmax]
    *,
    sm_scale: float,
    logit_cap: float = 0.0,
    window: int = -1,
    interpret: bool = False,
    sinks: jax.Array = None,
    return_state: bool = False,
) -> jax.Array:
    """With `return_state=True` also returns [bb, qh, 128] f32 softmax
    state (running max on lane 0, denominator on lane 1) and does NOT
    apply sinks — the caller merges partial attentions (chain-tail decode,
    reference `sgl-kernel merge_attn_states` role)."""
    scales = None
    if isinstance(pages, tuple):
        pages, scales = pages
    bb, qh, d = q.shape
    num_pages, heads_axis, ps, d_store = pages.shape
    int4 = scales is not None and pages.dtype == jnp.uint8
    assert d_store == d, (d_store, d)
    kvh = heads_axis if int4 else heads_axis // 2
    g = qh // kvh
    import os as _os

    R = int(_os.environ.get("SGLANG_TPU_PDA_R", "8"))
    assert bb % R == 0, bb
    pblk = max(1, int(_os.environ.get("SGLANG_TPU_PDA_KVBLK", "256")) // ps)
    assert page_table.shape[1] % pblk == 0
    # ring depth: each chunk's DMAs are latency- (not bandwidth-) bound,
    # so keep several chunks in flight — but cap the KV + scale scratch at
    # a fixed fraction of the VMEM budget so large kvh/d configs still fit
    # alongside the q/o buffers (ADVICE r2: 8 MiB at kvh=8/d=128 bf16).
    vmem_limit = 100 * 1024 * 1024
    chunk_bytes = heads_axis * 256 * d_store * pages.dtype.itemsize
    if isinstance(scales, jax.Array):
        chunk_bytes += pblk * int(np.prod(scales.shape[1:])) * 4
    nbuf_cap = int(_os.environ.get("SGLANG_TPU_PDA_NBUF", "8"))
    nbuf = max(2, min(nbuf_cap, (vmem_limit // 2) // max(1, chunk_bytes)))

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
        pltpu.VMEM((R, qh, d), q.dtype),  # q_v
        pltpu.VMEM((nbuf, heads_axis, pblk * ps, d), pages.dtype),  # kv_v
    ]
    if has_scales:
        assert ps <= 128 and 128 % ps == 0, "int8 KV needs ps in {8..128}"
        scratch_shapes.append(
            pltpu.VMEM((nbuf, pblk) + scales.shape[1:], jnp.float32)
        )
    scratch_shapes += [
        pltpu.VMEM((R, qh, d), q.dtype),  # o_v
    ]
    if return_state:
        scratch_shapes.append(pltpu.VMEM((R, qh, 128), jnp.float32))  # st_v
    scratch_shapes += [
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA((nbuf, pblk)),
    ]
    if has_scales:
        scratch_shapes.append(pltpu.SemaphoreType.DMA((nbuf, pblk)))
    scratch_shapes.append(pltpu.SemaphoreType.DMA(()))
    if return_state:
        scratch_shapes.append(pltpu.SemaphoreType.DMA(()))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bb // R,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (2 if return_state else 1)
        if return_state
        else pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch_shapes,
    )

    def _kernel(*refs, **kw):
        # splice optional refs (scales input/scratch/sem, sinks, state
        # output/scratch/sem) into the full positional signature
        i = 2
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
        st_ref = None
        if return_state:
            st_ref = refs[i]
            i += 1
        q_v, kv_v = refs[i], refs[i + 1]
        i += 2
        sc_v = None
        if has_scales:
            sc_v = refs[i]
            i += 1
        o_v = refs[i]
        i += 1
        st_v = None
        if return_state:
            st_v = refs[i]
            i += 1
        q_sem, kv_sems = refs[i], refs[i + 1]
        i += 2
        sc_sems = None
        if has_scales:
            sc_sems = refs[i]
            i += 1
        o_sem = refs[i]
        i += 1
        st_sem = None
        if return_state:
            st_sem = refs[i]
        return _pda_kernel(
            refs[0], refs[1], q_ref, pages_ref, scales_ref, sinks_ref,
            out_ref, st_ref, q_v, kv_v, sc_v, o_v, st_v, q_sem, kv_sems,
            sc_sems, o_sem, st_sem,
            **kw,
        )

    kernel = functools.partial(
        _kernel,
        R=R,
        ps=ps,
        pblk=pblk,
        nbuf=nbuf,
        kvh=kvh,
        g=g,
        d=d,
        int4=int4,
        sm_scale=sm_scale,
        logit_cap=logit_cap,
        window=window,
    )
    out_shape = jax.ShapeDtypeStruct((bb, qh, d), q.dtype)
    if return_state:
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((bb, qh, 128), jnp.float32),
        ]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
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
        *([scales] if has_scales else []),
        *([sinks.reshape(1, qh).astype(jnp.float32)] if has_sinks else []),
    )
