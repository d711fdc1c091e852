"""Pallas paged KV write for decode steps (one token per row).

XLA's scatter of [T*2kvh, d] rows into the paged pool executes at ~4.7 GB/s
on v5e inside the fused decode step (165 us/layer at bs=128 — profiled), so
the KV write was costing more than the attention itself. This kernel does
the write as a pipelined page read-modify-write:

- One token per ring slot: DMA the token's whole page [2kvh, ps, d] into
  VMEM, merge the new (quantized) row at its sublane offset with a vector
  select, DMA the page back. Packed int8/bf16 tilings make single-sublane
  HBM writes illegal (measured: Mosaic rejects them; f32 works), so the RMW
  is at page granularity — transfer cost is negligible next to the issue
  cost, and an nbuf-deep ring keeps ~4 DMAs in flight.
- int8 KV: the per-(token, head) scale plane [S, 128] is RMW'd the same
  way; quantization (scale = max|x|/127, round, clip) matches
  `layers/attention/base.py write_kv_pages` exactly (shared oracle test).
- Padding rows park their write on the reserved garbage page 0
  (`mem_cache/allocator.py` holds it permanently), so concurrent RMWs of
  page 0 only corrupt dead storage.

Reference analogue: the KV-store half of `sgl-kernel` decode attention
(`jit_kernel` kvcache store ops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kvw_kernel(
    # scalar prefetch
    loc_ref,  # [T] flat slot ids (padding rows -> garbage page 0)
    # inputs
    kv_hbm,  # [T, 2kvh, d] new K/V rows (model dtype)
    pages_in,  # [P, 2kvh, ps, d] (aliased with pages_out)
    scales_in,  # [P, S, 128] f32 or None (aliased with scales_out)
    # outputs
    pages_out,
    scales_out,
    # scratch
    kv_v,  # [T, 2kvh, d]
    pg_v,  # [nbuf, 2kvh, ps, d]
    po_v,  # [nbuf, 2kvh, ps, d]
    sc_v,  # [nbuf, S, 128] f32 or None
    so_v,  # [nbuf, S, 128] f32 or None
    kv_sem,
    in_sems,  # [nbuf]
    out_sems,  # [nbuf]
    sin_sems,  # [nbuf] or None
    sout_sems,  # [nbuf] or None
    *,
    T: int,
    ps: int,
    nbuf: int,
    kvh2: int,
    d: int,
    int4: bool,
):
    has_scales = scales_in is not None

    kv_dma = pltpu.make_async_copy(kv_hbm, kv_v, kv_sem)
    kv_dma.start()

    def page_of(i):
        return loc_ref[i] // ps

    def in_dma(i, slot):
        return pltpu.make_async_copy(
            pages_in.at[page_of(i)], pg_v.at[slot], in_sems.at[slot]
        )

    def sin_dma(i, slot):
        return pltpu.make_async_copy(
            scales_in.at[page_of(i)], sc_v.at[slot], sin_sems.at[slot]
        )

    # prime the ring
    for i0 in range(min(nbuf, T)):
        in_dma(i0, i0).start()
        if has_scales:
            sin_dma(i0, i0).start()

    kv_dma.wait()

    heads_store = kvh2 // 2 if int4 else kvh2
    sub = jax.lax.broadcasted_iota(jnp.int32, (heads_store, ps, d), 1)
    S = scales_in.shape[1] if has_scales else 0  # rows: 2kvh padded to 8
    lane_i = (
        jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
        if has_scales
        else None
    )
    row_i = (
        jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
        if has_scales
        else None
    )

    def body(i, _):
        slot = jax.lax.rem(i, nbuf)
        # slot reuse: the out-DMAs of token i-nbuf must have landed
        @pl.when(i >= nbuf)
        def _():
            pltpu.make_async_copy(po_v.at[slot], po_v.at[slot], out_sems.at[slot]).wait()
            if has_scales:
                pltpu.make_async_copy(so_v.at[slot], so_v.at[slot], sout_sems.at[slot]).wait()

        in_dma(i, slot).wait()
        if has_scales:
            sin_dma(i, slot).wait()

        off = loc_ref[i] % ps
        kvf = kv_v[i].astype(jnp.float32)  # [2kvh, d]
        if int4:
            # per-(token, head) int4: quantize, then nibble-pair head h's
            # K (low nibble) with its V (high nibble) using pure f32
            # arithmetic (exact for integers < 256) + ONE int8 store cast
            s = jnp.maximum(
                jnp.max(jnp.abs(kvf), axis=-1, keepdims=True), 1e-8
            ) / 7.0
            qv = jnp.clip(jnp.round(kvf / s), -7, 7)
            half = kvh2 // 2
            kq = qv[:half]
            vq = qv[half:]
            lo15 = kq + 16.0 * jnp.floor((7.0 - kq) * 0.125)
            hi15 = vq + 16.0 * jnp.floor((7.0 - vq) * 0.125)
            byte = lo15 + 16.0 * hi15  # 0..255
            vb = byte - 256.0 * jnp.floor(hi15 * 0.125)  # signed-bits view
            q = pltpu.bitcast(vb.astype(jnp.int8), jnp.uint8)
        elif has_scales:
            s = jnp.maximum(jnp.max(jnp.abs(kvf), axis=-1, keepdims=True), 1e-8) / 127.0
            q = jnp.clip(jnp.round(kvf / s), -127, 127).astype(pages_in.dtype)
        else:
            q = kvf.astype(pages_in.dtype)
        po_v[slot] = jnp.where(sub == off, q[:, None, :], pg_v[slot])
        pltpu.make_async_copy(
            po_v.at[slot], pages_out.at[page_of(i)], out_sems.at[slot]
        ).start()
        if has_scales:
            # plane row h = head h, lanes = token offsets: a single lane
            # mask merges all 2kvh heads' scales (row-per-head layout)
            s_pad = jnp.concatenate(
                [s, jnp.zeros((S - kvh2, 1), jnp.float32)], axis=0
            ) if S > kvh2 else s
            s_mat = jnp.broadcast_to(s_pad, (S, 128))
            so_v[slot] = jnp.where(
                (lane_i == off) & (row_i < kvh2), s_mat, sc_v[slot]
            )
            pltpu.make_async_copy(
                so_v.at[slot], scales_out.at[page_of(i)], sout_sems.at[slot]
            ).start()

        # prime the in-DMAs for token i+nbuf (reuses this slot's in buffer,
        # which the merge above has already consumed)
        @pl.when(i + nbuf < T)
        def _():
            in_dma(i + nbuf, slot).start()
            if has_scales:
                sin_dma(i + nbuf, slot).start()

        return 0

    jax.lax.fori_loop(0, T, body, 0)

    # drain the last nbuf out-DMAs
    for i0 in range(min(nbuf, T)):
        slot = (max(T - nbuf, 0) + i0) % nbuf
        pltpu.make_async_copy(po_v.at[slot], po_v.at[slot], out_sems.at[slot]).wait()
        if has_scales:
            pltpu.make_async_copy(so_v.at[slot], so_v.at[slot], sout_sems.at[slot]).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_kv_write(
    pages,  # [P, 2kvh, ps, d] or (values, scales) for int8 KV
    kv_new: jax.Array,  # [T, 2kvh, d] (K heads first, then V heads)
    loc: jax.Array,  # [T] flat slot ids; padding rows must point at page 0
    interpret: bool = False,
):
    """Write one token per row into the paged pool. Returns updated pages
    (same structure as `pages`). Semantically identical to the XLA scatter
    in `write_kv_pages` (oracle-tested)."""
    scales = None
    if isinstance(pages, tuple):
        pages, scales = pages
    T, kvh2, d = kv_new.shape
    num_pages, heads_store, ps, d_store = pages.shape
    has_scales = scales is not None
    int4 = has_scales and pages.dtype == jnp.uint8
    assert d_store == d, (d_store, d)
    assert heads_store == (kvh2 // 2 if int4 else kvh2)
    nbuf = 8 if T >= 8 else max(2, T)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_shapes = [jax.ShapeDtypeStruct(pages.shape, pages.dtype)]
    # flattened input indices: 0=loc (scalar prefetch), 1=kv, 2=pages, 3=scales
    aliases = {2: 0}
    if has_scales:
        assert ps <= 128 and 128 % ps == 0, "int8 KV needs ps in {8..128}"
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shapes.append(jax.ShapeDtypeStruct(scales.shape, scales.dtype))
        aliases[3] = 1

    scratch_shapes = [
        pltpu.VMEM((T, kvh2, d), kv_new.dtype),
        pltpu.VMEM((nbuf, heads_store, ps, d), pages.dtype),
        pltpu.VMEM((nbuf, heads_store, ps, d), pages.dtype),
    ]
    if has_scales:
        scratch_shapes += [
            pltpu.VMEM((nbuf,) + scales.shape[1:], jnp.float32),
            pltpu.VMEM((nbuf,) + scales.shape[1:], jnp.float32),
        ]
    scratch_shapes += [
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA((nbuf,)),
        pltpu.SemaphoreType.DMA((nbuf,)),
    ]
    if has_scales:
        scratch_shapes += [
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ]

    def _kernel(*refs):
        i = 1  # refs[0] = loc scalar prefetch
        kv_ref, pages_in = refs[i], refs[i + 1]
        i += 2
        scales_in = None
        if has_scales:
            scales_in = refs[i]
            i += 1
        pages_out = refs[i]
        i += 1
        scales_out = None
        if has_scales:
            scales_out = refs[i]
            i += 1
        kv_v, pg_v, po_v = refs[i], refs[i + 1], refs[i + 2]
        i += 3
        sc_v = so_v = None
        if has_scales:
            sc_v, so_v = refs[i], refs[i + 1]
            i += 2
        kv_sem, in_sems, out_sems = refs[i], refs[i + 1], refs[i + 2]
        i += 3
        sin_sems = sout_sems = None
        if has_scales:
            sin_sems, sout_sems = refs[i], refs[i + 1]
        return _kvw_kernel(
            refs[0], kv_ref, pages_in, scales_in, pages_out, scales_out,
            kv_v, pg_v, po_v, sc_v, so_v,
            kv_sem, in_sems, out_sems, sin_sems, sout_sems,
            T=T, ps=ps, nbuf=nbuf, kvh2=kvh2, d=d, int4=int4,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(out_shapes),
        scratch_shapes=scratch_shapes,
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(loc, kv_new, pages, *([scales] if has_scales else []))
    if has_scales:
        return (out[0], out[1])
    return out[0]
