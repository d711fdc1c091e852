"""Chunked-parallel SSD (Mamba2) prefill.

Parity target: reference `sgl-kernel/csrc/mamba/causal_conv1d.cu` + the
triton SSD chunk kernels (role), HF `Mamba2Mixer` `segment_sum` chunk
path (math). The token-level `lax.scan` in `layers/linear_attn.py
mamba2_extend` serializes T steps of VPU work; this module computes the
same recurrence

    h_t = decay_t * h_{t-1} + dt_t * x_t ⊗ B_t ;  y_t = C_t · h_t + D x_t

with the SSD chunk decomposition: within a chunk of L tokens the output
is an attention-shaped product of [L, ds] matrices (MXU work), and only
a T/L-step scan propagates chunk states. TPU-first design notes:

- the packed ragged stream (contiguous per-sequence spans, positions==0
  marking fresh sequences, padding on the trash slot) is handled with
  SEGMENT masks: a boundary zeroes the link decay, so cross-sequence
  terms vanish inside the same dense matmuls;
- continuing sequences (chunked prefill) INJECT their pool state into
  the chunk-scan carry at the end of their start chunk; tokens inside
  the start chunk read it through a small per-sequence pass;
- per-sequence final states are reconstructed from the chunk-entry
  carries plus an L-token tail (bounded per-sequence work), then
  scattered back to the state pool;
- the depthwise causal conv runs as k shifted multiply-adds with
  per-token fallback to the conv pool for the first k-1 tokens of a
  continuing sequence.

Everything is ordinary jnp — XLA tiles the [L, ds] x [ds, L] x [L, dh]
chains onto the MXU; a Pallas fusion of the mask+matmul inner loop is a
further step, but the wall-clock win over the token scan comes from the
T -> T/L sequential-depth reduction.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sglang_tpu.layers.linear_attn import _split_xbc, mamba2_rates

NEG = -1e30


def _segments(slots: jax.Array, positions: jax.Array):
    """boundary[t], seg_start[t] (index of t's segment start), and
    seg_end[t] for the packed stream (padding tokens each form their own
    one-token segment on the trash slot)."""
    T = slots.shape[0]
    ar = jnp.arange(T)
    prev_slot = jnp.roll(slots, 1).at[0].set(-1)
    prev_pos = jnp.roll(positions, 1).at[0].set(-2)
    boundary = (
        (ar == 0)
        | (slots != prev_slot)
        | (positions != prev_pos + 1)
        | (positions == 0)
    )
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(boundary, ar, -1)
    )
    nxt = jnp.where(boundary, ar, T)
    nxt = jnp.roll(nxt, -1).at[T - 1].set(T)
    seg_end = (
        jax.lax.associative_scan(jnp.minimum, nxt[::-1])[::-1] - 1
    ).clip(0, T - 1)
    return boundary, seg_start, seg_end


def mamba2_extend_chunked(
    conv_pool: jax.Array,  # [S+1, conv_dim, k-1] f32
    ssm_pool: jax.Array,  # [S+1, nh, dh, ds] f32
    xbc: jax.Array,  # [T, conv_dim]
    dt: jax.Array,  # [T, nh]
    slots: jax.Array,  # [T] i32 (padding -> S)
    positions: jax.Array,  # [T] (0 -> fresh sequence)
    geom: tuple,  # (nh, dh, g, ds)
    conv_w: jax.Array,  # [conv_dim, k]
    conv_b,  # [conv_dim] or None
    a_log: jax.Array,
    dt_bias: jax.Array,
    d_skip: jax.Array,
    time_limit: Tuple[float, float] = (0.0, float("inf")),
    chunk: int = 64,
    max_seqs: int = 64,
):
    """Same contract as `mamba2_extend`; returns (y [T, nh, dh],
    conv_pool, ssm_pool). Requires per-sequence spans to be contiguous
    in the stream (the engine's packed layout) and at most `max_seqs`
    REAL sequences per call."""
    nh, dh, g, ds = geom
    rep = nh // g
    T0 = xbc.shape[0]
    sentinel = conv_pool.shape[0] - 1
    L = min(chunk, T0)
    pad = (-T0) % L
    if pad:
        xbc = jnp.pad(xbc, ((0, pad), (0, 0)))
        dt = jnp.pad(dt, ((0, pad), (0, 0)))
        slots = jnp.pad(slots, (0, pad), constant_values=sentinel)
        positions = jnp.pad(positions, (0, pad))
    T = T0 + pad
    nc = T // L
    ar = jnp.arange(T)

    boundary, seg_start, seg_end = _segments(slots, positions)
    x32 = xbc.astype(jnp.float32)

    # ----------------------------------------------------- causal conv
    k = conv_w.shape[-1]
    conv_w32 = conv_w.astype(jnp.float32)
    # a FRESH sequence's missing left context is zero; a CONTINUING one
    # reads the conv pool column for that offset
    fresh_seg = jnp.take(positions, seg_start) == 0
    acc = x32 * conv_w32[:, k - 1]
    window_parts = [x32]
    for j in range(1, k):
        shifted = jnp.roll(x32, j, axis=0).at[:j].set(0.0)
        valid = (ar - j) >= seg_start
        # referenced position t-j sits (seg_start - (t-j)) tokens before
        # the sequence start -> pool column k-1-j+(t-seg_start)
        col = jnp.clip(k - 1 - j + (ar - seg_start), 0, k - 2)
        pool_j = jnp.where(
            fresh_seg[:, None], 0.0, conv_pool[slots, :, col]
        )
        ctx_j = jnp.where(valid[:, None], shifted, pool_j)
        acc = acc + ctx_j * conv_w32[:, k - 1 - j]
        window_parts.append(ctx_j)
    if conv_b is not None:
        acc = acc + conv_b.astype(jnp.float32)
    conv_out = jax.nn.silu(acc)
    # window after each token = inputs (t-k+2 .. t) with pool fallback
    is_last = ar == seg_end
    window = jnp.stack(window_parts[::-1], axis=-1)[..., 1:]
    conv_pool = conv_pool.at[jnp.where(is_last, slots, sentinel)].set(window)

    # ------------------------------------------------------- SSD chunks
    x, b, c = _split_xbc(conv_out, geom)  # [T,nh,dh] [T,g,ds] [T,g,ds]
    decay, dt_eff = mamba2_rates(dt, dt_bias, a_log, time_limit)
    ld = jnp.log(decay)  # [T, nh] (< 0)
    cums = jnp.cumsum(ld, axis=0)
    cums_at_start = jnp.take(cums, seg_start, axis=0)
    ld_at_start = jnp.take(ld, seg_start, axis=0)
    cumseg = cums - cums_at_start + ld_at_start  # sum over [start..t]

    xg = x.reshape(T, g, rep, dh).astype(jnp.float32)
    bg = b.astype(jnp.float32)
    cg = c.astype(jnp.float32)
    wdt = dt_eff.reshape(T, g, rep)

    def ch(a):  # chunk view
        return a.reshape((nc, L) + a.shape[1:])

    seg_c = ch(seg_start)
    cumseg_c = ch(cumseg)  # [nc, L, nh]
    # intra-chunk: w[t, s] = exp(cumseg[t] - cumseg[s]) on same-segment
    # lower-triangular pairs
    same = (seg_c[:, :, None] == seg_c[:, None, :]) & (
        jnp.arange(L)[:, None] >= jnp.arange(L)[None, :]
    )
    diff = cumseg_c[:, :, None] - cumseg_c[:, None, :]  # [nc, L, L, nh]
    w = jnp.exp(jnp.where(same[..., None], diff, NEG))
    cb = jnp.einsum(
        "clgs,ckgs->clkg", ch(cg), ch(bg), preferred_element_type=jnp.float32
    )
    m = cb[..., None] * w.reshape(nc, L, L, g, rep) * ch(wdt)[:, None]
    y = jnp.einsum(
        "clkgr,ckgrd->clgrd", m, ch(xg), preferred_element_type=jnp.float32
    )

    # chunk summaries for the carry scan
    last = L - 1
    chunk_first = jnp.arange(nc) * L
    cums_prev_last = jnp.concatenate(
        [jnp.zeros((1, nh), jnp.float32), ch(cums)[:-1, last]], axis=0
    )
    spans = seg_c[:, last] < chunk_first  # carry survives the chunk
    lam = jnp.exp(ch(cums)[:, last] - cums_prev_last) * spans[:, None]
    to_end_same = seg_c == seg_c[:, last : last + 1]
    w_end = jnp.exp(
        jnp.where(
            to_end_same[..., None],
            cumseg_c[:, last : last + 1] - cumseg_c,
            NEG,
        )
    )  # [nc, L, nh]
    # injection of pool states for segments starting inside each chunk
    start_of_end_seg = seg_c[:, last]
    inj_slot = slots[start_of_end_seg]
    inj_gate = (
        (positions[start_of_end_seg] > 0)
        & (start_of_end_seg >= chunk_first)
        & (inj_slot != sentinel)
    )
    inj_factor = jnp.exp(cumseg_c[:, last])  # [nc, nh]
    # Y_inter factor: carry contribution to token t (segment entered the
    # chunk from outside)
    enter = ch(seg_start) < chunk_first[:, None]
    f_inter = jnp.exp(
        jnp.where(enter[..., None], ch(cums) - cums_prev_last[:, None], NEG)
    )  # [nc, L, nh]

    def body(h, xs):
        (wend_c, wdt_c, x_c, b_c, lam_c, islot, igate, ifac, fint, c_c) = xs
        h_in = h
        y_inter = jnp.einsum(
            "lgs,gsrd,lgr->lgrd",
            c_c,
            h.reshape(g, rep, dh, ds).transpose(0, 3, 1, 2),
            fint.reshape(L, g, rep),
            preferred_element_type=jnp.float32,
        )
        s_c = jnp.einsum(
            "lgr,lgrd,lgs->grds",
            wend_c.reshape(L, g, rep) * wdt_c,
            x_c,
            b_c,
            preferred_element_type=jnp.float32,
        ).reshape(nh, dh, ds)
        inj = ssm_pool[islot].astype(jnp.float32) * jnp.where(igate, 1.0, 0.0)
        h_next = lam_c[:, None, None] * h + s_c + inj * ifac[:, None, None]
        return h_next, (h_in, y_inter)

    h0 = jnp.zeros((nh, dh, ds), jnp.float32)
    _, (h_ins, y_inter) = jax.lax.scan(
        body,
        h0,
        (
            w_end,
            ch(wdt),
            ch(xg),
            ch(bg),
            lam,
            inj_slot,
            inj_gate,
            inj_factor,
            f_inter,
            ch(cg),
        ),
    )
    y = (y + y_inter.reshape(nc, L, g, rep, dh)).reshape(T, nh, dh)

    # ------------------------------------ per-sequence init + writeback
    starts = jnp.where(
        boundary & (slots != sentinel), size=max_seqs, fill_value=T
    )[0]
    real = starts < T
    s_idx = jnp.clip(starts, 0, T - 1)
    e_idx = jnp.take(seg_end, s_idx)
    s_slot = jnp.where(real, jnp.take(slots, s_idx), sentinel)
    h_init = ssm_pool[s_slot].astype(jnp.float32) * (
        (jnp.take(positions, s_idx) > 0) & real
    )[:, None, None, None].astype(jnp.float32)

    def per_seq(start_t, end_t, hi, is_real):
        c0 = start_t // L
        ce = end_t // L
        # tokens of the segment inside its START chunk see the initial
        # state directly: y += C_t . (h_init * exp(cumseg[t]))
        cums_chunk = jax.lax.dynamic_slice_in_dim(cumseg, c0 * L, L, 0)
        segs_chunk = jax.lax.dynamic_slice_in_dim(seg_start, c0 * L, L, 0)
        c_chunk = jax.lax.dynamic_slice_in_dim(cg, c0 * L, L, 0)
        own = (segs_chunk == start_t) & is_real
        fac = jnp.exp(jnp.where(own[:, None], cums_chunk, NEG))
        y_init = jnp.einsum(
            "lgs,gsrd,lgr->lgrd",
            c_chunk,
            hi.reshape(g, rep, dh, ds).transpose(0, 3, 1, 2),
            fac.reshape(L, g, rep),
            preferred_element_type=jnp.float32,
        ).reshape(L, nh, dh)
        rows = jnp.where(own, c0 * L + jnp.arange(L), T)
        # final state at the segment's last token: chunk-entry carry +
        # same-chunk tail + (start-in-chunk) initial-state term
        h_ce = h_ins[ce]
        span = (start_t < ce * L) & is_real
        cpl = jnp.where(ce > 0, cums[jnp.maximum(ce * L - 1, 0)], 0.0)
        carry_part = (
            h_ce
            * jnp.exp(cums[end_t] - cpl)[:, None, None]
            * jnp.where(span, 1.0, 0.0)
        )
        init_here = (start_t >= ce * L) & is_real
        init_part = (
            hi
            * jnp.exp(cumseg[end_t])[:, None, None]
            * jnp.where(init_here, 1.0, 0.0)
        )
        cums_e = jax.lax.dynamic_slice_in_dim(cumseg, ce * L, L, 0)
        segs_e = jax.lax.dynamic_slice_in_dim(seg_start, ce * L, L, 0)
        x_e = jax.lax.dynamic_slice_in_dim(xg, ce * L, L, 0)
        b_e = jax.lax.dynamic_slice_in_dim(bg, ce * L, L, 0)
        wdt_e = jax.lax.dynamic_slice_in_dim(wdt, ce * L, L, 0)
        tok = ce * L + jnp.arange(L)
        mask = (segs_e == start_t) & (tok <= end_t) & is_real
        wt = jnp.exp(
            jnp.where(mask[:, None], cumseg[end_t][None] - cums_e, NEG)
        )
        tail = jnp.einsum(
            "lgr,lgrd,lgs->grds",
            wt.reshape(L, g, rep) * wdt_e,
            x_e,
            b_e,
            preferred_element_type=jnp.float32,
        ).reshape(nh, dh, ds)
        return y_init, rows, carry_part + init_part + tail

    y_inits, rows, h_finals = jax.vmap(per_seq)(s_idx, e_idx, h_init, real)
    y_pad = jnp.zeros((T + 1, nh, dh), jnp.float32)
    y_pad = y_pad.at[rows.reshape(-1)].add(
        y_inits.reshape(-1, nh, dh)
    )
    y = y + y_pad[:T]
    y = y + d_skip.astype(jnp.float32)[None, :, None] * x.astype(jnp.float32)
    ssm_pool = ssm_pool.at[s_slot].set(h_finals.astype(ssm_pool.dtype))
    return y[:T0], conv_pool, ssm_pool
