"""Gated DeltaNet linear attention (Qwen3-Next / FLA family).

Parity with reference `srt/layers/attention/hybrid_linear_attn_backend.py`
(+ the FLA `chunk_gated_delta_rule` / `fused_recurrent` kernels) and HF
`transformers/models/qwen3_next/modeling_qwen3_next.py:442,522`.

TPU-native design: per-request recurrent state lives in SLOT-indexed pools
(the "MambaPool" analogue of reference `memory_pool.py:195`) that ride the
jitted step exactly like paged KV — donated, updated in place:

  conv:  [slots+1, conv_dim, k-1]  f32   (last k-1 pre-conv inputs)
  rec:   [slots+1, num_v_heads, dk, dv]  f32  (delta-rule state)

Row `slots` (the sentinel) absorbs padding writes. State resets when a
token arrives at position 0 — (re)prefill from scratch — so retraction and
jump-forward re-prefill are correct with no extra bookkeeping.

- decode: one fully parallel recurrent step over the batch (each row owns
  a distinct slot, gather/scatter is race-free).
- extend: a `lax.scan` over the packed ragged token stream, carrying the
  pools (correct for chunked prefill and mixed decode rows). This is the
  sequential reference path; a chunked-parallel Pallas kernel is the perf
  follow-up (the math of HF `torch_chunk_gated_delta_rule`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def l2norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    return x * jax.lax.rsqrt((x * x).sum(-1, keepdims=True) + eps)


def gdn_gates(a: jax.Array, b: jax.Array, a_log: jax.Array,
              dt_bias: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """g (log decay, <=0) and beta from the ba projection (f32).
    a, b: [..., num_v_heads]."""
    g = -jnp.exp(a_log.astype(jnp.float32)) * jax.nn.softplus(
        a.astype(jnp.float32) + dt_bias.astype(jnp.float32)
    )
    beta = jax.nn.sigmoid(b.astype(jnp.float32))
    return g, beta


def gdn_recurrent_step(
    rec: jax.Array,  # [..., nh, dk, dv] f32
    q: jax.Array,  # [..., nh, dk]
    k: jax.Array,  # [..., nh, dk]
    v: jax.Array,  # [..., nh, dv]
    g: jax.Array,  # [..., nh] f32 log decay
    beta: jax.Array,  # [..., nh] f32
) -> Tuple[jax.Array, jax.Array]:
    """One token of the gated delta rule (HF
    `torch_recurrent_gated_delta_rule:522`). Returns (out [..., nh, dv],
    new rec). q/k are L2-normalized and q is scaled inside."""
    q = l2norm(q.astype(jnp.float32))
    k = l2norm(k.astype(jnp.float32))
    v = v.astype(jnp.float32)
    q = q * (q.shape[-1] ** -0.5)
    rec = rec * jnp.exp(g)[..., None, None]
    kv_mem = (rec * k[..., None]).sum(-2)  # [..., nh, dv]
    delta = (v - kv_mem) * beta[..., None]
    rec = rec + k[..., None] * delta[..., None, :]
    out = (rec * q[..., None]).sum(-2)
    return out, rec


def causal_conv_step(
    window: jax.Array,  # [..., conv_dim, k] (k-1 carried + current input)
    w: jax.Array,  # [conv_dim, k] depthwise kernel
) -> jax.Array:
    """Depthwise causal conv output for the newest position + SiLU."""
    y = (window * w).sum(-1)
    return jax.nn.silu(y)


def gdn_decode(
    conv_pool: jax.Array,  # [S+1, conv_dim, k-1] f32
    rec_pool: jax.Array,  # [S+1, nh, dk, dv] f32
    mixed_qkv: jax.Array,  # [B, conv_dim] pre-conv q|k|v stream
    a: jax.Array,  # [B, nh]
    b: jax.Array,  # [B, nh]
    slots: jax.Array,  # [B] i32 (padding -> S)
    geom: tuple,  # (nk, dk, nh, dv)
    conv_w: jax.Array,  # [conv_dim, k]
    a_log: jax.Array,
    dt_bias: jax.Array,
):
    """Parallel single-step decode across the batch. Returns
    (core_out [B, nh, dv], conv_pool', rec_pool')."""
    win = jnp.concatenate(
        [conv_pool[slots], mixed_qkv.astype(jnp.float32)[..., None]], axis=-1
    )  # [B, conv_dim, k]
    conv_out = causal_conv_step(win, conv_w.astype(jnp.float32))
    conv_pool = conv_pool.at[slots].set(win[..., 1:])
    q, k, v = _split_qkv(conv_out, geom)
    g, beta = gdn_gates(a, b, a_log, dt_bias)
    rec = rec_pool[slots]
    out, rec = gdn_recurrent_step(rec, q, k, v, g, beta)
    rec_pool = rec_pool.at[slots].set(rec)
    return out, conv_pool, rec_pool


def gdn_extend(
    conv_pool: jax.Array,
    rec_pool: jax.Array,
    mixed_qkv: jax.Array,  # [T, conv_dim]
    a: jax.Array,  # [T, nh]
    b: jax.Array,  # [T, nh]
    slots: jax.Array,  # [T] i32 per-token slot (padding -> S)
    positions: jax.Array,  # [T] i32 (0 -> reset state)
    geom: tuple,  # (nk, dk, nh, dv)
    conv_w: jax.Array,
    a_log: jax.Array,
    dt_bias: jax.Array,
):
    """Sequential scan over the packed ragged stream (tokens of one
    sequence are contiguous; the pools carry state between tokens AND
    between chunked-prefill rounds). Returns (out [T, nh, dv], pools)."""
    g_all, beta_all = gdn_gates(a, b, a_log, dt_bias)
    conv_w32 = conv_w.astype(jnp.float32)
    x32 = mixed_qkv.astype(jnp.float32)

    def step(carry, xs):
        conv_pool, rec_pool = carry
        x_t, g_t, beta_t, slot, pos = xs
        fresh = pos == 0
        cwin = jnp.where(fresh, 0.0, conv_pool[slot])
        win = jnp.concatenate([cwin, x_t[:, None]], axis=-1)
        conv_out = causal_conv_step(win, conv_w32)
        conv_pool = conv_pool.at[slot].set(win[:, 1:])
        q, k, v = _split_qkv(conv_out, geom)
        rec = jnp.where(fresh, 0.0, rec_pool[slot])
        out, rec = gdn_recurrent_step(rec, q, k, v, g_t, beta_t)
        rec_pool = rec_pool.at[slot].set(rec)
        return (conv_pool, rec_pool), out

    (conv_pool, rec_pool), outs = jax.lax.scan(
        step,
        (conv_pool, rec_pool),
        (x32, g_all, beta_all, slots, positions),
    )
    return outs, conv_pool, rec_pool


def _split_qkv(conv_out: jax.Array, geom: tuple):
    """Split the post-conv stream [..., 2*key_dim+value_dim] into per-v-head
    q, k, v; q/k k-heads are repeat-interleaved up to num_v_heads
    (HF `repeat_interleave(nv//nk)`)."""
    nk, dk, nh, dv = geom
    key_dim = nk * dk
    q = conv_out[..., :key_dim].reshape(conv_out.shape[:-1] + (nk, dk))
    k = conv_out[..., key_dim : 2 * key_dim].reshape(
        conv_out.shape[:-1] + (nk, dk)
    )
    v = conv_out[..., 2 * key_dim :].reshape(conv_out.shape[:-1] + (nh, dv))
    rep = nh // nk
    if rep > 1:
        q = jnp.repeat(q, rep, axis=-2)
        k = jnp.repeat(k, rep, axis=-2)
    return q, k, v


def gated_rms_norm(x: jax.Array, gate: jax.Array, w: jax.Array,
                   eps: float) -> jax.Array:
    """HF Qwen3NextRMSNormGated: norm-then-gate (silu on the z branch)."""
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt((xf * xf).mean(-1, keepdims=True) + eps)
    out = w.astype(jnp.float32) * xf
    return (out * jax.nn.silu(gate.astype(jnp.float32))).astype(x.dtype)


# --------------------------------------------------------------------------
# Mamba2 (SSD) mixer — reference `srt/layers/attention/mamba/` +
# `sgl-kernel/csrc/mamba/causal_conv1d.cu` (K9); math parity with HF
# `transformers/models/mamba2/modeling_mamba2.py torch_forward`.
# State pools (MambaPool analogue, reference `memory_pool.py:195`):
#   conv: [slots+1, conv_dim, k-1] f32     (conv_dim = d_inner + 2*g*d_state)
#   ssm:  [slots+1, nheads, head_dim, d_state] f32
# --------------------------------------------------------------------------


def mamba_gated_rms_norm(x: jax.Array, gate: jax.Array, w: jax.Array,
                         eps: float) -> jax.Array:
    """HF MambaRMSNormGated: GATE-then-norm (x * silu(z), then RMSNorm) —
    the opposite order of Qwen3-Next's gated norm."""
    xf = x.astype(jnp.float32) * jax.nn.silu(gate.astype(jnp.float32))
    xf = xf * jax.lax.rsqrt((xf * xf).mean(-1, keepdims=True) + eps)
    return (w.astype(jnp.float32) * xf).astype(x.dtype)


def mamba2_rates(dt: jax.Array, dt_bias: jax.Array, a_log: jax.Array,
                 limit: Tuple[float, float]) -> Tuple[jax.Array, jax.Array]:
    """(decay, dt_eff) per head: dt = clamp(softplus(dt + bias)),
    decay = exp(dt * -exp(A_log))."""
    dt = jax.nn.softplus(dt.astype(jnp.float32) + dt_bias.astype(jnp.float32))
    dt = jnp.clip(dt, limit[0], limit[1])
    decay = jnp.exp(dt * -jnp.exp(a_log.astype(jnp.float32)))
    return decay, dt


def mamba2_step(
    ssm: jax.Array,  # [..., nh, dh, ds] f32
    x: jax.Array,  # [..., nh, dh]
    b: jax.Array,  # [..., g, ds]
    c: jax.Array,  # [..., g, ds]
    dt: jax.Array,  # [..., nh] f32 (post-softplus)
    decay: jax.Array,  # [..., nh] f32
    d_skip: jax.Array,  # [nh] f32
) -> Tuple[jax.Array, jax.Array]:
    """One SSD token: h = decay*h + dt * x outer B; y = h . C + D*x."""
    nh = x.shape[-2]
    g = b.shape[-2]
    rep = nh // g
    x = x.astype(jnp.float32)
    bh = jnp.repeat(b.astype(jnp.float32), rep, axis=-2)  # [..., nh, ds]
    ch = jnp.repeat(c.astype(jnp.float32), rep, axis=-2)
    ssm = ssm * decay[..., None, None] + (
        (dt[..., None] * x)[..., None] * bh[..., None, :]
    )
    y = (ssm * ch[..., None, :]).sum(-1) + d_skip[:, None] * x
    return y, ssm


def _split_xbc(conv_out: jax.Array, geom: tuple):
    """Split post-conv stream [..., d_inner + 2*g*ds] -> x, B, C."""
    nh, dh, g, ds = geom
    d_inner = nh * dh
    x = conv_out[..., :d_inner].reshape(conv_out.shape[:-1] + (nh, dh))
    b = conv_out[..., d_inner : d_inner + g * ds].reshape(
        conv_out.shape[:-1] + (g, ds)
    )
    c = conv_out[..., d_inner + g * ds :].reshape(
        conv_out.shape[:-1] + (g, ds)
    )
    return x, b, c


def mamba2_decode(
    conv_pool: jax.Array,  # [S+1, conv_dim, k-1] f32
    ssm_pool: jax.Array,  # [S+1, nh, dh, ds] f32
    xbc: jax.Array,  # [B, conv_dim] pre-conv x|B|C stream
    dt: jax.Array,  # [B, nh]
    slots: jax.Array,  # [B] i32 (padding -> S)
    geom: tuple,  # (nh, dh, g, ds)
    conv_w: jax.Array,  # [conv_dim, k]
    conv_b,  # [conv_dim] or None
    a_log: jax.Array,  # [nh]
    dt_bias: jax.Array,  # [nh]
    d_skip: jax.Array,  # [nh]
    time_limit: Tuple[float, float] = (0.0, float("inf")),
):
    """Parallel single-step decode. Returns (y [B, nh, dh], pools)."""
    win = jnp.concatenate(
        [conv_pool[slots], xbc.astype(jnp.float32)[..., None]], axis=-1
    )
    conv_out = (win * conv_w.astype(jnp.float32)).sum(-1)
    if conv_b is not None:
        conv_out = conv_out + conv_b.astype(jnp.float32)
    conv_out = jax.nn.silu(conv_out)
    conv_pool = conv_pool.at[slots].set(win[..., 1:])
    x, b, c = _split_xbc(conv_out, geom)
    decay, dt_eff = mamba2_rates(dt, dt_bias, a_log, time_limit)
    ssm = ssm_pool[slots]
    y, ssm = mamba2_step(ssm, x, b, c, dt_eff, decay, d_skip.astype(jnp.float32))
    ssm_pool = ssm_pool.at[slots].set(ssm)
    return y, conv_pool, ssm_pool


def mamba2_extend(
    conv_pool: jax.Array,
    ssm_pool: jax.Array,
    xbc: jax.Array,  # [T, conv_dim]
    dt: jax.Array,  # [T, nh]
    slots: jax.Array,  # [T]
    positions: jax.Array,  # [T] (0 -> reset state)
    geom: tuple,
    conv_w: jax.Array,
    conv_b,
    a_log: jax.Array,
    dt_bias: jax.Array,
    d_skip: jax.Array,
    time_limit: Tuple[float, float] = (0.0, float("inf")),
):
    """Sequential scan over the packed ragged stream (same contract as
    `gdn_extend`; a chunked-parallel SSD Pallas kernel is the perf
    follow-up — HF `segment_sum` chunk path)."""
    decay_all, dt_all = mamba2_rates(dt, dt_bias, a_log, time_limit)
    conv_w32 = conv_w.astype(jnp.float32)
    conv_b32 = None if conv_b is None else conv_b.astype(jnp.float32)
    d32 = d_skip.astype(jnp.float32)
    x32 = xbc.astype(jnp.float32)

    def step(carry, xs):
        conv_pool, ssm_pool = carry
        x_t, dt_t, decay_t, slot, pos = xs
        fresh = pos == 0
        cwin = jnp.where(fresh, 0.0, conv_pool[slot])
        win = jnp.concatenate([cwin, x_t[:, None]], axis=-1)
        conv_out = (win * conv_w32).sum(-1)
        if conv_b32 is not None:
            conv_out = conv_out + conv_b32
        conv_out = jax.nn.silu(conv_out)
        conv_pool = conv_pool.at[slot].set(win[:, 1:])
        x, b, c = _split_xbc(conv_out, geom)
        ssm = jnp.where(fresh, 0.0, ssm_pool[slot])
        y, ssm = mamba2_step(ssm, x, b, c, dt_t, decay_t, d32)
        ssm_pool = ssm_pool.at[slot].set(ssm)
        return (conv_pool, ssm_pool), y

    (conv_pool, ssm_pool), outs = jax.lax.scan(
        step,
        (conv_pool, ssm_pool),
        (x32, dt_all, decay_all, slots, positions),
    )
    return outs, conv_pool, ssm_pool
