"""Expert parallelism: all-to-all token dispatch over a mesh axis.

Parity with reference `layers/moe/token_dispatcher/` (DeepEP-style EP
dispatch) redesigned for XLA: instead of NCCL point-to-point with dynamic
counts, tokens move through `jax.lax.all_to_all` inside a `shard_map`
with a STATIC per-(src,dst) capacity — the GShard dense-dispatch recipe
the scaling book recommends for TPU, where fixed shapes let XLA overlap
the all-to-all with the grouped matmuls.

Layout: tokens are sharded over the EP axis (T_local per rank), experts
are sharded over the same axis (E_local = E/ep per rank; the reference
also runs EP over the TP group by default). Per rank:

1. route all local tokens (top-k over the full expert table),
2. bucket (token, pick) pairs by destination rank, capacity C each —
   overflow beyond C drops the PICK (not the token; its other picks
   survive), the standard capacity-factor trade,
3. all_to_all the [ep, C, H] send buffer,
4. run the local experts via sort-by-expert + `jax.lax.ragged_dot`
   (slot 0 of each rank's table is never dropped-to; invalid rows carry
   weight 0),
5. all_to_all back and combine weighted partials.

`capacity_factor` scales C = ceil(T_local * k / ep * factor); factor >=
ep makes dispatch lossless (tests use that to assert exact agreement
with the single-device `fused_moe`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sglang_tpu.layers.activation import silu_and_mul
from sglang_tpu.layers.moe import topk_routing
from sglang_tpu.utils import cdiv


def _dispatch_indices(flat_expert, mine_rank, ep, capacity):
    """Slot assignment: for each (token,pick) its position in the send
    buffer of its destination rank; -1 when over capacity."""
    # rank-major stable order: picks going to the same rank keep order
    order = jnp.argsort(mine_rank, stable=True)
    ranked = mine_rank[order]
    # position within the destination rank's bucket
    pos_in_rank = jnp.arange(ranked.shape[0]) - jnp.searchsorted(
        ranked, ranked, side="left"
    )
    slot_sorted = jnp.where(pos_in_rank < capacity, pos_in_rank, -1)
    slot = jnp.zeros_like(slot_sorted).at[order].set(slot_sorted)
    return slot  # [T*k] in-bucket slot or -1


def ep_moe_local(
    x,  # [T_local, H]
    router,  # [H, E] replicated
    w1,  # [E_local, H, 2M] this rank's experts
    w2,  # [E_local, M, H]
    *,
    axis: str,
    top_k: int,
    capacity: int,
    norm_topk_prob: bool = True,
    scoring_func: str = "softmax",
    correction_bias=None,
    routed_scaling_factor: float = 1.0,
):
    """Per-rank body (call inside shard_map over `axis`)."""
    ep = jax.lax.psum(1, axis)
    t, h = x.shape
    e_local = w1.shape[0]

    logits = jnp.dot(
        x.astype(jnp.float32), router, preferred_element_type=jnp.float32
    )
    weights, ids = topk_routing(
        logits,
        top_k,
        norm_topk_prob,
        scoring_func=scoring_func,
        correction_bias=correction_bias,
        routed_scaling_factor=routed_scaling_factor,
    )
    flat_expert = ids.reshape(-1)  # [T*k]
    flat_w = weights.reshape(-1)
    dest = flat_expert // e_local  # destination rank per pick
    slot = _dispatch_indices(flat_expert, dest, ep, capacity)
    valid = slot >= 0

    # scatter picks into the [ep, C] send buffers
    send_x = jnp.zeros((ep, capacity, h), x.dtype)
    send_meta = jnp.full((ep, capacity, 2), -1.0, jnp.float32)  # (local_eid, w)
    tok = jnp.arange(t * top_k) // top_k
    sd = jnp.where(valid, dest, 0)
    ss = jnp.where(valid, slot, 0)
    send_x = send_x.at[sd, ss].set(
        jnp.where(valid[:, None], x[tok], 0), mode="drop"
    )
    meta = jnp.stack(
        [
            jnp.where(valid, (flat_expert % e_local).astype(jnp.float32), -1.0),
            jnp.where(valid, flat_w, 0.0),
        ],
        axis=-1,
    )
    send_meta = send_meta.at[sd, ss].set(
        jnp.where(valid[:, None], meta, -1.0), mode="drop"
    )

    # exchange: recv[r] = what rank r sent to me
    recv_x = jax.lax.all_to_all(send_x, axis, 0, 0, tiled=False)
    recv_meta = jax.lax.all_to_all(send_meta, axis, 0, 0, tiled=False)
    rx = recv_x.reshape(ep * capacity, h)
    r_eid = recv_meta.reshape(-1, 2)[:, 0].astype(jnp.int32)
    r_w = recv_meta.reshape(-1, 2)[:, 1]
    r_valid = r_eid >= 0

    # local grouped matmul (invalid rows -> expert 0 with weight 0)
    eid = jnp.where(r_valid, r_eid, 0)
    order = jnp.argsort(eid)
    xs = rx[order]
    group_sizes = jnp.bincount(eid, length=e_local)
    h1 = jax.lax.ragged_dot(
        xs, w1, group_sizes, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    h2 = jax.lax.ragged_dot(
        silu_and_mul(h1), w2, group_sizes, preferred_element_type=jnp.float32
    )
    y = jnp.zeros((ep * capacity, h), jnp.float32).at[order].set(h2)
    y = y * r_w[:, None]

    # send results home and combine
    back = jax.lax.all_to_all(
        y.reshape(ep, capacity, h), axis, 0, 0, tiled=False
    ).reshape(ep, capacity, h)
    out = jnp.zeros((t, h), jnp.float32)
    contrib = back[sd, ss] * valid[:, None]
    out = out.at[tok].add(contrib)
    return out.astype(x.dtype)


def make_ep_moe(
    mesh: Mesh,
    axis: str = "model",
    *,
    top_k: int,
    capacity_factor: float = 2.0,
    lossless: bool = False,
    **routing_kw,
):
    """Build a jittable EP MoE: tokens sharded over `axis`, experts
    sharded over `axis`, router replicated. `lossless=True` sizes the
    buckets for the worst case (capacity = T_local * k) — exact but more
    traffic; otherwise capacity_factor bounds them (overflow picks drop)."""
    ep = mesh.shape[axis]

    def fn(x, router, w1, w2, correction_bias=None):
        t_local = x.shape[0] // ep
        if lossless:
            capacity = t_local * top_k
        else:
            capacity = cdiv(int(t_local * top_k * capacity_factor), ep)

        body = functools.partial(
            ep_moe_local,
            axis=axis,
            top_k=top_k,
            capacity=capacity,
            **routing_kw,
        )
        if correction_bias is None:
            inner = lambda x, r, a, b: body(x, r, a, b)
            args = (x, router, w1, w2)
            specs = (P(axis, None), P(None, None), P(axis, None, None), P(axis, None, None))
        else:
            inner = lambda x, r, a, b, cb: body(x, r, a, b, correction_bias=cb)
            args = (x, router, w1, w2, correction_bias)
            specs = (
                P(axis, None), P(None, None), P(axis, None, None),
                P(axis, None, None), P(None),
            )
        return jax.shard_map(
            inner, mesh=mesh, in_specs=specs, out_specs=P(axis, None),
            check_vma=False,
        )(*args)

    return fn
