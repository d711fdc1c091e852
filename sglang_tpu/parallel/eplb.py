"""EPLB: expert-parallel load balancing.

Parity with reference `srt/eplb/` (expert_distribution recording +
expert_location computation + rebalancing): observed per-expert token
loads drive a placement of experts onto EP ranks, with HOT experts
REPLICATED into spare slots so their traffic splits across ranks
(the reference's redundant-experts scheme).

TPU shape: placement is a static [ep, slots] table baked into the
dispatch function — changing it is a recompile (cheap, and rebalancing
is a minutes-scale event), not a runtime indirection. Dispatch stays
the same static-capacity all-to-all as `parallel/ep.py`; the only
difference is the expert->(rank, slot) map and a replica-choice hash
for multi-replica experts.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sglang_tpu.layers.activation import silu_and_mul
from sglang_tpu.layers.moe import topk_routing
from sglang_tpu.utils import cdiv


class ExpertLoadRecorder:
    """Host-side accumulator of per-expert routed-token counts (reference
    expert_distribution recorder)."""

    def __init__(self, num_experts: int):
        self.counts = np.zeros(num_experts, dtype=np.int64)

    def record(self, expert_ids: np.ndarray) -> None:
        np.add.at(self.counts, expert_ids.reshape(-1), 1)

    def reset(self) -> None:
        self.counts[:] = 0


def compute_placement(
    load: np.ndarray, ep: int, slots_per_rank: int
) -> np.ndarray:
    """Greedy balanced placement [ep, slots_per_rank] of expert ids.

    Every expert appears at least once; spare slots replicate the hottest
    experts (each replica then carries load/replicas). Greedy: place
    replicas one at a time, heaviest remaining share first, onto the
    least-loaded rank without a copy of that expert."""
    e = len(load)
    total_slots = ep * slots_per_rank
    assert total_slots >= e, "need at least one slot per expert"
    load = np.maximum(np.asarray(load, dtype=np.float64), 1e-9)

    # replica counts: every expert 1, spares to the heaviest per-replica
    # (capped at ep — a rank never hosts two copies of one expert)
    replicas = np.ones(e, dtype=np.int64)
    for _ in range(total_slots - e):
        share_now = np.where(replicas < ep, load / replicas, -np.inf)
        if not np.isfinite(share_now).any():
            break
        replicas[np.argmax(share_now)] += 1
    share = load / replicas

    # heaviest shares first onto least-loaded ranks (no same-expert dup
    # per rank so replicas actually split traffic across ranks)
    order = np.argsort(-share, kind="stable")
    entries: List[int] = []
    for x in order:
        entries += [x] * int(replicas[x])
    rank_load = np.zeros(ep)
    rank_slots: List[List[int]] = [[] for _ in range(ep)]
    for x in entries:
        cands = sorted(
            (r for r in range(ep) if len(rank_slots[r]) < slots_per_rank),
            key=lambda r: (x in rank_slots[r], rank_load[r]),
        )
        r = cands[0]
        rank_slots[r].append(x)
        rank_load[r] += share[x]
    return np.asarray(rank_slots, dtype=np.int32)


def placement_stats(load: np.ndarray, placement: np.ndarray) -> Dict[str, float]:
    ep, slots = placement.shape
    load = np.asarray(load, dtype=np.float64)
    reps = np.zeros(len(load))
    for r in range(ep):
        for x in placement[r]:
            reps[x] += 1
    rank_load = np.zeros(ep)
    for r in range(ep):
        for x in placement[r]:
            rank_load[r] += load[x] / reps[x]
    return {
        "max_rank_load": float(rank_load.max()),
        "mean_rank_load": float(rank_load.mean()),
        "imbalance": float(rank_load.max() / max(rank_load.mean(), 1e-9)),
    }


def build_placed_weights(
    w1: np.ndarray, w2: np.ndarray, placement: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Materialize per-rank expert weights [ep*slots, ...] following the
    placement (replicated experts appear on several ranks)."""
    flat = placement.reshape(-1)
    return w1[flat], w2[flat]


def make_eplb_ep_moe(
    mesh: Mesh,
    placement: np.ndarray,  # [ep, slots] expert ids
    axis: str = "model",
    *,
    top_k: int,
    capacity_factor: float = 2.0,
    lossless: bool = False,
    **routing_kw,
):
    """EP MoE dispatch with a load-balanced (possibly replicated) expert
    placement. Weights must be pre-placed with `build_placed_weights`
    (sharded P(axis) on the leading [ep*slots] dim)."""
    ep, slots = placement.shape
    e_total = int(placement.max()) + 1
    # expert -> replica table [E, max_r] of (rank, slot), padded by repeat
    max_r = max(
        sum(1 for r in range(ep) for sl in range(slots) if placement[r, sl] == x)
        for x in range(e_total)
    )
    rep_rank = np.zeros((e_total, max_r), dtype=np.int32)
    rep_slot = np.zeros((e_total, max_r), dtype=np.int32)
    rep_n = np.zeros(e_total, dtype=np.int32)
    for r in range(ep):
        for sl in range(slots):
            x = placement[r, sl]
            rep_rank[x, rep_n[x]] = r
            rep_slot[x, rep_n[x]] = sl
            rep_n[x] += 1
    for x in range(e_total):  # pad with the first replica
        for j in range(rep_n[x], max_r):
            rep_rank[x, j] = rep_rank[x, 0]
            rep_slot[x, j] = rep_slot[x, 0]
    rep_rank_d = jnp.asarray(rep_rank)
    rep_slot_d = jnp.asarray(rep_slot)
    rep_n_d = jnp.asarray(rep_n)

    from sglang_tpu.parallel.ep import _dispatch_indices

    def local(x, router, w1, w2, *, capacity):
        t, h = x.shape
        logits = jnp.dot(
            x.astype(jnp.float32), router, preferred_element_type=jnp.float32
        )
        weights, ids = topk_routing(logits, top_k, **routing_kw)
        flat_expert = ids.reshape(-1)
        flat_w = weights.reshape(-1)
        # replica choice: spread by (token, pick) index hash
        pick_idx = jnp.arange(t * top_k, dtype=jnp.int32)
        rep = pick_idx % jnp.maximum(rep_n_d[flat_expert], 1)
        dest = rep_rank_d[flat_expert, rep]
        local_slot = rep_slot_d[flat_expert, rep]
        slot_pos = _dispatch_indices(flat_expert, dest, ep, capacity)
        valid = slot_pos >= 0
        tok = pick_idx // top_k
        sd = jnp.where(valid, dest, 0)
        ss = jnp.where(valid, slot_pos, 0)
        send_x = jnp.zeros((ep, capacity, h), x.dtype).at[sd, ss].set(
            jnp.where(valid[:, None], x[tok], 0), mode="drop"
        )
        meta = jnp.stack(
            [
                jnp.where(valid, local_slot.astype(jnp.float32), -1.0),
                jnp.where(valid, flat_w, 0.0),
            ],
            axis=-1,
        )
        send_meta = (
            jnp.full((ep, capacity, 2), -1.0, jnp.float32)
            .at[sd, ss]
            .set(jnp.where(valid[:, None], meta, -1.0), mode="drop")
        )
        recv_x = jax.lax.all_to_all(send_x, axis, 0, 0)
        recv_meta = jax.lax.all_to_all(send_meta, axis, 0, 0)
        rx = recv_x.reshape(ep * capacity, h)
        r_slot = recv_meta.reshape(-1, 2)[:, 0].astype(jnp.int32)
        r_w = recv_meta.reshape(-1, 2)[:, 1]
        eid = jnp.where(r_slot >= 0, r_slot, 0)
        order = jnp.argsort(eid)
        xs = rx[order]
        group_sizes = jnp.bincount(eid, length=slots)
        h1 = jax.lax.ragged_dot(
            xs, w1, group_sizes, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        h2 = jax.lax.ragged_dot(
            silu_and_mul(h1), w2, group_sizes, preferred_element_type=jnp.float32
        )
        y = jnp.zeros((ep * capacity, h), jnp.float32).at[order].set(h2)
        y = y * r_w[:, None]
        back = jax.lax.all_to_all(
            y.reshape(ep, capacity, h), axis, 0, 0
        ).reshape(ep, capacity, h)
        out = jnp.zeros((t, h), jnp.float32).at[tok].add(
            back[sd, ss] * valid[:, None]
        )
        return out.astype(x.dtype)

    def fn(x, router, w1_placed, w2_placed):
        t_local = x.shape[0] // ep
        capacity = (
            t_local * top_k
            if lossless
            else cdiv(int(t_local * top_k * capacity_factor), ep)
        )
        body = functools.partial(local, capacity=capacity)
        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(
                P(axis, None),
                P(None, None),
                P(axis, None, None),
                P(axis, None, None),
            ),
            out_specs=P(axis, None),
            check_vma=False,
        )(x, router, w1_placed, w2_placed)

    return fn
