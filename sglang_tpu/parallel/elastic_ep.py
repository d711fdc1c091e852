"""Elastic EP — fault-tolerant expert parallelism (P9).

Parity with reference `srt/elastic_ep/elastic_ep.py` + expert backup
manager (`elastic_ep/expert_backup_manager.py`) + active-rank masks
(`parallel_state.py:284-302`) + rank recovery (`model_runner.py:1690`).

TPU redesign: XLA cannot drop a chip from a compiled mesh, so elasticity
lives ONE LEVEL UP, in the routing function — exactly like the reference's
mooncake group, which keeps the process group intact and masks ranks.
Every rank hosts its primary experts AND a full backup replica of the
next rank's experts (`backup_placement`). Routing takes a traced
`active_ranks` mask: picks whose primary rank is masked re-route to the
backup replica. Because backups are exact weight copies and dispatch can
run lossless, deactivating a single rank leaves MoE output EXACTLY
unchanged — the testable invariant. Recovery = flipping the mask back
(weights never moved).

Cost: 2x expert weight memory (the reference's backup manager makes the
same trade; EPLB-style partial replication of only-hot experts is the
memory-lean variant in `parallel/eplb.py`).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sglang_tpu.layers.activation import silu_and_mul
from sglang_tpu.layers.moe import topk_routing
from sglang_tpu.parallel.ep import _dispatch_indices
from sglang_tpu.parallel.eplb import build_placed_weights
from sglang_tpu.utils import cdiv


def backup_placement(num_experts: int, ep: int) -> np.ndarray:
    """[ep, 2*E/ep] expert ids: rank r hosts its E/ep primaries followed by
    rank (r+1)%ep's primaries as backups."""
    assert num_experts % ep == 0
    e_local = num_experts // ep
    place = np.zeros((ep, 2 * e_local), dtype=np.int32)
    for r in range(ep):
        place[r, :e_local] = np.arange(r * e_local, (r + 1) * e_local)
        nxt = (r + 1) % ep
        place[r, e_local:] = np.arange(nxt * e_local, (nxt + 1) * e_local)
    return place


class ExpertBackupManager:
    """Host-side elastic-EP state: placement, placed weights, active mask.
    `deactivate`/`recover` flip ranks; the mask ships to the jitted MoE as
    an ordinary device argument (no recompilation)."""

    def __init__(self, num_experts: int, ep: int):
        self.ep = ep
        self.num_experts = num_experts
        self.placement = backup_placement(num_experts, ep)
        self.active = np.ones(ep, dtype=bool)

    def place_weights(self, w1: np.ndarray, w2: np.ndarray):
        return build_placed_weights(w1, w2, self.placement)

    def deactivate(self, rank: int) -> None:
        self.active[rank] = False

    def recover(self, rank: int) -> None:
        """Reference `model_runner.py:1690 maybe_recover_ep_ranks`: the
        rank rejoins; backups were never stale (weights are static in
        inference), so recovery is just the mask flip."""
        self.active[rank] = True

    def active_mask(self) -> np.ndarray:
        return self.active.copy()


def make_elastic_ep_moe(
    mesh: Mesh,
    num_experts: int,
    ep: int,
    axis: str = "model",
    *,
    top_k: int,
    capacity_factor: float = 2.0,
    lossless: bool = False,
    **routing_kw,
):
    """Returns fn(x, router, w1_placed, w2_placed, active_mask) — EP MoE
    where picks re-route to backup replicas of experts on masked ranks."""
    e_local = num_experts // ep
    slots = 2 * e_local
    eids = np.arange(num_experts)
    prim_rank = (eids // e_local).astype(np.int32)
    prim_slot = (eids % e_local).astype(np.int32)
    back_rank = ((prim_rank - 1) % ep).astype(np.int32)
    back_slot = (prim_slot + e_local).astype(np.int32)
    prim_rank_d = jnp.asarray(prim_rank)
    prim_slot_d = jnp.asarray(prim_slot)
    back_rank_d = jnp.asarray(back_rank)
    back_slot_d = jnp.asarray(back_slot)

    def local(x, router, w1, w2, active, *, capacity):
        t, h = x.shape
        logits = jnp.dot(
            x.astype(jnp.float32), router, preferred_element_type=jnp.float32
        )
        weights, ids = topk_routing(logits, top_k, **routing_kw)
        flat_expert = ids.reshape(-1)
        flat_w = weights.reshape(-1)
        use_prim = active[prim_rank_d[flat_expert]]
        dest = jnp.where(
            use_prim, prim_rank_d[flat_expert], back_rank_d[flat_expert]
        )
        local_slot = jnp.where(
            use_prim, prim_slot_d[flat_expert], back_slot_d[flat_expert]
        )
        # a pick whose primary AND backup ranks are both down is dropped
        alive = active[dest]
        flat_w = jnp.where(alive, flat_w, 0.0)
        pick_idx = jnp.arange(t * top_k, dtype=jnp.int32)
        slot_pos = _dispatch_indices(flat_expert, dest, ep, capacity)
        valid = (slot_pos >= 0) & alive
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

    def fn(x, router, w1_placed, w2_placed, active_mask):
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
                P(None),
            ),
            out_specs=P(axis, None),
            check_vma=False,
        )(x, router, w1_placed, w2_placed, active_mask)

    return fn
