"""Fused mixture-of-experts layer (TPU-native).

Parity with reference `layers/moe/` (FusedMoE
`fused_moe_triton/layer.py:142`, `topk.py:305 TopK`, EP token dispatchers).
TPU design: token dispatch is a sort-by-expert + `jax.lax.ragged_dot`
grouped matmul — exact (no capacity-factor token dropping like GShard-style
dense dispatch) and MXU-native; XLA lowers ragged_dot to per-group tiled
matmuls. Expert weights carry a GSPMD sharding over the "model" axis on
the FFN dimension (MoE-TP; reference `moe_tp` group) so the same mesh
serves dense TP and MoE without re-sharding activations; all-to-all EP over
a dedicated mesh axis is the scale-out upgrade path (`shard_map` +
`ppermute`, reference DeepEP analogue).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.activation import silu_and_mul


def moe_shapes(
    hidden: int, moe_inter: int, num_experts: int, dtype
) -> Dict[str, jax.ShapeDtypeStruct]:
    return {
        "router": jax.ShapeDtypeStruct((hidden, num_experts), jnp.float32),
        "w1": jax.ShapeDtypeStruct((num_experts, hidden, 2 * moe_inter), dtype),
        "w2": jax.ShapeDtypeStruct((num_experts, moe_inter, hidden), dtype),
    }


def moe_specs(ep: bool = False) -> Dict[str, P]:
    if ep:
        # EP: experts sharded over the axis, FFN dims whole per expert
        # (reference ep_moe / token_dispatcher layout)
        return {
            "router": P(None, None),
            "w1": P("model", None, None),
            "w2": P("model", None, None),
        }
    # MoE-TP: shard the expert FFN dim; router replicated
    return {
        "router": P(None, None),
        "w1": P(None, None, "model"),
        "w2": P(None, "model", None),
    }


def topk_routing(
    router_logits: jax.Array,  # [T, E] f32
    top_k: int,
    norm_topk_prob: bool,
    scoring_func: str = "softmax",
    correction_bias: Optional[jax.Array] = None,  # [E] (DeepSeek-V3 noaux_tc)
    routed_scaling_factor: float = 1.0,
    n_group: int = 1,
    topk_group: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (weights [T, k] f32, ids [T, k] i32). Reference
    `layers/moe/topk.py:305`: softmax/sigmoid scoring, optional
    e_score_correction_bias used for SELECTION only (weights keep the raw
    scores), routed scaling."""
    if scoring_func == "sigmoid":
        scores = jax.nn.sigmoid(router_logits)
    else:
        scores = jax.nn.softmax(router_logits, axis=-1)
    select = scores if correction_bias is None else scores + correction_bias
    if n_group > 1 and topk_group < n_group:
        # group-limited routing (reference group_limited_greedy / noaux_tc):
        # rank expert groups, mask experts outside the top groups
        t, e = select.shape
        grouped = select.reshape(t, n_group, e // n_group)
        if correction_bias is not None:  # noaux_tc: sum of top-2 per group
            top2 = jax.lax.top_k(grouped, min(2, e // n_group))[0]
            group_scores = jnp.sum(top2, axis=-1)
        else:  # greedy variant: group max
            group_scores = jnp.max(grouped, axis=-1)
        _, gidx = jax.lax.top_k(group_scores, topk_group)
        gmask = jnp.zeros((t, n_group), bool).at[
            jnp.arange(t)[:, None], gidx
        ].set(True)
        emask = jnp.repeat(gmask, e // n_group, axis=1)
        select = jnp.where(emask, select, -jnp.inf)
    _, ids = jax.lax.top_k(select, top_k)
    ids = ids.astype(jnp.int32)
    weights = jnp.take_along_axis(scores, ids, axis=-1)
    if norm_topk_prob:
        weights = weights / jnp.maximum(
            jnp.sum(weights, axis=-1, keepdims=True), 1e-9
        )
    if routed_scaling_factor != 1.0:
        weights = weights * routed_scaling_factor
    return weights, ids


def fused_moe(
    x: jax.Array,  # [T, H]
    router: jax.Array,  # [H, E]
    w1: jax.Array,  # [E, H, 2M] (gate||up fused)
    w2: jax.Array,  # [E, M, H]
    top_k: int,
    norm_topk_prob: bool = True,
    scoring_func: str = "softmax",
    correction_bias: Optional[jax.Array] = None,
    routed_scaling_factor: float = 1.0,
    n_group: int = 1,
    topk_group: int = 1,
    scale_input: bool = False,
) -> jax.Array:
    """`scale_input=True` multiplies each routed token by its routing
    weight BEFORE the expert (Llama-4's `routed_in = h * score` — the
    scale passes through the nonlinearity) instead of scaling the expert
    output."""
    t, h = x.shape
    e = router.shape[1]
    logits = jnp.dot(x.astype(jnp.float32), router, preferred_element_type=jnp.float32)
    weights, ids = topk_routing(
        logits,
        top_k,
        norm_topk_prob,
        scoring_func=scoring_func,
        correction_bias=correction_bias,
        routed_scaling_factor=routed_scaling_factor,
        n_group=n_group,
        topk_group=topk_group,
    )

    return moe_dispatch(
        x, w1, w2, weights, ids, num_experts=e, scale_input=scale_input
    )


def moe_dispatch(
    x: jax.Array,  # [T, H]
    w1: jax.Array,  # [E, H, 2M]
    w2: jax.Array,  # [E, M, H]
    weights: jax.Array,  # [T, k] f32
    ids: jax.Array,  # [T, k] i32
    num_experts: int,
    scale_input: bool = False,
) -> jax.Array:
    """Sorted ragged_dot expert dispatch for precomputed routing —
    shared by `fused_moe` and routers with bespoke weight functions
    (PhiMoE sparsemixer)."""
    t, h = x.shape
    top_k = ids.shape[1]
    flat_expert = ids.reshape(-1)  # [T*k]
    # stable sort by expert id -> contiguous per-expert runs
    order = jnp.argsort(flat_expert)  # [T*k]
    token_of_slot = (order // top_k).astype(jnp.int32)
    xs = x[token_of_slot]  # [T*k, H] gathered (duplicated per expert pick)
    group_sizes = jnp.bincount(flat_expert, length=num_experts)
    w_sorted = weights.reshape(-1)[order]  # [T*k]
    if scale_input:
        xs = (xs.astype(jnp.float32) * w_sorted[:, None]).astype(x.dtype)

    h1 = jax.lax.ragged_dot(
        xs, w1, group_sizes, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    a = silu_and_mul(h1)
    h2 = jax.lax.ragged_dot(
        a, w2, group_sizes, preferred_element_type=jnp.float32
    )  # [T*k, H] f32

    out = jnp.zeros((t, h), dtype=jnp.float32)
    if not scale_input:
        h2 = h2 * w_sorted[:, None]
    out = out.at[token_of_slot].add(h2)
    return out.astype(x.dtype)


def moe_forward(model, lp: dict, x: jax.Array, **routing_kw) -> jax.Array:
    """Route through the model's configured MoE dispatch: the dense
    sort+ragged_dot `fused_moe` by default, or the all-to-all EP dispatch
    (`parallel/ep.py`) when `enable_ep` was called (reference
    --enable-ep-moe / `layers/moe/token_dispatcher/`)."""
    if getattr(model, "use_ep", False):
        cb = routing_kw.get("correction_bias")
        return model._ep_fn(x, lp["router"], lp["w1"], lp["w2"], cb)
    return fused_moe(x, lp["router"], lp["w1"], lp["w2"], **routing_kw)


class EPMoEMixin:
    """Adds expert-parallel dispatch to a MoE model with the standard
    (router, w1, w2) layer layout. `enable_ep` must run BEFORE weight
    loading — it flips the expert shardings from FFN-dim TP to
    expert-dim EP."""

    use_ep = False

    def moe_routing_kwargs(self) -> dict:
        return dict(top_k=self.top_k, norm_topk_prob=self.norm_topk_prob)

    def enable_ep(
        self,
        mesh,
        axis: str = "model",
        capacity_factor: float = 2.0,
        lossless: bool = False,
    ) -> None:
        from sglang_tpu.parallel.ep import make_ep_moe

        kw = dict(self.moe_routing_kwargs())
        kw.pop("correction_bias", None)
        self.use_ep = True
        self._ep_fn = make_ep_moe(
            mesh,
            axis,
            capacity_factor=capacity_factor,
            lossless=lossless,
            **kw,
        )
