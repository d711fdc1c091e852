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


def moe_specs() -> Dict[str, P]:
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
    renormalize_softmax: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (weights [T, k] f32, ids [T, k] i32). Reference
    `layers/moe/topk.py:305` softmax-topk path."""
    probs = jax.nn.softmax(router_logits, axis=-1)
    weights, ids = jax.lax.top_k(probs, top_k)
    if norm_topk_prob:
        weights = weights / jnp.maximum(
            jnp.sum(weights, axis=-1, keepdims=True), 1e-9
        )
    return weights, ids.astype(jnp.int32)


def fused_moe(
    x: jax.Array,  # [T, H]
    router: jax.Array,  # [H, E]
    w1: jax.Array,  # [E, H, 2M] (gate||up fused)
    w2: jax.Array,  # [E, M, H]
    top_k: int,
    norm_topk_prob: bool = True,
) -> jax.Array:
    t, h = x.shape
    e = router.shape[1]
    logits = jnp.dot(x.astype(jnp.float32), router, preferred_element_type=jnp.float32)
    weights, ids = topk_routing(logits, top_k, norm_topk_prob)

    flat_expert = ids.reshape(-1)  # [T*k]
    # stable sort by expert id -> contiguous per-expert runs
    order = jnp.argsort(flat_expert)  # [T*k]
    token_of_slot = (order // top_k).astype(jnp.int32)
    xs = x[token_of_slot]  # [T*k, H] gathered (duplicated per expert pick)
    group_sizes = jnp.bincount(flat_expert, length=e)

    h1 = jax.lax.ragged_dot(
        xs, w1, group_sizes, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    a = silu_and_mul(h1)
    h2 = jax.lax.ragged_dot(
        a, w2, group_sizes, preferred_element_type=jnp.float32
    )  # [T*k, H] f32

    w_sorted = weights.reshape(-1)[order]  # [T*k]
    out = jnp.zeros((t, h), dtype=jnp.float32)
    out = out.at[token_of_slot].add(h2 * w_sorted[:, None])
    return out.astype(x.dtype)
