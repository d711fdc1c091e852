"""Context parallelism: ring attention over a mesh axis.

Parity with reference CP (`attention/context_parallel` style long-context
sharding) in the TPU-native form: the sequence is sharded over a "cp"
axis, each rank holds its Q/K/V slice, and K/V blocks rotate around the
ring with `lax.ppermute` while every rank accumulates its queries'
attention with a running online softmax — cp steps, each overlapping the
neighbor transfer with the local QK^T/PV matmuls (the classic
ring-attention schedule; compute per step is MXU-shaped [t/cp, t/cp]
matmuls). Causality is enforced by GLOBAL positions, so the result is
exactly full causal attention over the unsharded sequence.

This is the compile-level CP primitive (validated on virtual meshes);
prefill-time integration into the serving runner is the scale-out
upgrade for contexts that exceed one chip's HBM.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def make_ring_attention(mesh: Mesh, axis: str = "cp", causal: bool = True):
    """Build a jittable fn(q, k, v) -> out with q/k/v [T, H, D] sharded
    P(axis) on T; returns [T, H, D] sharded the same way."""
    cp = mesh.shape[axis]

    def local(q, k, v):
        t, h, d = q.shape
        rank = jax.lax.axis_index(axis)
        scale = 1.0 / math.sqrt(d)
        q_pos = rank * t + jnp.arange(t)  # global query positions

        acc0 = jnp.zeros((t, h, d), jnp.float32)
        m0 = jnp.full((t, h), NEG_INF, jnp.float32)
        l0 = jnp.zeros((t, h), jnp.float32)
        perm = [(i, (i + 1) % cp) for i in range(cp)]

        def step(carry, s):
            kb, vb, acc, m, l = carry
            src = (rank - s) % cp  # which rank's K/V block we hold
            kv_pos = src * t + jnp.arange(t)
            scores = (
                jnp.einsum("qhd,khd->qhk", q, kb, preferred_element_type=jnp.float32)
                * scale
            )
            if causal:
                ok = q_pos[:, None] >= kv_pos[None, :]
                scores = jnp.where(ok[:, None, :], scores, NEG_INF)
            blk_m = jnp.max(scores, axis=-1)  # [t, h]
            new_m = jnp.maximum(m, blk_m)
            # guard fully-masked blocks (exp(NEG_INF - NEG_INF) = 1 trap)
            safe_m = jnp.where(new_m <= NEG_INF / 2, 0.0, new_m)
            p = jnp.exp(scores - safe_m[:, :, None])
            p = jnp.where(scores <= NEG_INF / 2, 0.0, p)
            corr = jnp.where(
                m <= NEG_INF / 2, 0.0, jnp.exp(m - safe_m)
            )  # [t, h]
            acc = acc * corr[:, :, None] + jnp.einsum(
                "qhk,khd->qhd", p, vb.astype(jnp.float32)
            )
            l = l * corr + jnp.sum(p, axis=-1)
            kb = jax.lax.ppermute(kb, axis, perm)
            vb = jax.lax.ppermute(vb, axis, perm)
            return (kb, vb, acc, m * 0 + new_m, l), None

        (kb, vb, acc, m, l), _ = jax.lax.scan(
            step, (k, v, acc0, m0, l0), jnp.arange(cp)
        )
        out = acc / jnp.maximum(l, 1e-20)[:, :, None]
        return out.astype(q.dtype)

    def fn(q, k, v):
        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=P(axis),
            check_vma=False,
        )(q, k, v)

    return fn
