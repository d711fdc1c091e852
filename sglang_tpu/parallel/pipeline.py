"""Pipeline parallelism: microbatched GPipe schedule over a mesh axis.

Parity with reference PP (`distributed/` pipeline groups + the
Scheduler's PP microbatch loop) redesigned for XLA SPMD: there are no
send/recv ranks — every device runs the SAME program under `shard_map`,
layer parameters are stacked [L, ...] and sharded over the "pipe" axis
(each rank holds L/pp layers as a `lax.scan`), and activations rotate
around the ring with `lax.ppermute`. The M+pp-1-step schedule is a
static `lax.scan`, so XLA overlaps each step's compute with the
neighbor permute (the classic TPU pipeline recipe).

Bubble fraction is the usual (pp-1)/(M+pp-1); idle (rank, step) pairs
compute on garbage and are masked out of the result. This module is the
compile-level PP primitive (validated on virtual meshes); threading the
paged KV cache through per-stage scans for serving is the r2
integration.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def make_pipeline_forward(
    mesh: Mesh,
    layer_fn: Callable,  # (layer_params, x) -> x, one decoder layer
    axis: str = "pipe",
    num_microbatches: int = 2,
):
    """Build a jittable pipelined forward.

    Inputs to the returned fn:
      stacked_params: pytree with leading layer axis [L, ...], sharded
        P(axis) on that axis (rank r holds layers [r*L/pp, (r+1)*L/pp)).
      x: [T, H] activations (replicated); T must divide num_microbatches.
    Returns [T, H], replicated, equal to applying all L layers in order.
    """
    pp = mesh.shape[axis]
    M = num_microbatches

    def _local(params_local, x):
        rank = jax.lax.axis_index(axis)

        def run_stage(h):
            def one_layer(carry, lp):
                return layer_fn(lp, carry), None

            out, _ = jax.lax.scan(one_layer, h, params_local)
            return out

        mb = x.reshape(M, x.shape[0] // M, x.shape[1])
        tb, h = mb.shape[1], mb.shape[2]

        def step(carry, s):
            buf, outs = carry
            my_mb = s - rank  # microbatch index this rank works on
            feed = jnp.where(
                rank == 0,
                mb[jnp.clip(my_mb, 0, M - 1)],
                buf,
            )
            act = run_stage(feed)
            is_last = rank == pp - 1
            valid = jnp.logical_and(my_mb >= 0, my_mb < M)
            outs = jnp.where(
                jnp.logical_and(is_last, valid)[..., None, None],
                outs.at[jnp.clip(my_mb, 0, M - 1)].set(act),
                outs,
            )
            nxt = jax.lax.ppermute(
                act, axis, [(i, (i + 1) % pp) for i in range(pp)]
            )
            return (nxt, outs), None

        outs0 = jnp.zeros((M, tb, h), x.dtype)
        (_, outs), _ = jax.lax.scan(
            step, (jnp.zeros((tb, h), x.dtype), outs0), jnp.arange(M + pp - 1)
        )
        # only the last rank holds real outputs; broadcast to all
        outs = jnp.where(rank == pp - 1, outs, jnp.zeros_like(outs))
        outs = jax.lax.psum(outs, axis)
        return outs.reshape(x.shape)

    def fn(stacked_params, x):
        return jax.shard_map(
            _local,
            mesh=mesh,
            in_specs=(P(axis), P(None, None)),
            out_specs=P(None, None),
            check_vma=False,
        )(stacked_params, x)

    return fn


def stack_layer_params(layer_list):
    """[{...}, {...}] per-layer dicts -> one pytree with leading [L]."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *layer_list
    )
