"""Attention context parallelism (CP) in the serving path.

Parity with reference `attn_cp_size` (`server_args.py:530`,
`layers/communicator_nsa_cp.py:50`): LONG PREFILL attention splits across
CP ranks while decode stays data-local. The reference's round-robin mode
distributes prefill REQUESTS across the CP group and all-gathers the
outputs; this wrapper is the same design over a `jax.shard_map`:

- the KV pool is REPLICATED over the CP ("data") axis; every rank writes
  every token's KV (identical values — the pool stays consistent),
- each rank computes attention only for the prefill rows it owns
  (`row % cp == rank`): disowned rows' seq_lens and attention-block rows
  zero out, so the ragged kernel skips their grid work entirely,
- per-rank outputs are masked to owned tokens and combined with one
  exact f32 `psum` (each token owned by exactly one rank),
- DECODE passes straight through (data-local, reference behavior).

Effect: prefill attention FLOPs and KV-read bandwidth per chip drop by
1/cp; the dense matmuls around attention stay GSPMD-auto over "model"
(TP composes inside the shard_map's auto axes).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sglang_tpu.model_executor.forward_batch_info import ForwardBatch


class CPAttentionBackend:
    """Wraps an attention backend with prefill-work ownership over the
    "data" axis. Two modes (reference `--nsa-prefill-cp-mode`):

    - "round-robin": ownership at REQUEST granularity (row i -> rank
      i % cp). Balanced for many-prompt batches, but a single long
      prompt lands entirely on one rank.
    - "in-seq": ownership at Q-BLOCK granularity (attention block n ->
      rank n % cp), so ONE long prompt's attention splits across all cp
      ranks (reference `layers/communicator_nsa_cp.py:50` in-sequence
      split). Exact: the KV pool is replicated over the axis, every rank
      sees the full context, and each query token is computed by exactly
      one rank before the f32 psum combine. The pool-SHARDED upgrade
      (HBM scaling, K/V rotating with ppermute) is
      `parallel/ring_attention.py` — same math, mesh-level primitive.
    """

    def __init__(self, inner, mesh: Mesh, cp_size: int, mode: str = "round-robin"):
        assert mode in ("round-robin", "in-seq"), mode
        self.inner = inner
        self.mesh = mesh
        self.cp = cp_size
        self.mode = mode

    def __call__(self, q, k_new, v_new, pages, fb: ForwardBatch, sm_scale,
                 **kw):
        if fb.mode.is_decode():
            return self.inner(q, k_new, v_new, pages, fb, sm_scale, **kw)
        cp = self.cp
        in_seq = self.mode == "in-seq"

        def body(q, k_new, v_new, pages_local, fb):
            rank = jax.lax.axis_index("data")
            b = fb.seq_lens.shape[0]
            if in_seq:
                nb = fb.blk_seq.shape[0]
                blk_owned = (jnp.arange(nb, dtype=jnp.int32) % cp) == rank
                # token -> owning block: padding blocks have nrows 0, so
                # the [T, nb] interval test names exactly one live block
                # per real token
                tt = fb.input_ids.shape[0]
                j = jnp.arange(tt, dtype=jnp.int32)[:, None]
                inside = (j >= fb.blk_qoff[None, :]) & (
                    j < fb.blk_qoff[None, :] + fb.blk_nrows[None, :]
                )
                tok_owned = jnp.any(inside & blk_owned[None, :], axis=1)
                fb_local = dataclasses.replace(
                    fb,
                    blk_nrows=jnp.where(blk_owned, fb.blk_nrows, 0),
                )
            else:
                owned_row = (jnp.arange(b, dtype=jnp.int32) % cp) == rank
                tok_owned = owned_row[fb.token_to_seq]
                blk_owned = owned_row[
                    jnp.clip(fb.blk_seq, 0, b - 1)
                ]
                fb_local = dataclasses.replace(
                    fb,
                    seq_lens=jnp.where(owned_row, fb.seq_lens, 0),
                    blk_nrows=jnp.where(blk_owned, fb.blk_nrows, 0),
                )
            out, pages_local = self.inner(
                q, k_new, v_new, pages_local, fb_local, sm_scale, **kw
            )
            out = jnp.where(tok_owned[:, None, None], out, 0)
            out = jax.lax.psum(out.astype(jnp.float32), "data").astype(
                q.dtype
            )
            return out, pages_local

        fb_specs = jax.tree.map(lambda _: P(), fb)
        return jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(P(), P(), P(), P(), fb_specs),
            out_specs=(P(), P()),
            axis_names={"data"},
            check_vma=False,
        )(q, k_new, v_new, pages, fb)
