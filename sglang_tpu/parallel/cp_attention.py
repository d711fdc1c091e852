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


NEG = -1e30


class PoolShardedCPBackend:
    """POOL-SHARDED context parallelism (reference gather-CP cannot give
    this: `ring_attention.py`'s capability in the serving path): the
    paged KV pool is range-partitioned over the "data" axis — each rank
    physically holds 1/cp of the pages — and one sequence's pages STRIPE
    across every region (`PageAllocator.alloc_striped`), so a context
    larger than one chip's pool still fits the mesh.

    Per call (extend AND decode), inside one `shard_map`:
    - each rank writes only the new-token rows whose page lands in its
      region (others park on the region's local garbage page),
    - each rank computes partial attention over its LOCAL pages only
      (unowned page-table entries mask out), carrying the online-softmax
      state (m, l, acc),
    - partials merge exactly across the axis: M = pmax(m),
      out = psum(e^{m-M} acc) / psum(e^{m-M} l) — the same algebra the
      ring schedule uses, with XLA collectives instead of ppermute hops.

    Memory per rank is bounded by its pool shard; the cost is one psum
    per attention call (decode pays it per step — the price of exceeding
    single-chip KV capacity)."""

    def __init__(self, mesh: Mesh, cp_size: int, num_pages: int, page_size: int):
        self.mesh = mesh
        self.cp = cp_size
        self.pages_per_rank = num_pages // cp_size
        self.page_size = page_size

    def __call__(self, q, k_new, v_new, pages, fb: ForwardBatch, sm_scale,
                 sliding_window=-1, logit_cap=0.0, sinks=None, **kw):
        ppr = self.pages_per_rank
        ps = self.page_size
        cp = self.cp

        def body(q, k_new, v_new, pages_local, fb):
            rank = jax.lax.axis_index("data")
            base = rank * ppr
            # ---- KV write: own rows only; others -> local garbage page 0
            pg = fb.out_cache_loc // ps
            owned_tok = (pg >= base) & (pg < base + ppr)
            loc_local = jnp.where(
                owned_tok, fb.out_cache_loc - base * ps, 0
            )
            from sglang_tpu.layers.attention.base import write_kv_pages

            pages_local = write_kv_pages(
                pages_local, k_new, v_new, loc_local
            )
            # ---- partial attention over the LOCAL pool shard
            from sglang_tpu.layers.attention.reference_backend import (
                _gather_kv,
            )

            pt = fb.page_table
            pt_owned = (pt >= base) & (pt < base + ppr)  # [B, pmax]
            pt_local = jnp.where(pt_owned, pt - base, 0)
            k, v = _gather_kv(pages_local, pt_local)  # [B, Kmax, kvh, d]
            t, qh, d = q.shape
            kvh = k.shape[2]
            g = qh // kvh
            seq_of = fb.token_to_seq  # [T]
            kmax = k.shape[1]
            kv_idx = jnp.arange(kmax, dtype=jnp.int32)[None, :]
            kv_owned = jnp.repeat(pt_owned, ps, axis=1)[:, :kmax]
            pos = (
                fb.mask_positions
                if fb.mask_positions is not None
                else fb.positions
            )
            mask = (
                (kv_idx <= pos[:, None])
                & (kv_idx < fb.seq_lens[seq_of][:, None])
                & kv_owned[seq_of]
            )  # [T, kmax]
            if sliding_window > 0:
                mask &= kv_idx > (pos[:, None] - sliding_window)
            qg = q.reshape(t, kvh, g, d)
            s = (
                jnp.einsum(
                    "thgd,tkhd->thgk",
                    qg.astype(jnp.float32),
                    k[seq_of].astype(jnp.float32),
                )
                * sm_scale
            )
            if logit_cap > 0:
                s = logit_cap * jnp.tanh(s / logit_cap)
            s = jnp.where(mask[:, None, None, :], s, NEG)
            m = jnp.max(s, axis=-1)  # [T, kvh, g]
            p = jnp.exp(s - m[..., None])
            p = jnp.where(mask[:, None, None, :], p, 0.0)
            l = jnp.sum(p, axis=-1)
            acc = jnp.einsum(
                "thgk,tkhd->thgd", p, v[seq_of].astype(jnp.float32)
            )
            # ---- exact cross-rank merge
            M = jax.lax.pmax(m, "data")
            w = jnp.exp(m - M)
            l_g = jax.lax.psum(w * l, "data")
            acc_g = jax.lax.psum(w[..., None] * acc, "data")
            if sinks is not None:
                l_g = l_g + jnp.exp(
                    sinks.reshape(kvh, g)[None].astype(jnp.float32) - M
                )
            out = (acc_g / jnp.maximum(l_g, 1e-10)[..., None]).astype(
                q.dtype
            )
            return out.reshape(t, qh, d), pages_local

        if isinstance(pages, tuple):
            pages_spec = (P("data"), P("data"))
        else:
            pages_spec = P("data")
        fb_specs = jax.tree.map(lambda _: P(), fb)
        return jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(P(), P(), P(), pages_spec, fb_specs),
            out_specs=(P(), pages_spec),
            axis_names={"data"},
            check_vma=False,
        )(q, k_new, v_new, pages, fb)
