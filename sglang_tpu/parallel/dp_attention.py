"""DP-attention: attention + KV pool sharded over the "data" mesh axis.

Parity with reference `--enable-dp-attention` (`srt/layers/dp_attention.py:53`,
`scheduler_dp_attn_mixin.py`): attention state is DATA-parallel while the
rest of the model stays tensor-parallel. The reference motivation is MLA
models whose KV is MQA-like (TP over heads cannot shard it); here the same
axis exists for any model.

TPU redesign — the page space is range-partitioned (allocator regions), the
pool array is sharded `P("data")` on the page dim, and the attention call
runs under a `jax.shard_map` that is manual over "data" and GSPMD-auto over
"model" (so TP composes inside). Each DP group:

- owns the rows whose pages live in its shard (row ownership is derived
  from the first page id — a request's pages never cross regions),
- translates global page ids to shard-local ids,
- redirects disowned rows' KV writes to its region's garbage page
  (local page 0, reserved by the allocator),
- zeroes disowned rows' seq_lens / block rows so the kernel skips them,

and the per-group outputs (masked to owned tokens) are combined with one
f32 `psum` over "data" — each token is owned by exactly one group, so the
sum is exact. Dense matmuls outside the attention call see replicated
activations over "data" (weights are already replicated there), so no other
collectives appear; MoE EP over ("data", "model") composes via the auto
axes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sglang_tpu.model_executor.forward_batch_info import ForwardBatch


class DPAttentionBackend:
    """Wraps an attention backend with "data"-sharded KV + row ownership."""

    def __init__(self, inner, mesh: Mesh, dp_size: int, pages_per_rank: int,
                 page_size: int):
        self.inner = inner
        self.mesh = mesh
        self.dp = dp_size
        self.pages_per_rank = pages_per_rank
        self.page_size = page_size

    def __call__(self, q, k_new, v_new, pages, fb: ForwardBatch, sm_scale,
                 **kw):
        dp, ppr, ps = self.dp, self.pages_per_rank, self.page_size

        def body(q, k_new, v_new, pages_local, fb):
            rank = jax.lax.axis_index("data")
            # row ownership: all of a request's pages live in one region
            row_rank = jnp.minimum(fb.page_table[:, 0] // ppr, dp - 1)
            owned_row = row_rank == rank
            pt_local = jnp.where(
                owned_row[:, None], fb.page_table - rank * ppr, 0
            )
            pt_local = jnp.clip(pt_local, 0, ppr - 1)
            tok_owned = owned_row[fb.token_to_seq]
            loc_local = jnp.where(
                tok_owned, fb.out_cache_loc - rank * ppr * ps, 0
            )
            loc_local = jnp.clip(loc_local, 0, ppr * ps - 1)
            blk_owned = owned_row[jnp.clip(fb.blk_seq, 0, owned_row.shape[0] - 1)]
            fb_local = dataclasses.replace(
                fb,
                page_table=pt_local,
                out_cache_loc=loc_local,
                seq_lens=jnp.where(owned_row, fb.seq_lens, 0),
                blk_nrows=jnp.where(blk_owned, fb.blk_nrows, 0),
            )
            out, pages_local = self.inner(
                q, k_new, v_new, pages_local, fb_local, sm_scale, **kw
            )
            out = jnp.where(tok_owned[:, None, None], out, 0)
            # each token owned by exactly one group -> psum is exact
            # (f32: bf16 all-reduce over a manual axis trips XLA-CPU's
            # AllReducePromotion pass)
            out = jax.lax.psum(out.astype(jnp.float32), "data").astype(
                q.dtype
            )
            return out, pages_local

        fb_specs = jax.tree.map(lambda _: P(), fb)
        return jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(P(), P(), P(), P("data"), fb_specs),
            out_specs=(P(), P("data")),
            axis_names={"data"},
            check_vma=False,
        )(q, k_new, v_new, pages, fb)
