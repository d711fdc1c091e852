"""Pipeline-parallel serving forward: GPipe over the "pipe" mesh axis,
inside every jitted ModelRunner step.

Parity with reference PP serving (`srt/managers/scheduler_pp_mixin.py` +
`distributed/` pipeline groups), redesigned for XLA SPMD:

- Layer parameters and the paged KV pool are STACKED over layers
  ([L, ...]) and sharded `P("pipe")` on that axis — stage r holds layers
  [r*L/pp, (r+1)*L/pp) and, crucially, the KV pages FOR THOSE LAYERS.
  The page allocator/scheduler is untouched: page ids are global, each
  stage just stores its own layers' planes for every page.
- One `jax.shard_map` (manual over "pipe", GSPMD-auto over "model" so TP
  composes) runs the M+pp-1-step GPipe schedule as a `lax.scan`;
  activations rotate with `lax.ppermute` so XLA overlaps each step's
  compute with the neighbor permute.
- Decode steps microbatch over batch rows (rows are independent
  sequences); extend/verify run as a single microbatch (chunked prefill
  already bounds their latency, and the scheduler keeps decode chunks —
  the steady-state path — deep enough to fill the pipeline).
- Invalid (rank, step) pairs compute on garbage and write their KV to
  page 0, the reserved trash page padding rows already use.

Embedding, final norm, logits, and sampling stay outside the shard_map,
replicated over "pipe" (GSPMD-auto over "model") — every stage computes
the same sample, so no broadcast is needed afterwards.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sglang_tpu.model_executor.forward_batch_info import ForwardBatch, ForwardMode


def _walk_specs(tree, spec_tree, fn):
    """Recurse dict/list structures in lockstep; spec leaves are
    PartitionSpecs (which older/newer jax versions disagree about being
    pytree leaves, so we walk by hand)."""
    if isinstance(tree, dict):
        return {k: _walk_specs(tree[k], spec_tree[k], fn) for k in tree}
    if isinstance(tree, (list, tuple)):
        return type(tree)(
            _walk_specs(t, s, fn) for t, s in zip(tree, spec_tree)
        )
    return fn(tree, spec_tree)


def stack_layers(layer_list: List[dict], layer_spec: dict, mesh: Mesh):
    """Per-layer param dicts -> one pytree with leading [L] axis, sharded
    P("pipe") on that axis (each leaf keeps its TP spec on later dims)."""
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layer_list)

    def put(leaf, spec):
        full = P("pipe", *tuple(spec))
        return jax.device_put(leaf, NamedSharding(mesh, full))

    return _walk_specs(stacked, layer_spec, put)


class PPForward:
    """Drop-in replacement for `model.forward` when pp_size > 1.

    Contract (same as model.forward):
        hidden [T, H], new_kv = __call__(params, kv, fb, attn_backend)
    with `params["layers"]` stacked [L, ...] and `kv` one stacked array
    [L, num_pages, 2*kvh, page_size, head_dim], both sharded P("pipe").
    """

    def __init__(self, model, mesh: Mesh, pp_size: int, microbatches: int = 0):
        self.model = model
        self.mesh = mesh
        self.pp = pp_size
        self.mb = microbatches or pp_size
        if model.num_layers % pp_size:
            raise ValueError(
                f"num_layers={model.num_layers} not divisible by pp={pp_size}"
            )

    # ------------------------------------------------------------ schedule

    def _gpipe(self, stacked_layers, kv, h_mb, fb_mb, attn_backend):
        """Run the GPipe schedule.

        stacked_layers: pytree [L, ...] (split P("pipe") -> [L/pp, ...])
        kv: [L, P, 2kvh, ps, d] (split -> [L/pp, ...])
        h_mb: [M, tmb, H] microbatched activations (replicated)
        fb_mb: ForwardBatch whose array leaves carry a leading [M] axis
          (replicated); mode is static.
        Returns h [M, tmb, H] (replicated), kv' (split over pipe).
        """
        pp, M = self.pp, h_mb.shape[0]
        model, mesh = self.model, self.mesh

        def body(layers_local, kv_local, h_mb, fb_arrays):
            rank = jax.lax.axis_index("pipe")
            tmb, hid = h_mb.shape[1], h_mb.shape[2]

            def run_stage(kv_local, act, fb_local):
                def one_layer(carry, xs):
                    a = carry
                    lp, kv_l = xs
                    a, kv_l = model.decoder_layer(
                        lp, a, kv_l, fb_local, attn_backend
                    )
                    return a, kv_l

                act, new_kv = jax.lax.scan(
                    one_layer, act, (layers_local, kv_local)
                )
                return new_kv, act

            def step(carry, s):
                buf, outs, kv_local = carry
                my_mb = s - rank
                valid = jnp.logical_and(my_mb >= 0, my_mb < M)
                mbi = jnp.clip(my_mb, 0, M - 1)
                feed = jnp.where(rank == 0, h_mb[mbi], buf)
                # microbatch metadata, with KV writes of invalid steps
                # redirected to the trash page (0)
                fb_local = jax.tree.map(lambda a: a[mbi], fb_arrays)
                fb_local = dataclasses.replace(
                    fb_local,
                    out_cache_loc=jnp.where(
                        valid, fb_local.out_cache_loc, 0
                    ),
                    mode=fb_arrays.mode,
                )
                kv_local, act = run_stage(kv_local, feed, fb_local)
                is_out = jnp.logical_and(rank == pp - 1, valid)
                outs = jnp.where(
                    is_out[..., None, None],
                    outs.at[mbi].set(act),
                    outs,
                )
                nxt = jax.lax.ppermute(
                    act, "pipe", [(i, (i + 1) % pp) for i in range(pp)]
                )
                return (nxt, outs, kv_local), None

            outs0 = jnp.zeros((M, tmb, hid), h_mb.dtype)
            buf0 = jnp.zeros((tmb, hid), h_mb.dtype)
            (_, outs, kv_local), _ = jax.lax.scan(
                step, (buf0, outs0, kv_local), jnp.arange(M + pp - 1)
            )
            # only the last stage holds real outputs; share them around the
            # ring so sampling is replicated. psum in f32: a bf16 all-reduce
            # over a manual axis trips XLA-CPU's AllReducePromotion pass
            # ("Invalid binary instruction opcode copy"), and f32 psum is
            # also the numerically safer broadcast.
            outs = jnp.where(rank == pp - 1, outs, jnp.zeros_like(outs))
            outs = jax.lax.psum(outs.astype(jnp.float32), "pipe").astype(
                h_mb.dtype
            )
            return outs, kv_local

        # ForwardBatch with leading-M leaves travels replicated; mode is a
        # static dataclass field so it rides the treedef.
        fb_specs = jax.tree.map(lambda _: P(), fb_mb)
        out_h, new_kv = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P("pipe"), P("pipe"), P(), fb_specs),
            out_specs=(P(), P("pipe")),
            axis_names={"pipe"},
            check_vma=False,
        )(stacked_layers, kv, h_mb, fb_mb)
        return out_h, new_kv

    # ------------------------------------------------------------ batching

    def _microbatch_decode(self, fb: ForwardBatch, M: int) -> ForwardBatch:
        """Decode rows are independent sequences: reshape every per-row
        array to [M, bb/M, ...] and rebuild the per-microbatch row-local
        attention work list."""
        bb = fb.seq_lens.shape[0]
        bl = bb // M
        rows = jnp.tile(jnp.arange(bl, dtype=jnp.int32)[None], (M, 1))
        seq = fb.seq_lens.reshape(M, bl)
        valid = (seq > 0).astype(jnp.int32)
        return dataclasses.replace(
            fb,
            input_ids=fb.input_ids.reshape(M, bl),
            positions=fb.positions.reshape(M, bl),
            out_cache_loc=fb.out_cache_loc.reshape(M, bl),
            page_table=fb.page_table.reshape(M, bl, -1),
            seq_lens=seq,
            cu_q_lens=jnp.tile(
                jnp.arange(bl + 1, dtype=jnp.int32)[None], (M, 1)
            ),
            token_to_seq=rows,
            token_kind=jnp.where(valid > 0, 2, 0).astype(jnp.int32),
            blk_seq=rows,
            blk_qoff=rows,
            blk_nrows=valid,
            blk_pos0=seq - 1,
        )

    def _single_microbatch(self, fb: ForwardBatch) -> ForwardBatch:
        """Whole batch as one microbatch: add a leading [1] axis to every
        array leaf (extend/verify keep their ragged block map intact)."""
        return jax.tree.map(lambda a: a[None], fb)

    # -------------------------------------------------------------- forward

    def __call__(self, params, kv, fb: ForwardBatch, attn_backend):
        model = self.model
        h = model.embed_tokens(params, fb)  # [T, H], replicated over pipe
        T = h.shape[0]
        M = self.mb if (fb.mode.is_decode() and T % self.mb == 0) else 1
        if M > 1:
            fb_mb = self._microbatch_decode(fb, M)
        else:
            fb_mb = self._single_microbatch(fb)
        h_mb = h.reshape(M, T // M, h.shape[1])
        out_h, new_kv = self._gpipe(
            params["layers"], kv, h_mb, fb_mb, attn_backend
        )
        h = out_h.reshape(T, -1)
        from sglang_tpu.layers.norms import rms_norm

        h = rms_norm(h, params["final_norm"], model.config.rms_norm_eps)
        return h, new_kv
