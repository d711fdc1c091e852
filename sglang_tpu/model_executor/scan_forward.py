"""Layer-scanned forward over stacked params and a layer-fused KV pool.

The round-3 bench could not complete from a cold compile cache: the model's
Python-unrolled layer loop put `num_layers` copies of the layer body into
EVERY jitted graph variant, so one 32-layer decode-chain variant took
minutes to compile and the bench warms ~14 variants. This module makes the
layer loop a `jax.lax.scan` so XLA compiles the layer body ONCE per
variant (~32x less HLO), which is also the production cold-start fix.

Two pieces, both TPU-native:

- **Stacked layer params**: per-layer dicts -> one pytree with a leading
  [L] axis (`stack_layer_params`). scan slices layer `i`'s weights with a
  dynamic-slice on the leading (major) axis — contiguous memory, fused
  into the consuming matmuls by XLA, no copy.
- **Layer-fused KV pool**: instead of a per-layer list of page arrays (a
  scan would dynamic-slice/-update whole [P, ...] planes per step — a
  full pool copy), the pool is ONE array `[L * P, 2kvh, ps, d]` where
  layer `i`'s pages occupy rows [i*P, (i+1)*P). Layer selection is plain
  page-id arithmetic: the scan body offsets `fb.page_table` (reads),
  `fb.out_cache_loc` and `fb.wr_pages` (writes) by `i * P`, and every
  existing attention/write kernel works unchanged — they were already
  indexed by page id and agnostic to the pool's leading dim. KV updates
  stay scatters into the scan carry, which XLA reliably performs
  in place under donation.

Reference analogue: the compile-once property of CUDA-graph capture
(`srt/model_executor/cuda_graph_runner.py:578`) — on TPU the graph *is*
the jitted step, so its size must not scale with depth.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sglang_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


def layers_stackable(layer_list: List[dict]) -> bool:
    """True when every layer's param dict has the same structure, shapes,
    and dtypes (models with non-uniform layers keep the unrolled loop)."""
    if len(layer_list) < 1:
        return False
    ref = jax.tree.structure(layer_list[0])
    ref_leaves = jax.tree.leaves(layer_list[0])
    for layer in layer_list[1:]:
        if jax.tree.structure(layer) != ref:
            return False
        for a, b in zip(ref_leaves, jax.tree.leaves(layer)):
            if a.shape != b.shape or a.dtype != b.dtype:
                return False
    return True


def stack_layer_params(
    layer_list: List[dict], layer_spec: dict, mesh: Optional[Mesh]
):
    """Per-layer param dicts -> one pytree with leading [L] axis.

    Memory discipline (an 8B checkpoint cannot afford a 2x peak on a
    16 GiB chip — both failure modes measured on the v5e tunnel runtime):
    - NOT `jnp.stack`: a 32-operand concatenate allocates a multi-GiB
      staging scratch on this backend (RESOURCE_EXHAUSTED with only
      10.8 GiB live). Instead the stacked buffer is allocated once and
      each layer's leaf is written with a DONATED
      `dynamic_update_index_in_dim` — in-place, no scratch.
    - Source leaves are explicitly deleted as they are copied, so the
      transient overhead is ~one stacked leaf, not ~all of params.
    Each stacked leaf keeps its TP spec on the trailing dims
    (`P(None, *spec)`)."""

    upd_cache: dict = {}

    def _writer(shape, dtype):
        key = (shape, str(dtype))
        if key not in upd_cache:
            upd_cache[key] = jax.jit(
                lambda o, x, i: jax.lax.dynamic_update_index_in_dim(
                    o, x, i, 0
                ),
                donate_argnums=(0,),
            )
        return upd_cache[key]

    def stack_leaf(nodes: List[jax.Array], spec: P):
        shape, dtype = nodes[0].shape, nodes[0].dtype
        out_shape = (len(nodes),) + shape
        # zeros under an explicit jit: eager int4 zeros hits a
        # recursive-jit bug on some PJRT runtimes (see load_zero_weights)
        out = jax.jit(lambda: jnp.zeros(out_shape, dtype))()
        if mesh is not None:
            out = jax.device_put(
                out, NamedSharding(mesh, P(None, *tuple(spec)))
            )
        write = _writer(shape, dtype)
        for i, x in enumerate(nodes):
            out = write(out, x, i)
        jax.block_until_ready(out)
        for x in nodes:
            if isinstance(x, jax.Array):
                x.delete()  # free NOW, not at the next sync point
        return out

    def walk(nodes: List, spec_node):
        # nodes: the same sub-tree position across all layers
        n0 = nodes[0]
        if isinstance(n0, dict):
            res = {}
            for k in n0:
                sub_spec = (
                    spec_node.get(k, P()) if isinstance(spec_node, dict) else P()
                )
                res[k] = walk([n[k] for n in nodes], sub_spec)
                for n in nodes:
                    n[k] = None  # drop the source refs as we go
            return res
        spec = spec_node if isinstance(spec_node, P) else P()
        return stack_leaf(nodes, spec)

    return walk(list(layer_list), layer_spec)


def set_stacked_layer_value(stacked: dict, path: tuple, i: int, value):
    """Write one layer's weight group into the stacked tree at layer `i`
    (the stacked analogue of `set_in_tree(params, ("layers", i) + path)`,
    used by the RL tensor weight-update path)."""
    node = stacked
    for key in path[:-1]:
        node = node[key]
    leaf_key = path[-1]
    if isinstance(value, dict):
        target = node[leaf_key]
        for k, v in value.items():
            target[k] = target[k].at[i].set(
                jnp.asarray(v, dtype=target[k].dtype)
            )
    else:
        node[leaf_key] = node[leaf_key].at[i].set(
            jnp.asarray(value, dtype=node[leaf_key].dtype)
        )


class ScanForward:
    """Drop-in replacement for `model.forward` on a single-stage mesh.

    Contract (same as model.forward):
        hidden [T, H], new_kv = __call__(params, kv, fb, attn_backend)
    with `params["layers"]` stacked [L, ...] and `kv` ONE fused array
    [L * num_pages, 2*kvh, ps, d] (or a (values, scales) tuple for int8
    KV, both fused the same way).
    """

    def __init__(self, model, num_pages: int, page_size: int):
        self.model = model
        self.num_pages = num_pages  # pages PER LAYER
        self.page_size = page_size

    def _layer_fb(self, fb: ForwardBatch, i) -> ForwardBatch:
        """Shift page ids into layer i's region of the fused pool."""
        off = i * self.num_pages
        repl = dict(
            out_cache_loc=fb.out_cache_loc + off * self.page_size,
            page_table=fb.page_table + off,
        )
        if fb.wr_pages is not None:
            repl["wr_pages"] = fb.wr_pages + off
        return dataclasses.replace(fb, **repl)

    def __call__(self, params, kv, fb: ForwardBatch, attn_backend):
        h, kv, _ = self._scan(params, kv, fb, attn_backend, capture=False)
        return h, kv

    def forward_tail(
        self, params, kv, tail, fb: ForwardBatch, attn_backend
    ):
        """One chain-tail decode step (ops/chain_tail.py): the pool and
        the tail `(vals [L, bs, 2kvh, K, d], scales|None)` are READ-ONLY;
        each layer's new KV row comes back as a scan output. The caller
        appends the stacked rows to the tail at `fb.tail_step` (one
        dynamic update per step — a per-layer tail carry measured
        +2.7 ms/step of XLA copies). Returns
        (hidden, kv, new_rows [L, bs, 2kvh, d], new_scales [L, bs, 2kvh])."""
        from sglang_tpu.layers.norms import rms_norm
        from sglang_tpu.ops.chain_tail import ChainTailKV

        model = self.model
        L = model.num_layers
        h = model.embed_tokens(params, fb)
        tv_full, ts_full = tail
        idx = jnp.arange(L, dtype=jnp.int32)

        def body(carry, xs):
            a, kv_c = carry
            lp, i = xs
            tv_i = jax.lax.dynamic_index_in_dim(
                tv_full, i, 0, keepdims=False
            )  # [bs, 2kvh, K, d]
            ts_i = (
                jax.lax.dynamic_index_in_dim(ts_full, i, 0, keepdims=False)
                if ts_full is not None
                else None
            )
            wrapped = ChainTailKV(
                pool=kv_c, vals=tv_i, scales=ts_i, step=fb.tail_step
            )
            a, out_kv = model.decoder_layer(
                lp, a, wrapped, self._layer_fb(fb, i), attn_backend, None
            )
            return (a, kv_c), (out_kv.vals, out_kv.scales)

        (h, kv), (rows, scales) = jax.lax.scan(
            body, (h, kv), (params["layers"], idx)
        )
        h = rms_norm(h, params["final_norm"], model.config.rms_norm_eps)
        return h, kv, rows, scales

    def capture_aux(self, params, kv, fb: ForwardBatch, attn_backend):
        """Scan twin of `model.forward_capture_aux` (EAGLE3 multi-layer
        feature capture): returns (hidden, aux [T, C*H], new_kv)."""
        h, kv, aux = self._scan(params, kv, fb, attn_backend, capture=True)
        return h, aux, kv

    def _scan(self, params, kv, fb, attn_backend, capture: bool):
        from sglang_tpu.layers.norms import rms_norm

        model = self.model
        L = model.num_layers
        h = model.embed_tokens(params, fb)
        lora = params.get("lora") if fb.lora_ids is not None else None
        cap = tuple(model.layers_to_capture) if capture else ()
        idx = jnp.arange(L, dtype=jnp.int32)
        aux0 = (
            jnp.zeros((len(cap),) + h.shape, h.dtype) if capture else None
        )

        def body(carry, xs):
            if capture:
                a, kv_c, aux = carry
            else:
                a, kv_c = carry
                aux = None
            if lora is not None:
                lp, ll, i = xs
            else:
                lp, i = xs
                ll = None
            if capture:
                # capture layer c's INPUT hidden state (matches the
                # unrolled forward_capture_aux)
                for ci, c in enumerate(cap):
                    aux = aux.at[ci].set(jnp.where(i == c, a, aux[ci]))
            a, kv_c = model.decoder_layer(
                lp, a, kv_c, self._layer_fb(fb, i), attn_backend, ll
            )
            return ((a, kv_c, aux) if capture else (a, kv_c)), None

        carry0 = (h, kv, aux0) if capture else (h, kv)
        xs = (
            (params["layers"], lora, idx)
            if lora is not None
            else (params["layers"], idx)
        )
        carry, _ = jax.lax.scan(body, carry0, xs)
        if capture:
            h, kv, aux = carry
            t = h.shape[0]
            aux_cat = jnp.transpose(aux, (1, 0, 2)).reshape(t, -1)
        else:
            h, kv = carry
            aux_cat = None
        h = rms_norm(h, params["final_norm"], model.config.rms_norm_eps)
        return h, kv, aux_cat
