"""NSA — Native Sparse Attention (DeepSeek V3.2 lightning indexer + top-k
sparse MLA attention).

Parity with reference `srt/layers/attention/nsa/nsa_indexer.py` (Indexer:
wq_b / wk / k_norm / weights_proj, score = sum_h w_h * relu(q_h . k_j),
softmax-scaled, top-`index_topk` positions per query) and
`srt/layers/attention/nsa_backend.py` (sparse attention over the selected
token set). The reference runs the indexer logits in fp8 through deep_gemm
paged-MQA kernels and the sparse attention through flashmla sparse kernels;
this TPU build keeps everything in bf16/f32 jnp:

- index keys live in a per-layer paged plane `[num_pages, page_size, d_i]`
  sharing the request page table with the latent KV pool;
- logits are computed against a dense page-table gather (same memory
  profile as the jnp reference attention oracle — `token_to_seq` expansion
  on extend);
- top-k runs as `jax.lax.top_k` over the position axis, and the sparse
  attention gathers exactly `index_topk` latent rows per query.

A Pallas kernel that streams index-key pages and maintains a running top-k
without materializing `[T, L]` logits is the long-context production path;
at the context lengths this engine currently buckets for (<= 8k), the
gather formulation compiles to plain XLA gathers and stays HBM-bound.

The hadamard `rotate_activation` of the reference is an orthogonal
transform applied to both q and k only to tame fp8 quantization error;
scores are mathematically unchanged, so the bf16 build omits it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sglang_tpu.model_executor.forward_batch_info import ForwardBatch

_NEG = -1e30


def write_index_k(idx_pages: jax.Array, k_idx: jax.Array, out_cache_loc):
    """Scatter per-token index keys into the paged index plane.

    idx_pages: [num_pages, page_size, d_i]; k_idx: [T, d_i];
    out_cache_loc: [T] flat slot ids (page * page_size + offset).
    """
    p, ps, d = idx_pages.shape
    flat = idx_pages.reshape(p * ps, d)
    flat = flat.at[out_cache_loc].set(k_idx.astype(idx_pages.dtype))
    return flat.reshape(idx_pages.shape)


def indexer_scores(
    q_idx: jax.Array,  # [N, H_i, d_i] (N = tokens on extend, seqs on decode)
    gate_w: jax.Array,  # [N, H_i] f32 head gates (already scale-folded)
    idx_pages: jax.Array,  # [num_pages, page_size, d_i]
    page_table: jax.Array,  # [B, Pmax]
    token_to_seq=None,  # [N] (extend) or None (decode: N == B)
) -> jax.Array:
    """Lightning-indexer logits `score[n, l] = sum_h w[n,h] relu(q . k_l)`
    over each query's own page-table row. Returns [N, L] f32
    (L = Pmax * page_size); invalid positions are NOT masked here."""
    num_pages, ps, d = idx_pages.shape
    b, pmax = page_table.shape
    keys = idx_pages[page_table].reshape(b, pmax * ps, d)  # [B, L, d]
    if token_to_seq is not None:
        keys = keys[token_to_seq]  # [N, L, d]
    logits = jnp.einsum(
        "nhd,nld->nhl",
        q_idx.astype(jnp.float32),
        keys.astype(jnp.float32),
    )
    return jnp.einsum("nh,nhl->nl", gate_w, jax.nn.relu(logits))


def topk_positions(
    scores: jax.Array,  # [N, L] f32
    kv_limit: jax.Array,  # [N] int32 — each query attends to pos < limit
    topk: int,
):
    """Causal top-k selection. Returns (pos [N, K] int32, valid [N, K] bool).
    When a query's history is shorter than K the tail entries are invalid
    (mask-consumed by the sparse attention)."""
    n, l = scores.shape
    pos = jnp.arange(l, dtype=jnp.int32)[None, :]
    masked = jnp.where(pos < kv_limit[:, None], scores, _NEG)
    k = min(topk, l)
    top_vals, top_pos = jax.lax.top_k(masked, k)
    return top_pos.astype(jnp.int32), top_vals > _NEG / 2


def sparse_mqa_attention(
    q: jax.Array,  # [N, H, d_lat] (latent-absorbed queries, lat+rope dims)
    pages: jax.Array,  # [num_pages, 2, page_size, d_lat] latent pool (kvh=1)
    page_table: jax.Array,  # [B, Pmax]
    top_pos: jax.Array,  # [N, K]
    top_valid: jax.Array,  # [N, K]
    sm_scale: float,
    token_to_seq=None,
) -> jax.Array:
    """MQA attention restricted to the selected positions. V rows equal K
    rows (the latent pool stores one shared [c_kv ; k_pe] head; the caller
    slices the kv_lora prefix of the output and absorbs through W_UV)."""
    n, h, d = q.shape
    num_pages, two, ps, _ = pages.shape
    pt = page_table if token_to_seq is None else page_table[token_to_seq]
    slots = (
        jnp.take_along_axis(pt, top_pos // ps, axis=1) * ps + top_pos % ps
    )  # [N, K]
    flat_k = pages[:, 0].reshape(num_pages * ps, d)
    k_sel = flat_k[slots]  # [N, K, d]
    logits = (
        jnp.einsum(
            "nhd,nkd->nhk", q.astype(jnp.float32), k_sel.astype(jnp.float32)
        )
        * sm_scale
    )
    logits = jnp.where(top_valid[:, None, :], logits, _NEG)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("nhk,nkd->nhd", probs, k_sel.astype(jnp.float32))
    return out.astype(q.dtype)


def nsa_attention(
    q_full: jax.Array,  # [T, H, d_lat]
    k_lat: jax.Array,  # [T, 1, d_lat] new latent rows
    q_idx: jax.Array,  # [T, H_i, d_i]
    k_idx: jax.Array,  # [T, d_i] new index keys
    gate_w: jax.Array,  # [T, H_i] f32
    kv_layer,  # (latent pages, index-key plane)
    fb: ForwardBatch,
    sm_scale: float,
    topk: int,
):
    """Full NSA step: write latent KV + index keys, score, select, attend.
    Returns (attn_out [T, H, d_lat], updated kv_layer tuple)."""
    from sglang_tpu.layers.attention.base import write_kv_pages

    pages, idx_pages = kv_layer
    pages = write_kv_pages(pages, k_lat, k_lat, fb.out_cache_loc)
    idx_pages = write_index_k(idx_pages, k_idx, fb.out_cache_loc)
    if fb.mode.is_decode():
        t2s = None
        kv_limit = fb.seq_lens  # decode row's own new token is at seq_len-1
    else:
        t2s = fb.token_to_seq
        kv_limit = fb.positions + 1  # causal: attend to pos <= own position
    scores = indexer_scores(q_idx, gate_w, idx_pages, fb.page_table, t2s)
    top_pos, top_valid = topk_positions(scores, kv_limit, topk)
    out = sparse_mqa_attention(
        q_full, pages, fb.page_table, top_pos, top_valid, sm_scale, t2s
    )
    return out, (pages, idx_pages)
