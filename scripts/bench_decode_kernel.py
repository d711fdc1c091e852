"""On-chip microbenchmark: unified ragged kernel vs decode-specialized
R=8-rows-per-block kernel (ops/paged_decode_attention.py), llama-8B
geometry (32 qh, 8 kvh, d=128, page=64, bf16).

Each timed op chains LAYERS kernel invocations inside ONE jit (q fed from
the previous output) so per-dispatch tunnel overhead (~ms on the tunneled
PJRT runtime) amortizes like it does in the real fused model step.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from sglang_tpu.ops.ragged_paged_attention import ragged_paged_attention
from sglang_tpu.ops.paged_decode_attention import paged_decode_attention
from sglang_tpu.model_executor.forward_batch_info import build_attn_blocks

PS = 64
D = 128
QH = 32
KVH = 8
LAYERS = 32


def run(bs, seq, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    pmax = 64  # up to 4096 tokens
    npages_per = -(-seq // PS)
    total_pages = bs * npages_per + 1
    pages = jnp.asarray(  # head-major pool layout
        rng.standard_normal((total_pages, 2 * KVH, PS, D)) * 0.3, dtype
    )
    page_table = np.zeros((bs, pmax), np.int32)
    nx = 1
    seq_lens = np.full(bs, seq, np.int32)
    for i in range(bs):
        page_table[i, :npages_per] = range(nx, nx + npages_per)
        nx += npages_per
    q = jnp.asarray(rng.standard_normal((bs, QH, D)) * 0.3, dtype)
    sm = 1.0 / np.sqrt(D)

    # decode-mode block metadata for the unified kernel (1 q row per seq)
    cu_q = np.arange(bs + 1, dtype=np.int32)
    blk = build_attn_blocks(cu_q, seq_lens, 8, bs)
    blk_dev = tuple(jnp.asarray(x) for x in blk)
    pt_dev = jnp.asarray(page_table)
    sl_dev = jnp.asarray(seq_lens)

    @functools.partial(jax.jit, static_argnames=("which",))
    def many(q, pages, which):
        def body(i, q):
            if which == "uni":
                o = ragged_paged_attention(
                    q, pages, *blk_dev, pt_dev, qblk=8, sm_scale=sm
                )
            else:
                o = paged_decode_attention(
                    q, pages, sl_dev, pt_dev, sm_scale=sm
                )
            return o.astype(q.dtype)

        return jax.lax.fori_loop(0, LAYERS, body, q)

    o_uni = many(q, pages, which="uni")
    o_new = many(q, pages, which="new")
    err = jnp.abs(
        o_uni.astype(jnp.float32) - o_new.astype(jnp.float32)
    ).max()
    print(f"bs={bs} seq={seq}  max|uni-new|={float(err):.5f}")

    def timeit(f, n=20):
        f().block_until_ready()
        t0 = time.perf_counter()
        for _ in range(n):
            r = f()
        r.block_until_ready()
        return (time.perf_counter() - t0) / n / LAYERS * 1e6  # us/layer

    t_uni = timeit(lambda: many(q, pages, which="uni"))
    t_new = timeit(lambda: many(q, pages, which="new"))
    kv_bytes = bs * npages_per * PS * 2 * KVH * D * (
        2 if dtype == jnp.bfloat16 else 1
    )
    bw_uni = kv_bytes / (t_uni * 1e-6) / 1e9
    bw_new = kv_bytes / (t_new * 1e-6) / 1e9
    print(
        f"  unified: {t_uni:8.1f} us/layer ({bw_uni:6.1f} GB/s)   "
        f"new: {t_new:8.1f} us/layer ({bw_new:6.1f} GB/s)   "
        f"speedup {t_uni / t_new:.2f}x"
    )


if __name__ == "__main__":
    print(jax.devices())
    for bs in (32, 64, 128):
        for seq in (256, 1024):
            run(bs, seq)
