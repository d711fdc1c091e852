"""On-chip probe: int8 KV (per-(token, head) scales, flat lane-aligned
per-page blob) through the decode-specialized kernel vs bf16 KV.

Validates the scale-blob DMA on real Mosaic (interpreter mode can hide
lane-tiling violations) and measures the KV-bandwidth win: int8 values
halve the KV bytes vs bf16 and upcast via the one fast 8->16-bit Mosaic
convert, so decode attention should approach the byte-ratio speedup.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from sglang_tpu.ops.paged_decode_attention import paged_decode_attention

PS = 64
D = 128
QH = 32
KVH = 8
LAYERS = 8


def run(bs, seq):
    rng = np.random.default_rng(0)
    pmax = 64
    npages_per = -(-seq // PS)
    total_pages = bs * npages_per + 1
    pf = rng.standard_normal((total_pages, 2 * KVH, PS, D)).astype(np.float32) * 0.3
    pages16 = jnp.asarray(pf, jnp.bfloat16)

    # quantize to the pool layout: int8 values + [P, rows, 128] scale plane
    from sglang_tpu.mem_cache.memory_pool import scale_plane_rows

    s = np.maximum(np.abs(pf).max(axis=-1), 1e-8) / 127.0  # [P, 2kvh, ps]
    q8 = np.clip(np.round(pf / s[..., None]), -127, 127).astype(np.int8)
    rows = scale_plane_rows(KVH)
    sb = np.zeros((total_pages, rows, 128), np.float32)
    sb[:, : 2 * KVH, :PS] = s
    pages8 = (jnp.asarray(q8), jnp.asarray(sb))

    # int4: same scales with +-7 range, K/V nibble-paired per head row
    s4 = np.maximum(np.abs(pf).max(axis=-1), 1e-8) / 7.0
    q4 = np.clip(np.round(pf / s4[..., None]), -7, 7).astype(np.int32)
    packed = ((q4[:, :KVH] & 15) | ((q4[:, KVH:] & 15) << 4)).astype(np.uint8)
    sb4 = np.zeros((total_pages, rows, 128), np.float32)
    sb4[:, : 2 * KVH, :PS] = s4
    pages4 = (jnp.asarray(packed), jnp.asarray(sb4))

    page_table = np.zeros((bs, pmax), np.int32)
    nx = 1
    seq_lens = np.full(bs, seq, np.int32)
    for i in range(bs):
        page_table[i, :npages_per] = range(nx, nx + npages_per)
        nx += npages_per
    q = jnp.asarray(rng.standard_normal((bs, QH, D)) * 0.3, jnp.bfloat16)
    sm = 1.0 / np.sqrt(D)
    pt_dev = jnp.asarray(page_table)
    sl_dev = jnp.asarray(seq_lens)

    @functools.partial(jax.jit, static_argnames=("which",))
    def many(q, p16, p8v, p8s, p4v, p4s, which):
        def body(i, q):
            pages = {
                "bf16": p16, "int8": (p8v, p8s), "int4": (p4v, p4s)
            }[which]
            o = paged_decode_attention(q, pages, sl_dev, pt_dev, sm_scale=sm)
            return o.astype(q.dtype)

        return jax.lax.fori_loop(0, LAYERS, body, q)

    allp = (pages16, *pages8, *pages4)
    o16 = many(q, *allp, which="bf16")
    o8 = many(q, *allp, which="int8")
    o4 = many(q, *allp, which="int4")
    err = jnp.abs(o16.astype(jnp.float32) - o8.astype(jnp.float32)).max()
    err4 = jnp.abs(o16.astype(jnp.float32) - o4.astype(jnp.float32)).max()
    print(f"bs={bs} seq={seq}  max|bf16-int8|={float(err):.5f}  "
          f"max|bf16-int4|={float(err4):.5f}")

    def timeit(which, n=20):
        np.asarray(many(q, *allp, which=which))
        t0 = time.perf_counter()
        for _ in range(n):
            r = many(q, *allp, which=which)
        np.asarray(r)
        return (time.perf_counter() - t0) / n / LAYERS * 1e6  # us/layer

    t16 = timeit("bf16")
    t8 = timeit("int8")
    t4 = timeit("int4")
    from sglang_tpu.mem_cache.memory_pool import scale_plane_rows

    kv16 = bs * npages_per * PS * 2 * KVH * D * 2
    kv8 = bs * npages_per * (PS * 2 * KVH * D + scale_plane_rows(KVH) * 512)
    kv4 = bs * npages_per * (PS * KVH * D + scale_plane_rows(KVH) * 512)
    print(
        f"  bf16: {t16:8.1f} us/layer ({kv16 / (t16 * 1e-6) / 1e9:6.1f} GB/s)   "
        f"int8: {t8:8.1f} us/layer ({kv8 / (t8 * 1e-6) / 1e9:6.1f} GB/s)   "
        f"int4: {t4:8.1f} us/layer ({kv4 / (t4 * 1e-6) / 1e9:6.1f} GB/s)"
    )
    print(
        f"  speedups: int8 {t16 / t8:.2f}x   int4 {t16 / t4:.2f}x "
        f"(vs int8: {t8 / t4:.2f}x)"
    )


if __name__ == "__main__":
    print(jax.devices())
    for bs, seq in ((64, 256), (64, 1024)):
        run(bs, seq)
