"""Isolate KV-write cost in a fused 32-layer decode-like loop on chip.

Variants: none (attention only), flat (current flat-row scatter),
window (.at[page, :, off] window scatter).
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
LAYERS = 32


def write_flat(pages, kv, page, off):
    P, two_kvh, ps, d = pages.shape
    t = kv.shape[0]
    h = jnp.arange(two_kvh, dtype=page.dtype)
    rows = (page[:, None] * two_kvh + h[None, :]) * ps + off[:, None]
    flat = pages.reshape(P * two_kvh * ps, d)
    flat = flat.at[rows.reshape(-1)].set(kv.reshape(t * two_kvh, d))
    return flat.reshape(pages.shape)


def write_window(pages, kv, page, off):
    return pages.at[page, :, off].set(kv)


def run(bs, seq, variant):
    rng = np.random.default_rng(0)
    pmax = 64
    npages_per = -(-seq // PS)
    total_pages = bs * npages_per + 1
    pages = jnp.asarray(
        rng.standard_normal((total_pages, 2 * KVH, PS, D)) * 0.3, jnp.bfloat16
    )
    page_table = np.zeros((bs, pmax), np.int32)
    nx = 1
    seq_lens = np.full(bs, seq, np.int32)
    for i in range(bs):
        page_table[i, :npages_per] = range(nx, nx + npages_per)
        nx += npages_per
    q = jnp.asarray(rng.standard_normal((bs, QH, D)) * 0.3, jnp.bfloat16)
    kv_new = jnp.asarray(
        rng.standard_normal((bs, 2 * KVH, D)) * 0.3, jnp.bfloat16
    )
    slot = jnp.asarray((seq_lens - 1) % PS + ((page_table[:, (seq - 1) // PS])) * PS)
    page = slot // PS
    off = slot % PS
    pt_dev = jnp.asarray(page_table)
    sl_dev = jnp.asarray(seq_lens)
    sm = 1.0 / np.sqrt(D)

    @functools.partial(jax.jit, static_argnames=("which",), donate_argnums=(1,))
    def many(q, pages, which):
        def body(i, carry):
            q, pages = carry
            if which == "flat":
                pages = write_flat(pages, kv_new, page, off)
            elif which == "window":
                pages = write_window(pages, kv_new, page, off)
            o = paged_decode_attention(q, pages, sl_dev, pt_dev, sm_scale=sm)
            return (o.astype(q.dtype), pages)

        return jax.lax.fori_loop(0, LAYERS, body, (q, pages))

    def timeit(f, n=20):
        r = f()
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = f()
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n / LAYERS * 1e6

    state = {"pages": pages}

    def step():
        out, p2 = many(q, state["pages"], which=variant)
        state["pages"] = p2
        return out

    t = timeit(step)
    print(f"bs={bs} seq={seq} {variant:7s}: {t:8.1f} us/layer")


if __name__ == "__main__":
    print(jax.devices())
    for variant in ("none", "window", "flat"):
        for bs, seq in ((64, 512), (128, 512)):
            run(bs, seq, variant)
