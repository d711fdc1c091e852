"""Stream-matmul kernels vs XLA dot at decode M — slope-timed.

Measurement rules learned the hard way on the tunneled runtime:
- block_until_ready is unreliable; sync with a real np.asarray readback.
- A readback costs ~28 ms RTT: time two outer counts and use the SLOPE.
- Consume ALL output columns (sum) or XLA dead-code-eliminates the
  unused part of the matmul and the "bandwidth" is fiction.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from sglang_tpu.ops.stream_matmul import (
    matmul_bf16_stream,
    matmul_w8a16_stream,
    matmul_w8a8_stream,
)

rng = np.random.default_rng(0)
ITERS = 24


def slope_time(fn, n1=2, n2=10):
    def total(n):
        r = fn()
        _ = np.asarray(r).ravel()[:4]
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        _ = np.asarray(r).ravel()[:4]
        return time.perf_counter() - t0

    t1, t2 = total(n1), total(n2)
    return (t2 - t1) / (n2 - n1) / ITERS


def run(m, k, n):
    wq = jnp.asarray(rng.integers(-127, 127, (k, n), dtype=np.int8))
    ws = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.01)
    wb = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
    x8 = jnp.asarray(rng.integers(-127, 127, (m, k), dtype=np.int8))
    xs = jnp.asarray(np.abs(rng.standard_normal(m)).astype(np.float32) * 0.01)
    x16 = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)

    got = matmul_w8a8_stream(x8, xs, wq, ws)
    ref = (
        jax.lax.dot_general(
            x8, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        * xs[:, None]
        * ws[None, :]
    ).astype(jnp.bfloat16)
    rel = float(
        jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    ) / max(1e-9, float(jnp.abs(ref.astype(jnp.float32)).max()))
    got16 = matmul_w8a16_stream(x16, wq, ws)
    ref16 = jnp.dot(x16, wq.astype(jnp.bfloat16) * ws[None, :])
    rel16 = float(
        jnp.abs(got16.astype(jnp.float32) - ref16.astype(jnp.float32)).max()
    ) / max(1e-9, float(jnp.abs(ref16.astype(jnp.float32)).max()))
    print(f"M={m} K={k} N={n}  w8a8 rel_err={rel:.2e}  w8a16 rel_err={rel16:.2e}")

    def fold8(x, y):
        # consume every output column with a NON-REASSOCIATABLE reduction:
        # sum(x@W) folds to x@(W@1) and the matmul vanishes; max does not
        s = jnp.max(jnp.abs(y.astype(jnp.float32)), axis=1, keepdims=True)
        return jnp.clip(
            x.astype(jnp.int32) + jnp.round(s * 1e-6).astype(jnp.int32) % 3 - 1,
            -127,
            127,
        ).astype(jnp.int8)

    def fold16(x, y):
        s = jnp.max(jnp.abs(y.astype(jnp.float32)), axis=1, keepdims=True)
        return (x + jnp.tanh(s) * 1e-3).astype(jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("which",))
    def many(x, which):
        def body(i, x):
            if which == "xla_conv":
                y = jnp.dot(x.astype(jnp.bfloat16), wq.astype(jnp.bfloat16)) * ws
                return fold16(x, y)
            if which == "xla_s8":
                y = jax.lax.dot_general(
                    x, wq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                return fold8(x, y)
            if which == "krn_w8a8":
                return fold8(x, matmul_w8a8_stream(x, xs, wq, ws))
            if which == "krn_w8a16":
                return fold16(x, matmul_w8a16_stream(x, wq, ws))
            return fold16(x, matmul_bf16_stream(x, wb))

        return jax.lax.fori_loop(0, ITERS, body, x)

    gb = wq.nbytes / 1e9
    for name, x0, b in (
        ("xla_conv ", x16, gb),
        ("xla_s8   ", x8, gb),
        ("krn_w8a8 ", x8, gb),
        ("krn_w8a16", x16, gb),
        ("krn_bf16 ", x16, wb.nbytes / 1e9),
    ):
        dt = slope_time(lambda: many(x0, which=name.strip()))
        print(f"  {name}: {dt*1e6:7.1f} us  {b/dt:6.0f} GB/s")


if __name__ == "__main__":
    print(jax.devices())
    run(64, 4096, 28672)
    run(256, 4096, 28672)
    run(64, 14336, 4096)
