"""Fused dequant-matmul kernel parity (interpret mode) vs the jnp path
(reference `sgl-kernel/tests/` GEMM coverage)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sglang_tpu.ops.quant_matmul import matmul_int4, matmul_int8


def test_int8_matmul_matches_reference():
    rng = np.random.default_rng(0)
    m, k, n = 16, 512, 1024
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    q = jnp.asarray(rng.integers(-127, 128, size=(k, n)), jnp.int8)
    s = jnp.asarray(rng.uniform(0.001, 0.01, size=(1, n)), jnp.float32)
    ref = (jnp.dot(x, q.astype(jnp.float32)) * s).astype(jnp.float32)
    out = matmul_int8(x, q, s, bn=256, bk=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-2, rtol=1e-4)


def test_int8_matmul_single_kblock():
    rng = np.random.default_rng(1)
    m, k, n = 8, 256, 512
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    q = jnp.asarray(rng.integers(-127, 128, size=(k, n)), jnp.int8)
    s = jnp.asarray(rng.uniform(0.001, 0.01, size=(1, n)), jnp.float32)
    ref = jnp.dot(x, q.astype(jnp.float32)) * s
    out = matmul_int8(x, q, s, bn=512, bk=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-2, rtol=1e-4)


@pytest.mark.parametrize("with_zeros", [False, True])
def test_int4_matmul_matches_reference(with_zeros):
    rng = np.random.default_rng(2)
    m, k, n, g = 16, 512, 512, 128
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    qi = rng.integers(-8, 8, size=(k, n))
    q = jnp.asarray(qi, jnp.int4)
    s = jnp.asarray(rng.uniform(0.001, 0.01, size=(k // g, n)), jnp.float32)
    z = (
        jnp.asarray(rng.integers(-8, 8, size=(k // g, n)), jnp.int8)
        if with_zeros
        else None
    )
    qf = jnp.asarray(qi, jnp.float32).reshape(k // g, g, n)
    if with_zeros:
        qf = qf - z.astype(jnp.float32)[:, None, :]
    wdeq = (qf * s[:, None, :]).reshape(k, n)
    ref = jnp.dot(x, wdeq)
    out = matmul_int4(x, q, s, z, group=g, bn=256, bk=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-2, rtol=1e-3)
