"""Ring attention (context parallelism, reference CP): the rotating-KV
online-softmax schedule must equal full causal attention exactly."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sglang_tpu.parallel.ring_attention import make_ring_attention


def _full_attn(q, k, v, causal=True):
    t, h, d = q.shape
    scores = np.einsum("qhd,khd->qhk", q, k) / math.sqrt(d)
    if causal:
        mask = np.tril(np.ones((t, t), bool))
        scores = np.where(mask[:, None, :], scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("qhk,khd->qhd", p, v)


@pytest.mark.parametrize("cp,causal", [(4, True), (8, True), (4, False)])
def test_ring_matches_full(cp, causal):
    devs = jax.devices()
    if len(devs) < cp:
        pytest.skip("not enough devices")
    mesh = Mesh(np.array(devs[:cp]), ("cp",))
    rng = np.random.default_rng(0)
    t, h, d = 32, 2, 16  # t/cp per rank
    q = rng.standard_normal((t, h, d)).astype(np.float32)
    k = rng.standard_normal((t, h, d)).astype(np.float32)
    v = rng.standard_normal((t, h, d)).astype(np.float32)
    ref = _full_attn(q, k, v, causal)
    fn = jax.jit(make_ring_attention(mesh, "cp", causal=causal))
    sh = NamedSharding(mesh, P("cp"))
    out = np.asarray(
        fn(*(jax.device_put(x, sh) for x in (q, k, v)))
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)
