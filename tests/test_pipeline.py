"""Pipeline-parallel forward (reference PP groups + microbatch loop):
the GPipe shard_map schedule must equal the sequential layer stack, for
pp x tp meshes and different microbatch counts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sglang_tpu.parallel.pipeline import make_pipeline_forward, stack_layer_params


def _layers(rng, L=8, h=16, m=32):
    return [
        {
            "w1": rng.standard_normal((h, m)).astype(np.float32) * 0.3,
            "w2": rng.standard_normal((m, h)).astype(np.float32) * 0.3,
            "g": rng.standard_normal(h).astype(np.float32) * 0.1 + 1.0,
        }
        for _ in range(L)
    ]


def _layer_fn(lp, x):
    # pre-norm residual MLP block (the PP-relevant shape of a decoder layer)
    y = x * lp["g"]
    return x + jnp.tanh(y @ lp["w1"]) @ lp["w2"]


def _sequential(layers, x):
    for lp in layers:
        x = _layer_fn({k: jnp.asarray(v) for k, v in lp.items()}, x)
    return x


@pytest.mark.parametrize("pp,M", [(2, 2), (4, 4), (8, 2), (2, 8)])
def test_pipeline_matches_sequential(pp, M):
    devs = jax.devices()
    if len(devs) < pp:
        pytest.skip("not enough devices")
    mesh = Mesh(np.array(devs[:pp]), ("pipe",))
    rng = np.random.default_rng(0)
    layers = _layers(rng, L=8)
    x = rng.standard_normal((16, 16)).astype(np.float32)
    ref = np.asarray(_sequential(layers, jnp.asarray(x)))

    stacked = stack_layer_params(
        [{k: jnp.asarray(v) for k, v in lp.items()} for lp in layers]
    )
    stacked = jax.device_put(stacked, NamedSharding(mesh, P("pipe")))
    fn = jax.jit(make_pipeline_forward(mesh, _layer_fn, "pipe", M))
    out = np.asarray(fn(stacked, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pipeline_with_tp_axis():
    """pp x tp mesh: PP over 'pipe', the layer itself GSPMD-TP over
    'model' (what a real serving stack composes)."""
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.array(devs[:4]).reshape(2, 2), ("pipe", "model"))
    rng = np.random.default_rng(1)
    layers = _layers(rng, L=4)
    x = rng.standard_normal((8, 16)).astype(np.float32)
    ref = np.asarray(_sequential(layers, jnp.asarray(x)))

    stacked = stack_layer_params(
        [{k: jnp.asarray(v) for k, v in lp.items()} for lp in layers]
    )
    sh = {
        "w1": NamedSharding(mesh, P("pipe", None, "model")),
        "w2": NamedSharding(mesh, P("pipe", "model", None)),
        "g": NamedSharding(mesh, P("pipe", None)),
    }
    stacked = {k: jax.device_put(v, sh[k]) for k, v in stacked.items()}
    fn = jax.jit(make_pipeline_forward(mesh, _layer_fn, "pipe", 2))
    out = np.asarray(fn(stacked, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5)
