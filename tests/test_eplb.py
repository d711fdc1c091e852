"""EPLB tests (reference `srt/eplb/`): balanced placement with hot-expert
replication, and the rebalanced EP dispatch staying exact vs fused_moe."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sglang_tpu.layers.moe import fused_moe
from sglang_tpu.parallel.eplb import (
    ExpertLoadRecorder,
    build_placed_weights,
    compute_placement,
    make_eplb_ep_moe,
    placement_stats,
)


def test_recorder():
    r = ExpertLoadRecorder(4)
    r.record(np.array([[0, 1], [0, 3]]))
    assert r.counts.tolist() == [2, 1, 0, 1]
    r.reset()
    assert r.counts.sum() == 0


def test_placement_balances_hot_expert():
    # expert 0 carries 10x the load; with spare slots it must replicate
    load = np.array([100, 10, 10, 10, 10, 10, 10, 10])
    ep, slots = 4, 3  # 12 slots for 8 experts -> 4 spare
    placement = compute_placement(load, ep, slots)
    assert placement.shape == (ep, slots)
    assert set(placement.reshape(-1)) == set(range(8))  # all experts placed
    n_rep0 = int((placement == 0).sum())
    assert n_rep0 >= 3  # the hot expert got the spare slots
    # replicas live on DIFFERENT ranks (traffic actually splits)
    assert max((placement[r] == 0).sum() for r in range(ep)) == 1
    stats = placement_stats(load, placement)
    naive = compute_placement(np.ones(8), ep, 2)  # contiguous-ish baseline
    naive_stats = placement_stats(load, naive)
    assert stats["imbalance"] < naive_stats["imbalance"]
    assert stats["imbalance"] < 1.5


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >= 4 virtual devices")
    return Mesh(np.array(devs[:4]), ("model",))


def test_eplb_dispatch_matches_fused(mesh):
    rng = np.random.default_rng(0)
    t, h, m, e, k = 32, 16, 8, 8, 2
    x = rng.standard_normal((t, h)).astype(np.float32)
    router = rng.standard_normal((h, e)).astype(np.float32)
    router[:, 2] += 1.0  # make expert 2 hot
    w1 = rng.standard_normal((e, h, 2 * m)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((e, m, h)).astype(np.float32) * 0.1
    ref = fused_moe(
        jnp.asarray(x), jnp.asarray(router), jnp.asarray(w1), jnp.asarray(w2),
        top_k=k, norm_topk_prob=True,
    )
    load = np.ones(e)
    load[2] = 20.0
    placement = compute_placement(load, ep=4, slots_per_rank=3)
    w1p, w2p = build_placed_weights(w1, w2, placement)
    fn = make_eplb_ep_moe(
        mesh, placement, "model", top_k=k, lossless=True, norm_topk_prob=True
    )
    out = jax.jit(fn)(
        jax.device_put(x, NamedSharding(mesh, P("model", None))),
        jnp.asarray(router),
        jax.device_put(w1p, NamedSharding(mesh, P("model", None, None))),
        jax.device_put(w2p, NamedSharding(mesh, P("model", None, None))),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
