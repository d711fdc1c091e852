"""Elastic EP (P9, reference elastic_ep/): backup replicas + active-rank
masks. The invariant under test: with exact backup replicas and lossless
dispatch, deactivating any single rank leaves MoE output EXACTLY equal to
the all-active (and single-device fused_moe) result; recovery restores the
mask with no weight movement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sglang_tpu.layers.moe import fused_moe
from sglang_tpu.parallel.elastic_ep import (
    ExpertBackupManager,
    backup_placement,
    make_elastic_ep_moe,
)


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >= 4 virtual devices")
    return Mesh(np.array(devs[:4]), ("model",))


def _problem(seed, t=32, h=16, m=8, e=8, k=2):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((t, h)).astype(np.float32)
    router = rng.standard_normal((h, e)).astype(np.float32) * 0.5
    w1 = rng.standard_normal((e, h, 2 * m)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((e, m, h)).astype(np.float32) * 0.1
    return x, router, w1, w2, k


def test_backup_placement_covers_every_expert_twice():
    p = backup_placement(8, 4)
    assert p.shape == (4, 4)
    counts = np.bincount(p.reshape(-1), minlength=8)
    assert (counts == 2).all()
    # rank r's backups are rank (r+1)%ep's primaries
    assert (p[0, 2:] == p[1, :2]).all()


def test_single_rank_failure_is_exact(mesh):
    x, router, w1, w2, k = _problem(0)
    ep = 4
    ref = fused_moe(
        jnp.asarray(x), jnp.asarray(router), jnp.asarray(w1), jnp.asarray(w2),
        top_k=k, norm_topk_prob=True,
    )
    mgr = ExpertBackupManager(num_experts=8, ep=ep)
    w1p, w2p = mgr.place_weights(w1, w2)
    fn = jax.jit(
        make_elastic_ep_moe(
            mesh, 8, ep, "model", top_k=k, lossless=True, norm_topk_prob=True
        )
    )
    sh = NamedSharding(mesh, P("model", None))
    args = (
        jax.device_put(jnp.asarray(x), sh),
        jnp.asarray(router),
        jax.device_put(jnp.asarray(w1p), NamedSharding(mesh, P("model", None, None))),
        jax.device_put(jnp.asarray(w2p), NamedSharding(mesh, P("model", None, None))),
    )
    # all active == fused_moe
    out = fn(*args, jnp.asarray(mgr.active_mask()))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # each single-rank failure: EXACT same output via backups
    for dead in range(ep):
        mgr.deactivate(dead)
        out_f = fn(*args, jnp.asarray(mgr.active_mask()))
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(ref), atol=2e-5,
            err_msg=f"rank {dead} failover diverged",
        )
        mgr.recover(dead)
    # recovered mask is all-active again
    assert mgr.active_mask().all()


def test_double_failure_drops_only_dead_experts(mesh):
    """Primary + its backup host both down: those picks drop (weight 0);
    the rest of the batch still computes."""
    x, router, w1, w2, k = _problem(1)
    ep = 4
    mgr = ExpertBackupManager(num_experts=8, ep=ep)
    w1p, w2p = mgr.place_weights(w1, w2)
    fn = jax.jit(
        make_elastic_ep_moe(
            mesh, 8, ep, "model", top_k=k, lossless=True, norm_topk_prob=True
        )
    )
    sh = NamedSharding(mesh, P("model", None))
    args = (
        jax.device_put(jnp.asarray(x), sh),
        jnp.asarray(router),
        jax.device_put(jnp.asarray(w1p), NamedSharding(mesh, P("model", None, None))),
        jax.device_put(jnp.asarray(w2p), NamedSharding(mesh, P("model", None, None))),
    )
    # rank 1 primary experts {2,3}; their backups live on rank 0 — kill both
    mgr.deactivate(1)
    mgr.deactivate(0)
    out = np.asarray(fn(*args, jnp.asarray(mgr.active_mask())))
    assert np.isfinite(out).all()
    # picks routed to experts {0..3} are gone; others survive, so output
    # differs from ref but is not all-zero
    assert np.abs(out).sum() > 0
