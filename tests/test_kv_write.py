"""Oracle tests: Pallas paged KV write == XLA scatter path.

The decode hot loop writes one token per row into the paged pool; the
Pallas kernel (`ops/kv_write.py`) must match the XLA formulation in
`layers/attention/base.py write_kv_pages` for both bf16 and int8
(per-(token, head) scales) KV. int8 values may differ by 1 LSB on a
vanishing fraction of elements (x/s landing exactly on a round-half
boundary compiles differently in the two paths).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sglang_tpu.layers.attention.base import write_kv_pages
from sglang_tpu.ops.kv_write import paged_kv_write


def _mk(kv_dtype, P=28, kvh=4, ps=16, d=128, T=24, seed=0):
    rng = np.random.default_rng(seed)
    kvh2 = 2 * kvh
    if kv_dtype == "int8":
        pages = jnp.asarray(
            rng.integers(-127, 127, (P, kvh2, ps, d)), jnp.int8
        )
        from sglang_tpu.mem_cache.memory_pool import scale_plane_rows

        S = scale_plane_rows(kvh)
        scales = jnp.asarray(
            np.abs(rng.standard_normal((P, S, 128))).astype(np.float32)
        )
        pool = (pages, scales)
    else:
        pool = jnp.asarray(
            rng.standard_normal((P, kvh2, ps, d)), jnp.bfloat16
        )
    k_new = jnp.asarray(rng.standard_normal((T, kvh, d)) * 3, jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((T, kvh, d)) * 3, jnp.bfloat16)
    # one slot per DISTINCT page for "real" rows (the decode contract:
    # each batch row owns its tail page; page-aligned radix sharing means
    # no two rows write the same page) + a few page-0 parked rows
    parked = min(4, max(0, T - 1))
    n_real = T - parked
    assert n_real <= P - 1
    pages_pick = rng.permutation(P - 1)[:n_real] + 1
    real = pages_pick * ps + rng.integers(0, ps, n_real)
    loc = np.concatenate([real, np.zeros(parked, np.int64)]).astype(np.int32)
    return pool, k_new, v_new, jnp.asarray(loc)


def _check(pool, k_new, v_new, loc):
    ref = write_kv_pages(pool, k_new, v_new, loc)
    kv = jnp.concatenate([k_new, v_new], axis=1)
    got = paged_kv_write(pool, kv, loc, interpret=True)
    if isinstance(ref, tuple):
        rp, gp = np.asarray(ref[0]), np.asarray(got[0])
        rs, gs = np.asarray(ref[1]), np.asarray(got[1])
        # page 0 is the garbage page: parked duplicate writes may resolve
        # in any order there
        diff = np.abs(gp[1:].astype(np.int32) - rp[1:].astype(np.int32))
        assert diff.max() <= 1 and (diff > 0).mean() < 1e-4, (
            diff.max(),
            (diff > 0).mean(),
        )
        np.testing.assert_allclose(gs[1:], rs[1:], rtol=1e-6)
    else:
        np.testing.assert_array_equal(
            np.asarray(got.astype(jnp.float32))[1:],
            np.asarray(ref.astype(jnp.float32))[1:],
        )


@pytest.mark.parametrize("kv_dtype", ["bf16", "int8"])
def test_kv_write_matches_scatter(kv_dtype):
    _check(*_mk(kv_dtype))


def test_kv_write_small_batch():
    # T < nbuf exercises the short-ring path
    _check(*_mk("bf16", T=3))


def test_kv_write_ps64_int8_scale_layout():
    # serving config geometry: ps=64, kvh=8 -> S=8 rows, 2 heads per row
    _check(*_mk("int8", P=20, kvh=8, ps=64, d=128, T=16))
