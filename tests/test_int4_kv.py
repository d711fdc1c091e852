"""int4 KV cache (nibble-packed values + per-(token, head) scales).

Pipeline exactness (pack/unpack, write paths, reference attention) and
composition (tp placement-invariance, HiCache blob roundtrip) — the
same matrix the int8 tests pin, at half the KV bytes."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sglang_tpu.layers.attention.base import (
    pack_int4,
    quantize_kv_rows,
    unpack_int4,
    write_kv_pages,
)

from tests.test_int8_kv_compose import _drain, _generate, _submit


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    qk = jnp.asarray(rng.integers(-7, 8, (5, 3, 128)), jnp.int32)
    qv = jnp.asarray(rng.integers(-7, 8, (5, 3, 128)), jnp.int32)
    packed = pack_int4(qk, qv)
    assert packed.dtype == jnp.uint8 and packed.shape == (5, 3, 128)
    k, v = unpack_int4(packed)
    np.testing.assert_array_equal(np.asarray(k), np.asarray(qk))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(qv))


def _dequant(q, s):
    """packed [T, kvh, d] + scales [T, 2kvh] -> [T, 2kvh, d] f32."""
    k, v = unpack_int4(q)
    deq = np.concatenate([np.asarray(k), np.asarray(v)], axis=1)
    return deq * np.asarray(s)[..., None]


def test_quantize_kv_rows_int4_error_bound():
    rng = np.random.default_rng(1)
    kv = jnp.asarray(rng.standard_normal((7, 4, 128)), jnp.float32)
    q, s = quantize_kv_rows(kv, int4=True)
    assert q.shape == (7, 2, 128) and q.dtype == jnp.uint8
    deq = _dequant(q, s)
    err = np.abs(deq - np.asarray(kv))
    # quantization step is scale = max|x|/7 -> error <= scale/2
    bound = np.asarray(s)[..., None] / 2 + 1e-6
    assert (err <= bound).all()


def test_write_paths_agree_and_reference_attention_exact():
    """XLA token scatter and the whole-page jobs path must produce the
    same stored bytes; reference decode attention over the pool must
    equal direct attention on the dequantized values."""
    from sglang_tpu.layers.attention.reference_backend import _gather_kv

    rng = np.random.default_rng(2)
    P, kvh, ps, d = 6, 2, 16, 128
    pool = (
        jnp.zeros((P, kvh, ps, d), jnp.uint8),
        jnp.zeros((P, 8, 128), jnp.float32),
    )
    T = 24
    k = jnp.asarray(rng.standard_normal((T, kvh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, kvh, d)), jnp.float32)
    loc = jnp.asarray(rng.permutation(P * ps)[:T], jnp.int32)
    vals, scales = write_kv_pages(pool, k, v, loc)
    # independent expectation
    kv = jnp.concatenate([k, v], axis=1)
    q_exp, s_exp = quantize_kv_rows(kv, int4=True)
    page, off = np.asarray(loc) // ps, np.asarray(loc) % ps
    va, sa = np.asarray(vals), np.asarray(scales)
    for t in range(T):
        np.testing.assert_array_equal(
            va[page[t], :, off[t]], np.asarray(q_exp)[t]
        )
        np.testing.assert_allclose(
            sa[page[t], : 2 * kvh, off[t]], np.asarray(s_exp)[t]
        )
    # gather path dequantizes exactly
    pt = jnp.asarray(np.arange(P)[None], jnp.int32)
    kg, vg = _gather_kv((vals, scales), pt)
    deq = _dequant(q_exp, s_exp)
    got_k = np.asarray(kg)[0][np.asarray(loc)]
    np.testing.assert_allclose(got_k, deq[:, :kvh], atol=1e-6)


def test_int4_kv_tp2_matches_tp1_exactly():
    prompts = [list(range(3, 19)), list(range(40, 49)), [7, 8, 9, 10]]
    a = _generate(1, prompts, kv="int4")
    b = _generate(2, prompts, kv="int4")
    assert a == b


def test_int4_kv_hicache_spill_reload():
    """Evict an int4-KV request to the host tier and reload: the second
    pass must match the uncached generation exactly."""
    from sglang_tpu.managers.scheduler import Scheduler

    from tests.test_utils import tiny_runner, tiny_server_args

    sa = tiny_server_args(
        kv_cache_dtype="int4", enable_hierarchical_cache=True
    )
    sched = Scheduler(sa, tiny_runner(sa))
    prompt = list(range(3, 43))  # 2+ pages (page=16)
    _submit(sched, prompt, rid="a")
    first = _drain(sched)["a"].output_ids
    sched.hicache.wait_idle()  # async spill commits off-thread
    assert sched.hicache.host.num_pages >= 2
    assert sched.flush_cache()  # device tree gone, host copy stays
    _submit(sched, prompt, rid="b")
    again = _drain(sched)["b"].output_ids
    assert again == first
    assert sched.stats.num_hicache_tokens >= 32
    assert sched.check_memory() == 0


def test_int4_vs_fp32_kv_logit_closeness():
    """Accuracy sanity: int4-KV greedy decode should stay close to the
    fp32-KV run on a tiny model (identical weights, same prompts)."""
    prompts = [list(range(3, 23))]
    (a,) = _generate(1, prompts, kv="auto")
    (b,) = _generate(1, prompts, kv="int4")
    agree = sum(x == y for x, y in zip(a, b))
    assert agree >= len(a) // 2, (a, b)
