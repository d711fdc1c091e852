"""Chain-tail decode KV batching (ops/chain_tail.py) correctness.

- flush equivalence: a chain tail flushed with `flush_tail` must produce
  byte-identical pool pages to the per-step `write_kv_pages` RMW path
  (the quantization formula is shared, so int8 pools match bit-exactly).
- engine equivalence: a multi-step decode workload must emit the same
  tokens with the tail path on and off (greedy, tiny model, CPU).
"""

import uuid

import jax.numpy as jnp
import numpy as np

from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
from sglang_tpu.managers.scheduler import Scheduler
from sglang_tpu.sampling.sampling_params import SamplingParams
from tests.test_utils import tiny_runner, tiny_server_args


def _mk_pool(num_pages, kvh2, ps, d, dtype, with_scales):
    rng = np.random.default_rng(0)
    pool = jnp.asarray(
        rng.standard_normal((num_pages, kvh2, ps, d)).astype(np.float32)
    )
    if dtype == "int8":
        pool = jnp.clip(jnp.round(pool * 20), -127, 127).astype(jnp.int8)
        rows = max(8, kvh2)
        scales = jnp.asarray(
            np.abs(rng.standard_normal((num_pages, rows, 128))).astype(
                np.float32
            )
        )
        return (pool, scales) if with_scales else pool
    return pool.astype(jnp.bfloat16)


def _flush_reference(pages, kv_rows, locs):
    """Per-token write_kv_pages (the per-step RMW oracle)."""
    from sglang_tpu.layers.attention.base import write_kv_pages

    kvh = kv_rows.shape[1] // 2
    for t in range(kv_rows.shape[0]):
        k = kv_rows[t : t + 1, :kvh]
        v = kv_rows[t : t + 1, kvh:]
        pages = write_kv_pages(
            pages, k, v, jnp.asarray([locs[t]], jnp.int32)
        )
    return pages


def _run_flush_case(kv_dtype):
    from sglang_tpu.ops.chain_tail import (
        build_tail_flush_jobs,
        flush_tail,
        quantize_rows,
    )

    L, bs, K, kvh2, ps, d = 2, 4, 6, 4, 16, 32
    ctx = 128
    pmax = 8
    num_pages = 1 + bs * pmax  # page 0 reserved garbage, rows disjoint
    rng = np.random.default_rng(1)
    pool_dtype = jnp.int8 if kv_dtype == "int8" else jnp.bfloat16
    with_scales = kv_dtype == "int8"
    # fused pool [L * P, ...]
    fused = _mk_pool(L * num_pages, kvh2, ps, d, kv_dtype, with_scales)
    # per-row chain geometry: row 3 is padding (base 0); row 1 crosses a
    # page boundary; row 2 is capped by ctx
    base = np.array([5, ps - 2, ctx - 3, 0], np.int32)
    # each row owns a disjoint page range (like the real allocator)
    pt = (
        1 + np.arange(bs * pmax, dtype=np.int32).reshape(bs, pmax)
    )
    kv_new = rng.standard_normal((bs, K, kvh2, d)).astype(np.float32)

    # build the tail the way the chain does: quantize per step
    tvs, tss = [], []
    for k in range(K):
        q, s = quantize_rows(
            jnp.asarray(kv_new[:, k, : kvh2 // 2]),
            jnp.asarray(kv_new[:, k, kvh2 // 2 :]),
            pool_dtype,
        )
        tvs.append(q)
        tss.append(s)
    # head-major tail layout [bs, kvh2, K, d]
    tv1 = jnp.transpose(jnp.stack(tvs, axis=0), (1, 2, 0, 3))
    ts1 = (
        jnp.transpose(jnp.stack(tss, axis=0), (1, 2, 0))
        if with_scales
        else None
    )
    tail_vals = jnp.stack([tv1] * L, axis=0)  # [L, bs, kvh2, K, d]
    tail_scales = (
        jnp.stack([ts1] * L, axis=0) if with_scales else None
    )

    wrp, wrs = build_tail_flush_jobs(
        jnp.asarray(base), jnp.asarray(pt), K, ps, ctx
    )
    got = flush_tail(fused, tail_vals, tail_scales, wrp, wrs, num_pages)

    # oracle: per-token RMW into each layer's region
    want = fused
    for li in range(L):
        for r in range(bs):
            if base[r] == 0:
                continue
            for k in range(K):
                pos = base[r] - 1 + k
                if pos >= ctx:
                    continue
                loc = (pt[r, pos // ps] + li * num_pages) * ps + pos % ps
                kvh = kvh2 // 2
                want = _flush_reference(
                    want,
                    jnp.asarray(kv_new[r : r + 1, k]),
                    [loc],
                )
    if with_scales:
        np.testing.assert_array_equal(
            np.asarray(got[0]), np.asarray(want[0])
        )
        np.testing.assert_allclose(
            np.asarray(got[1]), np.asarray(want[1]), rtol=1e-6
        )
    else:
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=1e-2, atol=1e-2,
        )


def test_flush_matches_per_step_write_bf16():
    _run_flush_case("auto")


def test_flush_matches_per_step_write_int8():
    _run_flush_case("int8")


def _run_engine(monkeypatch, tail_on, kv_dtype="auto"):
    monkeypatch.setenv("SGLANG_TPU_CHAIN_TAIL", "1" if tail_on else "0")
    sa = tiny_server_args(
        enable_overlap_schedule=True,
        decode_multi_step=6,
        kv_cache_dtype=kv_dtype,
    )
    sched = Scheduler(sa, tiny_runner(sa))
    assert sched.runner._chain_tail == tail_on
    rng = np.random.default_rng(7)
    rids = []
    for n in (5, 18, 33, 47, 21):
        rid = uuid.uuid4().hex
        sched.add_request(
            TokenizedGenerateReqInput(
                rid=rid,
                input_ids=rng.integers(3, 250, size=n).tolist(),
                sampling_params=SamplingParams(
                    max_new_tokens=24, temperature=0.0, ignore_eos=True
                ),
            )
        )
        rids.append(rid)
    outs = {}
    steps = 0
    while sched.has_work():
        for o in sched.step():
            if o.finished:
                outs[o.rid] = o.output_ids
        steps += 1
        assert steps < 2000
    return [outs[r] for r in rids]


def test_engine_tail_matches_per_step(monkeypatch):
    out_tail = _run_engine(monkeypatch, True)
    out_base = _run_engine(monkeypatch, False)
    assert out_tail == out_base


def test_engine_tail_matches_per_step_int8(monkeypatch):
    out_tail = _run_engine(monkeypatch, True, kv_dtype="int8")
    out_base = _run_engine(monkeypatch, False, kv_dtype="int8")
    assert out_tail == out_base
