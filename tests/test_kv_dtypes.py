"""FP8 KV-cache e2e (reference `test_fp8kv_*` role, scaled to a tiny model
on CPU): generation with fp8-stored KV must stay close to the bf16-KV
output and the engine must run end-to-end."""

import uuid

import jax.numpy as jnp
import numpy as np
import pytest

from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
from sglang_tpu.managers.scheduler import Scheduler
from sglang_tpu.sampling.sampling_params import SamplingParams
from tests.test_utils import tiny_runner, tiny_server_args


def run_greedy(sched, prompt, n=16):
    rid = uuid.uuid4().hex
    sched.add_request(
        TokenizedGenerateReqInput(
            rid=rid,
            input_ids=list(prompt),
            sampling_params=SamplingParams(
                max_new_tokens=n, temperature=0.0, ignore_eos=True
            ),
        )
    )
    out = None
    while sched.has_work():
        for o in sched.step():
            if o.finished:
                out = o
    return out.output_ids


@pytest.mark.parametrize("kv_dtype", ["fp8_e4m3", "fp8_e5m2"])
def test_fp8_kv_generates(kv_dtype):
    sa = tiny_server_args(kv_cache_dtype=kv_dtype)
    sched = Scheduler(sa, tiny_runner(sa))
    prompt = np.random.default_rng(0).integers(3, 250, size=12).tolist()
    ids_fp8 = run_greedy(sched, prompt)
    assert len(ids_fp8) == 16

    sa16 = tiny_server_args()
    sched16 = Scheduler(sa16, tiny_runner(sa16))
    ids_bf16 = run_greedy(sched16, prompt)
    # fp8 KV loses precision; early tokens should still agree
    agree = sum(a == b for a, b in zip(ids_fp8, ids_bf16))
    assert agree >= 8, (ids_fp8, ids_bf16)


def test_fp8_kv_pool_is_half_size():
    sa8 = tiny_server_args(kv_cache_dtype="fp8_e4m3", max_total_tokens=None)
    r8 = tiny_runner(sa8)
    sa16 = tiny_server_args(max_total_tokens=None)
    r16 = tiny_runner(sa16)
    assert r8.kv_pool.layer_view(0).dtype.itemsize == 1
    assert r8.max_total_tokens >= r16.max_total_tokens * 1.9


def test_int8_kv_generates_and_agrees():
    """int8 KV (per-token-head scales, TPU-native compression): greedy
    output should agree with bf16-KV output at least as well as fp8 —
    ~0.4% quantization error vs e4m3's ~6%."""
    sa = tiny_server_args(kv_cache_dtype="int8")
    sched = Scheduler(sa, tiny_runner(sa))
    prompt = np.random.default_rng(0).integers(3, 250, size=12).tolist()
    ids_i8 = run_greedy(sched, prompt)
    assert len(ids_i8) == 16

    sa16 = tiny_server_args()
    sched16 = Scheduler(sa16, tiny_runner(sa16))
    ids_bf16 = run_greedy(sched16, prompt)
    agree = sum(a == b for a, b in zip(ids_i8, ids_bf16))
    assert agree >= 12, (ids_i8, ids_bf16)


def test_int8_kv_pool_capacity():
    sa8 = tiny_server_args(kv_cache_dtype="int8", max_total_tokens=None)
    r8 = tiny_runner(sa8)
    sa16 = tiny_server_args(max_total_tokens=None)
    r16 = tiny_runner(sa16)
    vals, scales = r8.kv_pool.layer_view(0)
    assert vals.dtype.itemsize == 1
    assert scales.dtype == jnp.float32
    # per-page scale plane: [P, S, 128] with S a multiple of 8
    from sglang_tpu.mem_cache.memory_pool import scale_plane_rows

    sub = scale_plane_rows(vals.shape[1] // 2)
    assert scales.shape == (vals.shape[0], sub, 128)
    # pool sizing is exact: the tiny config's 8-sublane tile padding makes
    # int8 LARGER per page than bf16 here (ps=16, d=16), so assert the
    # analytic ratio rather than a win; the win is a real-geometry
    # property, asserted below without allocating
    kvh, ps, d = vals.shape[1] // 2, vals.shape[2], vals.shape[3]
    b8 = 2 * kvh * ps * d + scale_plane_rows(kvh) * 512
    b16 = 2 * kvh * ps * d * 2
    ratio = b16 / b8
    assert r8.max_total_tokens >= r16.max_total_tokens * ratio * 0.9
    # llama-8B geometry (kvh=8, ps=64, d=128): 1.88x capacity vs bf16
    # (was 1.94x with the flat scale plane; the row-per-head layout costs
    # ~3% more scale memory but keeps Mosaic indexing static, enables the
    # Pallas write kernel, and shards by KV head for tp>1)
    big8 = 2 * 8 * 64 * 128 + scale_plane_rows(8) * 512
    big16 = 2 * 8 * 64 * 128 * 2
    assert big16 / big8 > 1.85
