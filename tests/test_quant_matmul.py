"""Fused dequant-matmul kernel parity (interpret mode) vs the jnp path
(reference `sgl-kernel/tests/` GEMM coverage)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax
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
    q8 = jnp.asarray(qi, jnp.int8)
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
    # the int8->int4 cast stays INSIDE one jit: int4 arrays crossing a jit
    # boundary trigger a recursive device_put on some PJRT runtimes (same
    # class of bug the model loader's zero-weights path works around)
    out = jax.jit(
        lambda x, q8, s, z: matmul_int4(
            x, q8.astype(jnp.int4), s, z, group=g, bn=256, bk=256,
            interpret=True,
        )
    )(x, q8, s, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-2, rtol=1e-3)


def test_w8a8_int8_numerics():
    """Dynamic-activation int8 GEMM stays close to the fp32 product and
    beats a naive per-tensor scheme on outlier rows."""
    import numpy as np

    from sglang_tpu.layers.linear import W8A8Int8Linear

    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 256)).astype(np.float32)
    x[3] *= 40.0  # outlier row: per-token scaling must absorb it
    w = rng.standard_normal((256, 128)).astype(np.float32) * 0.05
    m = W8A8Int8Linear()
    wq = m.quantize(w)
    y = np.asarray(m.apply({k: jnp.asarray(v) for k, v in wq.items()}, jnp.asarray(x)))
    ref = x @ w
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 0.03, rel
    row_rel = np.abs(y[3] - ref[3]).max() / np.abs(ref[3]).max()
    assert row_rel < 0.03, row_rel


def test_w8a8_int8_engine_generates():
    """End-to-end engine run with w8a8_int8 quantization produces sane
    output (quantized logits may reorder ties, so no token equality)."""
    import uuid

    import numpy as np

    from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
    from sglang_tpu.managers.scheduler import Scheduler
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from tests.test_utils import tiny_runner, tiny_server_args

    sa = tiny_server_args(quantization="w8a8_int8")
    sched = Scheduler(sa, tiny_runner(sa))
    rid = uuid.uuid4().hex
    sched.add_request(
        TokenizedGenerateReqInput(
            rid=rid, input_ids=[5, 9, 13, 2],
            sampling_params=SamplingParams(
                max_new_tokens=8, temperature=0.0, ignore_eos=True
            ),
        )
    )
    steps = 0
    out = None
    while sched.has_work():
        for o in sched.step():
            if o.finished:
                out = o
        steps += 1
        assert steps < 200
    assert out is not None and len(out.output_ids) == 8
    assert sched.check_memory() == 0
