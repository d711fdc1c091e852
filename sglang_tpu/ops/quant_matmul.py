"""Fused dequantize + matmul Pallas kernels (W8A16 / W4A16).

Parity with reference `sgl-kernel/csrc/gemm/` (int8/awq/gptq/marlin GEMMs)
— the "speed-of-light dequant matmul" path (SURVEY §7.5). XLA's generic
int->bf16 convert-then-dot leaves several x of HBM bandwidth on the table;
these kernels stream the quantized weight through VMEM, convert next to the
MXU, and hit the weight-read bound that governs small-batch decode.

Layouts match `layers/linear.py`:
- int8: q [K, N] int8, s [1, N] f32  ->  y = (x @ q) * s
- int4: q [K, N] int4, s [K/G, N] f32 (+ z [K/G, N] int8) ->
        y = x @ ((q - z) * s)   (group axis along K)

Grid: (N blocks, K blocks), K innermost for accumulation; Pallas pipelines
the HBM->VMEM block streaming automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _int8_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_kblocks):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot(
        x_ref[...],
        q_ref[...].astype(x_ref.dtype),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_kblocks - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn", "bk", "interpret"))
def matmul_int8(
    x: jax.Array,  # [M, K] bf16/f32
    q: jax.Array,  # [K, N] int8
    s: jax.Array,  # [1, N] f32
    bn: int = 512,
    bk: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    m, k = x.shape
    _, n = q.shape
    bn = min(bn, n)
    bk = min(bk, k)
    assert n % bn == 0 and k % bk == 0, (n, bn, k, bk)
    grid = (n // bn, k // bk)
    out = pl.pallas_call(
        functools.partial(_int8_kernel, n_kblocks=grid[1]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, bk), lambda ni, ki: (0, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda ni, ki: (ki, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda ni, ki: (0, ni), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (m, bn), lambda ni, ki: (0, ni), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=k * n + m * k * 2 + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, q, s)
    return out


def _int4_kernel(x_ref, q_ref, s_ref, z_ref, o_ref, acc_ref, *, n_kblocks, group):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    bk, bn = q_ref.shape
    g = bk // group
    qf = q_ref[...].astype(jnp.float32).reshape(g, group, bn)
    if z_ref is not None:
        qf = qf - z_ref[...].astype(jnp.float32)[:, None, :]
    w = (qf * s_ref[...][:, None, :]).reshape(bk, bn).astype(x_ref.dtype)
    acc_ref[...] += jax.lax.dot(
        x_ref[...], w, preferred_element_type=jnp.float32
    )

    @pl.when(k == n_kblocks - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("group", "bn", "bk", "interpret")
)
def matmul_int4(
    x: jax.Array,  # [M, K]
    q: jax.Array,  # [K, N] int4
    s: jax.Array,  # [K/G, N] f32
    z=None,  # [K/G, N] int8 or None
    group: int = 128,
    bn: int = 512,
    bk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    m, k = x.shape
    _, n = q.shape
    bn = min(bn, n)
    bk = min(bk, k)
    assert k % bk == 0 and n % bn == 0 and bk % group == 0
    grid = (n // bn, k // bk)
    gpb = bk // group  # scale rows per k-block
    in_specs = [
        pl.BlockSpec((m, bk), lambda ni, ki: (0, ki), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bn), lambda ni, ki: (ki, ni), memory_space=pltpu.VMEM),
        pl.BlockSpec((gpb, bn), lambda ni, ki: (ki, ni), memory_space=pltpu.VMEM),
    ]
    args = [x, q, s]
    if z is not None:
        in_specs.append(
            pl.BlockSpec((gpb, bn), lambda ni, ki: (ki, ni), memory_space=pltpu.VMEM)
        )
        args.append(z)
        kernel = functools.partial(
            _int4_kernel, n_kblocks=grid[1], group=group
        )
    else:
        kernel = functools.partial(
            _int4_z_none_kernel, n_kblocks=grid[1], group=group
        )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (m, bn), lambda ni, ki: (0, ni), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=k * n // 2 + m * k * 2 + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out


def _int4_z_none_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_kblocks, group):
    _int4_kernel(
        x_ref, q_ref, s_ref, None, o_ref, acc_ref, n_kblocks=n_kblocks, group=group
    )


def use_pallas_matmul(x: jax.Array, k: int, n: int, bn=512, bk=512) -> bool:
    """Pallas path gate: TPU backend, tile-divisible shapes, and an M small
    enough that the whole activation block fits VMEM (decode / small
    extends — the weight-bandwidth-bound regime these kernels target; big
    prefills are MXU-bound and fine under XLA)."""
    import os

    # Opt-in for now: XLA's convert+dot beats this kernel on some chips /
    # runtimes; enable with SGLANG_TPU_QUANT_MATMUL=pallas after profiling.
    if os.environ.get("SGLANG_TPU_QUANT_MATMUL") != "pallas":
        return False
    return (
        jax.default_backend() == "tpu"
        and x.ndim == 2
        and x.shape[0] <= 1024
        and n % min(bn, n) == 0
        and k % min(bk, k) == 0
        and k >= 256
        and n >= 256
    )
