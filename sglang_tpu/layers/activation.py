"""Activation functions.

Parity with reference `python/sglang/srt/layers/activation.py` and the
`silu_and_mul` CUDA kernels (sgl-kernel K5). The gate/up projections are
fused into one matmul ([H, 2I]) so the activation is a single elementwise
op over the split halves — XLA fuses it into the matmul epilogue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def silu_and_mul(gate_up: jax.Array) -> jax.Array:
    """gate_up: [..., 2*I] with gate in the first half."""
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return jax.nn.silu(gate) * up


def gelu_and_mul(gate_up: jax.Array) -> jax.Array:
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return jax.nn.gelu(gate, approximate=False) * up


def gelu_tanh_and_mul(gate_up: jax.Array) -> jax.Array:
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return jax.nn.gelu(gate, approximate=True) * up


ACT2FN = {
    "silu": silu_and_mul,
    "gelu": gelu_and_mul,
    "gelu_pytorch_tanh": gelu_tanh_and_mul,
}
