"""Normalization layers (functional).

Parity with reference `python/sglang/srt/layers/layernorm.py` (RMSNorm,
GemmaRMSNorm, fused add+rmsnorm CUDA kernel `sgl-kernel` K5). On TPU the
fused residual-add+rmsnorm is left to XLA fusion — it fuses elementwise
chains into the surrounding matmuls, so no hand-written kernel is needed.
Compute in fp32, cast back to the input dtype (matches reference numerics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def fused_add_rms_norm(
    x: jax.Array, residual: jax.Array, weight: jax.Array, eps: float = 1e-6
):
    """Returns (normed(x + residual), x + residual). XLA fuses this chain."""
    added = x + residual
    return rms_norm(added, weight, eps), added


def gemma_rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Gemma variant: scale by (1 + weight)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * (1.0 + weight.astype(jnp.float32))).astype(x.dtype)


def layer_norm(
    x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-5
) -> jax.Array:
    """Classic LayerNorm with bias (Starcoder2/GPT-class models)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    normed = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (
        normed * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    ).astype(x.dtype)
