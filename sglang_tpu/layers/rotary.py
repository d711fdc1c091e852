"""Rotary position embeddings.

Parity with reference `python/sglang/srt/layers/rotary_embedding/` (default
RoPE, llama-3 frequency scaling, linear & dynamic NTK scaling, YaRN) and the
`pos_enc.cu` kernel (sgl-kernel K5). TPU design: inv_freq is a tiny static
constant; cos/sin are computed on the fly from positions inside the jitted
step (VPU transcendentals, fused by XLA) — no table gather, no HBM table.

Convention: HF llama "rotate_half" (non-interleaved): the head dim is split
in halves, cos/sin tiled twice.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def compute_inv_freq(
    head_dim: int,
    rope_theta: float,
    rope_scaling: Optional[dict] = None,
    rotary_dim: Optional[int] = None,
    context_length: Optional[int] = None,
) -> np.ndarray:
    """Static inv_freq [rotary_dim//2], with checkpoint-declared scaling applied."""
    rotary_dim = rotary_dim or head_dim
    inv_freq = 1.0 / (
        rope_theta ** (np.arange(0, rotary_dim, 2, dtype=np.float64) / rotary_dim)
    )
    if rope_scaling is None:
        return inv_freq.astype(np.float32)
    rtype = rope_scaling.get("rope_type") or rope_scaling.get("type")
    if rtype == "llama3":
        # Reference: rotary_embedding/__init__.py Llama3RotaryEmbedding.
        factor = rope_scaling["factor"]
        low = rope_scaling.get("low_freq_factor", 1.0)
        high = rope_scaling.get("high_freq_factor", 4.0)
        orig_max = rope_scaling.get("original_max_position_embeddings", 8192)
        low_wavelen = orig_max / low
        high_wavelen = orig_max / high
        wavelen = 2 * math.pi / inv_freq
        # three bands: high freq untouched, low freq /factor, smooth in between
        smooth = (orig_max / wavelen - low) / (high - low)
        scaled = np.where(
            wavelen < high_wavelen,
            inv_freq,
            np.where(
                wavelen > low_wavelen,
                inv_freq / factor,
                (1 - smooth) * inv_freq / factor + smooth * inv_freq,
            ),
        )
        return scaled.astype(np.float32)
    if rtype == "linear":
        return (inv_freq / rope_scaling["factor"]).astype(np.float32)
    if rtype in ("default", None, "mrope", "default_mrope"):
        return inv_freq.astype(np.float32)
    if rtype == "longrope":
        # Phi-3 su-scaled rope (HF `_compute_longrope_parameters`):
        # per-dimension frequency rescale; short factors below the
        # original max length, long factors above (the engine pre-declares
        # context_length, so the choice is static)
        orig = rope_scaling.get(
            "original_max_position_embeddings", context_length or 4096
        )
        use_long = (context_length or orig) > orig
        key = "long_factor" if use_long else "short_factor"
        ext = np.asarray(rope_scaling[key], dtype=np.float64)
        return (inv_freq / ext).astype(np.float32)
    if rtype == "yarn":
        return _yarn_inv_freq(inv_freq, rotary_dim, rope_scaling).astype(np.float32)
    if rtype == "dynamic":
        # Dynamic NTK collapses to default below original max length; the
        # engine pre-declares context_length so apply the NTK alpha once.
        factor = rope_scaling["factor"]
        base = rope_theta * factor ** (rotary_dim / (rotary_dim - 2))
        inv_freq = 1.0 / (
            base ** (np.arange(0, rotary_dim, 2, dtype=np.float64) / rotary_dim)
        )
        return inv_freq.astype(np.float32)
    raise ValueError(f"unsupported rope scaling type: {rtype}")


def _yarn_inv_freq(inv_freq: np.ndarray, rotary_dim: int, cfg: dict) -> np.ndarray:
    """Exact HF `_compute_yarn_parameters` frequency blend (correction-dim
    linear ramp between interpolation and extrapolation)."""
    factor = cfg["factor"]
    orig_max = cfg.get("original_max_position_embeddings", 4096)
    beta_fast = cfg.get("beta_fast") or 32
    beta_slow = cfg.get("beta_slow") or 1
    truncate = cfg.get("truncate", True)
    base = (1.0 / inv_freq[1]) ** (rotary_dim / 2.0) if len(inv_freq) > 1 else 1e4
    # recover base exactly: inv_freq[i] = base**(-2i/dim)
    if len(inv_freq) > 1:
        base = float((inv_freq[0] / inv_freq[1]) ** (rotary_dim / 2.0))

    def find_correction_dim(num_rotations):
        return (
            rotary_dim
            * math.log(orig_max / (num_rotations * 2 * math.pi))
        ) / (2 * math.log(base))

    low = find_correction_dim(beta_fast)
    high = find_correction_dim(beta_slow)
    if truncate:
        low = math.floor(low)
        high = math.ceil(high)
    low = max(low, 0)
    high = min(high, rotary_dim - 1)
    if low == high:
        high += 0.001
    dims = np.arange(rotary_dim // 2, dtype=np.float64)
    ramp = np.clip((dims - low) / (high - low), 0.0, 1.0)
    extrapolation_factor = 1.0 - ramp
    return inv_freq / factor * (1 - extrapolation_factor) + inv_freq * extrapolation_factor


def yarn_get_mscale(scale: float = 1.0, mscale: float = 1.0) -> float:
    if scale <= 1:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


def rope_attention_scaling(rope_scaling: Optional[dict]) -> float:
    """Post-rope cos/sin scale (yarn attention_factor; 1.0 otherwise)."""
    if not rope_scaling:
        return 1.0
    rtype = rope_scaling.get("rope_type") or rope_scaling.get("type")
    if rtype != "yarn":
        return 1.0
    af = rope_scaling.get("attention_factor")
    if af is not None:
        return float(af)
    factor = rope_scaling["factor"]
    mscale = rope_scaling.get("mscale")
    mscale_all_dim = rope_scaling.get("mscale_all_dim")
    if mscale and mscale_all_dim:
        return float(
            yarn_get_mscale(factor, mscale) / yarn_get_mscale(factor, mscale_all_dim)
        )
    return float(yarn_get_mscale(factor))


def apply_rope(
    x: jax.Array, positions: jax.Array, inv_freq: jax.Array, mscale: float = 1.0
) -> jax.Array:
    """Apply rotary embedding.

    x: [T, num_heads, head_dim]; positions: [T] int32;
    inv_freq: [rot_dim // 2] fp32. Returns same shape/dtype as x.
    Partial rotary (rot_dim < head_dim) leaves the tail untouched.
    `mscale` is the yarn attention_factor applied to cos/sin.
    """
    rot = inv_freq.shape[0] * 2
    angles = positions[:, None].astype(jnp.float32) * inv_freq[None, :]  # [T, rot/2]
    cos = jnp.cos(angles)[:, None, :] * mscale  # [T, 1, rot/2]
    sin = jnp.sin(angles)[:, None, :] * mscale
    xf = x[..., :rot].astype(jnp.float32)
    x1, x2 = jnp.split(xf, 2, axis=-1)
    out1 = x1 * cos - x2 * sin
    out2 = x2 * cos + x1 * sin
    rotated = jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)
    if rot == x.shape[-1]:
        return rotated
    return jnp.concatenate([rotated, x[..., rot:]], axis=-1)


def apply_rope_interleaved(
    x: jax.Array,  # [T, H, D]
    positions: jax.Array,  # [T]
    inv_freq: jax.Array,  # [D/2]
) -> jax.Array:
    """Interleaved (complex-pair) RoPE: pairs (x[2i], x[2i+1]) rotate by
    pos * inv_freq[i] — the DeepSeek-V2/V3 convention (HF
    `apply_rotary_emb` via view_as_complex), vs llama's rotate-half."""
    t, h, d = x.shape
    ang = positions[:, None].astype(jnp.float32) * inv_freq[None, :]  # [T, D/2]
    cos = jnp.cos(ang)[:, None, :]
    sin = jnp.sin(ang)[:, None, :]
    xr = x.astype(jnp.float32).reshape(t, h, d // 2, 2)
    even, odd = xr[..., 0], xr[..., 1]
    out = jnp.stack(
        [even * cos - odd * sin, even * sin + odd * cos], axis=-1
    )
    return out.reshape(t, h, d).astype(x.dtype)
