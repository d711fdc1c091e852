"""FP4 storage-format ingestion (Q5): MXFP4 and ModelOpt NVFP4.

Reference: `srt/layers/quantization/mxfp4.py:295` (gpt-oss MXFP4 blocks/
scales dequant, low nibble first) and
`srt/layers/quantization/modelopt_quant.py:1100` (NVFP4: packed e2m1
nibbles + per-16-block e4m3 scales + a global f32 scale).

v5e has no fp4 compute, so fp4 is a STORAGE format here: checkpoints
dequantize at load to the model dtype (the engine's own int8/int4 paths
re-quantize if requested) — checkpoint-format parity, same policy as the
BnB NF4 ingest.

On-disk conventions handled:
- MXFP4 (gpt-oss export): `{base}_blocks` uint8 [..., G, B/2] (two e2m1
  codes per byte, LOW nibble first) + `{base}_scales` uint8 [..., G]
  (e8m0 biased exponents, value = 2^(s-127)); block B = 32 values.
- NVFP4 (ModelOpt): `{name}` uint8 packed nibbles (low first) +
  `{name}_scale` float8_e4m3 per-16-value block scales +
  `{name}_scale_2` f32 global scale.
"""

from __future__ import annotations

import numpy as np

# E2M1 value table: sign bit 3, exponent bits 2-1, mantissa bit 0
E2M1_CODE = np.array(
    [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
     -0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0],
    dtype=np.float32,
)

MX_BLOCK = 32
NV_BLOCK = 16


def _unpack_nibbles(packed: np.ndarray) -> np.ndarray:
    """uint8 [..., n] -> fp4 code indices [..., 2n], low nibble first."""
    lo = packed & 0x0F
    hi = packed >> 4
    out = np.empty(packed.shape[:-1] + (packed.shape[-1] * 2,), np.uint8)
    out[..., 0::2] = lo
    out[..., 1::2] = hi
    return out


def pack_mxfp4(w: np.ndarray):
    """Quantize float [..., K] (K % 32 == 0) to the MXFP4 on-disk form —
    the test oracle (and a usable exporter). Returns
    (blocks uint8 [..., G, 16], scales uint8 [..., G])."""
    shape = w.shape
    g = shape[-1] // MX_BLOCK
    blocks = w.astype(np.float32).reshape(shape[:-1] + (g, MX_BLOCK))
    amax = np.abs(blocks).max(axis=-1)
    # e8m0 scale: power of two s.t. amax/2^e <= 6 (the e2m1 max)
    e = np.ceil(np.log2(np.maximum(amax, 1e-30) / 6.0))
    e = np.clip(e, -127, 128)
    scales = (e + 127).astype(np.uint8)
    scaled = blocks / (2.0 ** e)[..., None]
    idx = np.abs(scaled[..., None] - E2M1_CODE).argmin(-1).astype(np.uint8)
    # preserve signs of values that rounded to +-0
    neg0 = (scaled < 0) & (idx == 0)
    idx[neg0] = 8
    packed = (idx[..., 1::2] << 4) | idx[..., 0::2]
    return packed, scales


def dequant_mxfp4(blocks: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """(blocks uint8 [..., G, B/2], scales uint8 [..., G]) ->
    float32 [..., G*B]."""
    codes = _unpack_nibbles(np.asarray(blocks, np.uint8))
    vals = E2M1_CODE[codes]  # [..., G, B]
    e = np.asarray(scales, np.float32) - 127.0
    vals = vals * (2.0 ** e)[..., None]
    return vals.reshape(vals.shape[:-2] + (-1,)).astype(np.float32)


def pack_nvfp4(w: np.ndarray):
    """Quantize float [out, in] (in % 16 == 0) to the NVFP4 on-disk form.
    Returns (packed uint8 [out, in/2], scale float8-as-f32 [out, in/16],
    scale2 f32 scalar)."""
    import jax.numpy as jnp

    wf = w.astype(np.float32)
    amax = np.abs(wf).max()
    scale2 = np.float32(max(amax, 1e-30) / (6.0 * 448.0))
    blocks = wf.reshape(wf.shape[0], -1, NV_BLOCK)
    bmax = np.abs(blocks).max(axis=-1)
    s = bmax / (6.0 * scale2)
    # store block scales in e4m3 (round-trip through the dtype)
    s8 = np.asarray(jnp.asarray(s, jnp.float8_e4m3fn), np.float32)
    s8 = np.maximum(s8, 1e-6)
    scaled = blocks / (s8 * scale2)[..., None]
    idx = np.abs(scaled[..., None] - E2M1_CODE).argmin(-1).astype(np.uint8)
    neg0 = (scaled < 0) & (idx == 0)
    idx[neg0] = 8
    flat = idx.reshape(wf.shape[0], -1)
    packed = (flat[..., 1::2] << 4) | flat[..., 0::2]
    return packed, s8, scale2


def dequant_nvfp4(
    packed: np.ndarray, scale: np.ndarray, scale2: float
) -> np.ndarray:
    """(packed uint8 [out, in/2], per-16-block scales (e4m3 or f32)
    [out, in/16], global f32) -> float32 [out, in]."""
    codes = _unpack_nibbles(np.asarray(packed, np.uint8))
    vals = E2M1_CODE[codes]  # [out, in]
    s = np.asarray(scale, np.float32)
    vals = vals.reshape(vals.shape[0], -1, NV_BLOCK) * s[..., None]
    return (vals * np.float32(scale2)).reshape(
        vals.shape[0], -1
    ).astype(np.float32)


class Fp4Index:
    """SafetensorsIndex wrapper that transparently dequantizes fp4
    tensors: `get(name)` returns the float weight whether it was stored
    dense, MXFP4 (`{name}_blocks`/`{name}_scales`), or NVFP4
    (`{name}` packed + `{name}_scale`/`{name}_scale_2`)."""

    def __init__(self, index):
        self.index = index

    def has(self, name: str) -> bool:
        if self.index.has(name):
            return True
        base = name[: -len(".weight")] if name.endswith(".weight") else name
        return self.index.has(base + "_blocks")

    def close(self):
        self.index.close()

    def get(self, name: str) -> np.ndarray:
        base = name[: -len(".weight")] if name.endswith(".weight") else name
        if self.index.has(base + "_blocks"):
            blocks = np.asarray(self.index.get(base + "_blocks"))
            scales = np.asarray(self.index.get(base + "_scales"))
            return dequant_mxfp4(blocks, scales)
        raw = self.index.get(name)
        if self.index.has(name + "_scale") and self.index.has(
            name + "_scale_2"
        ):
            return dequant_nvfp4(
                np.asarray(raw),
                np.asarray(self.index.get(name + "_scale"), np.float32),
                float(np.asarray(self.index.get(name + "_scale_2"))),
            )
        return raw
