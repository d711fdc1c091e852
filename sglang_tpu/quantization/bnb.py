"""bitsandbytes NF4 checkpoint ingestion (Q7 / reference
`srt/layers/quantization/bitsandbytes.py` + `model_loader/loader.py`
BitsAndBytesModelLoader).

BnB-4bit checkpoints store each linear as a packed uint8 tensor
`{name}` of shape [out*in/2, 1] (two 4-bit codes per byte, first code in
the HIGH nibble) plus sidecar tensors `{name}.absmax` (per-64-block
scale), `{name}.quant_map` (the 16-entry NF4 codebook) and, with double
quantization, `{name}.nested_absmax` / `{name}.nested_quant_map` (the
absmax itself 8-bit-quantized in 256-blocks). The TPU path dequantizes at
LOAD time to the model dtype — v5e has no 4-bit compute, and the engine's
own int8/int4 paths re-quantize if requested.

The `quant_state.bitsandbytes__nf4` pickled-blob offset of double-quant
checkpoints is intentionally not parsed; `{name}.nested_absmax` +
`SGLANG_TPU_BNB_OFFSET` cover the common exports.
"""

from __future__ import annotations

import os

import numpy as np

# bitsandbytes NF4 codebook (functional.py create_normal_map)
NF4_CODE = np.array(
    [
        -1.0, -0.6961928009986877, -0.5250730514526367,
        -0.39491748809814453, -0.28444138169288635, -0.18477343022823334,
        -0.09105003625154495, 0.0, 0.07958029955625534,
        0.16093020141124725, 0.24611230194568634, 0.33791524171829224,
        0.44070982933044434, 0.5626170039176941, 0.7229568362236023, 1.0,
    ],
    dtype=np.float32,
)

BLOCK = 64  # bnb 4-bit default blocksize
NESTED_BLOCK = 256


def pack_nf4(w: np.ndarray, blocksize: int = BLOCK):
    """Quantize float [out, in] to the BnB on-disk form — the test oracle
    (and a usable exporter). Returns (packed [n/2, 1] uint8,
    absmax [nblocks] f32)."""
    flat = w.astype(np.float32).reshape(-1)
    n = flat.size
    assert n % blocksize == 0
    blocks = flat.reshape(-1, blocksize)
    absmax = np.abs(blocks).max(axis=1)
    absmax = np.maximum(absmax, 1e-12)
    normed = blocks / absmax[:, None]
    # nearest codebook entry
    idx = np.abs(normed[..., None] - NF4_CODE[None, None, :]).argmin(-1)
    idx = idx.reshape(-1).astype(np.uint8)
    packed = (idx[0::2] << 4) | idx[1::2]
    return packed.reshape(-1, 1), absmax.astype(np.float32)


def dequant_nf4(
    packed: np.ndarray,
    absmax: np.ndarray,
    shape,
    code: np.ndarray = None,
    blocksize: int = BLOCK,
) -> np.ndarray:
    """Inverse of the BnB storage: codes -> codebook -> * per-block absmax."""
    code = NF4_CODE if code is None else code.astype(np.float32)
    b = packed.reshape(-1)
    idx = np.empty(b.size * 2, dtype=np.uint8)
    idx[0::2] = b >> 4
    idx[1::2] = b & 0xF
    vals = code[idx]
    vals = vals.reshape(-1, blocksize) * absmax.astype(np.float32)[:, None]
    return vals.reshape(shape)


def dequant_nested_absmax(
    absmax_q: np.ndarray,
    nested_absmax: np.ndarray,
    nested_code: np.ndarray,
    offset: float = 0.0,
) -> np.ndarray:
    """Double quantization: absmax stored as uint8 codes into an 8-bit
    dynamic map, scaled per 256-block, plus a global offset."""
    flat = nested_code.astype(np.float32)[absmax_q.reshape(-1)]
    scale = nested_absmax.astype(np.float32)[
        np.arange(flat.size) // NESTED_BLOCK
    ]
    return flat * scale + offset


class BnbIndex:
    """SafetensorsIndex wrapper that transparently dequantizes BnB-4bit
    tensors: `get(name)` returns the float weight whether it was stored
    dense or NF4-packed. Shapes/blocksize/offset come from the packed
    `quant_state.bitsandbytes__nf4` JSON sidecar (bitsandbytes
    `QuantState.as_dict(packed=True)`)."""

    def __init__(self, index):
        self.index = index

    def has(self, name: str) -> bool:
        return self.index.has(name)

    def close(self):
        self.index.close()

    def _quant_state(self, name: str) -> dict:
        import json

        qs_name = name + ".quant_state.bitsandbytes__nf4"
        if self.index.has(qs_name):
            return json.loads(bytes(self.index.get(qs_name).tolist()))
        return {}

    def get(self, name: str) -> np.ndarray:
        raw = self.index.get(name)
        if not self.index.has(name + ".absmax"):
            return raw
        qs = self._quant_state(name)
        blocksize = int(qs.get("blocksize", BLOCK))
        shape = qs.get("shape")
        if shape is None:
            raise ValueError(
                f"BnB tensor {name}: no shape in quant_state sidecar"
            )
        absmax = self.index.get(name + ".absmax")
        code = (
            self.index.get(name + ".quant_map")
            if self.index.has(name + ".quant_map")
            else None
        )
        if absmax.dtype == np.uint8:
            nested_code = self.index.get(name + ".nested_quant_map")
            nested_absmax = self.index.get(name + ".nested_absmax")
            offset = float(
                qs.get("nested_offset")
                or os.environ.get("SGLANG_TPU_BNB_OFFSET", "0")
            )
            n_blocks = raw.size * 2 // blocksize
            absmax = dequant_nested_absmax(
                absmax, nested_absmax, nested_code, offset
            )[:n_blocks]
        return dequant_nf4(
            raw, absmax, tuple(shape), code=code, blocksize=blocksize
        )
