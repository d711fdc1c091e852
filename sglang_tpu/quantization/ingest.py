"""AWQ / GPTQ pre-quantized checkpoint ingestion.

Parity with reference `layers/quantization/awq.py` + `gptq.py` weight
loading (the dequant kernels' packing conventions from
`sgl-kernel/csrc/gemm/awq_kernel.cu` / `gptq/`): unpack the int32
nibble-packed tensors into this engine's Int4Linear layout —
`q` jnp.int4 [in, out] (signed, value - 8), `z` int8 [groups, out]
(zero - 8), `s` f32 [groups, out] — so `(q - z) * s` reproduces
`(unsigned_q - zero) * scale` exactly.

Packing conventions:
- AWQ: qweight [in, out/8], 8 nibbles per int32 along OUT with interleaved
  order (0,2,4,6,1,3,5,7); qzeros packed the same; scales [in/g, out] f16.
- GPTQ: qweight [in/8, out] packed along IN sequentially; qzeros
  [in/g, out/8] packed along OUT sequentially with the historical +1
  offset; `g_idx` (act-order) must be trivial.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7])


def unpack_awq_int32(packed: np.ndarray) -> np.ndarray:
    """[r, c/8] int32 -> [r, c] uint8 (AWQ interleaved nibble order)."""
    r, c8 = packed.shape
    out = np.empty((r, c8, 8), dtype=np.uint8)
    p = packed.astype(np.uint32)
    for k in range(8):
        out[:, :, AWQ_ORDER[k]] = (p >> (4 * k)) & 0xF
    return out.reshape(r, c8 * 8)


def unpack_gptq_qweight(packed: np.ndarray) -> np.ndarray:
    """[in/8, out] int32 -> [in, out] uint8 (sequential nibbles along IN)."""
    r8, c = packed.shape
    out = np.empty((r8, 8, c), dtype=np.uint8)
    p = packed.astype(np.uint32)
    for k in range(8):
        out[:, k, :] = (p >> (4 * k)) & 0xF
    return out.reshape(r8 * 8, c)


def unpack_gptq_qzeros(packed: np.ndarray) -> np.ndarray:
    """[g, out/8] int32 -> [g, out] uint8 (sequential along OUT, +1)."""
    g, c8 = packed.shape
    out = np.empty((g, c8, 8), dtype=np.uint8)
    p = packed.astype(np.uint32)
    for k in range(8):
        out[:, :, k] = (p >> (4 * k)) & 0xF
    # +1 per GPTQ convention; the stored value 15 legitimately maps to
    # zero-point 16, so do NOT re-mask to 4 bits (asymmetric checkpoints
    # with max zero-points would dequantize those groups wrong by 16*scale)
    return out.reshape(g, c8 * 8) + 1


def dequant_reference(q: np.ndarray, z: np.ndarray, s: np.ndarray, group: int):
    """Unsigned (q - z) * s -> [in, out] f32 (test oracle)."""
    in_f = q.shape[0]
    g = in_f // group
    qf = q.astype(np.float32).reshape(g, group, -1)
    out = (qf - z.astype(np.float32)[:, None, :]) * s.astype(np.float32)[:, None, :]
    return out.reshape(in_f, -1)


def load_one_awq(index, prefix: str) -> Dict[str, np.ndarray]:
    """Read one AWQ linear ('<prefix>.qweight/.qzeros/.scales') into
    unsigned q [in, out], z [g, out], s [g, out]."""
    qweight = np.asarray(index.get(f"{prefix}.qweight"))
    qzeros = np.asarray(index.get(f"{prefix}.qzeros"))
    scales = np.asarray(index.get(f"{prefix}.scales"), dtype=np.float32)
    q = unpack_awq_int32(qweight)  # [in, out]
    z = unpack_awq_int32(qzeros)  # [g, out]
    return {"q": q, "z": z, "s": scales}


def load_one_gptq(index, prefix: str) -> Dict[str, np.ndarray]:
    qweight = np.asarray(index.get(f"{prefix}.qweight"))
    qzeros = np.asarray(index.get(f"{prefix}.qzeros"))
    scales = np.asarray(index.get(f"{prefix}.scales"), dtype=np.float32)
    q = unpack_gptq_qweight(qweight)  # [in, out]
    z = unpack_gptq_qzeros(qzeros)  # [g, out]
    out = {"q": q, "z": z, "s": scales}
    if index.has(f"{prefix}.g_idx"):
        g_idx = np.asarray(index.get(f"{prefix}.g_idx")).astype(np.int64)
        group = q.shape[0] // z.shape[0]
        expected = np.arange(q.shape[0]) // max(group, 1)
        if not np.array_equal(g_idx, expected):
            # act-order (desc_act): rows belong to the group g_idx[i].
            # Permute rows so groups become contiguous (exllama trick);
            # the runtime gathers activations with the same permutation,
            # keeping the original quantization grid EXACT.
            perm = np.argsort(g_idx, kind="stable")
            out["q"] = q[perm]
            out["perm"] = perm.astype(np.int32)
    return out


def to_int4_layout(parts: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Concat per-source unsigned tensors along OUT and center to the
    Int4Linear signed layout."""
    q = np.concatenate([p["q"] for p in parts], axis=1)
    z = np.concatenate([p["z"] for p in parts], axis=1)
    s = np.concatenate([p["s"] for p in parts], axis=1)
    out = {
        "q": q.astype(np.int16) - 8,  # loader casts to jnp.int4
        "z": (z.astype(np.int16) - 8).astype(np.int8),
        "s": s.astype(np.float32),
    }
    perms = [p.get("perm") for p in parts]
    if any(pm is not None for pm in perms):
        # fused sources must share the activation permutation (they share
        # the same input); GPTQ emits identical g_idx for fused q/k/v
        p0 = next(pm for pm in perms if pm is not None)
        for pm in perms:
            assert pm is None or np.array_equal(pm, p0), (
                "fused GPTQ sources disagree on g_idx"
            )
        out["perm"] = p0
    return out


def load_one_compressed(index, prefix: str) -> Dict[str, np.ndarray]:
    """llm-compressor / compressed-tensors int8 linear: `weight` [out, in]
    int8 + `weight_scale` [out, 1] f32 -> our [in, out] int8 layout with
    [1, out] scales (reference compressed_tensors W8A8/W8A16 schemes)."""
    q = np.asarray(index.get(f"{prefix}.weight")).T.astype(np.int8)  # [in, out]
    s_ = np.asarray(index.get(f"{prefix}.weight_scale"), dtype=np.float32)
    s_ = s_.reshape(1, -1)  # [1, out]
    return {"q": q, "s": s_}


def load_one_fp8_block(index, prefix: str):
    """DeepSeek-V3-style block-fp8 linear: `weight` [out, in] e4m3 +
    `weight_scale_inv` [out/B, in/B] f32 (the DEQUANT multiplier) -> our
    [in, out] q + [in/B, out/B] s layout (reference fp8 block path)."""
    import ml_dtypes

    q = np.asarray(index.get(f"{prefix}.weight"))
    q = q.view(ml_dtypes.float8_e4m3fn) if q.dtype == np.uint8 else q
    s_ = np.asarray(
        index.get(f"{prefix}.weight_scale_inv"), dtype=np.float32
    )
    return {"q": np.ascontiguousarray(q.T), "s": np.ascontiguousarray(s_.T)}


def _concat_fp8_block(parts):
    # fused sources concat on the OUT axis; every source's out dim must be
    # whole blocks for the scale grids to concatenate
    return {
        "q": np.concatenate([p["q"] for p in parts], axis=1),
        "s": np.concatenate([p["s"] for p in parts], axis=1),
    }


def load_one_compressed_fp8(index, prefix: str):
    """compressed-tensors FP8 linear: `weight` [out, in] e4m3 +
    `weight_scale` per-channel f32 -> Fp8Linear layout ([in, out] q +
    [1, out] s; reference compressed_tensors fp8 scheme)."""
    q = np.ascontiguousarray(np.asarray(index.get(f"{prefix}.weight")).T)
    s_ = np.asarray(
        index.get(f"{prefix}.weight_scale"), dtype=np.float32
    ).reshape(1, -1)
    return {"q": q, "s": s_}


def _concat_int8(parts: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {
        "q": np.concatenate([p["q"] for p in parts], axis=1),
        "s": np.concatenate([p["s"] for p in parts], axis=1),
    }


def load_prequantized_weights(model, model_config, mesh) -> dict:
    """Execute the model's weight rules against an AWQ/GPTQ checkpoint."""
    from sglang_tpu.model_loader.loader import (
        SafetensorsIndex,
        _device_put_leafdict,
        _execute_rule,
    )
    from sglang_tpu.model_loader.weight_mapping import get_in_tree, set_in_tree

    method = model_config.quantization  # "awq" | "gptq" | fp8_block | int8
    qc = model_config.quant_config or {}
    compressed = qc.get("quant_method", "").lower() == "compressed-tensors"
    loader_fn = load_one_awq if method == "awq" else load_one_gptq
    index = SafetensorsIndex(model_config.model_path)
    specs = model.param_specs()
    shardings = model.param_shardings()
    params: dict = {"layers": [dict() for _ in range(model.num_layers)]}
    n = 0
    for rule in model.weight_rules():
        if rule.kind == "linear":
            prefixes = [s[: -len(".weight")] for s in rule.sources]
            if method == "fp8_block" and index.has(
                f"{prefixes[0]}.weight_scale_inv"
            ):
                value = _concat_fp8_block(
                    [load_one_fp8_block(index, p) for p in prefixes]
                )
            elif compressed and index.has(f"{prefixes[0]}.weight_scale"):
                loader = (
                    load_one_compressed_fp8
                    if method == "fp8"
                    else load_one_compressed
                )
                value = _concat_int8([loader(index, p) for p in prefixes])
            elif index.has(f"{prefixes[0]}.qweight"):
                parts = [loader_fn(index, p) for p in prefixes]
                value = to_int4_layout(parts)
            else:  # unquantized module inside a quantized checkpoint
                value = _execute_rule(model, rule, index)
        else:
            value = _execute_rule(model, rule, index)
        if value is None:
            continue
        spec = get_in_tree(shardings, rule.target)
        sds = get_in_tree(specs, rule.target)
        set_in_tree(params, rule.target, _device_put_leafdict(value, spec, sds, mesh))
        n += 1
    index.close()
    logger.info("loaded %d %s-quantized weight groups", n, method)
    return params
