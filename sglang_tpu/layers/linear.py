"""Quantization-aware linear layers (functional).

Parity with reference `python/sglang/srt/layers/linear.py`
(ColumnParallelLinear:292 / RowParallelLinear:1340 / QKVParallelLinear:894)
+ `layers/quantization/` method dispatch.

TPU-native design differences:
- No parallel-linear *classes*: tensor parallelism is expressed as GSPMD
  sharding annotations on the weight arrays (`PartitionSpec`), and XLA
  inserts the all-reduce after the row-parallel matmul automatically.
- Weights live in the params pytree as plain arrays; the *method* objects
  here are static (chosen at model build from the quant config) and decide
  layout + the apply computation, mirroring the reference's
  `LinearMethodBase.create_weights/apply` split.
- Weight layout is [in_features, out_features] so `apply` is `x @ w`
  (row-major streaming into the MXU).

Quant kinds:
- unquantized: bf16 `w`
- int8 per-channel (W8A16): int8 `q` + fp32 `s`[1, out]; computed as
  `(x @ q) * s` — the int8→bf16 convert happens inside the matmul pipeline
  and the bf16 weight is never materialized in HBM.
- int4 group-wise (W4A16, AWQ/GPTQ-style group-128): jnp.int4 `q` +
  `s`[in/g, out] (+ optional zero-points `z`). Naive path dequantizes;
  the Pallas fused dequant+matmul kernel (ops/quant_matmul.py) replaces it
  on TPU for the hot path.
- fp8 (W8A8-ready storage, applied as W8A16 for now): fp8_e4m3 `q` +
  fp32 `s`[1, out].
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


class LinearMethod:
    """Static per-layer method: weight layout + apply computation."""

    def weight_shapes(
        self, in_features: int, out_features: int, dtype
    ) -> Dict[str, jax.ShapeDtypeStruct]:
        raise NotImplementedError

    def apply(self, w: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
        raise NotImplementedError

    def quantize(self, w_bf16: np.ndarray) -> Dict[str, np.ndarray]:
        """Quantize a [in, out] float weight into this method's layout."""
        raise NotImplementedError


@dataclass
class UnquantizedLinear(LinearMethod):
    bias: bool = False

    def weight_shapes(self, in_features, out_features, dtype):
        shapes = {"w": jax.ShapeDtypeStruct((in_features, out_features), dtype)}
        if self.bias:
            shapes["b"] = jax.ShapeDtypeStruct((out_features,), dtype)
        return shapes

    def apply(self, w, x):
        y = jnp.dot(x, w["w"], preferred_element_type=jnp.float32).astype(x.dtype)
        if "b" in w:
            y = y + w["b"]
        return y

    def quantize(self, w_bf16):
        return {"w": w_bf16}


@dataclass
class Int8Linear(LinearMethod):
    """Per-output-channel symmetric int8 weight-only (W8A16).

    Reference analogue: weight-only path of `quantization/w8a8_int8.py` /
    `int8_kernel.py`. `(x @ q) * s` keeps the weight int8 in HBM.

    Compute-bound shapes (prefill: >= `act_quant_rows` token rows) switch
    to dynamic per-token int8 activations: the int8 MXU runs at 2x bf16
    TOPS (v5e: 394 vs 197), and the quant/rescale elementwise passes fuse
    into neighbours. Decode stays W8A16 — it is weight-read-bound, where
    activation quant only adds VPU work (measured neutral-to-negative).
    The shape test is static under jit, so this is not a new variant axis.
    """

    bias: bool = False
    act_quant_rows: int = 512  # prefill threshold; 0 disables

    def __post_init__(self):
        import os

        if os.environ.get("SGLANG_TPU_INT8_PREFILL_ACT_QUANT") == "0":
            self.act_quant_rows = 0

    def weight_shapes(self, in_features, out_features, dtype):
        shapes = {
            "q": jax.ShapeDtypeStruct((in_features, out_features), jnp.int8),
            "s": jax.ShapeDtypeStruct((1, out_features), jnp.float32),
        }
        if self.bias:
            shapes["b"] = jax.ShapeDtypeStruct((out_features,), dtype)
        return shapes

    def apply(self, w, x):
        from sglang_tpu.ops.quant_matmul import matmul_int8, use_pallas_matmul

        k, n = w["q"].shape
        if self.act_quant_rows and x.shape[0] >= self.act_quant_rows:
            xf = x.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)  # [T, 1]
            xs = jnp.maximum(amax / 127.0, 1e-8)
            xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq,
                w["q"],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = (acc.astype(jnp.float32) * xs * w["s"]).astype(x.dtype)
        elif use_pallas_matmul(x, k, n):
            y = matmul_int8(x, w["q"], w["s"])
        else:
            acc = jnp.dot(
                x, w["q"].astype(x.dtype), preferred_element_type=jnp.float32
            )
            y = (acc * w["s"]).astype(x.dtype)
        if "b" in w:
            y = y + w["b"]
        return y

    def quantize(self, w_bf16):
        wf = np.asarray(w_bf16, dtype=np.float32)
        amax = np.abs(wf).max(axis=0, keepdims=True)
        s = (amax / 127.0).clip(min=1e-8)
        q = np.clip(np.round(wf / s), -128, 127).astype(np.int8)
        return {"q": q, "s": s.astype(np.float32)}


@dataclass
class Int4Linear(LinearMethod):
    """Group-wise int4 weight-only (W4A16), AWQ/GPTQ-compatible.

    Stored as jnp.int4 (native XLA TPU packed dtype) with fp32 scales per
    (group, out_channel) and optional integer zero-points (asymmetric —
    AWQ/GPTQ checkpoints). Symmetric on-the-fly quantization uses no zeros.
    """

    group_size: int = 128
    bias: bool = False
    has_zeros: bool = False

    def weight_shapes(self, in_features, out_features, dtype):
        g = max(1, in_features // self.group_size)
        shapes = {
            "q": jax.ShapeDtypeStruct((in_features, out_features), jnp.int4),
            "s": jax.ShapeDtypeStruct((g, out_features), jnp.float32),
        }
        if self.has_zeros:
            shapes["z"] = jax.ShapeDtypeStruct((g, out_features), jnp.int8)
        if self.bias:
            shapes["b"] = jax.ShapeDtypeStruct((out_features,), dtype)
        return shapes

    def apply(self, w, x):
        from sglang_tpu.ops.quant_matmul import matmul_int4, use_pallas_matmul

        if "perm" in w:  # GPTQ act-order: gather activations into the
            x = x[:, w["perm"]]  # group-contiguous row order
        in_features = w["q"].shape[0]
        out_features = w["q"].shape[1]
        g = w["s"].shape[0]
        gs = in_features // g
        if use_pallas_matmul(x, in_features, out_features) and gs in (
            32,
            64,
            128,
            256,
        ):
            y = matmul_int4(
                x,
                w["q"],
                w["s"],
                w.get("z"),
                group=gs,
                bk=max(gs, 512 if gs <= 512 else gs),
            )
        else:
            qf = w["q"].astype(x.dtype).reshape(g, gs, out_features)
            if "z" in w:
                qf = qf - w["z"].astype(x.dtype)[:, None, :]
            wdeq = (qf * w["s"].astype(x.dtype)[:, None, :]).reshape(
                in_features, out_features
            )
            y = jnp.dot(x, wdeq, preferred_element_type=jnp.float32).astype(
                x.dtype
            )
        if "b" in w:
            y = y + w["b"]
        return y

    def quantize(self, w_bf16):
        wf = np.asarray(w_bf16, dtype=np.float32)
        in_f, out_f = wf.shape
        g = max(1, in_f // self.group_size)
        wg = wf.reshape(g, in_f // g, out_f)
        amax = np.abs(wg).max(axis=1)  # [g, out]
        s = (amax / 7.0).clip(min=1e-8)
        q = np.clip(np.round(wg / s[:, None, :]), -8, 7).astype(np.int8)
        return {
            "q": q.reshape(in_f, out_f),  # loader casts to jnp.int4 on device put
            "s": s.astype(np.float32),
        }


@dataclass
class W8A8Int8Linear(LinearMethod):
    """Dynamic per-token int8 activations × per-channel int8 weights.

    Reference analogue: `quantization/w8a8_int8.py` (per-token dynamic
    activation scale path). TPU-native payoff: the MXU runs int8×int8 at
    2× bf16 throughput (v5e: 394 vs 197 TOPS) and the activation
    quantization is a cheap elementwise pass XLA fuses into the producer.
    y = (xq @ wq) * (x_scale ⊗ w_scale), accumulated in int32.
    """

    bias: bool = False

    def weight_shapes(self, in_features, out_features, dtype):
        shapes = {
            "q": jax.ShapeDtypeStruct((in_features, out_features), jnp.int8),
            "s": jax.ShapeDtypeStruct((1, out_features), jnp.float32),
        }
        if self.bias:
            shapes["b"] = jax.ShapeDtypeStruct((out_features,), dtype)
        return shapes

    def apply(self, w, x):
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)  # [T, 1]
        xs = jnp.maximum(amax / 127.0, 1e-8)
        xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq,
            w["q"],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (acc.astype(jnp.float32) * xs * w["s"]).astype(x.dtype)
        if "b" in w:
            y = y + w["b"]
        return y

    def quantize(self, w_bf16):
        wf = np.asarray(w_bf16, dtype=np.float32)
        amax = np.abs(wf).max(axis=0, keepdims=True)
        s = (amax / 127.0).clip(min=1e-8)
        q = np.clip(np.round(wf / s), -128, 127).astype(np.int8)
        return {"q": q, "s": s.astype(np.float32)}


@dataclass
class Fp8Linear(LinearMethod):
    """FP8 (e4m3) weight storage with per-channel fp32 scale.

    Reference analogue: `quantization/fp8.py:297 Fp8LinearMethod`
    (per-channel weight scale path). Applied as W8A16: the fp8→bf16
    convert rides the matmul; activations stay bf16 (TPU v5e MXU takes
    bf16 inputs; fp8 activation quant is a later optimization).
    """

    bias: bool = False

    def weight_shapes(self, in_features, out_features, dtype):
        shapes = {
            "q": jax.ShapeDtypeStruct((in_features, out_features), jnp.float8_e4m3fn),
            "s": jax.ShapeDtypeStruct((1, out_features), jnp.float32),
        }
        if self.bias:
            shapes["b"] = jax.ShapeDtypeStruct((out_features,), dtype)
        return shapes

    def apply(self, w, x):
        acc = jnp.dot(
            x, w["q"].astype(x.dtype), preferred_element_type=jnp.float32
        )
        y = (acc * w["s"]).astype(x.dtype)
        if "b" in w:
            y = y + w["b"]
        return y

    def quantize(self, w_bf16):
        wf = np.asarray(w_bf16, dtype=np.float32)
        amax = np.abs(wf).max(axis=0, keepdims=True)
        s = (amax / 448.0).clip(min=1e-8)  # e4m3 max normal
        q = (wf / s).astype(jnp.float8_e4m3fn)
        return {"q": q, "s": s.astype(np.float32)}


@dataclass
class Fp8BlockLinear(LinearMethod):
    """Block-wise FP8 (e4m3) weights — the DeepSeek-V3 W8A8-fp8 storage
    (reference `quantization/fp8.py` block path, `weight_block_size`
    [128, 128], scales stored as `weight_scale_inv`).

    q [in, out] e4m3 + s [ceil(in/B), ceil(out/B)] f32; apply dequantizes
    by block (XLA fuses the broadcast-multiply into the convert, so HBM
    traffic stays fp8 + the tiny scale grid). Activations stay bf16 on
    v5e (no native fp8 compute); on fp8 generations the same storage
    feeds true W8A8.
    """

    bias: bool = False
    block: int = 128

    def weight_shapes(self, in_features, out_features, dtype):
        b = self.block
        shapes = {
            "q": jax.ShapeDtypeStruct(
                (in_features, out_features), jnp.float8_e4m3fn
            ),
            "s": jax.ShapeDtypeStruct(
                (-(-in_features // b), -(-out_features // b)), jnp.float32
            ),
        }
        if self.bias:
            shapes["b"] = jax.ShapeDtypeStruct((out_features,), dtype)
        return shapes

    def apply(self, w, x):
        q, s = w["q"], w["s"]
        i, o = q.shape
        b = self.block
        s_full = jnp.repeat(jnp.repeat(s, b, axis=0), b, axis=1)[:i, :o]
        wd = (q.astype(jnp.float32) * s_full).astype(x.dtype)
        y = jnp.dot(x, wd, preferred_element_type=jnp.float32).astype(x.dtype)
        if "b" in w:
            y = y + w["b"]
        return y

    def quantize(self, w_bf16):
        wf = np.asarray(w_bf16, dtype=np.float32)
        i, o = wf.shape
        b = self.block
        ib, ob = -(-i // b), -(-o // b)
        pad = np.zeros((ib * b, ob * b), dtype=np.float32)
        pad[:i, :o] = wf
        blocks = pad.reshape(ib, b, ob, b)
        amax = np.abs(blocks).max(axis=(1, 3))
        s = (amax / 448.0).clip(min=1e-8)
        qpad = pad / np.repeat(np.repeat(s, b, 0), b, 1)
        q = qpad[:i, :o].astype(jnp.float8_e4m3fn)
        return {"q": q, "s": s.astype(np.float32)}


def make_linear_method(
    quantization: Optional[str], bias: bool = False, group_size: int = 128
) -> LinearMethod:
    if quantization is None or quantization == "bf16":
        return UnquantizedLinear(bias=bias)
    if quantization == "int8":
        return Int8Linear(bias=bias)
    if quantization == "w8a8_int8":
        return W8A8Int8Linear(bias=bias)
    if quantization in ("int4", "awq", "gptq"):
        return Int4Linear(
            group_size=group_size, bias=bias, has_zeros=quantization in ("awq", "gptq")
        )
    if quantization in ("fp8", "w8a8_fp8"):
        return Fp8Linear(bias=bias)
    if quantization == "fp8_block":
        return Fp8BlockLinear(bias=bias, block=group_size)
    raise ValueError(f"unsupported quantization: {quantization}")
