"""Model weight loaders.

Parity with reference `srt/model_loader/loader.py` (`DefaultModelLoader:326`
safetensors path, `DummyModelLoader:1294` used for hardware-free tests and
perf benchmarking without checkpoints). Executes the model's declarative
`WeightRule`s: read HF safetensors shards lazily, transform ([out,in] ->
[in,out], fused concats), quantize through the layer's LinearMethod, and
place on device with the model's GSPMD sharding.

AWQ/GPTQ pre-quantized checkpoint ingestion lives in
`sglang_tpu/quantization/ingest.py` and is dispatched from here.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.model_loader.weight_mapping import WeightRule, get_in_tree, set_in_tree
from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


class SafetensorsIndex:
    """Lazy tensor-name -> shard-file resolution over an HF checkpoint dir."""

    def __init__(self, model_path: str):
        self.model_path = model_path
        self.name_to_file: Dict[str, str] = {}
        idx = os.path.join(model_path, "model.safetensors.index.json")
        if os.path.isfile(idx):
            with open(idx) as f:
                weight_map = json.load(f)["weight_map"]
            for name, fname in weight_map.items():
                self.name_to_file[name] = os.path.join(model_path, fname)
        else:
            files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
            if not files:
                raise FileNotFoundError(f"no safetensors in {model_path}")
            from safetensors import safe_open

            for fname in files:
                with safe_open(fname, framework="numpy") as f:
                    for name in f.keys():
                        self.name_to_file[name] = fname
        self._open_files: Dict[str, object] = {}

    def has(self, name: str) -> bool:
        return name in self.name_to_file

    def get(self, name: str) -> np.ndarray:
        from safetensors import safe_open

        fname = self.name_to_file[name]
        if fname not in self._open_files:
            self._open_files[fname] = safe_open(fname, framework="numpy")
        try:
            return self._open_files[fname].get_tensor(name)
        except (AttributeError, TypeError):
            # dtypes this safetensors build cannot map (float8_*): parse
            # the file header directly and view the bytes as ml_dtypes
            return _raw_read_safetensor(fname, name)

    def close(self):
        self._open_files.clear()


class AliasIndex:
    """Resolve VLM serialization-layout drift: transformers moved
    multimodal checkpoints from `language_model.model.*` /
    `vision_tower.*` to `model.language_model.*` / `model.vision_tower.*`
    (4.52 VLM refactor); hub checkpoints exist in BOTH layouts. Model
    weight rules declare one layout; this shim tries the declared name
    first, then its counterpart in the other layout."""

    _PAIRS = [
        ("model.language_model.", "language_model.model."),
        ("model.vision_tower.", "vision_tower."),
        ("model.multi_modal_projector.", "multi_modal_projector."),
        ("model.audio_tower.", "audio_tower."),
        ("model.multi_modal_projector.", "multi_modal_projector."),
        ("model.visual.", "visual."),
        ("language_model.lm_head.", "lm_head."),
    ]

    def __init__(self, inner):
        self.inner = inner

    def _resolve(self, name: str) -> str:
        if self.inner.has(name):
            return name
        for a, b in self._PAIRS:
            if name.startswith(a) and self.inner.has(b + name[len(a):]):
                return b + name[len(a):]
            if name.startswith(b) and self.inner.has(a + name[len(b):]):
                return a + name[len(b):]
        return name

    def has(self, name: str) -> bool:
        return self.inner.has(self._resolve(name))

    def get(self, name: str):
        return self.inner.get(self._resolve(name))

    def close(self):
        self.inner.close()

    def __getattr__(self, item):  # keys(), name_to_file, ...
        return getattr(self.inner, item)


def _raw_read_safetensor(fname: str, name: str) -> np.ndarray:
    """Minimal safetensors reader for dtypes the installed backends choke
    on (fp8): 8-byte LE header length | JSON header | raw data."""
    import ml_dtypes
    import struct

    raw_dtypes = {
        "F8_E4M3": ml_dtypes.float8_e4m3fn,
        "F8_E5M2": ml_dtypes.float8_e5m2,
        "BF16": ml_dtypes.bfloat16,
    }
    with open(fname, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
        meta = header[name]
        dt = raw_dtypes.get(meta["dtype"])
        if dt is None:
            raise TypeError(f"unsupported raw dtype {meta['dtype']} for {name}")
        lo, hi = meta["data_offsets"]
        f.seek(8 + hlen + lo)
        buf = f.read(hi - lo)
    return np.frombuffer(buf, dtype=dt).reshape(meta["shape"]).copy()


def _device_put_leafdict(
    leaf: dict | np.ndarray,
    spec_tree,
    shape_tree,
    mesh: Optional[Mesh],
):
    """Place a weight (array or dict-of-arrays) on device with sharding."""

    def put(arr, spec, sds):
        arr = np.asarray(arr)
        target_dtype = sds.dtype
        if target_dtype == jnp.int4:
            out = jnp.asarray(arr, dtype=jnp.int4)
        else:
            out = jnp.asarray(arr, dtype=target_dtype)
        assert out.shape == sds.shape, f"shape {out.shape} != spec {sds.shape}"
        if mesh is not None:
            out = jax.device_put(out, NamedSharding(mesh, spec))
        return out

    if isinstance(leaf, dict):
        out = {}
        for k, v in leaf.items():
            if k in shape_tree:
                out[k] = put(v, spec_tree.get(k, PartitionSpec()), shape_tree[k])
            else:  # checkpoint-dependent extras (e.g. GPTQ act-order perm)
                arr = jnp.asarray(np.asarray(v))
                if mesh is not None:
                    arr = jax.device_put(
                        arr, NamedSharding(mesh, PartitionSpec())
                    )
                out[k] = arr
        return out
    return put(leaf, spec_tree, shape_tree)


def load_model_weights(
    model,
    model_config: ModelConfig,
    mesh: Optional[Mesh],
    load_format: str = "auto",
    seed: int = 0,
) -> dict:
    """Build the params pytree for `model` (a registry model instance)."""
    if load_format == "dummy":
        return load_dummy_weights(model, mesh, seed)
    if load_format == "zeros":
        return load_zero_weights(model, mesh)
    qc = model_config.quant_config or {}
    if qc.get("quant_method", "").lower() == "compressed-tensors":
        from sglang_tpu.quantization.ingest import load_prequantized_weights

        return load_prequantized_weights(model, model_config, mesh)
    if (
        model_config.quantization in ("awq", "gptq", "fp8_block")
        and model_config.quant_config
    ):
        from sglang_tpu.quantization.ingest import load_prequantized_weights

        return load_prequantized_weights(model, model_config, mesh)
    return load_safetensors_weights(model, model_config, mesh)


def load_safetensors_weights(
    model, model_config: ModelConfig, mesh: Optional[Mesh]
) -> dict:
    from sglang_tpu.model_loader.gguf import GGUFIndex, find_gguf

    if find_gguf(model_config.model_path):
        index = GGUFIndex(model_config.model_path)
    else:
        index = SafetensorsIndex(model_config.model_path)
        qc = model_config.quant_config or {}
        if qc.get("quant_method", "").lower() == "bitsandbytes":
            # NF4-packed tensors dequantize transparently at load
            from sglang_tpu.quantization.bnb import BnbIndex

            index = BnbIndex(index)
        elif qc.get("quant_method", "").lower() in (
            "mxfp4",
            "nvfp4",
            "modelopt",
            "modelopt_fp4",
        ):
            # fp4 STORAGE formats (v5e has no fp4 compute): dequantize at
            # load; the engine's int8/int4 paths re-quantize if requested
            from sglang_tpu.quantization.fp4 import Fp4Index

            index = Fp4Index(index)
    index = AliasIndex(index)
    specs = model.param_specs()
    shardings = model.param_shardings()
    params: dict = {"layers": [dict() for _ in range(model.num_layers)]}
    n_loaded = 0
    for rule in model.weight_rules():
        value = _execute_rule(model, rule, index)
        if value is None:
            continue
        spec = get_in_tree(shardings, rule.target)
        sds = get_in_tree(specs, rule.target)
        set_in_tree(
            params, rule.target, _device_put_leafdict(value, spec, sds, mesh)
        )
        n_loaded += 1
    index.close()
    logger.info("loaded %d weight groups from %s", n_loaded, model_config.model_path)
    return params


def _execute_rule(model, rule: WeightRule, index: SafetensorsIndex):
    kind = rule.kind
    if kind == "linear" or kind == "linear_nt":
        ws = [np.asarray(index.get(s), dtype=np.float32) for s in rule.sources]
        if kind == "linear":  # HF [out, in] -> [in, out]
            ws = [w.T for w in ws]
        w = ws[0] if len(ws) == 1 else np.concatenate(ws, axis=1)
        if rule.transform is not None:
            w = rule.transform(w)
        method = model.get_method(rule.method_key)
        return method.quantize(w)
    if kind == "linear_bias":
        # target path points AT the "b" entry inside the linear's dict;
        # optional (e.g. EAGLE fc.bias) — apply() treats a missing "b" as 0
        if not index.has(rule.sources[0]):
            return None
        bs = [np.asarray(index.get(s), dtype=np.float32) for s in rule.sources]
        b = bs[0] if len(bs) == 1 else np.concatenate(bs, axis=0)
        if rule.transform is not None:
            b = rule.transform(b)
        return b
    if kind == "embed" or kind == "norm" or kind == "raw":
        if not index.has(rule.sources[0]):
            return None
        v = index.get(rule.sources[0])
        if rule.transform is not None:
            v = rule.transform(np.asarray(v))
        return v
    if kind == "lm_head":
        if not index.has(rule.sources[0]):
            return None
        w = np.asarray(index.get(rule.sources[0])).T
        if rule.transform is not None:
            w = rule.transform(w)
        return w
    if kind == "linear_raw":
        # unquantized [out,in] linears: transpose, concat along out
        ws = [np.asarray(index.get(n), dtype=np.float32).T for n in rule.sources]
        w = ws[0] if len(ws) == 1 else np.concatenate(ws, axis=1)
        if rule.transform is not None:
            w = rule.transform(w)
        return w
    if kind == "router":
        return np.asarray(index.get(rule.sources[0]), dtype=np.float32).T
    if kind == "moe_w1":
        # sources ordered (e0.gate, e0.up, e1.gate, e1.up, ...) -> [E, H, 2M]
        per_expert = []
        for i in range(0, len(rule.sources), 2):
            gate = np.asarray(index.get(rule.sources[i]), dtype=np.float32).T
            up = np.asarray(index.get(rule.sources[i + 1]), dtype=np.float32).T
            per_expert.append(np.concatenate([gate, up], axis=1))
        return np.stack(per_expert)
    if kind == "moe_w2":
        return np.stack(
            [np.asarray(index.get(s), dtype=np.float32).T for s in rule.sources]
        )
    raise ValueError(kind)


def load_zero_weights(model, mesh: Optional[Mesh]) -> dict:
    """Device-side zero init — instant startup for perf benchmarking where
    weight values are irrelevant (matmul timing is data-independent on TPU).
    Scales get a small constant so quantized paths stay finite."""
    import jax as _jax

    shardings = model.param_shardings()

    def _make(shape, dtype, val):
        # int4 full/zeros hits a recursive-jit bug in eager dispatch on
        # some PJRT runtimes — build under an explicit jit instead
        fn = _jax.jit(
            lambda: jnp.full(shape, val, dtype=jnp.float32).astype(dtype)
            if val
            else jnp.zeros(shape, dtype=dtype)
        )
        return fn()

    def walk(spec_node, shard_node, key=None):
        if isinstance(spec_node, jax.ShapeDtypeStruct):
            val = 0.01 if key == "s" else 0.0
            arr = _make(spec_node.shape, spec_node.dtype, val)
            if mesh is not None:
                arr = _jax.device_put(
                    arr,
                    NamedSharding(
                        mesh,
                        shard_node if isinstance(shard_node, PartitionSpec) else PartitionSpec(),
                    ),
                )
            return arr
        if isinstance(spec_node, dict):
            return {
                k: walk(
                    v,
                    shard_node.get(k, PartitionSpec())
                    if isinstance(shard_node, dict)
                    else shard_node,
                    k,
                )
                for k, v in spec_node.items()
            }
        if isinstance(spec_node, list):
            return [walk(v, shard_node[i]) for i, v in enumerate(spec_node)]
        raise TypeError(type(spec_node))

    return walk(model.param_specs(), shardings)


def load_dummy_weights(model, mesh: Optional[Mesh], seed: int = 0) -> dict:
    """Deterministic random weights matching param_specs (reference
    DummyModelLoader — enables engine tests and perf runs without a
    checkpoint)."""
    specs = model.param_specs()
    shardings = model.param_shardings()
    rng = np.random.default_rng(seed)

    def init_leaf(sds: jax.ShapeDtypeStruct):
        dt = sds.dtype
        if dt == jnp.int4:
            arr = rng.integers(-8, 8, size=sds.shape, dtype=np.int32)
            return jnp.asarray(arr, dtype=jnp.int4)
        if dt == jnp.int8:
            return rng.integers(-127, 128, size=sds.shape, dtype=np.int64).astype(
                np.int8
            )
        if jnp.dtype(dt) in (jnp.dtype(jnp.float8_e4m3fn), jnp.dtype(jnp.float8_e5m2)):
            return (rng.standard_normal(sds.shape) * 0.05).astype(np.float32)
        if np.issubdtype(np.dtype("float32"), np.floating) and "float" in str(dt):
            scale = 0.02 if len(sds.shape) >= 2 else 1.0
            if sds.shape and sds.shape[-1] == 1:
                scale = 0.001
            arr = rng.standard_normal(sds.shape) * scale
            if len(sds.shape) == 1:
                arr = np.ones(sds.shape)  # norm weights
            return arr.astype(np.float32)
        return np.zeros(sds.shape, dtype=np.float32)

    # dict leaves (quantized weights) need their spec dict passed whole
    def walk_top(spec_node, shard_node, path=()):
        if isinstance(spec_node, dict) and all(
            isinstance(v, jax.ShapeDtypeStruct) for v in spec_node.values()
        ):
            # a linear weight dict leaf
            raw = {}
            for k, sds in spec_node.items():
                arr = init_leaf(sds)
                if k == "s":
                    arr = np.full(sds.shape, 0.01, dtype=np.float32)
                raw[k] = arr
            return _device_put_leafdict(raw, shard_node, spec_node, mesh)
        if isinstance(spec_node, jax.ShapeDtypeStruct):
            return _device_put_leafdict(init_leaf(spec_node), shard_node, spec_node, mesh)
        if isinstance(spec_node, dict):
            return {k: walk_top(v, shard_node[k], path + (k,)) for k, v in spec_node.items()}
        if isinstance(spec_node, list):
            return [walk_top(v, shard_node[i], path + (i,)) for i, v in enumerate(spec_node)]
        raise TypeError(type(spec_node))

    return walk_top(specs, shardings)
