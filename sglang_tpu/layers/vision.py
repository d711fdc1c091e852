"""Generic ViT encoder for vision-language towers.

One configurable functional ViT serves the CLIP / SigLIP / InternViT
families (reference keeps a per-model copy of the encoder in each
`srt/models/*` vision file; here the tower is one spec-driven function
and each model file is reduced to config mapping + projector).

TPU shape: patchify is a reshape + matmul (stride==kernel conv), the
whole tower is one jitted function over a [N, 3, S, S] pixel batch run
by the ENGINE at admission (never inside the serving step); attention is
dense (a ViT sequence is a few hundred tokens — batched MXU einsums,
no paging needed). Reference analogue: `srt/layers/attention/vision.py`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.model_loader.weight_mapping import WeightRule


def layer_norm(x, w, b, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    out = (x - mu) / jnp.sqrt(var + eps) * w
    return out + b if b is not None else out


def rms_norm_np(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    out = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (out * w.astype(jnp.float32)).astype(x.dtype)


_ACTS = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
    "silu": jax.nn.silu,
}


@dataclass
class ViTSpec:
    hidden: int
    heads: int
    layers: int
    inter: int
    patch: int
    image_size: int
    act: str = "gelu_pytorch_tanh"
    norm: str = "layernorm"  # or "rmsnorm"
    eps: float = 1e-6
    cls_token: bool = False
    patch_bias: bool = True
    attn_bias: bool = True
    out_bias: bool = True
    pre_ln: bool = False  # CLIP pre_layrnorm
    post_ln: bool = False  # SigLIP post_layernorm
    layer_scale: bool = False  # InternViT lambda_1/2
    qk_norm: bool = False  # InternViT-6B per-head q/k norm
    # explicit position-id order (Idefics3/SmolVLM's bucketized embedding
    # maps full-grid coordinate i to bucket max(i-1, 0) — an HF float
    # boundary artifact that is nonetheless what the checkpoints trained
    # with); None = identity order
    pos_ids: Optional[tuple] = None

    @property
    def grid(self) -> int:
        return self.image_size // self.patch

    @property
    def n_patches(self) -> int:
        return self.grid * self.grid

    @property
    def n_tokens(self) -> int:
        return self.n_patches + (1 if self.cls_token else 0)

    @classmethod
    def from_hf(cls, v: dict, **over) -> "ViTSpec":
        def scalar(x):  # some configs store (h, w) tuples
            return x[0] if isinstance(x, (tuple, list)) else x

        kw = dict(
            hidden=v["hidden_size"],
            heads=v["num_attention_heads"],
            layers=v["num_hidden_layers"],
            inter=v["intermediate_size"],
            patch=scalar(v["patch_size"]),
            image_size=scalar(v["image_size"]),
            act=v.get("hidden_act", "gelu_pytorch_tanh"),
            eps=v.get("layer_norm_eps", 1e-6),
        )
        kw.update(over)
        return cls(**kw)


def vit_shapes(spec: ViTSpec, dtype) -> dict:
    vh, vi = spec.hidden, spec.inter
    has_b = spec.norm == "layernorm"

    def lin(i, o, bias=True):
        d = {"w": jax.ShapeDtypeStruct((i, o), dtype)}
        if bias:
            d["b"] = jax.ShapeDtypeStruct((o,), dtype)
        return d

    def norm():
        d = {"w": jax.ShapeDtypeStruct((vh,), dtype)}
        if has_b:
            d["b"] = jax.ShapeDtypeStruct((vh,), dtype)
        return d

    layer = {
        "ln1": norm(),
        "ln2": norm(),
        "q": lin(vh, vh, spec.attn_bias),
        "k": lin(vh, vh, spec.attn_bias),
        "v": lin(vh, vh, spec.attn_bias),
        "out": lin(vh, vh, spec.out_bias),
        "fc1": lin(vh, vi),
        "fc2": lin(vi, vh),
    }
    if spec.layer_scale:
        layer["ls1"] = jax.ShapeDtypeStruct((vh,), dtype)
        layer["ls2"] = jax.ShapeDtypeStruct((vh,), dtype)
    if spec.qk_norm:
        layer["q_norm"] = jax.ShapeDtypeStruct((vh,), dtype)
        layer["k_norm"] = jax.ShapeDtypeStruct((vh,), dtype)
    shapes = {
        "patch_embed": jax.ShapeDtypeStruct(
            (vh, 3, spec.patch, spec.patch), dtype
        ),
        "pos_embed": jax.ShapeDtypeStruct((spec.n_tokens, vh), dtype),
        "layers": [dict(layer) for _ in range(spec.layers)],
    }
    if spec.patch_bias:
        shapes["patch_bias"] = jax.ShapeDtypeStruct((vh,), dtype)
    if spec.cls_token:
        shapes["class_embed"] = jax.ShapeDtypeStruct((vh,), dtype)
    if spec.pre_ln:
        shapes["pre_ln"] = norm()
    if spec.post_ln:
        shapes["post_ln"] = norm()
    return shapes


def vit_specs_tree(shapes) -> dict:
    return jax.tree_util.tree_map(lambda _: P(), shapes)


def vit_encode(
    spec: ViTSpec,
    vp: dict,
    pixel_values: jax.Array,  # [N, 3, S, S]
    feature_layer: int = -1,  # -1 = all layers; -2 = skip last
    apply_post_ln: Optional[bool] = None,  # None: post_ln iff all layers
) -> jax.Array:  # [N, n_tokens, vh]
    n = pixel_values.shape[0]
    p = spec.patch
    g = spec.grid
    vh = spec.hidden
    norm = (
        (lambda x, d: layer_norm(x, d["w"], d.get("b"), spec.eps))
        if spec.norm == "layernorm"
        else (lambda x, d: rms_norm_np(x, d["w"], spec.eps))
    )
    act = _ACTS[spec.act]
    x = pixel_values.reshape(n, 3, g, p, g, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(n, g * g, 3 * p * p)
    w_patch = vp["patch_embed"].reshape(vh, -1).T
    x = jnp.dot(x, w_patch, preferred_element_type=jnp.float32).astype(
        vp["patch_embed"].dtype
    )
    if spec.patch_bias:
        x = x + vp["patch_bias"]
    if spec.cls_token:
        cls = jnp.broadcast_to(vp["class_embed"], (n, 1, vh))
        x = jnp.concatenate([cls, x], axis=1)
    pos = vp["pos_embed"]
    if spec.pos_ids is not None:
        pos = pos[jnp.asarray(spec.pos_ids, dtype=jnp.int32)]
    h = x + pos[None]
    if spec.pre_ln:
        h = norm(h, vp["pre_ln"])
    n_layers = (
        spec.layers + 1 + feature_layer if feature_layer < 0 else feature_layer + 1
    )
    hd = vh // spec.heads
    scale = 1.0 / math.sqrt(hd)

    def proj(d, x):
        y = jnp.dot(x, d["w"], preferred_element_type=jnp.float32).astype(
            x.dtype
        )
        return y + d["b"] if "b" in d else y

    for i in range(n_layers):
        lp = vp["layers"][i]
        t = h.shape[1]
        x = norm(h, lp["ln1"])
        q = proj(lp["q"], x)
        k = proj(lp["k"], x)
        if spec.qk_norm:
            q = rms_norm_np(q, lp["q_norm"], spec.eps)
            k = rms_norm_np(k, lp["k_norm"], spec.eps)
        q = q.reshape(n, t, spec.heads, hd)
        k = k.reshape(n, t, spec.heads, hd)
        v = proj(lp["v"], x).reshape(n, t, spec.heads, hd)
        att = jnp.einsum(
            "nqhd,nkhd->nhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        att = jax.nn.softmax(att, axis=-1).astype(x.dtype)
        o = jnp.einsum("nhqk,nkhd->nqhd", att, v).reshape(n, t, vh)
        o = proj(lp["out"], o)
        if spec.layer_scale:
            o = o * lp["ls1"]
        h = h + o
        x = norm(h, lp["ln2"])
        x = proj(lp["fc2"], act(proj(lp["fc1"], x)))
        if spec.layer_scale:
            x = x * lp["ls2"]
        h = h + x
    if apply_post_ln is None:
        apply_post_ln = feature_layer == -1
    if spec.post_ln and apply_post_ln:
        h = norm(h, vp["post_ln"])
    return h


def vit_weight_rules(
    spec: ViTSpec,
    hf_prefix: str,  # e.g. "vision_tower.vision_model"
    target: Tuple = ("vision",),
    names: Optional[Dict[str, str]] = None,
) -> List[WeightRule]:
    """Build loader rules. `names` overrides the HF sub-module names
    (defaults follow the CLIP/SigLIP serialization)."""
    nm = {
        "patch": "embeddings.patch_embedding",
        "cls": "embeddings.class_embedding",
        "pos": "embeddings.position_embedding.weight",
        "pre_ln": "pre_layrnorm",
        "post_ln": "post_layernorm",
        "layer": "encoder.layers.{i}",
        "ln1": "layer_norm1",
        "ln2": "layer_norm2",
        "q": "self_attn.q_proj",
        "k": "self_attn.k_proj",
        "v": "self_attn.v_proj",
        "out": "self_attn.out_proj",
        "fc1": "mlp.fc1",
        "fc2": "mlp.fc2",
        "ls1": "lambda_1",
        "ls2": "lambda_2",
        "q_norm": "q_norm",
        "k_norm": "k_norm",
    }
    nm.update(names or {})
    pre = hf_prefix
    has_b = spec.norm == "layernorm"
    rules = [
        WeightRule(
            target + ("patch_embed",), [f"{pre}.{nm['patch']}.weight"],
            kind="raw",
        ),
        WeightRule(target + ("pos_embed",), [f"{pre}.{nm['pos']}"], kind="raw"),
    ]
    if spec.patch_bias:
        rules.append(
            WeightRule(
                target + ("patch_bias",), [f"{pre}.{nm['patch']}.bias"],
                kind="norm",
            )
        )
    if spec.cls_token:
        rules.append(
            WeightRule(
                target + ("class_embed",), [f"{pre}.{nm['cls']}"], kind="raw"
            )
        )
    for key in ("pre_ln", "post_ln"):
        if getattr(spec, key):
            rules.append(
                WeightRule(
                    target + (key, "w"), [f"{pre}.{nm[key]}.weight"],
                    kind="norm",
                )
            )
            if has_b:
                rules.append(
                    WeightRule(
                        target + (key, "b"), [f"{pre}.{nm[key]}.bias"],
                        kind="norm",
                    )
                )
    for i in range(spec.layers):
        lp = f"{pre}.{nm['layer'].format(i=i)}"
        L = target + ("layers", i)
        for ours in ("ln1", "ln2"):
            rules.append(
                WeightRule(
                    L + (ours, "w"), [f"{lp}.{nm[ours]}.weight"], kind="norm"
                )
            )
            if has_b:
                rules.append(
                    WeightRule(
                        L + (ours, "b"), [f"{lp}.{nm[ours]}.bias"],
                        kind="norm",
                    )
                )
        for ours, bias in (
            ("q", spec.attn_bias),
            ("k", spec.attn_bias),
            ("v", spec.attn_bias),
            ("out", spec.out_bias),
            ("fc1", True),
            ("fc2", True),
        ):
            rules.append(
                WeightRule(
                    L + (ours, "w"), [f"{lp}.{nm[ours]}.weight"],
                    kind="linear_raw",
                )
            )
            if bias:
                rules.append(
                    WeightRule(
                        L + (ours, "b"), [f"{lp}.{nm[ours]}.bias"],
                        kind="norm",
                    )
                )
        if spec.layer_scale:
            rules.append(
                WeightRule(L + ("ls1",), [f"{lp}.{nm['ls1']}"], kind="raw")
            )
            rules.append(
                WeightRule(L + ("ls2",), [f"{lp}.{nm['ls2']}"], kind="raw")
            )
        if spec.qk_norm:
            rules.append(
                WeightRule(
                    L + ("q_norm",), [f"{lp}.{nm['q_norm']}.weight"],
                    kind="norm",
                )
            )
            rules.append(
                WeightRule(
                    L + ("k_norm",), [f"{lp}.{nm['k_norm']}.weight"],
                    kind="norm",
                )
            )
    return rules


def pixel_shuffle(x: jax.Array, scale: float) -> jax.Array:
    """InternVL pixel shuffle: [N, g, g, C] -> [N, g*s, g*s, C/(s*s)]
    with s = scale (< 1 downsamples token count by 1/s^2)."""
    n, w, h, c = x.shape
    x = x.reshape(n, w, int(h * scale), int(c / scale))
    x = jnp.transpose(x, (0, 2, 1, 3))
    x = x.reshape(
        n, int(h * scale), int(w * scale), int(c / (scale * scale))
    )
    x = jnp.transpose(x, (0, 2, 1, 3))
    return x
