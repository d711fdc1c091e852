"""MiniCPM-V 2.6 (Idefics2-style SigLIP tower + perceiver resampler +
Qwen2 LM).

Parity with reference `srt/models/minicpmv.py` (MiniCPMV2_6:
`init_vision_module` -> Idefics2VisionTransformer, `init_resampler` ->
`Resampler2_5:270`, llm -> Qwen2) and the hub checkpoint layout
(`vpm.*`, `resampler.*`, `llm.*`):
- tower: SigLIP encoder (patch bias, post layernorm, bucketed position
  ids — the same full-grid `max(i-1, 0)` quirk as Idefics3);
- resampler: 64 learnable queries cross-attend over the projected patch
  features + 2D sin-cos position encodings (`get_2d_sincos_pos_embed`
  version (2,5), ported verbatim), one torch-MultiheadAttention-layout
  attention (packed in_proj), ln_post + out projection;
- each image contributes exactly `query_num` language-space embeddings
  on its placeholder tokens.

The resampler attention is validated against `torch.nn.MultiheadAttention`
with shared weights in tests (no HF reference class exists for this
architecture).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.vision import (
    ViTSpec,
    layer_norm,
    vit_encode,
    vit_shapes,
    vit_specs_tree,
    vit_weight_rules,
)
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import Qwen2ForCausalLM


def sincos_2d_pos(embed_dim: int, h: int, w: int) -> np.ndarray:
    """`get_2d_sincos_pos_embed(..., version=(2,5))` (reference
    minicpmv.py:125): returns [h, w, embed_dim]."""
    grid_w, grid_h = np.meshgrid(
        np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32)
    )

    def one(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float32) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("hw,d->hwd", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=-1)

    # reference grid stacking puts the W mesh first and feeds it to emb_h
    return np.concatenate(
        [one(embed_dim // 2, grid_w), one(embed_dim // 2, grid_h)], axis=-1
    )


class MiniCPMVForConditionalGeneration:
    architectures = ["MiniCPMV", "MiniCPMV2_6", "MiniCPMVForConditionalGeneration"]
    model_types = ["minicpmv"]

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        v = hf.get("vision_config") or {}
        if not isinstance(v, dict):
            v = v.to_dict()
        g = ViTSpec.from_hf(v).grid
        bucket = [max(i - 1, 0) for i in range(g)]
        pos_ids = tuple(
            bucket[y] * g + bucket[x] for y in range(g) for x in range(g)
        )
        self.vspec = ViTSpec.from_hf(
            v,
            act=v.get("hidden_act", "gelu_pytorch_tanh"),
            cls_token=False,
            patch_bias=True,
            post_ln=True,
            pos_ids=pos_ids,
        )
        self.num_queries = int(hf.get("query_num", 64))
        self.image_token_id = hf.get("image_token_id", hf.get(
            "image_token_index", 128244
        ))
        self.lm = Qwen2ForCausalLM(dataclasses.replace(config))
        self.num_layers = self.lm.num_layers
        self.methods = self.lm.methods

    # ------------------------------------------------------------- params

    def param_specs(self) -> dict:
        dt = self.config.dtype
        h = self.config.hidden_size
        vd = self.vspec.hidden
        tree = self.lm.param_specs()
        tree["vision"] = vit_shapes(self.vspec, dt)

        def lin(i, o, bias=True):
            d = {"w": jax.ShapeDtypeStruct((i, o), dt)}
            if bias:
                d["b"] = jax.ShapeDtypeStruct((o,), dt)
            return d

        def ln():
            return {
                "w": jax.ShapeDtypeStruct((h,), dt),
                "b": jax.ShapeDtypeStruct((h,), dt),
            }

        tree["resampler"] = {
            "query": jax.ShapeDtypeStruct((self.num_queries, h), dt),
            "kv_proj": {"w": jax.ShapeDtypeStruct((vd, h), dt)},
            "in_proj": lin(h, 3 * h),
            "out_proj": lin(h, h),
            "ln_q": ln(),
            "ln_kv": ln(),
            "ln_post": ln(),
            "proj": jax.ShapeDtypeStruct((h, h), dt),
        }
        return tree

    def param_shardings(self) -> dict:
        tree = self.lm.param_shardings()
        tree["vision"] = vit_specs_tree(vit_shapes(self.vspec, self.config.dtype))
        tree["resampler"] = jax.tree_util.tree_map(
            lambda _: P(), self.param_specs()["resampler"]
        )
        return tree

    def weight_rules(self) -> List[WeightRule]:
        self.lm.hf_prefix = "llm.model"
        rules = []
        for r in self.lm.weight_rules():
            if r.sources == ["lm_head.weight"]:
                r = dataclasses.replace(r, sources=["llm.lm_head.weight"])
            rules.append(r)
        rules += vit_weight_rules(self.vspec, "vpm")
        rp = "resampler"
        rules += [
            WeightRule(("resampler", "query"), [f"{rp}.query"], kind="raw"),
            WeightRule(("resampler", "kv_proj", "w"), [f"{rp}.kv_proj.weight"], kind="linear_raw"),
            WeightRule(("resampler", "in_proj", "w"), [f"{rp}.attn.in_proj_weight"], kind="linear_raw"),
            WeightRule(("resampler", "in_proj", "b"), [f"{rp}.attn.in_proj_bias"], kind="norm"),
            WeightRule(("resampler", "out_proj", "w"), [f"{rp}.attn.out_proj.weight"], kind="linear_raw"),
            WeightRule(("resampler", "out_proj", "b"), [f"{rp}.attn.out_proj.bias"], kind="norm"),
            WeightRule(("resampler", "ln_q", "w"), [f"{rp}.ln_q.weight"], kind="norm"),
            WeightRule(("resampler", "ln_q", "b"), [f"{rp}.ln_q.bias"], kind="norm"),
            WeightRule(("resampler", "ln_kv", "w"), [f"{rp}.ln_kv.weight"], kind="norm"),
            WeightRule(("resampler", "ln_kv", "b"), [f"{rp}.ln_kv.bias"], kind="norm"),
            WeightRule(("resampler", "ln_post", "w"), [f"{rp}.ln_post.weight"], kind="norm"),
            WeightRule(("resampler", "ln_post", "b"), [f"{rp}.ln_post.bias"], kind="norm"),
            WeightRule(("resampler", "proj"), [f"{rp}.proj"], kind="raw"),
        ]
        return rules

    def get_method(self, key: str):
        return self.lm.get_method(key)

    # ------------------------------------------------------------- vision

    def resample(self, params: dict, feats: jax.Array) -> jax.Array:
        """Perceiver resampler (reference Resampler2_5.forward): [N, L, vd]
        patch features -> [N, Q, H]."""
        rp = params["resampler"]
        h = self.config.hidden_size
        nh = max(1, h // 128) if h % 128 == 0 else max(1, h // 64)
        # torch MultiheadAttention uses embed_dim/num_heads; the hub
        # checkpoints use embed_dim/128 heads — recover from config
        nh = int(self.config.hf_config.get("resampler_num_heads") or nh)
        n, L, _ = feats.shape
        g = int(math.isqrt(L))
        x = jnp.dot(
            feats, rp["kv_proj"]["w"], preferred_element_type=jnp.float32
        ).astype(feats.dtype)
        x = layer_norm(x, rp["ln_kv"]["w"], rp["ln_kv"]["b"], 1e-6)
        q = layer_norm(
            rp["query"], rp["ln_q"]["w"], rp["ln_q"]["b"], 1e-6
        )  # [Q, H]
        pos = jnp.asarray(
            sincos_2d_pos(h, g, g).reshape(L, h), dtype=feats.dtype
        )
        keys = x + pos[None]
        wq, wk, wv = jnp.split(rp["in_proj"]["w"], 3, axis=1)
        bq, bk, bv = jnp.split(rp["in_proj"]["b"], 3)
        hd = h // nh
        Q = self.num_queries
        qh = (jnp.dot(q, wq) + bq).reshape(Q, nh, hd)
        kh = (jnp.dot(keys, wk) + bk).reshape(n, L, nh, hd)
        vh = (jnp.dot(x, wv) + bv).reshape(n, L, nh, hd)
        att = jnp.einsum(
            "qhd,nkhd->nhqk", qh, kh, preferred_element_type=jnp.float32
        ) / math.sqrt(hd)
        att = jax.nn.softmax(att, axis=-1).astype(feats.dtype)
        o = jnp.einsum("nhqk,nkhd->nqhd", att, vh).reshape(n, Q, h)
        o = jnp.dot(o, rp["out_proj"]["w"]) + rp["out_proj"]["b"]
        o = layer_norm(o, rp["ln_post"]["w"], rp["ln_post"]["b"], 1e-6)
        return jnp.dot(o, rp["proj"]).astype(feats.dtype)

    def encode_images(self, params: dict, pixel_values: jax.Array) -> jax.Array:
        feats = vit_encode(self.vspec, params["vision"], pixel_values)
        out = self.resample(params, feats)  # [N, Q, H]
        return out.reshape(-1, out.shape[-1])

    # ------------------------------------------------------------- forward

    def forward(self, params, kv_layers, fb, attn_backend):
        return self.lm.forward(params, kv_layers, fb, attn_backend)

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params, hidden)
