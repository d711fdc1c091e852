"""Kimi-VL (MoonViT vision tower + DeepSeek-V2 language model).

Parity with reference `srt/models/kimi_vl.py` + `srt/models/
kimi_vl_moonvit.py` (behavioral port; no HF transformers class exists —
the upstream checkpoint ships trust_remote_code):

- MoonViT: per-patch conv embed (pixel tiles [L, 3, p, p]) + learnable
  2D position table bicubically resized onto each grid
  (`Learnable2DInterpPosEmb`, torch `F.interpolate(mode="bicubic")` —
  reproduced with the same static gather plan as GLM-4V), LayerNorm
  blocks with fused biased wqkv/wo, 2D rope in COMPLEX-PAIR layout
  (adjacent lanes (4i..4i+3) carry one (w, h) frequency pair:
  even pair rotates by x*f_i, odd pair by y*f_i — `Rope2DPosEmb`),
  gelu-tanh MLP2, final layernorm; rows stay in RASTER order (unlike
  the merge-grouped Qwen layout).
- patch_merger: per-grid 2x2 window grouping -> [G, 4, C].
- projector: LayerNorm(C) -> flatten 4C -> linear -> QuickGELU ->
  linear to the text hidden size (`KimiVLMultiModalProjector`; note the
  reference's effective activation is QuickGELU).
- language: DeepSeek-V2 (MLA + MoE) at checkpoint prefix
  `language_model.*`.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.deepseek_v2 import DeepseekV2ForCausalLM
from sglang_tpu.models.glm4v import (
    apply_interleaved_cos_sin,
    bicubic_resize_plan,
)


def moonvit_rope_angles(h: int, w: int, head_dim: int, theta: float = 10000.0):
    """[h*w, head_dim/2] angles in the MoonViT complex layout: raster
    rows; angle slot 2i reads the WIDTH position, slot 2i+1 the HEIGHT
    position, both at frequency theta^(-4i/head_dim)."""
    n = h * w
    flat = np.arange(n)
    x = (flat % w).astype(np.float64)
    y = (flat // w).astype(np.float64)
    freqs = 1.0 / (
        theta ** (np.arange(0, head_dim, 4, dtype=np.float64) / head_dim)
    )  # [hd/4]
    ang = np.empty((n, head_dim // 2), np.float64)
    ang[:, 0::2] = x[:, None] * freqs[None]
    ang[:, 1::2] = y[:, None] * freqs[None]
    return ang


def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (((xf - mu) / jnp.sqrt(var + eps)) * w + b).astype(x.dtype)


class KimiVLForConditionalGeneration:
    architectures = ["KimiVLForConditionalGeneration"]
    model_types = ["kimi_vl"]

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        v = hf["vision_config"]
        if not isinstance(v, dict):
            v = v.to_dict()
        self.vcfg = v
        self.v_hidden = v["hidden_size"]
        self.v_depth = v["num_hidden_layers"]
        self.v_heads = v["num_attention_heads"]
        self.v_inter = v["intermediate_size"]
        p = v.get("patch_size", 14)
        self.patch = p[0] if isinstance(p, (list, tuple)) else p
        self.pos_h = v.get("init_pos_emb_height", 64)
        self.pos_w = v.get("init_pos_emb_width", 64)
        mk = v.get("merge_kernel_size", (2, 2))
        self.merge = tuple(mk)
        self.image_token_id = hf.get(
            "media_placeholder_token_id", hf.get("image_token_id", 163605)
        )
        # share the SAME ModelConfig: DSv2.__init__ rewrites head_dim /
        # num_key_value_heads to the MLA latent-pool geometry and the
        # runner sizes the KV pool from this object
        self.lm = DeepseekV2ForCausalLM(config)
        self.lm.hf_prefix = "language_model.model"
        self.num_layers = self.lm.num_layers
        self.methods = self.lm.methods

    # ------------------------------------------------------------- params

    def _vision_specs(self):
        dt = self.config.dtype
        vh, vi = self.v_hidden, self.v_inter
        th = self.config.hidden_size
        m = self.merge[0] * self.merge[1]

        def lin(i, o):
            return {
                "w": jax.ShapeDtypeStruct((i, o), dt),
                "b": jax.ShapeDtypeStruct((o,), dt),
            }

        def norm(n):
            return {
                "w": jax.ShapeDtypeStruct((n,), dt),
                "b": jax.ShapeDtypeStruct((n,), dt),
            }

        block = {
            "norm0": norm(vh),
            "norm1": norm(vh),
            "wqkv": lin(vh, 3 * vh),
            "wo": lin(vh, vh),
            "fc0": lin(vh, vi),
            "fc1": lin(vi, vh),
        }
        shapes = {
            "patch_embed": jax.ShapeDtypeStruct(
                (vh, 3, self.patch, self.patch), dt
            ),
            "patch_bias": jax.ShapeDtypeStruct((vh,), dt),
            "pos_embed": jax.ShapeDtypeStruct((self.pos_h * self.pos_w, vh), dt),
            "blocks": [dict(block) for _ in range(self.v_depth)],
            "final_ln": norm(vh),
            "proj_pre_norm": norm(vh),
            "proj_l1": lin(vh * m, vh * m),
            "proj_l2": lin(vh * m, th),
        }
        specs = jax.tree_util.tree_map(lambda _: P(), shapes)
        return shapes, specs

    def param_specs(self) -> dict:
        tree = self.lm.param_specs()
        tree["vision"], _ = self._vision_specs()
        return tree

    def param_shardings(self) -> dict:
        tree = self.lm.param_shardings()
        _, tree["vision"] = self._vision_specs()
        return tree

    def weight_rules(self) -> List[WeightRule]:
        rules = list(self.lm.weight_rules())
        vt = "vision_tower"
        rules += [
            WeightRule(("vision", "patch_embed"), [f"{vt}.patch_embed.proj.weight"], kind="raw"),
            WeightRule(("vision", "patch_bias"), [f"{vt}.patch_embed.proj.bias"], kind="norm"),
            # checkpoint stores [H, W, C]; flatten the grid
            WeightRule(
                ("vision", "pos_embed"),
                [f"{vt}.patch_embed.pos_emb.weight"],
                kind="raw",
                transform=lambda x: x.reshape(-1, x.shape[-1]),
            ),
            WeightRule(("vision", "final_ln", "w"), [f"{vt}.encoder.final_layernorm.weight"], kind="norm"),
            WeightRule(("vision", "final_ln", "b"), [f"{vt}.encoder.final_layernorm.bias"], kind="norm"),
        ]
        for i in range(self.v_depth):
            bp = f"{vt}.encoder.blocks.{i}"
            L = ("vision", "blocks", i)
            for ours, theirs, is_lin in [
                ("norm0", "norm0", False),
                ("norm1", "norm1", False),
                ("wqkv", "wqkv", True),
                ("wo", "wo", True),
                ("fc0", "mlp.fc0", True),
                ("fc1", "mlp.fc1", True),
            ]:
                kind = "linear_raw" if is_lin else "norm"
                rules += [
                    WeightRule(L + (ours, "w"), [f"{bp}.{theirs}.weight"], kind=kind),
                    WeightRule(L + (ours, "b"), [f"{bp}.{theirs}.bias"], kind="norm"),
                ]
        mp = "multi_modal_projector"
        rules += [
            WeightRule(("vision", "proj_pre_norm", "w"), [f"{mp}.pre_norm.weight"], kind="norm"),
            WeightRule(("vision", "proj_pre_norm", "b"), [f"{mp}.pre_norm.bias"], kind="norm"),
            WeightRule(("vision", "proj_l1", "w"), [f"{mp}.linear_1.weight"], kind="linear_raw"),
            WeightRule(("vision", "proj_l1", "b"), [f"{mp}.linear_1.bias"], kind="norm"),
            WeightRule(("vision", "proj_l2", "w"), [f"{mp}.linear_2.weight"], kind="linear_raw"),
            WeightRule(("vision", "proj_l2", "b"), [f"{mp}.linear_2.bias"], kind="norm"),
        ]
        return rules

    def get_method(self, key: str):
        return self.lm.get_method(key)

    # ------------------------------------------------------------- vision

    def encode_images(self, params, pixel_values, grid_thw):
        """pixel tiles [L, 3, p, p] (or flattened rows [L, 3*p*p]) in
        raster order + grid (h, w) / (1, h, w) -> [L/4, text_hidden]."""
        vp = params["vision"]
        if len(grid_thw) == 3:
            t, h, w = grid_thw
            assert t == 1, "MoonViT grids are (h, w); video tiles t into h"
        else:
            h, w = grid_thw
        vh = self.v_hidden
        x = pixel_values.reshape(pixel_values.shape[0], -1)
        x = jnp.dot(
            x,
            vp["patch_embed"].reshape(vh, -1).T,
            preferred_element_type=jnp.float32,
        ).astype(self.config.dtype) + vp["patch_bias"]
        # learnable 2D pos emb, bicubically resized onto this grid
        idx, wts = bicubic_resize_plan(self.pos_h, self.pos_w, h, w)
        gathered = vp["pos_embed"].astype(jnp.float32)[jnp.asarray(idx)]
        pos = jnp.einsum("nk,nkc->nc", jnp.asarray(wts), gathered)
        x = x + pos.astype(x.dtype)
        hd = vh // self.v_heads
        ang = moonvit_rope_angles(h, w, hd)
        cos = jnp.asarray(np.cos(ang), jnp.float32)
        sin = jnp.asarray(np.sin(ang), jnp.float32)
        n = x.shape[0]
        scale = 1.0 / float(np.sqrt(hd))
        for i in range(self.v_depth):
            bp = vp["blocks"][i]
            res = x
            y = _ln(x, bp["norm0"]["w"], bp["norm0"]["b"])
            qkv = (
                jnp.dot(y, bp["wqkv"]["w"], preferred_element_type=jnp.float32)
                .astype(y.dtype)
                + bp["wqkv"]["b"]
            ).reshape(n, 3, self.v_heads, hd)
            q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
            q = apply_interleaved_cos_sin(q, cos, sin)
            k = apply_interleaved_cos_sin(k, cos, sin)
            att = jnp.einsum(
                "qhd,khd->hqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            att = jax.nn.softmax(att, -1).astype(y.dtype)
            o = jnp.einsum("hqk,khd->qhd", att, v).reshape(n, vh)
            x = res + (
                jnp.dot(o, bp["wo"]["w"], preferred_element_type=jnp.float32)
                .astype(y.dtype)
                + bp["wo"]["b"]
            )
            res = x
            y = _ln(x, bp["norm1"]["w"], bp["norm1"]["b"])
            y = jax.nn.gelu(
                jnp.dot(y, bp["fc0"]["w"], preferred_element_type=jnp.float32)
                .astype(y.dtype)
                + bp["fc0"]["b"],
                approximate=True,  # GELUTanh in the reference block_cfg
            )
            x = res + (
                jnp.dot(y, bp["fc1"]["w"], preferred_element_type=jnp.float32)
                .astype(y.dtype)
                + bp["fc1"]["b"]
            )
        x = _ln(x, vp["final_ln"]["w"], vp["final_ln"]["b"])
        # patch_merger: raster rows -> 2x2 window groups [G, 4, C]
        mh, mw = self.merge
        x = x.reshape(h // mh, mh, w // mw, mw, vh)
        x = jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(-1, mh * mw, vh)
        # projector: per-patch LN -> flatten -> linear/QuickGELU/linear
        x = _ln(x, vp["proj_pre_norm"]["w"], vp["proj_pre_norm"]["b"])
        x = x.reshape(-1, mh * mw * vh)
        x = (
            jnp.dot(x, vp["proj_l1"]["w"], preferred_element_type=jnp.float32)
            .astype(self.config.dtype)
            + vp["proj_l1"]["b"]
        )
        x = x * jax.nn.sigmoid(1.702 * x.astype(jnp.float32)).astype(x.dtype)
        x = (
            jnp.dot(x, vp["proj_l2"]["w"], preferred_element_type=jnp.float32)
            .astype(self.config.dtype)
            + vp["proj_l2"]["b"]
        )
        return x

    # ------------------------------------------------------------ forward

    def forward(self, params, kv_layers, fb, attn_backend):
        return self.lm.forward(params, kv_layers, fb, attn_backend)

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params, hidden)
