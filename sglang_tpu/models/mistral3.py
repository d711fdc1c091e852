"""Mistral-Small-3.1 (Mistral3) — Pixtral ViT + mistral language model.

Parity with reference `srt/models/pixtral.py` + `srt/models/mistral.py`
wrapping and HF `modeling_mistral3.py` / `modeling_pixtral.py`:

- Pixtral tower: conv patch embed (no bias), RMSNorm ln_pre, blocks of
  RMS attention_norm -> bias-free q/k/v/o with 2D rotary (even
  frequency slots read the ROW position, odd slots the COLUMN —
  `PixtralRotaryEmbedding`) -> RMS ffn_norm -> SwiGLU; NATIVE-resolution
  images (the grid comes from the pixel shape, no resize buckets);
- projector: RMSNorm over vision features, a learned spatial merger
  (m x m patch windows, channel-major flatten, bias-free linear), then
  linear -> GELU -> linear into the text hidden size.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM
from sglang_tpu.models.qwen2_vl import apply_mrope


def _rms(x, w, eps=1e-5):
    xf = x.astype(jnp.float32)
    out = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    return (out * w.astype(jnp.float32)).astype(x.dtype)


def pixtral_rope_angles(gh: int, gw: int, head_dim: int, theta: float):
    """[gh*gw, head_dim/2] angles, raster order: even frequency slots
    carry row * f[0::2], odd slots column * f[1::2] (matching the HF
    table built from cat(freqs_h, freqs_w) at index r*max_w + c)."""
    f = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    r, c = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    r = r.reshape(-1)[:, None]
    c = c.reshape(-1)[:, None]
    return np.concatenate(
        [r * f[0::2][None], c * f[1::2][None]], axis=-1
    ).astype(np.float32)


class Mistral3ForConditionalGeneration:
    architectures = ["Mistral3ForConditionalGeneration"]

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        v = hf["vision_config"]
        if not isinstance(v, dict):
            v = v.to_dict()
        self.vcfg = v
        self.v_hidden = v["hidden_size"]
        self.v_depth = v.get("num_hidden_layers", 24)
        self.v_heads = v["num_attention_heads"]
        self.v_inter = v["intermediate_size"]
        self.v_head_dim = v.get("head_dim") or self.v_hidden // self.v_heads
        self.v_theta = float(v.get("rope_theta", 10000.0))
        self.patch = v.get("patch_size", 14)
        self.merge = int(hf.get("spatial_merge_size", 2))
        self.proj_bias = bool(hf.get("multimodal_projector_bias", False))
        self.image_token_id = hf.get(
            "image_token_index", hf.get("image_token_id", 10)
        )
        self.lm = LlamaForCausalLM(config)
        self.lm.hf_prefix = "model.language_model"
        self.num_layers = self.lm.num_layers
        self.methods = self.lm.methods

    # ------------------------------------------------------------- params

    def _vision_specs(self):
        dt = self.config.dtype
        vh, vi = self.v_hidden, self.v_inter
        th = self.config.hidden_size
        m2 = self.merge * self.merge

        def lin(i, o, bias=False):
            d = {"w": jax.ShapeDtypeStruct((i, o), dt)}
            if bias:
                d["b"] = jax.ShapeDtypeStruct((o,), dt)
            return d

        block = {
            "attn_norm": jax.ShapeDtypeStruct((vh,), dt),
            "ffn_norm": jax.ShapeDtypeStruct((vh,), dt),
            "q": lin(vh, vh), "k": lin(vh, vh), "v": lin(vh, vh),
            "o": lin(vh, vh),
            "gate_up": lin(vh, 2 * vi),
            "down": lin(vi, vh),
        }
        shapes = {
            "patch_embed": jax.ShapeDtypeStruct(
                (vh, 3, self.patch, self.patch), dt
            ),
            "ln_pre": jax.ShapeDtypeStruct((vh,), dt),
            "blocks": [dict(block) for _ in range(self.v_depth)],
            "proj_norm": jax.ShapeDtypeStruct((vh,), dt),
            "merger": lin(vh * m2, vh),
            "proj_l1": lin(vh, th, bias=self.proj_bias),
            "proj_l2": lin(th, th, bias=self.proj_bias),
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
        vt = "model.vision_tower"
        mp = "model.multi_modal_projector"
        rules += [
            WeightRule(("vision", "patch_embed"), [f"{vt}.patch_conv.weight"], kind="raw"),
            WeightRule(("vision", "ln_pre"), [f"{vt}.ln_pre.weight"], kind="norm"),
            WeightRule(("vision", "proj_norm"), [f"{mp}.norm.weight"], kind="norm"),
            WeightRule(("vision", "merger", "w"), [f"{mp}.patch_merger.merging_layer.weight"], kind="linear_raw"),
            WeightRule(("vision", "proj_l1", "w"), [f"{mp}.linear_1.weight"], kind="linear_raw"),
            WeightRule(("vision", "proj_l2", "w"), [f"{mp}.linear_2.weight"], kind="linear_raw"),
        ]
        if self.proj_bias:
            rules += [
                WeightRule(("vision", "proj_l1", "b"), [f"{mp}.linear_1.bias"], kind="norm"),
                WeightRule(("vision", "proj_l2", "b"), [f"{mp}.linear_2.bias"], kind="norm"),
            ]
        for i in range(self.v_depth):
            bp = f"{vt}.transformer.layers.{i}"
            L = ("vision", "blocks", i)
            rules += [
                WeightRule(L + ("attn_norm",), [f"{bp}.attention_norm.weight"], kind="norm"),
                WeightRule(L + ("ffn_norm",), [f"{bp}.ffn_norm.weight"], kind="norm"),
                WeightRule(L + ("q", "w"), [f"{bp}.attention.q_proj.weight"], kind="linear_raw"),
                WeightRule(L + ("k", "w"), [f"{bp}.attention.k_proj.weight"], kind="linear_raw"),
                WeightRule(L + ("v", "w"), [f"{bp}.attention.v_proj.weight"], kind="linear_raw"),
                WeightRule(L + ("o", "w"), [f"{bp}.attention.o_proj.weight"], kind="linear_raw"),
                WeightRule(
                    L + ("gate_up", "w"),
                    [f"{bp}.feed_forward.gate_proj.weight", f"{bp}.feed_forward.up_proj.weight"],
                    kind="linear_raw",
                ),
                WeightRule(L + ("down", "w"), [f"{bp}.feed_forward.down_proj.weight"], kind="linear_raw"),
            ]
        return rules

    def get_method(self, key: str):
        return self.lm.get_method(key)

    # ------------------------------------------------------------- vision

    def encode_images(self, params, pixel_values):
        """[N, 3, H, W] native-resolution images (one geometry per jit
        key) -> [tokens, text_hidden]."""
        vp = params["vision"]
        n, _, Hpx, Wpx = pixel_values.shape
        p = self.patch
        gh, gw = Hpx // p, Wpx // p
        vh = self.v_hidden
        # conv as matmul over extracted patches (raster order)
        x = pixel_values.reshape(n, 3, gh, p, gw, p)
        x = jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(n * gh * gw, 3 * p * p)
        x = jnp.dot(
            x,
            vp["patch_embed"].reshape(vh, -1).T,
            preferred_element_type=jnp.float32,
        ).astype(self.config.dtype)
        x = _rms(x, vp["ln_pre"])
        hd = self.v_head_dim
        ang = pixtral_rope_angles(gh, gw, hd, self.v_theta)
        ang = np.tile(ang, (n, 1))
        cos = jnp.asarray(np.cos(ang), jnp.float32)
        sin = jnp.asarray(np.sin(ang), jnp.float32)
        tot = x.shape[0]
        scale = 1.0 / float(np.sqrt(hd))
        # block-diagonal across images: mask cross-image pairs
        img_of = jnp.repeat(jnp.arange(n), gh * gw)
        mask = img_of[:, None] == img_of[None, :]
        for i in range(self.v_depth):
            bp = vp["blocks"][i]
            res = x
            y = _rms(x, bp["attn_norm"])

            def prj(name, t=y):
                return jnp.dot(
                    t, bp[name]["w"], preferred_element_type=jnp.float32
                ).astype(y.dtype)

            q = prj("q").reshape(tot, self.v_heads, hd)
            k = prj("k").reshape(tot, self.v_heads, hd)
            v = prj("v").reshape(tot, self.v_heads, hd)
            q, k = apply_mrope(q, cos, sin), apply_mrope(k, cos, sin)
            att = jnp.einsum(
                "qhd,khd->hqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            att = jnp.where(mask[None], att, -1e30)
            att = jax.nn.softmax(att, -1).astype(y.dtype)
            o = jnp.einsum("hqk,khd->qhd", att, v).reshape(tot, vh)
            x = res + jnp.dot(
                o, bp["o"]["w"], preferred_element_type=jnp.float32
            ).astype(y.dtype)
            res = x
            y = _rms(x, bp["ffn_norm"])
            gu = jnp.dot(
                y, bp["gate_up"]["w"], preferred_element_type=jnp.float32
            ).astype(y.dtype)
            g, u = gu[:, : self.v_inter], gu[:, self.v_inter :]
            x = res + jnp.dot(
                jax.nn.silu(g) * u, bp["down"]["w"],
                preferred_element_type=jnp.float32,
            ).astype(y.dtype)
        # projector: RMS -> spatial merger (m x m windows, channel-major
        # flatten = unfold order) -> linear -> GELU -> linear
        x = _rms(x, vp["proj_norm"], eps=self.config.rms_norm_eps)
        m = self.merge
        x = x.reshape(n, gh // m, m, gw // m, m, vh)
        x = jnp.transpose(x, (0, 1, 3, 5, 2, 4)).reshape(-1, vh * m * m)
        x = jnp.dot(
            x, vp["merger"]["w"], preferred_element_type=jnp.float32
        ).astype(self.config.dtype)
        x = jnp.dot(
            x, vp["proj_l1"]["w"], preferred_element_type=jnp.float32
        ).astype(x.dtype)
        if "b" in vp["proj_l1"]:
            x = x + vp["proj_l1"]["b"]
        x = jax.nn.gelu(x, approximate=False)
        x = jnp.dot(
            x, vp["proj_l2"]["w"], preferred_element_type=jnp.float32
        ).astype(x.dtype)
        if "b" in vp["proj_l2"]:
            x = x + vp["proj_l2"]["b"]
        return x

    # ------------------------------------------------------------ forward

    def forward(self, params, kv_layers, fb, attn_backend):
        return self.lm.forward(params, kv_layers, fb, attn_backend)

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params, hidden)
