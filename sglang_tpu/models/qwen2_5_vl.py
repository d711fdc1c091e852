"""Qwen2.5-VL (windowed ViT + M-RoPE Qwen2 language model).

Parity with reference `srt/models/qwen2_5_vl.py` and HF
`modeling_qwen2_5_vl`. Differences from Qwen2-VL, all in the tower:
- RMSNorm everywhere (block norms + merger ln_q), SwiGLU block MLP
  (gate/up/down with biases);
- window attention: patch rows are REORDERED so each
  `window_size`-pixel window is contiguous (HF `get_window_index`,
  ported to numpy — the grid is static per call so the permutation is
  host-computed), windowed blocks attend block-diagonally per window,
  `fullatt_block_indexes` blocks attend globally; the merger output is
  scattered back to original order via argsort;
- merger projects to `out_hidden_size`.
The language side (M-RoPE `get_rope_index`, mrope serving plumbing) is
inherited from Qwen2-VL unchanged (image semantics identical; for video
grids Qwen2.5 scales temporal positions by `tokens_per_second` —
second_per_grid_ts defaults to one grid tick here).
"""

from __future__ import annotations

import math
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.qwen2_vl import Qwen2VLForConditionalGeneration, apply_mrope


def _rms(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    out = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (out * w.astype(jnp.float32)).astype(x.dtype)


class Qwen2_5_VLForConditionalGeneration(Qwen2VLForConditionalGeneration):
    architectures = ["Qwen2_5_VLForConditionalGeneration"]
    model_types = ["qwen2_5_vl"]

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        v = hf["vision_config"]
        if not isinstance(v, dict):
            v = v.to_dict()
        # qwen2.5 renames embed_dim -> hidden_size and makes the MLP width
        # explicit; normalize before the base init reads them
        v = dict(v)
        v.setdefault("embed_dim", v.get("hidden_size"))
        v.setdefault("mlp_ratio", 4)
        hf = dict(hf)
        hf["vision_config"] = v
        config.hf_config = hf
        super().__init__(config)
        self.v_mlp = int(v.get("intermediate_size") or self.v_embed * 4)
        self.out_hidden = int(v.get("out_hidden_size") or self.hidden_size)
        self.window_size = int(v.get("window_size", 112))
        self.fullatt_blocks = set(v.get("fullatt_block_indexes") or [])

    # ------------------------------------------------------------- specs

    def _vision_specs(self):
        dt = self.config.dtype
        ve, vm = self.v_embed, self.v_mlp

        def lin(i, o):
            return {
                "w": jax.ShapeDtypeStruct((i, o), dt),
                "b": jax.ShapeDtypeStruct((o,), dt),
            }

        def rnorm(n):
            return {"w": jax.ShapeDtypeStruct((n,), dt)}

        block = {
            "norm1": rnorm(ve),
            "norm2": rnorm(ve),
            "qkv": lin(ve, 3 * ve),
            "proj": lin(ve, ve),
            "gate": lin(ve, vm),
            "up": lin(ve, vm),
            "down": lin(vm, ve),
        }
        md = ve * self.merge * self.merge
        shapes = {
            "patch_embed": jax.ShapeDtypeStruct(
                (ve, 3, self.temporal_patch, self.patch, self.patch), dt
            ),
            "blocks": [dict(block) for _ in range(self.v_depth)],
            "merger_ln": rnorm(ve),
            "merger_fc1": lin(md, md),
            "merger_fc2": lin(md, self.out_hidden),
        }
        from jax.sharding import PartitionSpec as P

        specs = jax.tree_util.tree_map(lambda _: P(), shapes)
        return shapes, specs

    def weight_rules(self) -> List[WeightRule]:
        # language rules from the LLAMA grandparent (qwen2-vl's override
        # would emit the old fc1/fc2 vision names)
        rules = list(super(Qwen2VLForConditionalGeneration, self).weight_rules())
        vm = "visual"
        rules.append(
            WeightRule(("vision", "patch_embed"), [f"{vm}.patch_embed.proj.weight"], kind="raw")
        )
        for i in range(self.v_depth):
            bp = f"{vm}.blocks.{i}"
            L = ("vision", "blocks", i)
            rules += [
                WeightRule(L + ("norm1", "w"), [f"{bp}.norm1.weight"], kind="norm"),
                WeightRule(L + ("norm2", "w"), [f"{bp}.norm2.weight"], kind="norm"),
            ]
            for ours, theirs in [
                ("qkv", "attn.qkv"),
                ("proj", "attn.proj"),
                ("gate", "mlp.gate_proj"),
                ("up", "mlp.up_proj"),
                ("down", "mlp.down_proj"),
            ]:
                rules += [
                    WeightRule(L + (ours, "w"), [f"{bp}.{theirs}.weight"], kind="linear_raw"),
                    WeightRule(L + (ours, "b"), [f"{bp}.{theirs}.bias"], kind="norm"),
                ]
        rules += [
            WeightRule(("vision", "merger_ln", "w"), [f"{vm}.merger.ln_q.weight"], kind="norm"),
            WeightRule(("vision", "merger_fc1", "w"), [f"{vm}.merger.mlp.0.weight"], kind="linear_raw"),
            WeightRule(("vision", "merger_fc1", "b"), [f"{vm}.merger.mlp.0.bias"], kind="norm"),
            WeightRule(("vision", "merger_fc2", "w"), [f"{vm}.merger.mlp.2.weight"], kind="linear_raw"),
            WeightRule(("vision", "merger_fc2", "b"), [f"{vm}.merger.mlp.2.bias"], kind="norm"),
        ]
        return rules

    # ------------------------------------------------------------- vision

    def _window_order(self, t: int, h: int, w: int):
        """Port of HF `get_window_index` (numpy; grid is static per
        call): returns (window_index [N/mu] merge-group permutation,
        win_id [N] per reordered TOKEN window id)."""
        m = self.merge
        mu = m * m
        gh, gw = h // m, w // m
        vs = self.window_size // m // self.patch
        idx = np.arange(t * gh * gw).reshape(t, gh, gw)
        pad_h = (-gh) % vs
        pad_w = (-gw) % vs
        nh, nw = (gh + pad_h) // vs, (gw + pad_w) // vs
        padded = np.pad(
            idx, ((0, 0), (0, pad_h), (0, pad_w)), constant_values=-100
        )
        padded = padded.reshape(t, nh, vs, nw, vs)
        padded = padded.transpose(0, 1, 3, 2, 4).reshape(t, nh * nw, vs, vs)
        seqlens = (padded != -100).sum(axis=(2, 3)).reshape(-1)
        flat = padded.reshape(-1)
        window_index = flat[flat != -100]
        win_id = np.repeat(np.arange(len(seqlens)), seqlens * mu)
        return window_index, win_id

    def encode_images(self, params, pixel_values, grid_thw):
        vp = params["vision"]
        t, h, w = grid_thw
        mu = self.merge * self.merge
        x = jnp.dot(
            pixel_values,
            vp["patch_embed"].reshape(self.v_embed, -1).T,
            preferred_element_type=jnp.float32,
        ).astype(self.config.dtype)
        hd = self.v_embed // self.v_heads
        pos = self._vit_pos_ids(t, h, w)  # [N, 2] original order
        window_index, win_id = self._window_order(t, h, w)
        # reorder merge groups into window-contiguous order
        n = x.shape[0]
        x = x.reshape(n // mu, mu, -1)[window_index].reshape(n, -1)
        pos = pos.reshape(n // mu, mu, 2)[window_index].reshape(n, 2)
        inv = 1.0 / (
            10000.0 ** (np.arange(0, hd // 2, 2, dtype=np.float32) / (hd // 2))
        )
        freqs = np.concatenate(
            [pos[:, :1] * inv[None], pos[:, 1:] * inv[None]], axis=-1
        )
        cos = jnp.asarray(np.cos(freqs), dtype=jnp.float32)
        sin = jnp.asarray(np.sin(freqs), dtype=jnp.float32)
        win_mask = jnp.asarray(win_id[:, None] == win_id[None, :])
        scale = 1.0 / math.sqrt(hd)
        for i in range(self.v_depth):
            bp = vp["blocks"][i]
            res = x
            y = _rms(x, bp["norm1"]["w"])
            qkv = (
                jnp.dot(y, bp["qkv"]["w"], preferred_element_type=jnp.float32)
                .astype(y.dtype)
                + bp["qkv"]["b"]
            ).reshape(n, 3, self.v_heads, hd)
            q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
            q, k = apply_mrope(q, cos, sin), apply_mrope(k, cos, sin)
            att = jnp.einsum(
                "qhd,khd->hqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            if i not in self.fullatt_blocks:
                att = jnp.where(win_mask[None], att, -1e30)
            att = jax.nn.softmax(att, -1).astype(y.dtype)
            o = jnp.einsum("hqk,khd->qhd", att, v).reshape(n, self.v_embed)
            x = res + (
                jnp.dot(o, bp["proj"]["w"], preferred_element_type=jnp.float32)
                .astype(y.dtype)
                + bp["proj"]["b"]
            )
            res = x
            y = _rms(x, bp["norm2"]["w"])
            g = (
                jnp.dot(y, bp["gate"]["w"], preferred_element_type=jnp.float32)
                .astype(y.dtype)
                + bp["gate"]["b"]
            )
            u = (
                jnp.dot(y, bp["up"]["w"], preferred_element_type=jnp.float32)
                .astype(y.dtype)
                + bp["up"]["b"]
            )
            y = jax.nn.silu(g) * u
            x = res + (
                jnp.dot(y, bp["down"]["w"], preferred_element_type=jnp.float32)
                .astype(y.dtype)
                + bp["down"]["b"]
            )
        x = _rms(x, vp["merger_ln"]["w"])
        md = self.v_embed * mu
        x = x.reshape(-1, md)
        x = jax.nn.gelu(
            jnp.dot(x, vp["merger_fc1"]["w"], preferred_element_type=jnp.float32)
            .astype(x.dtype)
            + vp["merger_fc1"]["b"],
            approximate=False,
        )
        x = (
            jnp.dot(x, vp["merger_fc2"]["w"], preferred_element_type=jnp.float32)
            .astype(x.dtype)
            + vp["merger_fc2"]["b"]
        )
        # restore original merge-group order
        reverse = np.argsort(window_index)
        return x[jnp.asarray(reverse)]
