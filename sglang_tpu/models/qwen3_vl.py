"""Qwen3-VL / Qwen3-VL-MoE (deepstack ViT + interleaved M-RoPE).

Parity with reference `srt/models/qwen3_vl.py` / `qwen3_vl_moe.py` and
HF `modeling_qwen3_vl*.py`:

- vision: LayerNorm ViT with biased fused qkv/proj and gelu-tanh MLP;
  learned position table BILINEARLY resampled per grid (HF
  `fast_pos_embed_interpolate`: linspace(0, S-1, h) corners — the
  align-corners convention, not the half-pixel one GLM-4V uses) then
  permuted into the merge-grouped patch order; qwen2-vl 2D rotary;
  DEEPSTACK: three intermediate block outputs pass through their own
  post-shuffle-norm patch mergers and are ADDED to the language hidden
  states at the visual token rows after decoder layers 0/1/2
  (arXiv 2406.04334);
- text: Qwen3 (per-head qk-norm) with INTERLEAVED M-RoPE — the (t,h,w)
  sections interleave across frequency dims ([THWTHW...TT]) instead of
  chunking (`apply_interleaved_mrope`).

Serving shape: the tower returns [G, (1 + n_deepstack) * H] — the main
embedding concatenated with the per-layer deepstack features — so the
whole visual payload rides the existing (mm_embeds, mm_rows) scatter;
the model splits it again inside `forward`.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.norms import rms_norm
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import Qwen3ForCausalLM
from sglang_tpu.models.qwen2_moe import Qwen3MoeForCausalLM
from sglang_tpu.models.qwen2_vl import Qwen2VLForConditionalGeneration, apply_mrope


def _ln(x, w, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (((xf - mu) / jnp.sqrt(var + eps)) * w + b).astype(x.dtype)


def bilinear_pos_plan(S: int, h: int, w: int):
    """HF fast_pos_embed_interpolate: sample the [S*S] table at
    linspace(0, S-1, h) x linspace(0, S-1, w) with bilinear weights.
    Returns (idx [h*w, 4], wts [h*w, 4]) in RASTER order."""
    hi = np.linspace(0, S - 1, h)
    wi = np.linspace(0, S - 1, w)
    hf_, wf_ = np.floor(hi).astype(np.int64), np.floor(wi).astype(np.int64)
    hc = np.clip(hf_ + 1, 0, S - 1)
    wc = np.clip(wf_ + 1, 0, S - 1)
    dh, dw = hi - hf_, wi - wf_
    idx = np.stack(
        [
            (hf_[:, None] * S + wf_[None]).reshape(-1),
            (hf_[:, None] * S + wc[None]).reshape(-1),
            (hc[:, None] * S + wf_[None]).reshape(-1),
            (hc[:, None] * S + wc[None]).reshape(-1),
        ],
        axis=-1,
    )
    wts = np.stack(
        [
            ((1 - dh)[:, None] * (1 - dw)[None]).reshape(-1),
            ((1 - dh)[:, None] * dw[None]).reshape(-1),
            (dh[:, None] * (1 - dw)[None]).reshape(-1),
            (dh[:, None] * dw[None]).reshape(-1),
        ],
        axis=-1,
    )
    return idx, wts.astype(np.float32)


def interleaved_mrope_axes(F: int, sections) -> np.ndarray:
    """axis_of_dim [F]: 0 (t) everywhere, then dims 1, 4, 7, ... up to
    3*sections[1] read h and dims 2, 5, 8, ... up to 3*sections[2] read
    w (HF `apply_interleaved_mrope`)."""
    axes = np.zeros(F, np.int32)
    axes[1 : sections[1] * 3 : 3] = 1
    axes[2 : sections[2] * 3 : 3] = 2
    return axes


class Qwen3VLMixin:
    """Vision tower + deepstack + interleaved mrope, shared by the dense
    and MoE language stacks."""

    _vit_pos_ids = Qwen2VLForConditionalGeneration._vit_pos_ids

    def _init_vl(self, config: ModelConfig):
        hf = config.hf_config
        v = hf["vision_config"]
        if not isinstance(v, dict):
            v = v.to_dict()
        self.vcfg = v
        self.v_embed = v["hidden_size"]
        self.v_depth = v["depth"]
        self.v_heads = v["num_heads"]
        self.v_inter = v["intermediate_size"]
        self.patch = v.get("patch_size", 16)
        self.temporal_patch = v.get("temporal_patch_size", 2)
        self.merge = v.get("spatial_merge_size", 2)
        self.out_hidden = v.get("out_hidden_size", self.hidden_size)
        self.pos_n = v.get("num_position_embeddings", 2304)
        self.ds_indexes = list(v.get("deepstack_visual_indexes", []))
        self.image_token_id = hf.get("image_token_id", 151655)
        self.video_token_id = hf.get("video_token_id", 151656)
        self.vision_start_id = hf.get("vision_start_token_id", 151652)
        rs = hf.get("rope_scaling") or {}
        self.mrope_section = tuple(rs.get("mrope_section", (24, 20, 20)))
        self.mrope_axes = interleaved_mrope_axes(
            self.inv_freq.shape[0], self.mrope_section
        )

    # ------------------------------------------------------------- params

    def _vision_specs(self):
        dt = self.config.dtype
        ve, vi = self.v_embed, self.v_inter
        m2 = self.merge * self.merge
        md = ve * m2
        oh = self.out_hidden

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
            "norm1": norm(ve),
            "norm2": norm(ve),
            "qkv": lin(ve, 3 * ve),
            "proj": lin(ve, ve),
            "fc1": lin(ve, vi),
            "fc2": lin(vi, ve),
        }

        def merger(post):
            return {
                "norm": norm(md if post else ve),
                "fc1": lin(md, md),
                "fc2": lin(md, oh),
            }

        shapes = {
            "patch_embed": jax.ShapeDtypeStruct(
                (ve, 3, self.temporal_patch, self.patch, self.patch), dt
            ),
            "patch_bias": jax.ShapeDtypeStruct((ve,), dt),
            "pos_embed": jax.ShapeDtypeStruct((self.pos_n, ve), dt),
            "blocks": [dict(block) for _ in range(self.v_depth)],
            "merger": merger(post=False),
            "ds_mergers": [merger(post=True) for _ in self.ds_indexes],
        }
        specs = jax.tree_util.tree_map(lambda _: P(), shapes)
        return shapes, specs

    def param_specs(self) -> dict:
        tree = super().param_specs()
        tree["vision"], _ = self._vision_specs()
        return tree

    def param_shardings(self) -> dict:
        tree = super().param_shardings()
        _, tree["vision"] = self._vision_specs()
        return tree

    def weight_rules(self) -> List[WeightRule]:
        rules = list(super().weight_rules())
        vm = "model.visual"
        rules += [
            WeightRule(("vision", "patch_embed"), [f"{vm}.patch_embed.proj.weight"], kind="raw"),
            WeightRule(("vision", "patch_bias"), [f"{vm}.patch_embed.proj.bias"], kind="norm"),
            WeightRule(("vision", "pos_embed"), [f"{vm}.pos_embed.weight"], kind="raw"),
        ]

        def merger_rules(target, hfp):
            return [
                WeightRule(target + ("norm", "w"), [f"{hfp}.norm.weight"], kind="norm"),
                WeightRule(target + ("norm", "b"), [f"{hfp}.norm.bias"], kind="norm"),
                WeightRule(target + ("fc1", "w"), [f"{hfp}.linear_fc1.weight"], kind="linear_raw"),
                WeightRule(target + ("fc1", "b"), [f"{hfp}.linear_fc1.bias"], kind="norm"),
                WeightRule(target + ("fc2", "w"), [f"{hfp}.linear_fc2.weight"], kind="linear_raw"),
                WeightRule(target + ("fc2", "b"), [f"{hfp}.linear_fc2.bias"], kind="norm"),
            ]

        rules += merger_rules(("vision", "merger"), f"{vm}.merger")
        for j in range(len(self.ds_indexes)):
            rules += merger_rules(
                ("vision", "ds_mergers", j), f"{vm}.deepstack_merger_list.{j}"
            )
        for i in range(self.v_depth):
            bp = f"{vm}.blocks.{i}"
            L = ("vision", "blocks", i)
            for ours, theirs in [
                ("norm1", "norm1"), ("norm2", "norm2"),
            ]:
                rules += [
                    WeightRule(L + (ours, "w"), [f"{bp}.{theirs}.weight"], kind="norm"),
                    WeightRule(L + (ours, "b"), [f"{bp}.{theirs}.bias"], kind="norm"),
                ]
            for ours, theirs in [
                ("qkv", "attn.qkv"), ("proj", "attn.proj"),
                ("fc1", "mlp.linear_fc1"), ("fc2", "mlp.linear_fc2"),
            ]:
                rules += [
                    WeightRule(L + (ours, "w"), [f"{bp}.{theirs}.weight"], kind="linear_raw"),
                    WeightRule(L + (ours, "b"), [f"{bp}.{theirs}.bias"], kind="norm"),
                ]
        return rules

    # ------------------------------------------------------------- vision

    def encode_images(self, params, pixel_values, grid_thw):
        """Patchified rows + grid -> [G, (1 + n_deepstack) * H]: the main
        embeddings with the deepstack features concatenated along the
        feature axis (split again inside `forward`)."""
        vp = params["vision"]
        t, h, w = grid_thw
        ve = self.v_embed
        m = self.merge
        x = jnp.dot(
            pixel_values,
            vp["patch_embed"].reshape(ve, -1).T,
            preferred_element_type=jnp.float32,
        ).astype(self.config.dtype) + vp["patch_bias"]
        # bilinear pos embed (raster) -> merge-grouped permute, tile t
        S = int(np.sqrt(self.pos_n))
        idx, wts = bilinear_pos_plan(S, h, w)
        pos = jnp.einsum(
            "nk,nkc->nc",
            jnp.asarray(wts),
            vp["pos_embed"].astype(jnp.float32)[jnp.asarray(idx)],
        )
        mpos = self._vit_pos_ids(1, h, w)  # merge-grouped (h, w) coords
        raster = mpos[:, 0] * w + mpos[:, 1]
        pos = pos[jnp.asarray(raster)]
        x = x + jnp.tile(pos, (t, 1)).astype(x.dtype)
        # 2D rotary (merge-grouped, qwen2-vl convention)
        hd = ve // self.v_heads
        pos2 = self._vit_pos_ids(t, h, w)
        inv = 1.0 / (
            10000.0 ** (np.arange(0, hd // 2, 2, dtype=np.float32) / (hd // 2))
        )
        freqs = np.concatenate(
            [pos2[:, :1] * inv[None], pos2[:, 1:] * inv[None]], axis=-1
        )
        cos = jnp.asarray(np.cos(freqs), jnp.float32)
        sin = jnp.asarray(np.sin(freqs), jnp.float32)
        n = x.shape[0]
        scale = 1.0 / float(np.sqrt(hd))
        m2 = m * m

        def run_merger(mp, y, post):
            if post:
                y = y.reshape(-1, ve * m2)
                y = _ln(y, mp["norm"]["w"], mp["norm"]["b"])
            else:
                y = _ln(y, mp["norm"]["w"], mp["norm"]["b"])
                y = y.reshape(-1, ve * m2)
            y = jax.nn.gelu(
                jnp.dot(y, mp["fc1"]["w"], preferred_element_type=jnp.float32)
                .astype(y.dtype)
                + mp["fc1"]["b"],
                approximate=False,
            )
            return (
                jnp.dot(y, mp["fc2"]["w"], preferred_element_type=jnp.float32)
                .astype(y.dtype)
                + mp["fc2"]["b"]
            )

        deepstack = []
        for i in range(self.v_depth):
            bp = vp["blocks"][i]
            res = x
            y = _ln(x, bp["norm1"]["w"], bp["norm1"]["b"])
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
            att = jax.nn.softmax(att, -1).astype(y.dtype)
            o = jnp.einsum("hqk,khd->qhd", att, v).reshape(n, ve)
            x = res + (
                jnp.dot(o, bp["proj"]["w"], preferred_element_type=jnp.float32)
                .astype(y.dtype)
                + bp["proj"]["b"]
            )
            res = x
            y = _ln(x, bp["norm2"]["w"], bp["norm2"]["b"])
            y = jax.nn.gelu(
                jnp.dot(y, bp["fc1"]["w"], preferred_element_type=jnp.float32)
                .astype(y.dtype)
                + bp["fc1"]["b"],
                approximate=True,
            )
            x = res + (
                jnp.dot(y, bp["fc2"]["w"], preferred_element_type=jnp.float32)
                .astype(y.dtype)
                + bp["fc2"]["b"]
            )
            if i in self.ds_indexes:
                j = self.ds_indexes.index(i)
                deepstack.append(
                    run_merger(vp["ds_mergers"][j], x, post=True)
                )
        main = run_merger(vp["merger"], x, post=False)
        return jnp.concatenate([main] + deepstack, axis=-1)

    # ------------------------------------------------------------- M-RoPE

    def get_rope_index(self, input_ids, grids):
        return Qwen2VLForConditionalGeneration.get_rope_index(
            self, list(input_ids), grids
        )

    def _mrope_cos_sin(self, pos3):
        """Interleaved mrope: frequency dim d reads axis
        `mrope_axes[d]`'s position (static one-hot select)."""
        freqs = (
            pos3[:, :, None].astype(jnp.float32) * self.inv_freq[None, None, :]
        )  # [3, T, F]
        onehot = jnp.asarray(
            np.eye(3, dtype=np.float32)[self.mrope_axes].T
        )  # [3, F]
        f = jnp.einsum("atf,af->tf", freqs, onehot)
        return jnp.cos(f), jnp.sin(f)

    # ------------------------------------------------------------ forward

    def forward(self, params, kv_layers, fb, attn_backend):
        H = self.hidden_size
        ds = None
        if fb.mm_embeds is not None and fb.mm_embeds.shape[1] > H:
            ds = fb.mm_embeds[:, H:]
            fb = dataclasses.replace(fb, mm_embeds=fb.mm_embeds[:, :H])
        if fb.mrope_positions is None and fb.mrope_delta is None and ds is None:
            return super().forward(params, kv_layers, fb, attn_backend)
        if fb.mrope_positions is not None:
            pos3 = fb.mrope_positions
        else:
            p = fb.positions + (
                fb.mrope_delta if fb.mrope_delta is not None else 0
            )
            pos3 = jnp.stack([p, p, p])
        cos, sin = self._mrope_cos_sin(pos3)
        h = self.embed_tokens(params, fb)
        n_ds = 0 if ds is None else ds.shape[1] // H
        new_kv = []
        for i in range(self.num_layers):
            h, kv_i = self.decoder_layer(
                params["layers"][i], h, kv_layers[i], fb, attn_backend,
                rope_override=(cos, sin),
            )
            new_kv.append(kv_i)
            if ds is not None and i < n_ds:
                # deepstack: add level-i visual features at the visual rows
                valid = fb.mm_rows >= 0
                rows = jnp.clip(fb.mm_rows, 0, h.shape[0] - 1)
                add = jnp.where(
                    valid[:, None],
                    ds[:, i * H : (i + 1) * H].astype(h.dtype),
                    0.0,
                )
                h = h.at[rows].add(add)
        h = rms_norm(h, params["final_norm"], self.config.rms_norm_eps)
        return h, new_kv


class Qwen3VLForConditionalGeneration(Qwen3VLMixin, Qwen3ForCausalLM):
    architectures = ["Qwen3VLForConditionalGeneration"]
    model_types = ["qwen3_vl"]
    supports_chain_tail = False
    hf_prefix = "model.language_model"

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self._init_vl(config)


class Qwen3VLMoeForConditionalGeneration(Qwen3VLMixin, Qwen3MoeForCausalLM):
    architectures = ["Qwen3VLMoeForConditionalGeneration"]
    model_types = ["qwen3_vl_moe"]
    supports_chain_tail = False
    hf_prefix = "model.language_model"

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self._init_vl(config)

    def mlp_weight_rules(self, lp: str, L: tuple) -> List[WeightRule]:
        # Qwen3-VL-MoE ships FUSED expert tensors already in our layout:
        # experts.gate_up_proj [E, H, 2M] (gate first), down_proj [E, M, H]
        return [
            WeightRule(L + ("router",), [f"{lp}.mlp.gate.weight"], kind="router"),
            WeightRule(L + ("w1",), [f"{lp}.mlp.experts.gate_up_proj"], kind="raw"),
            WeightRule(L + ("w2",), [f"{lp}.mlp.experts.down_proj"], kind="raw"),
        ]
