"""Qwen2-VL (vision transformer + M-RoPE language model).

Parity with reference `srt/models/qwen2_vl.py` (+ mrope support in
`layers/rotary_embedding.py` and the mm processor): the ViT consumes
pre-patchified pixel rows (the HF processor layout: one row per
(temporal, 14x14) patch), applies 2D rotary within windows, and a 2x2
PatchMerger projects into the language hidden size. The language stack
is Qwen2 (llama + qkv bias) with multimodal rotary: the rope dims split
into (temporal, height, width) sections, text tokens advance all three
axes together, image tokens carry their grid coordinates
(`get_rope_index` ported below; validated against the HF implementation
in tests).

Serving shape: the vision encoder runs ONCE at admission (engine-level
jit, like llava); the language step receives image embeddings through
the same (mm_embeds, mm_rows) scatter and 3D rope positions through
`fb.mrope_positions` on extend / a per-request `fb.mrope_delta` on
decode (text continuation advances all axes equally, so decode needs
only the scalar offset — reference mrope_position_delta).
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.norms import rms_norm
from sglang_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM


def _layer_norm(x, w, b, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w + b


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def mrope_cos_sin(
    pos3: jax.Array,  # [3, T] i32 (t, h, w) positions
    inv_freq: jax.Array,  # [hd/2]
    sections: Tuple[int, ...],  # split of hd/2 among (t, h, w)
):
    """cos/sin [T, hd/2] where each rope-dim section reads its axis."""
    freqs = pos3[:, :, None].astype(jnp.float32) * inv_freq[None, None, :]
    parts_c, parts_s = [], []
    off = 0
    for axis, sec in enumerate(sections):
        parts_c.append(jnp.cos(freqs[axis, :, off : off + sec]))
        parts_s.append(jnp.sin(freqs[axis, :, off : off + sec]))
        off += sec
    return jnp.concatenate(parts_c, -1), jnp.concatenate(parts_s, -1)


def apply_mrope(x, cos, sin):
    """[T, H, hd] with half-split rotation (llama convention)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    c = cos[:, None, :]
    s = sin[:, None, :]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1).astype(x.dtype)


class Qwen2VLForConditionalGeneration(LlamaForCausalLM):
    architectures = ["Qwen2VLForConditionalGeneration"]
    model_types = ["qwen2_vl"]
    qkv_bias = True

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        super().__init__(config)
        v = hf["vision_config"]
        if not isinstance(v, dict):
            v = v.to_dict()
        self.vcfg = v
        self.v_embed = v["embed_dim"]
        self.v_depth = v["depth"]
        self.v_heads = v["num_heads"]
        self.v_mlp = int(v["embed_dim"] * v.get("mlp_ratio", 4))
        self.patch = v.get("patch_size", 14)
        self.temporal_patch = v.get("temporal_patch_size", 2)
        self.merge = v.get("spatial_merge_size", 2)
        self.image_token_id = hf.get("image_token_id", 151655)
        # video spans reuse the image pipeline: same ViT (temporal patches
        # tile the grid's t axis), same rope-index math (reference
        # get_rope_index handles both token kinds)
        self.video_token_id = hf.get("video_token_id", 151656)
        self.vision_start_id = hf.get("vision_start_token_id", 151652)
        rs = hf.get("rope_scaling") or {}
        self.mrope_section = tuple(rs.get("mrope_section", []))

    # ------------------------------------------------------------- specs

    def _vision_specs(self):
        dt = self.config.dtype
        ve, vm = self.v_embed, self.v_mlp
        h = self.hidden_size
        pdim = 3 * self.temporal_patch * self.patch * self.patch

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
            "fc1": lin(ve, vm),
            "fc2": lin(vm, ve),
        }
        del pdim  # HF conv layout kept raw; flattened to a matmul at use
        md = ve * self.merge * self.merge
        shapes = {
            "patch_embed": jax.ShapeDtypeStruct(
                (ve, 3, self.temporal_patch, self.patch, self.patch), dt
            ),
            "blocks": [dict(block) for _ in range(self.v_depth)],
            "merger_ln": norm(ve),
            "merger_fc1": lin(md, md),
            "merger_fc2": lin(md, h),
        }
        specs = jax.tree_util.tree_map(lambda _: P(), shapes)
        return shapes, specs

    def param_specs(self) -> dict:
        tree = super().param_specs()
        vshapes, _ = self._vision_specs()
        tree["vision"] = vshapes
        return tree

    def param_shardings(self) -> dict:
        tree = super().param_shardings()
        _, vspecs = self._vision_specs()
        tree["vision"] = vspecs
        return tree

    # hub layout: language tensors at model.*, vision at visual.*
    def weight_rules(self) -> List[WeightRule]:
        rules = list(super().weight_rules())
        vm = "visual"
        rules.append(
            WeightRule(("vision", "patch_embed"), [f"{vm}.patch_embed.proj.weight"], kind="raw")
        )
        for i in range(self.v_depth):
            bp = f"{vm}.blocks.{i}"
            L = ("vision", "blocks", i)
            for ours, theirs, is_lin in [
                ("norm1", "norm1", False),
                ("norm2", "norm2", False),
                ("qkv", "attn.qkv", True),
                ("proj", "attn.proj", True),
                ("fc1", "mlp.fc1", True),
                ("fc2", "mlp.fc2", True),
            ]:
                kind = "linear_raw" if is_lin else "norm"
                rules += [
                    WeightRule(L + (ours, "w"), [f"{bp}.{theirs}.weight"], kind=kind),
                    WeightRule(L + (ours, "b"), [f"{bp}.{theirs}.bias"], kind="norm"),
                ]
        rules += [
            WeightRule(("vision", "merger_ln", "w"), [f"{vm}.merger.ln_q.weight"], kind="norm"),
            WeightRule(("vision", "merger_ln", "b"), [f"{vm}.merger.ln_q.bias"], kind="norm"),
            WeightRule(("vision", "merger_fc1", "w"), [f"{vm}.merger.mlp.0.weight"], kind="linear_raw"),
            WeightRule(("vision", "merger_fc1", "b"), [f"{vm}.merger.mlp.0.bias"], kind="norm"),
            WeightRule(("vision", "merger_fc2", "w"), [f"{vm}.merger.mlp.2.weight"], kind="linear_raw"),
            WeightRule(("vision", "merger_fc2", "b"), [f"{vm}.merger.mlp.2.bias"], kind="norm"),
        ]
        return rules

    # ------------------------------------------------------------- vision

    def _vit_pos_ids(self, t: int, h: int, w: int) -> np.ndarray:
        """(h, w) coords per patch row in the processor's merge-grouped
        order (HF rot_pos_emb)."""
        m = self.merge
        hpos = np.arange(h).reshape(h // m, m, 1)
        hpos = np.broadcast_to(hpos, (h // m, m, w)).reshape(
            h // m, m, w // m, m
        )
        hpos = hpos.transpose(0, 2, 1, 3).reshape(-1)
        wpos = np.arange(w).reshape(1, w // m, m)
        wpos = np.broadcast_to(wpos, (h, w // m, m)).reshape(
            h // m, m, w // m, m
        )
        wpos = wpos.transpose(0, 2, 1, 3).reshape(-1)
        return np.tile(np.stack([hpos, wpos], -1), (t, 1))

    def encode_images(self, params, pixel_values, grid_thw):
        """pixel rows [N, 3*tp*p*p] + grid (t, h, w) -> [N/merge^2, H]
        language-space embeddings. Single-grid (one image) per call."""
        vp = params["vision"]
        t, h, w = grid_thw
        x = jnp.dot(
            pixel_values,
            vp["patch_embed"].reshape(self.v_embed, -1).T,
            preferred_element_type=jnp.float32,
        ).astype(self.config.dtype)
        # 2D rotary over (h, w): head_dim/2 split half-half
        hd = self.v_embed // self.v_heads
        pos = self._vit_pos_ids(t, h, w)  # [N, 2]
        inv = 1.0 / (
            10000.0 ** (np.arange(0, hd // 2, 2, dtype=np.float32) / (hd // 2))
        )
        freqs = np.concatenate(
            [pos[:, :1] * inv[None], pos[:, 1:] * inv[None]], axis=-1
        )  # [N, hd/2]
        cos = jnp.asarray(np.cos(freqs), dtype=jnp.float32)
        sin = jnp.asarray(np.sin(freqs), dtype=jnp.float32)

        def rot(q):  # [N, heads, hd]
            return apply_mrope(q, cos, sin)

        n = x.shape[0]
        scale = 1.0 / math.sqrt(hd)
        for i in range(self.v_depth):
            bp = vp["blocks"][i]
            res = x
            y = _layer_norm(x, bp["norm1"]["w"], bp["norm1"]["b"])
            qkv = (
                jnp.dot(y, bp["qkv"]["w"], preferred_element_type=jnp.float32)
                .astype(y.dtype)
                + bp["qkv"]["b"]
            ).reshape(n, 3, self.v_heads, hd)
            q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
            q, k = rot(q), rot(k)
            att = jnp.einsum("qhd,khd->hqk", q, k) * scale
            att = jax.nn.softmax(att.astype(jnp.float32), -1).astype(y.dtype)
            o = jnp.einsum("hqk,khd->qhd", att, v).reshape(n, self.v_embed)
            x = res + (
                jnp.dot(o, bp["proj"]["w"], preferred_element_type=jnp.float32)
                .astype(y.dtype)
                + bp["proj"]["b"]
            )
            res = x
            y = _layer_norm(x, bp["norm2"]["w"], bp["norm2"]["b"])
            y = _quick_gelu(
                jnp.dot(y, bp["fc1"]["w"], preferred_element_type=jnp.float32)
                .astype(y.dtype)
                + bp["fc1"]["b"]
            )
            x = res + (
                jnp.dot(y, bp["fc2"]["w"], preferred_element_type=jnp.float32)
                .astype(y.dtype)
                + bp["fc2"]["b"]
            )
        # PatchMerger: LN then 2x2 window concat -> MLP -> hidden
        x = _layer_norm(x, vp["merger_ln"]["w"], vp["merger_ln"]["b"])
        md = self.v_embed * self.merge * self.merge
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
        return x  # [N / merge^2, H]

    # ----------------------------------------------------------- M-RoPE

    def get_rope_index(
        self, input_ids: List[int], grids: List[Tuple[int, int, int]]
    ) -> Tuple[np.ndarray, int]:
        """(positions [3, T], mrope_delta) — port of the reference
        `get_rope_index` for text+image sequences (validated against HF in
        tests). Image spans carry (t, h, w) grid coordinates offset by the
        running text position; text resumes at max(prev)+1."""
        T = len(input_ids)
        pos = np.zeros((3, T), dtype=np.int64)
        m = self.merge
        img_iter = iter(grids)
        st = 0
        i = 0
        while i < T:
            if input_ids[i] in (self.image_token_id, self.video_token_id):
                t, h, w = next(img_iter)
                lh, lw = h // m, w // m
                n = t * lh * lw
                tt = np.repeat(np.arange(t), lh * lw)
                hh = np.tile(np.repeat(np.arange(lh), lw), t)
                ww = np.tile(np.arange(lw), t * lh)
                pos[0, i : i + n] = st + tt
                pos[1, i : i + n] = st + hh
                pos[2, i : i + n] = st + ww
                st = st + max(t, lh, lw)
                i += n
            else:
                pos[:, i] = st
                st += 1
                i += 1
        delta = int(st - T)
        return pos, delta

    # ------------------------------------------------------------ forward

    def forward(
        self,
        params: dict,
        kv_layers: List[jax.Array],
        fb: ForwardBatch,
        attn_backend,
    ):
        if fb.mrope_positions is None and fb.mrope_delta is None:
            return super().forward(params, kv_layers, fb, attn_backend)
        # multimodal rotary: build per-token cos/sin once, thread through
        # the shared decoder layers via a rope override
        if fb.mrope_positions is not None:
            pos3 = fb.mrope_positions
        else:  # decode: all axes advance together from the per-seq delta
            p = fb.positions + fb.mrope_delta
            pos3 = jnp.stack([p, p, p])
        cos, sin = mrope_cos_sin(pos3, self.inv_freq, self.mrope_section)
        h = self.embed_tokens(params, fb)
        new_kv = []
        for i in range(self.num_layers):
            h, kv_i = self.decoder_layer(
                params["layers"][i],
                h,
                kv_layers[i],
                fb,
                attn_backend,
                rope_override=(cos, sin),
            )
            new_kv.append(kv_i)
        h = rms_norm(h, params["final_norm"], self.config.rms_norm_eps)
        return h, new_kv
