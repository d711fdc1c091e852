"""GLM-4V / GLM-4.1V (vision + GLM-4 language model).

Parity with reference `srt/models/glm4v.py` and HF `modeling_glm4v`:
- language side = GLM-4 (sandwich norms, qkv bias, partial interleaved
  rotary) with MULTIMODAL rotary: the partial-rotary frequency dims are
  split into (t, h, w) sections (`mrope_section`), each frequency reads
  its axis's position, and the rotation is applied in GLM's interleaved
  pairing;
- vision tower = Qwen2-VL-shaped ViT with RMSNorm blocks, conv3d patch
  embed (with bias), ADAPTIVE position embeddings (the learned table is
  bicubically resampled onto each image's patch grid — torch
  `grid_sample(mode="bicubic", align_corners=False, padding_mode=
  "border")`, ported to numpy host-side since the grid is static per
  call), 2D rotary inside blocks, full (non-windowed) attention, then
  post-layernorm -> spatial-merge conv downsample -> SwiGLU merger.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.glm4 import Glm4ForCausalLM
from sglang_tpu.models.qwen2_vl import apply_mrope


def _rms(x, w, eps=1e-5):
    xf = x.astype(jnp.float32)
    out = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (out * w.astype(jnp.float32)).astype(x.dtype)


def _cubic_kernel(x, a=-0.75):
    """Keys cubic convolution kernel (torch bicubic, a=-0.75)."""
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    w = np.where(
        ax <= 1,
        (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0),
    )
    return w


def bicubic_resize_plan(src_h: int, src_w: int, dst_h: int, dst_w: int):
    """Static gather plan reproducing torch bicubic resampling at
    half-pixel centers with border clamping — both `F.grid_sample(
    mode="bicubic", align_corners=False, padding_mode="border")` on a
    half-pixel grid (GLM-4V) and `F.interpolate(mode="bicubic")` with
    align_corners=False (Kimi-VL MoonViT) reduce to the same source
    coordinates x_src = (x_dst + 0.5) * src/dst - 0.5. Returns (idx
    [N, 16] into the flat [src_h*src_w] table, wts [N, 16] f32) so the
    resample is a traceable weighted gather; identity when sizes match."""
    hh, ww = np.meshgrid(np.arange(dst_h), np.arange(dst_w), indexing="ij")
    xs = (ww.reshape(-1) + 0.5) * src_w / dst_w - 0.5
    ys = (hh.reshape(-1) + 0.5) * src_h / dst_h - 0.5
    x0 = np.floor(xs).astype(np.int64)
    y0 = np.floor(ys).astype(np.int64)
    idx_parts, wt_parts = [], []
    for dy in range(-1, 3):
        wy = _cubic_kernel(ys - (y0 + dy))
        yy = np.clip(y0 + dy, 0, src_h - 1)
        for dx in range(-1, 3):
            wx = _cubic_kernel(xs - (x0 + dx))
            xx = np.clip(x0 + dx, 0, src_w - 1)
            idx_parts.append(yy * src_w + xx)
            wt_parts.append(wx * wy)
    idx = np.stack(idx_parts, -1)
    wts = np.stack(wt_parts, -1)
    # torch's bicubic weights sum to 1 exactly; normalize as a guard
    wts = wts / np.maximum(wts.sum(-1, keepdims=True), 1e-12)
    return idx, wts.astype(np.float32)


def bicubic_resample_plan(S: int, grid_h: int, grid_w: int):
    """GLM-4V form: square [S, S, C] table -> (grid_h, grid_w)."""
    return bicubic_resize_plan(S, S, grid_h, grid_w)


def adapt_pos_embed(table: np.ndarray, grid_h: int, grid_w: int):
    """Numpy reference of the resample (used by tests)."""
    S = int(math.isqrt(table.shape[0]))
    idx, wts = bicubic_resample_plan(S, grid_h, grid_w)
    return (table.astype(np.float64)[idx] * wts[..., None]).sum(1).astype(
        np.float32
    )


def glm4v_mrope_cos_sin(pos3, inv_freq, sections):
    """cos/sin [T, F] with each frequency dim reading its (t, h, w)
    axis (HF `Glm4vTextRotaryEmbedding` + section split)."""
    freqs = pos3[:, :, None].astype(jnp.float32) * inv_freq[None, None, :]
    parts_c, parts_s = [], []
    off = 0
    for i, sec in enumerate(sections):
        parts_c.append(jnp.cos(freqs[i % 3, :, off : off + sec]))
        parts_s.append(jnp.sin(freqs[i % 3, :, off : off + sec]))
        off += sec
    return jnp.concatenate(parts_c, -1), jnp.concatenate(parts_s, -1)


def apply_interleaved_cos_sin(x, cos, sin):
    """Interleaved (pair) rotation of the first 2*F dims of x by
    precomputed cos/sin [T, F]; tail passthrough (GLM partial rotary)."""
    t, h, d = x.shape
    rot = cos.shape[-1] * 2
    xr = x[..., :rot].astype(jnp.float32).reshape(t, h, rot // 2, 2)
    even, odd = xr[..., 0], xr[..., 1]
    c = cos[:, None, :]
    s = sin[:, None, :]
    out = jnp.stack([even * c - odd * s, even * s + odd * c], axis=-1)
    out = out.reshape(t, h, rot).astype(x.dtype)
    return jnp.concatenate([out, x[..., rot:]], axis=-1)


class Glm4vForConditionalGeneration(Glm4ForCausalLM):
    architectures = ["Glm4vForConditionalGeneration"]
    model_types = ["glm4v"]
    supports_chain_tail = False
    hf_prefix = "model.language_model"

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        v = hf["vision_config"]
        if not isinstance(v, dict):
            v = v.to_dict()
        self.vcfg = v
        self.v_embed = v["hidden_size"]
        self.v_depth = v["depth"]
        self.v_heads = v["num_heads"]
        self.v_inter = v["intermediate_size"]
        self.patch = v.get("patch_size", 14)
        self.temporal_patch = v.get("temporal_patch_size", 1)
        self.merge = v.get("spatial_merge_size", 2)
        self.out_hidden = v.get("out_hidden_size", self.hidden_size)
        self.v_eps = v.get("rms_norm_eps", 1e-5)
        self.v_image_size = v.get("image_size", 336)
        self.v_attn_bias = bool(v.get("attention_bias", False))
        self.image_token_id = hf.get("image_token_id", 151343)
        self.video_token_id = hf.get("video_token_id", 151344)
        self.vision_start_id = hf.get("image_start_token_id", 151339)
        rs = (hf.get("rope_scaling") or {})
        self.mrope_section = tuple(rs.get("mrope_section", []))

    # ------------------------------------------------------------- specs

    def _vision_specs(self):
        dt = self.config.dtype
        ve, vi = self.v_embed, self.v_inter

        def lin(i, o, bias=False):
            d = {"w": jax.ShapeDtypeStruct((i, o), dt)}
            if bias:
                d["b"] = jax.ShapeDtypeStruct((o,), dt)
            return d

        def rnorm(n):
            return {"w": jax.ShapeDtypeStruct((n,), dt)}

        # NB: the vision BLOCK MLP widens to out_hidden_size (HF
        # Glm4VisionMlp uses out_hidden_size as its intermediate); the
        # MERGER's SwiGLU uses intermediate_size as its context dim
        oh0 = self.out_hidden
        block = {
            "norm1": rnorm(ve),
            "norm2": rnorm(ve),
            "qkv": lin(ve, 3 * ve, bias=self.v_attn_bias),
            "proj": lin(ve, ve),
            "gate": lin(ve, oh0),
            "up": lin(ve, oh0),
            "down": lin(oh0, ve),
        }
        grid = self.v_image_size // self.patch
        oh = self.out_hidden
        shapes = {
            "patch_embed": jax.ShapeDtypeStruct(
                (ve, 3, self.temporal_patch, self.patch, self.patch), dt
            ),
            "patch_bias": jax.ShapeDtypeStruct((ve,), dt),
            "pos_embed": jax.ShapeDtypeStruct((grid * grid, ve), dt),
            "post_conv_norm": rnorm(ve),
            "blocks": [dict(block) for _ in range(self.v_depth)],
            "post_norm": rnorm(ve),
            "downsample": jax.ShapeDtypeStruct(
                (oh, ve, self.merge, self.merge), dt
            ),
            "downsample_bias": jax.ShapeDtypeStruct((oh,), dt),
            "merger_proj": lin(oh, oh),
            "merger_ln": {
                "w": jax.ShapeDtypeStruct((oh,), dt),
                "b": jax.ShapeDtypeStruct((oh,), dt),
            },
            "merger_gate": lin(oh, vi),
            "merger_up": lin(oh, vi),
            "merger_down": lin(vi, oh),
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
            WeightRule(("vision", "pos_embed"), [f"{vm}.embeddings.position_embedding.weight"], kind="raw"),
            WeightRule(("vision", "post_conv_norm", "w"), [f"{vm}.post_conv_layernorm.weight"], kind="norm"),
            WeightRule(("vision", "post_norm", "w"), [f"{vm}.post_layernorm.weight"], kind="norm"),
            WeightRule(("vision", "downsample"), [f"{vm}.downsample.weight"], kind="raw"),
            WeightRule(("vision", "downsample_bias"), [f"{vm}.downsample.bias"], kind="norm"),
            WeightRule(("vision", "merger_proj", "w"), [f"{vm}.merger.proj.weight"], kind="linear_raw"),
            WeightRule(("vision", "merger_ln", "w"), [f"{vm}.merger.post_projection_norm.weight"], kind="norm"),
            WeightRule(("vision", "merger_ln", "b"), [f"{vm}.merger.post_projection_norm.bias"], kind="norm"),
            WeightRule(("vision", "merger_gate", "w"), [f"{vm}.merger.gate_proj.weight"], kind="linear_raw"),
            WeightRule(("vision", "merger_up", "w"), [f"{vm}.merger.up_proj.weight"], kind="linear_raw"),
            WeightRule(("vision", "merger_down", "w"), [f"{vm}.merger.down_proj.weight"], kind="linear_raw"),
        ]
        for i in range(self.v_depth):
            bp = f"{vm}.blocks.{i}"
            L = ("vision", "blocks", i)
            rules += [
                WeightRule(L + ("norm1", "w"), [f"{bp}.norm1.weight"], kind="norm"),
                WeightRule(L + ("norm2", "w"), [f"{bp}.norm2.weight"], kind="norm"),
                WeightRule(L + ("qkv", "w"), [f"{bp}.attn.qkv.weight"], kind="linear_raw"),
                WeightRule(L + ("proj", "w"), [f"{bp}.attn.proj.weight"], kind="linear_raw"),
                WeightRule(L + ("gate", "w"), [f"{bp}.mlp.gate_proj.weight"], kind="linear_raw"),
                WeightRule(L + ("up", "w"), [f"{bp}.mlp.up_proj.weight"], kind="linear_raw"),
                WeightRule(L + ("down", "w"), [f"{bp}.mlp.down_proj.weight"], kind="linear_raw"),
            ]
            if self.v_attn_bias:
                rules.append(
                    WeightRule(L + ("qkv", "b"), [f"{bp}.attn.qkv.bias"], kind="norm")
                )
        return rules

    # ------------------------------------------------------------- vision

    def _vit_pos_ids(self, t: int, h: int, w: int) -> np.ndarray:
        """Merge-grouped (h, w) coords (same layout as Qwen2-VL)."""
        m = self.merge
        hpos = np.arange(h).reshape(h // m, m, 1)
        hpos = np.broadcast_to(hpos, (h // m, m, w)).reshape(h // m, m, w // m, m)
        hpos = hpos.transpose(0, 2, 1, 3).reshape(-1)
        wpos = np.arange(w).reshape(1, w // m, m)
        wpos = np.broadcast_to(wpos, (h, w // m, m)).reshape(h // m, m, w // m, m)
        wpos = wpos.transpose(0, 2, 1, 3).reshape(-1)
        return np.tile(np.stack([hpos, wpos], -1), (t, 1))

    def encode_images(self, params, pixel_values, grid_thw):
        vp = params["vision"]
        t, h, w = grid_thw
        x = jnp.dot(
            pixel_values,
            vp["patch_embed"].reshape(self.v_embed, -1).T,
            preferred_element_type=jnp.float32,
        ).astype(self.config.dtype) + vp["patch_bias"]
        x = _rms(x, vp["post_conv_norm"]["w"], self.v_eps)
        # adaptive position embedding: the learned table bicubically
        # resampled onto this grid. The gather plan is static (grid is a
        # jit constant) so the resample is a traceable weighted gather;
        # rows are read directly in the merge-grouped patch order.
        S = self.v_image_size // self.patch
        idx, wts = bicubic_resample_plan(S, h, w)
        pos = self._vit_pos_ids(t, h, w)
        raster = pos[:, 0] * w + pos[:, 1]
        gathered = vp["pos_embed"].astype(jnp.float32)[jnp.asarray(idx[raster])]
        adapted = jnp.einsum(
            "nk,nkc->nc", jnp.asarray(wts[raster]), gathered
        )
        x = x + adapted.astype(x.dtype)
        hd = self.v_embed // self.v_heads
        inv = 1.0 / (
            10000.0 ** (np.arange(0, hd // 2, 2, dtype=np.float32) / (hd // 2))
        )
        freqs = np.concatenate(
            [pos[:, :1] * inv[None], pos[:, 1:] * inv[None]], axis=-1
        )
        cos = jnp.asarray(np.cos(freqs), dtype=jnp.float32)
        sin = jnp.asarray(np.sin(freqs), dtype=jnp.float32)
        n = x.shape[0]
        scale = 1.0 / math.sqrt(hd)
        for i in range(self.v_depth):
            bp = vp["blocks"][i]
            res = x
            y = _rms(x, bp["norm1"]["w"], self.v_eps)
            qkv = jnp.dot(
                y, bp["qkv"]["w"], preferred_element_type=jnp.float32
            ).astype(y.dtype)
            if "b" in bp["qkv"]:
                qkv = qkv + bp["qkv"]["b"]
            qkv = qkv.reshape(n, 3, self.v_heads, hd)
            q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
            q, k = apply_mrope(q, cos, sin), apply_mrope(k, cos, sin)
            att = jnp.einsum(
                "qhd,khd->hqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            att = jax.nn.softmax(att, -1).astype(y.dtype)
            o = jnp.einsum("hqk,khd->qhd", att, v).reshape(n, self.v_embed)
            x = res + jnp.dot(
                o, bp["proj"]["w"], preferred_element_type=jnp.float32
            ).astype(y.dtype)
            res = x
            y = _rms(x, bp["norm2"]["w"], self.v_eps)
            g = jnp.dot(y, bp["gate"]["w"], preferred_element_type=jnp.float32).astype(y.dtype)
            u = jnp.dot(y, bp["up"]["w"], preferred_element_type=jnp.float32).astype(y.dtype)
            y = jax.nn.silu(g) * u
            x = res + jnp.dot(
                y, bp["down"]["w"], preferred_element_type=jnp.float32
            ).astype(y.dtype)
        x = _rms(x, vp["post_norm"]["w"], self.v_eps)
        # spatial-merge conv downsample: rows are merge-grouped, so each
        # consecutive m*m rows form one output position
        m = self.merge
        xg = x.reshape(-1, m, m, self.v_embed)  # [G, m, m, ve]
        wconv = vp["downsample"]  # [oh, ve, m, m]
        wmat = jnp.transpose(wconv, (1, 2, 3, 0)).reshape(-1, self.out_hidden)
        xflat = jnp.transpose(xg, (0, 3, 1, 2)).reshape(-1, self.v_embed * m * m)
        x = jnp.dot(
            xflat, wmat, preferred_element_type=jnp.float32
        ).astype(x.dtype) + vp["downsample_bias"]
        # merger: proj -> LayerNorm -> GELU -> SwiGLU
        x = jnp.dot(x, vp["merger_proj"]["w"], preferred_element_type=jnp.float32).astype(x.dtype)
        mu = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
        var = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
        ln = (
            (x.astype(jnp.float32) - mu) / jnp.sqrt(var + 1e-5)
        ) * vp["merger_ln"]["w"] + vp["merger_ln"]["b"]
        y = jax.nn.gelu(ln, approximate=False).astype(x.dtype)
        g = jnp.dot(y, vp["merger_gate"]["w"], preferred_element_type=jnp.float32).astype(x.dtype)
        u = jnp.dot(y, vp["merger_up"]["w"], preferred_element_type=jnp.float32).astype(x.dtype)
        act = self.vcfg.get("hidden_act", "silu")
        a = jax.nn.silu(g) if act == "silu" else jax.nn.gelu(g, approximate=(act == "gelu_pytorch_tanh"))
        y = a * u
        return jnp.dot(
            y, vp["merger_down"]["w"], preferred_element_type=jnp.float32
        ).astype(x.dtype)

    # ------------------------------------------------------------- M-RoPE

    def get_rope_index(self, input_ids, grids) -> Tuple[np.ndarray, int]:
        """Image-case mrope positions (same vision-span math as Qwen2-VL:
        text advances all axes together, image tokens carry their grid
        coordinates)."""
        from sglang_tpu.models.qwen2_vl import Qwen2VLForConditionalGeneration

        return Qwen2VLForConditionalGeneration.get_rope_index(
            self, list(input_ids), grids
        )

    # ------------------------------------------------------------ forward

    def forward(self, params, kv_layers, fb, attn_backend):
        from sglang_tpu.layers.norms import rms_norm

        if fb.mrope_positions is None and fb.mrope_delta is None:
            return super().forward(params, kv_layers, fb, attn_backend)
        if fb.mrope_positions is not None:
            pos3 = fb.mrope_positions
        else:
            p = fb.positions + fb.mrope_delta
            pos3 = jnp.stack([p, p, p])
        cos, sin = glm4v_mrope_cos_sin(pos3, self.inv_freq, self.mrope_section)
        c = self.config
        t = fb.input_ids.shape[0]
        h = self.embed_tokens(params, fb)
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            normed = rms_norm(h, lp["input_norm"], c.rms_norm_eps)
            qkv = self.methods["qkv"].apply(lp["qkv"], normed)
            q = qkv[:, : self.q_size].reshape(t, self.num_q_heads, self.head_dim)
            k = qkv[:, self.q_size : self.q_size + self.kv_size].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            v = qkv[:, self.q_size + self.kv_size :].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            q = apply_interleaved_cos_sin(q, cos, sin)
            k = apply_interleaved_cos_sin(k, cos, sin)
            attn_out, kv_i = attn_backend(
                q, k, v, kv_layers[i], fb, self.sm_scale
            )
            new_kv.append(kv_i)
            attn_out = self.methods["o"].apply(
                lp["o"], attn_out.reshape(t, self.q_size)
            )
            h = h + rms_norm(attn_out, lp["post_self_attn_norm"], c.rms_norm_eps)
            normed = rms_norm(h, lp["post_norm"], c.rms_norm_eps)
            mlp_out = self.mlp_forward(lp, normed)
            h = h + rms_norm(mlp_out, lp["post_mlp_norm"], c.rms_norm_eps)
        h = rms_norm(h, params["final_norm"], c.rms_norm_eps)
        return h, new_kv
