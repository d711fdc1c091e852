"""Idefics3 / SmolVLM vision-language models (SigLIP tower + pixel
shuffle connector + Llama text).

Parity with reference `srt/models/idefics3.py`-class support and HF
`modeling_idefics3` / `modeling_smolvlm`: SigLIP-style encoder (no CLS,
patch bias, final post-layernorm), pixel-shuffle by `scale_factor`
(token count /sf^2, channels *sf^2), a single bias-free
`modality_projection` linear into the language space, Llama text stack.
Image tiling (the 364-px sub-image grid) is client/processor-side; the
engine receives pre-tiled `[N, 3, S, S]` pixel batches.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.vision import (
    ViTSpec,
    pixel_shuffle,
    vit_encode,
    vit_shapes,
    vit_specs_tree,
    vit_weight_rules,
)
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM


class Idefics3ForConditionalGeneration:
    architectures = ["Idefics3ForConditionalGeneration"]

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        v = hf["vision_config"]
        if not isinstance(v, dict):
            v = v.to_dict()
        g = ViTSpec.from_hf(v).grid
        # full-grid position ids under HF's bucketized embedding: axis
        # coordinate i lands in bucket max(i-1, 0) (float-boundary
        # artifact the checkpoints trained with — see layers/vision.py)
        bucket = [max(i - 1, 0) for i in range(g)]
        pos_ids = tuple(bucket[y] * g + bucket[x] for y in range(g) for x in range(g))
        self.vspec = ViTSpec.from_hf(
            v,
            act=v.get("hidden_act", "gelu_pytorch_tanh"),
            cls_token=False,
            patch_bias=True,
            post_ln=True,
            pos_ids=pos_ids,
        )
        self.scale_factor = int(hf.get("scale_factor", 2))
        self.image_token_id = hf.get("image_token_id", 128257)
        self.lm = LlamaForCausalLM(dataclasses.replace(config))
        self.num_layers = self.lm.num_layers
        self.methods = self.lm.methods
        self.proj_in = self.vspec.hidden * self.scale_factor**2

    def param_specs(self) -> dict:
        dt = self.config.dtype
        tree = self.lm.param_specs()
        tree["vision"] = vit_shapes(self.vspec, dt)
        tree["projector"] = {
            "w": jax.ShapeDtypeStruct(
                (self.proj_in, self.config.hidden_size), dt
            )
        }
        return tree

    def param_shardings(self) -> dict:
        tree = self.lm.param_shardings()
        tree["vision"] = vit_specs_tree(vit_shapes(self.vspec, self.config.dtype))
        tree["projector"] = {"w": P(None, None)}
        return tree

    def weight_rules(self) -> List[WeightRule]:
        self.lm.hf_prefix = "model.text_model"
        rules = list(self.lm.weight_rules())
        rules += vit_weight_rules(self.vspec, "model.vision_model")
        rules.append(
            WeightRule(
                ("projector", "w"),
                ["model.connector.modality_projection.proj.weight"],
                kind="linear_raw",
            )
        )
        return rules

    def get_method(self, key: str):
        return self.lm.get_method(key)

    def encode_images(self, params: dict, pixel_values: jax.Array) -> jax.Array:
        """[N, 3, S, S] -> [N * (grid/sf)^2, H]."""
        h = vit_encode(self.vspec, params["vision"], pixel_values)
        n = h.shape[0]
        g = self.vspec.grid
        h = h.reshape(n, g, g, self.vspec.hidden)
        h = pixel_shuffle(h, 1.0 / self.scale_factor)
        h = h.reshape(n, -1, self.proj_in)
        y = jnp.dot(
            h, params["projector"]["w"], preferred_element_type=jnp.float32
        ).astype(h.dtype)
        return y.reshape(-1, y.shape[-1])

    def forward(self, params, kv_layers, fb, attn_backend):
        return self.lm.forward(params, kv_layers, fb, attn_backend)

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params, hidden)


class SmolVLMForConditionalGeneration(Idefics3ForConditionalGeneration):
    architectures = ["SmolVLMForConditionalGeneration"]
