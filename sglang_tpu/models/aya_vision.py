"""Aya Vision (Cohere C4AI): SigLIP tower + pixel shuffle + SwiGLU
projector + Cohere LM.

Parity with HF `modeling_aya_vision` (reference lineage:
`srt/models/`... aya class): SigLIP encoder (post-layernorm), features
from `vision_feature_layer`, pixel-shuffle by `downsample_factor`, then
LayerNorm -> linear_1 -> SwiGLU (x, gate = chunk(2); silu(gate) * x —
note: gate is the SECOND half, the reverse of llama's fused gate_up) ->
linear_2 into the Cohere language space.
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
    layer_norm,
    pixel_shuffle,
    vit_encode,
    vit_shapes,
    vit_specs_tree,
    vit_weight_rules,
)
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.cohere import CohereForCausalLM


class AyaVisionForConditionalGeneration:
    architectures = ["AyaVisionForConditionalGeneration"]

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        v = hf["vision_config"]
        if not isinstance(v, dict):
            v = v.to_dict()
        self.vspec = ViTSpec.from_hf(
            v,
            act=v.get("hidden_act", "gelu_pytorch_tanh"),
            cls_token=False,
            patch_bias=True,
            post_ln=True,
        )
        self.downsample = int(hf.get("downsample_factor", 2))
        self.feature_layer = hf.get("vision_feature_layer", -1)
        self.select_strategy = hf.get(
            "vision_feature_select_strategy", "full"
        )
        self.image_token_id = hf.get("image_token_index", 255036)
        self.adapter_eps = float(hf.get("adapter_layer_norm_eps", 1e-6))
        self.align_inter = int(
            hf.get("alignment_intermediate_size") or config.hidden_size
        )
        self.lm = CohereForCausalLM(dataclasses.replace(config))
        self.num_layers = self.lm.num_layers
        self.methods = self.lm.methods
        self.proj_in = self.vspec.hidden * self.downsample**2

    def param_specs(self) -> dict:
        dt = self.config.dtype
        h = self.config.hidden_size
        tree = self.lm.param_specs()
        tree["vision"] = vit_shapes(self.vspec, dt)
        pi = self.proj_in
        ai = self.align_inter
        tree["projector"] = {
            "ln": {
                "w": jax.ShapeDtypeStruct((pi,), dt),
                "b": jax.ShapeDtypeStruct((pi,), dt),
            },
            "l1": {
                "w": jax.ShapeDtypeStruct((pi, ai), dt),
                "b": jax.ShapeDtypeStruct((ai,), dt),
            },
            "l2": {
                "w": jax.ShapeDtypeStruct((ai // 2, h), dt),
                "b": jax.ShapeDtypeStruct((h,), dt),
            },
        }
        return tree

    def param_shardings(self) -> dict:
        tree = self.lm.param_shardings()
        tree["vision"] = vit_specs_tree(vit_shapes(self.vspec, self.config.dtype))
        tree["projector"] = jax.tree_util.tree_map(
            lambda _: P(), self.param_specs()["projector"]
        )
        return tree

    def weight_rules(self) -> List[WeightRule]:
        self.lm.hf_prefix = "model.language_model"
        rules = list(self.lm.weight_rules())
        rules += vit_weight_rules(self.vspec, "model.vision_tower.vision_model")
        mp = "model.multi_modal_projector"
        rules += [
            WeightRule(("projector", "ln", "w"), [f"{mp}.layernorm.weight"], kind="norm"),
            WeightRule(("projector", "ln", "b"), [f"{mp}.layernorm.bias"], kind="norm"),
            WeightRule(("projector", "l1", "w"), [f"{mp}.linear_1.weight"], kind="linear_raw"),
            WeightRule(("projector", "l1", "b"), [f"{mp}.linear_1.bias"], kind="norm"),
            WeightRule(("projector", "l2", "w"), [f"{mp}.linear_2.weight"], kind="linear_raw"),
            WeightRule(("projector", "l2", "b"), [f"{mp}.linear_2.bias"], kind="norm"),
        ]
        return rules

    def get_method(self, key: str):
        return self.lm.get_method(key)

    def encode_images(self, params: dict, pixel_values: jax.Array) -> jax.Array:
        # HF selects hidden_states[feature_layer], which EXCLUDES the
        # final post_layernorm even at -1
        h = vit_encode(
            self.vspec, params["vision"], pixel_values,
            feature_layer=self.feature_layer, apply_post_ln=False,
        )
        n = h.shape[0]
        g = self.vspec.grid
        h = h.reshape(n, g, g, self.vspec.hidden)
        h = pixel_shuffle(h, 1.0 / self.downsample)
        h = h.reshape(n, -1, self.proj_in)
        pp = params["projector"]
        x = layer_norm(h, pp["ln"]["w"], pp["ln"]["b"], self.adapter_eps)
        x = jnp.dot(x, pp["l1"]["w"], preferred_element_type=jnp.float32).astype(
            h.dtype
        ) + pp["l1"]["b"]
        val, gate = jnp.split(x, 2, axis=-1)  # SwiGLU: gate is 2nd half
        x = jax.nn.silu(gate) * val
        x = jnp.dot(x, pp["l2"]["w"], preferred_element_type=jnp.float32).astype(
            h.dtype
        ) + pp["l2"]["b"]
        return x.reshape(-1, x.shape[-1])

    def forward(self, params, kv_layers, fb, attn_backend):
        return self.lm.forward(params, kv_layers, fb, attn_backend)

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params, hidden)
