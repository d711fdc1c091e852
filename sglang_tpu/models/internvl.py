"""InternVL 2.5/3 vision-language model (InternViT + pixel shuffle +
Qwen2/Llama LM).

Parity with reference `srt/models/internvl.py` and HF
`modeling_internvl`: InternViT encoder (CLS token, layer-scale lambdas,
optional RMS norms / per-head qk-norm), CLS dropped, features reshaped
to the patch grid, pixel-shuffle downsampling by `downsample_ratio`
(channels grow by 1/ratio^2), then a LayerNorm+MLP projector into the
language space; the language stack is the config's `text_config`
(Qwen2 or Llama family), served causally like any text model.

TPU split: the tower+shuffle+projector run as ONE jitted
`encode_images` over the flat tile batch at admission
(`multimodal/processors.py`); the serving step sees only
(mm_embeds, mm_rows).
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
from sglang_tpu.models.llama import LlamaForCausalLM, Qwen2ForCausalLM


def _squeeze(x):
    return x.reshape(x.shape[-2], x.shape[-1]) if x.ndim == 3 else x


class InternVLForConditionalGeneration:
    architectures = ["InternVLForConditionalGeneration"]

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        v = hf["vision_config"]
        if not isinstance(v, dict):
            v = v.to_dict()
        self.vspec = ViTSpec.from_hf(
            v,
            act=v.get("hidden_act", "gelu"),
            norm="rmsnorm" if v.get("norm_type") == "rms_norm" else "layernorm",
            cls_token=True,
            patch_bias=True,
            attn_bias=bool(v.get("attention_bias", False)),
            out_bias=True,
            layer_scale=v.get("layer_scale_init_value") is not None,
            qk_norm=bool(v.get("use_qk_norm", False)),
        )
        self.downsample = float(hf.get("downsample_ratio", 0.5))
        self.feature_layer = hf.get("vision_feature_layer", -1)
        self.select_strategy = hf.get(
            "vision_feature_select_strategy", "default"
        )
        self.image_token_id = hf.get("image_token_id", hf.get(
            "image_token_index", 151667
        ))
        # language stack: InternVL ships Qwen2 or Llama text configs
        tc_type = hf.get("model_type_text") or (
            hf["text_config"].get("model_type")
            if isinstance(hf.get("text_config"), dict)
            else "qwen2"
        )
        lm_cls = Qwen2ForCausalLM if "qwen" in str(tc_type) else LlamaForCausalLM
        self.lm = lm_cls(dataclasses.replace(config))
        self.num_layers = self.lm.num_layers
        self.methods = self.lm.methods
        # projector input dim after pixel shuffle
        self.proj_in = int(self.vspec.hidden / (self.downsample**2))

    # ------------------------------------------------------------- params

    def param_specs(self) -> dict:
        dt = self.config.dtype
        h = self.config.hidden_size
        tree = self.lm.param_specs()
        tree["vision"] = vit_shapes(self.vspec, dt)
        pi = self.proj_in
        tree["projector"] = {
            "ln": {
                "w": jax.ShapeDtypeStruct((pi,), dt),
                "b": jax.ShapeDtypeStruct((pi,), dt),
            },
            "l1": {
                "w": jax.ShapeDtypeStruct((pi, h), dt),
                "b": jax.ShapeDtypeStruct((h,), dt),
            },
            "l2": {
                "w": jax.ShapeDtypeStruct((h, h), dt),
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
        rules += vit_weight_rules(
            self.vspec,
            "model.vision_tower",
            names={
                "patch": "embeddings.patch_embeddings.projection",
                "cls": "embeddings.cls_token",
                "pos": "embeddings.position_embeddings",
                "layer": "encoder.layer.{i}",
                "ln1": "layernorm_before",
                "ln2": "layernorm_after",
                "q": "attention.q_proj",
                "k": "attention.k_proj",
                "v": "attention.v_proj",
                "out": "attention.projection_layer",
            },
        )
        # HF stores cls/pos with leading singleton dims
        fixed = []
        for r in rules:
            if r.target == ("vision", "class_embed"):
                r = dataclasses.replace(r, transform=lambda x: x.reshape(-1))
            elif r.target == ("vision", "pos_embed"):
                r = dataclasses.replace(
                    r, transform=lambda x: x.reshape(x.shape[-2], x.shape[-1])
                )
            fixed.append(r)
        rules = fixed
        mp = "model.multi_modal_projector"
        rules += [
            WeightRule(("projector", "ln", "w"), [f"{mp}.layer_norm.weight"], kind="norm"),
            WeightRule(("projector", "ln", "b"), [f"{mp}.layer_norm.bias"], kind="norm"),
            WeightRule(("projector", "l1", "w"), [f"{mp}.linear_1.weight"], kind="linear_raw"),
            WeightRule(("projector", "l1", "b"), [f"{mp}.linear_1.bias"], kind="norm"),
            WeightRule(("projector", "l2", "w"), [f"{mp}.linear_2.weight"], kind="linear_raw"),
            WeightRule(("projector", "l2", "b"), [f"{mp}.linear_2.bias"], kind="norm"),
        ]
        return rules

    def get_method(self, key: str):
        return self.lm.get_method(key)

    # ------------------------------------------------------------- vision

    def encode_images(self, params: dict, pixel_values: jax.Array) -> jax.Array:
        """[N, 3, S, S] -> [N * tokens_per_tile, H]: InternViT -> drop CLS
        -> grid reshape -> pixel shuffle -> LN + 2-layer MLP projector."""
        h = vit_encode(
            self.vspec, params["vision"], pixel_values,
            feature_layer=self.feature_layer,
        )
        if self.select_strategy == "default":
            h = h[:, 1:]
        n = h.shape[0]
        g = self.vspec.grid
        h = h.reshape(n, g, g, self.vspec.hidden)
        h = pixel_shuffle(h, self.downsample)
        h = h.reshape(n, -1, h.shape[-1])  # [N, (g*ds)^2, C/ds^2]
        pp = params["projector"]
        x = layer_norm(h, pp["ln"]["w"], pp["ln"]["b"], 1e-5)
        x = jnp.dot(x, pp["l1"]["w"], preferred_element_type=jnp.float32).astype(
            h.dtype
        ) + pp["l1"]["b"]
        x = jax.nn.gelu(x, approximate=False)
        x = jnp.dot(x, pp["l2"]["w"], preferred_element_type=jnp.float32).astype(
            h.dtype
        ) + pp["l2"]["b"]
        return x.reshape(-1, x.shape[-1])

    # ------------------------------------------------------------- forward

    def forward(self, params, kv_layers, fb, attn_backend):
        return self.lm.forward(params, kv_layers, fb, attn_backend)

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params, hidden)
