"""EAGLE-1 draft head (feature-level autoregression).

Parity with reference `srt/models/llama_eagle.py` (LlamaForCausalLMEagle)
and the EAGLE draft checkpoints (yuhuili/EAGLE-*): a llama decoder stack
(typically ONE layer) whose input is `fc(concat(embed(token), feature))`
— the token embedding fused with the TARGET model's hidden state for the
previous position — and whose output feature goes straight through the
target's lm_head (no final norm). Layer 0 has no input layernorm (the fc
output is consumed raw, as in the EAGLE reference implementation).

Checkpoint layout (draft state dict is saved at top level, no `model.`
prefix): `embed_tokens.weight`, `fc.weight` [H, 2H] (+optional `fc.bias`),
`layers.{i}.*` standard llama decoder tensors minus
`layers.0.input_layernorm.weight`.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM, _linear_sharding


class EagleLlamaForCausalLM(LlamaForCausalLM):
    """Draft model only — never served standalone, so it is instantiated
    directly by the EAGLE worker rather than via the registry."""

    architectures: List[str] = []

    def __init__(self, config):
        super().__init__(config)
        from sglang_tpu.layers.linear import make_linear_method

        self.methods["fc"] = make_linear_method(None, bias=True)

    # ------------------------------------------------------------- specs

    def param_specs(self) -> dict:
        c = self.config
        dt = c.dtype
        layer_shapes, _ = self._layer_specs()
        h = self.hidden_size
        layers = []
        for i in range(self.num_layers):
            shapes = dict(layer_shapes)
            if i == 0:
                shapes.pop("input_norm")
            layers.append(shapes)
        return {
            "embed": jax.ShapeDtypeStruct((c.vocab_size, h), dt),
            "fc": self.methods["fc"].weight_shapes(2 * h, h, dt),
            "layers": layers,
        }

    def param_shardings(self) -> dict:
        _, layer_specs = self._layer_specs()
        layers = []
        for i in range(self.num_layers):
            specs = dict(layer_specs)
            if i == 0:
                specs.pop("input_norm")
            layers.append(specs)
        return {
            "embed": P(None, "model"),
            "fc": _linear_sharding(self.methods["fc"], col_parallel=False),
            "layers": layers,
        }

    def weight_rules(self) -> List[WeightRule]:
        rules = [
            WeightRule(("embed",), ["embed_tokens.weight"], kind="embed"),
            WeightRule(("fc",), ["fc.weight"], kind="linear", method_key="fc"),
            WeightRule(("fc", "b"), ["fc.bias"], kind="linear_bias"),
        ]
        for i in range(self.num_layers):
            lp = f"layers.{i}"
            L = ("layers", i)
            if i > 0:
                rules.append(
                    WeightRule(
                        L + ("input_norm",),
                        [f"{lp}.input_layernorm.weight"],
                        kind="norm",
                    )
                )
            rules += [
                WeightRule(
                    L + ("post_norm",),
                    [f"{lp}.post_attention_layernorm.weight"],
                    kind="norm",
                ),
                WeightRule(
                    L + ("qkv",),
                    [
                        f"{lp}.self_attn.q_proj.weight",
                        f"{lp}.self_attn.k_proj.weight",
                        f"{lp}.self_attn.v_proj.weight",
                    ],
                    kind="linear",
                    method_key="qkv",
                ),
                WeightRule(
                    L + ("o",),
                    [f"{lp}.self_attn.o_proj.weight"],
                    kind="linear",
                    method_key="o",
                ),
                *self.mlp_weight_rules(lp, L),
            ]
        return rules

    # ----------------------------------------------------------- forward

    def forward_with_features(
        self,
        params: dict,
        kv_layers: List[jax.Array],
        fb: ForwardBatch,
        attn_backend,
        features: jax.Array,  # [T, H] target (or own) features, prev position
    ) -> Tuple[jax.Array, List[jax.Array]]:
        emb = params["embed"][fb.input_ids]  # [T, H]
        h = self.methods["fc"].apply(
            params["fc"], jnp.concatenate([emb, features], axis=-1)
        )
        new_kv: List[jax.Array] = []
        for i in range(self.num_layers):
            h, kv_i = self.decoder_layer(
                params["layers"][i],
                h,
                kv_layers[i],
                fb,
                attn_backend,
                skip_input_norm=(i == 0),
            )
            new_kv.append(kv_i)
        return h, new_kv  # raw feature: target lm_head applies directly
