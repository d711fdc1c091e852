"""Granite-MoE (IBM) decoder.

Parity with reference `srt/models/granitemoe.py` / HF
`modeling_granitemoe.py`: the Granite scaling knobs (embedding /
residual / attention multipliers, logits scaling — inherited from the
dense Granite model) with every MLP replaced by a sparse MoE whose
router takes top-k on the raw logits and softmaxes over the SELECTED
experts — equal to full-softmax + top-k renormalization, i.e. our
`norm_topk_prob=True` path. Experts ship as fused tensors:
`input_linear [E, 2M, H]` (gate first) and `output_linear [E, H, M]`.
GraniteMoeShared adds a dense shared MLP alongside the routed experts.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.moe import silu_and_mul
from sglang_tpu.layers.moe import EPMoEMixin, moe_forward, moe_shapes, moe_specs
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.granite import GraniteForCausalLM


def _t12(x):
    return x.transpose(0, 2, 1)


class GraniteMoeForCausalLM(EPMoEMixin, GraniteForCausalLM):
    architectures = ["GraniteMoeForCausalLM"]
    supports_chain_tail = False

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.num_experts = int(hf.get("num_local_experts", 8))
        self.top_k = int(hf.get("num_experts_per_tok", 2))
        self.moe_inter = int(
            hf.get("moe_intermediate_size") or config.intermediate_size
        )
        self.norm_topk_prob = True  # softmax over the selected top-k

    def mlp_shapes(self):
        return moe_shapes(
            self.hidden_size, self.moe_inter, self.num_experts,
            self.config.dtype,
        )

    def mlp_specs(self):
        return moe_specs(ep=self.use_ep)

    def mlp_forward(self, lp, x, lora=None, lora_ids=None):
        return moe_forward(
            self, lp, x, top_k=self.top_k, norm_topk_prob=self.norm_topk_prob
        )

    def mlp_weight_rules(self, lp: str, L: tuple) -> List[WeightRule]:
        return [
            WeightRule(
                L + ("router",),
                [f"{lp}.block_sparse_moe.router.layer.weight"],
                kind="router",
            ),
            WeightRule(
                L + ("w1",),
                [f"{lp}.block_sparse_moe.input_linear.weight"],
                kind="raw", transform=_t12,  # [E, 2M, H] -> [E, H, 2M]
            ),
            WeightRule(
                L + ("w2",),
                [f"{lp}.block_sparse_moe.output_linear.weight"],
                kind="raw", transform=_t12,  # [E, H, M] -> [E, M, H]
            ),
        ]


class GraniteMoeSharedForCausalLM(GraniteMoeForCausalLM):
    """GraniteMoeShared: routed experts + an always-on shared SwiGLU MLP
    (`shared_mlp.input_linear [2S, H]` gate-first / `output_linear`)."""

    architectures = ["GraniteMoeSharedForCausalLM"]

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.shared_inter = int(config.hf_config.get("shared_intermediate_size", 0))

    def mlp_shapes(self):
        shapes = super().mlp_shapes()
        if self.shared_inter:
            dt = self.config.dtype
            h = self.hidden_size
            shapes["shared_in"] = jax.ShapeDtypeStruct(
                (h, 2 * self.shared_inter), dt
            )
            shapes["shared_out"] = jax.ShapeDtypeStruct(
                (self.shared_inter, h), dt
            )
        return shapes

    def mlp_specs(self):
        from jax.sharding import PartitionSpec as P

        specs = super().mlp_specs()
        if self.shared_inter:
            specs["shared_in"] = P(None, "model")
            specs["shared_out"] = P("model", None)
        return specs

    def mlp_forward(self, lp, x, lora=None, lora_ids=None):
        out = super().mlp_forward(lp, x)
        if "shared_in" in lp:
            gate_up = jnp.dot(
                x, lp["shared_in"], preferred_element_type=jnp.float32
            ).astype(x.dtype)
            out = out + jnp.dot(
                silu_and_mul(gate_up), lp["shared_out"],
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        return out

    def mlp_weight_rules(self, lp: str, L: tuple) -> List[WeightRule]:
        rules = super().mlp_weight_rules(lp, L)
        if self.shared_inter:
            rules += [
                WeightRule(
                    L + ("shared_in",),
                    [f"{lp}.shared_mlp.input_linear.weight"],
                    kind="linear_raw",
                ),
                WeightRule(
                    L + ("shared_out",),
                    [f"{lp}.shared_mlp.output_linear.weight"],
                    kind="linear_raw",
                ),
            ]
        return rules
