"""Qwen2-MoE / Qwen3-MoE.

Parity with reference `srt/models/qwen2_moe.py` / `qwen3_moe.py`. Qwen3-MoE
is the llama skeleton + per-head qk RMSNorm + top-k MoE MLPs (no shared
expert); Qwen2-MoE adds a shared expert with a sigmoid gate.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.moe import (
    EPMoEMixin,
    moe_forward,
    moe_shapes,
    moe_specs,
)
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM, _linear_sharding


class Qwen3MoeForCausalLM(EPMoEMixin, LlamaForCausalLM):
    architectures = ["Qwen3MoeForCausalLM"]
    qk_norm = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.num_experts = config.num_experts
        self.top_k = config.num_experts_per_tok
        self.moe_inter = config.moe_intermediate_size or config.intermediate_size
        self.norm_topk_prob = config.norm_topk_prob

    def mlp_shapes(self):
        return moe_shapes(
            self.hidden_size, self.moe_inter, self.num_experts, self.config.dtype
        )

    def mlp_specs(self):
        return moe_specs(ep=self.use_ep)

    def mlp_forward(self, lp, x, lora=None, lora_ids=None):
        return moe_forward(
            self, lp, x, top_k=self.top_k, norm_topk_prob=self.norm_topk_prob
        )

    def mlp_weight_rules(self, lp: str, L: tuple) -> List[WeightRule]:
        e = self.num_experts
        return [
            WeightRule(L + ("router",), [f"{lp}.mlp.gate.weight"], kind="router"),
            WeightRule(
                L + ("w1",),
                [
                    f"{lp}.mlp.experts.{i}.{n}.weight"
                    for i in range(e)
                    for n in ("gate_proj", "up_proj")
                ],
                kind="moe_w1",
            ),
            WeightRule(
                L + ("w2",),
                [f"{lp}.mlp.experts.{i}.down_proj.weight" for i in range(e)],
                kind="moe_w2",
            ),
        ]


class Qwen2MoeForCausalLM(Qwen3MoeForCausalLM):
    architectures = ["Qwen2MoeForCausalLM"]
    qk_norm = False
    qkv_bias = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.shared_inter = hf.get("shared_expert_intermediate_size", 0)

    def mlp_shapes(self):
        shapes = super().mlp_shapes()
        if self.shared_inter:
            c = self.config
            shapes["shared_gate_up"] = self.methods["gate_up"].weight_shapes(
                self.hidden_size, 2 * self.shared_inter, c.dtype
            )
            shapes["shared_down"] = self.methods["down"].weight_shapes(
                self.shared_inter, self.hidden_size, c.dtype
            )
            shapes["shared_gate"] = jax.ShapeDtypeStruct(
                (self.hidden_size, 1), jnp.float32
            )
        return shapes

    def mlp_specs(self):
        specs = super().mlp_specs()
        if self.shared_inter:
            from jax.sharding import PartitionSpec as P

            specs["shared_gate_up"] = _linear_sharding(
                self.methods["gate_up"], col_parallel=True
            )
            specs["shared_down"] = _linear_sharding(
                self.methods["down"], col_parallel=False
            )
            specs["shared_gate"] = P(None, None)
        return specs

    def mlp_forward(self, lp, x, lora=None, lora_ids=None):
        out = super().mlp_forward(lp, x)
        if self.shared_inter:
            from sglang_tpu.layers.activation import silu_and_mul

            gate_up = self.methods["gate_up"].apply(lp["shared_gate_up"], x)
            shared = self.methods["down"].apply(
                lp["shared_down"], silu_and_mul(gate_up)
            )
            g = jax.nn.sigmoid(
                jnp.dot(x.astype(jnp.float32), lp["shared_gate"])
            ).astype(x.dtype)
            out = out + g * shared
        return out

    def mlp_weight_rules(self, lp: str, L: tuple) -> List[WeightRule]:
        rules = super().mlp_weight_rules(lp, L)
        if self.shared_inter:
            rules += [
                WeightRule(
                    L + ("shared_gate_up",),
                    [
                        f"{lp}.mlp.shared_expert.gate_proj.weight",
                        f"{lp}.mlp.shared_expert.up_proj.weight",
                    ],
                    kind="linear",
                    method_key="gate_up",
                ),
                WeightRule(
                    L + ("shared_down",),
                    [f"{lp}.mlp.shared_expert.down_proj.weight"],
                    kind="linear",
                    method_key="down",
                ),
                WeightRule(
                    L + ("shared_gate",),
                    [f"{lp}.mlp.shared_expert_gate.weight"],
                    kind="router",
                ),
            ]
        return rules
