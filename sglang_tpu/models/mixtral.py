"""Mixtral (sparse MoE llama variant).

Parity with reference `python/sglang/srt/models/mixtral.py` — the llama
skeleton with every MLP replaced by an 8-expert top-2 MoE.
"""

from __future__ import annotations

from typing import List

import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.moe import (
    EPMoEMixin,
    moe_forward,
    moe_shapes,
    moe_specs,
)
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM


class MixtralForCausalLM(EPMoEMixin, LlamaForCausalLM):
    architectures = ["MixtralForCausalLM"]

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.num_experts = config.num_experts
        self.top_k = config.num_experts_per_tok
        self.moe_inter = config.moe_intermediate_size or config.intermediate_size
        self.norm_topk_prob = True  # mixtral renormalizes top-k weights

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
            WeightRule(
                L + ("router",),
                [f"{lp}.block_sparse_moe.gate.weight"],
                kind="router",
            ),
            WeightRule(
                L + ("w1",),
                [
                    f"{lp}.block_sparse_moe.experts.{i}.w{j}.weight"
                    for i in range(e)
                    for j in (1, 3)  # w1 = gate, w3 = up
                ],
                kind="moe_w1",
            ),
            WeightRule(
                L + ("w2",),
                [f"{lp}.block_sparse_moe.experts.{i}.w2.weight" for i in range(e)],
                kind="moe_w2",
            ),
        ]
