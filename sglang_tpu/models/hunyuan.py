"""Tencent HunYuan V1 (dense + MoE) decoders.

Parity with reference `srt/models/hunyuan.py` / HF
`modeling_hunyuan_v1_{dense,moe}.py`: llama skeleton whose per-head
q/k RMSNorm is applied AFTER rotary (query_layernorm/key_layernorm —
the opposite order from Qwen3), MoE variant adds a softmax-top-k
renormalized router (`gate.wg`), per-expert SwiGLU experts, and an
always-on shared SwiGLU MLP."""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.activation import silu_and_mul
from sglang_tpu.layers.moe import EPMoEMixin, moe_forward, moe_shapes, moe_specs
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM


class HunYuanDenseV1ForCausalLM(LlamaForCausalLM):
    architectures = ["HunYuanDenseV1ForCausalLM"]
    qk_norm = True
    qk_norm_after_rope = True
    supports_chain_tail = False

    def __init__(self, config: ModelConfig):
        self.qkv_bias = bool(config.hf_config.get("attention_bias", False))
        super().__init__(config)

    def weight_rules(self) -> List[WeightRule]:
        # the per-head norms ship as query_layernorm / key_layernorm
        rules = []
        for r in super().weight_rules():
            if r.target[-1] == "q_norm":
                r = WeightRule(
                    r.target,
                    [r.sources[0].replace("q_norm", "query_layernorm")],
                    kind="norm",
                )
            elif r.target[-1] == "k_norm":
                r = WeightRule(
                    r.target,
                    [r.sources[0].replace("k_norm", "key_layernorm")],
                    kind="norm",
                )
            rules.append(r)
        return rules


class HunYuanMoEV1ForCausalLM(EPMoEMixin, HunYuanDenseV1ForCausalLM):
    architectures = ["HunYuanMoEV1ForCausalLM"]

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.num_experts = int(hf.get("num_experts", 8))
        self.top_k = int(hf.get("moe_topk", 2))
        self.moe_inter = int(
            hf.get("moe_intermediate_size") or config.intermediate_size
        )
        self.norm_topk_prob = True  # softmax -> topk -> renormalize
        self.shared_inter = int(config.intermediate_size)

    def mlp_shapes(self):
        dt = self.config.dtype
        h = self.hidden_size
        shapes = moe_shapes(h, self.moe_inter, self.num_experts, dt)
        shapes["shared_gate_up"] = jax.ShapeDtypeStruct(
            (h, 2 * self.shared_inter), dt
        )
        shapes["shared_down"] = jax.ShapeDtypeStruct(
            (self.shared_inter, h), dt
        )
        return shapes

    def mlp_specs(self):
        specs = moe_specs(ep=self.use_ep)
        specs["shared_gate_up"] = P(None, "model")
        specs["shared_down"] = P("model", None)
        return specs

    def mlp_forward(self, lp, x, lora=None, lora_ids=None):
        routed = moe_forward(
            self, lp, x, top_k=self.top_k, norm_topk_prob=self.norm_topk_prob
        )
        gate_up = jnp.dot(
            x, lp["shared_gate_up"], preferred_element_type=jnp.float32
        ).astype(x.dtype)
        shared = jnp.dot(
            silu_and_mul(gate_up), lp["shared_down"],
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return routed + shared

    def mlp_weight_rules(self, lp: str, L: tuple) -> List[WeightRule]:
        e = self.num_experts
        return [
            WeightRule(L + ("router",), [f"{lp}.mlp.gate.wg.weight"], kind="router"),
            WeightRule(
                L + ("w1",),
                [
                    f"{lp}.mlp.experts.{i}.{n}_proj.weight"
                    for i in range(e)
                    for n in ("gate", "up")
                ],
                kind="moe_w1",
            ),
            WeightRule(
                L + ("w2",),
                [f"{lp}.mlp.experts.{i}.down_proj.weight" for i in range(e)],
                kind="moe_w2",
            ),
            WeightRule(
                L + ("shared_gate_up",),
                [
                    f"{lp}.mlp.shared_mlp.gate_proj.weight",
                    f"{lp}.mlp.shared_mlp.up_proj.weight",
                ],
                kind="linear_raw",
            ),
            WeightRule(
                L + ("shared_down",),
                [f"{lp}.mlp.shared_mlp.down_proj.weight"],
                kind="linear_raw",
            ),
        ]
