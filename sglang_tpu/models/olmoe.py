"""OLMoE (Allen AI mixture-of-experts) decoder.

Parity with reference `srt/models/olmoe.py`: llama pre-norm skeleton with
full-projection-width q/k RMSNorm (applied before the head reshape, like
OLMo-2) and a top-k softmax-routed MoE MLP (64 experts, top-8,
`norm_topk_prob=False`).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.moe import (
    EPMoEMixin,
    moe_forward,
    moe_shapes,
    moe_specs,
)
from sglang_tpu.layers.norms import rms_norm
from sglang_tpu.layers.rotary import apply_rope
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM


class OlmoeForCausalLM(EPMoEMixin, LlamaForCausalLM):
    architectures = ["OlmoeForCausalLM"]

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.num_experts = config.num_experts
        self.top_k = config.num_experts_per_tok
        self.moe_inter = config.intermediate_size
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

    # full-width q/k norms (shape [q_size]/[kv_size], not per-head)
    def _layer_specs(self) -> Tuple[dict, dict]:
        shapes, specs = super()._layer_specs()
        dt = self.config.dtype
        shapes["q_norm"] = jax.ShapeDtypeStruct((self.q_size,), dt)
        shapes["k_norm"] = jax.ShapeDtypeStruct((self.kv_size,), dt)
        specs["q_norm"] = P(None)
        specs["k_norm"] = P(None)
        return shapes, specs

    def weight_rules(self) -> List[WeightRule]:
        rules = super().weight_rules()
        pre = self.hf_prefix
        for i in range(self.num_layers):
            lp = f"{pre}.layers.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(
                    L + ("q_norm",), [f"{lp}.self_attn.q_norm.weight"],
                    kind="norm",
                ),
                WeightRule(
                    L + ("k_norm",), [f"{lp}.self_attn.k_norm.weight"],
                    kind="norm",
                ),
            ]
        return rules

    def forward(self, params, kv_layers, fb, attn_backend):
        c = self.config
        t = fb.input_ids.shape[0]
        h = self.embed_tokens(params, fb)
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            normed = rms_norm(h, lp["input_norm"], c.rms_norm_eps)
            qkv = self.methods["qkv"].apply(lp["qkv"], normed)
            q = rms_norm(qkv[:, : self.q_size], lp["q_norm"], c.rms_norm_eps)
            k = rms_norm(
                qkv[:, self.q_size : self.q_size + self.kv_size],
                lp["k_norm"],
                c.rms_norm_eps,
            )
            v = qkv[:, self.q_size + self.kv_size :].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            q = q.reshape(t, self.num_q_heads, self.head_dim)
            k = k.reshape(t, self.num_kv_heads, self.head_dim)
            q = apply_rope(q, fb.positions, self.inv_freq)
            k = apply_rope(k, fb.positions, self.inv_freq)
            attn_out, kv_i = attn_backend(q, k, v, kv_layers[i], fb, self.sm_scale)
            new_kv.append(kv_i)
            h = h + self.methods["o"].apply(
                lp["o"], attn_out.reshape(t, self.q_size)
            )
            normed = rms_norm(h, lp["post_norm"], c.rms_norm_eps)
            h = h + self.mlp_forward(lp, normed)
        h = rms_norm(h, params["final_norm"], c.rms_norm_eps)
        return h, new_kv
