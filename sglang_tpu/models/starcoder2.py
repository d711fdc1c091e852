"""Starcoder2 (BigCode) decoder.

Parity with reference `srt/models/starcoder2.py` and HF
`transformers/models/starcoder2/modeling_starcoder2.py`: MHA/GQA with
biases everywhere (`use_bias`), classic LayerNorm (weight + bias, not
RMSNorm), a two-matmul GELU MLP (`c_fc` -> gelu_pytorch_tanh -> `c_proj`),
full rotary, optional sliding window.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.norms import layer_norm
from sglang_tpu.layers.rotary import apply_rope
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM


class Starcoder2ForCausalLM(LlamaForCausalLM):
    architectures = ["Starcoder2ForCausalLM"]
    qkv_bias = True
    o_bias = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        from sglang_tpu.layers.linear import make_linear_method

        # MLP is c_fc/c_proj with bias
        group = 128
        if config.quant_config:
            group = config.quant_config.get("group_size", 128)
        self.methods["c_fc"] = make_linear_method(
            config.quantization, bias=True, group_size=group
        )
        self.methods["c_proj"] = make_linear_method(
            config.quantization, bias=True, group_size=group
        )
        self.norm_eps = config.hf_config.get("norm_epsilon", 1e-5)

    def mlp_shapes(self) -> dict:
        c = self.config
        h, inter = self.hidden_size, c.intermediate_size
        return {
            "c_fc": self.methods["c_fc"].weight_shapes(h, inter, c.dtype),
            "c_proj": self.methods["c_proj"].weight_shapes(inter, h, c.dtype),
        }

    def mlp_specs(self) -> dict:
        from sglang_tpu.models.llama import _linear_sharding

        return {
            "c_fc": _linear_sharding(self.methods["c_fc"], col_parallel=True),
            "c_proj": _linear_sharding(self.methods["c_proj"], col_parallel=False),
        }

    def mlp_forward(self, lp, x, lora=None, lora_ids=None):
        y = self.methods["c_fc"].apply(lp["c_fc"], x)
        y = jax.nn.gelu(y.astype(jnp.float32), approximate=True).astype(x.dtype)
        return self.methods["c_proj"].apply(lp["c_proj"], y)

    def mlp_weight_rules(self, lp: str, L: tuple) -> List[WeightRule]:
        return [
            WeightRule(L + ("c_fc",), [f"{lp}.mlp.c_fc.weight"], kind="linear", method_key="c_fc"),
            WeightRule(L + ("c_fc", "b"), [f"{lp}.mlp.c_fc.bias"], kind="linear_bias"),
            WeightRule(L + ("c_proj",), [f"{lp}.mlp.c_proj.weight"], kind="linear", method_key="c_proj"),
            WeightRule(L + ("c_proj", "b"), [f"{lp}.mlp.c_proj.bias"], kind="linear_bias"),
        ]

    def _layer_specs(self) -> Tuple[dict, dict]:
        shapes, specs = super()._layer_specs()
        dt = self.config.dtype
        h = self.hidden_size
        # LayerNorm biases (weights reuse input_norm/post_norm slots)
        shapes["input_norm_b"] = jax.ShapeDtypeStruct((h,), dt)
        shapes["post_norm_b"] = jax.ShapeDtypeStruct((h,), dt)
        specs["input_norm_b"] = P(None)
        specs["post_norm_b"] = P(None)
        return shapes, specs

    def param_specs(self) -> dict:
        tree = super().param_specs()
        tree["final_norm_b"] = jax.ShapeDtypeStruct(
            (self.hidden_size,), self.config.dtype
        )
        return tree

    def param_shardings(self) -> dict:
        tree = super().param_shardings()
        tree["final_norm_b"] = P(None)
        return tree

    def weight_rules(self) -> List[WeightRule]:
        rules = super().weight_rules()
        pre = self.hf_prefix
        rules.append(
            WeightRule(("final_norm_b",), [f"{pre}.norm.bias"], kind="norm")
        )
        for i in range(self.num_layers):
            lp = f"{pre}.layers.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(L + ("input_norm_b",), [f"{lp}.input_layernorm.bias"], kind="norm"),
                WeightRule(L + ("post_norm_b",), [f"{lp}.post_attention_layernorm.bias"], kind="norm"),
                WeightRule(L + ("o", "b"), [f"{lp}.self_attn.o_proj.bias"], kind="linear_bias"),
            ]
        return rules

    def forward(self, params, kv_layers, fb, attn_backend):
        t = fb.input_ids.shape[0]
        h = self.embed_tokens(params, fb)
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            normed = layer_norm(
                h, lp["input_norm"], lp["input_norm_b"], self.norm_eps
            )
            qkv = self.methods["qkv"].apply(lp["qkv"], normed)
            q = qkv[:, : self.q_size].reshape(t, self.num_q_heads, self.head_dim)
            k = qkv[:, self.q_size : self.q_size + self.kv_size].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            v = qkv[:, self.q_size + self.kv_size :].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            q = apply_rope(q, fb.positions, self.inv_freq)
            k = apply_rope(k, fb.positions, self.inv_freq)
            attn_out, kv_i = attn_backend(
                q, k, v, kv_layers[i], fb, self.sm_scale,
                sliding_window=self.sliding_window,
            )
            new_kv.append(kv_i)
            h = h + self.methods["o"].apply(
                lp["o"], attn_out.reshape(t, self.q_size)
            )
            normed = layer_norm(
                h, lp["post_norm"], lp["post_norm_b"], self.norm_eps
            )
            h = h + self.mlp_forward(lp, normed)
        h = layer_norm(
            h, params["final_norm"], params["final_norm_b"], self.norm_eps
        )
        return h, new_kv
