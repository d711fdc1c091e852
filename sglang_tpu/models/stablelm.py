"""StableLM-2 / StableLM-3B-4E1T decoder.

Parity with reference `srt/models/stablelm.py`: llama skeleton with classic
biased LayerNorm in place of RMSNorm, partial rotary
(`partial_rotary_factor` / `rope_pct`), optional qkv bias
(`use_qkv_bias`), gated silu MLP, untied lm_head.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.linear import make_linear_method
from sglang_tpu.layers.norms import layer_norm
from sglang_tpu.layers.rotary import apply_rope, compute_inv_freq
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM


class StableLmForCausalLM(LlamaForCausalLM):
    architectures = ["StableLmForCausalLM", "StableLMEpochForCausalLM"]

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        self.use_qkv_bias = bool(hf.get("use_qkv_bias", False))
        # instance attr shadows the class default; read by weight_rules()
        self.qkv_bias = self.use_qkv_bias
        super().__init__(config)
        c = config
        self.ln_eps = hf.get("layer_norm_eps", 1e-5)
        rot_pct = hf.get("partial_rotary_factor") or hf.get("rope_pct", 0.25)
        self.rotary_dim = int(self.head_dim * rot_pct)
        self.inv_freq = jnp.asarray(
            compute_inv_freq(
                self.head_dim, c.rope_theta, c.rope_scaling,
                rotary_dim=self.rotary_dim,
            )
        )
        self.methods["qkv"] = make_linear_method(
            c.quantization, bias=self.use_qkv_bias
        )

    def _layer_specs(self) -> Tuple[dict, dict]:
        shapes, specs = super()._layer_specs()
        dt = self.config.dtype
        h = self.hidden_size
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
                WeightRule(
                    L + ("input_norm_b",), [f"{lp}.input_layernorm.bias"],
                    kind="norm",
                ),
                WeightRule(
                    L + ("post_norm_b",),
                    [f"{lp}.post_attention_layernorm.bias"],
                    kind="norm",
                ),
            ]
        return rules

    def forward(self, params, kv_layers, fb, attn_backend):
        t = fb.input_ids.shape[0]
        h = self.embed_tokens(params, fb)
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            normed = layer_norm(
                h, lp["input_norm"], lp["input_norm_b"], self.ln_eps
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
            attn_out, kv_i = attn_backend(q, k, v, kv_layers[i], fb, self.sm_scale)
            new_kv.append(kv_i)
            h = h + self.methods["o"].apply(
                lp["o"], attn_out.reshape(t, self.q_size)
            )
            normed = layer_norm(h, lp["post_norm"], lp["post_norm_b"], self.ln_eps)
            h = h + self.mlp_forward(lp, normed)
        h = layer_norm(
            h, params["final_norm"], params["final_norm_b"], self.ln_eps
        )
        return h, new_kv
