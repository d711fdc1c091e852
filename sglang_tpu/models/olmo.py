"""OLMo (v1) decoder.

Parity with reference `srt/models/olmo.py` / HF `modeling_olmo.py`:
llama skeleton whose layernorms are NON-parametric (no weight/bias —
`OlmoLayerNorm`), with optional qkv clipping (`clip_qkv`)."""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.rotary import apply_rope
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM, silu_and_mul


def _plain_ln(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class OlmoForCausalLM(LlamaForCausalLM):
    architectures = ["OlmoForCausalLM", "OLMoForCausalLM"]

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.clip_qkv = config.hf_config.get("clip_qkv")

    def _layer_specs(self) -> Tuple[dict, dict]:
        shapes, specs = super()._layer_specs()
        del shapes["input_norm"], specs["input_norm"]
        del shapes["post_norm"], specs["post_norm"]
        return shapes, specs

    def param_specs(self) -> dict:
        tree = super().param_specs()
        del tree["final_norm"]
        return tree

    def param_shardings(self) -> dict:
        tree = super().param_shardings()
        del tree["final_norm"]
        return tree

    def weight_rules(self) -> List[WeightRule]:
        rules = super().weight_rules()
        return [
            r
            for r in rules
            if r.target[-1] not in ("input_norm", "post_norm", "final_norm")
            and r.target != ("final_norm",)
        ]

    def forward(self, params, kv_layers, fb, attn_backend):
        t = fb.input_ids.shape[0]
        h = self.embed_tokens(params, fb)
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            normed = _plain_ln(h)
            qkv = self.methods["qkv"].apply(lp["qkv"], normed)
            if self.clip_qkv is not None:
                qkv = jnp.clip(qkv, -self.clip_qkv, self.clip_qkv)
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
            h = h + self.methods["o"].apply(
                lp["o"], attn_out.reshape(t, self.q_size)
            )
            normed = _plain_ln(h)
            gate_up = self.methods["gate_up"].apply(lp["gate_up"], normed)
            h = h + self.methods["down"].apply(
                lp["down"], silu_and_mul(gate_up)
            )
            new_kv.append(kv_i)
        return _plain_ln(h), new_kv
