"""Nemotron decoder (NVIDIA).

Parity with reference `srt/models/nemotron.py` / HF `modeling_nemotron.py`:
llama skeleton with LayerNorm1P norms (LayerNorm scaled by weight+1, with
bias), partial rotary (`partial_rotary_factor`), and an un-gated ReLU^2
MLP (up_proj/down_proj)."""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.rotary import apply_rope, compute_inv_freq
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM, _linear_sharding


def _ln_1p(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    normed = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (
        normed * (1.0 + w.astype(jnp.float32)) + b.astype(jnp.float32)
    ).astype(x.dtype)


class NemotronForCausalLM(LlamaForCausalLM):
    architectures = ["NemotronForCausalLM"]

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.ln_eps = hf.get("norm_eps", 1e-5)
        rot_pct = hf.get("partial_rotary_factor", 0.5)
        self.rotary_dim = int(self.head_dim * rot_pct)
        self.inv_freq = jnp.asarray(
            compute_inv_freq(
                self.head_dim, config.rope_theta, config.rope_scaling,
                rotary_dim=self.rotary_dim,
            )
        )

    def mlp_shapes(self) -> dict:
        c = self.config
        h, inter = self.hidden_size, c.intermediate_size
        return {
            "up": self.methods["gate_up"].weight_shapes(h, inter, c.dtype),
            "down": self.methods["down"].weight_shapes(inter, h, c.dtype),
        }

    def mlp_specs(self) -> dict:
        return {
            "up": _linear_sharding(self.methods["gate_up"], col_parallel=True),
            "down": _linear_sharding(self.methods["down"], col_parallel=False),
        }

    def mlp_forward(self, lp, x, lora=None, lora_ids=None):
        up = self.methods["gate_up"].apply(lp["up"], x)
        return self.methods["down"].apply(
            lp["down"], jnp.square(jax.nn.relu(up))
        )

    def mlp_weight_rules(self, lp: str, L: tuple) -> List[WeightRule]:
        return [
            WeightRule(L + ("up",), [f"{lp}.mlp.up_proj.weight"],
                       kind="linear", method_key="gate_up"),
            WeightRule(L + ("down",), [f"{lp}.mlp.down_proj.weight"],
                       kind="linear", method_key="down"),
        ]

    def _layer_specs(self) -> Tuple[dict, dict]:
        shapes, specs = super()._layer_specs()
        dt = self.config.dtype
        h = self.hidden_size
        for n in ("input_norm_b", "post_norm_b"):
            shapes[n] = jax.ShapeDtypeStruct((h,), dt)
            specs[n] = P(None)
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
                WeightRule(L + ("input_norm_b",),
                           [f"{lp}.input_layernorm.bias"], kind="norm"),
                WeightRule(L + ("post_norm_b",),
                           [f"{lp}.post_attention_layernorm.bias"],
                           kind="norm"),
            ]
        return rules

    def forward(self, params, kv_layers, fb, attn_backend):
        t = fb.input_ids.shape[0]
        h = self.embed_tokens(params, fb)
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            normed = _ln_1p(h, lp["input_norm"], lp["input_norm_b"], self.ln_eps)
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
            h = h + self.methods["o"].apply(
                lp["o"], attn_out.reshape(t, self.q_size)
            )
            normed = _ln_1p(h, lp["post_norm"], lp["post_norm_b"], self.ln_eps)
            h = h + self.mlp_forward(lp, normed)
            new_kv.append(kv_i)
        h = _ln_1p(h, params["final_norm"], params["final_norm_b"], self.ln_eps)
        return h, new_kv
