"""Apertus (Swiss AI) decoder.

Parity with HF `modeling_apertus.py` (reference `srt/models/apertus.py`
lineage): llama skeleton with per-head qk RMSNorm (before rope) and a
GATELESS MLP — up_proj -> xIELU -> down_proj — where xIELU carries two
LEARNED scalars per layer:

    xielu(x) = softplus(alpha_p) * x^2 + beta * x            (x > 0)
             = (expm1(min(x, eps)) - x) * (beta + softplus(alpha_n))
               + beta * x                                    (x <= 0)
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM

XIELU_BETA = 0.5
XIELU_EPS = -1e-6


def xielu(x, alpha_p, alpha_n):
    xf = x.astype(jnp.float32)
    ap = jax.nn.softplus(alpha_p.astype(jnp.float32))
    an = XIELU_BETA + jax.nn.softplus(alpha_n.astype(jnp.float32))
    pos = ap * xf * xf + XIELU_BETA * xf
    neg = (jnp.expm1(jnp.minimum(xf, XIELU_EPS)) - xf) * an + XIELU_BETA * xf
    return jnp.where(xf > 0, pos, neg).astype(x.dtype)


class ApertusForCausalLM(LlamaForCausalLM):
    architectures = ["ApertusForCausalLM"]
    qk_norm = True
    supports_chain_tail = False

    def mlp_shapes(self) -> dict:
        c = self.config
        dt = c.dtype
        return {
            "up": self.methods["up"].weight_shapes(
                self.hidden_size, c.intermediate_size, dt
            ),
            "down": self.methods["down"].weight_shapes(
                c.intermediate_size, self.hidden_size, dt
            ),
            "alpha_p": jax.ShapeDtypeStruct((1,), jnp.float32),
            "alpha_n": jax.ShapeDtypeStruct((1,), jnp.float32),
        }

    def mlp_specs(self) -> dict:
        from sglang_tpu.models.llama import _linear_sharding

        return {
            "up": _linear_sharding(self.methods["up"], col_parallel=True),
            "down": _linear_sharding(self.methods["down"], col_parallel=False),
            "alpha_p": P(None),
            "alpha_n": P(None),
        }

    def __init__(self, config: ModelConfig):
        from sglang_tpu.layers.linear import make_linear_method

        super().__init__(config)
        # gateless MLP: "up" joins the method table (specs build lazily)
        self.methods["up"] = make_linear_method(config.quantization)

    def mlp_forward(self, lp, x, lora=None, lora_ids=None):
        up = self.methods["up"].apply(lp["up"], x)
        act = xielu(up, lp["alpha_p"], lp["alpha_n"])
        return self.methods["down"].apply(lp["down"], act)

    def mlp_weight_rules(self, lp: str, L: tuple) -> List[WeightRule]:
        return [
            WeightRule(L + ("up",), [f"{lp}.mlp.up_proj.weight"], kind="linear", method_key="up"),
            WeightRule(L + ("down",), [f"{lp}.mlp.down_proj.weight"], kind="linear", method_key="down"),
            WeightRule(L + ("alpha_p",), [f"{lp}.mlp.act_fn.alpha_p"], kind="raw"),
            WeightRule(L + ("alpha_n",), [f"{lp}.mlp.act_fn.alpha_n"], kind="raw"),
        ]

    def weight_rules(self) -> List[WeightRule]:
        # Apertus names the sandwich norms attention_/feedforward_layernorm
        rules = []
        for r in super().weight_rules():
            src = r.sources[0]
            if src.endswith(".input_layernorm.weight"):
                r = WeightRule(
                    r.target,
                    [src.replace("input_layernorm", "attention_layernorm")],
                    kind="norm",
                )
            elif src.endswith(".post_attention_layernorm.weight"):
                r = WeightRule(
                    r.target,
                    [
                        src.replace(
                            "post_attention_layernorm",
                            "feedforward_layernorm",
                        )
                    ],
                    kind="norm",
                )
            rules.append(r)
        return rules
