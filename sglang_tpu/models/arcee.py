"""Arcee (AFM) decoder.

Parity with reference `srt/models/arcee.py` / HF `modeling_arcee.py`:
llama skeleton whose MLP is un-gated ReLU^2 — down(relu(up(x))^2) —
(`hidden_act="relu2"`, no gate_proj)."""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM, _linear_sharding


class ArceeForCausalLM(LlamaForCausalLM):
    architectures = ["ArceeForCausalLM"]

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
        act = jnp.square(jax.nn.relu(up))
        return self.methods["down"].apply(lp["down"], act)

    def mlp_weight_rules(self, lp: str, L: tuple) -> List[WeightRule]:
        return [
            WeightRule(
                L + ("up",), [f"{lp}.mlp.up_proj.weight"], kind="linear",
                method_key="gate_up",
            ),
            WeightRule(
                L + ("down",), [f"{lp}.mlp.down_proj.weight"], kind="linear",
                method_key="down",
            ),
        ]
