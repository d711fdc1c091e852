"""GLM-4.5 / GLM-4-MoE (Glm4MoeForCausalLM).

Parity with reference `srt/models/glm4_moe.py` and HF
`modeling_glm4_moe`: llama GQA skeleton with
- PARTIAL rotary (`partial_rotary_factor`, standard rotate-half on the
  leading dims — unlike dense GLM-4's interleaved pairing),
- optional per-head q/k RMSNorm (`use_qk_norm`),
- DeepSeek-V3-style MoE from `first_k_dense_replace` onward: sigmoid
  router with `e_score_correction_bias` used for SELECTION only
  (noaux_tc group-limited top-k), weights = raw sigmoid scores,
  normalized then scaled by `routed_scaling_factor`; `n_shared_experts`
  always-on shared expert; the first k layers stay dense.

TPU shape: routed experts run the exact sorted `ragged_dot` dispatch
(`layers/moe.py`); dense and MoE layers carry different param dicts, so
the runner's layer scan self-disables (`layers_stackable`) and the
unrolled forward branches on dict keys (static at trace time).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.activation import silu_and_mul
from sglang_tpu.layers.moe import fused_moe, moe_specs
from sglang_tpu.layers.rotary import compute_inv_freq
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM, _linear_sharding


class Glm4MoeForCausalLM(LlamaForCausalLM):
    architectures = ["Glm4MoeForCausalLM"]
    supports_chain_tail = False  # non-uniform layers

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        # instance attrs must precede super(): the base init builds the
        # linear methods from qkv_bias and the specs read qk_norm
        self.qk_norm = bool(hf.get("use_qk_norm", False))
        self.qkv_bias = bool(hf.get("attention_bias", False))
        super().__init__(config)
        prf = float(hf.get("partial_rotary_factor") or 1.0)
        if prf < 1.0:
            self.inv_freq = jnp.asarray(
                compute_inv_freq(
                    int(self.head_dim * prf),
                    config.rope_theta,
                    config.rope_scaling,
                )
            )
        self.first_dense = int(hf.get("first_k_dense_replace", 0))
        self.num_experts = int(hf.get("n_routed_experts", 64))
        self.top_k = int(hf.get("num_experts_per_tok", 8))
        self.moe_inter = int(
            hf.get("moe_intermediate_size") or config.intermediate_size
        )
        self.n_shared = int(hf.get("n_shared_experts", 1))
        self.norm_topk_prob = bool(hf.get("norm_topk_prob", True))
        self.routed_scaling = float(hf.get("routed_scaling_factor", 1.0))
        self.n_group = int(hf.get("n_group", 1))
        self.topk_group = int(hf.get("topk_group", 1))

    def _is_moe(self, i: int) -> bool:
        return i >= self.first_dense

    # ------------------------------------------------------------- params

    def param_specs(self) -> dict:
        c = self.config
        dt = c.dtype
        h = self.hidden_size
        base_shapes, _ = super()._layer_specs()
        dense_mlp = {
            k: base_shapes[k] for k in ("gate_up", "down")
        }
        for k in ("gate_up", "down"):
            base_shapes.pop(k)
        layers = []
        si = self.moe_inter * self.n_shared
        for i in range(self.num_layers):
            shapes = dict(base_shapes)
            if self._is_moe(i):
                shapes["router"] = jax.ShapeDtypeStruct(
                    (h, self.num_experts), jnp.float32
                )
                shapes["gate_bias"] = jax.ShapeDtypeStruct(
                    (self.num_experts,), jnp.float32
                )
                shapes["w1"] = jax.ShapeDtypeStruct(
                    (self.num_experts, h, 2 * self.moe_inter), dt
                )
                shapes["w2"] = jax.ShapeDtypeStruct(
                    (self.num_experts, self.moe_inter, h), dt
                )
                shapes["shared_gate_up"] = self.methods[
                    "gate_up"
                ].weight_shapes(h, 2 * si, dt)
                shapes["shared_down"] = self.methods["down"].weight_shapes(
                    si, h, dt
                )
            else:
                shapes.update(dense_mlp)
            layers.append(shapes)
        tree = {
            "embed": jax.ShapeDtypeStruct((c.vocab_size, h), dt),
            "layers": layers,
            "final_norm": jax.ShapeDtypeStruct((h,), dt),
        }
        if not c.tie_word_embeddings:
            tree["lm_head"] = jax.ShapeDtypeStruct((h, c.vocab_size), dt)
        return tree

    def param_shardings(self) -> dict:
        _, base_specs = super()._layer_specs()
        dense = {
            "gate_up": _linear_sharding(self.methods["gate_up"], col_parallel=True),
            "down": _linear_sharding(self.methods["down"], col_parallel=False),
        }
        for k in ("gate_up", "down"):
            base_specs.pop(k)
        layers = []
        for i in range(self.num_layers):
            specs = dict(base_specs)
            if self._is_moe(i):
                specs.update(moe_specs(ep=getattr(self, "use_ep", False)))
                specs["gate_bias"] = P(None)
                specs["shared_gate_up"] = dense["gate_up"]
                specs["shared_down"] = dense["down"]
            else:
                specs.update(dense)
            layers.append(specs)
        tree = {
            "embed": P(None, "model"),
            "layers": layers,
            "final_norm": P(None),
        }
        if not self.config.tie_word_embeddings:
            tree["lm_head"] = P(None, "model")
        return tree

    def mlp_weight_rules(self, lp: str, L: tuple) -> List[WeightRule]:
        i = L[1]
        if not self._is_moe(i):
            return super().mlp_weight_rules(lp, L)
        e = self.num_experts
        return [
            WeightRule(L + ("router",), [f"{lp}.mlp.gate.weight"], kind="router"),
            WeightRule(
                L + ("gate_bias",),
                [f"{lp}.mlp.gate.e_score_correction_bias"],
                kind="raw",
            ),
            WeightRule(
                L + ("w1",),
                [
                    f"{lp}.mlp.experts.{j}.{p}_proj.weight"
                    for j in range(e)
                    for p in ("gate", "up")
                ],
                kind="moe_w1",
            ),
            WeightRule(
                L + ("w2",),
                [f"{lp}.mlp.experts.{j}.down_proj.weight" for j in range(e)],
                kind="moe_w2",
            ),
            WeightRule(
                L + ("shared_gate_up",),
                [
                    f"{lp}.mlp.shared_experts.gate_proj.weight",
                    f"{lp}.mlp.shared_experts.up_proj.weight",
                ],
                kind="linear",
                method_key="gate_up",
            ),
            WeightRule(
                L + ("shared_down",),
                [f"{lp}.mlp.shared_experts.down_proj.weight"],
                kind="linear",
                method_key="down",
            ),
        ]

    # ------------------------------------------------------------ forward

    def mlp_forward(self, lp, x, lora=None, lora_ids=None):
        if "router" not in lp:  # dense layer (static at trace time)
            return super().mlp_forward(lp, x, lora=lora, lora_ids=lora_ids)
        routed = fused_moe(
            x,
            lp["router"],
            lp["w1"],
            lp["w2"],
            top_k=self.top_k,
            norm_topk_prob=self.norm_topk_prob,
            scoring_func="sigmoid",
            correction_bias=lp["gate_bias"],
            routed_scaling_factor=self.routed_scaling,
            n_group=self.n_group,
            topk_group=self.topk_group,
        )
        gate_up = self.methods["gate_up"].apply(lp["shared_gate_up"], x)
        shared = self.methods["down"].apply(
            lp["shared_down"], silu_and_mul(gate_up)
        )
        return routed + shared
