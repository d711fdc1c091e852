"""Granite 4.0 hybrid (GraniteMoeHybrid): Mamba2/attention layers with
Granite multipliers and a shared+routed MoE MLP.

Parity with reference `srt/models/granitemoehybrid.py` / HF
`modeling_granitemoehybrid.py`: per-layer mamba-or-attention (bamba
machinery), NoPE attention by default (`position_embedding_type`),
embedding/residual/attention multipliers + logits scaling (granite),
and per layer an always-on shared SwiGLU (`shared_mlp.input_linear`
gate-first) plus an optional granitemoe-style routed MoE."""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.activation import silu_and_mul
from sglang_tpu.layers.moe import fused_moe, moe_shapes, moe_specs
from sglang_tpu.layers.norms import rms_norm
from sglang_tpu.layers.rotary import apply_rope
from sglang_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.bamba import BambaForCausalLM
from sglang_tpu.models.granite_moe import _t12


class GraniteMoeHybridForCausalLM(BambaForCausalLM):
    architectures = ["GraniteMoeHybridForCausalLM"]

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.embedding_multiplier = float(hf.get("embedding_multiplier", 1.0))
        self.residual_multiplier = float(hf.get("residual_multiplier", 1.0))
        self.logits_scaling = float(hf.get("logits_scaling", 1.0))
        am = hf.get("attention_multiplier")
        if am is not None:
            self.sm_scale = float(am)
        self.use_rope = hf.get("position_embedding_type", "nope") != "nope"
        if self.use_rope:  # rope variant uses FULL rotary, not bamba's 0.5
            from sglang_tpu.layers.rotary import compute_inv_freq

            self.inv_freq = jnp.asarray(
                compute_inv_freq(
                    self.head_dim, config.rope_theta, config.rope_scaling
                )
            )
        self.num_experts = int(hf.get("num_local_experts", 0))
        self.top_k = int(hf.get("num_experts_per_tok", 2))
        self.moe_inter = int(
            hf.get("intermediate_size") or config.intermediate_size
        )
        self.shared_inter = int(hf.get("shared_intermediate_size", 0))

    def _layer_shapes_specs(self, i: int) -> Tuple[dict, dict]:
        c = self.config
        dt = c.dtype
        h = self.hidden_size
        if self.layer_types[i] == "attention":
            shapes, specs = self._attn_shapes_specs()
        else:
            shapes, specs = self._mixer_shapes_specs()
        shapes.update(
            input_norm=jax.ShapeDtypeStruct((h,), dt),
            pre_ff_norm=jax.ShapeDtypeStruct((h,), dt),
            shared_in=jax.ShapeDtypeStruct((h, 2 * self.shared_inter), dt),
            shared_out=jax.ShapeDtypeStruct((self.shared_inter, h), dt),
        )
        specs.update(
            input_norm=P(None),
            pre_ff_norm=P(None),
            shared_in=P(None, "model"),
            shared_out=P("model", None),
        )
        if self.num_experts > 0:
            shapes.update(moe_shapes(h, self.moe_inter, self.num_experts, dt))
            specs.update(moe_specs())
        return shapes, specs

    def weight_rules(self) -> List[WeightRule]:
        pre = self.hf_prefix
        rules = [
            WeightRule(("embed",), [f"{pre}.embed_tokens.weight"], kind="embed"),
            WeightRule(("final_norm",), [f"{pre}.norm.weight"], kind="norm"),
        ]
        if not self.config.tie_word_embeddings:
            rules.append(
                WeightRule(("lm_head",), ["lm_head.weight"], kind="lm_head")
            )
        for i in range(self.num_layers):
            lp = f"{pre}.layers.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(L + ("input_norm",), [f"{lp}.input_layernorm.weight"], kind="norm"),
                WeightRule(L + ("pre_ff_norm",), [f"{lp}.post_attention_layernorm.weight"], kind="norm"),
                WeightRule(L + ("shared_in",), [f"{lp}.shared_mlp.input_linear.weight"], kind="linear_raw"),
                WeightRule(L + ("shared_out",), [f"{lp}.shared_mlp.output_linear.weight"], kind="linear_raw"),
            ]
            if self.num_experts > 0:
                rules += [
                    WeightRule(L + ("router",), [f"{lp}.block_sparse_moe.router.layer.weight"], kind="router"),
                    WeightRule(L + ("w1",), [f"{lp}.block_sparse_moe.input_linear.weight"], kind="raw", transform=_t12),
                    WeightRule(L + ("w2",), [f"{lp}.block_sparse_moe.output_linear.weight"], kind="raw", transform=_t12),
                ]
            if self.layer_types[i] == "attention":
                rules += [
                    WeightRule(L + ("q",), [f"{lp}.self_attn.q_proj.weight"], kind="linear", method_key="qkv"),
                    WeightRule(L + ("k",), [f"{lp}.self_attn.k_proj.weight"], kind="linear", method_key="qkv"),
                    WeightRule(L + ("v",), [f"{lp}.self_attn.v_proj.weight"], kind="linear", method_key="qkv"),
                    WeightRule(L + ("o",), [f"{lp}.self_attn.o_proj.weight"], kind="linear", method_key="o"),
                ]
            else:
                rules += self._mixer_rules(f"{lp}.mamba", L)
        return rules

    def _attn_layer(self, lp, normed, kv_layer, fb, attn_backend):
        t = normed.shape[0]
        hd, qh, kvh = self.head_dim, self.num_q_heads, self.num_kv_heads
        q = self.methods["qkv"].apply(lp["q"], normed).reshape(t, qh, hd)
        k = self.methods["qkv"].apply(lp["k"], normed).reshape(t, kvh, hd)
        v = self.methods["qkv"].apply(lp["v"], normed).reshape(t, kvh, hd)
        if self.use_rope:
            q = apply_rope(q, fb.positions, self.inv_freq)
            k = apply_rope(k, fb.positions, self.inv_freq)
        attn_out, kv_new = attn_backend(q, k, v, kv_layer, fb, self.sm_scale)
        out = self.methods["o"].apply(lp["o"], attn_out.reshape(t, -1))
        return out, kv_new

    def _mlp(self, lp, x):
        gate_up = jnp.dot(
            x, lp["shared_in"], preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = jnp.dot(
            silu_and_mul(gate_up), lp["shared_out"],
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if "router" in lp:
            out = out + fused_moe(
                x, lp["router"], lp["w1"], lp["w2"],
                top_k=self.top_k, norm_topk_prob=True,
            )
        return out

    def forward(self, params, kv_layers, fb: ForwardBatch, attn_backend):
        c = self.config
        assert fb.state_slots is not None
        h = self.embed_tokens(params, fb) * jnp.asarray(
            self.embedding_multiplier, c.dtype
        )
        rm = jnp.asarray(self.residual_multiplier, c.dtype)
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            normed = rms_norm(h, lp["input_norm"], c.rms_norm_eps)
            if self.layer_types[i] == "attention":
                out, kv_i = self._attn_layer(
                    lp, normed, kv_layers[i], fb, attn_backend
                )
            else:
                out, kv_i = self.mamba_mixer(lp, normed, kv_layers[i], fb)
            h = h + out * rm
            normed = rms_norm(h, lp["pre_ff_norm"], c.rms_norm_eps)
            h = h + self._mlp(lp, normed) * rm
            new_kv.append(kv_i)
        h = rms_norm(h, params["final_norm"], c.rms_norm_eps)
        return h, new_kv

    def compute_logits(self, params, hidden, lora_ids=None):
        return super().compute_logits(params, hidden) / self.logits_scaling
