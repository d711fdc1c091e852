"""GPT-OSS (OpenAI open-weight MoE).

Parity with reference `python/sglang/srt/models/gpt_oss.py`: attention
sinks (extra per-head softmax slot — native in our ragged attention
kernel), alternating sliding-window/full layers, biased qkv/o, YaRN rope
with attention scaling, and an all-expert-biased MoE with the clamped
SwiGLU variant (alpha=1.702, limit=7, interleaved gate/up) routed by
softmax over the top-k logits.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.norms import rms_norm
from sglang_tpu.layers.rotary import (
    apply_rope,
    compute_inv_freq,
    rope_attention_scaling,
)
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM, _linear_sharding


def gptoss_glu(gate_up: jax.Array, alpha=1.702, limit=7.0) -> jax.Array:
    """Interleaved clamped SwiGLU (HF GptOssExperts)."""
    gate = gate_up[..., 0::2]
    up = gate_up[..., 1::2]
    gate = jnp.minimum(gate, limit)
    up = jnp.clip(up, -limit, limit)
    glu = gate * jax.nn.sigmoid(gate * alpha)
    return (up + 1.0) * glu


def gptoss_moe(x, router_w, router_b, w1, b1, w2, b2, top_k):
    """Sorted ragged_dot dispatch with per-expert biases; routing weights =
    softmax over the selected top-k logits (HF GptOssTopKRouter)."""
    t, h = x.shape
    e = router_w.shape[1]
    logits = (
        jnp.dot(x.astype(jnp.float32), router_w, preferred_element_type=jnp.float32)
        + router_b
    )
    top_vals, ids = jax.lax.top_k(logits, top_k)
    weights = jax.nn.softmax(top_vals, axis=-1)
    flat_expert = ids.reshape(-1).astype(jnp.int32)
    order = jnp.argsort(flat_expert)
    token_of_slot = (order // top_k).astype(jnp.int32)
    xs = x[token_of_slot]
    sorted_expert = flat_expert[order]
    group_sizes = jnp.bincount(flat_expert, length=e)
    h1 = jax.lax.ragged_dot(
        xs, w1, group_sizes, preferred_element_type=jnp.float32
    )
    h1 = h1 + b1[sorted_expert]
    a = gptoss_glu(h1).astype(x.dtype)
    h2 = jax.lax.ragged_dot(
        a, w2, group_sizes, preferred_element_type=jnp.float32
    )
    h2 = h2 + b2[sorted_expert]
    w_sorted = weights.reshape(-1)[order]
    out = jnp.zeros((t, h), dtype=jnp.float32)
    out = out.at[token_of_slot].add(h2 * w_sorted[:, None])
    return out.astype(x.dtype)


class GptOssForCausalLM(LlamaForCausalLM):
    architectures = ["GptOssForCausalLM"]
    qkv_bias = True
    o_bias = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.num_experts = hf["num_local_experts"]
        self.top_k = hf["num_experts_per_tok"]
        self.moe_inter = config.intermediate_size
        layer_types = hf.get("layer_types") or [
            "sliding_attention" if i % 2 == 0 else "full_attention"
            for i in range(self.num_layers)
        ]
        sw = hf.get("sliding_window") or 128
        self.layer_windows = [
            sw if lt == "sliding_attention" else -1 for lt in layer_types
        ]
        self.rope_mscale = rope_attention_scaling(config.rope_scaling)

    def _layer_specs(self) -> Tuple[dict, dict]:
        c = self.config
        dt = c.dtype
        h = self.hidden_size
        e, inter = self.num_experts, self.moe_inter
        shapes = {
            "input_norm": jax.ShapeDtypeStruct((h,), dt),
            "post_norm": jax.ShapeDtypeStruct((h,), dt),
            "qkv": self.methods["qkv"].weight_shapes(
                h, self.q_size + 2 * self.kv_size, dt
            ),
            "o": self.methods["o"].weight_shapes(self.q_size, h, dt),
            "sinks": jax.ShapeDtypeStruct((self.num_q_heads,), jnp.float32),
            "router_w": jax.ShapeDtypeStruct((h, e), jnp.float32),
            "router_b": jax.ShapeDtypeStruct((e,), jnp.float32),
            "w1": jax.ShapeDtypeStruct((e, h, 2 * inter), dt),
            "b1": jax.ShapeDtypeStruct((e, 2 * inter), jnp.float32),
            "w2": jax.ShapeDtypeStruct((e, inter, h), dt),
            "b2": jax.ShapeDtypeStruct((e, h), jnp.float32),
        }
        specs = {
            "input_norm": P(None),
            "post_norm": P(None),
            "qkv": _linear_sharding(self.methods["qkv"], col_parallel=True),
            "o": _linear_sharding(self.methods["o"], col_parallel=False),
            "sinks": P(None),
            "router_w": P(None, None),
            "router_b": P(None),
            "w1": P(None, None, "model"),
            "b1": P(None, "model"),
            "w2": P(None, "model", None),
            "b2": P(None, None),
        }
        return shapes, specs

    def weight_rules(self) -> List[WeightRule]:
        pre = self.hf_prefix
        rules = [
            WeightRule(("embed",), [f"{pre}.embed_tokens.weight"], kind="embed"),
            WeightRule(("final_norm",), [f"{pre}.norm.weight"], kind="norm"),
        ]
        if not self.config.tie_word_embeddings:
            rules.append(WeightRule(("lm_head",), ["lm_head.weight"], kind="lm_head"))
        for i in range(self.num_layers):
            lp = f"{pre}.layers.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(L + ("input_norm",), [f"{lp}.input_layernorm.weight"], kind="norm"),
                WeightRule(L + ("post_norm",), [f"{lp}.post_attention_layernorm.weight"], kind="norm"),
                WeightRule(
                    L + ("qkv",),
                    [
                        f"{lp}.self_attn.q_proj.weight",
                        f"{lp}.self_attn.k_proj.weight",
                        f"{lp}.self_attn.v_proj.weight",
                    ],
                    kind="linear",
                    method_key="qkv",
                ),
                WeightRule(
                    L + ("qkv", "b"),
                    [
                        f"{lp}.self_attn.q_proj.bias",
                        f"{lp}.self_attn.k_proj.bias",
                        f"{lp}.self_attn.v_proj.bias",
                    ],
                    kind="linear_bias",
                ),
                WeightRule(L + ("o",), [f"{lp}.self_attn.o_proj.weight"], kind="linear", method_key="o"),
                WeightRule(L + ("o", "b"), [f"{lp}.self_attn.o_proj.bias"], kind="linear_bias"),
                WeightRule(L + ("sinks",), [f"{lp}.self_attn.sinks"], kind="raw"),
                WeightRule(L + ("router_w",), [f"{lp}.mlp.router.weight"], kind="router"),
                WeightRule(L + ("router_b",), [f"{lp}.mlp.router.bias"], kind="raw"),
                WeightRule(L + ("w1",), [f"{lp}.mlp.experts.gate_up_proj"], kind="raw"),
                WeightRule(L + ("b1",), [f"{lp}.mlp.experts.gate_up_proj_bias"], kind="raw"),
                WeightRule(L + ("w2",), [f"{lp}.mlp.experts.down_proj"], kind="raw"),
                WeightRule(L + ("b2",), [f"{lp}.mlp.experts.down_proj_bias"], kind="raw"),
            ]
        return rules

    def forward(self, params, kv_layers, fb, attn_backend):
        c = self.config
        t = fb.input_ids.shape[0]
        h = params["embed"][fb.input_ids]
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            normed = rms_norm(h, lp["input_norm"], c.rms_norm_eps)
            qkv = self.methods["qkv"].apply(lp["qkv"], normed)
            q = qkv[:, : self.q_size].reshape(t, self.num_q_heads, self.head_dim)
            k = qkv[:, self.q_size : self.q_size + self.kv_size].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            v = qkv[:, self.q_size + self.kv_size :].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            q = apply_rope(q, fb.positions, self.inv_freq, mscale=self.rope_mscale)
            k = apply_rope(k, fb.positions, self.inv_freq, mscale=self.rope_mscale)
            attn_out, kv_i = attn_backend(
                q,
                k,
                v,
                kv_layers[i],
                fb,
                self.sm_scale,
                sliding_window=self.layer_windows[i],
                sinks=lp["sinks"],
            )
            new_kv.append(kv_i)
            attn_out = attn_out.reshape(t, self.q_size)
            h = h + self.methods["o"].apply(lp["o"], attn_out)
            normed = rms_norm(h, lp["post_norm"], c.rms_norm_eps)
            h = h + gptoss_moe(
                normed,
                lp["router_w"],
                lp["router_b"],
                lp["w1"],
                lp["b1"],
                lp["w2"],
                lp["b2"],
                self.top_k,
            )
        h = rms_norm(h, params["final_norm"], c.rms_norm_eps)
        return h, new_kv
