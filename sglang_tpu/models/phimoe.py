"""Phi-3.5-MoE (Phimoe) decoder.

Parity with reference `srt/models/phimoe.py` / HF `modeling_phimoe.py`:
mixtral-shaped sparse MoE on a LayerNorm (not RMS) llama skeleton with
configurable attention/lm_head biases and longrope scaling. Routing is
SPARSEMIXER (arXiv 2409.12136) at inference: pick argmax, weight it by
a softmax over gates within a relative `router_jitter_noise` band of
the max, mask the pick, repeat for the second expert — NOT plain top-2
softmax."""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.linear import make_linear_method
from sglang_tpu.layers.moe import moe_dispatch, moe_shapes, moe_specs
from sglang_tpu.layers.norms import layer_norm
from sglang_tpu.layers.rotary import apply_rope
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM

NEG = -1e30


def sparsemixer_route(
    logits: jax.Array, jitter_eps: float
) -> Tuple[jax.Array, jax.Array]:
    """Inference-time sparsemixer: returns (weights [T, 2], ids [T, 2]).
    Expert i's weight is the softmax (over gates within the
    2*jitter_eps relative band of the running max, everything else
    -inf) evaluated at the argmax; the first pick is masked out before
    the second round (HF `sparsemixer`, training branches dropped)."""
    def pick(scores):
        mx = jnp.max(scores, axis=-1, keepdims=True)
        idx = jnp.argmax(scores, axis=-1)
        factor = jnp.maximum(jnp.abs(scores), mx)
        keep = ((mx - scores) / factor) <= (2 * jitter_eps)
        masked = jnp.where(keep, scores, -jnp.inf)
        probs = jax.nn.softmax(masked, axis=-1)
        w = jnp.take_along_axis(probs, idx[:, None], axis=-1)[:, 0]
        return w, idx

    w1, i1 = pick(logits)
    masked2 = logits.at[jnp.arange(logits.shape[0]), i1].set(-jnp.inf)
    w2, i2 = pick(masked2)
    return (
        jnp.stack([w1, w2], axis=-1),
        jnp.stack([i1, i2], axis=-1).astype(jnp.int32),
    )


class PhimoeForCausalLM(LlamaForCausalLM):
    architectures = ["PhimoeForCausalLM"]
    supports_chain_tail = False

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        self.qkv_bias = bool(hf.get("attention_bias", False))
        super().__init__(config)
        self.ln_eps = float(hf.get("rms_norm_eps", 1e-5))
        self.num_experts = int(hf.get("num_local_experts", 16))
        self.top_k = int(hf.get("num_experts_per_tok", 2))
        self.moe_inter = int(
            hf.get("moe_intermediate_size") or config.intermediate_size
        )
        self.jitter = float(hf.get("router_jitter_noise", 0.01))
        self.lm_head_bias = bool(hf.get("lm_head_bias", False))
        # o_proj and lm_head biases follow attention_bias / lm_head_bias
        if self.qkv_bias:
            self.methods["o"] = make_linear_method(
                config.quantization, bias=True
            )

    # LayerNorm (with bias) replaces RMSNorm everywhere
    def _layer_specs(self) -> Tuple[dict, dict]:
        shapes, specs = super()._layer_specs()
        dt = self.config.dtype
        h = self.hidden_size
        for key in ("input_norm", "post_norm"):
            shapes[key + "_b"] = jax.ShapeDtypeStruct((h,), dt)
            specs[key + "_b"] = P(None)
        return shapes, specs

    def mlp_shapes(self):
        return moe_shapes(
            self.hidden_size, self.moe_inter, self.num_experts,
            self.config.dtype,
        )

    def mlp_specs(self):
        return moe_specs()

    def param_specs(self) -> dict:
        tree = super().param_specs()
        dt = self.config.dtype
        h = self.hidden_size
        tree["final_norm_b"] = jax.ShapeDtypeStruct((h,), dt)
        if self.lm_head_bias:
            tree["lm_head_b"] = jax.ShapeDtypeStruct(
                (self.config.vocab_size,), dt
            )
        return tree

    def param_shardings(self) -> dict:
        tree = super().param_shardings()
        tree["final_norm_b"] = P(None)
        if self.lm_head_bias:
            tree["lm_head_b"] = P("model")
        return tree

    def mlp_weight_rules(self, lp: str, L: tuple) -> List[WeightRule]:
        e = self.num_experts
        return [
            WeightRule(
                L + ("router",),
                [f"{lp}.block_sparse_moe.gate.weight"],
                kind="router",
            ),
            WeightRule(
                L + ("w1",),
                [
                    f"{lp}.block_sparse_moe.experts.{i}.w{j}.weight"
                    for i in range(e)
                    for j in (1, 3)
                ],
                kind="moe_w1",
            ),
            WeightRule(
                L + ("w2",),
                [f"{lp}.block_sparse_moe.experts.{i}.w2.weight" for i in range(e)],
                kind="moe_w2",
            ),
        ]

    def weight_rules(self) -> List[WeightRule]:
        rules = list(super().weight_rules())
        pre = self.hf_prefix
        for i in range(self.num_layers):
            lp = f"{pre}.layers.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(L + ("input_norm_b",), [f"{lp}.input_layernorm.bias"], kind="norm"),
                WeightRule(L + ("post_norm_b",), [f"{lp}.post_attention_layernorm.bias"], kind="norm"),
            ]
            if self.qkv_bias:
                rules.append(
                    WeightRule(L + ("o", "b"), [f"{lp}.self_attn.o_proj.bias"], kind="linear_bias")
                )
        rules.append(
            WeightRule(("final_norm_b",), [f"{pre}.norm.bias"], kind="norm")
        )
        if self.lm_head_bias:
            rules.append(
                WeightRule(("lm_head_b",), ["lm_head.bias"], kind="norm")
            )
        return rules

    def compute_logits(self, params, hidden, lora_ids=None):
        logits = super().compute_logits(params, hidden)
        if "lm_head_b" in params:
            logits = logits + params["lm_head_b"].astype(jnp.float32)
        return logits

    def forward(self, params, kv_layers, fb, attn_backend):
        t = fb.input_ids.shape[0]
        h = self.embed_tokens(params, fb)
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            a = layer_norm(
                h, lp["input_norm"], lp["input_norm_b"], self.ln_eps
            )
            qkv = self.methods["qkv"].apply(lp["qkv"], a)
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
            a = layer_norm(h, lp["post_norm"], lp["post_norm_b"], self.ln_eps)
            logits = jnp.dot(
                a.astype(jnp.float32), lp["router"],
                preferred_element_type=jnp.float32,
            )
            weights, ids = sparsemixer_route(logits, self.jitter)
            h = h + moe_dispatch(
                a, lp["w1"], lp["w2"], weights, ids,
                num_experts=self.num_experts,
            )
        h = layer_norm(
            h, params["final_norm"], params["final_norm_b"], self.ln_eps
        )
        return h, new_kv
