"""Persimmon (Adept) decoder.

Parity with reference `srt/models/persimmon.py` / HF
`modeling_persimmon.py`: LayerNorm+bias everywhere, fused per-head-
interleaved query_key_value with per-head Q/K LayerNorm
(`qk_layernorm`), partial rotary (0.5), and a biased relu^2 MLP."""

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
from sglang_tpu.models.gpt_neox import deinterleave_qkv
from sglang_tpu.models.llama import LlamaForCausalLM, _linear_sharding


class PersimmonForCausalLM(LlamaForCausalLM):
    architectures = ["PersimmonForCausalLM"]

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        c = config
        hf = c.hf_config
        self.ln_eps = hf.get("layer_norm_eps", 1e-5)
        self.qk_ln = hf.get("qk_layernorm", True)
        rot_pct = hf.get("partial_rotary_factor", 0.5)
        self.rotary_dim = int(self.head_dim * rot_pct)
        self.inv_freq = jnp.asarray(
            compute_inv_freq(
                self.head_dim, c.rope_theta, c.rope_scaling,
                rotary_dim=self.rotary_dim,
            )
        )
        self.methods = {
            k: make_linear_method(c.quantization, bias=True)
            for k in ("qkv", "o", "fc1", "fc2")
        }

    def _layer_specs(self) -> Tuple[dict, dict]:
        c = self.config
        dt = c.dtype
        h, inter = self.hidden_size, c.intermediate_size
        hd = self.head_dim

        def vec(n):
            return jax.ShapeDtypeStruct((n,), dt)

        shapes = {
            "ln1_w": vec(h), "ln1_b": vec(h),
            "ln2_w": vec(h), "ln2_b": vec(h),
            "qkv": self.methods["qkv"].weight_shapes(h, 3 * self.q_size, dt),
            "o": self.methods["o"].weight_shapes(self.q_size, h, dt),
            "fc1": self.methods["fc1"].weight_shapes(h, inter, dt),
            "fc2": self.methods["fc2"].weight_shapes(inter, h, dt),
        }
        specs = {
            "ln1_w": P(None), "ln1_b": P(None),
            "ln2_w": P(None), "ln2_b": P(None),
            "qkv": _linear_sharding(self.methods["qkv"], col_parallel=True),
            "o": _linear_sharding(self.methods["o"], col_parallel=False),
            "fc1": _linear_sharding(self.methods["fc1"], col_parallel=True),
            "fc2": _linear_sharding(self.methods["fc2"], col_parallel=False),
        }
        if self.qk_ln:
            for n in ("q_ln_w", "q_ln_b", "k_ln_w", "k_ln_b"):
                shapes[n] = vec(hd)
                specs[n] = P(None)
        return shapes, specs

    def param_specs(self) -> dict:
        c = self.config
        dt = c.dtype
        shapes, _ = self._layer_specs()
        h = self.hidden_size
        return {
            "embed": jax.ShapeDtypeStruct((c.vocab_size, h), dt),
            "layers": [dict(shapes) for _ in range(self.num_layers)],
            "final_norm": jax.ShapeDtypeStruct((h,), dt),
            "final_norm_b": jax.ShapeDtypeStruct((h,), dt),
            "lm_head": jax.ShapeDtypeStruct((h, c.vocab_size), dt),
        }

    def param_shardings(self) -> dict:
        _, specs = self._layer_specs()
        return {
            "embed": P(None, "model"),
            "layers": [dict(specs) for _ in range(self.num_layers)],
            "final_norm": P(None),
            "final_norm_b": P(None),
            "lm_head": P(None, "model"),
        }

    def weight_rules(self) -> List[WeightRule]:
        pre = self.hf_prefix
        tr = deinterleave_qkv(self.num_q_heads, self.head_dim)
        rules = [
            WeightRule(("embed",), [f"{pre}.embed_tokens.weight"], kind="embed"),
            WeightRule(("final_norm",), [f"{pre}.final_layernorm.weight"], kind="norm"),
            WeightRule(("final_norm_b",), [f"{pre}.final_layernorm.bias"], kind="norm"),
            WeightRule(("lm_head",), ["lm_head.weight"], kind="lm_head"),
        ]
        for i in range(self.num_layers):
            lp = f"{pre}.layers.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(L + ("ln1_w",), [f"{lp}.input_layernorm.weight"], kind="norm"),
                WeightRule(L + ("ln1_b",), [f"{lp}.input_layernorm.bias"], kind="norm"),
                WeightRule(L + ("ln2_w",), [f"{lp}.post_attention_layernorm.weight"], kind="norm"),
                WeightRule(L + ("ln2_b",), [f"{lp}.post_attention_layernorm.bias"], kind="norm"),
                WeightRule(L + ("qkv",), [f"{lp}.self_attn.query_key_value.weight"],
                           kind="linear", method_key="qkv", transform=tr),
                WeightRule(L + ("qkv", "b"), [f"{lp}.self_attn.query_key_value.bias"],
                           kind="linear_bias", transform=tr),
                WeightRule(L + ("o",), [f"{lp}.self_attn.dense.weight"],
                           kind="linear", method_key="o"),
                WeightRule(L + ("o", "b"), [f"{lp}.self_attn.dense.bias"],
                           kind="linear_bias"),
                WeightRule(L + ("fc1",), [f"{lp}.mlp.dense_h_to_4h.weight"],
                           kind="linear", method_key="fc1"),
                WeightRule(L + ("fc1", "b"), [f"{lp}.mlp.dense_h_to_4h.bias"],
                           kind="linear_bias"),
                WeightRule(L + ("fc2",), [f"{lp}.mlp.dense_4h_to_h.weight"],
                           kind="linear", method_key="fc2"),
                WeightRule(L + ("fc2", "b"), [f"{lp}.mlp.dense_4h_to_h.bias"],
                           kind="linear_bias"),
            ]
            if self.qk_ln:
                rules += [
                    WeightRule(L + ("q_ln_w",), [f"{lp}.self_attn.q_layernorm.weight"], kind="norm"),
                    WeightRule(L + ("q_ln_b",), [f"{lp}.self_attn.q_layernorm.bias"], kind="norm"),
                    WeightRule(L + ("k_ln_w",), [f"{lp}.self_attn.k_layernorm.weight"], kind="norm"),
                    WeightRule(L + ("k_ln_b",), [f"{lp}.self_attn.k_layernorm.bias"], kind="norm"),
                ]
        return rules

    def compute_logits(self, params, hidden):
        return jnp.dot(
            hidden, params["lm_head"], preferred_element_type=jnp.float32
        )

    def forward(self, params, kv_layers, fb, attn_backend):
        t = fb.input_ids.shape[0]
        h = params["embed"][fb.input_ids]
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            a = layer_norm(h, lp["ln1_w"], lp["ln1_b"], self.ln_eps)
            qkv = self.methods["qkv"].apply(lp["qkv"], a)
            q = qkv[:, : self.q_size].reshape(t, self.num_q_heads, self.head_dim)
            k = qkv[:, self.q_size : 2 * self.q_size].reshape(
                t, self.num_q_heads, self.head_dim
            )
            v = qkv[:, 2 * self.q_size :].reshape(
                t, self.num_q_heads, self.head_dim
            )
            if self.qk_ln:
                q = layer_norm(q, lp["q_ln_w"], lp["q_ln_b"], self.ln_eps)
                k = layer_norm(k, lp["k_ln_w"], lp["k_ln_b"], self.ln_eps)
            q = apply_rope(q, fb.positions, self.inv_freq)
            k = apply_rope(k, fb.positions, self.inv_freq)
            attn_out, kv_i = attn_backend(
                q, k, v, kv_layers[i], fb, self.sm_scale
            )
            h = h + self.methods["o"].apply(
                lp["o"], attn_out.reshape(t, self.q_size)
            )
            m = layer_norm(h, lp["ln2_w"], lp["ln2_b"], self.ln_eps)
            act = jnp.square(
                jax.nn.relu(self.methods["fc1"].apply(lp["fc1"], m))
            )
            h = h + self.methods["fc2"].apply(lp["fc2"], act)
            new_kv.append(kv_i)
        h = layer_norm(
            h, params["final_norm"], params["final_norm_b"], self.ln_eps
        )
        return h, new_kv
