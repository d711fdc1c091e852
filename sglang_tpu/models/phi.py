"""Phi-1 / Phi-1.5 / Phi-2 decoder.

Parity with reference `srt/models/phi.py` (vLLM-lineage PhiForCausalLM):
PARALLEL residual (attention and MLP both read the same LayerNormed input),
partial rotary embeddings (`partial_rotary_factor`), biased linears
including a biased untied lm_head, and an un-gated gelu_new MLP (fc1/fc2).
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
from sglang_tpu.models.llama import LlamaForCausalLM, _linear_sharding


class PhiForCausalLM(LlamaForCausalLM):
    architectures = ["PhiForCausalLM"]

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        c = config
        hf = c.hf_config
        self.ln_eps = hf.get("layer_norm_eps", 1e-5)
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
        h = self.hidden_size
        shapes = {
            "ln_w": jax.ShapeDtypeStruct((h,), dt),
            "ln_b": jax.ShapeDtypeStruct((h,), dt),
            "qkv": self.methods["qkv"].weight_shapes(
                h, self.q_size + 2 * self.kv_size, dt
            ),
            "o": self.methods["o"].weight_shapes(self.q_size, h, dt),
            "fc1": self.methods["fc1"].weight_shapes(h, c.intermediate_size, dt),
            "fc2": self.methods["fc2"].weight_shapes(c.intermediate_size, h, dt),
        }
        specs = {
            "ln_w": P(None),
            "ln_b": P(None),
            "qkv": _linear_sharding(self.methods["qkv"], col_parallel=True),
            "o": _linear_sharding(self.methods["o"], col_parallel=False),
            "fc1": _linear_sharding(self.methods["fc1"], col_parallel=True),
            "fc2": _linear_sharding(self.methods["fc2"], col_parallel=False),
        }
        return shapes, specs

    def param_specs(self) -> dict:
        c = self.config
        dt = c.dtype
        layer_shapes, _ = self._layer_specs()
        return {
            "embed": jax.ShapeDtypeStruct((c.vocab_size, c.hidden_size), dt),
            "layers": [dict(layer_shapes) for _ in range(self.num_layers)],
            "lnf_w": jax.ShapeDtypeStruct((c.hidden_size,), dt),
            "lnf_b": jax.ShapeDtypeStruct((c.hidden_size,), dt),
            "lm_head": jax.ShapeDtypeStruct((c.hidden_size, c.vocab_size), dt),
            "lm_head_b": jax.ShapeDtypeStruct((c.vocab_size,), dt),
        }

    def param_shardings(self) -> dict:
        _, layer_specs = self._layer_specs()
        return {
            "embed": P(None, "model"),
            "layers": [dict(layer_specs) for _ in range(self.num_layers)],
            "lnf_w": P(None),
            "lnf_b": P(None),
            "lm_head": P(None, "model"),
            "lm_head_b": P("model"),
        }

    def weight_rules(self) -> List[WeightRule]:
        pre = self.hf_prefix
        rules = [
            WeightRule(("embed",), [f"{pre}.embed_tokens.weight"], kind="embed"),
            WeightRule(("lnf_w",), [f"{pre}.final_layernorm.weight"], kind="norm"),
            WeightRule(("lnf_b",), [f"{pre}.final_layernorm.bias"], kind="norm"),
            WeightRule(("lm_head",), ["lm_head.weight"], kind="lm_head"),
            WeightRule(("lm_head_b",), ["lm_head.bias"], kind="raw"),
        ]
        for i in range(self.num_layers):
            lp = f"{pre}.layers.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(L + ("ln_w",), [f"{lp}.input_layernorm.weight"], kind="norm"),
                WeightRule(L + ("ln_b",), [f"{lp}.input_layernorm.bias"], kind="norm"),
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
                WeightRule(
                    L + ("o",), [f"{lp}.self_attn.dense.weight"],
                    kind="linear", method_key="o",
                ),
                WeightRule(
                    L + ("o", "b"), [f"{lp}.self_attn.dense.bias"],
                    kind="linear_bias",
                ),
                WeightRule(
                    L + ("fc1",), [f"{lp}.mlp.fc1.weight"],
                    kind="linear", method_key="fc1",
                ),
                WeightRule(
                    L + ("fc1", "b"), [f"{lp}.mlp.fc1.bias"], kind="linear_bias"
                ),
                WeightRule(
                    L + ("fc2",), [f"{lp}.mlp.fc2.weight"],
                    kind="linear", method_key="fc2",
                ),
                WeightRule(
                    L + ("fc2", "b"), [f"{lp}.mlp.fc2.bias"], kind="linear_bias"
                ),
            ]
        return rules

    def forward(self, params, kv_layers, fb, attn_backend):
        t = fb.input_ids.shape[0]
        h = self.embed_tokens(params, fb)
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            normed = layer_norm(h, lp["ln_w"], lp["ln_b"], self.ln_eps)
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
            o_out = self.methods["o"].apply(
                lp["o"], attn_out.reshape(t, self.q_size)
            )
            fc = self.methods["fc1"].apply(lp["fc1"], normed)
            fc = jax.nn.gelu(fc.astype(jnp.float32), approximate=True).astype(
                h.dtype
            )
            mlp_out = self.methods["fc2"].apply(lp["fc2"], fc)
            h = h + o_out + mlp_out  # parallel block
        h = layer_norm(h, params["lnf_w"], params["lnf_b"], self.ln_eps)
        return h, new_kv

    def compute_logits(self, params, hidden):
        return (
            jnp.dot(hidden, params["lm_head"], preferred_element_type=jnp.float32)
            + params["lm_head_b"].astype(jnp.float32)
        )
