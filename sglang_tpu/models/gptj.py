"""GPT-J decoder.

Parity with reference `srt/models/gptj.py` / HF `modeling_gptj.py`:
single-LayerNorm PARALLEL residual (h = h + attn(ln(h)) + mlp(ln(h))),
bias-free q/k/v/out, INTERLEAVED rotary over the first `rotary_dim`
lanes, gelu-tanh MLP with biases, and a BIASED lm_head."""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.linear import make_linear_method
from sglang_tpu.layers.norms import layer_norm
from sglang_tpu.layers.rotary import apply_rope_interleaved, compute_inv_freq
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM, _linear_sharding


class GPTJForCausalLM(LlamaForCausalLM):
    architectures = ["GPTJForCausalLM"]
    hf_prefix = "transformer"

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.ln_eps = hf.get("layer_norm_epsilon", 1e-5)
        self.rotary_dim = hf.get("rotary_dim") or self.head_dim
        self.inv_freq = jnp.asarray(
            compute_inv_freq(
                self.head_dim, config.rope_theta, config.rope_scaling,
                rotary_dim=self.rotary_dim,
            )
        )
        self.methods = {
            "qkv": make_linear_method(config.quantization, bias=False),
            "o": make_linear_method(config.quantization, bias=False),
            "fc1": make_linear_method(config.quantization, bias=True),
            "fc2": make_linear_method(config.quantization, bias=True),
        }

    def _layer_specs(self) -> Tuple[dict, dict]:
        c = self.config
        dt = c.dtype
        h = self.hidden_size
        inter = c.intermediate_size or 4 * h

        shapes = {
            "ln_w": jax.ShapeDtypeStruct((h,), dt),
            "ln_b": jax.ShapeDtypeStruct((h,), dt),
            "qkv": self.methods["qkv"].weight_shapes(h, 3 * self.q_size, dt),
            "o": self.methods["o"].weight_shapes(self.q_size, h, dt),
            "fc1": self.methods["fc1"].weight_shapes(h, inter, dt),
            "fc2": self.methods["fc2"].weight_shapes(inter, h, dt),
        }
        specs = {
            "ln_w": P(None), "ln_b": P(None),
            "qkv": _linear_sharding(self.methods["qkv"], col_parallel=True),
            "o": _linear_sharding(self.methods["o"], col_parallel=False),
            "fc1": _linear_sharding(self.methods["fc1"], col_parallel=True),
            "fc2": _linear_sharding(self.methods["fc2"], col_parallel=False),
        }
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
            "lm_head_b": jax.ShapeDtypeStruct((c.vocab_size,), dt),
        }

    def param_shardings(self) -> dict:
        _, specs = self._layer_specs()
        return {
            "embed": P(None, "model"),
            "layers": [dict(specs) for _ in range(self.num_layers)],
            "final_norm": P(None),
            "final_norm_b": P(None),
            "lm_head": P(None, "model"),
            "lm_head_b": P("model"),
        }

    def weight_rules(self) -> List[WeightRule]:
        pre = self.hf_prefix
        rules = [
            WeightRule(("embed",), [f"{pre}.wte.weight"], kind="embed"),
            WeightRule(("final_norm",), [f"{pre}.ln_f.weight"], kind="norm"),
            WeightRule(("final_norm_b",), [f"{pre}.ln_f.bias"], kind="norm"),
            WeightRule(("lm_head",), ["lm_head.weight"], kind="lm_head"),
            WeightRule(("lm_head_b",), ["lm_head.bias"], kind="norm"),
        ]
        for i in range(self.num_layers):
            lp = f"{pre}.h.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(L + ("ln_w",), [f"{lp}.ln_1.weight"], kind="norm"),
                WeightRule(L + ("ln_b",), [f"{lp}.ln_1.bias"], kind="norm"),
                WeightRule(
                    L + ("qkv",),
                    [
                        f"{lp}.attn.q_proj.weight",
                        f"{lp}.attn.k_proj.weight",
                        f"{lp}.attn.v_proj.weight",
                    ],
                    kind="linear", method_key="qkv",
                ),
                WeightRule(L + ("o",), [f"{lp}.attn.out_proj.weight"], kind="linear", method_key="o"),
                WeightRule(L + ("fc1",), [f"{lp}.mlp.fc_in.weight"], kind="linear", method_key="fc1"),
                WeightRule(L + ("fc1", "b"), [f"{lp}.mlp.fc_in.bias"], kind="linear_bias"),
                WeightRule(L + ("fc2",), [f"{lp}.mlp.fc_out.weight"], kind="linear", method_key="fc2"),
                WeightRule(L + ("fc2", "b"), [f"{lp}.mlp.fc_out.bias"], kind="linear_bias"),
            ]
        return rules

    def compute_logits(self, params, hidden, lora_ids=None):
        return (
            jnp.dot(
                hidden, params["lm_head"], preferred_element_type=jnp.float32
            )
            + params["lm_head_b"].astype(jnp.float32)
        )

    def forward(self, params, kv_layers, fb, attn_backend):
        t = fb.input_ids.shape[0]
        h = self.embed_tokens(params, fb)
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            a = layer_norm(h, lp["ln_w"], lp["ln_b"], self.ln_eps)
            qkv = self.methods["qkv"].apply(lp["qkv"], a)
            q = qkv[:, : self.q_size].reshape(t, self.num_q_heads, self.head_dim)
            k = qkv[:, self.q_size : 2 * self.q_size].reshape(
                t, self.num_q_heads, self.head_dim
            )
            v = qkv[:, 2 * self.q_size :].reshape(
                t, self.num_q_heads, self.head_dim
            )
            rot = self.rotary_dim
            q = jnp.concatenate(
                [
                    apply_rope_interleaved(
                        q[..., :rot], fb.positions, self.inv_freq
                    ),
                    q[..., rot:],
                ],
                axis=-1,
            )
            k = jnp.concatenate(
                [
                    apply_rope_interleaved(
                        k[..., :rot], fb.positions, self.inv_freq
                    ),
                    k[..., rot:],
                ],
                axis=-1,
            )
            attn_out, kv_i = attn_backend(
                q, k, v, kv_layers[i], fb, self.sm_scale
            )
            new_kv.append(kv_i)
            attn_out = self.methods["o"].apply(
                lp["o"], attn_out.reshape(t, self.q_size)
            )
            mlp = self.methods["fc2"].apply(
                lp["fc2"],
                jax.nn.gelu(
                    self.methods["fc1"].apply(lp["fc1"], a), approximate=True
                ),
            )
            h = h + attn_out + mlp  # single-LN parallel residual
        h = layer_norm(
            h, params["final_norm"], params["final_norm_b"], self.ln_eps
        )
        return h, new_kv
