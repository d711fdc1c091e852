"""OPT decoder.

Parity with reference `srt/models/opt.py` / HF `modeling_opt.py`:
learned absolute positions at offset +2, pre-LN residual blocks
(`do_layer_norm_before=True` — the 350m post-LN variant is rejected at
load), biased separate q/k/v/out projections, ReLU MLP with biases,
decoder-level final LayerNorm, tied lm_head."""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.linear import make_linear_method
from sglang_tpu.layers.norms import layer_norm
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM, _linear_sharding

POS_OFFSET = 2  # OPTLearnedPositionalEmbedding.offset


class OPTForCausalLM(LlamaForCausalLM):
    architectures = ["OPTForCausalLM"]
    hf_prefix = "model.decoder"

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        assert hf.get("do_layer_norm_before", True), (
            "OPT-350m post-LN layout is not supported"
        )
        assert hf.get("word_embed_proj_dim", config.hidden_size) == (
            config.hidden_size
        ), "word_embed_proj_dim != hidden_size (opt-350m) unsupported"
        self.ln_eps = 1e-5
        self.methods = {
            k: make_linear_method(config.quantization, bias=True)
            for k in ("qkv", "o", "fc1", "fc2")
        }

    def _layer_specs(self) -> Tuple[dict, dict]:
        c = self.config
        dt = c.dtype
        h, inter = self.hidden_size, c.intermediate_size

        def norm():
            return jax.ShapeDtypeStruct((h,), dt)

        shapes = {
            "ln1_w": norm(), "ln1_b": norm(),
            "ln2_w": norm(), "ln2_b": norm(),
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
        return shapes, specs

    def param_specs(self) -> dict:
        c = self.config
        dt = c.dtype
        shapes, _ = self._layer_specs()
        h = self.hidden_size
        return {
            "embed": jax.ShapeDtypeStruct((c.vocab_size, h), dt),
            "pos_embed": jax.ShapeDtypeStruct(
                (c.max_position_embeddings + POS_OFFSET, h), dt
            ),
            "layers": [dict(shapes) for _ in range(self.num_layers)],
            "final_norm": jax.ShapeDtypeStruct((h,), dt),
            "final_norm_b": jax.ShapeDtypeStruct((h,), dt),
        }

    def param_shardings(self) -> dict:
        _, specs = self._layer_specs()
        return {
            "embed": P(None, "model"),
            "pos_embed": P(None, None),
            "layers": [dict(specs) for _ in range(self.num_layers)],
            "final_norm": P(None),
            "final_norm_b": P(None),
        }

    def weight_rules(self) -> List[WeightRule]:
        pre = self.hf_prefix
        rules = [
            WeightRule(("embed",), [f"{pre}.embed_tokens.weight"], kind="embed"),
            WeightRule(("pos_embed",), [f"{pre}.embed_positions.weight"], kind="raw"),
            WeightRule(("final_norm",), [f"{pre}.final_layer_norm.weight"], kind="norm"),
            WeightRule(("final_norm_b",), [f"{pre}.final_layer_norm.bias"], kind="norm"),
        ]
        for i in range(self.num_layers):
            lp = f"{pre}.layers.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(L + ("ln1_w",), [f"{lp}.self_attn_layer_norm.weight"], kind="norm"),
                WeightRule(L + ("ln1_b",), [f"{lp}.self_attn_layer_norm.bias"], kind="norm"),
                WeightRule(L + ("ln2_w",), [f"{lp}.final_layer_norm.weight"], kind="norm"),
                WeightRule(L + ("ln2_b",), [f"{lp}.final_layer_norm.bias"], kind="norm"),
                WeightRule(
                    L + ("qkv",),
                    [
                        f"{lp}.self_attn.q_proj.weight",
                        f"{lp}.self_attn.k_proj.weight",
                        f"{lp}.self_attn.v_proj.weight",
                    ],
                    kind="linear", method_key="qkv",
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
                WeightRule(L + ("o",), [f"{lp}.self_attn.out_proj.weight"], kind="linear", method_key="o"),
                WeightRule(L + ("o", "b"), [f"{lp}.self_attn.out_proj.bias"], kind="linear_bias"),
                WeightRule(L + ("fc1",), [f"{lp}.fc1.weight"], kind="linear", method_key="fc1"),
                WeightRule(L + ("fc1", "b"), [f"{lp}.fc1.bias"], kind="linear_bias"),
                WeightRule(L + ("fc2",), [f"{lp}.fc2.weight"], kind="linear", method_key="fc2"),
                WeightRule(L + ("fc2", "b"), [f"{lp}.fc2.bias"], kind="linear_bias"),
            ]
        return rules

    def forward(self, params, kv_layers, fb, attn_backend):
        t = fb.input_ids.shape[0]
        h = self.embed_tokens(params, fb) + params["pos_embed"][
            fb.positions + POS_OFFSET
        ]
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
            attn_out, kv_i = attn_backend(
                q, k, v, kv_layers[i], fb, self.sm_scale
            )
            new_kv.append(kv_i)
            h = h + self.methods["o"].apply(
                lp["o"], attn_out.reshape(t, self.q_size)
            )
            m = layer_norm(h, lp["ln2_w"], lp["ln2_b"], self.ln_eps)
            m = jax.nn.relu(self.methods["fc1"].apply(lp["fc1"], m))
            h = h + self.methods["fc2"].apply(lp["fc2"], m)
        h = layer_norm(
            h, params["final_norm"], params["final_norm_b"], self.ln_eps
        )
        return h, new_kv
