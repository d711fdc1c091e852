"""GPT-2 and GPTBigCode (StarCoder v1 / SantaCoder) decoders.

Parity with reference `srt/models/gpt2.py` and `srt/models/gpt_bigcode.py`:
learned absolute position embeddings (wpe), classic LayerNorm with bias,
biased linears, un-gated GELU MLP, tied lm_head. GPT-2 stores its linear
weights in Conv1D [in, out] layout (kind="linear_nt"); BigCode uses normal
nn.Linear [out, in] plus multi-query attention (one KV head).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.linear import make_linear_method
from sglang_tpu.layers.norms import layer_norm
from sglang_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM, _linear_sharding


class GPT2LMHeadModel(LlamaForCausalLM):
    architectures = ["GPT2LMHeadModel"]
    hf_prefix = "transformer"
    weight_kind = "linear_nt"  # Conv1D stores [in, out]

    def __init__(self, config: ModelConfig):
        config.tie_word_embeddings = True
        super().__init__(config)
        c = config
        self.ln_eps = c.hf_config.get("layer_norm_epsilon", 1e-5)
        # every linear carries a bias
        self.methods = {
            k: make_linear_method(c.quantization, bias=True)
            for k in ("qkv", "o", "fc1", "fc2")
        }

    # ----------------------------------------------------------- specs
    def _layer_specs(self) -> Tuple[dict, dict]:
        c = self.config
        dt = c.dtype
        h = self.hidden_size
        inter = c.intermediate_size
        shapes = {
            "ln1_w": jax.ShapeDtypeStruct((h,), dt),
            "ln1_b": jax.ShapeDtypeStruct((h,), dt),
            "ln2_w": jax.ShapeDtypeStruct((h,), dt),
            "ln2_b": jax.ShapeDtypeStruct((h,), dt),
            "qkv": self.methods["qkv"].weight_shapes(
                h, self.q_size + 2 * self.kv_size, dt
            ),
            "o": self.methods["o"].weight_shapes(self.q_size, h, dt),
            "fc1": self.methods["fc1"].weight_shapes(h, inter, dt),
            "fc2": self.methods["fc2"].weight_shapes(inter, h, dt),
        }
        specs = {
            "ln1_w": P(None),
            "ln1_b": P(None),
            "ln2_w": P(None),
            "ln2_b": P(None),
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
            "wpe": jax.ShapeDtypeStruct(
                (c.max_position_embeddings, c.hidden_size), dt
            ),
            "layers": [dict(layer_shapes) for _ in range(self.num_layers)],
            "lnf_w": jax.ShapeDtypeStruct((c.hidden_size,), dt),
            "lnf_b": jax.ShapeDtypeStruct((c.hidden_size,), dt),
        }

    def param_shardings(self) -> dict:
        _, layer_specs = self._layer_specs()
        return {
            "embed": P(None, "model"),
            "wpe": P(None, None),
            "layers": [dict(layer_specs) for _ in range(self.num_layers)],
            "lnf_w": P(None),
            "lnf_b": P(None),
        }

    # --------------------------------------------------------- loading
    def weight_rules(self) -> List[WeightRule]:
        pre = self.hf_prefix
        wk = self.weight_kind
        rules = [
            WeightRule(("embed",), [f"{pre}.wte.weight"], kind="embed"),
            WeightRule(("wpe",), [f"{pre}.wpe.weight"], kind="raw"),
            WeightRule(("lnf_w",), [f"{pre}.ln_f.weight"], kind="norm"),
            WeightRule(("lnf_b",), [f"{pre}.ln_f.bias"], kind="norm"),
        ]
        for i in range(self.num_layers):
            lp = f"{pre}.h.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(L + ("ln1_w",), [f"{lp}.ln_1.weight"], kind="norm"),
                WeightRule(L + ("ln1_b",), [f"{lp}.ln_1.bias"], kind="norm"),
                WeightRule(L + ("ln2_w",), [f"{lp}.ln_2.weight"], kind="norm"),
                WeightRule(L + ("ln2_b",), [f"{lp}.ln_2.bias"], kind="norm"),
                WeightRule(
                    L + ("qkv",), [f"{lp}.attn.c_attn.weight"], kind=wk,
                    method_key="qkv",
                ),
                WeightRule(
                    L + ("qkv", "b"), [f"{lp}.attn.c_attn.bias"],
                    kind="linear_bias",
                ),
                WeightRule(
                    L + ("o",), [f"{lp}.attn.c_proj.weight"], kind=wk,
                    method_key="o",
                ),
                WeightRule(
                    L + ("o", "b"), [f"{lp}.attn.c_proj.bias"],
                    kind="linear_bias",
                ),
                WeightRule(
                    L + ("fc1",), [f"{lp}.mlp.c_fc.weight"], kind=wk,
                    method_key="fc1",
                ),
                WeightRule(
                    L + ("fc1", "b"), [f"{lp}.mlp.c_fc.bias"],
                    kind="linear_bias",
                ),
                WeightRule(
                    L + ("fc2",), [f"{lp}.mlp.c_proj.weight"], kind=wk,
                    method_key="fc2",
                ),
                WeightRule(
                    L + ("fc2", "b"), [f"{lp}.mlp.c_proj.bias"],
                    kind="linear_bias",
                ),
            ]
        return rules

    # --------------------------------------------------------- forward
    def mlp_forward(self, lp, x, lora=None, lora_ids=None):
        h = self.methods["fc1"].apply(lp["fc1"], x)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
        return self.methods["fc2"].apply(lp["fc2"], h)

    def forward(self, params, kv_layers, fb: ForwardBatch, attn_backend):
        t = fb.input_ids.shape[0]
        h = self.embed_tokens(params, fb) + params["wpe"][fb.positions]
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            normed = layer_norm(h, lp["ln1_w"], lp["ln1_b"], self.ln_eps)
            qkv = self.methods["qkv"].apply(lp["qkv"], normed)
            q = qkv[:, : self.q_size].reshape(t, self.num_q_heads, self.head_dim)
            k = qkv[:, self.q_size : self.q_size + self.kv_size].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            v = qkv[:, self.q_size + self.kv_size :].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            attn_out, kv_i = attn_backend(q, k, v, kv_layers[i], fb, self.sm_scale)
            new_kv.append(kv_i)
            h = h + self.methods["o"].apply(
                lp["o"], attn_out.reshape(t, self.q_size)
            )
            normed = layer_norm(h, lp["ln2_w"], lp["ln2_b"], self.ln_eps)
            h = h + self.mlp_forward(lp, normed)
        h = layer_norm(h, params["lnf_w"], params["lnf_b"], self.ln_eps)
        return h, new_kv

    def compute_logits(self, params, hidden):
        return jnp.dot(
            hidden, params["embed"].T, preferred_element_type=jnp.float32
        )


class GPTBigCodeForCausalLM(GPT2LMHeadModel):
    """StarCoder v1 / SantaCoder: GPT-2 skeleton + nn.Linear weights
    ([out, in]) + multi-query attention (reference
    `srt/models/gpt_bigcode.py`)."""

    architectures = ["GPTBigCodeForCausalLM"]
    weight_kind = "linear"  # nn.Linear [out, in]
