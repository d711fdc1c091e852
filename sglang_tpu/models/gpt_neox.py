"""GPT-NeoX (Pythia / StableLM-alpha lineage) decoder.

Parity with reference `srt/models/gpt_neox.py` / HF `modeling_gpt_neox.py`:
LayerNorm+bias, fused per-head-interleaved query_key_value, partial
rotary (`rotary_pct`, NeoX rotate-half convention), gelu MLP, and the
PARALLEL residual (`use_parallel_residual`):
    h = h + attn(ln1(h)) + mlp(ln2(h))."""

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


def deinterleave_qkv(heads: int, head_dim: int):
    """Checkpoint fused-QKV columns ordered [head][q|k|v][dim] -> the
    engine's [q-block | k-block | v-block] column order. Works on the
    transposed [in, 3h] weight and on the [3h] bias."""

    def f(w):
        cols = w.reshape(w.shape[:-1] + (heads, 3, head_dim))
        q = cols[..., :, 0, :].reshape(w.shape[:-1] + (heads * head_dim,))
        k = cols[..., :, 1, :].reshape(w.shape[:-1] + (heads * head_dim,))
        v = cols[..., :, 2, :].reshape(w.shape[:-1] + (heads * head_dim,))
        import numpy as np

        return np.concatenate([q, k, v], axis=-1)

    return f


class GPTNeoXForCausalLM(LlamaForCausalLM):
    architectures = ["GPTNeoXForCausalLM"]
    hf_prefix = "gpt_neox"

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        c = config
        hf = c.hf_config
        self.ln_eps = hf.get("layer_norm_eps", 1e-5)
        self.parallel = hf.get("use_parallel_residual", True)
        rot_pct = hf.get("rotary_pct", 0.25)
        self.rotary_dim = int(self.head_dim * rot_pct)
        self.inv_freq = jnp.asarray(
            compute_inv_freq(
                self.head_dim, hf.get("rotary_emb_base", c.rope_theta),
                c.rope_scaling, rotary_dim=self.rotary_dim,
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
            WeightRule(("embed",), [f"{pre}.embed_in.weight"], kind="embed"),
            WeightRule(("final_norm",), [f"{pre}.final_layer_norm.weight"], kind="norm"),
            WeightRule(("final_norm_b",), [f"{pre}.final_layer_norm.bias"], kind="norm"),
            WeightRule(("lm_head",), ["embed_out.weight"], kind="lm_head"),
        ]
        for i in range(self.num_layers):
            lp = f"{pre}.layers.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(L + ("ln1_w",), [f"{lp}.input_layernorm.weight"], kind="norm"),
                WeightRule(L + ("ln1_b",), [f"{lp}.input_layernorm.bias"], kind="norm"),
                WeightRule(L + ("ln2_w",), [f"{lp}.post_attention_layernorm.weight"], kind="norm"),
                WeightRule(L + ("ln2_b",), [f"{lp}.post_attention_layernorm.bias"], kind="norm"),
                WeightRule(L + ("qkv",), [f"{lp}.attention.query_key_value.weight"],
                           kind="linear", method_key="qkv", transform=tr),
                WeightRule(L + ("qkv", "b"), [f"{lp}.attention.query_key_value.bias"],
                           kind="linear_bias", transform=tr),
                WeightRule(L + ("o",), [f"{lp}.attention.dense.weight"],
                           kind="linear", method_key="o"),
                WeightRule(L + ("o", "b"), [f"{lp}.attention.dense.bias"],
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
            q = apply_rope(q, fb.positions, self.inv_freq)
            k = apply_rope(k, fb.positions, self.inv_freq)
            attn_out, kv_i = attn_backend(
                q, k, v, kv_layers[i], fb, self.sm_scale
            )
            attn_out = self.methods["o"].apply(
                lp["o"], attn_out.reshape(t, self.q_size)
            )
            if self.parallel:
                m = layer_norm(h, lp["ln2_w"], lp["ln2_b"], self.ln_eps)
                mlp = self.methods["fc2"].apply(
                    lp["fc2"],
                    jax.nn.gelu(
                        self.methods["fc1"].apply(lp["fc1"], m),
                        approximate=False,
                    ),
                )
                h = h + attn_out + mlp
            else:
                h = h + attn_out
                m = layer_norm(h, lp["ln2_w"], lp["ln2_b"], self.ln_eps)
                h = h + self.methods["fc2"].apply(
                    lp["fc2"],
                    jax.nn.gelu(
                        self.methods["fc1"].apply(lp["fc1"], m),
                        approximate=False,
                    ),
                )
            new_kv.append(kv_i)
        h = layer_norm(
            h, params["final_norm"], params["final_norm_b"], self.ln_eps
        )
        return h, new_kv
