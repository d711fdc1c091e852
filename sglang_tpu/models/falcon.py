"""Falcon (TII) decoder — classic 7B (MQA, parallel attn) and the
40B/180B "new decoder architecture" (GQA, dual layernorms).

Parity with reference `srt/models/falcon.py` lineage / HF
`modeling_falcon.py`. Rotary models only (the alibi RefinedWeb variants
are rejected at init). Residual forms:
- classic + parallel_attn:  h = h + attn(ln(h)) + mlp(ln(h))
- new architecture:         h = h + attn(ln_attn(h)) + mlp(ln_mlp(h))
- classic sequential:       pre-norm like GPT-2."""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.linear import make_linear_method
from sglang_tpu.layers.norms import layer_norm
from sglang_tpu.layers.rotary import apply_rope
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM, _linear_sharding


class FalconForCausalLM(LlamaForCausalLM):
    architectures = ["FalconForCausalLM", "RWForCausalLM"]
    hf_prefix = "transformer"

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        c = config
        hf = c.hf_config
        if hf.get("alibi"):
            raise NotImplementedError("alibi Falcon variants not supported")
        self.new_arch = hf.get("new_decoder_architecture", False)
        self.parallel = hf.get("parallel_attn", True)
        self.ln_eps = hf.get("layer_norm_epsilon", 1e-5)
        self.use_bias = hf.get("bias", False)
        if self.new_arch:
            kvh = hf.get("num_kv_heads") or self.num_q_heads
        elif hf.get("multi_query", True):
            kvh = 1
        else:
            kvh = self.num_q_heads
        self.num_kv_heads = kvh
        self.kv_size = kvh * self.head_dim
        self.methods = {
            k: make_linear_method(c.quantization, bias=self.use_bias)
            for k in ("qkv", "o", "fc1", "fc2")
        }

    def _qkv_transform(self):
        heads, kvh, hd = self.num_q_heads, self.num_kv_heads, self.head_dim
        if self.new_arch:
            qpg = heads // kvh

            def f(w):  # [..., kvh*(qpg+2)*hd] grouped [q..q, k, v]
                cols = w.reshape(w.shape[:-1] + (kvh, qpg + 2, hd))
                q = cols[..., :, :qpg, :].reshape(w.shape[:-1] + (heads * hd,))
                k = cols[..., :, qpg, :].reshape(w.shape[:-1] + (kvh * hd,))
                v = cols[..., :, qpg + 1, :].reshape(w.shape[:-1] + (kvh * hd,))
                return np.concatenate([q, k, v], axis=-1)

            return f
        if self.num_kv_heads == self.num_q_heads:
            # classic non-MQA (falcon-rw): per-head [q,k,v] interleave
            from sglang_tpu.models.gpt_neox import deinterleave_qkv

            return deinterleave_qkv(heads, hd)
        # classic MQA: already [q-block, k, v] — identity
        return None

    def _layer_specs(self) -> Tuple[dict, dict]:
        c = self.config
        dt = c.dtype
        h, inter = self.hidden_size, c.intermediate_size

        def vec():
            return jax.ShapeDtypeStruct((h,), dt)

        shapes = {
            "ln1_w": vec(), "ln1_b": vec(),
            "qkv": self.methods["qkv"].weight_shapes(
                h, self.q_size + 2 * self.kv_size, dt
            ),
            "o": self.methods["o"].weight_shapes(self.q_size, h, dt),
            "fc1": self.methods["fc1"].weight_shapes(h, inter, dt),
            "fc2": self.methods["fc2"].weight_shapes(inter, h, dt),
        }
        specs = {
            "ln1_w": P(None), "ln1_b": P(None),
            "qkv": _linear_sharding(self.methods["qkv"], col_parallel=True),
            "o": _linear_sharding(self.methods["o"], col_parallel=False),
            "fc1": _linear_sharding(self.methods["fc1"], col_parallel=True),
            "fc2": _linear_sharding(self.methods["fc2"], col_parallel=False),
        }
        if self.new_arch or not self.parallel:
            shapes["ln2_w"] = vec()
            shapes["ln2_b"] = vec()
            specs["ln2_w"] = P(None)
            specs["ln2_b"] = P(None)
        return shapes, specs

    def param_specs(self) -> dict:
        c = self.config
        dt = c.dtype
        shapes, _ = self._layer_specs()
        h = self.hidden_size
        tree = {
            "embed": jax.ShapeDtypeStruct((c.vocab_size, h), dt),
            "layers": [dict(shapes) for _ in range(self.num_layers)],
            "final_norm": jax.ShapeDtypeStruct((h,), dt),
            "final_norm_b": jax.ShapeDtypeStruct((h,), dt),
        }
        if not c.tie_word_embeddings:
            tree["lm_head"] = jax.ShapeDtypeStruct((h, c.vocab_size), dt)
        return tree

    def param_shardings(self) -> dict:
        _, specs = self._layer_specs()
        tree = {
            "embed": P(None, "model"),
            "layers": [dict(specs) for _ in range(self.num_layers)],
            "final_norm": P(None),
            "final_norm_b": P(None),
        }
        if not self.config.tie_word_embeddings:
            tree["lm_head"] = P(None, "model")
        return tree

    def weight_rules(self) -> List[WeightRule]:
        pre = self.hf_prefix
        tr = self._qkv_transform()
        rules = [
            WeightRule(("embed",), [f"{pre}.word_embeddings.weight"], kind="embed"),
            WeightRule(("final_norm",), [f"{pre}.ln_f.weight"], kind="norm"),
            WeightRule(("final_norm_b",), [f"{pre}.ln_f.bias"], kind="norm"),
        ]
        if not self.config.tie_word_embeddings:
            rules.append(WeightRule(("lm_head",), ["lm_head.weight"], kind="lm_head"))
        ln1 = "ln_attn" if self.new_arch else "input_layernorm"
        ln2 = "ln_mlp" if self.new_arch else "post_attention_layernorm"
        for i in range(self.num_layers):
            lp = f"{pre}.h.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(L + ("ln1_w",), [f"{lp}.{ln1}.weight"], kind="norm"),
                WeightRule(L + ("ln1_b",), [f"{lp}.{ln1}.bias"], kind="norm"),
                WeightRule(L + ("qkv",), [f"{lp}.self_attention.query_key_value.weight"],
                           kind="linear", method_key="qkv", transform=tr),
                WeightRule(L + ("o",), [f"{lp}.self_attention.dense.weight"],
                           kind="linear", method_key="o"),
                WeightRule(L + ("fc1",), [f"{lp}.mlp.dense_h_to_4h.weight"],
                           kind="linear", method_key="fc1"),
                WeightRule(L + ("fc2",), [f"{lp}.mlp.dense_4h_to_h.weight"],
                           kind="linear", method_key="fc2"),
            ]
            if self.use_bias:
                rules += [
                    WeightRule(L + ("qkv", "b"),
                               [f"{lp}.self_attention.query_key_value.bias"],
                               kind="linear_bias", transform=tr),
                    WeightRule(L + ("o", "b"),
                               [f"{lp}.self_attention.dense.bias"],
                               kind="linear_bias"),
                    WeightRule(L + ("fc1", "b"),
                               [f"{lp}.mlp.dense_h_to_4h.bias"],
                               kind="linear_bias"),
                    WeightRule(L + ("fc2", "b"),
                               [f"{lp}.mlp.dense_4h_to_h.bias"],
                               kind="linear_bias"),
                ]
            if self.new_arch or not self.parallel:
                rules += [
                    WeightRule(L + ("ln2_w",), [f"{lp}.{ln2}.weight"], kind="norm"),
                    WeightRule(L + ("ln2_b",), [f"{lp}.{ln2}.bias"], kind="norm"),
                ]
        return rules

    def forward(self, params, kv_layers, fb, attn_backend):
        t = fb.input_ids.shape[0]
        h = params["embed"][fb.input_ids]
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            a_in = layer_norm(h, lp["ln1_w"], lp["ln1_b"], self.ln_eps)
            qkv = self.methods["qkv"].apply(lp["qkv"], a_in)
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
                q, k, v, kv_layers[i], fb, self.sm_scale
            )
            attn_out = self.methods["o"].apply(
                lp["o"], attn_out.reshape(t, self.q_size)
            )

            def mlp(x):
                return self.methods["fc2"].apply(
                    lp["fc2"],
                    jax.nn.gelu(
                        self.methods["fc1"].apply(lp["fc1"], x),
                        approximate=False,
                    ),
                )

            if self.new_arch:
                m_in = layer_norm(h, lp["ln2_w"], lp["ln2_b"], self.ln_eps)
                h = h + attn_out + mlp(m_in)
            elif self.parallel:
                h = h + attn_out + mlp(a_in)
            else:
                h = h + attn_out
                m_in = layer_norm(h, lp["ln2_w"], lp["ln2_b"], self.ln_eps)
                h = h + mlp(m_in)
            new_kv.append(kv_i)
        h = layer_norm(
            h, params["final_norm"], params["final_norm_b"], self.ln_eps
        )
        return h, new_kv
