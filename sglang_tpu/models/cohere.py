"""Cohere Command-R decoder.

Parity with reference `srt/models/commandr.py`: PARALLEL residual blocks
(attention and MLP both read the same input-layernormed hidden, summed into
one residual), bias-free LayerNorm, interleaved (complex-pair) RoPE,
optional per-head q/k LayerNorm (`use_qk_norm`), tied embeddings, and a
`logit_scale` multiplier on the final logits.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.rotary import apply_rope_interleaved
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM


def _ln_nb(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """Mean-centered LayerNorm without bias (CohereLayerNorm)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)).astype(
        x.dtype
    )


class CohereForCausalLM(LlamaForCausalLM):
    architectures = ["CohereForCausalLM"]

    def __init__(self, config: ModelConfig):
        config.tie_word_embeddings = True  # cohere always ties
        super().__init__(config)
        hf = config.hf_config
        self.ln_eps = hf.get("layer_norm_eps", 1e-5)
        self.logit_scale = float(hf.get("logit_scale", 1.0) or 1.0)
        self.use_qk_norm = bool(hf.get("use_qk_norm", False))

    def _layer_specs(self) -> Tuple[dict, dict]:
        shapes, specs = super()._layer_specs()
        dt = self.config.dtype
        # single shared input norm (parallel block) — drop the post norm
        del shapes["post_norm"], specs["post_norm"]
        if self.use_qk_norm:
            # per-head LayerNorm weights [heads, head_dim]
            shapes["q_norm"] = jax.ShapeDtypeStruct(
                (self.num_q_heads, self.head_dim), dt
            )
            shapes["k_norm"] = jax.ShapeDtypeStruct(
                (self.num_kv_heads, self.head_dim), dt
            )
            specs["q_norm"] = P(None, None)
            specs["k_norm"] = P(None, None)
        return shapes, specs

    def weight_rules(self) -> List[WeightRule]:
        pre = self.hf_prefix
        rules = [
            WeightRule(("embed",), [f"{pre}.embed_tokens.weight"], kind="embed"),
            WeightRule(("final_norm",), [f"{pre}.norm.weight"], kind="norm"),
        ]
        for i in range(self.num_layers):
            lp = f"{pre}.layers.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(
                    L + ("input_norm",), [f"{lp}.input_layernorm.weight"],
                    kind="norm",
                ),
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
                    L + ("o",), [f"{lp}.self_attn.o_proj.weight"],
                    kind="linear", method_key="o",
                ),
                *self.mlp_weight_rules(lp, L),
            ]
            if self.use_qk_norm:
                rules += [
                    WeightRule(
                        L + ("q_norm",), [f"{lp}.self_attn.q_norm.weight"],
                        kind="raw",
                    ),
                    WeightRule(
                        L + ("k_norm",), [f"{lp}.self_attn.k_norm.weight"],
                        kind="raw",
                    ),
                ]
        return rules

    def forward(self, params, kv_layers, fb, attn_backend):
        t = fb.input_ids.shape[0]
        h = self.embed_tokens(params, fb)
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            normed = _ln_nb(h, lp["input_norm"], self.ln_eps)
            qkv = self.methods["qkv"].apply(lp["qkv"], normed)
            q = qkv[:, : self.q_size].reshape(t, self.num_q_heads, self.head_dim)
            k = qkv[:, self.q_size : self.q_size + self.kv_size].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            v = qkv[:, self.q_size + self.kv_size :].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            if self.use_qk_norm:
                q = _ln_nb(q, lp["q_norm"], self.ln_eps)
                k = _ln_nb(k, lp["k_norm"], self.ln_eps)
            q = apply_rope_interleaved(q, fb.positions, self.inv_freq)
            k = apply_rope_interleaved(k, fb.positions, self.inv_freq)
            attn_out, kv_i = attn_backend(q, k, v, kv_layers[i], fb, self.sm_scale)
            new_kv.append(kv_i)
            o_out = self.methods["o"].apply(
                lp["o"], attn_out.reshape(t, self.q_size)
            )
            mlp_out = self.mlp_forward(lp, normed)
            h = h + o_out + mlp_out  # parallel block
        h = _ln_nb(h, params["final_norm"], self.ln_eps)
        return h, new_kv

    def compute_logits(self, params, hidden):
        logits = jnp.dot(
            hidden, params["embed"].T, preferred_element_type=jnp.float32
        )
        return logits * self.logit_scale


class Cohere2ForCausalLM(CohereForCausalLM):
    """Command R7B (reference `srt/models/commandr.py` lineage / HF
    `modeling_cohere2.py`): the cohere parallel block where sliding-
    window layers apply rotary and the interleaved full-attention
    layers are NoPE."""

    architectures = ["Cohere2ForCausalLM"]
    supports_chain_tail = False

    def __init__(self, config):
        super().__init__(config)
        hf = config.hf_config
        sw = hf.get("sliding_window") or -1
        lt = hf.get("layer_types")
        if lt:
            self.layer_windows = [
                sw if t == "sliding_attention" else -1 for t in lt
            ]
        else:
            pat = int(hf.get("sliding_window_pattern", 4))
            self.layer_windows = [
                sw if (i + 1) % pat != 0 else -1
                for i in range(self.num_layers)
            ]
        self.sliding_window = -1

    def forward(self, params, kv_layers, fb, attn_backend):
        from sglang_tpu.layers.rotary import apply_rope_interleaved

        t = fb.input_ids.shape[0]
        h = self.embed_tokens(params, fb)
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            normed = _ln_nb(h, lp["input_norm"], self.ln_eps)
            qkv = self.methods["qkv"].apply(lp["qkv"], normed)
            q = qkv[:, : self.q_size].reshape(t, self.num_q_heads, self.head_dim)
            k = qkv[:, self.q_size : self.q_size + self.kv_size].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            v = qkv[:, self.q_size + self.kv_size :].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            if self.layer_windows[i] > 0:  # sliding layers rotate; full NoPE
                q = apply_rope_interleaved(q, fb.positions, self.inv_freq)
                k = apply_rope_interleaved(k, fb.positions, self.inv_freq)
            attn_out, kv_i = attn_backend(
                q, k, v, kv_layers[i], fb, self.sm_scale,
                sliding_window=self.layer_windows[i],
            )
            new_kv.append(kv_i)
            o_out = self.methods["o"].apply(
                lp["o"], attn_out.reshape(t, self.q_size)
            )
            mlp_out = self.mlp_forward(lp, normed)
            h = h + o_out + mlp_out  # parallel block
        h = _ln_nb(h, params["final_norm"], self.ln_eps)
        return h, new_kv
