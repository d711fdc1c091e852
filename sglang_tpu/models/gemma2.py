"""Gemma 2 (and Gemma 3 text) decoder.

Parity with reference `python/sglang/srt/models/gemma2.py` (+ gemma3
variants): sandwich norms (pre/post attention + pre/post feedforward),
(1 + w) RMSNorm convention, GeGLU MLP, embedding scaling by sqrt(hidden),
attention logit softcapping, final-logit softcapping, sliding-window
attention on alternating layers, query_pre_attn_scalar softmax scale.
The unified ragged attention kernel already supports the per-layer window
and logit cap, so the only new code is the layer wiring.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.activation import gelu_tanh_and_mul
from sglang_tpu.layers.norms import gemma_rms_norm
from sglang_tpu.layers.rotary import apply_rope
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM


class Gemma2ForCausalLM(LlamaForCausalLM):
    architectures = ["Gemma2ForCausalLM"]

    def __init__(self, config: ModelConfig):
        config.tie_word_embeddings = True  # gemma always ties the lm head
        super().__init__(config)
        hf = config.hf_config
        q_scalar = hf.get("query_pre_attn_scalar") or self.head_dim
        self.sm_scale = q_scalar**-0.5
        self.attn_logit_softcap = hf.get("attn_logit_softcapping") or 0.0
        self.final_logit_softcap = hf.get("final_logit_softcapping") or 0.0
        self.sliding_window = hf.get("sliding_window") or 4096
        # even layers use sliding-window attention, odd layers global
        self.layer_windows = [
            self.sliding_window if i % 2 == 0 else -1
            for i in range(self.num_layers)
        ]
        self.embed_scale = float(config.hidden_size) ** 0.5

    # sandwich norms: two extra per layer
    def _layer_specs(self) -> Tuple[dict, dict]:
        shapes, specs = super()._layer_specs()
        dt = self.config.dtype
        h = self.hidden_size
        shapes["pre_ffw_norm"] = jax.ShapeDtypeStruct((h,), dt)
        shapes["post_ffw_norm"] = jax.ShapeDtypeStruct((h,), dt)
        specs["pre_ffw_norm"] = P(None)
        specs["post_ffw_norm"] = P(None)
        return shapes, specs

    def mlp_forward(self, lp, x, lora=None, lora_ids=None):
        gate_up = self.methods["gate_up"].apply(lp["gate_up"], x)
        return self.methods["down"].apply(lp["down"], gelu_tanh_and_mul(gate_up))

    def weight_rules(self) -> List[WeightRule]:
        rules = super().weight_rules()
        pre = self.hf_prefix
        for i in range(self.num_layers):
            lp = f"{pre}.layers.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(
                    L + ("pre_ffw_norm",),
                    [f"{lp}.pre_feedforward_layernorm.weight"],
                    kind="norm",
                ),
                WeightRule(
                    L + ("post_ffw_norm",),
                    [f"{lp}.post_feedforward_layernorm.weight"],
                    kind="norm",
                ),
            ]
        return rules

    def forward(self, params, kv_layers, fb, attn_backend):
        c = self.config
        t = fb.input_ids.shape[0]
        h = params["embed"][fb.input_ids] * jnp.asarray(
            self.embed_scale, dtype=c.dtype
        )
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            normed = gemma_rms_norm(h, lp["input_norm"], c.rms_norm_eps)
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
            attn_out, kv_i = attn_backend(
                q,
                k,
                v,
                kv_layers[i],
                fb,
                self.sm_scale,
                sliding_window=self.layer_windows[i],
                logit_cap=self.attn_logit_softcap,
            )
            new_kv.append(kv_i)
            attn_out = attn_out.reshape(t, self.q_size)
            attn_out = self.methods["o"].apply(lp["o"], attn_out)
            # post-attention norm applies to the block OUTPUT, then residual
            h = h + gemma_rms_norm(attn_out, lp["post_norm"], c.rms_norm_eps)
            normed = gemma_rms_norm(h, lp["pre_ffw_norm"], c.rms_norm_eps)
            mlp_out = self.mlp_forward(lp, normed)
            h = h + gemma_rms_norm(mlp_out, lp["post_ffw_norm"], c.rms_norm_eps)
        h = gemma_rms_norm(h, params["final_norm"], c.rms_norm_eps)
        return h, new_kv

    def compute_logits(self, params, hidden):
        logits = super().compute_logits(params, hidden)
        if self.final_logit_softcap > 0:
            cap = self.final_logit_softcap
            logits = cap * jnp.tanh(logits / cap)
        return logits
