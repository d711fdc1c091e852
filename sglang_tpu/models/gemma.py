"""Gemma (v1) decoder.

Parity with reference `srt/models/gemma.py`: llama skeleton with (1 + w)
RMSNorm, sqrt(hidden) embedding scaling, GeGLU MLP (tanh-approx GELU by
default; exact when `hidden_activation == "gelu"`), tied lm_head, no
sandwich norms / softcaps (those are Gemma-2+, `models/gemma2.py`).
"""

from __future__ import annotations

import jax.numpy as jnp

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.activation import gelu_and_mul, gelu_tanh_and_mul
from sglang_tpu.layers.norms import gemma_rms_norm
from sglang_tpu.layers.rotary import apply_rope
from sglang_tpu.models.llama import LlamaForCausalLM


class GemmaForCausalLM(LlamaForCausalLM):
    architectures = ["GemmaForCausalLM"]

    def __init__(self, config: ModelConfig):
        config.tie_word_embeddings = True
        super().__init__(config)
        act = config.hf_config.get("hidden_activation") or config.hf_config.get(
            "hidden_act", "gelu_pytorch_tanh"
        )
        self._act = gelu_and_mul if act == "gelu" else gelu_tanh_and_mul
        self.embed_scale = float(config.hidden_size) ** 0.5

    def mlp_forward(self, lp, x, lora=None, lora_ids=None):
        gate_up = self.methods["gate_up"].apply(lp["gate_up"], x)
        return self.methods["down"].apply(lp["down"], self._act(gate_up))

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
            attn_out, kv_i = attn_backend(q, k, v, kv_layers[i], fb, self.sm_scale)
            new_kv.append(kv_i)
            h = h + self.methods["o"].apply(
                lp["o"], attn_out.reshape(t, self.q_size)
            )
            normed = gemma_rms_norm(h, lp["post_norm"], c.rms_norm_eps)
            h = h + self.mlp_forward(lp, normed)
        h = gemma_rms_norm(h, params["final_norm"], c.rms_norm_eps)
        return h, new_kv
