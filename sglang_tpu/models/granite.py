"""IBM Granite decoder.

Parity with reference `srt/models/granite.py`: llama skeleton plus the
Granite scaling knobs — `embedding_multiplier` on the token embeddings,
`residual_multiplier` on every residual add, `attention_multiplier` as the
softmax scale, and `logits_scaling` dividing the final logits.
"""

from __future__ import annotations

import jax.numpy as jnp

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.norms import rms_norm
from sglang_tpu.models.llama import LlamaForCausalLM


class GraniteForCausalLM(LlamaForCausalLM):
    architectures = ["GraniteForCausalLM"]

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.embedding_multiplier = float(hf.get("embedding_multiplier", 1.0))
        self.residual_multiplier = float(hf.get("residual_multiplier", 1.0))
        self.logits_scaling = float(hf.get("logits_scaling", 1.0))
        am = hf.get("attention_multiplier")
        if am is not None:
            self.sm_scale = float(am)

    def forward(self, params, kv_layers, fb, attn_backend):
        c = self.config
        t = fb.input_ids.shape[0]
        h = self.embed_tokens(params, fb) * jnp.asarray(
            self.embedding_multiplier, dtype=c.dtype
        )
        rm = jnp.asarray(self.residual_multiplier, dtype=c.dtype)
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            normed = rms_norm(h, lp["input_norm"], c.rms_norm_eps)
            qkv = self.methods["qkv"].apply(lp["qkv"], normed)
            q = qkv[:, : self.q_size].reshape(t, self.num_q_heads, self.head_dim)
            k = qkv[:, self.q_size : self.q_size + self.kv_size].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            v = qkv[:, self.q_size + self.kv_size :].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            from sglang_tpu.layers.rotary import apply_rope

            q = apply_rope(q, fb.positions, self.inv_freq)
            k = apply_rope(k, fb.positions, self.inv_freq)
            attn_out, kv_i = attn_backend(q, k, v, kv_layers[i], fb, self.sm_scale)
            new_kv.append(kv_i)
            h = h + rm * self.methods["o"].apply(
                lp["o"], attn_out.reshape(t, self.q_size)
            )
            normed = rms_norm(h, lp["post_norm"], c.rms_norm_eps)
            h = h + rm * self.mlp_forward(lp, normed)
        h = rms_norm(h, params["final_norm"], c.rms_norm_eps)
        return h, new_kv

    def compute_logits(self, params, hidden):
        return super().compute_logits(params, hidden) / self.logits_scaling
