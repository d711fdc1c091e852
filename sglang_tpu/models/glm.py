"""GLM-4 (2024 "glm" architecture — THUDM GLM-4-9B HF conversion).

Parity with reference `srt/models/glm4.py` lineage / HF `modeling_glm.py`:
llama skeleton with biased q/k/v (bias-free o), PARTIAL INTERLEAVED
rotary (`partial_rotary_factor`, complex-pair convention), and a fused
gate_up MLP. The newer Glm4ForCausalLM (post/pre double norms) lives in
`models/glm4.py`."""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.norms import rms_norm
from sglang_tpu.layers.rotary import apply_rope_interleaved, compute_inv_freq
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM


class GlmForCausalLM(LlamaForCausalLM):
    architectures = ["GlmForCausalLM"]
    qkv_bias = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        rot_pct = hf.get("partial_rotary_factor", 0.5)
        self.rotary_dim = int(self.head_dim * rot_pct)
        self.inv_freq = jnp.asarray(
            compute_inv_freq(
                self.head_dim, config.rope_theta, config.rope_scaling,
                rotary_dim=self.rotary_dim,
            )
        )

    def mlp_weight_rules(self, lp: str, L: tuple) -> List[WeightRule]:
        # fused gate_up checkpoint tensor (chunk-2 order matches
        # silu_and_mul's gate-first convention)
        return [
            WeightRule(
                L + ("gate_up",), [f"{lp}.mlp.gate_up_proj.weight"],
                kind="linear", method_key="gate_up",
            ),
            WeightRule(
                L + ("down",), [f"{lp}.mlp.down_proj.weight"], kind="linear",
                method_key="down",
            ),
        ]

    def forward(self, params, kv_layers, fb, attn_backend):
        c = self.config
        t = fb.input_ids.shape[0]
        h = self.embed_tokens(params, fb)
        new_kv = []
        rd = self.rotary_dim
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

            def rope(x):
                rotated = apply_rope_interleaved(
                    x[..., :rd], fb.positions, self.inv_freq
                )
                return jnp.concatenate([rotated, x[..., rd:]], axis=-1)

            q, k = rope(q), rope(k)
            attn_out, kv_i = attn_backend(
                q, k, v, kv_layers[i], fb, self.sm_scale,
                sliding_window=self.sliding_window,
            )
            h = h + self.methods["o"].apply(
                lp["o"], attn_out.reshape(t, self.q_size)
            )
            normed = rms_norm(h, lp["post_norm"], c.rms_norm_eps)
            h = h + self.mlp_forward(lp, normed)
            new_kv.append(kv_i)
        h = rms_norm(h, params["final_norm"], c.rms_norm_eps)
        return h, new_kv
