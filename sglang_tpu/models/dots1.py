"""dots.llm1 (rednote-hilab) decoder.

Parity with reference `srt/models/dots1.py` / HF `modeling_dots1.py`:
qwen3-style attention (per-head q/k RMSNorm, optional bias, per-layer
sliding windows via `layer_types`) over the DeepSeek-V3 MoE recipe the
GLM-4-MoE model already implements — sigmoid scoring with
e_score_correction_bias used for selection only, top-2-sum group
routing, dense first_k_dense_replace layers, shared experts."""

from __future__ import annotations

import jax.numpy as jnp

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.norms import rms_norm
from sglang_tpu.layers.rotary import apply_rope
from sglang_tpu.models.glm4_moe import Glm4MoeForCausalLM


class Dots1ForCausalLM(Glm4MoeForCausalLM):
    architectures = ["Dots1ForCausalLM"]
    supports_chain_tail = False

    def __init__(self, config: ModelConfig):
        config.hf_config.setdefault("use_qk_norm", True)  # always on
        super().__init__(config)
        hf = config.hf_config
        sw = hf.get("sliding_window") or -1
        lt = hf.get("layer_types")
        if lt:
            self.layer_windows = [
                sw if t == "sliding_attention" else -1 for t in lt
            ]
        else:
            self.layer_windows = [-1] * self.num_layers
        self.sliding_window = -1  # carried per layer below

    def forward(self, params, kv_layers, fb, attn_backend):
        c = self.config
        t = fb.input_ids.shape[0]
        h = self.embed_tokens(params, fb)
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            normed = rms_norm(h, lp["input_norm"], c.rms_norm_eps)
            qkv = self.methods["qkv"].apply(lp["qkv"], normed)
            q = qkv[:, : self.q_size].reshape(
                t, self.num_q_heads, self.head_dim
            )
            k = qkv[:, self.q_size : self.q_size + self.kv_size].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            v = qkv[:, self.q_size + self.kv_size :].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            # per-HEAD q/k RMSNorm (qwen3 convention)
            q = rms_norm(q, lp["q_norm"], c.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"], c.rms_norm_eps)
            q = apply_rope(q, fb.positions, self.inv_freq)
            k = apply_rope(k, fb.positions, self.inv_freq)
            attn_out, kv_i = attn_backend(
                q, k, v, kv_layers[i], fb, self.sm_scale,
                sliding_window=self.layer_windows[i],
            )
            new_kv.append(kv_i)
            h = h + self.methods["o"].apply(
                lp["o"], attn_out.reshape(t, self.q_size)
            )
            normed = rms_norm(h, lp["post_norm"], c.rms_norm_eps)
            h = h + self.mlp_forward(lp, normed)
        h = rms_norm(h, params["final_norm"], c.rms_norm_eps)
        return h, new_kv
