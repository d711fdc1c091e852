"""OLMo-3 (Allen AI) decoder.

Parity with HF `modeling_olmo3` (reference lineage `srt/models/olmo2.py`
family): the OLMo-2 post-norm skeleton (full-projection q/k RMSNorm, no
input layernorms) plus per-layer hybrid attention — 3 sliding-window
layers per full-attention layer — where the SLIDING layers use plain
(default) rotary and only the FULL layers apply the config's
`rope_scaling`."""

from __future__ import annotations

import jax.numpy as jnp

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.norms import rms_norm
from sglang_tpu.layers.rotary import apply_rope, compute_inv_freq
from sglang_tpu.models.olmo2 import Olmo2ForCausalLM


class Olmo3ForCausalLM(Olmo2ForCausalLM):
    architectures = ["Olmo3ForCausalLM"]
    supports_chain_tail = False

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        sw = hf.get("sliding_window") or -1
        lt = hf.get("layer_types")
        if lt:
            self.layer_windows = [
                sw if t == "sliding_attention" else -1 for t in lt
            ]
        else:
            self.layer_windows = [
                sw if (i + 1) % 4 != 0 else -1
                for i in range(self.num_layers)
            ]
        self.sliding_window = -1  # per-layer windows carried explicitly
        # sliding layers: DEFAULT rope (no scaling); full layers: scaled
        self.inv_freq_sliding = jnp.asarray(
            compute_inv_freq(self.head_dim, config.rope_theta, None)
        )

    def forward(self, params, kv_layers, fb, attn_backend):
        c = self.config
        t = fb.input_ids.shape[0]
        h = self.embed_tokens(params, fb)
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            qkv = self.methods["qkv"].apply(lp["qkv"], h)
            q = rms_norm(qkv[:, : self.q_size], lp["q_norm"], c.rms_norm_eps)
            k = rms_norm(
                qkv[:, self.q_size : self.q_size + self.kv_size],
                lp["k_norm"],
                c.rms_norm_eps,
            )
            v = qkv[:, self.q_size + self.kv_size :].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            q = q.reshape(t, self.num_q_heads, self.head_dim)
            k = k.reshape(t, self.num_kv_heads, self.head_dim)
            inv = (
                self.inv_freq_sliding
                if self.layer_windows[i] > 0
                else self.inv_freq
            )
            q = apply_rope(q, fb.positions, inv)
            k = apply_rope(k, fb.positions, inv)
            attn_out, kv_i = attn_backend(
                q, k, v, kv_layers[i], fb, self.sm_scale,
                sliding_window=self.layer_windows[i],
            )
            new_kv.append(kv_i)
            attn_out = self.methods["o"].apply(
                lp["o"], attn_out.reshape(t, self.q_size)
            )
            h = h + rms_norm(attn_out, lp["post_norm"], c.rms_norm_eps)
            mlp_out = self.mlp_forward(lp, h)
            h = h + rms_norm(mlp_out, lp["post_ffw_norm"], c.rms_norm_eps)
        h = rms_norm(h, params["final_norm"], c.rms_norm_eps)
        return h, new_kv
