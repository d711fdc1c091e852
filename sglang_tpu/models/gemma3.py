"""Gemma 3 (text) decoder.

Parity with reference `srt/models/gemma3_causal.py` and HF
`transformers/models/gemma3/modeling_gemma3.py`: the Gemma-2 sandwich-norm
skeleton plus
- per-head q/k RMSNorm (zero-centered (1+w) convention),
- per-layer rope: sliding layers use `rope_local_base_freq` (no scaling),
  full layers use `rope_theta` with `rope_scaling`,
- layer_types-driven sliding/full pattern (default 5 sliding : 1 full),
- no attention/final logit softcapping.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.norms import gemma_rms_norm
from sglang_tpu.layers.rotary import apply_rope, compute_inv_freq
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.gemma2 import Gemma2ForCausalLM


class Gemma3TextForCausalLM(Gemma2ForCausalLM):
    architectures = ["Gemma3ForCausalLM", "Gemma3TextForCausalLM"]

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        pattern = hf.get("sliding_window_pattern", 6)
        self.layer_types = hf.get(
            "layer_types",
            [
                "full_attention"
                if (i + 1) % pattern == 0
                else "sliding_attention"
                for i in range(self.num_layers)
            ],
        )
        self.layer_windows = [
            self.sliding_window if t == "sliding_attention" else -1
            for t in self.layer_types
        ]
        self.attn_logit_softcap = 0.0
        self.final_logit_softcap = 0.0
        # dual rope: local theta for sliding layers, scaled global otherwise
        self.inv_freq_local = jnp.asarray(
            compute_inv_freq(
                config.head_dim, hf.get("rope_local_base_freq", 10000.0), None
            )
        )
        self.inv_freq_global = jnp.asarray(
            compute_inv_freq(
                config.head_dim, config.rope_theta, config.rope_scaling
            )
        )

    def _layer_specs(self) -> Tuple[dict, dict]:
        shapes, specs = super()._layer_specs()
        dt = self.config.dtype
        shapes["q_norm"] = jax.ShapeDtypeStruct((self.head_dim,), dt)
        shapes["k_norm"] = jax.ShapeDtypeStruct((self.head_dim,), dt)
        specs["q_norm"] = P(None)
        specs["k_norm"] = P(None)
        return shapes, specs

    def weight_rules(self) -> List[WeightRule]:
        rules = super().weight_rules()
        pre = self.hf_prefix
        for i in range(self.num_layers):
            lp = f"{pre}.layers.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(L + ("q_norm",), [f"{lp}.self_attn.q_norm.weight"], kind="norm"),
                WeightRule(L + ("k_norm",), [f"{lp}.self_attn.k_norm.weight"], kind="norm"),
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
            q = gemma_rms_norm(q, lp["q_norm"], c.rms_norm_eps)
            k = gemma_rms_norm(k, lp["k_norm"], c.rms_norm_eps)
            inv = (
                self.inv_freq_local
                if self.layer_windows[i] > 0
                else self.inv_freq_global
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
            h = h + gemma_rms_norm(attn_out, lp["post_norm"], c.rms_norm_eps)
            normed = gemma_rms_norm(h, lp["pre_ffw_norm"], c.rms_norm_eps)
            mlp_out = self.mlp_forward(lp, normed)
            h = h + gemma_rms_norm(mlp_out, lp["post_ffw_norm"], c.rms_norm_eps)
        h = gemma_rms_norm(h, params["final_norm"], c.rms_norm_eps)
        return h, new_kv
