"""GLM-4 (THUDM) decoder.

Parity with reference `srt/models/glm4.py` and HF
`transformers/models/glm4/modeling_glm4.py`: llama skeleton with
- sandwich norms: input + post-self-attn (on the attention output) +
  post-attention (pre-MLP) + post-MLP (on the MLP output),
- qkv bias (o_proj without bias),
- PARTIAL rotary (factor 0.5) in GLM's interleaved pairing: frequency j
  applies to adjacent lanes (2j, 2j+1) of the rotated half-pair (the HF
  `cos[..., :d/2].repeat_interleave(2)` form),
- fused gate_up checkpoint tensor.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.norms import rms_norm
from sglang_tpu.layers.rotary import compute_inv_freq
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM


def glm4_apply_rope(x: jax.Array, positions: jax.Array,
                    inv_freq: jax.Array) -> jax.Array:
    """x: [T, H, D]; INTERLEAVED (complex-pair) rotary over the first
    `2*len(inv_freq)` dims — adjacent lanes (2i, 2i+1) rotate by freq i —
    with the tail passed through (GLM's partial_rotary_factor)."""
    from sglang_tpu.layers.rotary import apply_rope_interleaved

    rot = inv_freq.shape[0] * 2
    rotated = apply_rope_interleaved(x[..., :rot], positions, inv_freq)
    return jnp.concatenate([rotated, x[..., rot:]], axis=-1)


class Glm4ForCausalLM(LlamaForCausalLM):
    architectures = ["Glm4ForCausalLM"]
    qkv_bias = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        pr = hf.get("partial_rotary_factor", 0.5)
        self.inv_freq = jnp.asarray(
            compute_inv_freq(
                config.head_dim,
                config.rope_theta,
                config.rope_scaling,
                rotary_dim=int(config.head_dim * pr),
            )
        )

    def _layer_specs(self) -> Tuple[dict, dict]:
        shapes, specs = super()._layer_specs()
        dt = self.config.dtype
        h = self.hidden_size
        shapes["post_self_attn_norm"] = jax.ShapeDtypeStruct((h,), dt)
        shapes["post_mlp_norm"] = jax.ShapeDtypeStruct((h,), dt)
        specs["post_self_attn_norm"] = P(None)
        specs["post_mlp_norm"] = P(None)
        return shapes, specs

    def mlp_weight_rules(self, lp: str, L: tuple) -> List[WeightRule]:
        return [
            WeightRule(
                L + ("gate_up",), [f"{lp}.mlp.gate_up_proj.weight"],
                kind="linear", method_key="gate_up",
            ),
            WeightRule(
                L + ("down",), [f"{lp}.mlp.down_proj.weight"],
                kind="linear", method_key="down",
            ),
        ]

    def weight_rules(self) -> List[WeightRule]:
        rules = super().weight_rules()
        pre = self.hf_prefix
        for i in range(self.num_layers):
            lp = f"{pre}.layers.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(
                    L + ("post_self_attn_norm",),
                    [f"{lp}.post_self_attn_layernorm.weight"], kind="norm",
                ),
                WeightRule(
                    L + ("post_mlp_norm",),
                    [f"{lp}.post_mlp_layernorm.weight"], kind="norm",
                ),
            ]
        return rules

    def forward(self, params, kv_layers, fb, attn_backend):
        c = self.config
        t = fb.input_ids.shape[0]
        h = self.embed_tokens(params, fb)
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
            q = glm4_apply_rope(q, fb.positions, self.inv_freq)
            k = glm4_apply_rope(k, fb.positions, self.inv_freq)
            attn_out, kv_i = attn_backend(
                q, k, v, kv_layers[i], fb, self.sm_scale
            )
            new_kv.append(kv_i)
            attn_out = self.methods["o"].apply(
                lp["o"], attn_out.reshape(t, self.q_size)
            )
            h = h + rms_norm(
                attn_out, lp["post_self_attn_norm"], c.rms_norm_eps
            )
            normed = rms_norm(h, lp["post_norm"], c.rms_norm_eps)
            mlp_out = self.mlp_forward(lp, normed)
            h = h + rms_norm(mlp_out, lp["post_mlp_norm"], c.rms_norm_eps)
        h = rms_norm(h, params["final_norm"], c.rms_norm_eps)
        return h, new_kv
