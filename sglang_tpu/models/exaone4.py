"""EXAONE-4 (LG AI) decoder.

Parity with reference `srt/models/exaone4.py` and HF
`modeling_exaone4`: llama skeleton rearranged to POST-norm sublayers
(no input layernorms: `h = h + post_attention_layernorm(attn(h))`,
`h = h + post_feedforward_layernorm(mlp(h))`), per-head q/k RMSNorm
applied BEFORE rotary, hybrid attention — every
`sliding_window_pattern`-th layer is global and uses NoPE (no rotary at
all), the rest are sliding-window with rope. Non-uniform per-layer
behavior keeps the unrolled forward (the runner's scan gate checks the
class forward)."""

from __future__ import annotations

from typing import List, Tuple

import jax
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.norms import rms_norm
from sglang_tpu.layers.rotary import apply_rope
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM


class Exaone4ForCausalLM(LlamaForCausalLM):
    architectures = ["Exaone4ForCausalLM"]
    qk_norm = True  # per-head, pre-rope
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
            pat = int(hf.get("sliding_window_pattern", 4))
            self.layer_windows = [
                sw if (i + 1) % pat != 0 else -1
                for i in range(self.num_layers)
            ]
        # global (full-attention) layers are NoPE
        self.layer_rope = [w > 0 for w in self.layer_windows]
        self.sliding_window = -1  # per-layer windows carried explicitly

    def _layer_specs(self) -> Tuple[dict, dict]:
        shapes, specs = super()._layer_specs()
        dt = self.config.dtype
        del shapes["input_norm"], specs["input_norm"]
        shapes["post_ffw_norm"] = jax.ShapeDtypeStruct((self.hidden_size,), dt)
        specs["post_ffw_norm"] = P(None)
        return shapes, specs

    def weight_rules(self) -> List[WeightRule]:
        pre = self.hf_prefix
        rules = [
            WeightRule(("embed",), [f"{pre}.embed_tokens.weight"], kind="embed"),
            WeightRule(("final_norm",), [f"{pre}.norm.weight"], kind="norm"),
        ]
        if not self.config.tie_word_embeddings:
            rules.append(WeightRule(("lm_head",), ["lm_head.weight"], kind="lm_head"))
        for i in range(self.num_layers):
            lp = f"{pre}.layers.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(L + ("post_norm",), [f"{lp}.post_attention_layernorm.weight"], kind="norm"),
                WeightRule(L + ("post_ffw_norm",), [f"{lp}.post_feedforward_layernorm.weight"], kind="norm"),
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
                WeightRule(L + ("o",), [f"{lp}.self_attn.o_proj.weight"], kind="linear", method_key="o"),
                WeightRule(L + ("q_norm",), [f"{lp}.self_attn.q_norm.weight"], kind="norm"),
                WeightRule(L + ("k_norm",), [f"{lp}.self_attn.k_norm.weight"], kind="norm"),
                *self.mlp_weight_rules(lp, L),
            ]
        return rules

    def forward(self, params, kv_layers, fb, attn_backend):
        c = self.config
        t = fb.input_ids.shape[0]
        h = self.embed_tokens(params, fb)
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            qkv = self.methods["qkv"].apply(lp["qkv"], h)
            q = qkv[:, : self.q_size].reshape(t, self.num_q_heads, self.head_dim)
            k = qkv[:, self.q_size : self.q_size + self.kv_size].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            v = qkv[:, self.q_size + self.kv_size :].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            q = rms_norm(q, lp["q_norm"], c.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"], c.rms_norm_eps)
            if self.layer_rope[i]:
                q = apply_rope(q, fb.positions, self.inv_freq)
                k = apply_rope(k, fb.positions, self.inv_freq)
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
