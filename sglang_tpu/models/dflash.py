"""DFLASH draft model (reference `srt/models/dflash.py DFlashDraftModel`).

A small llama-style decoder stack that consumes EMBEDDINGS only (the
target's embed table / lm_head are used at the worker level):
- `fc: [K*H] -> H` + `hidden_norm` project concatenated target-layer
  features into draft context embeddings (`project_target_hidden`);
- `layers.*` standard pre-norm decoder layers with optional per-head
  q/k RMSNorm (qwen3-style checkpoints);
- `norm` final RMSNorm; hidden goes to the TARGET lm_head.

Checkpoint layout: `fc.weight` [H, K*H], `hidden_norm.weight`,
`layers.{i}.{input_layernorm,post_attention_layernorm}.weight`,
`layers.{i}.self_attn.{q,k,v,o}_proj.weight` (+ optional
`{q,k}_norm.weight`), `layers.{i}.mlp.{gate,up,down}_proj.weight`,
`norm.weight`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.activation import silu_and_mul
from sglang_tpu.layers.norms import gemma_rms_norm, rms_norm
from sglang_tpu.layers.rotary import apply_rope
from sglang_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM


class DflashDraftModel(LlamaForCausalLM):
    architectures: list = []

    def __init__(self, config, num_context: int = 3):
        super().__init__(config)
        self.num_context = num_context
        self.use_qk_norm = bool(config.hf_config.get("use_qk_norm", False))

    # -------------------------------------------------------------- specs

    def param_specs(self) -> dict:
        c = self.config
        dt = c.dtype
        h = self.hidden_size
        inter = c.intermediate_size
        layer = {
            "input_norm": jax.ShapeDtypeStruct((h,), dt),
            "post_norm": jax.ShapeDtypeStruct((h,), dt),
            "q": jax.ShapeDtypeStruct((h, self.q_size), dt),
            "k": jax.ShapeDtypeStruct((h, self.kv_size), dt),
            "v": jax.ShapeDtypeStruct((h, self.kv_size), dt),
            "o": jax.ShapeDtypeStruct((self.q_size, h), dt),
            "gate_up": jax.ShapeDtypeStruct((h, 2 * inter), dt),
            "down": jax.ShapeDtypeStruct((inter, h), dt),
        }
        if self.use_qk_norm:
            layer["q_norm"] = jax.ShapeDtypeStruct((self.head_dim,), dt)
            layer["k_norm"] = jax.ShapeDtypeStruct((self.head_dim,), dt)
        return {
            "fc": jax.ShapeDtypeStruct((self.num_context * h, h), dt),
            "hidden_norm": jax.ShapeDtypeStruct((h,), dt),
            "layers": [dict(layer) for _ in range(self.num_layers)],
            "final_norm": jax.ShapeDtypeStruct((h,), dt),
        }

    def param_shardings(self) -> dict:
        specs = self.param_specs()

        def rep(tree):
            if isinstance(tree, dict):
                return {k: rep(v) for k, v in tree.items()}
            if isinstance(tree, list):
                return [rep(v) for v in tree]
            return P(*([None] * len(tree.shape)))

        return rep(specs)

    def weight_rules(self):
        rules = [
            WeightRule(("fc",), ["fc.weight"], kind="linear_raw"),
            WeightRule(("hidden_norm",), ["hidden_norm.weight"], kind="norm"),
            WeightRule(("final_norm",), ["norm.weight"], kind="norm"),
        ]
        for i in range(self.num_layers):
            lp = f"layers.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(L + ("input_norm",), [f"{lp}.input_layernorm.weight"], kind="norm"),
                WeightRule(L + ("post_norm",), [f"{lp}.post_attention_layernorm.weight"], kind="norm"),
                WeightRule(L + ("q",), [f"{lp}.self_attn.q_proj.weight"], kind="linear_raw"),
                WeightRule(L + ("k",), [f"{lp}.self_attn.k_proj.weight"], kind="linear_raw"),
                WeightRule(L + ("v",), [f"{lp}.self_attn.v_proj.weight"], kind="linear_raw"),
                WeightRule(L + ("o",), [f"{lp}.self_attn.o_proj.weight"], kind="linear_raw"),
                WeightRule(L + ("gate_up",), [f"{lp}.mlp.gate_proj.weight", f"{lp}.mlp.up_proj.weight"], kind="linear_raw"),
                WeightRule(L + ("down",), [f"{lp}.mlp.down_proj.weight"], kind="linear_raw"),
            ]
            if self.use_qk_norm:
                rules += [
                    WeightRule(L + ("q_norm",), [f"{lp}.self_attn.q_norm.weight"], kind="norm"),
                    WeightRule(L + ("k_norm",), [f"{lp}.self_attn.k_norm.weight"], kind="norm"),
                ]
        return rules

    # ------------------------------------------------------------ forward

    def project(self, params, target_aux):
        """concat target-layer features [N, K*H] -> draft context embeds."""
        h = jnp.dot(
            target_aux.astype(params["fc"].dtype), params["fc"],
            preferred_element_type=jnp.float32,
        ).astype(params["fc"].dtype)
        return rms_norm(h, params["hidden_norm"], self.config.rms_norm_eps)

    def forward_embeds(self, params, kv_layers, fb: ForwardBatch,
                       attn_backend, embeds):
        c = self.config
        eps = c.rms_norm_eps
        h = embeds.astype(c.dtype)
        t = h.shape[0]
        hd, qh, kvh = self.head_dim, self.num_q_heads, self.num_kv_heads
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            x = rms_norm(h, lp["input_norm"], eps)
            q = jnp.dot(x, lp["q"], preferred_element_type=jnp.float32).astype(
                x.dtype
            ).reshape(t, qh, hd)
            k = jnp.dot(x, lp["k"], preferred_element_type=jnp.float32).astype(
                x.dtype
            ).reshape(t, kvh, hd)
            v = jnp.dot(x, lp["v"], preferred_element_type=jnp.float32).astype(
                x.dtype
            ).reshape(t, kvh, hd)
            if self.use_qk_norm:
                q = gemma_rms_norm(q, lp["q_norm"], eps)
                k = gemma_rms_norm(k, lp["k_norm"], eps)
            q = apply_rope(q, fb.positions, self.inv_freq)
            k = apply_rope(k, fb.positions, self.inv_freq)
            attn_out, kv_new = attn_backend(
                q, k, v, kv_layers[i], fb, self.sm_scale
            )
            o = jnp.dot(
                attn_out.reshape(t, -1), lp["o"],
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            h = h + o
            x = rms_norm(h, lp["post_norm"], eps)
            gu = jnp.dot(
                x, lp["gate_up"], preferred_element_type=jnp.float32
            ).astype(x.dtype)
            h = h + jnp.dot(
                silu_and_mul(gu), lp["down"],
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            new_kv.append(kv_new)
        h = rms_norm(h, params["final_norm"], eps)
        return h, new_kv
