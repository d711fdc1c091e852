"""EAGLE3 draft model (multi-layer feature fusion + draft vocab).

Parity with reference `srt/models/llama_eagle3.py LlamaForCausalLMEagle3`
and the public EAGLE3 checkpoints (yuhuili/EAGLE3-*): the TARGET model
captures hidden states entering 3 layers ([2, L//2, L-3] by default,
`set_eagle3_layers_to_capture`); the draft fuses them through
`fc: [3H] -> H`, then runs ONE decoder layer whose attention input is
`concat(input_layernorm(embed(token)), hidden_norm(hidden))` [2H], with
its own final norm and a DRAFT-vocab lm_head; `d2t` maps a sampled draft
id to a target id (`target = draft + d2t[draft]`).

Autoregression at the feature level: step 0 consumes the fused target aux
([3H] -> fc); later steps consume the draft's own pre-norm output (the
`aux` return of the reference model, `llama_eagle3.py:246`).

Checkpoint layout (top level, legacy names): `fc.weight` [H, 3H],
`midlayer.{input_layernorm,hidden_norm,post_attention_layernorm}.weight`,
`midlayer.self_attn.{q,k,v,o}_proj.weight` (q/k/v input dim 2H),
`midlayer.mlp.{gate,up,down}_proj.weight`, `norm.weight`,
`embed_tokens.weight`, `lm_head.weight` [draft_vocab, H], `d2t`, `t2d`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.activation import silu_and_mul
from sglang_tpu.layers.norms import rms_norm
from sglang_tpu.layers.rotary import apply_rope
from sglang_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM


class Eagle3LlamaForCausalLM(LlamaForCausalLM):
    """Draft-only model, instantiated by the EAGLE worker."""

    architectures: list = []

    def __init__(self, config, num_aux: int = 3):
        super().__init__(config)
        self.num_aux = num_aux
        hf = config.hf_config
        self.draft_vocab = hf.get("draft_vocab_size") or config.vocab_size

    # -------------------------------------------------------------- specs

    def param_specs(self) -> dict:
        c = self.config
        dt = c.dtype
        h = self.hidden_size
        inter = c.intermediate_size
        layer = {
            "input_norm": jax.ShapeDtypeStruct((h,), dt),
            "hidden_norm": jax.ShapeDtypeStruct((h,), dt),
            "post_norm": jax.ShapeDtypeStruct((h,), dt),
            "q": jax.ShapeDtypeStruct((2 * h, self.q_size), dt),
            "k": jax.ShapeDtypeStruct((2 * h, self.kv_size), dt),
            "v": jax.ShapeDtypeStruct((2 * h, self.kv_size), dt),
            "o": jax.ShapeDtypeStruct((self.q_size, h), dt),
            "gate_up": jax.ShapeDtypeStruct((h, 2 * inter), dt),
            "down": jax.ShapeDtypeStruct((inter, h), dt),
        }
        return {
            "embed": jax.ShapeDtypeStruct((c.vocab_size, h), dt),
            "fc": jax.ShapeDtypeStruct((self.num_aux * h, h), dt),
            "layers": [layer],
            "final_norm": jax.ShapeDtypeStruct((h,), dt),
            "lm_head": jax.ShapeDtypeStruct((h, self.draft_vocab), dt),
            "d2t": jax.ShapeDtypeStruct((self.draft_vocab,), jnp.int32),
        }

    def param_shardings(self) -> dict:
        layer = {
            k: P(None) if k.endswith("norm") else P(None, None)
            for k in self.param_specs()["layers"][0]
        }
        return {
            "embed": P(None, None),
            "fc": P(None, None),
            "layers": [layer],
            "final_norm": P(None),
            "lm_head": P(None, None),
            "d2t": P(None),
        }

    def weight_rules(self):
        return [
            WeightRule(("embed",), ["embed_tokens.weight"], kind="embed"),
            WeightRule(("fc",), ["fc.weight"], kind="linear_raw"),
            WeightRule(("final_norm",), ["norm.weight"], kind="norm"),
            WeightRule(("lm_head",), ["lm_head.weight"], kind="lm_head"),
            WeightRule(("d2t",), ["d2t"], kind="raw"),
            WeightRule(("layers", 0, "input_norm"), ["midlayer.input_layernorm.weight"], kind="norm"),
            WeightRule(("layers", 0, "hidden_norm"), ["midlayer.hidden_norm.weight"], kind="norm"),
            WeightRule(("layers", 0, "post_norm"), ["midlayer.post_attention_layernorm.weight"], kind="norm"),
            WeightRule(("layers", 0, "q"), ["midlayer.self_attn.q_proj.weight"], kind="linear_raw"),
            WeightRule(("layers", 0, "k"), ["midlayer.self_attn.k_proj.weight"], kind="linear_raw"),
            WeightRule(("layers", 0, "v"), ["midlayer.self_attn.v_proj.weight"], kind="linear_raw"),
            WeightRule(("layers", 0, "o"), ["midlayer.self_attn.o_proj.weight"], kind="linear_raw"),
            WeightRule(("layers", 0, "gate_up"), ["midlayer.mlp.gate_proj.weight", "midlayer.mlp.up_proj.weight"], kind="linear_raw"),
            WeightRule(("layers", 0, "down"), ["midlayer.mlp.down_proj.weight"], kind="linear_raw"),
        ]

    # ------------------------------------------------------------ forward

    def forward_with_features(
        self, params, kv_layers, fb: ForwardBatch, attn_backend, feats
    ):
        """feats [T, num_aux*H] (fused target aux, fc applied here) or
        [T, H] (the draft's own previous pre-norm output). Returns
        (pre-norm hidden [T, H], new_kv) — `compute_logits` applies the
        final norm + draft lm_head."""
        c = self.config
        eps = c.rms_norm_eps
        lp = params["layers"][0]
        t = fb.input_ids.shape[0]
        embeds = params["embed"][fb.input_ids]
        feats = feats.astype(embeds.dtype)
        if feats.shape[-1] != self.hidden_size:
            hidden = jnp.dot(
                feats, params["fc"], preferred_element_type=jnp.float32
            ).astype(embeds.dtype)
        else:
            hidden = feats
        residual = hidden
        x = jnp.concatenate(
            [
                rms_norm(embeds, lp["input_norm"], eps),
                rms_norm(hidden, lp["hidden_norm"], eps),
            ],
            axis=-1,
        )  # [T, 2H]
        hd, qh, kvh = self.head_dim, self.num_q_heads, self.num_kv_heads
        q = jnp.dot(x, lp["q"], preferred_element_type=jnp.float32).astype(
            x.dtype
        ).reshape(t, qh, hd)
        k = jnp.dot(x, lp["k"], preferred_element_type=jnp.float32).astype(
            x.dtype
        ).reshape(t, kvh, hd)
        v = jnp.dot(x, lp["v"], preferred_element_type=jnp.float32).astype(
            x.dtype
        ).reshape(t, kvh, hd)
        q = apply_rope(q, fb.positions, self.inv_freq)
        k = apply_rope(k, fb.positions, self.inv_freq)
        attn_out, kv_new = attn_backend(q, k, v, kv_layers[0], fb, self.sm_scale)
        o = jnp.dot(
            attn_out.reshape(t, -1), lp["o"], preferred_element_type=jnp.float32
        ).astype(x.dtype)
        resid2 = o + residual
        mlp_in = rms_norm(resid2, lp["post_norm"], eps)
        gu = jnp.dot(
            mlp_in, lp["gate_up"], preferred_element_type=jnp.float32
        ).astype(x.dtype)
        mlp_out = jnp.dot(
            silu_and_mul(gu), lp["down"], preferred_element_type=jnp.float32
        ).astype(x.dtype)
        pre = mlp_out + resid2  # pre-norm output = next step's feature
        return pre, [kv_new]

    def compute_logits(self, params, hidden):
        h = rms_norm(hidden, params["final_norm"], self.config.rms_norm_eps)
        return jnp.dot(h, params["lm_head"], preferred_element_type=jnp.float32)

    def map_draft_ids(self, params, draft_ids):
        """draft-vocab id -> target-vocab id (d2t stores the offset)."""
        return draft_ids + params["d2t"][draft_ids]
