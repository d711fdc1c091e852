"""DeepSeek MTP (multi-token-prediction) draft head.

Parity with reference `srt/models/deepseek_nextn.py` (the NEXTN
speculative draft used for DeepSeek-V3): the checkpoint's extra layer
`model.layers.{L}` (L = num_hidden_layers) holds a full MLA+MoE decoder
block plus the MTP glue — `enorm`/`hnorm` RMSNorms, `eh_proj` fusing
(normed token embedding, normed previous hidden), and a
`shared_head.norm`/`shared_head.head` output stack. Draft flow per step:

    x = eh_proj(concat(enorm(embed(token)), hnorm(feature)))
    h = deepseek_decoder_layer(x)          # MLA latent KV of its own
    logits = shared_head.head(shared_head.norm(h))

Same feature-level autoregression as EAGLE (`models/eagle.py`), so the
EAGLE worker drives it unchanged; only the draft module and the logits
head differ.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.norms import rms_norm
from sglang_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.deepseek_v2 import DeepseekV2ForCausalLM


class DeepseekMTPModel(DeepseekV2ForCausalLM):
    """One-layer MTP head; instantiated by the EAGLE/MTP worker with the
    TARGET model's config (the head lives inside the target checkpoint)."""

    architectures: List[str] = []

    def __init__(self, config, layer_index: int):
        import copy

        cfg = copy.copy(config)
        cfg.num_hidden_layers = 1
        self.layer_index = layer_index
        super().__init__(cfg)

    # ------------------------------------------------------------- specs

    def param_specs(self) -> dict:
        c = self.config
        dt = c.dtype
        h = self.hidden_size
        shapes, _ = self._layer_specs_for(self.layer_index)
        return {
            "embed": jax.ShapeDtypeStruct((c.vocab_size, h), dt),
            "enorm": jax.ShapeDtypeStruct((h,), dt),
            "hnorm": jax.ShapeDtypeStruct((h,), dt),
            "eh_proj": jax.ShapeDtypeStruct((2 * h, h), dt),
            "layers": [shapes],
            "head_norm": jax.ShapeDtypeStruct((h,), dt),
            "lm_head": jax.ShapeDtypeStruct((h, c.vocab_size), dt),
        }

    def param_shardings(self) -> dict:
        _, specs = self._layer_specs_for(self.layer_index)
        return {
            "embed": P(None, "model"),
            "enorm": P(None),
            "hnorm": P(None),
            "eh_proj": P(None, None),
            "layers": [specs],
            "head_norm": P(None),
            "lm_head": P(None, "model"),
        }

    def weight_rules(self) -> List[WeightRule]:
        lp = f"model.layers.{self.layer_index}"
        rules = [
            WeightRule(("embed",), [f"{lp}.embed_tokens.weight"], kind="embed"),
            WeightRule(("enorm",), [f"{lp}.enorm.weight"], kind="norm"),
            WeightRule(("hnorm",), [f"{lp}.hnorm.weight"], kind="norm"),
            WeightRule(("eh_proj",), [f"{lp}.eh_proj.weight"], kind="linear_raw"),
            WeightRule(
                ("head_norm",), [f"{lp}.shared_head.norm.weight"], kind="norm"
            ),
            WeightRule(
                ("lm_head",), [f"{lp}.shared_head.head.weight"], kind="lm_head"
            ),
        ]
        # the decoder-layer rules of DeepseekV2 (built for local layer 0),
        # re-pointed at the checkpoint's extra layer `layer_index`
        prefix = f"model.layers.{self.layer_index}."
        for r in super().weight_rules():
            if r.sources and r.sources[0].startswith("model.layers.0."):
                rules.append(
                    WeightRule(
                        r.target,
                        [
                            src.replace("model.layers.0.", prefix, 1)
                            for src in r.sources
                        ],
                        kind=r.kind,
                        method_key=r.method_key,
                    )
                )
        return rules

    def _is_moe(self, i: int) -> bool:
        # the MTP layer sits past first_k_dense_replace by construction
        return self.n_routed > 0

    # ----------------------------------------------------------- forward

    def forward_with_features(
        self,
        params: dict,
        kv_layers: List[jax.Array],
        fb: ForwardBatch,
        attn_backend,
        features: jax.Array,  # [T, H] target (or own) features
    ) -> Tuple[jax.Array, List[jax.Array]]:
        c = self.config
        emb = rms_norm(params["embed"][fb.input_ids], params["enorm"], c.rms_norm_eps)
        feat = rms_norm(features.astype(emb.dtype), params["hnorm"], c.rms_norm_eps)
        x = jnp.dot(
            jnp.concatenate([emb, feat], axis=-1),
            params["eh_proj"],
            preferred_element_type=jnp.float32,
        ).astype(emb.dtype)
        h, kv = self.ds_decoder_layer(
            params["layers"][0], x, kv_layers[0], fb, attn_backend,
            self.layer_index,
        )
        return h, [kv]

    def compute_logits(self, params: dict, hidden: jax.Array) -> jax.Array:
        h = rms_norm(hidden, params["head_norm"], self.config.rms_norm_eps)
        return jnp.dot(h, params["lm_head"], preferred_element_type=jnp.float32)
