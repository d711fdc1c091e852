"""Sequence-classification / reward-model heads over decoder backbones.

Parity with reference `srt/models/llama_classification.py`,
`srt/models/qwen2_classification.py`, `srt/models/qwen2_rm.py`,
`srt/models/qwen3_classification.py` (the bge/Qwen3 reranker family):
the base decoder runs as usual, the last-token hidden state is pooled and
projected through a `score` head [H, num_labels]. Served through
`Engine.encode`/`/v1/classify` — the "embedding" is the label logits
(reward models are num_labels == 1).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import (
    LlamaForCausalLM,
    Qwen2ForCausalLM,
    Qwen3ForCausalLM,
)


def _make_classification(base_cls, arch_names):
    class _Classification(base_cls):
        architectures = list(arch_names)
        is_classifier = True

        def __init__(self, config: ModelConfig):
            config.tie_word_embeddings = True  # no lm_head in the checkpoint
            super().__init__(config)
            hf = config.hf_config
            # HF serializes num_labels as the id2label map
            n = hf.get("num_labels") or len(hf.get("id2label") or ()) or 1
            self.num_labels = int(n)

        def param_specs(self) -> dict:
            tree = super().param_specs()
            tree["score"] = jax.ShapeDtypeStruct(
                (self.hidden_size, self.num_labels), self.config.dtype
            )
            return tree

        def param_shardings(self) -> dict:
            tree = super().param_shardings()
            tree["score"] = P(None, None)
            return tree

        def weight_rules(self) -> List[WeightRule]:
            rules = super().weight_rules()
            rules.append(
                WeightRule(("score",), ["score.weight"], kind="lm_head")
            )
            return rules

        def head(self, params: dict, pooled: jax.Array) -> jax.Array:
            """pooled [B, H] -> label logits [B, num_labels] (fp32)."""
            return jnp.dot(
                pooled, params["score"], preferred_element_type=jnp.float32
            )

    _Classification.__name__ = arch_names[0]
    return _Classification


LlamaForSequenceClassification = _make_classification(
    LlamaForCausalLM, ["LlamaForSequenceClassification"]
)
Qwen2ForSequenceClassification = _make_classification(
    Qwen2ForCausalLM, ["Qwen2ForSequenceClassification"]
)
Qwen3ForSequenceClassification = _make_classification(
    Qwen3ForCausalLM, ["Qwen3ForSequenceClassification"]
)


Gemma2ForSequenceClassification = None
try:
    from sglang_tpu.models.gemma2 import Gemma2ForCausalLM

    Gemma2ForSequenceClassification = _make_classification(
        Gemma2ForCausalLM, ["Gemma2ForSequenceClassification"]
    )
except ImportError:
    pass


class Qwen2ForRewardModel(Qwen2ForCausalLM):
    """Reward model: qwen2 backbone + a 2-layer score head
    (Linear -> ReLU -> Linear[num_labels]) on the LAST-token hidden
    state (reference `srt/models/qwen2_rm.py:33`; checkpoint keys
    score.0.* / score.2.*)."""

    architectures = ["Qwen2ForRewardModel"]
    is_classifier = True

    def __init__(self, config: ModelConfig):
        config.tie_word_embeddings = True  # no lm_head in the checkpoint
        super().__init__(config)
        self.num_labels = int(config.hf_config.get("num_labels") or 1)

    def param_specs(self) -> dict:
        tree = super().param_specs()
        dt = self.config.dtype
        h = self.hidden_size
        tree["score0"] = {
            "w": jax.ShapeDtypeStruct((h, h), dt),
            "b": jax.ShapeDtypeStruct((h,), dt),
        }
        tree["score2"] = {
            "w": jax.ShapeDtypeStruct((h, self.num_labels), dt),
            "b": jax.ShapeDtypeStruct((self.num_labels,), dt),
        }
        return tree

    def param_shardings(self) -> dict:
        tree = super().param_shardings()
        tree["score0"] = {"w": P(None, None), "b": P(None)}
        tree["score2"] = {"w": P(None, None), "b": P(None)}
        return tree

    def weight_rules(self) -> List[WeightRule]:
        rules = super().weight_rules()
        rules += [
            WeightRule(("score0", "w"), ["score.0.weight"], kind="linear_raw"),
            WeightRule(("score0", "b"), ["score.0.bias"], kind="norm"),
            WeightRule(("score2", "w"), ["score.2.weight"], kind="linear_raw"),
            WeightRule(("score2", "b"), ["score.2.bias"], kind="norm"),
        ]
        return rules

    def head(self, params: dict, pooled: jax.Array) -> jax.Array:
        x = (
            jnp.dot(
                pooled, params["score0"]["w"],
                preferred_element_type=jnp.float32,
            )
            + params["score0"]["b"].astype(jnp.float32)
        )
        x = jax.nn.relu(x)
        return (
            jnp.dot(
                x.astype(pooled.dtype), params["score2"]["w"],
                preferred_element_type=jnp.float32,
            )
            + params["score2"]["b"].astype(jnp.float32)
        )
