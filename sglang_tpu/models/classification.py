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
