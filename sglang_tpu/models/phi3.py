"""Phi-3 / Phi-3.5 / Phi-4 family.

Parity with reference `srt/models/phi3*.py` and HF
`transformers/models/phi3/modeling_phi3.py`: the llama skeleton with the
QKV and gate/up projections stored PRE-FUSED in the checkpoint
(`qkv_proj.weight`, `gate_up_proj.weight`) and su-scaled "longrope"
position scaling (short/long per-dim factors + attention magnitude factor,
handled by `layers/rotary.py compute_inv_freq` + `rope_mscale`).
"""

from __future__ import annotations

from typing import List

from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM


class Phi3ForCausalLM(LlamaForCausalLM):
    architectures = ["Phi3ForCausalLM", "Phi3SmallForCausalLM"]

    def weight_rules(self) -> List[WeightRule]:
        pre = self.hf_prefix
        rules = [
            WeightRule(("embed",), [f"{pre}.embed_tokens.weight"], kind="embed"),
            WeightRule(("final_norm",), [f"{pre}.norm.weight"], kind="norm"),
        ]
        if not self.config.tie_word_embeddings:
            rules.append(
                WeightRule(("lm_head",), ["lm_head.weight"], kind="lm_head")
            )
        for i in range(self.num_layers):
            lp = f"{pre}.layers.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(L + ("input_norm",), [f"{lp}.input_layernorm.weight"], kind="norm"),
                WeightRule(L + ("post_norm",), [f"{lp}.post_attention_layernorm.weight"], kind="norm"),
                # checkpoint ships the projections already fused
                WeightRule(L + ("qkv",), [f"{lp}.self_attn.qkv_proj.weight"], kind="linear", method_key="qkv"),
                WeightRule(L + ("o",), [f"{lp}.self_attn.o_proj.weight"], kind="linear", method_key="o"),
                WeightRule(L + ("gate_up",), [f"{lp}.mlp.gate_up_proj.weight"], kind="linear", method_key="gate_up"),
                WeightRule(L + ("down",), [f"{lp}.mlp.down_proj.weight"], kind="linear", method_key="down"),
            ]
        return rules
