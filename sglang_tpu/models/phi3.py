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

import jax.numpy as jnp

from sglang_tpu.layers.rotary import compute_inv_freq
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


class Phi4MultimodalForCausalLM(Phi3ForCausalLM):
    """Phi-4-multimodal TEXT path (reference `srt/models/phi4mm.py`): the
    base decoder is a Phi-3 layout with partial rotary; the vision/audio
    towers attach through LoRA adapters that only activate on mm tokens,
    so text-only serving of a phi-4-multimodal checkpoint equals the base
    decoder with the adapters unloaded (HF does the same when no
    image/audio inputs are given)."""

    architectures = ["Phi4MMForCausalLM", "Phi4MultimodalForCausalLM"]

    def __init__(self, config):
        super().__init__(config)
        c = config
        f = float(c.hf_config.get("partial_rotary_factor") or 1.0)
        if f < 1.0:
            rot = int(self.head_dim * f)
            self.inv_freq = jnp.asarray(
                compute_inv_freq(rot, c.rope_theta, c.rope_scaling)
            )
