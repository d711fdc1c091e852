"""SmolLM3 decoder.

Parity with reference `srt/models/smollm3.py` / HF `modeling_smollm3.py`:
llama skeleton with interleaved NoPE — every `no_rope_layer_interval`-th
layer skips rotary embedding entirely (config `no_rope_layers`, 0 = NoPE).
Non-uniform layers keep the unrolled forward (the scanned forward needs
identical layer bodies)."""

from __future__ import annotations

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.norms import rms_norm
from sglang_tpu.layers.rotary import apply_rope
from sglang_tpu.models.llama import LlamaForCausalLM


class SmolLM3ForCausalLM(LlamaForCausalLM):
    architectures = ["SmolLM3ForCausalLM"]

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        flags = hf.get("no_rope_layers")
        if flags is None:
            interval = hf.get("no_rope_layer_interval", 4)
            flags = [
                0 if (i + 1) % interval == 0 else 1
                for i in range(self.num_layers)
            ]
        self.rope_on = [bool(f) for f in flags]

    def forward(self, params, kv_layers, fb, attn_backend):
        c = self.config
        h = self.embed_tokens(params, fb)
        new_kv = []
        saved_inv_freq = self.inv_freq
        for i in range(self.num_layers):
            # NoPE layers: zero frequencies make apply_rope the identity
            # (cos=1, sin=0) without forking decoder_layer
            self.inv_freq = (
                saved_inv_freq if self.rope_on[i] else saved_inv_freq * 0.0
            )
            h, kv_i = self.decoder_layer(
                params["layers"][i], h, kv_layers[i], fb, attn_backend
            )
            new_kv.append(kv_i)
        self.inv_freq = saved_inv_freq
        h = rms_norm(h, params["final_norm"], c.rms_norm_eps)
        return h, new_kv
