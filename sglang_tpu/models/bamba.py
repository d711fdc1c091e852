"""Bamba (IBM): hybrid Mamba2 + attention decoder.

Parity with reference `srt/models/bamba.py`-class hybrid support
(Nemotron-H/Jamba family: most layers are SSD mixers, a few are full GQA
attention) and HF `transformers/models/bamba/modeling_bamba.py`. Layer
kinds come from `attn_layer_indices`; attention layers use PARTIAL rotary
(`partial_rotary_factor`, default 0.5). Per layer:
input_layernorm -> (mamba | self_attn) -> +res -> pre_ff_layernorm ->
SwiGLU MLP -> +res.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.activation import silu_and_mul
from sglang_tpu.layers.norms import rms_norm
from sglang_tpu.layers.rotary import apply_rope, compute_inv_freq
from sglang_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import _linear_sharding
from sglang_tpu.models.mamba2 import Mamba2ForCausalLM


class BambaForCausalLM(Mamba2ForCausalLM):
    architectures = ["BambaForCausalLM"]
    hf_prefix = "model"

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        # mamba geometry lives under mamba_* keys; map onto the Mamba2 base
        hf = dict(hf)
        hf["state_size"] = hf.get("mamba_d_state", 128)
        hf["expand"] = hf.get("mamba_expand", 2)
        hf["num_heads"] = hf.get("mamba_n_heads", 128)
        hf["head_dim"] = hf.get("head_dim") or (
            config.hidden_size // max(1, hf.get("num_attention_heads", 1))
        )
        hf["n_groups"] = hf.get("mamba_n_groups", 1)
        hf["conv_kernel"] = hf.get("mamba_d_conv", 4)
        hf["use_conv_bias"] = hf.get("mamba_conv_bias", True)
        config.hf_config = hf
        super().__init__(config)
        # Mamba2 base derived the mixer geometry from pure-SSM keys; Bamba's
        # intermediate_size is the MLP width, and its mixer head dim lives
        # under mamba_d_head — recompute the SSD geometry
        self.d_inner = hf["expand"] * config.hidden_size
        self.mamba_head_dim = hf.get("mamba_d_head", 64)
        self.mamba_heads = hf.get("mamba_n_heads", 128)
        self.conv_dim = self.d_inner + 2 * self.n_groups * self.d_state
        self.mamba_geom = (
            self.mamba_heads, self.mamba_head_dim, self.n_groups, self.d_state
        )
        self.mixer_eps = config.rms_norm_eps
        attn_idx = set(hf.get("attn_layer_indices") or [])
        lt = hf.get("layers_block_type") or hf.get("layer_types")
        if lt:
            self.layer_types = list(lt)
        else:
            self.layer_types = [
                "attention" if i in attn_idx else "mamba"
                for i in range(self.num_layers)
            ]
        pr = hf.get("partial_rotary_factor", 0.5)
        self.inv_freq = jnp.asarray(
            compute_inv_freq(
                self.head_dim,
                config.rope_theta,
                config.rope_scaling,
                rotary_dim=int(self.head_dim * pr),
            )
        )

    @property
    def kv_kinds(self) -> List[str]:
        return [
            "paged" if t == "attention" else "linear"
            for t in self.layer_types
        ]

    # -------------------------------------------------------------- specs

    def _attn_shapes_specs(self) -> Tuple[dict, dict]:
        dt = self.config.dtype
        h = self.hidden_size
        shapes = dict(
            q=self.methods["qkv"].weight_shapes(h, self.q_size, dt),
            k=self.methods["qkv"].weight_shapes(h, self.kv_size, dt),
            v=self.methods["qkv"].weight_shapes(h, self.kv_size, dt),
            o=self.methods["o"].weight_shapes(self.q_size, h, dt),
        )
        specs = dict(
            q=_linear_sharding(self.methods["qkv"], col_parallel=True),
            k=_linear_sharding(self.methods["qkv"], col_parallel=True),
            v=_linear_sharding(self.methods["qkv"], col_parallel=True),
            o=_linear_sharding(self.methods["o"], col_parallel=False),
        )
        return shapes, specs

    def _layer_shapes_specs(self, i: int) -> Tuple[dict, dict]:
        c = self.config
        dt = c.dtype
        h = self.hidden_size
        inter = c.intermediate_size
        if self.layer_types[i] == "attention":
            shapes, specs = self._attn_shapes_specs()
        else:
            shapes, specs = self._mixer_shapes_specs()
        shapes.update(
            input_norm=jax.ShapeDtypeStruct((h,), dt),
            pre_ff_norm=jax.ShapeDtypeStruct((h,), dt),
            gate_up=self.methods["gate_up"].weight_shapes(h, 2 * inter, dt),
            down=self.methods["down"].weight_shapes(inter, h, dt),
        )
        specs.update(
            input_norm=P(None),
            pre_ff_norm=P(None),
            gate_up=_linear_sharding(self.methods["gate_up"], col_parallel=True),
            down=_linear_sharding(self.methods["down"], col_parallel=False),
        )
        return shapes, specs

    # ------------------------------------------------------------- loading

    def weight_rules(self) -> List[WeightRule]:
        pre = self.hf_prefix
        rules = [
            WeightRule(("embed",), [f"{pre}.embed_tokens.weight"], kind="embed"),
            WeightRule(("final_norm",), [f"{pre}.final_layernorm.weight"], kind="norm"),
        ]
        if not self.config.tie_word_embeddings:
            rules.append(WeightRule(("lm_head",), ["lm_head.weight"], kind="lm_head"))
        for i in range(self.num_layers):
            lp = f"{pre}.layers.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(L + ("input_norm",), [f"{lp}.input_layernorm.weight"], kind="norm"),
                WeightRule(L + ("pre_ff_norm",), [f"{lp}.pre_ff_layernorm.weight"], kind="norm"),
                WeightRule(
                    L + ("gate_up",),
                    [f"{lp}.feed_forward.gate_proj.weight", f"{lp}.feed_forward.up_proj.weight"],
                    kind="linear", method_key="gate_up",
                ),
                WeightRule(L + ("down",), [f"{lp}.feed_forward.down_proj.weight"], kind="linear", method_key="down"),
            ]
            if self.layer_types[i] == "attention":
                rules += [
                    WeightRule(L + ("q",), [f"{lp}.self_attn.q_proj.weight"], kind="linear", method_key="qkv"),
                    WeightRule(L + ("k",), [f"{lp}.self_attn.k_proj.weight"], kind="linear", method_key="qkv"),
                    WeightRule(L + ("v",), [f"{lp}.self_attn.v_proj.weight"], kind="linear", method_key="qkv"),
                    WeightRule(L + ("o",), [f"{lp}.self_attn.o_proj.weight"], kind="linear", method_key="o"),
                ]
            else:
                rules += self._mixer_rules(f"{lp}.mamba", L)
        return rules

    # ------------------------------------------------------------- forward

    def _attn_layer(self, lp, normed, kv_layer, fb, attn_backend):
        t = normed.shape[0]
        hd, qh, kvh = self.head_dim, self.num_q_heads, self.num_kv_heads
        q = self.methods["qkv"].apply(lp["q"], normed).reshape(t, qh, hd)
        k = self.methods["qkv"].apply(lp["k"], normed).reshape(t, kvh, hd)
        v = self.methods["qkv"].apply(lp["v"], normed).reshape(t, kvh, hd)
        q = apply_rope(q, fb.positions, self.inv_freq)
        k = apply_rope(k, fb.positions, self.inv_freq)
        attn_out, kv_new = attn_backend(q, k, v, kv_layer, fb, self.sm_scale)
        out = self.methods["o"].apply(lp["o"], attn_out.reshape(t, -1))
        return out, kv_new

    def forward(self, params, kv_layers, fb: ForwardBatch, attn_backend):
        c = self.config
        assert fb.state_slots is not None
        h = self.embed_tokens(params, fb)
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            normed = rms_norm(h, lp["input_norm"], c.rms_norm_eps)
            if self.layer_types[i] == "attention":
                out, kv_i = self._attn_layer(
                    lp, normed, kv_layers[i], fb, attn_backend
                )
            else:
                out, kv_i = self.mamba_mixer(lp, normed, kv_layers[i], fb)
            h = h + out
            normed = rms_norm(h, lp["pre_ff_norm"], c.rms_norm_eps)
            gu = self.methods["gate_up"].apply(lp["gate_up"], normed)
            h = h + self.methods["down"].apply(lp["down"], silu_and_mul(gu))
            new_kv.append(kv_i)
        h = rms_norm(h, params["final_norm"], c.rms_norm_eps)
        return h, new_kv
