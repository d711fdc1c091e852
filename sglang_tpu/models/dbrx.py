"""DBRX (Databricks) decoder.

Parity with reference `srt/models/dbrx.py` / HF `modeling_dbrx.py`:
bias-free LayerNorm sandwich (norm_1 -> attn -> norm_2 -> MoE), fused
Wqkv with optional `clip_qkv` clamping, and a 16-expert top-k MoE whose
expert tensors ship FLATTENED ([E*ffn, hidden] w1/v1/w2); the router
softmaxes first, then top-ks and L1-normalizes the selected weights
(`moe_normalize_expert_weights=1` == our norm_topk_prob path)."""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.moe import EPMoEMixin, moe_forward, moe_shapes, moe_specs
from sglang_tpu.layers.norms import layer_norm
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM


class DbrxForCausalLM(EPMoEMixin, LlamaForCausalLM):
    architectures = ["DbrxForCausalLM"]
    hf_prefix = "transformer"
    supports_chain_tail = False

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        ac = hf.get("attn_config") or {}
        if not isinstance(ac, dict):
            ac = ac.to_dict()
        fc = hf.get("ffn_config") or {}
        if not isinstance(fc, dict):
            fc = fc.to_dict()
        # DBRX nests the GQA/rope/MoE geometry; hoist before base init
        hf.setdefault("num_key_value_heads", ac.get("kv_n_heads", 1))
        hf.setdefault("rope_theta", ac.get("rope_theta", 10000.0))
        hf.setdefault("intermediate_size", fc.get("ffn_hidden_size", 0))
        config.num_key_value_heads = int(hf["num_key_value_heads"])
        config.rope_theta = float(hf["rope_theta"])
        config.intermediate_size = int(hf["intermediate_size"])
        super().__init__(config)
        self.clip_qkv = ac.get("clip_qkv")
        self.num_experts = int(fc.get("moe_num_experts", 16))
        self.top_k = int(fc.get("moe_top_k", 4))
        self.moe_inter = int(fc.get("ffn_hidden_size"))
        pnorm = fc.get("moe_normalize_expert_weights", 1)
        assert pnorm in (None, 1, 1.0), "only L1 weight normalization"
        self.norm_topk_prob = pnorm is not None
        self.ln_eps = 1e-5

    # bias-free LayerNorm replaces RMSNorm (same param shapes)
    def mlp_shapes(self):
        return moe_shapes(
            self.hidden_size, self.moe_inter, self.num_experts,
            self.config.dtype,
        )

    def mlp_specs(self):
        return moe_specs(ep=self.use_ep)

    def mlp_forward(self, lp, x, lora=None, lora_ids=None):
        return moe_forward(
            self, lp, x, top_k=self.top_k, norm_topk_prob=self.norm_topk_prob
        )

    def _w1_transform(self):
        e, m, h = self.num_experts, self.moe_inter, self.hidden_size

        def f(w):  # [H, 2*E*M] (w1 cols then v1 cols) -> [E, H, 2M]
            g = w[:, : e * m].reshape(h, e, m)
            u = w[:, e * m :].reshape(h, e, m)
            return np.concatenate([g, u], axis=-1).transpose(1, 0, 2)

        return f

    def _w2_transform(self):
        e, m, h = self.num_experts, self.moe_inter, self.hidden_size

        def f(w):  # flat [E*M, H] -> [E, M, H] (stored un-transposed)
            return w.reshape(e, m, h)

        return f

    def weight_rules(self) -> List[WeightRule]:
        pre = self.hf_prefix
        rules = [
            WeightRule(("embed",), [f"{pre}.wte.weight"], kind="embed"),
            WeightRule(("final_norm",), [f"{pre}.norm_f.weight"], kind="norm"),
        ]
        if not self.config.tie_word_embeddings:
            rules.append(
                WeightRule(("lm_head",), ["lm_head.weight"], kind="lm_head")
            )
        for i in range(self.num_layers):
            lp = f"{pre}.blocks.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(L + ("input_norm",), [f"{lp}.norm_attn_norm.norm_1.weight"], kind="norm"),
                WeightRule(L + ("post_norm",), [f"{lp}.norm_attn_norm.norm_2.weight"], kind="norm"),
                WeightRule(
                    L + ("qkv",), [f"{lp}.norm_attn_norm.attn.Wqkv.weight"],
                    kind="linear", method_key="qkv",
                ),
                WeightRule(
                    L + ("o",), [f"{lp}.norm_attn_norm.attn.out_proj.weight"],
                    kind="linear", method_key="o",
                ),
                WeightRule(L + ("router",), [f"{lp}.ffn.router.layer.weight"], kind="router"),
                WeightRule(
                    L + ("w1",),
                    [f"{lp}.ffn.experts.mlp.w1", f"{lp}.ffn.experts.mlp.v1"],
                    kind="linear_raw", transform=self._w1_transform(),
                ),
                WeightRule(
                    L + ("w2",),
                    [f"{lp}.ffn.experts.mlp.w2"],
                    kind="raw", transform=self._w2_transform(),
                ),
            ]
        return rules

    def forward(self, params, kv_layers, fb, attn_backend):
        from sglang_tpu.layers.rotary import apply_rope

        c = self.config
        t = fb.input_ids.shape[0]
        h = self.embed_tokens(params, fb)
        zeros = jnp.zeros((self.hidden_size,), c.dtype)
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            a = layer_norm(h, lp["input_norm"], zeros, self.ln_eps)
            qkv = self.methods["qkv"].apply(lp["qkv"], a)
            if self.clip_qkv:
                qkv = jnp.clip(qkv, -self.clip_qkv, self.clip_qkv)
            q = qkv[:, : self.q_size].reshape(t, self.num_q_heads, self.head_dim)
            k = qkv[:, self.q_size : self.q_size + self.kv_size].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            v = qkv[:, self.q_size + self.kv_size :].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            q = apply_rope(q, fb.positions, self.inv_freq)
            k = apply_rope(k, fb.positions, self.inv_freq)
            attn_out, kv_i = attn_backend(
                q, k, v, kv_layers[i], fb, self.sm_scale
            )
            new_kv.append(kv_i)
            h = h + self.methods["o"].apply(
                lp["o"], attn_out.reshape(t, self.q_size)
            )
            a = layer_norm(h, lp["post_norm"], zeros, self.ln_eps)
            h = h + self.mlp_forward(lp, a)
        h = layer_norm(h, params["final_norm"], zeros, self.ln_eps)
        return h, new_kv
