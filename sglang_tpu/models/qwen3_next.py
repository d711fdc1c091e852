"""Qwen3-Next: hybrid linear-attention (Gated DeltaNet) + gated full
attention + shared-expert MoE.

Parity with reference `srt/models/qwen3_next.py` +
`srt/layers/attention/hybrid_linear_attn_backend.py` and HF
`transformers/models/qwen3_next/modeling_qwen3_next.py`. This is the A8
"hybrid linear attention" model-capability axis: 3 of every 4 layers carry
NO KV cache — their state is a fixed-size recurrent pool (see
`layers/linear_attn.py`), so long contexts cost O(1) memory on those
layers.

TPU serving design:
- `kv_kinds` tells the ModelRunner which layers get paged-KV arrays and
  which get slot-indexed state pools; both ride the donated kv_layers list.
- full-attention layers: output-gated attention (q_proj emits q|gate per
  head), per-head q/k RMSNorm, PARTIAL rotary (rotary_dim = 0.25 * 256).
- linear layers: in_proj_qkvz/in_proj_ba -> depthwise causal conv ->
  gated delta rule -> gated RMSNorm(z) -> out_proj.
- MLP: dense, or Qwen2-MoE-style shared-expert MoE
  ((i+1) % decoder_sparse_step == 0), reusing the fused ragged-dot MoE.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.activation import silu_and_mul
from sglang_tpu.layers.linear_attn import (
    gated_rms_norm,
    gdn_decode,
    gdn_extend,
)
from sglang_tpu.layers.moe import fused_moe, moe_shapes, moe_specs
from sglang_tpu.layers.norms import gemma_rms_norm, rms_norm
from sglang_tpu.layers.rotary import apply_rope, compute_inv_freq
from sglang_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM, _linear_sharding


class Qwen3NextForCausalLM(LlamaForCausalLM):
    architectures = ["Qwen3NextForCausalLM"]

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        c = config
        self.head_dim = hf.get("head_dim", 256)
        self.q_size = self.num_q_heads * self.head_dim
        self.kv_size = self.num_kv_heads * self.head_dim
        self.sm_scale = 1.0 / math.sqrt(self.head_dim)
        self.layer_types: List[str] = hf.get(
            "layer_types",
            [
                "linear_attention" if (i + 1) % 4 else "full_attention"
                for i in range(self.num_layers)
            ],
        )
        # GDN geometry
        self.nk = hf.get("linear_num_key_heads", 16)
        self.nv = hf.get("linear_num_value_heads", 32)
        self.dk = hf.get("linear_key_head_dim", 128)
        self.dv = hf.get("linear_value_head_dim", 128)
        self.conv_k = hf.get("linear_conv_kernel_dim", 4)
        self.key_dim = self.nk * self.dk
        self.value_dim = self.nv * self.dv
        self.conv_dim = 2 * self.key_dim + self.value_dim
        self.gdn_geom = (self.nk, self.dk, self.nv, self.dv)
        # partial rotary
        pr = hf.get("partial_rotary_factor", 0.25)
        self.inv_freq = jnp.asarray(
            compute_inv_freq(
                self.head_dim,
                c.rope_theta,
                c.rope_scaling,
                rotary_dim=int(self.head_dim * pr),
            )
        )
        # MoE geometry (Qwen2-MoE-style shared expert)
        self.num_experts = c.num_experts or 0
        self.top_k = c.num_experts_per_tok
        self.moe_inter = c.moe_intermediate_size or c.intermediate_size
        self.norm_topk_prob = c.norm_topk_prob
        self.shared_inter = hf.get("shared_expert_intermediate_size", 0)
        self.sparse_step = hf.get("decoder_sparse_step", 1)
        self.mlp_only = set(hf.get("mlp_only_layers", []) or [])

    # ---------------------------------------------------- layout contracts

    @property
    def kv_kinds(self) -> List[str]:
        return [
            "paged" if t == "full_attention" else "linear"
            for t in self.layer_types
        ]

    def state_specs(self, slots: int) -> dict:
        """Per-linear-layer recurrent state pool specs (+1 sentinel row)."""
        return {
            "conv": jax.ShapeDtypeStruct(
                (slots + 1, self.conv_dim, self.conv_k - 1), jnp.float32
            ),
            "rec": jax.ShapeDtypeStruct(
                (slots + 1, self.nv, self.dk, self.dv), jnp.float32
            ),
        }

    def _mlp_is_moe(self, i: int) -> bool:
        return (
            self.num_experts > 0
            and i not in self.mlp_only
            and (i + 1) % self.sparse_step == 0
        )

    # -------------------------------------------------------------- specs

    def _mlp_shapes_for(self, i: int) -> dict:
        if not self._mlp_is_moe(i):
            return LlamaForCausalLM.mlp_shapes(self)
        c = self.config
        shapes = moe_shapes(
            self.hidden_size, self.moe_inter, self.num_experts, c.dtype
        )
        if self.shared_inter:
            shapes["shared_gate_up"] = self.methods["gate_up"].weight_shapes(
                self.hidden_size, 2 * self.shared_inter, c.dtype
            )
            shapes["shared_down"] = self.methods["down"].weight_shapes(
                self.shared_inter, self.hidden_size, c.dtype
            )
            shapes["shared_gate"] = jax.ShapeDtypeStruct(
                (self.hidden_size, 1), jnp.float32
            )
        return shapes

    def _mlp_specs_for(self, i: int) -> dict:
        if not self._mlp_is_moe(i):
            return LlamaForCausalLM.mlp_specs(self)
        specs = moe_specs()
        if self.shared_inter:
            specs["shared_gate_up"] = _linear_sharding(
                self.methods["gate_up"], col_parallel=True
            )
            specs["shared_down"] = _linear_sharding(
                self.methods["down"], col_parallel=False
            )
            specs["shared_gate"] = P(None, None)
        return specs

    def _layer_shapes_specs(self, i: int) -> Tuple[dict, dict]:
        c = self.config
        dt = c.dtype
        h = self.hidden_size
        shapes = {
            "input_norm": jax.ShapeDtypeStruct((h,), dt),
            "post_norm": jax.ShapeDtypeStruct((h,), dt),
            **self._mlp_shapes_for(i),
        }
        specs = {
            "input_norm": P(None),
            "post_norm": P(None),
            **self._mlp_specs_for(i),
        }
        if self.layer_types[i] == "full_attention":
            shapes.update(
                q=self.methods["qkv"].weight_shapes(h, 2 * self.q_size, dt),
                k=self.methods["qkv"].weight_shapes(h, self.kv_size, dt),
                v=self.methods["qkv"].weight_shapes(h, self.kv_size, dt),
                o=self.methods["o"].weight_shapes(self.q_size, h, dt),
                q_norm=jax.ShapeDtypeStruct((self.head_dim,), dt),
                k_norm=jax.ShapeDtypeStruct((self.head_dim,), dt),
            )
            specs.update(
                q=_linear_sharding(self.methods["qkv"], col_parallel=True),
                k=_linear_sharding(self.methods["qkv"], col_parallel=True),
                v=_linear_sharding(self.methods["qkv"], col_parallel=True),
                o=_linear_sharding(self.methods["o"], col_parallel=False),
                q_norm=P(None),
                k_norm=P(None),
            )
        else:
            qkvz_dim = 2 * self.key_dim + 2 * self.value_dim
            shapes.update(
                in_qkvz=self.methods["qkv"].weight_shapes(h, qkvz_dim, dt),
                in_ba=self.methods["qkv"].weight_shapes(h, 2 * self.nv, dt),
                conv_w=jax.ShapeDtypeStruct(
                    (self.conv_dim, 1, self.conv_k), dt
                ),
                dt_bias=jax.ShapeDtypeStruct((self.nv,), jnp.float32),
                a_log=jax.ShapeDtypeStruct((self.nv,), jnp.float32),
                gdn_norm=jax.ShapeDtypeStruct((self.dv,), dt),
                out_proj=self.methods["o"].weight_shapes(self.value_dim, h, dt),
            )
            specs.update(
                in_qkvz=_linear_sharding(self.methods["qkv"], col_parallel=True),
                in_ba=_linear_sharding(self.methods["qkv"], col_parallel=True),
                conv_w=P(None, None, None),
                dt_bias=P(None),
                a_log=P(None),
                gdn_norm=P(None),
                out_proj=_linear_sharding(self.methods["o"], col_parallel=False),
            )
        return shapes, specs

    def param_specs(self) -> dict:
        c = self.config
        tree = {
            "embed": jax.ShapeDtypeStruct((c.vocab_size, c.hidden_size), c.dtype),
            "layers": [
                self._layer_shapes_specs(i)[0] for i in range(self.num_layers)
            ],
            "final_norm": jax.ShapeDtypeStruct((c.hidden_size,), c.dtype),
        }
        if not c.tie_word_embeddings:
            tree["lm_head"] = jax.ShapeDtypeStruct(
                (c.hidden_size, c.vocab_size), c.dtype
            )
        return tree

    def param_shardings(self) -> dict:
        tree = {
            "embed": P(None, "model"),
            "layers": [
                self._layer_shapes_specs(i)[1] for i in range(self.num_layers)
            ],
            "final_norm": P(None),
        }
        if not self.config.tie_word_embeddings:
            tree["lm_head"] = P(None, "model")
        return tree

    # ------------------------------------------------------------- loading

    def _mlp_rules_for(self, i: int, lp: str, L: tuple) -> List[WeightRule]:
        if not self._mlp_is_moe(i):
            return LlamaForCausalLM.mlp_weight_rules(self, lp, L)
        e = self.num_experts
        rules = [
            WeightRule(L + ("router",), [f"{lp}.mlp.gate.weight"], kind="router"),
            WeightRule(
                L + ("w1",),
                [
                    f"{lp}.mlp.experts.{j}.{n}.weight"
                    for j in range(e)
                    for n in ("gate_proj", "up_proj")
                ],
                kind="moe_w1",
            ),
            WeightRule(
                L + ("w2",),
                [f"{lp}.mlp.experts.{j}.down_proj.weight" for j in range(e)],
                kind="moe_w2",
            ),
        ]
        if self.shared_inter:
            rules += [
                WeightRule(
                    L + ("shared_gate_up",),
                    [
                        f"{lp}.mlp.shared_expert.gate_proj.weight",
                        f"{lp}.mlp.shared_expert.up_proj.weight",
                    ],
                    kind="linear",
                    method_key="gate_up",
                ),
                WeightRule(
                    L + ("shared_down",),
                    [f"{lp}.mlp.shared_expert.down_proj.weight"],
                    kind="linear",
                    method_key="down",
                ),
                WeightRule(
                    L + ("shared_gate",),
                    [f"{lp}.mlp.shared_expert_gate.weight"],
                    kind="router",
                ),
            ]
        return rules

    def weight_rules(self) -> List[WeightRule]:
        pre = self.hf_prefix
        rules = [
            WeightRule(("embed",), [f"{pre}.embed_tokens.weight"], kind="embed"),
            WeightRule(("final_norm",), [f"{pre}.norm.weight"], kind="norm"),
        ]
        if not self.config.tie_word_embeddings:
            rules.append(WeightRule(("lm_head",), ["lm_head.weight"], kind="lm_head"))
        for i in range(self.num_layers):
            lp = f"{pre}.layers.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(L + ("input_norm",), [f"{lp}.input_layernorm.weight"], kind="norm"),
                WeightRule(L + ("post_norm",), [f"{lp}.post_attention_layernorm.weight"], kind="norm"),
                *self._mlp_rules_for(i, lp, L),
            ]
            if self.layer_types[i] == "full_attention":
                rules += [
                    WeightRule(L + ("q",), [f"{lp}.self_attn.q_proj.weight"], kind="linear", method_key="qkv"),
                    WeightRule(L + ("k",), [f"{lp}.self_attn.k_proj.weight"], kind="linear", method_key="qkv"),
                    WeightRule(L + ("v",), [f"{lp}.self_attn.v_proj.weight"], kind="linear", method_key="qkv"),
                    WeightRule(L + ("o",), [f"{lp}.self_attn.o_proj.weight"], kind="linear", method_key="o"),
                    WeightRule(L + ("q_norm",), [f"{lp}.self_attn.q_norm.weight"], kind="norm"),
                    WeightRule(L + ("k_norm",), [f"{lp}.self_attn.k_norm.weight"], kind="norm"),
                ]
            else:
                la = f"{lp}.linear_attn"
                rules += [
                    WeightRule(L + ("in_qkvz",), [f"{la}.in_proj_qkvz.weight"], kind="linear", method_key="qkv"),
                    WeightRule(L + ("in_ba",), [f"{la}.in_proj_ba.weight"], kind="linear", method_key="qkv"),
                    WeightRule(L + ("conv_w",), [f"{la}.conv1d.weight"], kind="raw"),
                    WeightRule(L + ("dt_bias",), [f"{la}.dt_bias"], kind="raw"),
                    WeightRule(L + ("a_log",), [f"{la}.A_log"], kind="raw"),
                    WeightRule(L + ("gdn_norm",), [f"{la}.norm.weight"], kind="norm"),
                    WeightRule(L + ("out_proj",), [f"{la}.out_proj.weight"], kind="linear", method_key="o"),
                ]
        return rules

    # ------------------------------------------------------------- forward

    def _fix_qkvz_ba(self, qkvz: jax.Array, ba: jax.Array):
        """HF `fix_query_key_value_ordering`: the qkvz projection interleaves
        [q(dk) | k(dk) | v(r*dv) | z(r*dv)] per k-head group (r = nv/nk)."""
        t = qkvz.shape[0]
        nk, dk, nv, dv = self.nk, self.dk, self.nv, self.dv
        r = nv // nk
        qkvz = qkvz.reshape(t, nk, 2 * dk + 2 * r * dv)
        q = qkvz[..., :dk]
        k = qkvz[..., dk : 2 * dk]
        v = qkvz[..., 2 * dk : 2 * dk + r * dv].reshape(t, nv, dv)
        z = qkvz[..., 2 * dk + r * dv :].reshape(t, nv, dv)
        ba = ba.reshape(t, nk, 2 * r)
        b = ba[..., :r].reshape(t, nv)
        a = ba[..., r:].reshape(t, nv)
        return q.reshape(t, -1), k.reshape(t, -1), v, z, b, a

    def _linear_attn_layer(self, lp: dict, normed: jax.Array, state: dict,
                           fb: ForwardBatch):
        t = normed.shape[0]
        qkvz = self.methods["qkv"].apply(lp["in_qkvz"], normed)
        ba = self.methods["qkv"].apply(lp["in_ba"], normed)
        q, k, v, z, b, a = self._fix_qkvz_ba(qkvz, ba)
        mixed = jnp.concatenate([q, k, v.reshape(t, -1)], axis=-1)
        conv_w = lp["conv_w"].reshape(self.conv_dim, self.conv_k)
        sentinel = state["conv"].shape[0] - 1
        if fb.mode.is_decode():
            slots = jnp.minimum(fb.state_slots, sentinel)
            out, conv, rec = gdn_decode(
                state["conv"], state["rec"], mixed, a, b, slots,
                self.gdn_geom, conv_w, lp["a_log"], lp["dt_bias"],
            )
        else:
            tok_slots = jnp.minimum(
                fb.state_slots[
                    jnp.clip(fb.token_to_seq, 0, fb.state_slots.shape[0] - 1)
                ],
                sentinel,
            )
            # padding tokens write the sentinel row
            tok_slots = jnp.where(fb.token_kind > 0, tok_slots, sentinel)
            out, conv, rec = gdn_extend(
                state["conv"], state["rec"], mixed, a, b, tok_slots,
                fb.positions, self.gdn_geom, conv_w, lp["a_log"],
                lp["dt_bias"],
            )
        out = gated_rms_norm(
            out.astype(z.dtype), z, lp["gdn_norm"], self.config.rms_norm_eps
        )
        out = self.methods["o"].apply(lp["out_proj"], out.reshape(t, -1))
        return out, {"conv": conv, "rec": rec}

    def _full_attn_layer(self, lp: dict, normed: jax.Array, kv_layer,
                         fb: ForwardBatch, attn_backend):
        c = self.config
        t = normed.shape[0]
        hd, qh, kvh = self.head_dim, self.num_q_heads, self.num_kv_heads
        qg = self.methods["qkv"].apply(lp["q"], normed).reshape(t, qh, 2 * hd)
        q, gate = qg[..., :hd], qg[..., hd:]
        k = self.methods["qkv"].apply(lp["k"], normed).reshape(t, kvh, hd)
        v = self.methods["qkv"].apply(lp["v"], normed).reshape(t, kvh, hd)
        q = gemma_rms_norm(q, lp["q_norm"], c.rms_norm_eps)
        k = gemma_rms_norm(k, lp["k_norm"], c.rms_norm_eps)
        q = apply_rope(q, fb.positions, self.inv_freq)
        k = apply_rope(k, fb.positions, self.inv_freq)
        attn_out, kv_new = attn_backend(
            q, k, v, kv_layer, fb, self.sm_scale
        )
        attn_out = attn_out.reshape(t, qh, hd) * jax.nn.sigmoid(
            gate.astype(jnp.float32)
        ).astype(attn_out.dtype)
        out = self.methods["o"].apply(lp["o"], attn_out.reshape(t, -1))
        return out, kv_new

    def mlp_forward_for(self, i: int, lp: dict, x: jax.Array) -> jax.Array:
        if not self._mlp_is_moe(i):
            return LlamaForCausalLM.mlp_forward(self, lp, x)
        out = fused_moe(
            x, lp["router"], lp["w1"], lp["w2"],
            top_k=self.top_k, norm_topk_prob=self.norm_topk_prob,
        )
        if self.shared_inter:
            gate_up = self.methods["gate_up"].apply(lp["shared_gate_up"], x)
            shared = self.methods["down"].apply(
                lp["shared_down"], silu_and_mul(gate_up)
            )
            g = jax.nn.sigmoid(
                jnp.dot(x.astype(jnp.float32), lp["shared_gate"])
            ).astype(x.dtype)
            out = out + g * shared
        return out

    def forward(self, params, kv_layers, fb: ForwardBatch, attn_backend):
        c = self.config
        assert fb.state_slots is not None, (
            "hybrid model requires fb.state_slots (per-seq state slot ids)"
        )
        h = self.embed_tokens(params, fb)
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            # Qwen3-Next RMSNorms are zero-centered: scale by (1 + w)
            normed = gemma_rms_norm(h, lp["input_norm"], c.rms_norm_eps)
            if self.layer_types[i] == "full_attention":
                out, kv_i = self._full_attn_layer(
                    lp, normed, kv_layers[i], fb, attn_backend
                )
            else:
                out, kv_i = self._linear_attn_layer(
                    lp, normed, kv_layers[i], fb
                )
            h = h + out
            normed = gemma_rms_norm(h, lp["post_norm"], c.rms_norm_eps)
            h = h + self.mlp_forward_for(i, lp, normed)
            new_kv.append(kv_i)
        h = gemma_rms_norm(h, params["final_norm"], c.rms_norm_eps)
        return h, new_kv
