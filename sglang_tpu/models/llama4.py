"""Llama-4 text decoder (Scout/Maverick class).

Parity with reference `python/sglang/srt/models/llama4.py` and the HF
`modeling_llama4` semantics:
- interleaved (complex-pair) RoPE with llama3-type scaling; every
  `no_rope_layer_interval`-th layer is a NoPE layer (no rotary at all);
- NoPE layers apply attention temperature tuning
  (`q *= log1p(floor((pos+1)/floor_scale)) * attn_scale + 1`);
- RoPE layers optionally L2-normalize q/k AFTER rotary (`use_qk_norm` —
  weightless norm, unlike Qwen3's learned q/k RMSNorm);
- MoE on `moe_layers` (all layers for 16E, every 2nd for 128E): top-1
  sigmoid router whose weight scales the expert INPUT (the score passes
  through the nonlinearity), plus an always-on shared expert; dense
  layers use `intermediate_size_mlp`;
- RoPE layers use chunked attention (`attention_chunk_size`) in the
  reference; for contexts <= the chunk size that equals full causal
  attention, which is what this engine serves (a warning is logged past
  the chunk boundary).

TPU notes: the routed experts run through the exact sorted `ragged_dot`
dispatch (`layers/moe.py fused_moe(scale_input=True)`); sigmoid is
monotonic so top-k over sigmoid scores equals HF's top-k over logits
while the kept weights are the sigmoid values, bit-for-bit the HF
router. Layers alternate dense/MoE shapes, so the model keeps the
unrolled forward (no layer scan) like the other non-uniform decoders.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.activation import silu_and_mul
from sglang_tpu.layers.moe import fused_moe, moe_specs
from sglang_tpu.layers.norms import rms_norm
from sglang_tpu.layers.rotary import apply_rope_interleaved
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM, _linear_sharding
from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


def _l2_norm(x: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    return (
        xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    ).astype(x.dtype)


class Llama4ForCausalLM(LlamaForCausalLM):
    architectures = ["Llama4ForCausalLM"]
    supports_chain_tail = False  # per-layer rope/temperature variants

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        L = self.num_layers
        interval = hf.get("no_rope_layer_interval") or 4
        nr = hf.get("no_rope_layers")
        # HF semantics: entry 1 -> the layer USES rope
        self.use_rope = (
            [bool(v) for v in nr]
            if nr
            else [(i + 1) % interval != 0 for i in range(L)]
        )
        step = hf.get("interleave_moe_layer_step", 1)
        ml = hf.get("moe_layers")
        self.moe_layers = set(
            ml
            if ml is not None
            else range(max(step, 1) - 1, L, max(step, 1))
        )
        self.num_experts = hf.get("num_local_experts", 16)
        self.top_k = hf.get("num_experts_per_tok", 1)
        self.moe_inter = hf.get("intermediate_size", 8192)
        self.dense_inter = hf.get(
            "intermediate_size_mlp", 4 * self.hidden_size
        )
        self.use_qk_norm = hf.get("use_qk_norm", False)
        self.attn_temperature_tuning = hf.get("attn_temperature_tuning", True)
        self.floor_scale = float(hf.get("floor_scale", 8192))
        self.attn_scale = float(hf.get("attn_scale", 0.1))
        self.attention_chunk_size = hf.get("attention_chunk_size") or 0
        if (
            self.attention_chunk_size
            and config.context_length > self.attention_chunk_size
        ):
            logger.warning(
                "context_length %d exceeds Llama-4 attention_chunk_size %d; "
                "rope layers serve full causal attention past the chunk "
                "boundary",
                config.context_length,
                self.attention_chunk_size,
            )

    # ------------------------------------------------------------- params

    def _dense_mlp_shapes(self, inter: int) -> dict:
        c = self.config
        h = self.hidden_size
        return {
            "gate_up": self.methods["gate_up"].weight_shapes(h, 2 * inter, c.dtype),
            "down": self.methods["down"].weight_shapes(inter, h, c.dtype),
        }

    def param_specs(self) -> dict:
        c = self.config
        dt = c.dtype
        h = self.hidden_size
        base_shapes, _ = super()._layer_specs()
        for k in ("gate_up", "down"):
            base_shapes.pop(k, None)
        layers = []
        for i in range(self.num_layers):
            shapes = dict(base_shapes)
            if i in self.moe_layers:
                shapes["router"] = jax.ShapeDtypeStruct(
                    (h, self.num_experts), jnp.float32
                )
                shapes["w1"] = jax.ShapeDtypeStruct(
                    (self.num_experts, h, 2 * self.moe_inter), dt
                )
                shapes["w2"] = jax.ShapeDtypeStruct(
                    (self.num_experts, self.moe_inter, h), dt
                )
                shapes.update(
                    {
                        f"shared_{k}": v
                        for k, v in self._dense_mlp_shapes(
                            self.moe_inter
                        ).items()
                    }
                )
            else:
                shapes.update(self._dense_mlp_shapes(self.dense_inter))
            layers.append(shapes)
        tree = {
            "embed": jax.ShapeDtypeStruct((c.vocab_size, h), dt),
            "layers": layers,
            "final_norm": jax.ShapeDtypeStruct((h,), dt),
        }
        if not c.tie_word_embeddings:
            tree["lm_head"] = jax.ShapeDtypeStruct((h, c.vocab_size), dt)
        return tree

    def param_shardings(self) -> dict:
        _, base_specs = super()._layer_specs()
        for k in ("gate_up", "down"):
            base_specs.pop(k, None)
        dense = {
            "gate_up": _linear_sharding(self.methods["gate_up"], col_parallel=True),
            "down": _linear_sharding(self.methods["down"], col_parallel=False),
        }
        layers = []
        for i in range(self.num_layers):
            specs = dict(base_specs)
            if i in self.moe_layers:
                specs.update(moe_specs(ep=getattr(self, "use_ep", False)))
                specs["shared_gate_up"] = dense["gate_up"]
                specs["shared_down"] = dense["down"]
            else:
                specs.update(dense)
            layers.append(specs)
        tree = {
            "embed": P(None, "model"),
            "layers": layers,
            "final_norm": P(None),
        }
        if not self.config.tie_word_embeddings:
            tree["lm_head"] = P(None, "model")
        return tree

    # ------------------------------------------------------------ loading

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
                WeightRule(
                    L + ("qkv",),
                    [
                        f"{lp}.self_attn.q_proj.weight",
                        f"{lp}.self_attn.k_proj.weight",
                        f"{lp}.self_attn.v_proj.weight",
                    ],
                    kind="linear",
                    method_key="qkv",
                ),
                WeightRule(L + ("o",), [f"{lp}.self_attn.o_proj.weight"], kind="linear", method_key="o"),
            ]
            ff = f"{lp}.feed_forward"
            if i in self.moe_layers:
                rules += [
                    WeightRule(L + ("router",), [f"{ff}.router.weight"], kind="router"),
                    # HF stores the experts FUSED: gate_up [E, H, 2I]
                    # (gate first half — the repo's w1 convention) and
                    # down [E, I, H] — load untransformed
                    WeightRule(L + ("w1",), [f"{ff}.experts.gate_up_proj"], kind="raw"),
                    WeightRule(L + ("w2",), [f"{ff}.experts.down_proj"], kind="raw"),
                    WeightRule(
                        L + ("shared_gate_up",),
                        [
                            f"{ff}.shared_expert.gate_proj.weight",
                            f"{ff}.shared_expert.up_proj.weight",
                        ],
                        kind="linear",
                        method_key="gate_up",
                    ),
                    WeightRule(
                        L + ("shared_down",),
                        [f"{ff}.shared_expert.down_proj.weight"],
                        kind="linear",
                        method_key="down",
                    ),
                ]
            else:
                rules += [
                    WeightRule(
                        L + ("gate_up",),
                        [f"{ff}.gate_proj.weight", f"{ff}.up_proj.weight"],
                        kind="linear",
                        method_key="gate_up",
                    ),
                    WeightRule(
                        L + ("down",),
                        [f"{ff}.down_proj.weight"],
                        kind="linear",
                        method_key="down",
                    ),
                ]
        return rules

    # ------------------------------------------------------------ forward

    def _mlp(self, lp: dict, x: jax.Array, i: int) -> jax.Array:
        if i in self.moe_layers:
            routed = fused_moe(
                x,
                lp["router"],
                lp["w1"],
                lp["w2"],
                top_k=self.top_k,
                norm_topk_prob=False,
                scoring_func="sigmoid",
                scale_input=True,
            )
            gate_up = self.methods["gate_up"].apply(lp["shared_gate_up"], x)
            shared = self.methods["down"].apply(
                lp["shared_down"], silu_and_mul(gate_up)
            )
            return shared + routed
        gate_up = self.methods["gate_up"].apply(lp["gate_up"], x)
        return self.methods["down"].apply(lp["down"], silu_and_mul(gate_up))

    def forward(self, params, kv_layers, fb, attn_backend):
        c = self.config
        t = fb.input_ids.shape[0]
        h = self.embed_tokens(params, fb)
        pos = fb.positions
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            normed = rms_norm(h, lp["input_norm"], c.rms_norm_eps)
            qkv = self.methods["qkv"].apply(lp["qkv"], normed)
            q = qkv[:, : self.q_size].reshape(t, self.num_q_heads, self.head_dim)
            k = qkv[:, self.q_size : self.q_size + self.kv_size].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            v = qkv[:, self.q_size + self.kv_size :].reshape(
                t, self.num_kv_heads, self.head_dim
            )
            if self.use_rope[i]:
                q = apply_rope_interleaved(q, pos, self.inv_freq)
                k = apply_rope_interleaved(k, pos, self.inv_freq)
                if self.use_qk_norm:
                    q = _l2_norm(q, c.rms_norm_eps)
                    k = _l2_norm(k, c.rms_norm_eps)
            elif self.attn_temperature_tuning:
                scales = (
                    jnp.log1p(
                        jnp.floor(
                            (pos.astype(jnp.float32) + 1.0) / self.floor_scale
                        )
                    )
                    * self.attn_scale
                    + 1.0
                )
                q = (q.astype(jnp.float32) * scales[:, None, None]).astype(
                    q.dtype
                )
            attn_out, kv_i = attn_backend(
                q, k, v, kv_layers[i], fb, self.sm_scale
            )
            new_kv.append(kv_i)
            h = h + self.methods["o"].apply(
                lp["o"], attn_out.reshape(t, self.q_size)
            )
            normed = rms_norm(h, lp["post_norm"], c.rms_norm_eps)
            h = h + self._mlp(lp, normed, i)
        h = rms_norm(h, params["final_norm"], c.rms_norm_eps)
        return h, new_kv
