"""DeepSeek-V2 / V3 (MLA + fine-grained MoE).

Parity with reference `python/sglang/srt/models/deepseek_v2.py` (the MLA
flagship, 2.6k LoC). Round-1 design: the **decompressed MHA form** of MLA —
`kv_b_proj` expands the latent per token at prefill/decode time and the
paged pool caches full per-head K (nope‖rope, v padded to qk_head_dim), so
the unified ragged attention kernel serves it unchanged. The compressed
latent cache + absorbed-weight attention (reference `MLATokenToKVPool`,
`memory_pool.py:1618`) is the round-2 memory optimization.

Covers: optional q LoRA (q_a/q_b), kv_a + kv_a_layernorm + kv_b, interleaved
RoPE on the decoupled rope dims, dense first_k_dense_replace layers, MoE
with softmax/sigmoid scoring, greedy / noaux_tc (e_score_correction_bias)
top-k, routed scaling, and ungated shared experts.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.activation import silu_and_mul
from sglang_tpu.layers.moe import fused_moe, moe_shapes, moe_specs
from sglang_tpu.layers.norms import rms_norm
from sglang_tpu.layers.rotary import (
    apply_rope,
    apply_rope_interleaved,
    compute_inv_freq,
)
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM


class DeepseekV2ForCausalLM(LlamaForCausalLM):
    # MLA latent pool layout differs from [P, 2kvh, ps, d] - no chain tail
    supports_chain_tail = False
    architectures = [
        "DeepseekV2ForCausalLM",
        "DeepseekV3ForCausalLM",
        "DeepseekV32ForCausalLM",
    ]

    def __init__(self, config: ModelConfig):
        import os

        hf = config.hf_config
        self.qk_nope = hf["qk_nope_head_dim"]
        self.qk_rope = hf["qk_rope_head_dim"]
        self.qk_head_dim = self.qk_nope + self.qk_rope
        self.v_head_dim = hf["v_head_dim"]
        self.kv_lora = hf["kv_lora_rank"]
        self.q_lora = hf.get("q_lora_rank")
        # Latent-cache MLA (reference MLATokenToKVPool + weight absorption,
        # `deepseek_v2.py` forward_absorb): the pool stores ONE shared
        # "head" of [c_kv ; roped k_pe] per token and attention runs as
        # MQA in latent space — q_nope is absorbed through W_UK into the
        # latent, the output is absorbed through W_UV after attention.
        # Cache per token: 2*(kv_lora+qk_rope) elems vs the decompressed
        # form's 2*num_heads*qk_head_dim (42x smaller at V3 geometry).
        # SGLANG_TPU_MLA_DECOMPRESS=1 restores the decompressed MHA form.
        self.use_latent = os.environ.get("SGLANG_TPU_MLA_DECOMPRESS") != "1"
        if self.use_latent:
            config.head_dim = self.kv_lora + self.qk_rope
            config.num_key_value_heads = 1
        else:
            # pool geometry: MHA-decompressed K/V at qk_head_dim (v padded)
            config.head_dim = self.qk_head_dim
            config.num_key_value_heads = config.num_attention_heads
        super().__init__(config)
        self.sm_scale = self.qk_head_dim**-0.5
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.qk_rope, config.rope_theta, config.rope_scaling)
        )
        # MoE structure
        self.first_dense = hf.get("first_k_dense_replace", 0)
        self.n_routed = hf.get("n_routed_experts", 0) or 0
        self.top_k = hf.get("num_experts_per_tok", 0) or 0
        self.moe_inter = hf.get("moe_intermediate_size", 0) or 0
        self.n_shared = hf.get("n_shared_experts", 0) or 0
        self.norm_topk_prob = hf.get("norm_topk_prob", False)
        self.scoring_func = hf.get("scoring_func", "softmax")
        self.topk_method = hf.get("topk_method", "greedy")
        self.routed_scaling = hf.get("routed_scaling_factor", 1.0)
        self.n_group = hf.get("n_group", 1) or 1
        self.topk_group = hf.get("topk_group", 1) or 1
        # NSA (DeepSeek V3.2): a per-layer lightning indexer selects
        # index_topk positions and attention runs sparsely over them
        # (reference `nsa/nsa_indexer.py Indexer`, `nsa_backend.py`;
        # detection parity: `configs/model_config.py:113` keys on the
        # presence of index_topk)
        # SP for dense layers of the MoE stack (P8): tokens sharded, dense
        # weights replicated; the mesh handle is attached by the runner
        self.dense_sp = (
            config.moe_dense_tp_size == 1 and (hf.get("n_routed_experts") or 0) > 0
        )
        self.mesh = None
        self.nsa_index_topk = hf.get("index_topk") or 0
        self.use_nsa = self.nsa_index_topk > 0 and self.use_latent
        if self.use_nsa:
            self.nsa_index_head_dim = hf.get("index_head_dim", 128)
            self.nsa_index_n_heads = hf.get("index_n_heads", 64)
            self.nsa_rope_interleave = hf.get("indexer_rope_interleave", True)
            if self.q_lora is None:
                raise ValueError("NSA indexer requires q_lora_rank")

    def _is_moe(self, i: int) -> bool:
        return self.n_routed > 0 and i >= self.first_dense

    # --------------------------------------------------------------- specs

    def _layer_specs_for(self, i: int) -> Tuple[dict, dict]:
        c = self.config
        dt = c.dtype
        h = self.hidden_size
        nh = self.num_q_heads
        shapes = {
            "input_norm": jax.ShapeDtypeStruct((h,), dt),
            "post_norm": jax.ShapeDtypeStruct((h,), dt),
            "kv_a": jax.ShapeDtypeStruct((h, self.kv_lora + self.qk_rope), dt),
            "kv_a_norm": jax.ShapeDtypeStruct((self.kv_lora,), dt),
            "kv_b": jax.ShapeDtypeStruct(
                (self.kv_lora, nh * (self.qk_nope + self.v_head_dim)), dt
            ),
            "o": jax.ShapeDtypeStruct((nh * self.v_head_dim, h), dt),
        }
        specs = {
            "input_norm": P(None),
            "post_norm": P(None),
            "kv_a": P(None, None),
            "kv_a_norm": P(None),
            "kv_b": P(None, "model"),
            "o": P("model", None),
        }
        if self.q_lora is None:
            shapes["q"] = jax.ShapeDtypeStruct((h, nh * self.qk_head_dim), dt)
            specs["q"] = P(None, "model")
        else:
            shapes["q_a"] = jax.ShapeDtypeStruct((h, self.q_lora), dt)
            shapes["q_a_norm"] = jax.ShapeDtypeStruct((self.q_lora,), dt)
            shapes["q_b"] = jax.ShapeDtypeStruct(
                (self.q_lora, nh * self.qk_head_dim), dt
            )
            specs["q_a"] = P(None, None)
            specs["q_a_norm"] = P(None)
            specs["q_b"] = P(None, "model")
        if self.use_nsa:
            hi, di = self.nsa_index_n_heads, self.nsa_index_head_dim
            shapes["idx_wq_b"] = jax.ShapeDtypeStruct((self.q_lora, hi * di), dt)
            shapes["idx_wk"] = jax.ShapeDtypeStruct((h, di), dt)
            shapes["idx_k_norm"] = jax.ShapeDtypeStruct((di,), dt)
            shapes["idx_k_norm_b"] = jax.ShapeDtypeStruct((di,), dt)
            shapes["idx_weights"] = jax.ShapeDtypeStruct((h, hi), dt)
            specs["idx_wq_b"] = P(None, None)
            specs["idx_wk"] = P(None, None)
            specs["idx_k_norm"] = P(None)
            specs["idx_k_norm_b"] = P(None)
            specs["idx_weights"] = P(None, None)
        if self._is_moe(i):
            shapes.update(
                moe_shapes(h, self.moe_inter, self.n_routed, dt)
            )
            specs.update(moe_specs())
            if self.topk_method == "noaux_tc":
                shapes["e_score_bias"] = jax.ShapeDtypeStruct(
                    (self.n_routed,), jnp.float32
                )
                specs["e_score_bias"] = P(None)
            if self.n_shared:
                si = self.moe_inter * self.n_shared
                shapes["shared_gate_up"] = jax.ShapeDtypeStruct((h, 2 * si), dt)
                shapes["shared_down"] = jax.ShapeDtypeStruct((si, h), dt)
                specs["shared_gate_up"] = P(None, "model")
                specs["shared_down"] = P("model", None)
        else:
            inter = c.intermediate_size
            shapes["gate_up"] = jax.ShapeDtypeStruct((h, 2 * inter), dt)
            shapes["down"] = jax.ShapeDtypeStruct((inter, h), dt)
            if self.dense_sp:
                # SP: dense weights replicated, tokens sharded over "model"
                # (reference moe_dense_tp_size=1, `server_args.py:645`)
                specs["gate_up"] = P(None, None)
                specs["down"] = P(None, None)
            else:
                specs["gate_up"] = P(None, "model")
                specs["down"] = P("model", None)
        return shapes, specs

    def param_specs(self) -> dict:
        c = self.config
        tree = {
            "embed": jax.ShapeDtypeStruct((c.vocab_size, c.hidden_size), c.dtype),
            "layers": [
                self._layer_specs_for(i)[0] for i in range(self.num_layers)
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
                self._layer_specs_for(i)[1] for i in range(self.num_layers)
            ],
            "final_norm": P(None),
        }
        if not self.config.tie_word_embeddings:
            tree["lm_head"] = P(None, "model")
        return tree

    # ------------------------------------------------------------- loading

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
                WeightRule(L + ("kv_a",), [f"{lp}.self_attn.kv_a_proj_with_mqa.weight"], kind="linear_raw"),
                WeightRule(L + ("kv_a_norm",), [f"{lp}.self_attn.kv_a_layernorm.weight"], kind="norm"),
                WeightRule(L + ("kv_b",), [f"{lp}.self_attn.kv_b_proj.weight"], kind="linear_raw"),
                WeightRule(L + ("o",), [f"{lp}.self_attn.o_proj.weight"], kind="linear_raw"),
            ]
            if self.q_lora is None:
                rules.append(
                    WeightRule(L + ("q",), [f"{lp}.self_attn.q_proj.weight"], kind="linear_raw")
                )
            else:
                rules += [
                    WeightRule(L + ("q_a",), [f"{lp}.self_attn.q_a_proj.weight"], kind="linear_raw"),
                    WeightRule(L + ("q_a_norm",), [f"{lp}.self_attn.q_a_layernorm.weight"], kind="norm"),
                    WeightRule(L + ("q_b",), [f"{lp}.self_attn.q_b_proj.weight"], kind="linear_raw"),
                ]
            if self.use_nsa:
                rules += [
                    WeightRule(L + ("idx_wq_b",), [f"{lp}.self_attn.indexer.wq_b.weight"], kind="linear_raw"),
                    WeightRule(L + ("idx_wk",), [f"{lp}.self_attn.indexer.wk.weight"], kind="linear_raw"),
                    WeightRule(L + ("idx_k_norm",), [f"{lp}.self_attn.indexer.k_norm.weight"], kind="norm"),
                    WeightRule(L + ("idx_k_norm_b",), [f"{lp}.self_attn.indexer.k_norm.bias"], kind="norm"),
                    WeightRule(L + ("idx_weights",), [f"{lp}.self_attn.indexer.weights_proj.weight"], kind="linear_raw"),
                ]
            if self._is_moe(i):
                e = self.n_routed
                rules += [
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
                if self.topk_method == "noaux_tc":
                    rules.append(
                        WeightRule(
                            L + ("e_score_bias",),
                            [f"{lp}.mlp.gate.e_score_correction_bias"],
                            kind="raw",
                        )
                    )
                if self.n_shared:
                    rules += [
                        WeightRule(
                            L + ("shared_gate_up",),
                            [
                                f"{lp}.mlp.shared_experts.gate_proj.weight",
                                f"{lp}.mlp.shared_experts.up_proj.weight",
                            ],
                            kind="linear_raw",
                        ),
                        WeightRule(
                            L + ("shared_down",),
                            [f"{lp}.mlp.shared_experts.down_proj.weight"],
                            kind="linear_raw",
                        ),
                    ]
            else:
                rules += [
                    WeightRule(
                        L + ("gate_up",),
                        [f"{lp}.mlp.gate_proj.weight", f"{lp}.mlp.up_proj.weight"],
                        kind="linear_raw",
                    ),
                    WeightRule(L + ("down",), [f"{lp}.mlp.down_proj.weight"], kind="linear_raw"),
                ]
        return rules

    # ------------------------------------------------------------- forward

    def forward(self, params, kv_layers, fb, attn_backend):
        c = self.config
        h = params["embed"][fb.input_ids]
        new_kv = []
        for i in range(self.num_layers):
            h, kv_i = self.ds_decoder_layer(
                params["layers"][i], h, kv_layers[i], fb, attn_backend, i
            )
            new_kv.append(kv_i)
        h = rms_norm(h, params["final_norm"], c.rms_norm_eps)
        return h, new_kv

    def ds_decoder_layer(self, lp, h, kv_layer, fb, attn_backend, i):
        """One MLA + (dense|MoE) block — shared with the MTP head
        (`models/deepseek_mtp.py`)."""
        c = self.config
        t = h.shape[0]
        nh = self.num_q_heads
        if True:
            normed = rms_norm(h, lp["input_norm"], c.rms_norm_eps)
            # ---- MLA attention (decompressed form) ----
            if self.q_lora is None:
                q = jnp.dot(normed, lp["q"], preferred_element_type=jnp.float32)
            else:
                qa = rms_norm(
                    jnp.dot(normed, lp["q_a"], preferred_element_type=jnp.float32).astype(normed.dtype),
                    lp["q_a_norm"],
                    c.rms_norm_eps,
                )
                q = jnp.dot(qa, lp["q_b"], preferred_element_type=jnp.float32)
            q = q.astype(normed.dtype).reshape(t, nh, self.qk_head_dim)
            q_nope = q[..., : self.qk_nope]
            q_pe = apply_rope_interleaved(
                q[..., self.qk_nope :], fb.positions, self.inv_freq
            )
            kv_a = jnp.dot(
                normed, lp["kv_a"], preferred_element_type=jnp.float32
            ).astype(normed.dtype)
            c_kv = rms_norm(kv_a[:, : self.kv_lora], lp["kv_a_norm"], c.rms_norm_eps)
            k_pe = apply_rope_interleaved(
                kv_a[:, self.kv_lora :].reshape(t, 1, self.qk_rope),
                fb.positions,
                self.inv_freq,
            )
            if self.use_latent:
                # absorbed MQA: q_lat = q_nope @ W_UK; score against the
                # stored [c_kv ; k_pe] latent; out's first kv_lora dims are
                # the latent attention output, absorbed through W_UV.
                kv_b = lp["kv_b"].reshape(
                    self.kv_lora, nh, self.qk_nope + self.v_head_dim
                )
                w_uk = kv_b[..., : self.qk_nope]  # [l, n, dn]
                w_uv = kv_b[..., self.qk_nope :]  # [l, n, dv]
                q_lat = jnp.einsum(
                    "tnd,lnd->tnl", q_nope, w_uk,
                    preferred_element_type=jnp.float32,
                ).astype(normed.dtype)
                q_full = jnp.concatenate([q_lat, q_pe], axis=-1)
                k_lat = jnp.concatenate(
                    [c_kv[:, None, :], k_pe], axis=-1
                )  # [t, 1, l + rope]
                if self.use_nsa:
                    # lightning indexer (reference Indexer.forward):
                    # q from the normalized q_a latent, single key head
                    # from the attention input, per-head gates from the
                    # attention input; rope on the first qk_rope dims.
                    from sglang_tpu.layers.attention.nsa import nsa_attention
                    from sglang_tpu.layers.norms import layer_norm

                    hi, di = self.nsa_index_n_heads, self.nsa_index_head_dim
                    q_idx = jnp.dot(
                        qa, lp["idx_wq_b"],
                        preferred_element_type=jnp.float32,
                    ).astype(normed.dtype).reshape(t, hi, di)
                    k_idx = layer_norm(
                        jnp.dot(
                            normed, lp["idx_wk"],
                            preferred_element_type=jnp.float32,
                        ).astype(normed.dtype),
                        lp["idx_k_norm"],
                        lp["idx_k_norm_b"],
                        eps=1e-6,
                    )[:, None, :]  # [t, 1, di]
                    rope = apply_rope_interleaved if self.nsa_rope_interleave else apply_rope
                    q_idx = jnp.concatenate(
                        [
                            rope(q_idx[..., : self.qk_rope], fb.positions, self.inv_freq),
                            q_idx[..., self.qk_rope :],
                        ],
                        axis=-1,
                    )
                    k_idx = jnp.concatenate(
                        [
                            rope(k_idx[..., : self.qk_rope], fb.positions, self.inv_freq),
                            k_idx[..., self.qk_rope :],
                        ],
                        axis=-1,
                    )[:, 0, :]
                    gate_w = (
                        jnp.dot(
                            normed, lp["idx_weights"],
                            preferred_element_type=jnp.float32,
                        )
                        * (hi**-0.5)
                        * (di**-0.5)
                    )
                    attn_out, kv_i = nsa_attention(
                        q_full, k_lat, q_idx, k_idx, gate_w, kv_layer,
                        fb, self.sm_scale, self.nsa_index_topk,
                    )
                else:
                    attn_out, kv_i = attn_backend(
                        q_full, k_lat, k_lat, kv_layer, fb, self.sm_scale
                    )
                out_lat = attn_out[..., : self.kv_lora]  # [t, n, l]
                attn_out = jnp.einsum(
                    "tnl,lnd->tnd", out_lat, w_uv,
                    preferred_element_type=jnp.float32,
                ).astype(normed.dtype).reshape(t, nh * self.v_head_dim)
            else:
                kv = jnp.dot(
                    c_kv, lp["kv_b"], preferred_element_type=jnp.float32
                ).astype(normed.dtype).reshape(t, nh, self.qk_nope + self.v_head_dim)
                k_nope = kv[..., : self.qk_nope]
                v = kv[..., self.qk_nope :]
                k = jnp.concatenate(
                    [k_nope, jnp.broadcast_to(k_pe, (t, nh, self.qk_rope))], axis=-1
                )
                q_full = jnp.concatenate([q_nope, q_pe], axis=-1)
                # pad v to qk_head_dim for the shared K/V pool layout
                v_pad = jnp.pad(
                    v, ((0, 0), (0, 0), (0, self.qk_head_dim - self.v_head_dim))
                )
                attn_out, kv_i = attn_backend(
                    q_full, k, v_pad, kv_layer, fb, self.sm_scale
                )
                attn_out = attn_out[..., : self.v_head_dim].reshape(
                    t, nh * self.v_head_dim
                )
            o = jnp.dot(
                attn_out, lp["o"], preferred_element_type=jnp.float32
            ).astype(normed.dtype)
            h = h + o
            # ---- MLP / MoE ----
            normed = rms_norm(h, lp["post_norm"], c.rms_norm_eps)
            if self._is_moe(i):
                out = fused_moe(
                    normed,
                    lp["router"],
                    lp["w1"],
                    lp["w2"],
                    top_k=self.top_k,
                    norm_topk_prob=self.norm_topk_prob,
                    scoring_func=self.scoring_func,
                    correction_bias=lp.get("e_score_bias"),
                    routed_scaling_factor=self.routed_scaling,
                    n_group=self.n_group,
                    topk_group=self.topk_group,
                )
                if self.n_shared:
                    gu = jnp.dot(
                        normed, lp["shared_gate_up"],
                        preferred_element_type=jnp.float32,
                    ).astype(normed.dtype)
                    out = out + jnp.dot(
                        silu_and_mul(gu), lp["shared_down"],
                        preferred_element_type=jnp.float32,
                    ).astype(normed.dtype)
                h = h + out
            else:
                if self.dense_sp and self.mesh is not None:
                    # SP: constrain tokens over "model" so XLA runs the
                    # replicated-weight dense MLP data-parallel (no
                    # all-reduce) and gathers only at the residual add
                    from jax.sharding import NamedSharding

                    normed = jax.lax.with_sharding_constraint(
                        normed, NamedSharding(self.mesh, P("model", None))
                    )
                gu = jnp.dot(
                    normed, lp["gate_up"], preferred_element_type=jnp.float32
                ).astype(normed.dtype)
                h = h + jnp.dot(
                    silu_and_mul(gu), lp["down"],
                    preferred_element_type=jnp.float32,
                ).astype(normed.dtype)
        return h, kv_i
