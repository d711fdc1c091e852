"""Falcon-H1 (TII): PARALLEL Mamba2 + attention hybrid.

Parity with reference `srt/models/falcon_h1.py` / HF
`modeling_falcon_h1.py`: EVERY decoder layer runs a Mamba2 mixer AND a
GQA attention branch on the same normed input and sums them, followed
by a SwiGLU MLP. The model's many MuP multipliers are all LINEAR scale
factors sitting next to weight matrices, so they are FOLDED INTO THE
WEIGHTS AT LOAD TIME (documented per rule below) — the runtime model is
multiplier-free:

- embedding_multiplier -> embed rows; lm_head_multiplier -> lm_head
- attention_in_multiplier -> q/k/v in columns? (input scale: whole
  weight); key_multiplier -> k_proj (k scaling commutes with rope);
  attention_out_multiplier -> o_proj
- ssm_in_multiplier (input scale) and the per-section mup vector
  (z|x|B|C|dt output columns, `compute_mup_vector`) -> in_proj;
  ssm_out_multiplier -> out_proj
- mlp_multipliers: [0] pre-activation gate scale -> gate_proj,
  [1] output scale -> down_proj

The mixer's gate is applied WITHOUT a norm when `mamba_rms_norm` is
false (`y * silu(z)`); the KV layout declares one paged AND one linear
state kind per decoder layer (`kv_kinds` length 2L)."""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.activation import silu_and_mul
from sglang_tpu.layers.linear_attn import (
    mamba2_decode,
    mamba2_extend,
    mamba_gated_rms_norm,
)
from sglang_tpu.layers.norms import rms_norm
from sglang_tpu.layers.rotary import apply_rope, compute_inv_freq
from sglang_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.bamba import BambaForCausalLM


class FalconH1ForCausalLM(BambaForCausalLM):
    architectures = ["FalconH1ForCausalLM"]

    def __init__(self, config: ModelConfig):
        hf = dict(config.hf_config)
        # mixer width can be overridden by mamba_d_ssm
        d_ssm = hf.get("mamba_d_ssm")
        super().__init__(config)
        hf = config.hf_config
        if d_ssm:
            self.d_inner = int(d_ssm)
            self.conv_dim = (
                self.d_inner + 2 * self.n_groups * self.d_state
            )
        self.layer_types = ["parallel"] * self.num_layers
        self.mamba_rms_norm = bool(hf.get("mamba_rms_norm", False))
        self.inv_freq = jnp.asarray(
            compute_inv_freq(
                self.head_dim, config.rope_theta, config.rope_scaling
            )
        )
        self.mult = dict(
            embed=float(hf.get("embedding_multiplier", 1.0)),
            lm_head=float(hf.get("lm_head_multiplier", 1.0)),
            attn_in=float(hf.get("attention_in_multiplier", 1.0)),
            attn_out=float(hf.get("attention_out_multiplier", 1.0)),
            key=float(hf.get("key_multiplier", 1.0)),
            ssm_in=float(hf.get("ssm_in_multiplier", 1.0)),
            ssm_out=float(hf.get("ssm_out_multiplier", 1.0)),
            mlp=list(hf.get("mlp_multipliers", (1.0, 1.0))),
            ssm=list(hf.get("ssm_multipliers", (1.0,) * 5)),
        )

    @property
    def kv_kinds(self) -> List[str]:
        out = []
        for _ in range(self.num_layers):
            out += ["paged", "linear"]
        return out

    def _layer_shapes_specs(self, i: int) -> Tuple[dict, dict]:
        c = self.config
        dt = c.dtype
        h = self.hidden_size
        inter = c.intermediate_size
        shapes, specs = self._attn_shapes_specs()
        ms, mp = self._mixer_shapes_specs()
        if not self.mamba_rms_norm:
            ms.pop("mixer_norm", None)
            mp.pop("mixer_norm", None)
        shapes.update(ms)
        specs.update(mp)
        from sglang_tpu.models.llama import _linear_sharding

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

    def _mup_vector(self) -> np.ndarray:
        """[in_proj_out] per-column scale (HF compute_mup_vector order:
        z | x | B | C | dt)."""
        gs = self.n_groups * self.d_state
        z, x, b, cc, dtm = self.mult["ssm"]
        return np.concatenate(
            [
                np.full(self.d_inner, z),
                np.full(self.d_inner, x),
                np.full(gs, b),
                np.full(gs, cc),
                np.full(self.mamba_heads, dtm),
            ]
        ).astype(np.float32)

    def weight_rules(self) -> List[WeightRule]:
        pre = self.hf_prefix
        m = self.mult

        def scale(f):
            return lambda w: np.asarray(w, np.float32) * f

        mup = self._mup_vector() * m["ssm_in"]

        def in_proj_tr(w):  # [in, out] post-transpose
            return np.asarray(w, np.float32) * mup[None, :]

        inter = self.config.intermediate_size

        def gate_up_tr(w):  # fused [in, 2*inter]: scale the gate half
            w = np.asarray(w, np.float32).copy()
            w[:, :inter] *= m["mlp"][0]
            return w

        rules = [
            WeightRule(
                ("embed",), [f"{pre}.embed_tokens.weight"], kind="embed",
                transform=scale(m["embed"]),
            ),
            WeightRule(("final_norm",), [f"{pre}.final_layernorm.weight"], kind="norm"),
        ]
        if not self.config.tie_word_embeddings:
            rules.append(
                WeightRule(
                    ("lm_head",), ["lm_head.weight"], kind="lm_head",
                    transform=scale(m["lm_head"]),
                )
            )
        for i in range(self.num_layers):
            lp = f"{pre}.layers.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(L + ("input_norm",), [f"{lp}.input_layernorm.weight"], kind="norm"),
                WeightRule(L + ("pre_ff_norm",), [f"{lp}.pre_ff_layernorm.weight"], kind="norm"),
                WeightRule(
                    L + ("gate_up",),
                    [f"{lp}.feed_forward.gate_proj.weight", f"{lp}.feed_forward.up_proj.weight"],
                    kind="linear", method_key="gate_up", transform=gate_up_tr,
                ),
                WeightRule(
                    L + ("down",), [f"{lp}.feed_forward.down_proj.weight"],
                    kind="linear", method_key="down",
                    transform=scale(m["mlp"][1]),
                ),
                WeightRule(
                    L + ("q",), [f"{lp}.self_attn.q_proj.weight"],
                    kind="linear", method_key="qkv",
                    transform=scale(m["attn_in"]),
                ),
                WeightRule(
                    L + ("k",), [f"{lp}.self_attn.k_proj.weight"],
                    kind="linear", method_key="qkv",
                    transform=scale(m["attn_in"] * m["key"]),
                ),
                WeightRule(
                    L + ("v",), [f"{lp}.self_attn.v_proj.weight"],
                    kind="linear", method_key="qkv",
                    transform=scale(m["attn_in"]),
                ),
                WeightRule(
                    L + ("o",), [f"{lp}.self_attn.o_proj.weight"],
                    kind="linear", method_key="o",
                    transform=scale(m["attn_out"]),
                ),
            ]
            mx = f"{lp}.mamba"
            mixer = [
                r
                for r in self._mixer_rules(mx, L)
                if self.mamba_rms_norm or r.target[-1] != "mixer_norm"
            ]
            fixed = []
            for r in mixer:
                if r.target[-1] == "in_proj":
                    import dataclasses

                    r = dataclasses.replace(r, transform=in_proj_tr)
                elif r.target[-1] == "out_proj":
                    import dataclasses

                    r = dataclasses.replace(
                        r, transform=scale(m["ssm_out"])
                    )
                fixed.append(r)
            rules += fixed
        return rules

    # ------------------------------------------------------------- forward

    def mamba_mixer(self, lp, normed, state, fb):
        """Bamba mixer with an optional NORM-FREE gate (mamba_rms_norm
        false: y * silu(z))."""
        t = normed.shape[0]
        proj = self.methods["qkv"].apply(lp["in_proj"], normed)
        gate = proj[..., : self.d_inner]
        xbc = proj[..., self.d_inner : self.d_inner + self.conv_dim]
        dt = proj[..., self.d_inner + self.conv_dim :]
        conv_w = lp["conv_w"].reshape(self.conv_dim, self.conv_k)
        conv_b = lp.get("conv_b")
        sentinel = state["conv"].shape[0] - 1
        if fb.mode.is_decode():
            slots = jnp.minimum(fb.state_slots, sentinel)
            y, conv, ssm = mamba2_decode(
                state["conv"], state["ssm"], xbc, dt, slots,
                self.mamba_geom, conv_w, conv_b, lp["a_log"],
                lp["dt_bias"], lp["d_skip"], self.time_limit,
            )
        else:
            tok_slots = jnp.minimum(
                fb.state_slots[
                    jnp.clip(fb.token_to_seq, 0, fb.state_slots.shape[0] - 1)
                ],
                sentinel,
            )
            tok_slots = jnp.where(fb.token_kind > 0, tok_slots, sentinel)
            import os

            if os.environ.get("SGLANG_TPU_MAMBA_CHUNKED", "1") == "1":
                from sglang_tpu.layers.mamba2_chunked import (
                    mamba2_extend_chunked,
                )

                y, conv, ssm = mamba2_extend_chunked(
                    state["conv"], state["ssm"], xbc, dt, tok_slots,
                    fb.positions, self.mamba_geom, conv_w, conv_b,
                    lp["a_log"], lp["dt_bias"], lp["d_skip"],
                    self.time_limit,
                    max_seqs=int(fb.state_slots.shape[0]),
                )
            else:
                y, conv, ssm = mamba2_extend(
                    state["conv"], state["ssm"], xbc, dt, tok_slots,
                    fb.positions, self.mamba_geom, conv_w, conv_b,
                    lp["a_log"], lp["dt_bias"], lp["d_skip"],
                    self.time_limit,
                )
        y = y.reshape(t, self.d_inner).astype(gate.dtype)
        if "mixer_norm" in lp:
            y = mamba_gated_rms_norm(y, gate, lp["mixer_norm"], self.mixer_eps)
        else:
            y = y * jax.nn.silu(gate)
        out = self.methods["o"].apply(lp["out_proj"], y)
        return out, {"conv": conv, "ssm": ssm}

    def forward(self, params, kv_layers, fb: ForwardBatch, attn_backend):
        c = self.config
        assert fb.state_slots is not None
        h = self.embed_tokens(params, fb)
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            normed = rms_norm(h, lp["input_norm"], c.rms_norm_eps)
            mamba_out, st = self.mamba_mixer(
                lp, normed, kv_layers[2 * i + 1], fb
            )
            attn_out, kv_i = self._attn_layer(
                lp, normed, kv_layers[2 * i], fb, attn_backend
            )
            h = h + mamba_out + attn_out
            normed = rms_norm(h, lp["pre_ff_norm"], c.rms_norm_eps)
            gu = self.methods["gate_up"].apply(lp["gate_up"], normed)
            h = h + self.methods["down"].apply(lp["down"], silu_and_mul(gu))
            new_kv += [kv_i, st]
        h = rms_norm(h, params["final_norm"], c.rms_norm_eps)
        return h, new_kv
