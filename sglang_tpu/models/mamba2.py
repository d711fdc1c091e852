"""Mamba2 (pure SSD state-space LM — codestral-mamba class).

Parity with reference `srt/models/mamba2.py`-class support via
`srt/layers/attention/mamba/` + `MambaPool` (`memory_pool.py:195`), math
parity with HF `transformers/models/mamba2/modeling_mamba2.py`
(`Mamba2Mixer.torch_forward`). Every layer is recurrent: `kv_kinds` is all
"linear", so the engine allocates slot-indexed state pools and no paged KV
is ever read (the page allocator still tracks token budget).

Also the base for hybrid Mamba families (Bamba/Nemotron-H-style) which
interleave these mixer layers with paged attention layers.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.linear_attn import (
    mamba2_decode,
    mamba2_extend,
    mamba_gated_rms_norm,
)
from sglang_tpu.layers.norms import rms_norm
from sglang_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM, _linear_sharding


class Mamba2ForCausalLM(LlamaForCausalLM):
    supports_chain_tail = False  # recurrent state, not a paged KV pool
    architectures = ["Mamba2ForCausalLM"]
    hf_prefix = "backbone"

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        # pure-SSM config carries no attention geometry; fill harmless
        # stand-ins so the shared base-class init (sm_scale, rope) works
        if not config.num_attention_heads:
            config.num_attention_heads = 1
            config.num_key_value_heads = 1
            config.head_dim = 64
        super().__init__(config)
        self.d_state = hf.get("state_size", 128)
        self.expand = hf.get("expand", 2)
        self.d_inner = hf.get("intermediate_size") or (
            self.expand * config.hidden_size
        )
        self.mamba_heads = hf.get("num_heads", self.d_inner // 64)
        self.mamba_head_dim = hf.get("head_dim", 64)
        # pure-ssm configs reuse "head_dim" for the mixer; hybrid subclasses
        # override via mamba_* keys
        self.n_groups = hf.get("n_groups", 1)
        self.conv_k = hf.get("conv_kernel", 4)
        self.use_conv_bias = hf.get("use_conv_bias", True)
        self.use_bias = hf.get("use_bias", False)
        tsl = hf.get("time_step_limit") or (0.0, float("inf"))
        self.time_limit = (float(tsl[0]), float(tsl[1]))
        self.conv_dim = self.d_inner + 2 * self.n_groups * self.d_state
        self.mamba_geom = (
            self.mamba_heads, self.mamba_head_dim, self.n_groups, self.d_state
        )
        self.mixer_eps = hf.get("layer_norm_epsilon", 1e-5)

    # ---------------------------------------------------- layout contracts

    @property
    def kv_kinds(self) -> List[str]:
        return ["linear"] * self.num_layers

    def state_specs(self, slots: int) -> dict:
        return {
            "conv": jax.ShapeDtypeStruct(
                (slots + 1, self.conv_dim, self.conv_k - 1), jnp.float32
            ),
            "ssm": jax.ShapeDtypeStruct(
                (slots + 1, self.mamba_heads, self.mamba_head_dim, self.d_state),
                jnp.float32,
            ),
        }

    # -------------------------------------------------------------- specs

    def _mixer_shapes_specs(self) -> Tuple[dict, dict]:
        c = self.config
        dt = c.dtype
        h = self.hidden_size
        proj_dim = self.d_inner + self.conv_dim + self.mamba_heads
        shapes = {
            "in_proj": self.methods["qkv"].weight_shapes(h, proj_dim, dt),
            "conv_w": jax.ShapeDtypeStruct((self.conv_dim, 1, self.conv_k), dt),
            "dt_bias": jax.ShapeDtypeStruct((self.mamba_heads,), jnp.float32),
            "a_log": jax.ShapeDtypeStruct((self.mamba_heads,), jnp.float32),
            "d_skip": jax.ShapeDtypeStruct((self.mamba_heads,), jnp.float32),
            "mixer_norm": jax.ShapeDtypeStruct((self.d_inner,), dt),
            "out_proj": self.methods["o"].weight_shapes(self.d_inner, h, dt),
        }
        specs = {
            "in_proj": _linear_sharding(self.methods["qkv"], col_parallel=True),
            "conv_w": P(None, None, None),
            "dt_bias": P(None),
            "a_log": P(None),
            "d_skip": P(None),
            "mixer_norm": P(None),
            "out_proj": _linear_sharding(self.methods["o"], col_parallel=False),
        }
        if self.use_conv_bias:
            shapes["conv_b"] = jax.ShapeDtypeStruct((self.conv_dim,), dt)
            specs["conv_b"] = P(None)
        return shapes, specs

    def _layer_shapes_specs(self, i: int) -> Tuple[dict, dict]:
        shapes, specs = self._mixer_shapes_specs()
        shapes["input_norm"] = jax.ShapeDtypeStruct(
            (self.hidden_size,), self.config.dtype
        )
        specs["input_norm"] = P(None)
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

    def _mixer_rules(self, mp: str, L: tuple) -> List[WeightRule]:
        rules = [
            WeightRule(L + ("in_proj",), [f"{mp}.in_proj.weight"], kind="linear", method_key="qkv"),
            WeightRule(L + ("conv_w",), [f"{mp}.conv1d.weight"], kind="raw"),
            WeightRule(L + ("dt_bias",), [f"{mp}.dt_bias"], kind="raw"),
            WeightRule(L + ("a_log",), [f"{mp}.A_log"], kind="raw"),
            WeightRule(L + ("d_skip",), [f"{mp}.D"], kind="raw"),
            WeightRule(L + ("mixer_norm",), [f"{mp}.norm.weight"], kind="norm"),
            WeightRule(L + ("out_proj",), [f"{mp}.out_proj.weight"], kind="linear", method_key="o"),
        ]
        if self.use_conv_bias:
            rules.append(WeightRule(L + ("conv_b",), [f"{mp}.conv1d.bias"], kind="norm"))
        return rules

    def weight_rules(self) -> List[WeightRule]:
        pre = self.hf_prefix
        rules = [
            WeightRule(("embed",), [f"{pre}.embeddings.weight"], kind="embed"),
            WeightRule(("final_norm",), [f"{pre}.norm_f.weight"], kind="norm"),
        ]
        if not self.config.tie_word_embeddings:
            rules.append(WeightRule(("lm_head",), ["lm_head.weight"], kind="lm_head"))
        for i in range(self.num_layers):
            L = ("layers", i)
            rules.append(
                WeightRule(L + ("input_norm",), [f"{pre}.layers.{i}.norm.weight"], kind="norm")
            )
            rules += self._mixer_rules(f"{pre}.layers.{i}.mixer", L)
        return rules

    # ------------------------------------------------------------- forward

    def mamba_mixer(self, lp: dict, normed: jax.Array, state: dict,
                    fb: ForwardBatch):
        """One Mamba2 mixer (HF `Mamba2Mixer.torch_forward` order:
        in_proj -> [gate | xBC | dt], causal conv+silu on xBC, SSD update,
        gate-then-RMSNorm, out_proj)."""
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
                # chunked-parallel SSD: T/L-deep scan + MXU matmuls
                # instead of a T-deep token scan (exact; see
                # layers/mamba2_chunked.py)
                from sglang_tpu.layers.mamba2_chunked import (
                    mamba2_extend_chunked,
                )

                y, conv, ssm = mamba2_extend_chunked(
                    state["conv"], state["ssm"], xbc, dt, tok_slots,
                    fb.positions, self.mamba_geom, conv_w, conv_b,
                    lp["a_log"], lp["dt_bias"], lp["d_skip"],
                    self.time_limit,
                    chunk=int(os.environ.get("SGLANG_TPU_MAMBA_CHUNK", "64")),
                    max_seqs=int(fb.state_slots.shape[0]),
                )
            else:
                y, conv, ssm = mamba2_extend(
                    state["conv"], state["ssm"], xbc, dt, tok_slots,
                    fb.positions, self.mamba_geom, conv_w, conv_b,
                    lp["a_log"], lp["dt_bias"], lp["d_skip"],
                    self.time_limit,
                )
        y = mamba_gated_rms_norm(
            y.reshape(t, self.d_inner).astype(gate.dtype), gate,
            lp["mixer_norm"], self.mixer_eps,
        )
        out = self.methods["o"].apply(lp["out_proj"], y)
        return out, {"conv": conv, "ssm": ssm}

    def forward(self, params, kv_layers, fb: ForwardBatch, attn_backend):
        assert fb.state_slots is not None
        h = self.embed_tokens(params, fb)
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            normed = rms_norm(h, lp["input_norm"], self.mixer_eps)
            out, st = self.mamba_mixer(lp, normed, kv_layers[i], fb)
            h = h + out
            new_kv.append(st)
        h = rms_norm(h, params["final_norm"], self.mixer_eps)
        return h, new_kv
