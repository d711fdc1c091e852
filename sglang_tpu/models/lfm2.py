"""LFM2 (Liquid AI): gated short-conv + attention hybrid.

Parity with reference `srt/models/lfm2.py` / HF `modeling_lfm2.py`:
most layers are a gated depthwise SHORT CONV operator —
`y = out_proj(C * conv(B * x))` with (B, C, x) = in_proj(h) and a
kernel of conv_L_cache taps, NO activation — the rest are GQA attention
with per-head q/k RMSNorm before rope. Per layer:
operator_norm -> (conv | attn) -> +res -> ffn_norm -> SwiGLU -> +res;
final norm is `embedding_norm`. The MLP width replicates HF's
block_auto_adjust_ff_dim rounding.

TPU state design: conv layers keep a per-request [hidden, L-1] window
in the linear-state pool (same slot machinery as the SSD mixers); the
packed-prefill conv runs as L shifted multiply-adds with per-token pool
fallback for the first L-1 tokens of continuing sequences — no token
scan."""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.activation import silu_and_mul
from sglang_tpu.layers.norms import rms_norm
from sglang_tpu.layers.rotary import apply_rope
from sglang_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM, _linear_sharding


def short_conv_extend(pool, bx, slots, positions, conv_w, conv_b):
    """Packed-ragged causal depthwise conv (kernel k, no activation).
    pool [S+1, H, k-1]; bx [T, H]; returns (y [T, H], pool)."""
    T, H = bx.shape
    k = conv_w.shape[-1]
    sentinel = pool.shape[0] - 1
    ar = jnp.arange(T)
    prev_slot = jnp.roll(slots, 1).at[0].set(-1)
    prev_pos = jnp.roll(positions, 1).at[0].set(-2)
    boundary = (
        (ar == 0) | (slots != prev_slot)
        | (positions != prev_pos + 1) | (positions == 0)
    )
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(boundary, ar, -1)
    )
    nxt = jnp.roll(jnp.where(boundary, ar, T), -1).at[T - 1].set(T)
    seg_end = (
        jax.lax.associative_scan(jnp.minimum, nxt[::-1])[::-1] - 1
    ).clip(0, T - 1)
    fresh = jnp.take(positions, seg_start) == 0
    x32 = bx.astype(jnp.float32)
    w32 = conv_w.astype(jnp.float32)
    acc = x32 * w32[:, k - 1]
    window_parts = [x32]
    for j in range(1, k):
        shifted = jnp.roll(x32, j, axis=0).at[:j].set(0.0)
        valid = (ar - j) >= seg_start
        col = jnp.clip(k - 1 - j + (ar - seg_start), 0, k - 2)
        pool_j = jnp.where(fresh[:, None], 0.0, pool[slots, :, col])
        ctx_j = jnp.where(valid[:, None], shifted, pool_j)
        acc = acc + ctx_j * w32[:, k - 1 - j]
        window_parts.append(ctx_j)
    if conv_b is not None:
        acc = acc + conv_b.astype(jnp.float32)
    window = jnp.stack(window_parts[::-1], axis=-1)[..., 1:]
    is_last = ar == seg_end
    pool = pool.at[jnp.where(is_last, slots, sentinel)].set(window)
    return acc, pool


def short_conv_decode(pool, bx, slots, conv_w, conv_b):
    """One token per row: y = conv(window | bx); window rolls."""
    win = jnp.concatenate(
        [pool[slots], bx.astype(jnp.float32)[..., None]], axis=-1
    )
    out = (win * conv_w.astype(jnp.float32)).sum(-1)
    if conv_b is not None:
        out = out + conv_b.astype(jnp.float32)
    pool = pool.at[slots].set(win[..., 1:])
    return out, pool


class Lfm2ForCausalLM(LlamaForCausalLM):
    architectures = ["Lfm2ForCausalLM"]
    qk_norm = True
    supports_chain_tail = False

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        lt = hf.get("layer_types") or ["full_attention"] * self.num_layers
        self.layer_types = list(lt)
        self.conv_k = int(hf.get("conv_L_cache", 3))
        self.conv_bias = bool(hf.get("conv_bias", False))
        inter = config.intermediate_size
        if hf.get("block_auto_adjust_ff_dim"):
            inter = int(2 * inter / 3)
            mult = hf.get("block_ffn_dim_multiplier")
            if mult is not None:
                inter = int(mult * inter)
                bm = int(hf.get("block_multiple_of", 256))
                inter = bm * ((inter + bm - 1) // bm)
        self.ff_dim = inter

    @property
    def kv_kinds(self) -> List[str]:
        return [
            "paged" if t == "full_attention" else "linear"
            for t in self.layer_types
        ]

    def state_specs(self, slots: int) -> dict:
        return {
            "conv": jax.ShapeDtypeStruct(
                (slots + 1, self.hidden_size, self.conv_k - 1), jnp.float32
            ),
        }

    def _layer_specs(self):  # uniform superset; per-layer below
        raise NotImplementedError

    def _attn_ss(self):
        dt = self.config.dtype
        h = self.hidden_size
        hd = self.head_dim
        shapes = dict(
            q=self.methods["qkv"].weight_shapes(h, self.q_size, dt),
            k=self.methods["qkv"].weight_shapes(h, self.kv_size, dt),
            v=self.methods["qkv"].weight_shapes(h, self.kv_size, dt),
            o=self.methods["o"].weight_shapes(self.q_size, h, dt),
            q_norm=jax.ShapeDtypeStruct((hd,), dt),
            k_norm=jax.ShapeDtypeStruct((hd,), dt),
        )
        specs = dict(
            q=_linear_sharding(self.methods["qkv"], col_parallel=True),
            k=_linear_sharding(self.methods["qkv"], col_parallel=True),
            v=_linear_sharding(self.methods["qkv"], col_parallel=True),
            o=_linear_sharding(self.methods["o"], col_parallel=False),
            q_norm=P(None),
            k_norm=P(None),
        )
        return shapes, specs

    def _conv_ss(self):
        dt = self.config.dtype
        h = self.hidden_size
        shapes = dict(
            conv_in=self.methods["qkv"].weight_shapes(h, 3 * h, dt),
            conv_out=self.methods["o"].weight_shapes(h, h, dt),
            conv_w=jax.ShapeDtypeStruct((h, self.conv_k), dt),
        )
        specs = dict(
            conv_in=_linear_sharding(self.methods["qkv"], col_parallel=True),
            conv_out=_linear_sharding(self.methods["o"], col_parallel=False),
            conv_w=P(None, None),
        )
        if self.conv_bias:
            shapes["conv_b"] = jax.ShapeDtypeStruct((h,), dt)
            specs["conv_b"] = P(None)
        return shapes, specs

    def _layer_ss(self, i: int) -> Tuple[dict, dict]:
        c = self.config
        dt = c.dtype
        h = self.hidden_size
        if self.layer_types[i] == "full_attention":
            shapes, specs = self._attn_ss()
        else:
            shapes, specs = self._conv_ss()
        shapes.update(
            input_norm=jax.ShapeDtypeStruct((h,), dt),
            post_norm=jax.ShapeDtypeStruct((h,), dt),
            gate_up=self.methods["gate_up"].weight_shapes(h, 2 * self.ff_dim, dt),
            down=self.methods["down"].weight_shapes(self.ff_dim, h, dt),
        )
        specs.update(
            input_norm=P(None),
            post_norm=P(None),
            gate_up=_linear_sharding(self.methods["gate_up"], col_parallel=True),
            down=_linear_sharding(self.methods["down"], col_parallel=False),
        )
        return shapes, specs

    def param_specs(self) -> dict:
        c = self.config
        dt = c.dtype
        tree = {
            "embed": jax.ShapeDtypeStruct((c.vocab_size, self.hidden_size), dt),
            "layers": [self._layer_ss(i)[0] for i in range(self.num_layers)],
            "final_norm": jax.ShapeDtypeStruct((self.hidden_size,), dt),
        }
        if not c.tie_word_embeddings:
            tree["lm_head"] = jax.ShapeDtypeStruct(
                (self.hidden_size, c.vocab_size), dt
            )
        return tree

    def param_shardings(self) -> dict:
        tree = {
            "embed": P(None, "model"),
            "layers": [self._layer_ss(i)[1] for i in range(self.num_layers)],
            "final_norm": P(None),
        }
        if not self.config.tie_word_embeddings:
            tree["lm_head"] = P(None, "model")
        return tree

    def weight_rules(self) -> List[WeightRule]:
        pre = self.hf_prefix
        rules = [
            WeightRule(("embed",), [f"{pre}.embed_tokens.weight"], kind="embed"),
            WeightRule(("final_norm",), [f"{pre}.embedding_norm.weight"], kind="norm"),
        ]
        if not self.config.tie_word_embeddings:
            rules.append(
                WeightRule(("lm_head",), ["lm_head.weight"], kind="lm_head")
            )
        for i in range(self.num_layers):
            lp = f"{pre}.layers.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(L + ("input_norm",), [f"{lp}.operator_norm.weight"], kind="norm"),
                WeightRule(L + ("post_norm",), [f"{lp}.ffn_norm.weight"], kind="norm"),
                WeightRule(
                    L + ("gate_up",),
                    [f"{lp}.feed_forward.w1.weight", f"{lp}.feed_forward.w3.weight"],
                    kind="linear", method_key="gate_up",
                ),
                WeightRule(L + ("down",), [f"{lp}.feed_forward.w2.weight"], kind="linear", method_key="down"),
            ]
            if self.layer_types[i] == "full_attention":
                rules += [
                    WeightRule(L + ("q",), [f"{lp}.self_attn.q_proj.weight"], kind="linear", method_key="qkv"),
                    WeightRule(L + ("k",), [f"{lp}.self_attn.k_proj.weight"], kind="linear", method_key="qkv"),
                    WeightRule(L + ("v",), [f"{lp}.self_attn.v_proj.weight"], kind="linear", method_key="qkv"),
                    WeightRule(L + ("o",), [f"{lp}.self_attn.out_proj.weight"], kind="linear", method_key="o"),
                    WeightRule(L + ("q_norm",), [f"{lp}.self_attn.q_layernorm.weight"], kind="norm"),
                    WeightRule(L + ("k_norm",), [f"{lp}.self_attn.k_layernorm.weight"], kind="norm"),
                ]
            else:
                rules += [
                    WeightRule(L + ("conv_in",), [f"{lp}.conv.in_proj.weight"], kind="linear", method_key="qkv"),
                    WeightRule(L + ("conv_out",), [f"{lp}.conv.out_proj.weight"], kind="linear", method_key="o"),
                    WeightRule(
                        L + ("conv_w",), [f"{lp}.conv.conv.weight"],
                        kind="raw",
                        transform=lambda w: w.reshape(w.shape[0], w.shape[-1]),
                    ),
                ]
                if self.conv_bias:
                    rules.append(
                        WeightRule(L + ("conv_b",), [f"{lp}.conv.conv.bias"], kind="norm")
                    )
        return rules

    # ------------------------------------------------------------- forward

    def _conv_layer(self, lp, normed, state, fb):
        h = self.hidden_size
        proj = self.methods["qkv"].apply(lp["conv_in"], normed)
        b, cgate, x = proj[:, :h], proj[:, h : 2 * h], proj[:, 2 * h :]
        bx = (b * x).astype(jnp.float32)
        sentinel = state["conv"].shape[0] - 1
        conv_b = lp.get("conv_b")
        if fb.mode.is_decode():
            slots = jnp.minimum(fb.state_slots, sentinel)
            y, pool = short_conv_decode(
                state["conv"], bx, slots, lp["conv_w"], conv_b
            )
        else:
            tok_slots = jnp.minimum(
                fb.state_slots[
                    jnp.clip(fb.token_to_seq, 0, fb.state_slots.shape[0] - 1)
                ],
                sentinel,
            )
            tok_slots = jnp.where(fb.token_kind > 0, tok_slots, sentinel)
            y, pool = short_conv_extend(
                state["conv"], bx, tok_slots, fb.positions,
                lp["conv_w"], conv_b,
            )
        y = (cgate.astype(jnp.float32) * y).astype(normed.dtype)
        return self.methods["o"].apply(lp["conv_out"], y), {"conv": pool}

    def _attn_layer(self, lp, normed, kv_layer, fb, attn_backend):
        c = self.config
        t = normed.shape[0]
        hd, qh, kvh = self.head_dim, self.num_q_heads, self.num_kv_heads
        q = self.methods["qkv"].apply(lp["q"], normed).reshape(t, qh, hd)
        k = self.methods["qkv"].apply(lp["k"], normed).reshape(t, kvh, hd)
        v = self.methods["qkv"].apply(lp["v"], normed).reshape(t, kvh, hd)
        q = rms_norm(q, lp["q_norm"], c.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"], c.rms_norm_eps)
        q = apply_rope(q, fb.positions, self.inv_freq)
        k = apply_rope(k, fb.positions, self.inv_freq)
        attn_out, kv_new = attn_backend(q, k, v, kv_layer, fb, self.sm_scale)
        return self.methods["o"].apply(
            lp["o"], attn_out.reshape(t, -1)
        ), kv_new

    def forward(self, params, kv_layers, fb: ForwardBatch, attn_backend):
        c = self.config
        h = self.embed_tokens(params, fb)
        new_kv = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            normed = rms_norm(h, lp["input_norm"], c.rms_norm_eps)
            if self.layer_types[i] == "full_attention":
                out, kv_i = self._attn_layer(
                    lp, normed, kv_layers[i], fb, attn_backend
                )
            else:
                out, kv_i = self._conv_layer(lp, normed, kv_layers[i], fb)
            h = h + out
            normed = rms_norm(h, lp["post_norm"], c.rms_norm_eps)
            gu = self.methods["gate_up"].apply(lp["gate_up"], normed)
            h = h + self.methods["down"].apply(lp["down"], silu_and_mul(gu))
            new_kv.append(kv_i)
        h = rms_norm(h, params["final_norm"], c.rms_norm_eps)
        return h, new_kv
