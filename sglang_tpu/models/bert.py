"""BERT / RoBERTa encoder-only models (embedding & reranker backbones).

Parity with reference `srt/models/bert.py` and `srt/models/roberta.py`
(the bge / e5 embedding family). TPU-native design: instead of a separate
encoder runtime, the encoder rides the SAME ragged prefill layout as
decoder prefill — bidirectional attention is a segment mask
(`token_to_seq[i] == token_to_seq[j]`) over the packed token axis, so one
jitted forward serves any mix of sequences with zero padding between them.
KV pool arrays pass through untouched (encoders keep no cache).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.linear import make_linear_method
from sglang_tpu.layers.norms import layer_norm
from sglang_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import _linear_sharding


class BertModel:
    architectures = ["BertModel", "BertForSequenceEncoding"]
    is_encoder = True
    hf_prefix = ""  # BertModel checkpoints save unprefixed tensor names
    position_offset = 0

    def __init__(self, config: ModelConfig):
        self.config = config
        c = config
        self.num_layers = c.num_hidden_layers
        self.num_q_heads = c.num_attention_heads
        self.num_kv_heads = c.num_attention_heads
        self.head_dim = c.head_dim
        self.hidden_size = c.hidden_size
        self.q_size = self.num_q_heads * self.head_dim
        self.sm_scale = self.head_dim**-0.5
        self.ln_eps = c.hf_config.get("layer_norm_eps", 1e-12)
        self.type_vocab = c.hf_config.get("type_vocab_size", 2)
        self.methods: Dict[str, object] = {
            k: make_linear_method(c.quantization, bias=True)
            for k in ("qkv", "o", "fc1", "fc2")
        }

    # ------------------------------------------------------------- specs
    def _layer_specs(self) -> Tuple[dict, dict]:
        c = self.config
        dt = c.dtype
        h = self.hidden_size
        inter = c.intermediate_size
        shapes = {
            "qkv": self.methods["qkv"].weight_shapes(h, 3 * self.q_size, dt),
            "o": self.methods["o"].weight_shapes(self.q_size, h, dt),
            "attn_ln_w": jax.ShapeDtypeStruct((h,), dt),
            "attn_ln_b": jax.ShapeDtypeStruct((h,), dt),
            "fc1": self.methods["fc1"].weight_shapes(h, inter, dt),
            "fc2": self.methods["fc2"].weight_shapes(inter, h, dt),
            "out_ln_w": jax.ShapeDtypeStruct((h,), dt),
            "out_ln_b": jax.ShapeDtypeStruct((h,), dt),
        }
        specs = {
            "qkv": _linear_sharding(self.methods["qkv"], col_parallel=True),
            "o": _linear_sharding(self.methods["o"], col_parallel=False),
            "attn_ln_w": P(None),
            "attn_ln_b": P(None),
            "fc1": _linear_sharding(self.methods["fc1"], col_parallel=True),
            "fc2": _linear_sharding(self.methods["fc2"], col_parallel=False),
            "out_ln_w": P(None),
            "out_ln_b": P(None),
        }
        return shapes, specs

    def param_specs(self) -> dict:
        c = self.config
        dt = c.dtype
        layer_shapes, _ = self._layer_specs()
        return {
            "word_emb": jax.ShapeDtypeStruct((c.vocab_size, c.hidden_size), dt),
            "pos_emb": jax.ShapeDtypeStruct(
                (c.max_position_embeddings, c.hidden_size), dt
            ),
            "type_emb": jax.ShapeDtypeStruct((self.type_vocab, c.hidden_size), dt),
            "emb_ln_w": jax.ShapeDtypeStruct((c.hidden_size,), dt),
            "emb_ln_b": jax.ShapeDtypeStruct((c.hidden_size,), dt),
            "layers": [dict(layer_shapes) for _ in range(self.num_layers)],
        }

    def param_shardings(self) -> dict:
        _, layer_specs = self._layer_specs()
        return {
            "word_emb": P(None, None),
            "pos_emb": P(None, None),
            "type_emb": P(None, None),
            "emb_ln_w": P(None),
            "emb_ln_b": P(None),
            "layers": [dict(layer_specs) for _ in range(self.num_layers)],
        }

    # ----------------------------------------------------------- loading
    def weight_rules(self) -> List[WeightRule]:
        pre = self.hf_prefix
        p = (pre + ".") if pre else ""
        rules = [
            WeightRule(("word_emb",), [f"{p}embeddings.word_embeddings.weight"], kind="embed"),
            WeightRule(("pos_emb",), [f"{p}embeddings.position_embeddings.weight"], kind="raw"),
            WeightRule(("type_emb",), [f"{p}embeddings.token_type_embeddings.weight"], kind="raw"),
            WeightRule(("emb_ln_w",), [f"{p}embeddings.LayerNorm.weight"], kind="norm"),
            WeightRule(("emb_ln_b",), [f"{p}embeddings.LayerNorm.bias"], kind="norm"),
        ]
        for i in range(self.num_layers):
            lp = f"{p}encoder.layer.{i}"
            L = ("layers", i)
            rules += [
                WeightRule(
                    L + ("qkv",),
                    [
                        f"{lp}.attention.self.query.weight",
                        f"{lp}.attention.self.key.weight",
                        f"{lp}.attention.self.value.weight",
                    ],
                    kind="linear",
                    method_key="qkv",
                ),
                WeightRule(
                    L + ("qkv", "b"),
                    [
                        f"{lp}.attention.self.query.bias",
                        f"{lp}.attention.self.key.bias",
                        f"{lp}.attention.self.value.bias",
                    ],
                    kind="linear_bias",
                ),
                WeightRule(
                    L + ("o",), [f"{lp}.attention.output.dense.weight"],
                    kind="linear", method_key="o",
                ),
                WeightRule(
                    L + ("o", "b"), [f"{lp}.attention.output.dense.bias"],
                    kind="linear_bias",
                ),
                WeightRule(L + ("attn_ln_w",), [f"{lp}.attention.output.LayerNorm.weight"], kind="norm"),
                WeightRule(L + ("attn_ln_b",), [f"{lp}.attention.output.LayerNorm.bias"], kind="norm"),
                WeightRule(
                    L + ("fc1",), [f"{lp}.intermediate.dense.weight"],
                    kind="linear", method_key="fc1",
                ),
                WeightRule(
                    L + ("fc1", "b"), [f"{lp}.intermediate.dense.bias"],
                    kind="linear_bias",
                ),
                WeightRule(
                    L + ("fc2",), [f"{lp}.output.dense.weight"],
                    kind="linear", method_key="fc2",
                ),
                WeightRule(
                    L + ("fc2", "b"), [f"{lp}.output.dense.bias"],
                    kind="linear_bias",
                ),
                WeightRule(L + ("out_ln_w",), [f"{lp}.output.LayerNorm.weight"], kind="norm"),
                WeightRule(L + ("out_ln_b",), [f"{lp}.output.LayerNorm.bias"], kind="norm"),
            ]
        return rules

    def get_method(self, key: str):
        return self.methods[key]

    # ----------------------------------------------------------- forward
    def forward(
        self,
        params: dict,
        kv_layers: List[jax.Array],
        fb: ForwardBatch,
        attn_backend,
    ) -> Tuple[jax.Array, List[jax.Array]]:
        t = fb.input_ids.shape[0]
        valid = fb.token_kind > 0
        seg = fb.token_to_seq
        # bidirectional within each sequence, blocked across sequences/pad
        mask = (seg[:, None] == seg[None, :]) & valid[None, :]
        bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
        pos = fb.positions + self.position_offset
        h = (
            params["word_emb"][fb.input_ids]
            + params["pos_emb"][pos]
            + params["type_emb"][0][None, :]
        )
        h = layer_norm(h, params["emb_ln_w"], params["emb_ln_b"], self.ln_eps)
        for i in range(self.num_layers):
            lp = params["layers"][i]
            qkv = self.methods["qkv"].apply(lp["qkv"], h)
            q = qkv[:, : self.q_size].reshape(t, self.num_q_heads, self.head_dim)
            k = qkv[:, self.q_size : 2 * self.q_size].reshape(
                t, self.num_q_heads, self.head_dim
            )
            v = qkv[:, 2 * self.q_size :].reshape(
                t, self.num_q_heads, self.head_dim
            )
            scores = (
                jnp.einsum(
                    "thd,shd->hts", q, k, preferred_element_type=jnp.float32
                )
                * self.sm_scale
                + bias[None, :, :]
            )
            probs = jax.nn.softmax(scores, axis=-1).astype(h.dtype)
            ctx = jnp.einsum("hts,shd->thd", probs, v).reshape(t, self.q_size)
            attn_out = self.methods["o"].apply(lp["o"], ctx)
            h = layer_norm(
                h + attn_out, lp["attn_ln_w"], lp["attn_ln_b"], self.ln_eps
            )
            fc = self.methods["fc1"].apply(lp["fc1"], h)
            fc = jax.nn.gelu(fc.astype(jnp.float32), approximate=False).astype(
                h.dtype
            )
            mlp_out = self.methods["fc2"].apply(lp["fc2"], fc)
            h = layer_norm(
                h + mlp_out, lp["out_ln_w"], lp["out_ln_b"], self.ln_eps
            )
        return h, kv_layers

    def compute_logits(self, params, hidden):
        raise NotImplementedError("encoder-only model has no lm head")


class XLMRobertaModel(BertModel):
    """RoBERTa position ids start at padding_idx + 1 = 2 (reference
    `srt/models/roberta.py`)."""

    architectures = ["XLMRobertaModel", "RobertaModel"]
    position_offset = 2
