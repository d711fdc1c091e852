"""Qwen2-Audio — audio-language model (whisper-style tower + Qwen2 LM).

Parity with reference `srt/models/qwen2_audio.py` / HF
`modeling_qwen2_audio.py`: mel features run a whisper-architecture
encoder ONCE at admission (sinusoidal positions, LN-pre transformer,
time avg-pool k=2/s=2 before the final LN), project through one linear
into the language hidden size, and replace the <|AUDIO|> placeholder
rows of the token-embedding stream — the audio analogue of the LLaVA
image routine, riding the same (mm_embeds, mm_rows) scatter pairs.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import Qwen2ForCausalLM
from sglang_tpu.models.whisper import _layer_norm


class Qwen2AudioForConditionalGeneration:
    architectures = ["Qwen2AudioForConditionalGeneration"]

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        ac = hf["audio_config"]
        if not isinstance(ac, dict):
            ac = ac.to_dict()
        self.acfg = ac
        self.a_d = ac["d_model"]
        self.a_layers = ac["encoder_layers"]
        self.a_heads = ac["encoder_attention_heads"]
        self.a_ffn = ac.get("encoder_ffn_dim", 4 * self.a_d)
        self.n_mels = ac.get("num_mel_bins", 128)
        self.max_source = ac.get("max_source_positions", 1500)
        self.audio_token_id = hf.get("audio_token_index", 151646)
        # mm pipeline compatibility: placeholders are matched on this id
        self.image_token_id = self.audio_token_id
        self.lm = Qwen2ForCausalLM(dataclasses.replace(config))
        self.num_layers = self.lm.num_layers
        self.methods = self.lm.methods
        self._enc_pos = None

    # ------------------------------------------------------------- specs

    def _audio_specs(self) -> Tuple[dict, dict]:
        dt = self.config.dtype
        d, ffn = self.a_d, self.a_ffn

        def lin(i, o):
            return {
                "w": jax.ShapeDtypeStruct((i, o), dt),
                "b": jax.ShapeDtypeStruct((o,), dt),
            }

        def norm():
            return {
                "w": jax.ShapeDtypeStruct((d,), dt),
                "b": jax.ShapeDtypeStruct((d,), dt),
            }

        layer = {
            "ln1": norm(),
            "q": lin(d, d),
            "k": lin(d, d),
            "v": lin(d, d),
            "out": lin(d, d),
            "ln2": norm(),
            "fc1": lin(d, ffn),
            "fc2": lin(ffn, d),
        }
        shapes = {
            "pos": jax.ShapeDtypeStruct((self.max_source, d), dt),
            "conv1_w": jax.ShapeDtypeStruct((d, self.n_mels, 3), dt),
            "conv1_b": jax.ShapeDtypeStruct((d,), dt),
            "conv2_w": jax.ShapeDtypeStruct((d, d, 3), dt),
            "conv2_b": jax.ShapeDtypeStruct((d,), dt),
            "final_ln": norm(),
            "layers": [dict(layer) for _ in range(self.a_layers)],
        }

        def none_tree(x):
            return jax.tree.map(lambda _: P(), x)

        return shapes, none_tree(shapes)

    def param_specs(self) -> dict:
        tree = self.lm.param_specs()
        a_shapes, _ = self._audio_specs()
        tree["audio"] = a_shapes
        dt = self.config.dtype
        tree["projector"] = {
            "w": jax.ShapeDtypeStruct(
                (self.a_d, self.config.hidden_size), dt
            ),
            "b": jax.ShapeDtypeStruct((self.config.hidden_size,), dt),
        }
        return tree

    def param_shardings(self) -> dict:
        tree = self.lm.param_shardings()
        _, a_specs = self._audio_specs()
        tree["audio"] = a_specs
        tree["projector"] = {"w": P(None, None), "b": P(None)}
        return tree

    # ------------------------------------------------------------ loading

    def weight_rules(self) -> List[WeightRule]:
        self.lm.hf_prefix = "language_model.model"
        rules = []
        for r in self.lm.weight_rules():
            if r.sources == ["lm_head.weight"]:
                r = WeightRule(
                    r.target, ["language_model.lm_head.weight"], kind=r.kind
                )
            rules.append(r)
        at = "audio_tower"
        rules += [
            WeightRule(("audio", "pos"), [f"{at}.embed_positions.weight"], kind="raw"),
            WeightRule(("audio", "conv1_w"), [f"{at}.conv1.weight"], kind="raw"),
            WeightRule(("audio", "conv1_b"), [f"{at}.conv1.bias"], kind="raw"),
            WeightRule(("audio", "conv2_w"), [f"{at}.conv2.weight"], kind="raw"),
            WeightRule(("audio", "conv2_b"), [f"{at}.conv2.bias"], kind="raw"),
            WeightRule(("audio", "final_ln", "w"), [f"{at}.layer_norm.weight"], kind="norm"),
            WeightRule(("audio", "final_ln", "b"), [f"{at}.layer_norm.bias"], kind="norm"),
        ]
        lmap = {
            "ln1": "self_attn_layer_norm",
            "q": "self_attn.q_proj", "k": "self_attn.k_proj",
            "v": "self_attn.v_proj", "out": "self_attn.out_proj",
            "ln2": "final_layer_norm",
            "fc1": "fc1", "fc2": "fc2",
        }
        for i in range(self.a_layers):
            lp = f"{at}.layers.{i}"
            for ours, theirs in lmap.items():
                if ours in ("ln1", "ln2"):
                    rules += [
                        WeightRule(("audio", "layers", i, ours, "w"),
                                   [f"{lp}.{theirs}.weight"], kind="norm"),
                        WeightRule(("audio", "layers", i, ours, "b"),
                                   [f"{lp}.{theirs}.bias"], kind="norm"),
                    ]
                else:
                    rules += [
                        WeightRule(("audio", "layers", i, ours, "w"),
                                   [f"{lp}.{theirs}.weight"], kind="linear_raw"),
                        WeightRule(("audio", "layers", i, ours, "b"),
                                   [f"{lp}.{theirs}.bias"], kind="norm"),
                    ]
        mp = "multi_modal_projector"
        rules += [
            WeightRule(("projector", "w"), [f"{mp}.linear.weight"], kind="linear_raw"),
            WeightRule(("projector", "b"), [f"{mp}.linear.bias"], kind="norm"),
        ]
        return rules

    def get_method(self, key: str):
        return self.lm.get_method(key)

    # ------------------------------------------------------------- audio

    def encode_audio(self, params: dict, feats: jax.Array) -> jax.Array:
        """mel features [N, n_mels, T] -> [N * T//4, H] language-space
        audio embeddings (conv/2 -> transformer -> avg-pool/2 -> LN ->
        projector)."""
        ap = params["audio"]
        heads = self.a_heads
        d = self.a_d
        hd = d // heads

        def conv1d(x, w, b, stride):
            xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1)))
            t_out = (x.shape[2] + stride - 1) // stride
            cols = jnp.stack(
                [
                    xp[:, :, i : i + stride * t_out : stride][:, :, :t_out]
                    for i in range(3)
                ],
                axis=-1,
            )
            flat = cols.transpose(0, 2, 1, 3).reshape(
                x.shape[0], t_out, x.shape[1] * 3
            )
            wf = w.transpose(1, 2, 0).reshape(x.shape[1] * 3, w.shape[0])
            return flat @ wf + b

        h = jax.nn.gelu(conv1d(feats, ap["conv1_w"], ap["conv1_b"], 1))
        h = h.transpose(0, 2, 1)
        h = jax.nn.gelu(conv1d(h, ap["conv2_w"], ap["conv2_b"], 2))
        h = h + ap["pos"][: h.shape[1]]
        scale = hd**-0.5
        for li in range(self.a_layers):
            lp = ap["layers"][li]
            a = _layer_norm(h, lp["ln1"]["w"], lp["ln1"]["b"])
            q = (a @ lp["q"]["w"] + lp["q"]["b"]) * scale
            k = a @ lp["k"]["w"] + lp["k"].get("b", 0.0)  # whisper: no k bias
            v = a @ lp["v"]["w"] + lp["v"]["b"]
            n, t = a.shape[0], a.shape[1]
            qh = q.reshape(n, t, heads, hd)
            kh = k.reshape(n, t, heads, hd)
            vh = v.reshape(n, t, heads, hd)
            s = jnp.einsum("nqhd,nkhd->nhqk", qh, kh)
            p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(a.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", p, vh).reshape(n, t, d)
            h = h + (o @ lp["out"]["w"] + lp["out"]["b"])
            a = _layer_norm(h, lp["ln2"]["w"], lp["ln2"]["b"])
            h = h + (
                jax.nn.gelu(a @ lp["fc1"]["w"] + lp["fc1"]["b"])
                @ lp["fc2"]["w"]
                + lp["fc2"]["b"]
            )
        # time avg-pool k=2/s=2 BEFORE the final LN (Qwen2AudioEncoder)
        t2 = (h.shape[1] // 2) * 2
        h = h[:, :t2].reshape(h.shape[0], t2 // 2, 2, d).mean(axis=2)
        h = _layer_norm(h, ap["final_ln"]["w"], ap["final_ln"]["b"])
        pp = params["projector"]
        y = h @ pp["w"] + pp["b"]
        return y.reshape(-1, y.shape[-1])

    # mm pipeline: the engine calls encode_images for placeholder-row
    # embeddings; for an audio model the "pixels" are mel features
    def encode_images(self, params: dict, pixel_values: jax.Array) -> jax.Array:
        return self.encode_audio(params, pixel_values)

    # ------------------------------------------------------------- forward

    def forward(self, params, kv_layers, fb: ForwardBatch, attn_backend):
        return self.lm.forward(params, kv_layers, fb, attn_backend)

    def decoder_layer(self, *a, **kw):
        return self.lm.decoder_layer(*a, **kw)

    def embed_tokens(self, params: dict, fb: ForwardBatch) -> jax.Array:
        return self.lm.embed_tokens(params, fb)

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params, hidden)
