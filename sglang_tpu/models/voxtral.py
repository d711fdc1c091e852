"""Voxtral (Mistral audio): whisper-style encoder + llama LM.

Parity with reference `srt/models/voxtral.py` / HF
`modeling_voxtral.py`: the audio tower is the whisper encoder the
Qwen2-Audio model already implements (conv/2 -> transformer -> final
LN, NO avg-pool); afterwards every `intermediate_size / d_model`
consecutive frames concatenate into one feature
(`reshape(-1, intermediate_size)`) and pass through a bias-free
linear -> GELU -> linear projector into the text hidden size."""

from __future__ import annotations

from typing import List

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM
from sglang_tpu.models.qwen2_audio import Qwen2AudioForConditionalGeneration
from sglang_tpu.models.whisper import _layer_norm


class VoxtralForConditionalGeneration(Qwen2AudioForConditionalGeneration):
    architectures = ["VoxtralForConditionalGeneration"]

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.audio_token_id = hf.get("audio_token_id", 24)
        self.image_token_id = self.audio_token_id
        self.a_inter = int(self.acfg.get("intermediate_size", 4 * self.a_d))
        self.group = self.a_inter // self.a_d
        # llama text stack (mistral) instead of qwen2
        self.lm = LlamaForCausalLM(dataclasses.replace(config))
        self.num_layers = self.lm.num_layers
        self.methods = self.lm.methods

    def param_specs(self) -> dict:
        tree = super().param_specs()
        dt = self.config.dtype
        th = self.config.hidden_size
        tree["projector"] = {
            "l1": jax.ShapeDtypeStruct((self.a_inter, th), dt),
            "l2": jax.ShapeDtypeStruct((th, th), dt),
        }
        return tree

    def param_shardings(self) -> dict:
        tree = super().param_shardings()
        tree["projector"] = {"l1": P(None, None), "l2": P(None, None)}
        return tree

    def weight_rules(self) -> List[WeightRule]:
        rules = [
            r
            for r in super().weight_rules()
            if r.target[0] != "projector"
        ]
        mp = "multi_modal_projector"
        rules += [
            WeightRule(("projector", "l1"), [f"{mp}.linear_1.weight"], kind="linear_raw"),
            WeightRule(("projector", "l2"), [f"{mp}.linear_2.weight"], kind="linear_raw"),
        ]
        return rules

    def encode_audio(self, params: dict, feats: jax.Array) -> jax.Array:
        """mel [N, n_mels, T] -> [N * T//2//group, H]."""
        # run the shared whisper encoder WITHOUT the qwen2-audio pooling:
        # replicate the parent pipeline up to the final LN
        ap = params["audio"]
        parent = Qwen2AudioForConditionalGeneration
        # conv + transformer from the parent, pooling removed: call the
        # parent implementation on a throwaway projector-free params tree
        h = self._encoder_hidden(params, feats)
        h = _layer_norm(h, ap["final_ln"]["w"], ap["final_ln"]["b"])
        n, t, d = h.shape
        g = self.group
        tg = (t // g) * g
        h = h[:, :tg].reshape(n * (tg // g), g * d)
        pp = params["projector"]
        y = jnp.dot(h, pp["l1"], preferred_element_type=jnp.float32).astype(
            h.dtype
        )
        y = jax.nn.gelu(y, approximate=False)
        y = jnp.dot(y, pp["l2"], preferred_element_type=jnp.float32).astype(
            h.dtype
        )
        return y

    def _encoder_hidden(self, params, feats):
        """Whisper encoder up to (not including) the final LN — the
        parent's pipeline with pooling and projection stripped."""
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
            k = a @ lp["k"]["w"] + lp["k"].get("b", 0.0)
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
        return h
