"""LLaVA-family vision-language model (CLIP tower + projector + llama).

Parity with reference `srt/models/llava.py` (LlavaLlamaForCausalLM) and
the multimodal embedding routine (`managers/mm_utils.py
general_mm_embed_routine`): images run through a CLIP ViT once at
prefill, project into the language hidden size, and replace the
<image> placeholder rows of the token-embedding stream. The language
stack then serves them like any text tokens (same paged KV, same
kernels); image KV is just KV.

TPU shape of the design: the vision encoder is one jitted function over
a [N, 3, S, S] pixel batch (patchify = one reshape + matmul — no conv
primitive needed), executed by the ENGINE at admission, never inside
the serving step; the serving step receives only (mm_embeds, mm_rows)
scatter pairs, so text-only batches keep their exact compiled variants
(mm fields are None -> different treedef).

Checkpoint layout (hub + transformers serialization):
language_model.model.* (+ language_model.lm_head), vision_tower.vision_model.*,
multi_modal_projector.*.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llama import LlamaForCausalLM


def _layer_norm(x, w, b, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w + b


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class LlavaForConditionalGeneration:
    architectures = ["LlavaForConditionalGeneration", "LlavaLlamaForCausalLM"]

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        self.vcfg = hf["vision_config"]
        if not isinstance(self.vcfg, dict):  # transformers config object
            self.vcfg = self.vcfg.to_dict()
        v = self.vcfg
        self.v_hidden = v["hidden_size"]
        self.v_heads = v["num_attention_heads"]
        self.v_layers = v["num_hidden_layers"]
        self.v_inter = v["intermediate_size"]
        self.patch = v["patch_size"]
        self.image_size = v["image_size"]
        self.n_patches = (self.image_size // self.patch) ** 2
        self.v_eps = v.get("layer_norm_eps", 1e-5)
        self.v_act = (
            _quick_gelu if v.get("hidden_act", "quick_gelu") == "quick_gelu"
            else jax.nn.gelu
        )
        # llava glue
        self.image_token_id = hf.get("image_token_index", 32000)
        self.feature_layer = hf.get("vision_feature_layer", -2)
        self.select_strategy = hf.get(
            "vision_feature_select_strategy", "default"
        )
        proj_act = hf.get("projector_hidden_act", "gelu")
        self.proj_act = (
            _quick_gelu if proj_act == "quick_gelu"
            else (lambda x: jax.nn.gelu(x, approximate=False))
        )
        # language stack (delegation target)
        text_cfg = dataclasses.replace(config)  # geometry already merged
        self.lm = LlamaForCausalLM(text_cfg)
        self.num_layers = self.lm.num_layers
        self.methods = self.lm.methods

    # ------------------------------------------------------------- specs

    def _vision_specs(self) -> Tuple[dict, dict]:
        dt = self.config.dtype
        vh, vi = self.v_hidden, self.v_inter

        def lin(i, o):
            return {
                "w": jax.ShapeDtypeStruct((i, o), dt),
                "b": jax.ShapeDtypeStruct((o,), dt),
            }

        def norm():
            return {
                "w": jax.ShapeDtypeStruct((vh,), dt),
                "b": jax.ShapeDtypeStruct((vh,), dt),
            }

        layer = {
            "ln1": norm(),
            "ln2": norm(),
            "q": lin(vh, vh),
            "k": lin(vh, vh),
            "v": lin(vh, vh),
            "out": lin(vh, vh),
            "fc1": lin(vh, vi),
            "fc2": lin(vi, vh),
        }
        shapes = {
            # HF conv layout [vh, 3, p, p]; flattened to a matmul at use
            "patch_embed": jax.ShapeDtypeStruct((vh, 3, self.patch, self.patch), dt),
            "class_embed": jax.ShapeDtypeStruct((vh,), dt),
            "pos_embed": jax.ShapeDtypeStruct((self.n_patches + 1, vh), dt),
            "pre_ln": norm(),
            "layers": [dict(layer) for _ in range(self.v_layers)],
        }
        specs = jax.tree_util.tree_map(lambda _: P(), shapes)
        return shapes, specs

    def param_specs(self) -> dict:
        dt = self.config.dtype
        h = self.config.hidden_size
        vshapes, _ = self._vision_specs()
        tree = self.lm.param_specs()
        tree["vision"] = vshapes
        tree["projector"] = {
            "l1": {
                "w": jax.ShapeDtypeStruct((self.v_hidden, h), dt),
                "b": jax.ShapeDtypeStruct((h,), dt),
            },
            "l2": {
                "w": jax.ShapeDtypeStruct((h, h), dt),
                "b": jax.ShapeDtypeStruct((h,), dt),
            },
        }
        return tree

    def param_shardings(self) -> dict:
        _, vspecs = self._vision_specs()
        tree = self.lm.param_shardings()
        tree["vision"] = vspecs
        tree["projector"] = {
            "l1": {"w": P(None, None), "b": P(None)},
            "l2": {"w": P(None, None), "b": P(None)},
        }
        return tree

    # ------------------------------------------------------------- loading

    def weight_rules(self) -> List[WeightRule]:
        # hub llava checkpoints use the legacy serialization layout:
        # language_model.model.*, vision_tower.*, multi_modal_projector.*
        self.lm.hf_prefix = "language_model.model"
        rules = []
        for r in self.lm.weight_rules():
            if r.sources == ["lm_head.weight"]:
                r = WeightRule(
                    r.target, ["language_model.lm_head.weight"], kind=r.kind
                )
            rules.append(r)
        vm = "vision_tower.vision_model"
        rules += [
            WeightRule(
                ("vision", "patch_embed"),
                [f"{vm}.embeddings.patch_embedding.weight"],
                kind="raw",
            ),
            WeightRule(
                ("vision", "class_embed"),
                [f"{vm}.embeddings.class_embedding"],
                kind="raw",
            ),
            WeightRule(
                ("vision", "pos_embed"),
                [f"{vm}.embeddings.position_embedding.weight"],
                kind="raw",
            ),
            WeightRule(("vision", "pre_ln", "w"), [f"{vm}.pre_layrnorm.weight"], kind="norm"),
            WeightRule(("vision", "pre_ln", "b"), [f"{vm}.pre_layrnorm.bias"], kind="norm"),
        ]
        lmap = {
            "ln1": "layer_norm1", "ln2": "layer_norm2",
            "q": "self_attn.q_proj", "k": "self_attn.k_proj",
            "v": "self_attn.v_proj", "out": "self_attn.out_proj",
            "fc1": "mlp.fc1", "fc2": "mlp.fc2",
        }
        for i in range(self.v_layers):
            lp = f"{vm}.encoder.layers.{i}"
            for ours, theirs in lmap.items():
                if ours.startswith("ln"):
                    rules += [
                        WeightRule(("vision", "layers", i, ours, "w"),
                                   [f"{lp}.{theirs}.weight"], kind="norm"),
                        WeightRule(("vision", "layers", i, ours, "b"),
                                   [f"{lp}.{theirs}.bias"], kind="norm"),
                    ]
                else:
                    rules += [
                        WeightRule(("vision", "layers", i, ours, "w"),
                                   [f"{lp}.{theirs}.weight"], kind="linear_raw"),
                        WeightRule(("vision", "layers", i, ours, "b"),
                                   [f"{lp}.{theirs}.bias"], kind="norm"),
                    ]
        mp = "multi_modal_projector"
        rules += [
            WeightRule(("projector", "l1", "w"), [f"{mp}.linear_1.weight"], kind="linear_raw"),
            WeightRule(("projector", "l1", "b"), [f"{mp}.linear_1.bias"], kind="norm"),
            WeightRule(("projector", "l2", "w"), [f"{mp}.linear_2.weight"], kind="linear_raw"),
            WeightRule(("projector", "l2", "b"), [f"{mp}.linear_2.bias"], kind="norm"),
        ]
        return rules

    def get_method(self, key: str):
        return self.lm.get_method(key)

    # ------------------------------------------------------------- vision

    def encode_images(self, params: dict, pixel_values: jax.Array) -> jax.Array:
        """[N, 3, S, S] f32 (processor-normalized) -> [N * n_patches, H]
        language-space image embeddings (CLIP ViT -> feature_layer ->
        drop CLS -> projector)."""
        vp = params["vision"]
        n = pixel_values.shape[0]
        p = self.patch
        g = self.image_size // p
        # patchify: one reshape + matmul (conv with stride=kernel=patch)
        x = pixel_values.reshape(n, 3, g, p, g, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(n, g * g, 3 * p * p)
        w_patch = vp["patch_embed"].reshape(self.v_hidden, -1).T  # [3pp, vh]
        x = jnp.dot(x, w_patch, preferred_element_type=jnp.float32)
        cls = jnp.broadcast_to(vp["class_embed"], (n, 1, self.v_hidden))
        h = jnp.concatenate([cls, x.astype(cls.dtype)], axis=1)
        h = h + vp["pos_embed"][None]
        h = _layer_norm(h, vp["pre_ln"]["w"], vp["pre_ln"]["b"], self.v_eps)
        n_layers = (
            self.v_layers + 1 + self.feature_layer
            if self.feature_layer < 0
            else self.feature_layer + 1
        )
        hd = self.v_hidden // self.v_heads
        scale = 1.0 / math.sqrt(hd)
        for i in range(n_layers):
            lp = vp["layers"][i]
            res = h
            x = _layer_norm(h, lp["ln1"]["w"], lp["ln1"]["b"], self.v_eps)
            t = x.shape[1]

            def proj(w, b, x):
                return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype) + b

            q = proj(lp["q"]["w"], lp["q"]["b"], x).reshape(n, t, self.v_heads, hd)
            k = proj(lp["k"]["w"], lp["k"]["b"], x).reshape(n, t, self.v_heads, hd)
            v = proj(lp["v"]["w"], lp["v"]["b"], x).reshape(n, t, self.v_heads, hd)
            att = jnp.einsum("nqhd,nkhd->nhqk", q, k) * scale
            att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", att, v).reshape(n, t, self.v_hidden)
            h = res + proj(lp["out"]["w"], lp["out"]["b"], o)
            res = h
            x = _layer_norm(h, lp["ln2"]["w"], lp["ln2"]["b"], self.v_eps)
            x = self.v_act(proj(lp["fc1"]["w"], lp["fc1"]["b"], x))
            h = res + proj(lp["fc2"]["w"], lp["fc2"]["b"], x)
        feats = h[:, 1:] if self.select_strategy == "default" else h
        pp = params["projector"]
        y = jnp.dot(feats, pp["l1"]["w"], preferred_element_type=jnp.float32)
        y = self.proj_act(y.astype(feats.dtype) + pp["l1"]["b"])
        y = jnp.dot(y, pp["l2"]["w"], preferred_element_type=jnp.float32).astype(
            feats.dtype
        ) + pp["l2"]["b"]
        return y.reshape(-1, y.shape[-1])  # [N * n_patches, H]

    # ------------------------------------------------------------- forward

    def forward(self, params, kv_layers, fb: ForwardBatch, attn_backend):
        return self.lm.forward(params, kv_layers, fb, attn_backend)

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params, hidden)
