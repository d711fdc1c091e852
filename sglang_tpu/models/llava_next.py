"""LLaVA-NeXT (llava-v1.6) — anyres tiled vision-language model.

Parity with reference `srt/models/llava.py` (LlavaNext branches) / HF
`modeling_llava_next.py`: each image is processed as a base thumbnail
plus an aspect-ratio-selected grid of high-res tiles
(`image_grid_pinpoints`); tile features are re-assembled spatially,
padding rows from the aspect-preserving resize are dropped (`unpad`),
an `image_newline` embedding terminates each row, and the base
thumbnail's features are prepended. The HF processor expands the
<image> placeholder to exactly this many tokens, so the engine's
placeholder-row scatter needs no model-specific logic.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.model_loader.weight_mapping import WeightRule
from sglang_tpu.models.llava import LlavaForConditionalGeneration


def select_best_resolution(size: Tuple[int, int], pinpoints) -> Tuple[int, int]:
    """HF `select_best_resolution`: pick the pinpoint (h, w) maximizing
    effective resolution then minimizing waste. `size` is (height, width)."""
    oh, ow = size
    best = None
    best_fit = (-1, float("inf"))
    for ph, pw in pinpoints:
        scale = min(pw / ow, ph / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        effective = min(dw * dh, ow * oh)
        waste = pw * ph - effective
        fit = (effective, waste)
        if fit[0] > best_fit[0] or (
            fit[0] == best_fit[0] and fit[1] < best_fit[1]
        ):
            best_fit = fit
            best = (ph, pw)
    return best


class LlavaNextForConditionalGeneration(LlavaForConditionalGeneration):
    architectures = ["LlavaNextForConditionalGeneration"]
    mm_input_kind = "anyres"

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.grid_pinpoints = hf.get(
            "image_grid_pinpoints",
            [[336, 672], [672, 336], [672, 672], [1008, 336], [336, 1008]],
        )

    def param_specs(self) -> dict:
        tree = super().param_specs()
        tree["image_newline"] = jax.ShapeDtypeStruct(
            (self.config.hidden_size,), self.config.dtype
        )
        return tree

    def param_shardings(self) -> dict:
        from jax.sharding import PartitionSpec as P

        tree = super().param_shardings()
        tree["image_newline"] = P(None)
        return tree

    def weight_rules(self) -> List[WeightRule]:
        rules = super().weight_rules()
        rules.append(
            WeightRule(("image_newline",), ["image_newline"], kind="raw")
        )
        return rules

    def pack_anyres_features(
        self,
        feats: np.ndarray,  # [N_img * n_tiles * g^2, H] from the jitted tower
        n_img: int,
        n_tiles: int,
        image_sizes,
        newline: np.ndarray,  # [H]
    ) -> np.ndarray:
        """Host-side reassembly (numpy; the tower stays the one jitted
        function): HF `pack_image_features` order — base thumbnail
        features first, then the unpadded spatial tiles with
        `image_newline` closing each feature row."""
        g = self.image_size // self.patch
        hdim = feats.shape[-1]
        feats = feats.reshape(n_img, n_tiles, g * g, hdim)
        out = []
        for i in range(n_img):
            oh, ow = int(image_sizes[i][0]), int(image_sizes[i][1])
            base = feats[i, 0]  # [g*g, H]
            ph, pw = select_best_resolution((oh, ow), self.grid_pinpoints)
            gh, gw = ph // self.image_size, pw // self.image_size
            sp = feats[i, 1 : 1 + gh * gw].reshape(gh, gw, g, g, hdim)
            sp = sp.transpose(0, 2, 1, 3, 4).reshape(gh * g, gw * g, hdim)
            # unpad: drop the letterbox rows/cols of the aspect-preserving
            # resize (HF `unpad_image`)
            cur_h, cur_w = gh * g, gw * g
            if ow / oh > cur_w / cur_h:
                new_h = int(round(oh * (cur_w / ow), 7))
                pad = (cur_h - new_h) // 2
                sp = sp[pad : cur_h - pad]
            else:
                new_w = int(round(ow * (cur_h / oh), 7))
                pad = (cur_w - new_w) // 2
                sp = sp[:, pad : cur_w - pad]
            nl = np.broadcast_to(newline, (sp.shape[0], 1, hdim))
            sp = np.concatenate([sp, nl], axis=1).reshape(-1, hdim)
            out.append(np.concatenate([base, sp], axis=0))
        return np.concatenate(out, axis=0)
