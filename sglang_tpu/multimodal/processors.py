"""Multimodal processor registry.

Role parity with reference `srt/multimodal/processors/` (one processor
class per model family, auto-dispatched from the model class —
`base_processor.py BaseMultimodalProcessor` + per-model files) replacing
the if/elif chain that used to live in `entrypoints/engine.py`.

TPU split of responsibilities:
- the VISION TOWER runs jitted on device (`ModelRunner.encode_images`,
  bucketed shapes) — that part belongs to the model;
- the PROCESSOR is host-side arrangement: normalize the request's
  `image_data` payload, batch/flatten tiles, call the tower, reassemble
  per-model feature layouts (anyres tiling, pixel-shuffle, resampler
  query counts), and compute placeholder positions / M-RoPE indices.

A processor is looked up by the model's class name (walking the MRO so
subclasses inherit their family's processor); models without a
registered processor get `DefaultMMProcessor`, which reproduces the
payload-shape dispatch the engine always supported (anyres dict / grid
dict / plain pixel arrays).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional, Type

import numpy as np


@dataclass
class MMResult:
    mm_embeds: Optional[np.ndarray]  # [M, H] f32
    mm_positions: Optional[np.ndarray]  # [M] i32 prompt positions
    mrope_positions: Optional[np.ndarray] = None  # [3, T] i32
    mrope_delta: Optional[int] = None


_REGISTRY: Dict[str, Type["BaseMMProcessor"]] = {}


def register_mm_processor(*model_class_names: str):
    """Class decorator: attach a processor to one or more model class
    names (reference keys processors by model class the same way)."""

    def deco(cls):
        for name in model_class_names:
            _REGISTRY[name] = cls
        return cls

    return deco


def get_mm_processor(
    model, encode_fn: Callable, params=None
) -> "BaseMMProcessor":
    """Resolve the processor for `model` (MRO walk, most specific first).
    `params` is the runner's loaded weight pytree (host-side reassembly
    sometimes needs a weight, e.g. LLaVA-NeXT's image_newline)."""
    for klass in type(model).__mro__:
        proc = _REGISTRY.get(klass.__name__)
        if proc is not None:
            return proc(model, encode_fn, params)
    return DefaultMMProcessor(model, encode_fn, params)


class BaseMMProcessor:
    """One per request family. `encode_fn(pixel_values, grid_thw=None)`
    runs the model's jitted vision tower (local or the encode-disagg
    client — the caller owns that choice)."""

    def __init__(self, model, encode_fn: Callable, params=None):
        self.model = model
        self.encode = encode_fn
        self.params = params

    # ------------------------------------------------------------ helpers

    def placeholder_positions(self, ids) -> np.ndarray:
        """Prompt positions of image/video/audio placeholder tokens."""
        ids_arr = np.asarray(ids)
        img_tok = getattr(self.model, "image_token_id", None)
        if img_tok is None:
            raise ValueError("image_data given but model is text-only")
        is_mm = ids_arr == img_tok
        vid_tok = getattr(self.model, "video_token_id", None)
        if vid_tok is not None:
            is_mm |= ids_arr == vid_tok
        return np.where(is_mm)[0]

    def check_counts(self, positions: np.ndarray, embeds: np.ndarray):
        if len(positions) != embeds.shape[0]:
            raise ValueError(
                f"prompt has {len(positions)} image-placeholder tokens but "
                f"images produce {embeds.shape[0]} embeddings"
            )

    def _shape_dispatch(self, ids, image_data) -> MMResult:
        """Route by payload shape (the pre-registry engine behavior) —
        family processors fall back here for payloads outside their
        native format, so registering a family never narrows what the
        engine accepts."""
        return DefaultMMProcessor(
            self.model, self.encode, self.params
        ).process(ids, image_data)

    # -------------------------------------------------------------- hooks

    def process(self, ids, image_data) -> MMResult:
        raise NotImplementedError


class SimpleImageProcessor(BaseMMProcessor):
    """Plain pixel payloads: `[3, S, S]` / `[N, 3, S, S]` images (or
    `[n_mels, T]` audio features for audio-token models) -> one tower
    call, embeddings land on the placeholder tokens in prompt order.
    Reference analogue: `processors/llava.py` single-image path."""

    def process(self, ids, image_data) -> MMResult:
        if isinstance(image_data, dict):
            if "image_sizes" in image_data or "grid_thw" in image_data:
                return self._shape_dispatch(ids, image_data)
            image_data = image_data["pixel_values"]
        pix = np.asarray(image_data, dtype=np.float32)
        if pix.ndim in (2, 3):
            pix = pix[None]
        embeds = np.asarray(self.encode(pix))
        pos = self.placeholder_positions(ids)
        self.check_counts(pos, embeds)
        return MMResult(mm_embeds=embeds, mm_positions=pos)


class AnyResProcessor(BaseMMProcessor):
    """LLaVA-NeXT anyres tiling: `{pixel_values: [N, tiles, 3, S, S],
    image_sizes: [N, 2]}` — the flat tile batch encodes jitted; host-side
    reassembly (unpad + image-newline insertion) is the model's
    `pack_anyres_features`. Reference: `processors/llava.py` anyres."""

    def process(self, ids, image_data) -> MMResult:
        if not (isinstance(image_data, dict) and "image_sizes" in image_data):
            return self._shape_dispatch(ids, image_data)
        pix = np.asarray(image_data["pixel_values"], dtype=np.float32)
        n_img, n_tiles = pix.shape[:2]
        flat = pix.reshape((-1,) + pix.shape[2:])
        feats = np.asarray(self.encode(flat))
        # pack_anyres_features needs params the runner owns; the model
        # carries a bound hook set at load (engine passes image_newline)
        embeds = self.model.pack_anyres_features(
            feats,
            n_img,
            n_tiles,
            image_data["image_sizes"],
            np.asarray(self.params["image_newline"]),
        )
        pos = self.placeholder_positions(ids)
        self.check_counts(pos, embeds)
        return MMResult(mm_embeds=embeds, mm_positions=pos)

class GridVLProcessor(BaseMMProcessor):
    """Grid-native models (Qwen2-VL / Qwen2.5-VL): patchified pixel rows
    + `grid_thw`; M-RoPE positions derive from the grid via the model's
    `get_rope_index`. Reference: `processors/qwen_vl.py`."""

    def process(self, ids, image_data) -> MMResult:
        if not (isinstance(image_data, dict) and "grid_thw" in image_data):
            return self._shape_dispatch(ids, image_data)
        pix = np.asarray(image_data["pixel_values"], dtype=np.float32)
        grid = tuple(int(x) for x in image_data["grid_thw"])
        embeds = np.asarray(self.encode(pix, grid_thw=grid))
        mrope_positions, mrope_delta = self.model.get_rope_index(
            list(ids), [grid]
        )
        pos = self.placeholder_positions(ids)
        self.check_counts(pos, embeds)
        return MMResult(
            mm_embeds=embeds,
            mm_positions=pos,
            mrope_positions=mrope_positions,
            mrope_delta=mrope_delta,
        )


class GridImageProcessor(BaseMMProcessor):
    """Grid-native tower WITHOUT multimodal rope (Kimi-VL: MoonViT takes
    raster patch tiles + a grid, the DeepSeek language stack keeps 1-D
    rope). Reference: `processors/kimi_vl.py`."""

    def process(self, ids, image_data) -> MMResult:
        if not (
            isinstance(image_data, dict)
            and ("grid_thw" in image_data or "grid_hw" in image_data)
        ):
            return self._shape_dispatch(ids, image_data)
        pix = np.asarray(image_data["pixel_values"], dtype=np.float32)
        grid = tuple(
            int(x)
            for x in (image_data.get("grid_thw") or image_data["grid_hw"])
        )
        embeds = np.asarray(self.encode(pix, grid_thw=grid))
        pos = self.placeholder_positions(ids)
        self.check_counts(pos, embeds)
        return MMResult(mm_embeds=embeds, mm_positions=pos)


class DefaultMMProcessor(BaseMMProcessor):
    """Payload-shape dispatch (the engine's historical behavior): anyres
    dict -> AnyResProcessor, grid dict -> GridVLProcessor, plain array ->
    SimpleImageProcessor."""

    def process(self, ids, image_data) -> MMResult:
        if isinstance(image_data, dict) and "image_sizes" in image_data:
            return AnyResProcessor(self.model, self.encode, self.params).process(
                ids, image_data
            )
        if isinstance(image_data, dict) and "grid_thw" in image_data:
            return GridVLProcessor(self.model, self.encode, self.params).process(
                ids, image_data
            )
        return SimpleImageProcessor(self.model, self.encode, self.params).process(
            ids, image_data
        )


# family bindings for the in-tree models (each family can still receive
# any payload shape its processor supports)
register_mm_processor("LlavaForConditionalGeneration", "LlavaLlamaForCausalLM")(
    SimpleImageProcessor
)
# InternVL: pre-tiled [N, 3, S, S] pixel batches; tiling/thumbnail policy
# is client-side (reference `processors/internvl.py` dynamic_preprocess)
register_mm_processor("InternVLForConditionalGeneration")(SimpleImageProcessor)
# Idefics3/SmolVLM: pre-tiled sub-image batches (the 364-px grid split is
# processor-side; reference `processors/`... idefics lineage)
register_mm_processor(
    "Idefics3ForConditionalGeneration", "SmolVLMForConditionalGeneration"
)(SimpleImageProcessor)
register_mm_processor("AyaVisionForConditionalGeneration")(SimpleImageProcessor)
# Mistral3/Pixtral: native-resolution single images (grid from the shape)
register_mm_processor("Mistral3ForConditionalGeneration")(SimpleImageProcessor)
# MiniCPM-V: pre-sliced square tiles; each contributes query_num tokens
register_mm_processor("MiniCPMVForConditionalGeneration")(SimpleImageProcessor)
register_mm_processor("LlavaNextForConditionalGeneration")(AnyResProcessor)
register_mm_processor(
    "Qwen2VLForConditionalGeneration",
    "Qwen2_5_VLForConditionalGeneration",
    # GLM-4V and Qwen3-VL are grid-native too (patch rows + grid + mrope)
    "Glm4vForConditionalGeneration",
    "Qwen3VLForConditionalGeneration",
    "Qwen3VLMoeForConditionalGeneration",
)(GridVLProcessor)
register_mm_processor("KimiVLForConditionalGeneration")(GridImageProcessor)


@register_mm_processor("Qwen2AudioForConditionalGeneration")
class AudioFeatureProcessor(BaseMMProcessor):
    """Audio-token models (Qwen2-Audio): `[n_mels, T]` mel features ->
    audio tower; embeddings land on the audio placeholder tokens.
    Reference: `processors/qwen_audio.py`."""

    def process(self, ids, image_data) -> MMResult:
        feats = np.asarray(image_data, dtype=np.float32)
        if feats.ndim == 2:
            feats = feats[None]
        embeds = np.asarray(self.encode(feats))
        pos = self.placeholder_positions(ids)
        self.check_counts(pos, embeds)
        return MMResult(mm_embeds=embeds, mm_positions=pos)
