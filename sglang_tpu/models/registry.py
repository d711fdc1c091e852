"""Model registry.

Parity with reference `srt/models/registry.py:95 import_model_classes`
(EntryClass auto-discovery). Explicit registration here — model classes
declare `architectures` and are resolved from the HF config.
"""

from __future__ import annotations

from typing import Dict

from sglang_tpu.configs.model_config import ModelConfig

_REGISTRY: Dict[str, type] = {}


_TYPE_REGISTRY = {}


def register_model(cls) -> type:
    for arch in cls.architectures:
        _REGISTRY[arch] = cls
    for mt in getattr(cls, "model_types", ()):  # config.model_type fallback
        _TYPE_REGISTRY[mt] = cls
    return cls


def _populate():
    if _REGISTRY:
        return
    from sglang_tpu.models.llama import (
        LlamaForCausalLM,
        Qwen2ForCausalLM,
        Qwen3ForCausalLM,
    )

    for cls in (LlamaForCausalLM, Qwen2ForCausalLM, Qwen3ForCausalLM):
        register_model(cls)
    try:
        from sglang_tpu.models.mixtral import MixtralForCausalLM
        from sglang_tpu.models.qwen2_moe import Qwen2MoeForCausalLM, Qwen3MoeForCausalLM

        register_model(MixtralForCausalLM)
        register_model(Qwen2MoeForCausalLM)
        register_model(Qwen3MoeForCausalLM)
    except ImportError:
        pass
    try:
        from sglang_tpu.models.gemma2 import Gemma2ForCausalLM

        register_model(Gemma2ForCausalLM)
    except ImportError:
        pass
    from sglang_tpu.models.deepseek_v2 import DeepseekV2ForCausalLM

    register_model(DeepseekV2ForCausalLM)
    from sglang_tpu.models.gpt_oss import GptOssForCausalLM

    register_model(GptOssForCausalLM)
    from sglang_tpu.models.llava import LlavaForConditionalGeneration

    register_model(LlavaForConditionalGeneration)
    from sglang_tpu.models.qwen2_vl import Qwen2VLForConditionalGeneration

    register_model(Qwen2VLForConditionalGeneration)
    from sglang_tpu.models.llava_next import LlavaNextForConditionalGeneration

    register_model(LlavaNextForConditionalGeneration)
    from sglang_tpu.models.qwen2_audio import Qwen2AudioForConditionalGeneration

    register_model(Qwen2AudioForConditionalGeneration)
    from sglang_tpu.models.qwen3_next import Qwen3NextForCausalLM

    register_model(Qwen3NextForCausalLM)
    from sglang_tpu.models.mamba2 import Mamba2ForCausalLM

    register_model(Mamba2ForCausalLM)
    from sglang_tpu.models.bamba import BambaForCausalLM

    register_model(BambaForCausalLM)
    from sglang_tpu.models.phi3 import Phi3ForCausalLM

    register_model(Phi3ForCausalLM)
    from sglang_tpu.models.glm4 import Glm4ForCausalLM

    register_model(Glm4ForCausalLM)
    from sglang_tpu.models.olmo2 import Olmo2ForCausalLM

    register_model(Olmo2ForCausalLM)
    from sglang_tpu.models.starcoder2 import Starcoder2ForCausalLM

    register_model(Starcoder2ForCausalLM)
    from sglang_tpu.models.gemma3 import Gemma3TextForCausalLM

    register_model(Gemma3TextForCausalLM)
    from sglang_tpu.models.cohere import (
        Cohere2ForCausalLM,
        CohereForCausalLM,
    )

    register_model(Cohere2ForCausalLM)
    from sglang_tpu.models.gemma import GemmaForCausalLM
    from sglang_tpu.models.gpt2 import GPT2LMHeadModel, GPTBigCodeForCausalLM
    from sglang_tpu.models.granite import GraniteForCausalLM
    from sglang_tpu.models.olmoe import OlmoeForCausalLM
    from sglang_tpu.models.phi import PhiForCausalLM
    from sglang_tpu.models.stablelm import StableLmForCausalLM

    # breadth batch 3 (reference srt/models/{olmo,smollm3,arcee,nemotron,
    # glm,gpt_neox,persimmon,falcon}.py lineage)
    from sglang_tpu.models.arcee import ArceeForCausalLM
    from sglang_tpu.models.falcon import FalconForCausalLM
    from sglang_tpu.models.glm import GlmForCausalLM
    from sglang_tpu.models.gpt_neox import GPTNeoXForCausalLM
    from sglang_tpu.models.nemotron import NemotronForCausalLM
    from sglang_tpu.models.olmo import OlmoForCausalLM
    from sglang_tpu.models.persimmon import PersimmonForCausalLM
    from sglang_tpu.models.smollm3 import SmolLM3ForCausalLM

    for cls in (
        ArceeForCausalLM,
        FalconForCausalLM,
        GlmForCausalLM,
        GPTNeoXForCausalLM,
        NemotronForCausalLM,
        OlmoForCausalLM,
        PersimmonForCausalLM,
        SmolLM3ForCausalLM,
    ):
        register_model(cls)

    # breadth batch 5 (reference srt/models/{ernie4,exaone4,glm4_moe,
    # ministral3,olmo2}.py lineage + seed-oss)
    from sglang_tpu.models.exaone4 import Exaone4ForCausalLM
    from sglang_tpu.models.glm4_moe import Glm4MoeForCausalLM
    from sglang_tpu.models.llama import (
        Ernie45ForCausalLM,
        MinistralForCausalLM,
        SeedOssForCausalLM,
    )
    from sglang_tpu.models.olmo3 import Olmo3ForCausalLM

    for cls in (
        Exaone4ForCausalLM,
        Glm4MoeForCausalLM,
        Ernie45ForCausalLM,
        MinistralForCausalLM,
        SeedOssForCausalLM,
        Olmo3ForCausalLM,
    ):
        register_model(cls)

    # breadth batch 7 (reference srt/models/{dbrx,hunyuan,apertus,
    # granitemoehybrid}.py lineage)
    from sglang_tpu.models.falcon_h1 import FalconH1ForCausalLM
    from sglang_tpu.models.lfm2 import Lfm2ForCausalLM

    register_model(Lfm2ForCausalLM)
    from sglang_tpu.models.granite_moe_hybrid import (
        GraniteMoeHybridForCausalLM,
    )

    register_model(FalconH1ForCausalLM)
    register_model(GraniteMoeHybridForCausalLM)
    from sglang_tpu.models.apertus import ApertusForCausalLM
    from sglang_tpu.models.dbrx import DbrxForCausalLM
    from sglang_tpu.models.hunyuan import (
        HunYuanDenseV1ForCausalLM,
        HunYuanMoEV1ForCausalLM,
    )

    for cls in (
        ApertusForCausalLM,
        DbrxForCausalLM,
        HunYuanDenseV1ForCausalLM,
        HunYuanMoEV1ForCausalLM,
    ):
        register_model(cls)

    # breadth batch 6 (reference srt/models/{opt,gptj,granitemoe,phimoe,
    # dots1}.py lineage)
    from sglang_tpu.models.dots1 import Dots1ForCausalLM
    from sglang_tpu.models.gptj import GPTJForCausalLM
    from sglang_tpu.models.granite_moe import (
        GraniteMoeForCausalLM,
        GraniteMoeSharedForCausalLM,
    )
    from sglang_tpu.models.opt import OPTForCausalLM
    from sglang_tpu.models.phimoe import PhimoeForCausalLM

    for cls in (
        Dots1ForCausalLM,
        GPTJForCausalLM,
        GraniteMoeForCausalLM,
        GraniteMoeSharedForCausalLM,
        OPTForCausalLM,
        PhimoeForCausalLM,
    ):
        register_model(cls)

    # breadth batch 4 (reference srt/models/{llama4,internvl,idefics3}.py
    # lineage)
    from sglang_tpu.models.idefics3 import (
        Idefics3ForConditionalGeneration,
        SmolVLMForConditionalGeneration,
    )
    from sglang_tpu.models.internvl import InternVLForConditionalGeneration
    from sglang_tpu.models.llama4 import Llama4ForCausalLM

    from sglang_tpu.models.aya_vision import AyaVisionForConditionalGeneration
    from sglang_tpu.models.glm4v import Glm4vForConditionalGeneration
    from sglang_tpu.models.kimi_vl import KimiVLForConditionalGeneration
    from sglang_tpu.models.qwen3_vl import (
        Qwen3VLForConditionalGeneration,
        Qwen3VLMoeForConditionalGeneration,
    )
    from sglang_tpu.models.minicpmv import MiniCPMVForConditionalGeneration
    from sglang_tpu.models.mistral3 import Mistral3ForConditionalGeneration
    from sglang_tpu.models.phi3 import Phi4MultimodalForCausalLM
    from sglang_tpu.models.qwen2_5_vl import Qwen2_5_VLForConditionalGeneration

    register_model(Qwen2_5_VLForConditionalGeneration)
    register_model(MiniCPMVForConditionalGeneration)
    register_model(Phi4MultimodalForCausalLM)
    register_model(Llama4ForCausalLM)
    register_model(InternVLForConditionalGeneration)
    register_model(Idefics3ForConditionalGeneration)
    register_model(SmolVLMForConditionalGeneration)
    register_model(AyaVisionForConditionalGeneration)
    register_model(Glm4vForConditionalGeneration)
    register_model(KimiVLForConditionalGeneration)
    register_model(Qwen3VLForConditionalGeneration)
    register_model(Qwen3VLMoeForConditionalGeneration)
    register_model(Mistral3ForConditionalGeneration)

    from sglang_tpu.models.bert import BertModel, XLMRobertaModel
    from sglang_tpu.models.classification import (
        Gemma2ForSequenceClassification,
        LlamaForSequenceClassification,
        Qwen2ForRewardModel,
        Qwen2ForSequenceClassification,
        Qwen3ForSequenceClassification,
    )

    register_model(Qwen2ForRewardModel)
    if Gemma2ForSequenceClassification is not None:
        register_model(Gemma2ForSequenceClassification)

    for cls in (
        CohereForCausalLM,
        GemmaForCausalLM,
        GPT2LMHeadModel,
        GPTBigCodeForCausalLM,
        GraniteForCausalLM,
        OlmoeForCausalLM,
        PhiForCausalLM,
        StableLmForCausalLM,
        LlamaForSequenceClassification,
        Qwen2ForSequenceClassification,
        Qwen3ForSequenceClassification,
        BertModel,
        XLMRobertaModel,
    ):
        register_model(cls)


def get_model_class(config: ModelConfig) -> type:
    _populate()
    for arch in config.architectures:
        if arch in _REGISTRY:
            return _REGISTRY[arch]
    # some configs ship without architectures (e.g. Qwen2-VL wrappers
    # saved from code): fall back to model_type
    if config.model_type in _TYPE_REGISTRY:
        return _TYPE_REGISTRY[config.model_type]
    raise ValueError(
        f"no registered model for architectures {config.architectures}; "
        f"known: {sorted(_REGISTRY)}"
    )


def list_architectures():
    _populate()
    return sorted(_REGISTRY)
