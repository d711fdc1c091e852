from sglang_tpu.multimodal.processors import (  # noqa: F401
    BaseMMProcessor,
    MMResult,
    get_mm_processor,
    register_mm_processor,
)
