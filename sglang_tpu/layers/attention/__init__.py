from sglang_tpu.layers.attention.base import AttentionBackend, write_kv_pages
from sglang_tpu.layers.attention.reference_backend import ReferenceAttentionBackend


def create_attention_backend(name: str, on_tpu: bool):
    """Backend registry (reference `layers/attention/attention_registry.py:20`)."""
    if name == "auto":
        name = "pallas" if on_tpu else "reference"
    if name == "reference":
        return ReferenceAttentionBackend()
    if name == "pallas":
        try:
            from sglang_tpu.layers.attention.pallas_backend import (
                PallasAttentionBackend,
            )

            return PallasAttentionBackend()
        except ImportError:
            import logging

            logging.getLogger(__name__).warning(
                "pallas backend unavailable; falling back to reference"
            )
            return ReferenceAttentionBackend()
    raise ValueError(f"unknown attention backend: {name}")


__all__ = [
    "AttentionBackend",
    "ReferenceAttentionBackend",
    "create_attention_backend",
    "write_kv_pages",
]
