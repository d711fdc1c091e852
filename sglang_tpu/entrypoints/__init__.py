from sglang_tpu.entrypoints.engine import Engine

__all__ = ["Engine"]
