from sglang_tpu.observability.metrics import (  # noqa: F401
    Histogram,
    RequestMetrics,
    SpanLog,
)
