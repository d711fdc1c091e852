"""Request-latency metrics + per-request span log.

Parity with reference `srt/observability/metrics_collector.py:186`
(TTFT/ITL/e2e histograms, per-stage time stats) and
`srt/observability/trace.py:161` (OTLP request spans — here a structured
JSONL span log; an OTLP exporter can tail it, which keeps the engine free
of collector dependencies).
"""

from __future__ import annotations

import json
import threading
import time
from typing import List, Optional

# Prometheus-style bucket boundaries (seconds)
TTFT_BUCKETS = [
    0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0, 30.0, 60.0,
]
ITL_BUCKETS = [
    0.002, 0.005, 0.01, 0.02, 0.04, 0.06, 0.1, 0.2, 0.5, 1.0, 2.0,
]
E2E_BUCKETS = [0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0, 30.0, 60.0, 120.0, 300.0]


class Histogram:
    """Cumulative-bucket histogram matching the Prometheus text format."""

    def __init__(self, name: str, buckets: List[float], help_: str = ""):
        self.name = name
        self.help = help_
        self.buckets = list(buckets)
        self.counts = [0] * (len(buckets) + 1)  # +Inf bucket
        self.sum = 0.0
        self.total = 0

    def observe(self, v: float) -> None:
        self.sum += v
        self.total += 1
        for i, b in enumerate(self.buckets):
            if v <= b:
                self.counts[i] += 1
                return
        self.counts[-1] += 1

    def percentile(self, q: float) -> float:
        """Approximate quantile from bucket boundaries (upper edge)."""
        if self.total == 0:
            return 0.0
        target = q * self.total
        acc = 0
        for i, b in enumerate(self.buckets):
            acc += self.counts[i]
            if acc >= target:
                return b
        return float("inf")

    def prometheus_lines(self) -> List[str]:
        lines = [f"# TYPE {self.name} histogram"]
        acc = 0
        for i, b in enumerate(self.buckets):
            acc += self.counts[i]
            lines.append(f'{self.name}_bucket{{le="{b}"}} {acc}')
        acc += self.counts[-1]
        lines.append(f'{self.name}_bucket{{le="+Inf"}} {acc}')
        lines.append(f"{self.name}_sum {self.sum:.6f}")
        lines.append(f"{self.name}_count {self.total}")
        return lines


class RequestMetrics:
    """TTFT / inter-token / e2e / queue-time histograms.

    Note: with multi-step decode, tokens resolve in chunks of K, so ITL is
    observed at resolution granularity (the streaming client sees the same
    cadence)."""

    def __init__(self):
        self.ttft = Histogram(
            "sglang_tpu_ttft_seconds", TTFT_BUCKETS, "time to first token"
        )
        self.itl = Histogram(
            "sglang_tpu_itl_seconds", ITL_BUCKETS, "inter-token latency"
        )
        self.e2e = Histogram(
            "sglang_tpu_e2e_seconds", E2E_BUCKETS, "request latency"
        )
        self.queue = Histogram(
            "sglang_tpu_queue_seconds", TTFT_BUCKETS, "waiting-queue time"
        )

    def prometheus_lines(self) -> List[str]:
        return (
            self.ttft.prometheus_lines()
            + self.itl.prometheus_lines()
            + self.e2e.prometheus_lines()
            + self.queue.prometheus_lines()
        )


class SpanLog:
    """Per-request span records appended as JSONL (OTLP-shaped: a root
    span with timed events; file-backed so no collector is required)."""

    def __init__(
        self, path: Optional[str], otlp_endpoint: Optional[str] = None
    ):
        self.path = path
        self._lock = threading.Lock()
        self._fh = open(path, "a") if path else None
        self.otlp = None
        if otlp_endpoint:
            from sglang_tpu.observability.otlp import OTLPSpanExporter

            self.otlp = OTLPSpanExporter(otlp_endpoint)

    def emit(self, rid: str, events: dict, attrs: dict) -> None:
        if self._fh is None and self.otlp is None:
            return
        rec = {
            "name": "generate",
            "trace_id": rid,
            "start_unix_nano": int(events.get("arrival", 0) * 1e9),
            "end_unix_nano": int(events.get("finish", 0) * 1e9),
            "events": [
                {"name": k, "time_unix_nano": int(v * 1e9)}
                for k, v in sorted(events.items(), key=lambda kv: kv[1])
            ],
            "attributes": attrs,
        }
        if self._fh is not None:
            with self._lock:
                self._fh.write(json.dumps(rec) + "\n")
                self._fh.flush()
        if self.otlp is not None:
            self.otlp.export(rec)

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        if self.otlp is not None:
            self.otlp.close()
            self.otlp = None


def now() -> float:
    return time.time()
