"""OTLP/HTTP trace exporter (no external dependencies).

Parity with reference `srt/observability/trace.py:161
process_tracing_init` (OpenTelemetry OTLP request spans). The engine's
span records (`metrics.SpanLog` schema: root "generate" span + timed
events) are converted to the OTLP JSON protocol
(`ExportTraceServiceRequest`, `POST {endpoint}/v1/traces`) and shipped
from a background thread with batching — the scheduler thread only
enqueues. Enabled with `--otlp-traces-endpoint http://collector:4318`;
off by default. Uses urllib (the repo has zero-egress CI; failures are
counted, never raised into the serving path).
"""

from __future__ import annotations

import json
import queue
import threading
import urllib.request
import uuid
from typing import Optional


def _attr(key: str, value) -> dict:
    if isinstance(value, bool):
        v = {"boolValue": value}
    elif isinstance(value, int):
        v = {"intValue": str(value)}
    elif isinstance(value, float):
        v = {"doubleValue": value}
    else:
        v = {"stringValue": str(value)}
    return {"key": key, "value": v}


def span_to_otlp(rec: dict) -> dict:
    """One SpanLog record -> an OTLP JSON span."""
    trace_id = str(rec.get("trace_id", ""))
    trace_hex = (
        trace_id if len(trace_id) == 32 and _is_hex(trace_id)
        else uuid.uuid5(uuid.NAMESPACE_OID, trace_id).hex
    )
    return {
        "traceId": trace_hex,
        "spanId": uuid.uuid4().hex[:16],
        "name": rec.get("name", "generate"),
        "kind": 2,  # SERVER
        "startTimeUnixNano": str(rec.get("start_unix_nano", 0)),
        "endTimeUnixNano": str(rec.get("end_unix_nano", 0)),
        "attributes": [
            _attr(k, v) for k, v in (rec.get("attributes") or {}).items()
        ],
        "events": [
            {
                "name": e["name"],
                "timeUnixNano": str(e["time_unix_nano"]),
            }
            for e in rec.get("events", [])
        ],
        "status": {"code": 1},  # OK
    }


def _is_hex(s: str) -> bool:
    try:
        int(s, 16)
        return True
    except ValueError:
        return False


class OTLPSpanExporter:
    """Batching background exporter. `export(rec)` never blocks the
    caller beyond a bounded queue put; drops (and counts) on overflow or
    collector failure — observability must not stall serving."""

    def __init__(
        self,
        endpoint: str,
        service_name: str = "sglang-tpu",
        flush_interval: float = 2.0,
        max_batch: int = 256,
        max_queue: int = 4096,
    ):
        self.endpoint = endpoint.rstrip("/")
        self.url = (
            self.endpoint
            if self.endpoint.endswith("/v1/traces")
            else self.endpoint + "/v1/traces"
        )
        self.service_name = service_name
        self.flush_interval = flush_interval
        self.max_batch = max_batch
        self.q: "queue.Queue[Optional[dict]]" = queue.Queue(maxsize=max_queue)
        self.dropped = 0
        self.exported = 0
        self.errors = 0
        self._thread = threading.Thread(
            target=self._run, name="otlp-exporter", daemon=True
        )
        self._thread.start()

    def export(self, rec: dict) -> None:
        try:
            self.q.put_nowait(rec)
        except queue.Full:
            self.dropped += 1

    def _run(self) -> None:
        batch = []
        while True:
            try:
                item = self.q.get(timeout=self.flush_interval)
            except queue.Empty:
                item = ...  # timeout sentinel: flush whatever we have
            if item is None:  # shutdown
                self._send(batch)
                return
            if item is not ...:
                batch.append(item)
            if batch and (item is ... or len(batch) >= self.max_batch):
                self._send(batch)
                batch = []

    def _send(self, batch) -> None:
        if not batch:
            return
        payload = {
            "resourceSpans": [
                {
                    "resource": {
                        "attributes": [
                            _attr("service.name", self.service_name)
                        ]
                    },
                    "scopeSpans": [
                        {
                            "scope": {"name": "sglang_tpu"},
                            "spans": [span_to_otlp(r) for r in batch],
                        }
                    ],
                }
            ]
        }
        req = urllib.request.Request(
            self.url,
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=5) as resp:
                if 200 <= resp.status < 300:
                    self.exported += len(batch)
                else:
                    self.errors += 1
        except Exception:
            self.errors += 1

    def close(self, timeout: float = 5.0) -> None:
        try:
            self.q.put_nowait(None)
        except queue.Full:
            pass
        self._thread.join(timeout=timeout)
