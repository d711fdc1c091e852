"""Observability depth: TTFT/ITL/e2e histograms, per-stage time stats at
/metrics, and the OTLP-shaped per-request span log (reference
`observability/metrics_collector.py:186`, `observability/trace.py:161`)."""

import json

import numpy as np
import pytest

from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
from sglang_tpu.managers.scheduler import Scheduler
from sglang_tpu.observability.metrics import Histogram
from sglang_tpu.sampling.sampling_params import SamplingParams
from tests.test_utils import tiny_runner, tiny_server_args


def test_histogram_buckets_and_prometheus():
    h = Histogram("x_seconds", [0.1, 1.0, 10.0])
    for v in (0.05, 0.5, 0.5, 5.0, 50.0):
        h.observe(v)
    lines = h.prometheus_lines()
    assert 'x_seconds_bucket{le="0.1"} 1' in lines
    assert 'x_seconds_bucket{le="1.0"} 3' in lines
    assert 'x_seconds_bucket{le="10.0"} 4' in lines
    assert 'x_seconds_bucket{le="+Inf"} 5' in lines
    assert "x_seconds_count 5" in lines
    assert h.percentile(0.5) == 1.0


def _run(sa, runner, prompts, max_new=8):
    sched = Scheduler(sa, runner)
    for i, ids in enumerate(prompts):
        sched.add_request(
            TokenizedGenerateReqInput(
                rid=f"r{i}",
                input_ids=list(ids),
                sampling_params=SamplingParams(
                    max_new_tokens=max_new, ignore_eos=True, temperature=0.0
                ),
            )
        )
    while sched.has_work():
        for _ in sched.step():
            pass
    return sched


def test_request_metrics_recorded(tmp_path):
    span_path = str(tmp_path / "spans.jsonl")
    sa = tiny_server_args(request_span_log=span_path)
    sched = _run(sa, tiny_runner(sa), [[5, 6, 7]] * 3, max_new=6)
    m = sched.metrics
    assert m.ttft.total == 3
    assert m.e2e.total == 3
    assert m.itl.total >= 3  # 5 further tokens per request, chunk-resolved
    # spans: one JSONL record per request with ordered events
    recs = [json.loads(l) for l in open(span_path)]
    assert len(recs) == 3
    r = recs[0]
    assert r["name"] == "generate"
    assert r["attributes"]["completion_tokens"] == 6
    names = [e["name"] for e in r["events"]]
    assert "arrival" in names and "finish" in names and "first_token" in names
    times = [e["time_unix_nano"] for e in r["events"]]
    assert times == sorted(times)


def test_prometheus_export_after_serving():
    sa = tiny_server_args()
    sched = _run(sa, tiny_runner(sa), [[3, 4, 5], [7, 8]], max_new=4)
    text = "\n".join(sched.metrics.prometheus_lines())
    assert "sglang_tpu_ttft_seconds_bucket" in text
    assert "sglang_tpu_e2e_seconds_count 2" in text
    assert "sglang_tpu_itl_seconds_sum" in text
    # per-stage wall time accumulated (exported at /metrics by the server)
    assert sum(sched.stats.stage_time.values()) > 0
    # reconstruct a bench_serving-style median TTFT from the histogram
    assert sched.metrics.ttft.percentile(0.5) > 0


def test_crash_dump_captures_state(tmp_path):
    """Engine-fatal error during a scheduler step writes a postmortem JSON
    (reference srt/state_capturer/): live request views, pool occupancy,
    counters, traceback."""
    import json

    from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
    from sglang_tpu.managers.scheduler import Scheduler
    from sglang_tpu.observability.state_capturer import (
        capture_state,
        write_crash_dump,
    )
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from tests.test_utils import tiny_runner, tiny_server_args

    sa = tiny_server_args(crash_dump_dir=str(tmp_path))
    sched = Scheduler(sa, tiny_runner(sa))
    sched.add_request(
        TokenizedGenerateReqInput(
            rid="c0", input_ids=[3, 4, 5, 6],
            sampling_params=SamplingParams(max_new_tokens=4, ignore_eos=True),
        )
    )
    sched.step()  # prefill -> running
    st = capture_state(sched)
    assert st["running"] or st["waiting"]
    try:
        raise RuntimeError("injected failure")
    except RuntimeError as e:
        path = write_crash_dump(sched, e, str(tmp_path))
    assert path is not None
    dump = json.load(open(path))
    assert dump["exception"]["type"] == "RuntimeError"
    assert "injected failure" in dump["exception"]["message"]
    assert dump["allocator"]["total_pages"] > 0
    assert any("traceback" in k or k == "traceback" for k in dump["exception"])
    # disabled dir -> no dump, no masking
    assert write_crash_dump(sched, RuntimeError("x"), None) is None


def test_otlp_exporter_ships_spans(tmp_path):
    """Real OTLP/HTTP export: spans arrive at a local collector as an
    ExportTraceServiceRequest JSON payload (reference
    `observability/trace.py process_tracing_init` role)."""
    import http.server
    import threading

    received = []

    class Collector(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            received.append((self.path, json.loads(body)))
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"{}")

        def log_message(self, *a):
            pass

    httpd = http.server.HTTPServer(("127.0.0.1", 0), Collector)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
        from sglang_tpu.managers.scheduler import Scheduler
        from sglang_tpu.sampling.sampling_params import SamplingParams
        from tests.test_utils import tiny_runner, tiny_server_args

        sa = tiny_server_args(
            otlp_traces_endpoint=f"http://127.0.0.1:{port}"
        )
        sched = Scheduler(sa, tiny_runner(sa))
        sched.add_request(
            TokenizedGenerateReqInput(
                rid="otlp0", input_ids=[3, 4, 5, 6],
                sampling_params=SamplingParams(
                    max_new_tokens=4, ignore_eos=True
                ),
            )
        )
        while sched.has_work():
            sched.step()
        sched.span_log.close()  # flush + join the exporter thread
        assert received, "collector never received an OTLP export"
        path, payload = received[0]
        assert path == "/v1/traces"
        spans = payload["resourceSpans"][0]["scopeSpans"][0]["spans"]
        assert spans and spans[0]["name"] == "generate"
        assert len(spans[0]["traceId"]) == 32
        names = {e["name"] for e in spans[0]["events"]}
        assert "arrival" in names and "finish" in names
        res_attrs = payload["resourceSpans"][0]["resource"]["attributes"]
        assert any(a["key"] == "service.name" for a in res_attrs)
    finally:
        httpd.shutdown()
