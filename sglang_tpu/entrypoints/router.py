"""Data-parallel router: one front door over N engine replicas.

Parity with reference `srt/managers/data_parallel_controller.py` (replica
spawn + dispatch) and the sgl-router's cache-aware policy (the rust
router routes same-prefix traffic to the same worker so its radix cache
keeps the prefix hot; Rust is not in this image, so the router is an
aiohttp reverse proxy — the data plane below it is the same).

Policies:
- cache_aware (default): consistent choice by hashed prompt prefix, so
  multi-turn / shared-prefix traffic lands on the worker that already
  holds the KV; falls over to least-inflight when the preferred worker
  is saturated (2x the fleet-average inflight) or unhealthy.
- least_inflight: pick the worker with the fewest in-flight requests.
- round_robin: strict rotation.

Worker management mirrors the reference router API: /add_worker,
/remove_worker, /list_workers, plus /health and pass-through data routes
(/generate, /v1/*, /flush_cache fan-out). Streaming responses (SSE) are
piped through chunk-by-chunk.

`python -m sglang_tpu.entrypoints.router --worker-urls http://h:p ...`
runs the router alone; `launch_dp_servers` spawns dp_size local replica
subprocesses (one TPU process each — on multi-chip hosts each replica
pins its chip via env) and then serves the router in front of them.
"""

from __future__ import annotations

import argparse
import hashlib
import itertools
import json
import os
import subprocess
import sys
import time
from typing import Dict, List, Optional

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

UNHEALTHY_COOLDOWN_S = 5.0


class TokenBucket:
    """Router-level rate limiter (reference sgl-model-gateway
    `src/core/rate_limit`): `rate` requests/s with `burst` headroom; a
    request that finds the bucket empty is rejected with 429."""

    def __init__(self, rate: float, burst: int):
        self.rate = rate
        self.capacity = float(burst)
        self.tokens = float(burst)
        self.t = time.monotonic()

    def allow(self) -> bool:
        now = time.monotonic()
        self.tokens = min(
            self.capacity, self.tokens + (now - self.t) * self.rate
        )
        self.t = now
        if self.tokens >= 1.0:
            self.tokens -= 1.0
            return True
        return False


class CircuitBreaker:
    """Per-worker counted breaker (reference sgl-model-gateway
    `src/core/circuit_breaker`): CLOSED -> OPEN after `threshold`
    consecutive failures; after `cooldown` seconds one HALF-OPEN probe is
    admitted — success closes the breaker, failure re-opens it."""

    def __init__(self, threshold: int = 3, cooldown: float = UNHEALTHY_COOLDOWN_S):
        self.threshold = threshold
        self.cooldown = cooldown
        self.failures = 0
        self.opened_at = 0.0
        self.state = "closed"  # closed | open | half_open

    def allow(self) -> bool:
        if self.state == "closed":
            return True
        if self.state == "open":
            if time.monotonic() - self.opened_at >= self.cooldown:
                self.state = "half_open"
                return True  # single probe
            return False
        return False  # half_open: probe already in flight

    def record(self, ok: bool) -> None:
        if ok:
            self.failures = 0
            self.state = "closed"
            return
        self.failures += 1
        if self.state == "half_open" or self.failures >= self.threshold:
            self.state = "open"
            self.opened_at = time.monotonic()
PROXY_ROUTES = [
    "/generate",
    "/v1/completions",
    "/v1/chat/completions",
    "/v1/embeddings",
    "/v1/score",
    "/v1/messages",
    "/api/generate",
    "/api/chat",
]
FANOUT_ROUTES = ["/flush_cache"]


class Worker:
    def __init__(self, url: str):
        self.url = url.rstrip("/")
        self.inflight = 0
        self.total = 0
        self.breaker = CircuitBreaker()

    def healthy(self) -> bool:
        return self.breaker.allow() if self.breaker.state != "closed" else True

    def mark_unhealthy(self):
        self.breaker.record(False)

    def mark_healthy(self):
        self.breaker.record(True)

    def to_json(self) -> Dict:
        return {
            "url": self.url,
            "inflight": self.inflight,
            "total_requests": self.total,
            "healthy": self.breaker.state != "open",
            "breaker": self.breaker.state,
        }


class Router:
    def __init__(
        self,
        worker_urls: List[str],
        policy: str = "cache_aware",
        kv_event_addrs: Optional[Dict[str, str]] = None,
        page_size: int = 64,
        max_rps: float = 0.0,
        burst: int = 0,
        max_retries: int = 0,
    ):
        assert policy in ("cache_aware", "least_inflight", "round_robin"), policy
        self.workers: List[Worker] = [Worker(u) for u in worker_urls]
        self.policy = policy
        self._rr = itertools.count()
        self.page_size = page_size
        # rate limiting (0 = unlimited) and bounded retries (0 = try every
        # worker once, the previous behavior)
        self.limiter = (
            TokenBucket(max_rps, burst or max(1, int(max_rps)))
            if max_rps > 0
            else None
        )
        self.max_retries = max_retries
        # exact prefix tracking: one KVEventMirror per worker fed by its
        # ZMQ kv-event stream (reference rust router's cache-aware mode
        # tracks worker radix contents the same way)
        self.mirrors: Dict[str, object] = {}
        if kv_event_addrs:
            for url, addr in kv_event_addrs.items():
                self._subscribe(url.rstrip("/"), addr)

    def _subscribe(self, worker_url: str, zmq_addr: str) -> None:
        import json as _json
        import threading

        from sglang_tpu.mem_cache.kv_events import (
            KVEventMirror,
            KVEventPublisher,
        )

        pub = KVEventPublisher()  # local re-publisher feeding the mirror
        mirror = KVEventMirror(pub)
        self.mirrors[worker_url] = mirror

        def _pump():
            import time as _time

            import zmq

            ctx = zmq.Context.instance()
            backoff = 0.2
            while worker_url in self.mirrors:
                sock = ctx.socket(zmq.SUB)
                try:
                    sock.connect(zmq_addr)
                    sock.setsockopt_string(zmq.SUBSCRIBE, "")
                    sock.setsockopt(zmq.RCVTIMEO, 5000)
                    backoff = 0.2
                    while worker_url in self.mirrors:
                        try:
                            msg = sock.recv_string()
                        except zmq.Again:
                            continue  # idle worker; keep listening
                        pub._emit(_json.loads(msg))
                except Exception:
                    # connection-level failure: drop mirror state (it is
                    # stale in an unknown way) and reconnect with backoff
                    with mirror._lock:
                        mirror.blocks.clear()
                        mirror.page_to_hash.clear()
                        mirror._next_seq = None
                        mirror.resyncs += 1
                    _time.sleep(backoff)
                    backoff = min(backoff * 2, 5.0)
                finally:
                    sock.close(0)

        threading.Thread(target=_pump, daemon=True).start()

    # ------------------------------------------------------------- choice

    def _prefix_key(self, payload: Dict) -> Optional[bytes]:
        ids = payload.get("input_ids")
        if ids and isinstance(ids[0], list):
            ids = ids[0]
        if ids:
            return json.dumps(ids[:32]).encode()
        text = payload.get("text") or payload.get("prompt")
        if isinstance(text, list):
            text = text[0] if text else None
        if isinstance(text, str):
            return text[:256].encode()
        msgs = payload.get("messages")
        if msgs:
            first = msgs[0]
            return json.dumps(first, sort_keys=True).encode()[:256]
        return None

    def pick(self, payload: Dict) -> Optional[Worker]:
        live = [w for w in self.workers if w.breaker.allow()]
        if not live:
            live = self.workers  # all cooling down: best effort
        if not live:
            return None
        if self.policy == "round_robin":
            return live[next(self._rr) % len(live)]
        least = min(live, key=lambda w: w.inflight)
        if self.policy == "least_inflight":
            return least
        # exact cache-awareness when kv-event mirrors are wired: route to
        # the worker whose radix tree actually holds the longest prefix
        ids = payload.get("input_ids")
        if ids and isinstance(ids[0], list):
            ids = ids[0]
        if self.mirrors and ids:
            scored = [
                (
                    self.mirrors[w.url].match_prefix_pages(ids, self.page_size)
                    if w.url in self.mirrors
                    else 0,
                    -w.inflight,
                    w,
                )
                for w in live
            ]
            best = max(scored, key=lambda t: (t[0], t[1]))
            if best[0] > 0:
                return best[2]
            return least
        key = self._prefix_key(payload)
        if key is None:
            return least
        h = int.from_bytes(hashlib.sha1(key).digest()[:8], "big")
        preferred = live[h % len(live)]
        avg = sum(w.inflight for w in live) / len(live)
        if preferred.inflight > 2 * avg + 4:  # saturated: spill over
            return least
        return preferred

    def add_worker(self, url: str) -> bool:
        url = url.rstrip("/")
        if any(w.url == url for w in self.workers):
            return False
        self.workers.append(Worker(url))
        return True

    def remove_worker(self, url: str) -> bool:
        url = url.rstrip("/")
        n = len(self.workers)
        self.workers = [w for w in self.workers if w.url != url]
        return len(self.workers) < n


def build_router_app(router: Router):
    from aiohttp import ClientSession, ClientTimeout, web

    session: Dict[str, ClientSession] = {}

    async def _sess() -> "ClientSession":
        if "s" not in session:
            session["s"] = ClientSession(timeout=ClientTimeout(total=600))
        return session["s"]

    def _proxy(route: str):
        async def handler(request: web.Request):
            if router.limiter is not None and not router.limiter.allow():
                return web.json_response(
                    {"error": "rate limit exceeded"}, status=429
                )
            try:
                payload = await request.json()
            except Exception:
                payload = {}
            last_err = None
            attempts = router.max_retries or len(router.workers) or 1
            for _ in range(attempts):
                w = router.pick(payload)
                if w is None:
                    return web.json_response(
                        {"error": "no workers registered"}, status=503
                    )
                s = await _sess()
                w.inflight += 1
                w.total += 1
                try:
                    resp = await s.post(w.url + route, json=payload)
                except Exception as e:  # connect failure: fail over
                    w.inflight -= 1
                    w.mark_unhealthy()
                    last_err = e
                    continue
                w.mark_healthy()
                try:
                    ct = resp.headers.get("Content-Type", "")
                    if ct.startswith("text/event-stream"):
                        out = web.StreamResponse(
                            status=resp.status,
                            headers={"Content-Type": "text/event-stream"},
                        )
                        await out.prepare(request)
                        async for chunk in resp.content.iter_any():
                            await out.write(chunk)
                        await out.write_eof()
                        return out
                    body = await resp.read()
                    return web.Response(
                        body=body, status=resp.status, content_type="application/json"
                    )
                finally:
                    w.inflight -= 1
                    resp.release()
            return web.json_response(
                {"error": f"all workers failed: {last_err}"}, status=502
            )

        return handler

    async def health(request):
        live = [w for w in router.workers if w.healthy()]
        status = 200 if live else 503
        return web.json_response(
            {"healthy": bool(live), "workers": len(router.workers)}, status=status
        )

    async def list_workers(request):
        return web.json_response({"workers": [w.to_json() for w in router.workers]})

    async def add_worker(request):
        url = request.query.get("url")
        if not url:
            body = await request.json()
            url = body.get("url")
        ok = router.add_worker(url) if url else False
        return web.json_response({"success": ok}, status=200 if ok else 400)

    async def remove_worker(request):
        url = request.query.get("url")
        if not url:
            body = await request.json()
            url = body.get("url")
        ok = router.remove_worker(url) if url else False
        return web.json_response({"success": ok}, status=200 if ok else 400)

    async def fanout(route: str, request):
        s = await _sess()
        results = {}
        for w in list(router.workers):
            try:
                resp = await s.post(w.url + route, json={})
                results[w.url] = resp.status
                resp.release()
            except Exception as e:
                results[w.url] = str(e)
        return web.json_response({"results": results})

    async def get_first(route: str, request):
        s = await _sess()
        for w in router.workers:
            if not w.healthy():
                continue
            try:
                resp = await s.get(w.url + route)
                body = await resp.read()
                return web.Response(
                    body=body, status=resp.status, content_type="application/json"
                )
            except Exception:
                w.mark_unhealthy()
        return web.json_response({"error": "no healthy workers"}, status=503)

    app = web.Application()
    for route in PROXY_ROUTES:
        app.router.add_post(route, _proxy(route))
    for route in FANOUT_ROUTES:
        app.router.add_post(
            route, lambda req, _r=route: fanout(_r, req)
        )
    app.router.add_get("/health", health)
    app.router.add_get("/list_workers", list_workers)
    app.router.add_post("/add_worker", add_worker)
    app.router.add_get(
        "/v1/models", lambda req: get_first("/v1/models", req)
    )
    app.router.add_get(
        "/get_server_info", lambda req: get_first("/get_server_info", req)
    )
    app.router.add_post("/remove_worker", remove_worker)

    async def _close(app):
        if "s" in session:
            await session["s"].close()

    app.on_cleanup.append(_close)
    return app


# ------------------------------------------------------------- launchers


def launch_dp_servers(server_args, dp_size: int, base_port: int) -> List[subprocess.Popen]:
    """Spawn dp_size replica server subprocesses on consecutive ports.
    Each replica is its own process (its own JAX client); on multi-chip
    hosts set per-replica chip pinning via env before launch."""
    procs = []
    for i in range(dp_size):
        args = [
            sys.executable,
            "-m",
            "sglang_tpu.launch_server",
            "--model-path",
            server_args.model_path,
            "--host",
            server_args.host,
            "--port",
            str(base_port + i),
        ]
        env = dict(os.environ)
        env["SGLANG_TPU_DP_RANK"] = str(i)
        procs.append(subprocess.Popen(args, env=env))
    return procs


def main(argv=None):
    parser = argparse.ArgumentParser(description="sglang_tpu DP router")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=30080)
    parser.add_argument(
        "--worker-urls",
        nargs="+",
        default=[],
        help="static worker URLs (may be empty with --service-discovery)",
    )
    parser.add_argument(
        "--policy",
        default="cache_aware",
        choices=["cache_aware", "least_inflight", "round_robin"],
    )
    parser.add_argument(
        "--kv-events",
        nargs="*",
        default=None,
        help="worker_url=zmq_addr pairs for exact prefix tracking",
    )
    parser.add_argument("--page-size", type=int, default=64)
    parser.add_argument("--max-rps", type=float, default=0.0)
    parser.add_argument("--burst", type=int, default=0)
    parser.add_argument("--max-retries", type=int, default=0)
    # --- kubernetes service discovery (reference sgl-model-gateway
    # service_discovery.rs; see entrypoints/service_discovery.py) ---
    parser.add_argument(
        "--service-discovery",
        action="store_true",
        help="discover workers from k8s pods instead of static URLs",
    )
    parser.add_argument(
        "--selector", default="", help="pod label selector, e.g. app=sglang"
    )
    parser.add_argument("--prefill-selector", default="")
    parser.add_argument("--decode-selector", default="")
    parser.add_argument("--namespace", default=None)
    parser.add_argument("--worker-port", type=int, default=8000)
    parser.add_argument("--discovery-interval", type=float, default=10.0)
    parser.add_argument(
        "--k8s-api-base",
        default=None,
        help="override the in-cluster API endpoint (tests/off-cluster)",
    )
    args = parser.parse_args(argv)
    if not args.worker_urls and not args.service_discovery:
        parser.error("--worker-urls or --service-discovery required")
    from aiohttp import web

    kv_addrs = None
    if args.kv_events:
        kv_addrs = dict(spec.split("=", 1) for spec in args.kv_events)
    router = Router(
        args.worker_urls,
        policy=args.policy,
        kv_event_addrs=kv_addrs,
        page_size=args.page_size,
        max_rps=args.max_rps,
        burst=args.burst,
        max_retries=args.max_retries,
    )
    app = build_router_app(router)
    if args.service_discovery:
        from sglang_tpu.entrypoints.service_discovery import (
            ServiceDiscovery,
            ServiceDiscoveryConfig,
        )

        sd = ServiceDiscovery(
            router,
            ServiceDiscoveryConfig(
                selector=args.selector,
                prefill_selector=args.prefill_selector,
                decode_selector=args.decode_selector,
                namespace=args.namespace,
                port=args.worker_port,
                interval=args.discovery_interval,
                api_base=args.k8s_api_base,
            ),
        )

        async def _start_sd(app):
            sd.start()

        async def _stop_sd(app):
            await sd.stop()

        app.on_startup.append(_start_sd)
        app.on_cleanup.append(_stop_sd)
    logger.info(
        "router on %s:%d over %d workers (%s)",
        args.host,
        args.port,
        len(router.workers),
        args.policy,
    )
    web.run_app(app, host=args.host, port=args.port, print=None)


if __name__ == "__main__":
    main()
