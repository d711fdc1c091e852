"""DP router tests (reference data_parallel_controller + sgl-router
behavior): policy unit tests, then a live drive — two real engine servers
behind the router, responses correct, traffic distributed, failover works."""

import json
import os
import socket
import subprocess
import sys
import threading
import time
import urllib.request

import pytest

aiohttp = pytest.importorskip("aiohttp")
torch = pytest.importorskip("torch")

from sglang_tpu.entrypoints.router import Router

# ---------------------------------------------------------------- policy


def test_round_robin_policy():
    r = Router(["http://a", "http://b"], policy="round_robin")
    picks = [r.pick({}).url for _ in range(4)]
    assert picks == ["http://a", "http://b", "http://a", "http://b"]


def test_least_inflight_policy():
    r = Router(["http://a", "http://b"], policy="least_inflight")
    r.workers[0].inflight = 3
    assert r.pick({}).url == "http://b"


def test_cache_aware_policy_sticky_and_spill():
    r = Router(["http://a", "http://b", "http://c"], policy="cache_aware")
    p1 = {"text": "shared prefix " + "x" * 50}
    w = r.pick(p1)
    # same prefix -> same worker, every time
    assert all(r.pick(p1).url == w.url for _ in range(5))
    # different prefixes spread across the fleet
    urls = {r.pick({"text": f"prompt {i}"}).url for i in range(30)}
    assert len(urls) > 1
    # saturated preferred worker spills to least-inflight
    w.inflight = 100
    assert r.pick(p1).url != w.url


def test_worker_management():
    r = Router(["http://a"])
    assert r.add_worker("http://b")
    assert not r.add_worker("http://b")  # duplicate
    assert r.remove_worker("http://a")
    assert not r.remove_worker("http://missing")
    assert [w.url for w in r.workers] == ["http://b"]


# ------------------------------------------------------------- live drive


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _post(url, payload, timeout=60):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def fleet(tmp_path_factory):
    """Two tiny engine servers + a router subprocess in front."""
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("router_model")
    cfg = LlamaConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).eval().save_pretrained(path)

    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", HF_HUB_OFFLINE="1", TRANSFORMERS_OFFLINE="1")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs, urls = [], []
    for _ in range(2):
        port = _free_port()
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "sglang_tpu.launch_server",
             "--model-path", str(path), "--host", "127.0.0.1",
             "--port", str(port), "--device", "cpu", "--page-size", "16",
             "--max-total-tokens", "2048", "--context-length", "256",
             "--decode-bs-buckets", "4", "--prefill-token-buckets", "64",
             "--max-running-requests", "4", "--random-seed", "0",
             "--skip-tokenizer-init", "--log-level", "warning"],
            env=env, cwd=cwd,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
        urls.append(f"http://127.0.0.1:{port}")
    rport = _free_port()
    router_proc = subprocess.Popen(
        [sys.executable, "-m", "sglang_tpu.entrypoints.router",
         "--host", "127.0.0.1", "--port", str(rport),
         "--worker-urls", *urls],
        env=env, cwd=cwd,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    deadline = time.time() + 120
    ready = set()
    while time.time() < deadline and len(ready) < 3:
        for i, (p, u) in enumerate(zip(procs + [router_proc], urls + [f"http://127.0.0.1:{rport}"])):
            if p.poll() is not None:
                raise RuntimeError(
                    f"proc {i} died:\n{p.stdout.read().decode()[-2000:]}"
                )
            if u in ready:
                continue
            try:
                urllib.request.urlopen(u + "/health", timeout=1)
                ready.add(u)
            except Exception:
                pass
        time.sleep(0.3)
    if len(ready) < 3:
        for p in procs + [router_proc]:
            p.kill()
        raise TimeoutError("fleet did not become healthy")
    yield f"http://127.0.0.1:{rport}", urls
    for p in procs + [router_proc]:
        p.terminate()
    for p in procs + [router_proc]:
        try:
            p.wait(timeout=10)
        except subprocess.TimeoutExpired:
            p.kill()


def test_router_generate_and_distribution(fleet):
    router_url, _ = fleet
    outs = []
    for i in range(8):
        outs.append(_post(router_url + "/generate", {
            "input_ids": [3 + i, 7, 11, 20 + i],
            "sampling_params": {"max_new_tokens": 4, "temperature": 0.0,
                                "ignore_eos": True},
        }))
    assert all(o["meta_info"]["completion_tokens"] == 4 for o in outs)
    # same request through the router == direct worker (no mutation)
    direct = _post(fleet[1][0] + "/generate", {
        "input_ids": [3, 7, 11, 20],
        "sampling_params": {"max_new_tokens": 4, "temperature": 0.0,
                            "ignore_eos": True},
    })
    assert outs[0]["output_ids"] == direct["output_ids"]
    workers = json.loads(
        urllib.request.urlopen(router_url + "/list_workers").read()
    )["workers"]
    assert sum(w["total_requests"] for w in workers) >= 8
    # cache-aware with distinct prefixes should have touched both workers
    assert all(w["healthy"] for w in workers)


def test_router_sticky_prefix(fleet):
    router_url, _ = fleet
    payload = {
        "input_ids": [9, 9, 9, 9, 9, 9, 9, 9],
        "sampling_params": {"max_new_tokens": 2, "temperature": 0.0,
                            "ignore_eos": True},
    }
    before = {
        w["url"]: w["total_requests"]
        for w in json.loads(
            urllib.request.urlopen(router_url + "/list_workers").read()
        )["workers"]
    }
    for _ in range(4):
        _post(router_url + "/generate", payload)
    after = json.loads(
        urllib.request.urlopen(router_url + "/list_workers").read()
    )["workers"]
    deltas = [w["total_requests"] - before[w["url"]] for w in after]
    assert sorted(deltas) == [0, 4]  # all 4 landed on ONE worker


def test_router_failover_and_worker_mgmt(fleet):
    router_url, worker_urls = fleet
    # register a dead worker; traffic must still succeed via failover
    assert _post(router_url + "/add_worker", {"url": "http://127.0.0.1:1"})["success"]
    try:
        for i in range(6):
            out = _post(router_url + "/generate", {
                "input_ids": [40 + i, 41, 42],
                "sampling_params": {"max_new_tokens": 2, "temperature": 0.0,
                                    "ignore_eos": True},
            })
            assert out["meta_info"]["completion_tokens"] == 2
    finally:
        assert _post(router_url + "/remove_worker",
                     {"url": "http://127.0.0.1:1"})["success"]
    info = json.loads(urllib.request.urlopen(router_url + "/get_server_info").read())
    assert info["max_total_tokens"] > 0


def test_exact_cache_aware_via_kv_events():
    """With KV-event mirrors wired, the router routes a prompt to the
    worker whose radix tree ACTUALLY holds its prefix (unit-level: feed
    the mirrors directly)."""
    from sglang_tpu.mem_cache.kv_events import KVEventMirror, KVEventPublisher

    r = Router(["http://a", "http://b"], policy="cache_aware")
    pubs = {}
    for url in ("http://a", "http://b"):
        pub = KVEventPublisher()
        r.mirrors[url] = KVEventMirror(pub)
        pubs[url] = pub
    r.page_size = 4
    prompt = list(range(40, 52))  # 3 pages
    # worker B holds the prefix
    pubs["http://b"].block_stored(prompt, [7, 8, 9], page_size=4)
    assert r.pick({"input_ids": prompt}).url == "http://b"
    # unknown prefix -> least inflight
    r.workers[1].inflight = 5
    assert r.pick({"input_ids": [1, 2, 3, 4, 5, 6, 7, 8]}).url == "http://a"
    # eviction on B flips routing (no stale stickiness)
    pubs["http://b"].block_removed([7, 8, 9])
    r.workers[1].inflight = 0
    pubs["http://a"].block_stored(prompt[:8], [3, 4], page_size=4)
    assert r.pick({"input_ids": prompt}).url == "http://a"


def test_kv_events_over_zmq_to_router():
    """End-to-end transport: a worker-side publisher bound to a ZMQ socket
    feeds the router's mirror across the wire."""
    import time as _time

    zmq = pytest.importorskip("zmq")
    from sglang_tpu.mem_cache.kv_events import KVEventPublisher

    port = _free_port()
    pub = KVEventPublisher(f"tcp://127.0.0.1:{port}")
    r = Router(
        ["http://w"], policy="cache_aware",
        kv_event_addrs={"http://w": f"tcp://127.0.0.1:{port}"},
        page_size=4,
    )
    _time.sleep(0.4)  # SUB connect (slow joiner)
    prompt = list(range(16))
    deadline = _time.time() + 5
    while _time.time() < deadline:
        pub.block_stored(prompt, [1, 2, 3, 4], page_size=4)
        if r.mirrors["http://w"].match_prefix_pages(prompt, 4) == 4:
            break
        _time.sleep(0.2)
    assert r.mirrors["http://w"].match_prefix_pages(prompt, 4) == 4


def test_token_bucket_rate_limit():
    from sglang_tpu.entrypoints.router import TokenBucket

    tb = TokenBucket(rate=10.0, burst=3)
    assert [tb.allow() for _ in range(4)] == [True, True, True, False]
    time.sleep(0.25)  # ~2.5 tokens refill
    assert tb.allow() and tb.allow()
    assert not tb.allow()


def test_circuit_breaker_state_machine():
    from sglang_tpu.entrypoints.router import CircuitBreaker

    cb = CircuitBreaker(threshold=2, cooldown=0.1)
    assert cb.allow()
    cb.record(False)
    assert cb.state == "closed" and cb.allow()
    cb.record(False)
    assert cb.state == "open" and not cb.allow()  # fast-fail
    time.sleep(0.12)
    assert cb.allow()  # half-open probe admitted
    assert not cb.allow()  # only one probe
    cb.record(False)  # probe failed -> re-open
    assert cb.state == "open"
    time.sleep(0.12)
    assert cb.allow()
    cb.record(True)  # probe succeeded -> closed
    assert cb.state == "closed" and cb.allow()


def test_router_rate_limited_returns_429(fleet):
    urls, base = fleet
    import subprocess, sys, os

    port = _free_port()
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "sglang_tpu.entrypoints.router",
            "--host", "127.0.0.1", "--port", str(port),
            "--worker-urls", *urls,
            "--max-rps", "0.05", "--burst", "1",
        ],
        env=dict(os.environ),
    )
    try:
        rurl = f"http://127.0.0.1:{port}"
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                _post(rurl + "/generate", {"input_ids": [5, 6], "sampling_params": {"max_new_tokens": 1, "ignore_eos": True}})
                break
            except Exception:
                time.sleep(0.5)
        # burst exhausted by the probe above: immediate 2nd call is limited
        import urllib.request, urllib.error, json as _json

        req = urllib.request.Request(
            rurl + "/generate",
            data=_json.dumps({"input_ids": [5], "sampling_params": {"max_new_tokens": 1}}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=10)
            status = 200
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 429
    finally:
        proc.terminate()
        proc.wait(timeout=10)
