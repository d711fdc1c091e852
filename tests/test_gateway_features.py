"""Gateway-depth features: conversation storage (+ journal persistence),
MCP client (stdio + streamable HTTP), the Responses MCP tool loop, and
k8s service discovery (reference sgl-model-gateway: routers/conversations,
mcp_utils.rs, service_discovery.rs)."""

import asyncio
import json
import os
import sys

import pytest

aiohttp = pytest.importorskip("aiohttp")

from sglang_tpu.entrypoints.conversations import (
    ConversationStorage,
    ResponseStore,
    normalize_item,
    validate_metadata,
)

MCP_SERVER_CMD = (
    f"{sys.executable} {os.path.join(os.path.dirname(__file__), 'mcp_echo_server.py')}"
)


# ------------------------------------------------------- conversations


def test_conversation_crud_and_items():
    s = ConversationStorage()
    conv = s.create({"topic": "tpu"})
    assert conv["object"] == "conversation" and conv["metadata"] == {"topic": "tpu"}
    cid = conv["id"]

    items = []
    for role, text in [("user", "hello"), ("assistant", "hi there")]:
        it, err = normalize_item({"role": role, "content": text})
        assert err is None
        items.append(it)
    s.add_items(cid, items)

    lst = s.list_items(cid)
    assert [i["role"] for i in lst["data"]] == ["user", "assistant"]
    assert lst["first_id"] == items[0]["id"] and not lst["has_more"]
    # pagination: after first item, limit 1
    page = s.list_items(cid, limit=1, after=items[0]["id"])
    assert [i["id"] for i in page["data"]] == [items[1]["id"]]
    # desc order
    assert s.list_items(cid, order="desc")["data"][0]["id"] == items[1]["id"]

    assert s.get_item(cid, items[0]["id"])["role"] == "user"
    conv2 = s.delete_item(cid, items[0]["id"])
    assert conv2["id"] == cid
    assert len(s.list_items(cid)["data"]) == 1

    # metadata patch: add one key, delete another
    s.update_metadata(cid, {"topic": None, "lang": "en"})
    assert s.get(cid)["metadata"] == {"lang": "en"}

    assert s.delete(cid) and s.get(cid) is None
    assert s.list_items(cid) is None


def test_metadata_validation():
    assert validate_metadata(None) == (None, None)
    _, err = validate_metadata({"k": 1})
    assert err
    _, err = validate_metadata({f"k{i}": "v" for i in range(17)})
    assert err
    md, err = validate_metadata({"a": "b"})
    assert err is None and md == {"a": "b"}
    it, err = normalize_item({"role": "czar", "content": "x"})
    assert err and it is None


def test_conversation_journal_replay(tmp_path):
    j = str(tmp_path / "convs.jsonl")
    s = ConversationStorage(j)
    conv = s.create({"a": "b"})
    it, _ = normalize_item({"role": "user", "content": "persist me"})
    s.add_items(conv["id"], [it])
    gone = s.create(None)
    s.delete(gone["id"])

    s2 = ConversationStorage(j)  # replay
    assert s2.get(conv["id"])["metadata"] == {"a": "b"}
    assert [i["id"] for i in s2.list_items(conv["id"])["data"]] == [it["id"]]
    assert s2.get(gone["id"]) is None


def test_messages_for_context_role_mapping():
    s = ConversationStorage()
    cid = s.create(None)["id"]
    its = []
    for raw in [
        {"role": "developer", "content": "sys text"},
        {"role": "user", "content": [{"type": "input_text", "text": "q"}]},
        {"role": "assistant", "content": "a"},
    ]:
        it, err = normalize_item(raw)
        assert err is None
        its.append(it)
    s.add_items(cid, its)
    msgs = s.messages_for_context(cid)
    assert msgs == [
        {"role": "system", "content": "sys text"},
        {"role": "user", "content": "q"},
        {"role": "assistant", "content": "a"},
    ]


def test_response_store_lru():
    rs = ResponseStore(capacity=2)
    for i in range(3):
        rs.put(f"r{i}", {"id": f"r{i}"}, [])
    assert rs.get("r0") is None  # evicted
    assert rs.get("r2")["response"]["id"] == "r2"


# ----------------------------------------------------------- MCP client


def test_mcp_stdio_client_roundtrip():
    from sglang_tpu.mcp.client import StdioMcpClient, tool_result_text

    async def run():
        c = StdioMcpClient(MCP_SERVER_CMD)
        await c.start()
        init = await c.initialize()
        assert init["serverInfo"]["name"] == "echo"
        tools = await c.list_tools()
        assert [t["name"] for t in tools] == ["add"]
        res = await c.call_tool("add", {"a": 3, "b": 4})
        assert tool_result_text(res) == "7"
        await c.close()

    asyncio.run(run())


def test_mcp_http_client_roundtrip():
    from aiohttp import web
    from aiohttp.test_utils import TestServer

    from sglang_tpu.mcp.client import HttpMcpClient, tool_result_text

    seen_sessions = []

    async def handler(request):
        seen_sessions.append(request.headers.get("Mcp-Session-Id"))
        msg = await request.json()
        method = msg.get("method")
        if "id" not in msg:
            return web.Response(status=202)
        if method == "initialize":
            result = {
                "protocolVersion": "2025-03-26",
                "serverInfo": {"name": "http-echo", "version": "1"},
            }
        elif method == "tools/list":
            result = {"tools": [{"name": "upper", "inputSchema": {}}]}
        else:  # tools/call
            args = msg["params"]["arguments"]
            result = {
                "content": [{"type": "text", "text": args["s"].upper()}]
            }
        return web.json_response(
            {"jsonrpc": "2.0", "id": msg["id"], "result": result},
            headers={"Mcp-Session-Id": "sess-1"},
        )

    async def run():
        app = web.Application()
        app.router.add_post("/mcp", handler)
        server = TestServer(app)
        await server.start_server()
        c = HttpMcpClient(str(server.make_url("/mcp")))
        await c.start()
        await c.initialize()
        tools = await c.list_tools()
        assert [t["name"] for t in tools] == ["upper"]
        res = await c.call_tool("upper", {"s": "abc"})
        assert tool_result_text(res) == "ABC"
        await c.close()
        await server.close()
        # session id from the first response echoed on later calls
        assert seen_sessions[0] is None and "sess-1" in seen_sessions[1:]

    asyncio.run(run())


def test_mcp_loop_executes_tool_calls():
    """Scripted model: first generation emits a hermes tool call, second
    emits the final answer; the loop must execute `add` via the stdio
    server and feed the result back."""
    from sglang_tpu.mcp.loop import run_mcp_loop

    outputs = [
        '<tool_call>{"name": "add", "arguments": {"a": 20, "b": 22}}</tool_call>',
        "the answer is 42",
    ]
    seen_messages = []

    async def gen(msgs):
        seen_messages.append(list(msgs))
        return outputs[len(seen_messages) - 1]

    async def run():
        return await run_mcp_loop(
            gen,
            [{"role": "user", "content": "add 20 and 22"}],
            [{"type": "mcp", "server_label": "calc", "command": MCP_SERVER_CMD}],
            tool_format="hermes",
        )

    text, items, msgs = asyncio.run(run())
    assert text == "the answer is 42"
    kinds = [i["type"] for i in items]
    assert kinds == ["mcp_list_tools", "mcp_call"]
    call = items[1]
    assert call["server_label"] == "calc" and call["name"] == "add"
    assert call["output"] == "42" and call["error"] is None
    # second generation saw the tool response
    assert any("<tool_response>42</tool_response>" in m["content"]
               for m in seen_messages[1])
    # the system message advertised the tool
    assert "add" in seen_messages[0][0]["content"]


def test_mcp_loop_unknown_tool_is_error():
    from sglang_tpu.mcp.loop import run_mcp_loop

    outputs = [
        '<tool_call>{"name": "add", "arguments": {"a": 1, "b": 2}}</tool_call>'
        '<tool_call>{"name": "nope", "arguments": {}}</tool_call>',
        "done",
    ]
    n = [0]

    async def gen(msgs):
        n[0] += 1
        return outputs[n[0] - 1]

    async def run():
        return await run_mcp_loop(
            gen,
            [{"role": "user", "content": "go"}],
            [{"type": "mcp", "server_label": "calc", "command": MCP_SERVER_CMD}],
        )

    text, items, _ = asyncio.run(run())
    calls = [i for i in items if i["type"] == "mcp_call"]
    # the unknown tool is filtered by the parser's allow-list (only
    # advertised tools survive), so exactly one call executed
    assert len(calls) == 1 and calls[0]["output"] == "3"
    assert text == "done"


# ---------------------------------------------------- service discovery


def _pod(name, ip, ready=True, annotations=None):
    return {
        "metadata": {
            "name": name,
            "labels": {"app": "sglang"},
            "annotations": annotations or {},
        },
        "status": {
            "phase": "Running",
            "podIP": ip,
            "conditions": [
                {"type": "Ready", "status": "True" if ready else "False"}
            ],
        },
    }


def test_service_discovery_sync_add_remove():
    from aiohttp import web
    from aiohttp.test_utils import TestServer

    from sglang_tpu.entrypoints.router import Router
    from sglang_tpu.entrypoints.service_discovery import (
        ServiceDiscovery,
        ServiceDiscoveryConfig,
    )

    pods = [_pod("w0", "10.0.0.1"), _pod("w1", "10.0.0.2"),
            _pod("w2", "10.0.0.3", ready=False)]
    seen_selectors = []

    async def list_pods(request):
        seen_selectors.append(request.rel_url.query.get("labelSelector"))
        return web.json_response({"items": pods})

    async def run():
        app = web.Application()
        app.router.add_get(
            "/api/v1/namespaces/prod/pods", list_pods
        )
        server = TestServer(app)
        await server.start_server()
        router = Router([], policy="round_robin")
        sd = ServiceDiscovery(
            router,
            ServiceDiscoveryConfig(
                selector="app=sglang",
                namespace="prod",
                port=8080,
                api_base=str(server.make_url("")).rstrip("/"),
                token="tok",
            ),
        )
        async with aiohttp.ClientSession() as session:
            await sd.poll_once(session)
            urls = sorted(w.url for w in router.workers)
            assert urls == ["http://10.0.0.1:8080", "http://10.0.0.2:8080"]
            # w1 disappears, w3 appears
            del pods[1]
            pods.append(_pod("w3", "10.0.0.4"))
            await sd.poll_once(session)
            urls = sorted(w.url for w in router.workers)
            assert urls == ["http://10.0.0.1:8080", "http://10.0.0.4:8080"]
        await server.close()
        assert all(s == "app=sglang" for s in seen_selectors)

    asyncio.run(run())


def test_service_discovery_pd_mode_bootstrap_annotation():
    from aiohttp import web
    from aiohttp.test_utils import TestServer

    from sglang_tpu.entrypoints.router import Router
    from sglang_tpu.entrypoints.service_discovery import (
        ServiceDiscovery,
        ServiceDiscoveryConfig,
    )

    async def list_pods(request):
        sel = request.rel_url.query.get("labelSelector")
        if "prefill" in sel:
            return web.json_response(
                {
                    "items": [
                        _pod(
                            "p0",
                            "10.1.0.1",
                            annotations={"sglang.ai/bootstrap-port": "9100"},
                        )
                    ]
                }
            )
        return web.json_response({"items": [_pod("d0", "10.1.0.2")]})

    async def run():
        app = web.Application()
        app.router.add_get("/api/v1/pods", list_pods)
        server = TestServer(app)
        await server.start_server()
        router = Router([], policy="round_robin")
        sd = ServiceDiscovery(
            router,
            ServiceDiscoveryConfig(
                prefill_selector="role=prefill",
                decode_selector="role=decode",
                port=8000,
                api_base=str(server.make_url("")).rstrip("/"),
                token="tok",
            ),
        )
        async with aiohttp.ClientSession() as session:
            await sd.poll_once(session)
        await server.close()
        by_type = {p.pod_type: p for p in sd.pods.values()}
        assert by_type["prefill"].bootstrap_port == 9100
        assert by_type["decode"].bootstrap_port is None
        assert len(router.workers) == 2

    asyncio.run(run())
