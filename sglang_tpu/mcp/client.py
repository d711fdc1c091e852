"""Minimal MCP (Model Context Protocol) client.

Role parity with reference `sgl-model-gateway/src/routers/mcp_utils.rs`
+ `core/steps/mcp_registration.rs` (the gateway's per-request MCP client
used by the Responses API tool loop). Zero extra dependencies: JSON-RPC
2.0 over either

- stdio: newline-delimited JSON to a subprocess (the MCP stdio
  transport), or
- streamable HTTP: POST per message; JSON or single-event SSE replies,
  `Mcp-Session-Id` header carried across calls.

Supported methods: `initialize` (+ `notifications/initialized`),
`tools/list`, `tools/call`. That is the surface the Responses tool loop
needs (reference McpLoopConfig drives exactly these).
"""

from __future__ import annotations

import asyncio
import json
import shlex
from typing import Any, Dict, List, Optional

PROTOCOL_VERSION = "2025-03-26"
CLIENT_INFO = {"name": "sglang-tpu", "version": "0.1"}
DEFAULT_TIMEOUT = 30.0


class McpError(RuntimeError):
    pass


class _BaseMcpClient:
    def __init__(self):
        self._next_id = 0
        self.server_info: Dict[str, Any] = {}
        self.tools: List[dict] = []

    def _rid(self) -> int:
        self._next_id += 1
        return self._next_id

    async def _request(self, method: str, params: Optional[dict]) -> Any:
        raise NotImplementedError

    async def _notify(self, method: str, params: Optional[dict]) -> None:
        raise NotImplementedError

    async def initialize(self) -> dict:
        result = await self._request(
            "initialize",
            {
                "protocolVersion": PROTOCOL_VERSION,
                "capabilities": {},
                "clientInfo": CLIENT_INFO,
            },
        )
        self.server_info = result.get("serverInfo", {})
        await self._notify("notifications/initialized", None)
        return result

    async def list_tools(self) -> List[dict]:
        result = await self._request("tools/list", {})
        self.tools = result.get("tools", [])
        return self.tools

    async def call_tool(self, name: str, arguments: dict) -> dict:
        """Returns the raw result ({content: [...], isError?}). Use
        `tool_result_text` for the flattened text."""
        return await self._request(
            "tools/call", {"name": name, "arguments": arguments}
        )

    async def close(self) -> None:
        pass


def tool_result_text(result: dict) -> str:
    parts = []
    for c in result.get("content", []):
        if c.get("type") == "text":
            parts.append(c.get("text", ""))
        else:  # image/resource blocks: keep a marker so the model sees it
            parts.append(json.dumps(c))
    return "\n".join(parts)


class StdioMcpClient(_BaseMcpClient):
    """MCP over a subprocess's stdio (newline-delimited JSON-RPC)."""

    def __init__(self, command: str, timeout: float = DEFAULT_TIMEOUT):
        super().__init__()
        self.command = command
        self.timeout = timeout
        self._proc: Optional[asyncio.subprocess.Process] = None
        self._lock = asyncio.Lock()

    async def start(self):
        self._proc = await asyncio.create_subprocess_exec(
            *shlex.split(self.command),
            stdin=asyncio.subprocess.PIPE,
            stdout=asyncio.subprocess.PIPE,
            stderr=asyncio.subprocess.DEVNULL,
        )

    async def _send(self, msg: dict):
        assert self._proc is not None and self._proc.stdin is not None
        self._proc.stdin.write((json.dumps(msg) + "\n").encode())
        await self._proc.stdin.drain()

    async def _recv(self) -> dict:
        assert self._proc is not None and self._proc.stdout is not None
        while True:
            line = await asyncio.wait_for(
                self._proc.stdout.readline(), self.timeout
            )
            if not line:
                raise McpError("MCP server closed its stdout")
            line = line.strip()
            if not line:
                continue
            msg = json.loads(line)
            if "id" in msg:  # response (server->client requests unsupported)
                return msg
            # notification from the server: ignore and keep reading

    async def _request(self, method: str, params: Optional[dict]) -> Any:
        async with self._lock:
            rid = self._rid()
            req = {"jsonrpc": "2.0", "id": rid, "method": method}
            if params is not None:
                req["params"] = params
            await self._send(req)
            resp = await self._recv()
        if resp.get("id") != rid:
            raise McpError(f"out-of-order MCP response: {resp}")
        if "error" in resp:
            raise McpError(str(resp["error"]))
        return resp.get("result", {})

    async def _notify(self, method: str, params: Optional[dict]) -> None:
        msg = {"jsonrpc": "2.0", "method": method}
        if params is not None:
            msg["params"] = params
        await self._send(msg)

    async def close(self) -> None:
        if self._proc is not None:
            if self._proc.stdin is not None:
                self._proc.stdin.close()
            try:
                await asyncio.wait_for(self._proc.wait(), 5.0)
            except asyncio.TimeoutError:
                self._proc.kill()
            self._proc = None


class HttpMcpClient(_BaseMcpClient):
    """MCP streamable-HTTP transport: one POST per JSON-RPC message; the
    reply is application/json or a single-message SSE stream; the
    `Mcp-Session-Id` response header is echoed on subsequent calls."""

    def __init__(
        self,
        url: str,
        headers: Optional[dict] = None,
        timeout: float = DEFAULT_TIMEOUT,
    ):
        super().__init__()
        self.url = url
        self.headers = dict(headers or {})
        self.timeout = timeout
        self.session_id: Optional[str] = None
        self._session = None

    async def start(self):
        import aiohttp

        self._session = aiohttp.ClientSession(
            timeout=aiohttp.ClientTimeout(total=self.timeout)
        )

    async def _post(self, msg: dict, expect_reply: bool):
        assert self._session is not None, "call start() first"
        headers = {
            "Content-Type": "application/json",
            "Accept": "application/json, text/event-stream",
            **self.headers,
        }
        if self.session_id:
            headers["Mcp-Session-Id"] = self.session_id
        async with self._session.post(
            self.url, json=msg, headers=headers
        ) as resp:
            sid = resp.headers.get("Mcp-Session-Id")
            if sid:
                self.session_id = sid
            if resp.status >= 400:
                raise McpError(f"MCP HTTP {resp.status}: {await resp.text()}")
            if not expect_reply or resp.status == 202:
                return None
            ctype = resp.headers.get("Content-Type", "")
            body = await resp.text()
            if "text/event-stream" in ctype:
                for line in body.splitlines():
                    if line.startswith("data:"):
                        return json.loads(line[5:].strip())
                raise McpError("empty SSE reply from MCP server")
            return json.loads(body)

    async def _request(self, method: str, params: Optional[dict]) -> Any:
        req = {"jsonrpc": "2.0", "id": self._rid(), "method": method}
        if params is not None:
            req["params"] = params
        resp = await self._post(req, expect_reply=True)
        if "error" in resp:
            raise McpError(str(resp["error"]))
        return resp.get("result", {})

    async def _notify(self, method: str, params: Optional[dict]) -> None:
        msg = {"jsonrpc": "2.0", "method": method}
        if params is not None:
            msg["params"] = params
        await self._post(msg, expect_reply=False)

    async def close(self) -> None:
        if self._session is not None:
            await self._session.close()
            self._session = None


async def connect_mcp(spec: dict) -> _BaseMcpClient:
    """Build + initialize a client from a Responses-API mcp tool spec:
    {"type": "mcp", "server_url": ...} or {"type": "mcp", "command": ...}
    (reference ensure_request_mcp_client)."""
    if spec.get("command"):
        client: _BaseMcpClient = StdioMcpClient(spec["command"])
    elif spec.get("server_url"):
        client = HttpMcpClient(spec["server_url"], headers=spec.get("headers"))
    else:
        raise McpError("mcp tool needs server_url or command")
    await client.start()
    await client.initialize()
    await client.list_tools()
    return client
