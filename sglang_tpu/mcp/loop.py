"""Responses-API MCP tool loop.

Parity with reference `sgl-model-gateway/src/routers/openai/responses/
mcp.rs` (McpLoopConfig: bounded generate -> parse tool call -> execute
via MCP -> feed result back loop, emitting `mcp_list_tools` and
`mcp_call` output items alongside the final assistant message).

Transport-agnostic: the caller supplies `generate(messages) -> str`
(the engine + chat template) and a tool-call format name for the
function-call detector registry; the loop owns MCP connection
lifecycle per request, like the gateway's per-request client.
"""

from __future__ import annotations

import json
from typing import Awaitable, Callable, Dict, List, Tuple

from sglang_tpu.mcp.client import connect_mcp, tool_result_text
from sglang_tpu.parser.function_call import FunctionCallParser

MAX_TOOL_CALLS_DEFAULT = 10  # reference McpLoopConfig.max_tool_calls


def tools_system_prompt(tools: List[dict]) -> str:
    """Hermes-style tool advertisement (works with the default detector
    even for models whose chat template has no native tools support)."""
    lines = [
        "You have access to the following tools. To call a tool, reply",
        'with <tool_call>{"name": <name>, "arguments": <args-json>}',
        "</tool_call>.",
        "<tools>",
    ]
    for t in tools:
        lines.append(
            json.dumps(
                {
                    "name": t.get("name"),
                    "description": t.get("description", ""),
                    "parameters": t.get("inputSchema", {}),
                }
            )
        )
    lines.append("</tools>")
    return "\n".join(lines)


async def run_mcp_loop(
    generate: Callable[[List[dict]], Awaitable[str]],
    messages: List[dict],
    mcp_specs: List[dict],
    tool_format: str = "hermes",
    max_tool_calls: int = MAX_TOOL_CALLS_DEFAULT,
) -> Tuple[str, List[dict], List[dict]]:
    """Returns (final_text, output_items, messages_after). output_items
    carries mcp_list_tools + mcp_call entries in Responses-API shape."""
    clients: Dict[str, object] = {}
    tool_owner: Dict[str, str] = {}
    all_tools: List[dict] = []
    output_items: List[dict] = []
    try:
        for spec in mcp_specs:
            label = spec.get("server_label") or f"mcp{len(clients)}"
            client = await connect_mcp(spec)
            clients[label] = client
            for t in client.tools:
                tool_owner[t["name"]] = label
                all_tools.append(t)
            output_items.append(
                {
                    "type": "mcp_list_tools",
                    "server_label": label,
                    "tools": [
                        {
                            "name": t.get("name"),
                            "description": t.get("description", ""),
                            "input_schema": t.get("inputSchema", {}),
                        }
                        for t in client.tools
                    ],
                }
            )
        msgs = list(messages)
        if all_tools:
            msgs.insert(0, {"role": "system", "content": tools_system_prompt(all_tools)})
        parser = FunctionCallParser(
            tools=[
                {"type": "function", "function": {"name": t["name"]}}
                for t in all_tools
            ],
            format=tool_format,
        )
        text = ""
        for _ in range(max_tool_calls):
            text = await generate(msgs)
            if not parser.has_tool_call(text):
                break
            normal, calls = parser.parse_non_stream(text)
            if not calls:
                break
            msgs.append({"role": "assistant", "content": text})
            for call in calls:
                name = call["function"]["name"]
                try:
                    args = json.loads(call["function"]["arguments"] or "{}")
                except json.JSONDecodeError:
                    args = {}
                label = tool_owner.get(name)
                if label is None:
                    result_text = f"error: unknown tool {name}"
                    is_error = True
                else:
                    try:
                        result = await clients[label].call_tool(name, args)
                        result_text = tool_result_text(result)
                        is_error = bool(result.get("isError"))
                    except Exception as e:  # surface transport failures
                        result_text = f"error: {e}"
                        is_error = True
                output_items.append(
                    {
                        "type": "mcp_call",
                        "id": call["id"],
                        "server_label": label,
                        "name": name,
                        "arguments": call["function"]["arguments"],
                        "output": result_text,
                        "error": result_text if is_error else None,
                    }
                )
                msgs.append(
                    {
                        "role": "user",
                        "content": f"<tool_response>{result_text}</tool_response>",
                    }
                )
        return text, output_items, msgs
    finally:
        for client in clients.values():
            try:
                await client.close()
            except Exception:
                pass
