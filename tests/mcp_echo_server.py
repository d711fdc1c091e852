"""Tiny MCP stdio server used by the gateway tests: one `add` tool,
newline-delimited JSON-RPC (the MCP stdio transport)."""

import json
import sys


def main():
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        msg = json.loads(line)
        method = msg.get("method")
        if "id" not in msg:
            continue  # notification (notifications/initialized)
        rid = msg["id"]
        if method == "initialize":
            result = {
                "protocolVersion": "2025-03-26",
                "capabilities": {"tools": {}},
                "serverInfo": {"name": "echo", "version": "1"},
            }
        elif method == "tools/list":
            result = {
                "tools": [
                    {
                        "name": "add",
                        "description": "add two integers",
                        "inputSchema": {
                            "type": "object",
                            "properties": {
                                "a": {"type": "integer"},
                                "b": {"type": "integer"},
                            },
                            "required": ["a", "b"],
                        },
                    }
                ]
            }
        elif method == "tools/call":
            p = msg.get("params", {})
            if p.get("name") == "add":
                args = p.get("arguments", {})
                result = {
                    "content": [
                        {
                            "type": "text",
                            "text": str(int(args["a"]) + int(args["b"])),
                        }
                    ]
                }
            else:
                result = {
                    "content": [{"type": "text", "text": "unknown tool"}],
                    "isError": True,
                }
        else:
            sys.stdout.write(
                json.dumps(
                    {
                        "jsonrpc": "2.0",
                        "id": rid,
                        "error": {"code": -32601, "message": "not found"},
                    }
                )
                + "\n"
            )
            sys.stdout.flush()
            continue
        sys.stdout.write(
            json.dumps({"jsonrpc": "2.0", "id": rid, "result": result}) + "\n"
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
