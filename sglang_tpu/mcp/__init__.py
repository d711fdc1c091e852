from sglang_tpu.mcp.client import (  # noqa: F401
    HttpMcpClient,
    McpError,
    StdioMcpClient,
    connect_mcp,
)
