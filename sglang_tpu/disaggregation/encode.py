"""Multimodal ENCODE disaggregation (D5 — reference
`srt/disaggregation/encode_server.py` / `encode_receiver.py`).

A standalone encode server owns the vision tower: the LLM server sends it
raw pixel inputs and receives the projected multimodal embeddings, so
vision FLOPs scale independently of decode capacity (the reference's
encode-disaggregation deployment shape). Wire format is npz-over-HTTP —
self-describing, binary, and shape/dtype exact.

    POST /encode   npz{pixel_values[, grid_thw]}  ->  npz{mm_embeds}
    GET  /health

Engine integration: `--encode-server-url http://host:port` routes
`runner.encode_images` calls through `EncodeClient` instead of the local
vision tower (text-side weights still load locally; a weight-partitioned
loader is the follow-up optimization, not a behavior change).
"""

from __future__ import annotations

import io
from typing import Optional

import numpy as np

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


def _pack_npz(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def _unpack_npz(data: bytes) -> dict:
    return dict(np.load(io.BytesIO(data), allow_pickle=False))


class EncodeClient:
    """LLM-server-side handle to a remote encode server."""

    def __init__(self, url: str, timeout: float = 120.0):
        self.url = url.rstrip("/")
        self.timeout = timeout

    def encode(
        self, pixel_values: np.ndarray, grid_thw: Optional[tuple] = None
    ) -> np.ndarray:
        import urllib.request

        arrays = {"pixel_values": np.asarray(pixel_values, dtype=np.float32)}
        if grid_thw is not None:
            arrays["grid_thw"] = np.asarray(grid_thw, dtype=np.int64)
        req = urllib.request.Request(
            self.url + "/encode",
            data=_pack_npz(**arrays),
            headers={"Content-Type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            out = _unpack_npz(r.read())
        return out["mm_embeds"]


def build_encode_app(runner):
    """aiohttp app over a ModelRunner whose model has `encode_images`."""
    from aiohttp import web

    async def encode(request: "web.Request"):
        body = await request.read()
        arrays = _unpack_npz(body)
        pix = arrays["pixel_values"]
        kwargs = {}
        if "grid_thw" in arrays:
            kwargs["grid_thw"] = tuple(int(x) for x in arrays["grid_thw"])
        try:
            emb = runner.encode_images(pix, **kwargs)
        except Exception as e:  # surface encode errors to the caller
            return web.json_response({"error": str(e)}, status=400)
        return web.Response(
            body=_pack_npz(mm_embeds=np.asarray(emb, dtype=np.float32)),
            content_type="application/octet-stream",
        )

    async def health(request):
        return web.json_response({"status": "ok"})

    app = web.Application(client_max_size=1 << 30)
    app.router.add_post("/encode", encode)
    app.router.add_get("/health", health)
    return app


def launch_encode_server(server_args, host: str = "0.0.0.0", port: int = 30100):
    """Standalone encode-server entrypoint (loads the full checkpoint,
    serves only the vision tower)."""
    from aiohttp import web

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.model_executor.model_runner import ModelRunner

    mc = ModelConfig.from_server_args(server_args)
    runner = ModelRunner(server_args, mc)
    if not hasattr(runner, "encode_images"):
        raise ValueError("model has no vision tower; nothing to serve")
    app = build_encode_app(runner)
    logger.info("encode server on %s:%d", host, port)
    web.run_app(app, host=host, port=port, print=None)
