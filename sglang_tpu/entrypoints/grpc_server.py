"""gRPC serving front-end.

Parity with the reference's gRPC server mode (`srt/entrypoints/grpc_server.py`
+ its rust router's grpc path): a second data-plane protocol next to HTTP,
sharing the same TokenizerManager pump. Runs standalone
(`python -m sglang_tpu.entrypoints.grpc_server`) or alongside HTTP via
`--grpc-port` on the regular launcher.

Wire format: real gRPC (HTTP/2 framing, deadlines, cancellation,
unary-stream server streaming) with JSON-encoded message bodies that are
IDENTICAL to the HTTP API's request/response schemas. The image ships the
grpcio runtime but no protoc python plugin for stub codegen, so messages
are deliberately schema-by-documentation (the same contract as /generate)
rather than compiled protobufs; `GrpcEngineClient` below is the matching
client. Method table:

    /sglang.Engine/Generate        unary-unary   /generate (non-stream)
    /sglang.Engine/GenerateStream  unary-stream  /generate (stream)
    /sglang.Engine/Encode          unary-unary   /v1/embeddings input
    /sglang.Engine/Health          unary-unary   /health
    /sglang.Engine/GetServerInfo   unary-unary   /get_server_info
    /sglang.Engine/FlushCache      unary-unary   /flush_cache
    /sglang.Engine/AbortRequest    unary-unary   /abort_request
"""

from __future__ import annotations

import argparse
import asyncio
import json
import time
from typing import Any, Dict

from sglang_tpu.managers.io_struct import GenerateReqInput
from sglang_tpu.server_args import ServerArgs
from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

SERVICE = "sglang.Engine"


def _loads(b: bytes) -> Dict[str, Any]:
    return json.loads(b) if b else {}


def _dumps(d: Dict[str, Any]) -> bytes:
    return json.dumps(d).encode()


def _out_dict(out) -> Dict[str, Any]:
    d = {
        "text": out.output_str,
        "output_ids": out.output_ids,
        "meta_info": {
            "id": out.rid,
            "finish_reason": out.finish_reason.to_json() if out.finish_reason else None,
            "prompt_tokens": out.prompt_tokens,
            "completion_tokens": out.completion_tokens,
            "cached_tokens": out.cached_tokens,
        },
    }
    if out.output_token_logprobs is not None:
        d["meta_info"]["output_token_logprobs"] = out.output_token_logprobs
    return d


def build_grpc_server(state, host: str, port: int):
    """`state` is an http_server.ServerState (shared scheduler + pump)."""
    import grpc
    import grpc.aio

    tm = state.tm

    def _treq(payload: Dict[str, Any], stream: bool):
        g = GenerateReqInput(
            text=payload.get("text"),
            input_ids=payload.get("input_ids"),
            sampling_params=payload.get("sampling_params") or {},
            rid=payload.get("rid"),
            return_logprob=payload.get("return_logprob", False),
            top_logprobs_num=payload.get("top_logprobs_num", 0),
            stream=stream,
            lora_path=payload.get("lora_path"),
        )
        if g.is_batch():
            raise ValueError("gRPC Generate takes one request per call")
        return tm.tokenize(g)

    async def generate(payload, ctx):
        try:
            treq = _treq(payload, stream=False)
        except ValueError as e:
            await ctx.abort(grpc.StatusCode.INVALID_ARGUMENT, str(e))
        final = None
        async for out in tm.generate_request(treq):
            final = out
        if final is None or (final.finish_reason and final.finish_reason.kind == "abort"):
            msg = final.finish_reason.message if final else "no output"
            await ctx.abort(grpc.StatusCode.INTERNAL, msg or "aborted")
        return _out_dict(final)

    async def generate_stream(payload, ctx):
        try:
            treq = _treq(payload, stream=True)
        except ValueError as e:
            await ctx.abort(grpc.StatusCode.INVALID_ARGUMENT, str(e))
        async for out in tm.generate_request(treq):
            yield _out_dict(out)

    async def encode(payload, ctx):
        inputs = payload.get("input")
        if isinstance(inputs, str):
            inputs = [inputs]
        if inputs and isinstance(inputs[0], list):
            outs = await tm.run_on_scheduler(
                lambda: state.engine.encode(input_ids=inputs)
            )
        else:
            outs = await tm.run_on_scheduler(
                lambda: state.engine.encode(prompt=inputs)
            )
        return {
            "embeddings": [o["embedding"] for o in outs],
            "prompt_tokens": sum(o["meta_info"]["prompt_tokens"] for o in outs),
        }

    async def health(payload, ctx):
        return {"healthy": tm.is_healthy()}

    async def server_info(payload, ctx):
        s = state.scheduler.stats
        return {
            "model_path": state.server_args.model_path,
            "max_total_tokens": state.runner.max_total_tokens,
            "page_size": state.server_args.page_size,
            "uptime": time.time() - state.start_time,
            "running_requests": len(state.scheduler.running_batch.reqs),
            "waiting_requests": len(state.scheduler.waiting_queue),
            "finished_requests": s.num_finished,
            "cache_hit_rate": s.cache_hit_rate(),
        }

    async def flush_cache(payload, ctx):
        ok = await tm.run_on_scheduler(state.scheduler.flush_cache)
        return {"success": bool(ok)}

    async def abort_request(payload, ctx):
        tm.abort_request(payload.get("rid", ""))
        return {"success": True}

    def unary(fn):
        return grpc.unary_unary_rpc_method_handler(
            fn, request_deserializer=_loads, response_serializer=_dumps
        )

    handlers = grpc.method_handlers_generic_handler(
        SERVICE,
        {
            "Generate": unary(generate),
            "GenerateStream": grpc.unary_stream_rpc_method_handler(
                generate_stream,
                request_deserializer=_loads,
                response_serializer=_dumps,
            ),
            "Encode": unary(encode),
            "Health": unary(health),
            "GetServerInfo": unary(server_info),
            "FlushCache": unary(flush_cache),
            "AbortRequest": unary(abort_request),
        },
    )
    server = grpc.aio.server()
    server.add_generic_rpc_handlers((handlers,))
    server.add_insecure_port(f"{host}:{port}")
    return server


class GrpcEngineClient:
    """Minimal blocking client for the JSON-over-gRPC service above."""

    def __init__(self, addr: str):
        import grpc

        self.channel = grpc.insecure_channel(addr)

    def _unary(self, method: str):
        return self.channel.unary_unary(
            f"/{SERVICE}/{method}",
            request_serializer=_dumps,
            response_deserializer=_loads,
        )

    def generate(self, timeout: float = 300.0, **payload) -> Dict[str, Any]:
        return self._unary("Generate")(payload, timeout=timeout)

    def generate_stream(self, timeout: float = 300.0, **payload):
        call = self.channel.unary_stream(
            f"/{SERVICE}/GenerateStream",
            request_serializer=_dumps,
            response_deserializer=_loads,
        )
        yield from call(payload, timeout=timeout)

    def encode(self, input, timeout: float = 300.0) -> Dict[str, Any]:
        return self._unary("Encode")({"input": input}, timeout=timeout)

    def health(self) -> Dict[str, Any]:
        return self._unary("Health")({}, timeout=10.0)

    def get_server_info(self) -> Dict[str, Any]:
        return self._unary("GetServerInfo")({}, timeout=10.0)

    def flush_cache(self) -> Dict[str, Any]:
        return self._unary("FlushCache")({}, timeout=60.0)

    def abort_request(self, rid: str) -> Dict[str, Any]:
        return self._unary("AbortRequest")({"rid": rid}, timeout=10.0)

    def close(self):
        self.channel.close()


async def _serve_async(server_args: ServerArgs, grpc_port: int):
    from sglang_tpu.entrypoints.http_server import ServerState

    state = ServerState(server_args)
    server = build_grpc_server(state, server_args.host, grpc_port)
    await server.start()
    logger.info("grpc server on %s:%d", server_args.host, grpc_port)
    await server.wait_for_termination()


def main(argv=None):
    parser = argparse.ArgumentParser(description="sglang_tpu gRPC server")
    ServerArgs.add_cli_args(parser)
    parser.add_argument("--grpc-port", type=int, default=30001)
    args = parser.parse_args(argv)
    server_args = ServerArgs.from_cli_args(args)
    asyncio.run(_serve_async(server_args, args.grpc_port))


if __name__ == "__main__":
    main()
