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


def build_sglang_service_handlers(state):
    """Wire-compatible `sglang.runtime.v1.SglangService` (reference
    `proto/sglang/runtime/v1/sglang.proto:4`): proto messages are built
    from the vendored descriptor set, so any generated-stub client of the
    reference server can talk to this one."""
    import grpc

    from sglang_tpu.entrypoints.proto import SERVICE_NAME, get_pb

    pb = get_pb()
    tm = state.tm

    def _sp_dict(req) -> Dict[str, Any]:
        if not req.HasField("sampling_params"):
            return {}
        sp = req.sampling_params
        d: Dict[str, Any] = {}
        for f in (
            "temperature", "top_p", "top_k", "min_p", "frequency_penalty",
            "presence_penalty", "repetition_penalty", "max_new_tokens",
            "min_new_tokens", "ignore_eos", "n", "json_schema", "regex",
        ):
            if sp.HasField(f):
                d[f] = getattr(sp, f)
        if sp.stop:
            d["stop"] = list(sp.stop)
        if sp.stop_token_ids:
            d["stop_token_ids"] = list(sp.stop_token_ids)
        return d

    def _meta(out) -> Dict[str, str]:
        m = {
            "id": out.rid,
            "prompt_tokens": str(out.prompt_tokens),
            "completion_tokens": str(out.completion_tokens),
            "cached_tokens": str(out.cached_tokens),
        }
        if out.finish_reason is not None:
            m["finish_reason"] = json.dumps(out.finish_reason.to_json())
        return m

    def _opt(req, field, default=None):
        return getattr(req, field) if req.HasField(field) else default

    async def text_generate(request, ctx):
        g = GenerateReqInput(
            text=request.text,
            sampling_params=_sp_dict(request),
            rid=_opt(request, "rid"),
            return_logprob=_opt(request, "return_logprob", False),
            top_logprobs_num=_opt(request, "top_logprobs_num", 0),
            stream=_opt(request, "stream", False),
            lora_path=_opt(request, "lora_path"),
        )
        treq = tm.tokenize(g)
        last_len = 0
        final = None
        async for out in tm.generate_request(treq):
            if g.stream:
                new = out.output_str[last_len:]
                last_len = len(out.output_str)
                yield pb.TextGenerateResponse(
                    text=new, meta_info=_meta(out), finished=out.finished
                )
            final = out
        if not g.stream and final is not None:
            yield pb.TextGenerateResponse(
                text=final.output_str,
                meta_info=_meta(final),
                finished=True,
            )

    async def generate(request, ctx):
        g = GenerateReqInput(
            input_ids=list(request.input_ids),
            sampling_params=_sp_dict(request),
            rid=_opt(request, "rid"),
            return_logprob=_opt(request, "return_logprob", False),
            top_logprobs_num=_opt(request, "top_logprobs_num", 0),
            stream=_opt(request, "stream", False),
            lora_path=_opt(request, "lora_path"),
        )
        treq = tm.tokenize(g)
        sent = 0
        final = None
        async for out in tm.generate_request(treq):
            if g.stream:
                new_ids = out.output_ids[sent:]
                sent = len(out.output_ids)
                yield pb.GenerateResponse(
                    output_ids=new_ids,
                    meta_info=_meta(out),
                    finished=out.finished,
                )
            final = out
        if not g.stream and final is not None:
            yield pb.GenerateResponse(
                output_ids=final.output_ids,
                meta_info=_meta(final),
                finished=True,
            )

    async def _embed_one(text=None, input_ids=None):
        if input_ids:
            outs = await tm.run_on_scheduler(
                lambda: state.engine.encode(input_ids=[list(input_ids)])
            )
        else:
            outs = await tm.run_on_scheduler(
                lambda: state.engine.encode(prompt=[text])
            )
        o = outs[0]
        return o["embedding"], {
            "prompt_tokens": str(o["meta_info"]["prompt_tokens"])
        }

    async def text_embed(request, ctx):
        emb, meta = await _embed_one(text=request.text)
        return pb.TextEmbedResponse(embedding=emb, meta_info=meta)

    async def embed(request, ctx):
        emb, meta = await _embed_one(input_ids=request.input_ids)
        return pb.EmbedResponse(embedding=emb, meta_info=meta)

    async def classify(request, ctx):
        emb, meta = await _embed_one(
            text=request.text or None,
            input_ids=list(request.input_ids) or None,
        )
        return pb.ClassifyResponse(embedding=emb, meta_info=meta)

    async def tokenize(request, ctx):
        tok = tm.tokenizer
        if tok is None:
            import grpc as _g

            await ctx.abort(_g.StatusCode.FAILED_PRECONDITION, "no tokenizer")
        ids = tok.encode(
            request.text,
            add_special_tokens=(
                request.add_special_tokens
                if request.HasField("add_special_tokens")
                else True
            ),
        )
        return pb.TokenizeResponse(
            tokens=ids,
            count=len(ids),
            max_model_len=state.runner.model_config.context_length,
            input_text=request.text,
        )

    async def detokenize(request, ctx):
        text = tm.tokenizer.decode(list(request.tokens))
        return pb.DetokenizeResponse(text=text)

    async def health_check(request, ctx):
        return pb.HealthCheckResponse(healthy=tm.is_healthy())

    async def get_model_info(request, ctx):
        mc = state.runner.model_config
        return pb.GetModelInfoResponse(
            model_path=state.server_args.model_path,
            json_info=json.dumps(
                {
                    "model_path": state.server_args.model_path,
                    "architectures": mc.architectures,
                    "context_length": mc.context_length,
                    "vocab_size": mc.vocab_size,
                    "is_generation": True,
                }
            ),
        )

    async def get_server_info(request, ctx):
        s = state.scheduler.stats
        return pb.GetServerInfoResponse(
            json_info=json.dumps(
                {
                    "model_path": state.server_args.model_path,
                    "max_total_tokens": state.runner.max_total_tokens,
                    "page_size": state.server_args.page_size,
                    "uptime": time.time() - state.start_time,
                    "running_requests": len(state.scheduler.running_batch.reqs),
                    "waiting_requests": len(state.scheduler.waiting_queue),
                    "finished_requests": s.num_finished,
                    "cache_hit_rate": s.cache_hit_rate(),
                    "paused": tm.paused,
                }
            )
        )

    async def list_models(request, ctx):
        mc = state.runner.model_config
        card = pb.ModelCard(
            id=state.server_args.served_model_name
            or state.server_args.model_path,
            root=state.server_args.model_path,
            max_model_len=mc.context_length,
        )
        return pb.ListModelsResponse(models=[card])

    async def get_load(request, ctx):
        return pb.GetLoadResponse(
            json_info=json.dumps(
                {
                    "running_requests": len(state.scheduler.running_batch.reqs),
                    "waiting_requests": len(state.scheduler.waiting_queue),
                    "used_tokens": state.runner.max_total_tokens
                    - state.scheduler.allocator.available_pages()
                    * state.server_args.page_size,
                }
            )
        )

    async def abort(request, ctx):
        if request.abort_all:
            for rid in list(state.scheduler.reqs.keys()):
                tm.abort_request(rid)
        else:
            tm.abort_request(request.rid)
        return pb.AbortResponse(success=True)

    async def flush_cache(request, ctx):
        ok = await tm.run_on_scheduler(state.scheduler.flush_cache)
        return pb.FlushCacheResponse(
            success=bool(ok),
            message="flushed" if ok else "engine busy; not flushed",
        )

    async def pause_generation(request, ctx):
        tm.paused = True
        return pb.PauseGenerationResponse(message="paused")

    async def continue_generation(request, ctx):
        tm.paused = False
        return pb.ContinueGenerationResponse(message="continued")

    async def start_profile(request, ctx):
        out_dir = (
            request.output_dir
            if request.HasField("output_dir")
            else "/tmp/sglang_tpu_profile"
        )
        import jax

        jax.profiler.start_trace(out_dir)
        return pb.StartProfileResponse(message=f"profiling to {out_dir}")

    async def stop_profile(request, ctx):
        import jax

        jax.profiler.stop_trace()
        return pb.StopProfileResponse(message="profile stopped")

    async def update_weights(request, ctx):
        try:
            await tm.run_on_scheduler(
                lambda: state.runner.update_weights_from_disk(
                    request.model_path
                )
            )
            return pb.UpdateWeightsResponse(success=True, message="ok")
        except Exception as e:  # surfaced to the client, server stays up
            return pb.UpdateWeightsResponse(success=False, message=str(e))

    async def _openai_roundtrip(request, route):
        """JSON pass-through RPCs re-enter the HTTP app's OpenAI handlers
        over loopback (the reference gateway's grpc<->http bridging)."""
        import aiohttp

        base = getattr(state, "http_base_url", None)
        if base is None:
            raise RuntimeError(
                "OpenAI pass-through RPCs need the HTTP app "
                "(launch with an http port)"
            )
        async with aiohttp.ClientSession() as sess:
            async with sess.post(
                base + route, data=request.json_body,
                headers={"Content-Type": "application/json"},
            ) as resp:
                return await resp.read(), resp.status

    def _openai_unary(route):
        async def handler(request, ctx):
            body, status = await _openai_roundtrip(request, route)
            return pb.OpenAIResponse(json_body=body, status_code=status)

        return handler

    def _openai_stream(route):
        async def handler(request, ctx):
            import aiohttp

            base = getattr(state, "http_base_url", None)
            if base is None:
                import grpc as _g

                await ctx.abort(
                    _g.StatusCode.FAILED_PRECONDITION,
                    "OpenAI pass-through needs the HTTP app",
                )
            payload = json.loads(request.json_body or b"{}")
            streaming = bool(payload.get("stream"))
            async with aiohttp.ClientSession() as sess:
                async with sess.post(
                    base + route, json=payload,
                    headers={"Content-Type": "application/json"},
                ) as resp:
                    if streaming:
                        async for line in resp.content:
                            line = line.strip()
                            if not line or not line.startswith(b"data:"):
                                continue
                            chunk = line[5:].strip()
                            done = chunk == b"[DONE]"
                            yield pb.OpenAIStreamChunk(
                                json_chunk=b"" if done else chunk,
                                finished=done,
                            )
                            if done:
                                return
                    else:
                        body = await resp.read()
                        yield pb.OpenAIStreamChunk(
                            json_chunk=body, finished=True
                        )

        return handler

    def _h(method, fn):
        req_cls, resp_cls, streaming = pb.method_types(method)
        if streaming:
            return grpc.unary_stream_rpc_method_handler(
                fn,
                request_deserializer=req_cls.FromString,
                response_serializer=lambda m: m.SerializeToString(),
            )
        return grpc.unary_unary_rpc_method_handler(
            fn,
            request_deserializer=req_cls.FromString,
            response_serializer=lambda m: m.SerializeToString(),
        )

    methods = {
        "TextGenerate": text_generate,
        "Generate": generate,
        "TextEmbed": text_embed,
        "Embed": embed,
        "Classify": classify,
        "Tokenize": tokenize,
        "Detokenize": detokenize,
        "HealthCheck": health_check,
        "GetModelInfo": get_model_info,
        "GetServerInfo": get_server_info,
        "ListModels": list_models,
        "GetLoad": get_load,
        "Abort": abort,
        "FlushCache": flush_cache,
        "PauseGeneration": pause_generation,
        "ContinueGeneration": continue_generation,
        "ChatComplete": _openai_stream("/v1/chat/completions"),
        "Complete": _openai_stream("/v1/completions"),
        "OpenAIEmbed": _openai_unary("/v1/embeddings"),
        "OpenAIClassify": _openai_unary("/v1/embeddings"),
        "Score": _openai_unary("/v1/score"),
        "Rerank": _openai_unary("/v1/rerank"),
        "StartProfile": start_profile,
        "StopProfile": stop_profile,
        "UpdateWeightsFromDisk": update_weights,
    }
    return grpc.method_handlers_generic_handler(
        SERVICE_NAME, {k: _h(k, v) for k, v in methods.items()}
    )


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
    # wire-compatible sglang.runtime.v1.SglangService alongside the
    # JSON-body legacy service
    server.add_generic_rpc_handlers((build_sglang_service_handlers(state),))
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
