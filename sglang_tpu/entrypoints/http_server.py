"""HTTP serving layer (aiohttp).

Parity with reference `srt/entrypoints/http_server.py:2337 launch_server`
(FastAPI + uvicorn; ~75 routes). The TPU engine keeps everything in one
process: routes here talk to the `TokenizerManager` facade, whose pump
thread drives the scheduler.

Routes: /generate (native, SSE streaming), /v1/completions,
/v1/chat/completions, /v1/models, /health, /health_generate,
/get_server_info, /get_model_info, /flush_cache, /abort_request, /metrics.
"""

from __future__ import annotations

import asyncio
import json
import time
import uuid
from typing import Optional

from aiohttp import web

from sglang_tpu.entrypoints.openai.protocol import (
    ChatCompletionRequest,
    CompletionRequest,
    chat_id,
    completion_id,
    now,
    usage_dict,
)
from sglang_tpu.managers.io_struct import GenerateReqInput
from sglang_tpu.managers.tokenizer_manager import TokenizerManager
from sglang_tpu.server_args import ServerArgs
from sglang_tpu.utils import configure_logger, get_logger
from sglang_tpu.version import __version__

logger = get_logger(__name__)


def _extract_images(messages) -> list:
    """PIL images from chat content parts (data: URLs / raw base64 only —
    this host has no egress, so remote URLs are rejected)."""
    import base64
    import io

    out = []
    for m in messages:
        content = getattr(m, "content", None)
        if not isinstance(content, list):
            continue
        for part in content:
            if part.get("type") not in ("image_url", "image"):
                continue
            url = (part.get("image_url") or {}).get("url") or part.get("image")
            if not url:
                continue
            if url.startswith("data:"):
                b64 = url.split(",", 1)[1]
            elif url.startswith("http"):
                raise ValueError(
                    "remote image URLs are not supported; send a data: URL"
                )
            else:
                b64 = url
            from PIL import Image

            out.append(Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB"))
    return out


class ServerState:
    def __init__(self, server_args: ServerArgs):
        self.server_args = server_args
        from sglang_tpu.entrypoints.engine import Engine

        self.engine = Engine(server_args)
        self.tokenizer = self.engine.tokenizer
        self.runner = self.engine.runner
        self.scheduler = self.engine.scheduler
        self.tm = TokenizerManager(server_args, self.scheduler, self.tokenizer)
        self.start_time = time.time()
        # conversation + response persistence for /v1/conversations and
        # /v1/responses chaining (reference gateway conversations module)
        from sglang_tpu.entrypoints.conversations import (
            ConversationStorage,
            ResponseStore,
        )

        self.conversations = ConversationStorage(
            getattr(server_args, "conversation_journal_path", None)
        )
        self.responses = ResponseStore()

    def _get_processor(self):
        if not hasattr(self, "_processor"):
            from transformers import AutoProcessor

            self._processor = AutoProcessor.from_pretrained(
                self.server_args.model_path
            )
        return self._processor

    def build_mm_request(self, req, images):
        """Chat messages + PIL images -> a tokenized multimodal request
        (reference mm chat path via the model's AutoProcessor)."""
        proc = self._get_processor()
        img_tok = getattr(
            proc, "image_token", None
        ) or self.tokenizer.convert_ids_to_tokens(
            self.runner.model.image_token_id
        )
        hf_messages = []
        for m in req.messages:
            content = m.content
            if isinstance(content, list):
                text = "".join(
                    part.get("text", "")
                    if part.get("type") == "text"
                    else img_tok
                    if part.get("type") in ("image_url", "image")
                    else ""
                    for part in content
                )
            else:
                text = content or ""
            hf_messages.append({"role": m.role, "content": text})
        prompt = self.tokenizer.apply_chat_template(
            hf_messages, tokenize=False, add_generation_prompt=True
        )
        out = proc(text=prompt, images=images, return_tensors="np")
        ids = out["input_ids"][0].tolist()
        if "image_grid_thw" in out:  # grid-native models (Qwen2-VL)
            image_data = {
                "pixel_values": out["pixel_values"],
                "grid_thw": tuple(int(x) for x in out["image_grid_thw"][0]),
            }
        elif "image_sizes" in out:  # anyres models (LLaVA-NeXT)
            image_data = {
                "pixel_values": out["pixel_values"],
                "image_sizes": out["image_sizes"],
            }
        else:
            image_data = out["pixel_values"]
        from sglang_tpu.managers.io_struct import GenerateReqInput as GRI

        gri = GRI(
            input_ids=ids,
            image_data=image_data,
            sampling_params=req.to_sampling_dict(),
            stream=req.stream,
        )
        return self.engine._tokenize_one(gri)

    def apply_chat_template(self, messages, tools=None) -> str:
        hf_messages = []
        for m in messages:
            entry = {"role": m.role, "content": m.text()}
            if m.tool_calls:
                entry["tool_calls"] = m.tool_calls
            if m.tool_call_id:
                entry["tool_call_id"] = m.tool_call_id
            hf_messages.append(entry)
        kwargs = {}
        if tools:
            kwargs["tools"] = tools
        return self.tokenizer.apply_chat_template(
            hf_messages, tokenize=False, add_generation_prompt=True, **kwargs
        )


def _auth_ok(state: ServerState, request: web.Request) -> bool:
    key = state.server_args.api_key
    if not key:
        return True
    auth = request.headers.get("Authorization", "")
    return auth == f"Bearer {key}"


def _sse(data: dict | str) -> bytes:
    if isinstance(data, dict):
        data = json.dumps(data)
    return f"data: {data}\n\n".encode()


def build_app(state: ServerState) -> web.Application:
    app = web.Application(client_max_size=64 * 1024 * 1024)
    r = app.router

    # ------------------------------------------------------------ health

    async def health(request):
        return web.Response(text="")

    async def health_generate(request):
        """Run a real 1-token generation (reference `/health_generate`)."""
        treq = state.tm.tokenize(
            GenerateReqInput(
                input_ids=[1, 2, 3],
                sampling_params={"max_new_tokens": 1, "ignore_eos": True},
            )
        )
        try:
            async with asyncio.timeout(state.server_args.watchdog_timeout):
                async for _ in state.tm.generate_request(treq):
                    pass
            return web.Response(text="")
        except TimeoutError:
            return web.Response(status=503, text="generation timed out")

    async def get_model_info(request):
        return web.json_response(
            {
                "model_path": state.server_args.model_path,
                "served_model_name": state.server_args.served_model_name,
                "tokenizer_path": state.server_args.tokenizer_path,
                "is_generation": True,
            }
        )

    async def get_server_info(request):
        s = state.scheduler.stats
        return web.json_response(
            {
                "version": __version__,
                "model_path": state.server_args.model_path,
                "max_total_tokens": state.runner.max_total_tokens,
                "page_size": state.server_args.page_size,
                "tp_size": state.server_args.tp_size,
                "uptime": time.time() - state.start_time,
                "running_requests": len(state.scheduler.running_batch.reqs),
                "waiting_requests": len(state.scheduler.waiting_queue),
                "prefill_tokens": s.num_prefill_tokens,
                "decode_tokens": s.num_decode_tokens,
                "cache_hit_rate": s.cache_hit_rate(),
                "retractions": s.num_retractions,
                "finished": s.num_finished,
            }
        )

    async def metrics(request):
        s = state.scheduler.stats
        lines = [
            "# TYPE sglang_tpu_prefill_tokens_total counter",
            f"sglang_tpu_prefill_tokens_total {s.num_prefill_tokens}",
            "# TYPE sglang_tpu_decode_tokens_total counter",
            f"sglang_tpu_decode_tokens_total {s.num_decode_tokens}",
            "# TYPE sglang_tpu_cached_tokens_total counter",
            f"sglang_tpu_cached_tokens_total {s.num_cached_tokens}",
            "# TYPE sglang_tpu_finished_requests_total counter",
            f"sglang_tpu_finished_requests_total {s.num_finished}",
            "# TYPE sglang_tpu_retractions_total counter",
            f"sglang_tpu_retractions_total {s.num_retractions}",
            "# TYPE sglang_tpu_running_requests gauge",
            f"sglang_tpu_running_requests {len(state.scheduler.running_batch.reqs)}",
            "# TYPE sglang_tpu_waiting_requests gauge",
            f"sglang_tpu_waiting_requests {len(state.scheduler.waiting_queue)}",
            "# TYPE sglang_tpu_cache_hit_rate gauge",
            f"sglang_tpu_cache_hit_rate {s.cache_hit_rate():.6f}",
            # speculative decoding accept stats (reference
            # `observability/metrics_collector.py:186` accept length/rate)
            "# TYPE sglang_tpu_spec_verify_steps_total counter",
            f"sglang_tpu_spec_verify_steps_total {s.num_spec_steps}",
            "# TYPE sglang_tpu_spec_accepted_tokens_total counter",
            f"sglang_tpu_spec_accepted_tokens_total {s.num_spec_accepted}",
            "# TYPE sglang_tpu_spec_accept_length gauge",
            f"sglang_tpu_spec_accept_length "
            f"{s.num_spec_accepted / max(1, s.num_spec_steps):.4f}",
        ]
        hc = state.scheduler.hicache
        if hc is not None:
            lines += [
                "# TYPE sglang_tpu_hicache_tokens_total counter",
                f"sglang_tpu_hicache_tokens_total {s.num_hicache_tokens}",
                "# TYPE sglang_tpu_hicache_host_pages gauge",
                f"sglang_tpu_hicache_host_pages {hc.host.num_pages}",
            ]
        # request-latency histograms (reference metrics_collector.py:186
        # TTFT/ITL/e2e/queue) — bench_serving numbers are reproducible from
        # these alone
        lines += state.scheduler.metrics.prometheus_lines()
        # per-stage scheduler wall time (reference per-stage time stats)
        lines.append("# TYPE sglang_tpu_stage_seconds_total counter")
        for name, secs in sorted(s.stage_time.items()):
            lines.append(
                f'sglang_tpu_stage_seconds_total{{stage="{name}"}} {secs:.6f}'
            )
        return web.Response(text="\n".join(lines) + "\n")

    async def flush_cache(request):
        ok = state.scheduler.flush_cache()
        return web.json_response({"success": ok}, status=200 if ok else 409)

    async def abort_request(request):
        body = await request.json()
        state.tm.abort_request(body.get("rid", ""))
        return web.json_response({"success": True})

    async def pause_generation(request):
        # reference /pause_generation: stop stepping; control ops keep
        # working; in-flight requests stay queued in place
        state.tm.paused = True
        return web.json_response({"message": "paused", "status": "ok"})

    async def continue_generation(request):
        state.tm.paused = False
        return web.json_response({"message": "continued", "status": "ok"})

    # ---------------------------------------------------------- generate

    async def generate(request):
        if not _auth_ok(state, request):
            return web.Response(status=401, text="unauthorized")
        try:
            body = await request.json()
        except json.JSONDecodeError:
            return web.json_response({"error": "invalid JSON"}, status=400)
        gri = GenerateReqInput(
            text=body.get("text"),
            input_ids=body.get("input_ids"),
            sampling_params=body.get("sampling_params"),
            rid=body.get("rid"),
            return_logprob=body.get("return_logprob", False),
            top_logprobs_num=body.get("top_logprobs_num", 0),
            stream=body.get("stream", False),
            session_params=body.get("session_params"),
            lora_path=body.get("lora_path"),
        )
        session_id = (gri.session_params or {}).get("id")
        if session_id is not None and not gri.is_batch():
            try:
                treq0 = state.tm.tokenize(gri)
                treq0.input_ids = state.engine.sessions.prepare_input(
                    session_id, treq0.input_ids
                )
            except ValueError as e:
                return web.json_response({"error": str(e)}, status=400)
            result = await _collect(state, treq0)
            state.engine.sessions.commit_turn(
                session_id, treq0.input_ids + result["output_ids"]
            )
            return web.json_response(result)
        try:
            if gri.is_batch():
                singles = gri.unbatch()
                if gri.stream:
                    return web.json_response(
                        {"error": "batch streaming not supported"}, status=400
                    )
                results = await asyncio.gather(
                    *(_collect(state, state.tm.tokenize(g)) for g in singles)
                )
                return web.json_response(results)
            treq = state.tm.tokenize(gri)
        except (ValueError, RuntimeError) as e:
            return web.json_response({"error": str(e)}, status=400)

        if gri.stream:
            resp = web.StreamResponse(
                headers={
                    "Content-Type": "text/event-stream",
                    "Cache-Control": "no-cache",
                }
            )
            await resp.prepare(request)
            async for out in state.tm.generate_request(treq):
                await resp.write(_sse(_native_dict(out)))
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp
        result = await _collect(state, treq)
        if result.get("meta_info", {}).get("finish_reason", {}).get("type") == "abort":
            return web.json_response(result, status=400)
        return web.json_response(result)

    # --------------------------------------------- Anthropic / Ollama compat

    async def v1_messages(request):
        """Anthropic Messages API compat (reference `/v1/messages`)."""
        if not _auth_ok(state, request):
            return web.Response(status=401, text="unauthorized")
        body = await request.json()
        msgs = []
        if body.get("system"):
            sys_c = body["system"]
            if isinstance(sys_c, list):
                sys_c = "".join(
                    p.get("text", "") for p in sys_c if p.get("type") == "text"
                )
            msgs.append({"role": "system", "content": sys_c})
        for m in body.get("messages", []):
            content = m.get("content")
            if isinstance(content, list):
                content = "".join(
                    p.get("text", "") for p in content if p.get("type") == "text"
                )
            msgs.append({"role": m["role"], "content": content})
        try:
            prompt = state.tokenizer.apply_chat_template(
                msgs, tokenize=False, add_generation_prompt=True
            )
        except Exception as e:
            return web.json_response(
                {"type": "error", "error": {"type": "invalid_request_error",
                                            "message": str(e)}},
                status=400,
            )
        sp = {
            "max_new_tokens": body.get("max_tokens", 128),
            "temperature": body.get("temperature", 1.0),
            "top_p": body.get("top_p", 1.0),
            "top_k": body.get("top_k", -1),
            "stop": body.get("stop_sequences"),
        }
        import uuid as _uuid

        mid = f"msg_{_uuid.uuid4().hex[:24]}"
        model = body.get("model", state.server_args.served_model_name)

        def _stop_reason(out):
            return {
                "length": "max_tokens",
                "stop": "stop_sequence"
                if body.get("stop_sequences")
                else "end_turn",
                "abort": "end_turn",
            }.get(out.finish_reason.kind if out.finish_reason else "stop", "end_turn")

        if body.get("stream"):
            # Anthropic SSE event protocol: message_start, content_block_*
            # deltas, message_delta (stop reason + usage), message_stop.
            treq = state.tm.tokenize(
                GenerateReqInput(text=prompt, sampling_params=sp, stream=True)
            )
            resp = web.StreamResponse(
                headers={"Content-Type": "text/event-stream"}
            )
            await resp.prepare(request)

            async def ev(name, data):
                await resp.write(
                    f"event: {name}\ndata: {json.dumps(data)}\n\n".encode()
                )

            await ev(
                "message_start",
                {
                    "type": "message_start",
                    "message": {
                        "id": mid, "type": "message", "role": "assistant",
                        "model": model, "content": [],
                        "stop_reason": None, "stop_sequence": None,
                        "usage": {"input_tokens": 0, "output_tokens": 0},
                    },
                },
            )
            await ev(
                "content_block_start",
                {
                    "type": "content_block_start", "index": 0,
                    "content_block": {"type": "text", "text": ""},
                },
            )
            final = None
            async for out in state.tm.generate_request(treq):
                final = out
                if out.new_text:
                    await ev(
                        "content_block_delta",
                        {
                            "type": "content_block_delta", "index": 0,
                            "delta": {"type": "text_delta", "text": out.new_text},
                        },
                    )
            await ev("content_block_stop", {"type": "content_block_stop", "index": 0})
            await ev(
                "message_delta",
                {
                    "type": "message_delta",
                    "delta": {
                        "stop_reason": _stop_reason(final) if final else "end_turn",
                        "stop_sequence": None,
                    },
                    "usage": {
                        "output_tokens": final.completion_tokens if final else 0
                    },
                },
            )
            await ev("message_stop", {"type": "message_stop"})
            await resp.write_eof()
            return resp

        treq = state.tm.tokenize(
            GenerateReqInput(text=prompt, sampling_params=sp)
        )
        out = await _collect_raw(state, treq)
        stop_reason = _stop_reason(out)

        return web.json_response(
            {
                "id": f"msg_{_uuid.uuid4().hex[:24]}",
                "type": "message",
                "role": "assistant",
                "model": body.get("model", state.server_args.served_model_name),
                "content": [{"type": "text", "text": out.output_str}],
                "stop_reason": stop_reason,
                "stop_sequence": None,
                "usage": {
                    "input_tokens": out.prompt_tokens,
                    "output_tokens": out.completion_tokens,
                },
            }
        )

    async def ollama_generate(request):
        """Ollama /api/generate compat (reference Ollama routes)."""
        body = await request.json()
        sp = {
            "max_new_tokens": (body.get("options") or {}).get("num_predict", 128),
            "temperature": (body.get("options") or {}).get("temperature", 1.0),
        }
        treq = state.tm.tokenize(
            GenerateReqInput(text=body.get("prompt", ""), sampling_params=sp)
        )
        out = await _collect_raw(state, treq)
        return web.json_response(
            {
                "model": body.get("model", state.server_args.served_model_name),
                "response": out.output_str,
                "done": True,
                "done_reason": "stop",
                "prompt_eval_count": out.prompt_tokens,
                "eval_count": out.completion_tokens,
            }
        )

    async def ollama_chat(request):
        body = await request.json()
        msgs = body.get("messages", [])
        try:
            prompt = state.tokenizer.apply_chat_template(
                msgs, tokenize=False, add_generation_prompt=True
            )
        except Exception as e:
            return web.json_response({"error": str(e)}, status=400)
        sp = {
            "max_new_tokens": (body.get("options") or {}).get("num_predict", 128),
            "temperature": (body.get("options") or {}).get("temperature", 1.0),
        }
        treq = state.tm.tokenize(
            GenerateReqInput(text=prompt, sampling_params=sp)
        )
        out = await _collect_raw(state, treq)
        return web.json_response(
            {
                "model": body.get("model", state.server_args.served_model_name),
                "message": {"role": "assistant", "content": out.output_str},
                "done": True,
                "done_reason": "stop",
                "prompt_eval_count": out.prompt_tokens,
                "eval_count": out.completion_tokens,
            }
        )

    async def ollama_tags(request):
        return web.json_response(
            {
                "models": [
                    {
                        "name": state.server_args.served_model_name,
                        "model": state.server_args.served_model_name,
                        "details": {"family": "sglang_tpu"},
                    }
                ]
            }
        )

    # ------------------------------------------------------------ OpenAI

    async def v1_models(request):
        return web.json_response(
            {
                "object": "list",
                "data": [
                    {
                        "id": state.server_args.served_model_name,
                        "object": "model",
                        "created": now(),
                        "owned_by": "sglang_tpu",
                    }
                ],
            }
        )

    async def v1_completions(request):
        if not _auth_ok(state, request):
            return web.Response(status=401, text="unauthorized")
        req = CompletionRequest(**await request.json())
        prompts = req.prompt if isinstance(req.prompt, list) else [req.prompt]
        if prompts and isinstance(prompts[0], int):
            prompts = [prompts]  # token-id prompt
        cid = completion_id()
        created = now()

        def make_gri(p, idx):
            if isinstance(p, str):
                return GenerateReqInput(
                    text=p, sampling_params=req.to_sampling_dict(), stream=req.stream
                )
            return GenerateReqInput(
                input_ids=p, sampling_params=req.to_sampling_dict(), stream=req.stream
            )

        if req.stream:
            if len(prompts) != 1:
                return web.json_response(
                    {"error": "stream supports a single prompt"}, status=400
                )
            treq = state.tm.tokenize(make_gri(prompts[0], 0))
            resp = web.StreamResponse(
                headers={"Content-Type": "text/event-stream"}
            )
            await resp.prepare(request)
            usage = None
            async for out in state.tm.generate_request(treq):
                chunk = {
                    "id": cid,
                    "object": "text_completion",
                    "created": created,
                    "model": req.model or state.server_args.served_model_name,
                    "choices": [
                        {
                            "index": 0,
                            "text": out.new_text,
                            "finish_reason": _oai_finish(out),
                            "logprobs": None,
                        }
                    ],
                }
                usage = usage_dict(out.prompt_tokens, out.completion_tokens, out.cached_tokens)
                await resp.write(_sse(chunk))
            if req.stream_options_include_usage():
                await resp.write(_sse({"id": cid, "object": "text_completion", "created": created, "model": req.model, "choices": [], "usage": usage}))
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp

        outs = await asyncio.gather(
            *(
                _collect_raw(state, state.tm.tokenize(make_gri(p, i)))
                for i, p in enumerate(prompts)
            )
        )
        choices = []
        pt = ct = cached = 0
        for i, out in enumerate(outs):
            text = out.output_str
            if req.echo and isinstance(prompts[i], str):
                text = prompts[i] + text
            choices.append(
                {
                    "index": i,
                    "text": text,
                    "finish_reason": _oai_finish(out) or "stop",
                    "logprobs": None,
                }
            )
            pt += out.prompt_tokens
            ct += out.completion_tokens
            cached += out.cached_tokens
        return web.json_response(
            {
                "id": cid,
                "object": "text_completion",
                "created": created,
                "model": req.model or state.server_args.served_model_name,
                "choices": choices,
                "usage": usage_dict(pt, ct, cached),
            }
        )

    async def v1_responses(request):
        """OpenAI Responses API (reference `entrypoints/openai/
        serving_responses.py`): `input` is a string or message list,
        `instructions` becomes the system message; streaming emits
        response.created / response.output_text.delta /
        response.completed SSE events."""
        if not _auth_ok(state, request):
            return web.Response(status=401, text="unauthorized")
        body = await request.json()
        conv_field = body.get("conversation")
        conv_id = (
            conv_field.get("id")
            if isinstance(conv_field, dict)
            else conv_field
        )
        prev_id = body.get("previous_response_id")
        if conv_id and prev_id:
            return web.json_response(
                {
                    "error": "conversation and previous_response_id are "
                    "mutually exclusive"
                },
                status=400,
            )
        messages = []
        if body.get("instructions"):
            messages.append({"role": "system", "content": body["instructions"]})
        if conv_id:
            ctx = state.conversations.messages_for_context(conv_id)
            if ctx is None:
                return web.json_response(
                    {"error": f"conversation {conv_id} not found"}, status=404
                )
            messages.extend(ctx)
        elif prev_id:
            prior = state.responses.get(prev_id)
            if prior is None:
                return web.json_response(
                    {"error": f"response {prev_id} not found"}, status=404
                )
            messages.extend(prior["messages"])
        inp = body.get("input", "")
        input_messages = []  # the NEW turn (written back to the conversation)
        if isinstance(inp, str):
            input_messages.append({"role": "user", "content": inp})
        else:
            for m in inp:
                content = m.get("content", "")
                if isinstance(content, list):
                    content = "".join(
                        p.get("text", "")
                        for p in content
                        if p.get("type") in ("input_text", "output_text", "text")
                    )
                input_messages.append(
                    {"role": m.get("role", "user"), "content": content}
                )
        messages.extend(input_messages)
        mcp_specs = [
            t
            for t in (body.get("tools") or [])
            if isinstance(t, dict) and t.get("type") == "mcp"
        ]
        if mcp_specs and not getattr(
            state.server_args, "enable_request_mcp", False
        ):
            return web.json_response(
                {
                    "error": "mcp tools are disabled "
                    "(start the server with --enable-request-mcp)"
                },
                status=400,
            )
        sp = {
            "max_new_tokens": body.get("max_output_tokens")
            or body.get("max_tokens")
            or 1024,
            "temperature": body.get("temperature", 1.0),
            "top_p": body.get("top_p", 1.0),
        }
        stream = bool(body.get("stream"))
        rid = f"resp_{uuid.uuid4().hex[:24]}"
        mid = f"msg_{uuid.uuid4().hex[:24]}"
        model = body.get("model") or state.server_args.served_model_name
        created = now()
        usage = {"input_tokens": 0, "output_tokens": 0}

        def _template(msgs):
            return state.tokenizer.apply_chat_template(
                msgs, tokenize=False, add_generation_prompt=True
            )

        def _final(text, extra_items=()):
            return {
                "id": rid,
                "object": "response",
                "created_at": created,
                "model": model,
                "status": "completed",
                "output": list(extra_items)
                + [
                    {
                        "type": "message",
                        "id": mid,
                        "role": "assistant",
                        "status": "completed",
                        "content": [
                            {"type": "output_text", "text": text, "annotations": []}
                        ],
                    }
                ],
                "usage": {
                    "input_tokens": usage["input_tokens"],
                    "output_tokens": usage["output_tokens"],
                    "total_tokens": usage["input_tokens"]
                    + usage["output_tokens"],
                },
            }

        def _persist(text, response):
            """Response-store + conversation write-back (reference gateway
            persists the turn after completion)."""
            if body.get("store", True):
                state.responses.put(
                    rid,
                    response,
                    messages + [{"role": "assistant", "content": text}],
                )
            if conv_id:
                from sglang_tpu.entrypoints.conversations import (
                    normalize_item,
                )

                items = []
                for m in input_messages:
                    it, _ = normalize_item(m)
                    if it:
                        items.append(it)
                it, _ = normalize_item(
                    {"role": "assistant", "content": text, "id": mid}
                )
                if it:
                    items.append(it)
                state.conversations.add_items(conv_id, items)

        async def _gen(msgs):
            try:
                prompt = _template(msgs)
            except Exception as e:
                raise ValueError(f"chat template: {e}")
            treq = state.tm.tokenize(
                GenerateReqInput(text=prompt, sampling_params=sp)
            )
            out = await _collect_raw(state, treq)
            usage["input_tokens"] += out.prompt_tokens
            usage["output_tokens"] += out.completion_tokens
            return out

        if mcp_specs:
            if stream:
                return web.json_response(
                    {"error": "stream with mcp tools is not supported"},
                    status=400,
                )
            from sglang_tpu.mcp.loop import run_mcp_loop

            async def _gen_text(msgs):
                return (await _gen(msgs)).output_str

            try:
                text, items, _ = await run_mcp_loop(
                    _gen_text,
                    messages,
                    mcp_specs,
                    tool_format=state.server_args.tool_call_parser or "hermes",
                    max_tool_calls=int(body.get("max_tool_calls", 10)),
                )
            except ValueError as e:
                return web.json_response({"error": str(e)}, status=400)
            except Exception as e:
                return web.json_response(
                    {"error": f"mcp: {e}"}, status=502
                )
            response = _final(text, extra_items=items)
            _persist(text, response)
            return web.json_response(response)

        try:
            prompt = _template(messages)
        except Exception as e:
            return web.json_response({"error": f"chat template: {e}"}, status=400)
        gri = GenerateReqInput(text=prompt, sampling_params=sp, stream=stream)
        treq = state.tm.tokenize(gri)

        if not stream:
            out = await _collect_raw(state, treq)
            usage["input_tokens"] += out.prompt_tokens
            usage["output_tokens"] += out.completion_tokens
            response = _final(out.output_str)
            _persist(out.output_str, response)
            return web.json_response(response)
        resp = web.StreamResponse(headers={"Content-Type": "text/event-stream"})
        await resp.prepare(request)

        async def ev(name, data):
            await resp.write(
                f"event: {name}\ndata: {json.dumps(data)}\n\n".encode()
            )

        await ev(
            "response.created",
            {"type": "response.created", "response": {"id": rid, "object": "response", "status": "in_progress", "model": model}},
        )
        text = ""
        last = None
        async for out in state.tm.generate_request(treq):
            last = out
            if out.new_text:
                text += out.new_text
                await ev(
                    "response.output_text.delta",
                    {
                        "type": "response.output_text.delta",
                        "item_id": mid,
                        "output_index": 0,
                        "content_index": 0,
                        "delta": out.new_text,
                    },
                )
        await ev(
            "response.output_text.done",
            {
                "type": "response.output_text.done",
                "item_id": mid,
                "output_index": 0,
                "content_index": 0,
                "text": text,
            },
        )
        if last is not None:
            usage["input_tokens"] += last.prompt_tokens
            usage["output_tokens"] += last.completion_tokens
        final = _final(text)
        _persist(text, final)
        await ev(
            "response.completed",
            {"type": "response.completed", "response": final},
        )
        await resp.write_eof()
        return resp

    # ------------------------------------------------ /v1/conversations
    # Reference `sgl-model-gateway/src/routers/conversations/handlers.rs`

    async def conv_create(request):
        if not _auth_ok(state, request):
            return web.Response(status=401, text="unauthorized")
        from sglang_tpu.entrypoints.conversations import (
            normalize_item,
            validate_metadata,
        )

        body = await request.json() if request.can_read_body else {}
        md, err = validate_metadata(body.get("metadata"))
        if err:
            return web.json_response({"error": err}, status=400)
        conv = state.conversations.create(md)
        items = []
        for raw in body.get("items") or []:
            it, err = normalize_item(raw)
            if err:
                return web.json_response({"error": err}, status=400)
            items.append(it)
        if items:
            state.conversations.add_items(conv["id"], items)
        return web.json_response(conv)

    async def conv_get(request):
        if not _auth_ok(state, request):
            return web.Response(status=401, text="unauthorized")
        conv = state.conversations.get(request.match_info["conv_id"])
        if conv is None:
            return web.json_response({"error": "not found"}, status=404)
        return web.json_response(conv)

    async def conv_update(request):
        if not _auth_ok(state, request):
            return web.Response(status=401, text="unauthorized")
        from sglang_tpu.entrypoints.conversations import validate_metadata

        body = await request.json()
        patch = body.get("metadata")
        if patch is None or not isinstance(patch, dict):
            return web.json_response(
                {"error": "metadata object required"}, status=400
            )
        # values must be strings (None deletes the key)
        checkable = {k: v for k, v in patch.items() if v is not None}
        _, err = validate_metadata(checkable)
        if err:
            return web.json_response({"error": err}, status=400)
        conv = state.conversations.update_metadata(
            request.match_info["conv_id"], patch
        )
        if conv is None:
            return web.json_response({"error": "not found"}, status=404)
        return web.json_response(conv)

    async def conv_delete(request):
        if not _auth_ok(state, request):
            return web.Response(status=401, text="unauthorized")
        cid = request.match_info["conv_id"]
        if not state.conversations.delete(cid):
            return web.json_response({"error": "not found"}, status=404)
        return web.json_response(
            {"id": cid, "object": "conversation.deleted", "deleted": True}
        )

    async def conv_items_list(request):
        if not _auth_ok(state, request):
            return web.Response(status=401, text="unauthorized")
        q = request.rel_url.query
        out = state.conversations.list_items(
            request.match_info["conv_id"],
            limit=int(q.get("limit", 100)),
            order=q.get("order", "asc"),
            after=q.get("after"),
        )
        if out is None:
            return web.json_response({"error": "not found"}, status=404)
        return web.json_response(out)

    async def conv_items_create(request):
        if not _auth_ok(state, request):
            return web.Response(status=401, text="unauthorized")
        from sglang_tpu.entrypoints.conversations import normalize_item

        body = await request.json()
        items = []
        for raw in body.get("items") or []:
            it, err = normalize_item(raw)
            if err:
                return web.json_response({"error": err}, status=400)
            items.append(it)
        created = state.conversations.add_items(
            request.match_info["conv_id"], items
        )
        if created is None:
            return web.json_response({"error": "not found"}, status=404)
        return web.json_response(
            {
                "object": "list",
                "data": created,
                "first_id": created[0]["id"] if created else None,
                "last_id": created[-1]["id"] if created else None,
                "has_more": False,
            }
        )

    async def conv_item_get(request):
        if not _auth_ok(state, request):
            return web.Response(status=401, text="unauthorized")
        it = state.conversations.get_item(
            request.match_info["conv_id"], request.match_info["item_id"]
        )
        if it is None:
            return web.json_response({"error": "not found"}, status=404)
        return web.json_response(it)

    async def conv_item_delete(request):
        if not _auth_ok(state, request):
            return web.Response(status=401, text="unauthorized")
        conv = state.conversations.delete_item(
            request.match_info["conv_id"], request.match_info["item_id"]
        )
        if conv is None:
            return web.json_response({"error": "not found"}, status=404)
        return web.json_response(conv)

    async def get_response(request):
        """GET /v1/responses/{id} from the response store."""
        if not _auth_ok(state, request):
            return web.Response(status=401, text="unauthorized")
        e = state.responses.get(request.match_info["resp_id"])
        if e is None:
            return web.json_response({"error": "not found"}, status=404)
        return web.json_response(e["response"])

    async def diffusion_generate(request):
        """dLLM block-diffusion decode (reference srt/dllm/): POST
        {text|input_ids, max_new_tokens, block_size, threshold, mask_id,
        algorithm}."""
        if not _auth_ok(state, request):
            return web.Response(status=401, text="unauthorized")
        body = await request.json()
        try:
            out = await state.tm.run_on_scheduler(
                lambda: state.engine.diffusion_generate(
                    input_ids=body.get("input_ids"),
                    text=body.get("text"),
                    max_new_tokens=int(body.get("max_new_tokens", 64)),
                    block_size=int(body.get("block_size", 32)),
                    mask_id=body.get("mask_id"),
                    threshold=float(body.get("threshold", 0.95)),
                    algorithm=body.get("algorithm", "low_confidence"),
                )
            )
        except (ValueError, RuntimeError) as e:
            return web.json_response({"error": str(e)}, status=400)
        return web.json_response(out)

    async def v1_audio_transcriptions(request):
        """Reference `/v1/audio/transcriptions`
        (`srt/entrypoints/http_server.py:1583`): multipart form with a
        `file` field (16-bit PCM WAV) — or JSON `{"audio": <base64 wav>}` —
        transcribed by the loaded whisper-class model."""
        if not _auth_ok(state, request):
            return web.Response(status=401, text="unauthorized")
        if not getattr(state.engine, "is_audio_model", False):
            return web.json_response(
                {
                    "error": {
                        "message": "the loaded model is not audio-capable "
                        "(audio transcription requires a whisper-class "
                        "model)",
                        "type": "invalid_request_error",
                    }
                },
                status=400,
            )
        audio = None
        temperature = 0.0
        ctype = request.headers.get("Content-Type", "")
        if ctype.startswith("multipart/"):
            reader = await request.multipart()
            async for part in reader:
                if part.name == "file":
                    audio = await part.read(decode=False)
                elif part.name == "temperature":
                    temperature = float((await part.text()) or 0.0)
        else:
            import base64

            body = await request.json()
            if body.get("audio"):
                audio = base64.b64decode(body["audio"])
            temperature = float(body.get("temperature", 0.0))
        if not audio:
            return web.json_response(
                {"error": {"message": "no audio provided"}}, status=400
            )
        try:
            out = await asyncio.get_running_loop().run_in_executor(
                None,
                lambda: state.engine.transcribe(
                    audio_bytes=audio, temperature=temperature
                ),
            )
        except ValueError as e:
            return web.json_response(
                {"error": {"message": str(e)}}, status=400
            )
        text = out["text"]
        if text is None:
            # no tokenizer loaded (tiny/test checkpoints): ids as text
            text = " ".join(str(i) for i in out["token_ids"])
        return web.json_response({"text": text})

    async def v1_chat_completions(request):
        if not _auth_ok(state, request):
            return web.Response(status=401, text="unauthorized")
        req = ChatCompletionRequest(**await request.json())
        try:
            images = _extract_images(req.messages)
        except ValueError as e:
            return web.json_response({"error": str(e)}, status=400)
        cid = chat_id()
        created = now()
        if images:
            # multimodal chat: the model's AutoProcessor expands image
            # placeholders and produces pixel inputs; vision encoding runs
            # on the pump thread (no concurrent device dispatch)
            try:
                treq = await state.tm.run_on_scheduler(
                    lambda: state.build_mm_request(req, images)
                )
            except Exception as e:
                return web.json_response({"error": str(e)}, status=400)
        else:
            try:
                prompt = state.apply_chat_template(req.messages, tools=req.tools)
            except Exception as e:
                return web.json_response(
                    {"error": f"chat template: {e}"}, status=400
                )
            gri = GenerateReqInput(
                text=prompt,
                sampling_params=req.to_sampling_dict(),
                stream=req.stream,
            )
            treq = state.tm.tokenize(gri)
        model = req.model or state.server_args.served_model_name

        if req.stream:
            resp = web.StreamResponse(headers={"Content-Type": "text/event-stream"})
            await resp.prepare(request)
            first = True
            usage = None
            tool_stream = None
            if req.tools and state.server_args.tool_call_parser:
                from sglang_tpu.parser.function_call import (
                    StreamingFunctionCallParser,
                )

                tool_stream = StreamingFunctionCallParser(
                    req.tools, state.server_args.tool_call_parser
                )

            def _chunk(delta, finish):
                return {
                    "id": cid,
                    "object": "chat.completion.chunk",
                    "created": created,
                    "model": model,
                    "choices": [
                        {"index": 0, "delta": delta, "finish_reason": finish}
                    ],
                }

            async for out in state.tm.generate_request(treq):
                delta = {}
                if first:
                    delta["role"] = "assistant"
                    first = False
                text = out.new_text
                if tool_stream is not None:
                    text, call_deltas = tool_stream.push(out.new_text or "")
                    if out.finished:
                        tail, tail_calls = tool_stream.finish()
                        text += tail
                        call_deltas = call_deltas + tail_calls
                    if call_deltas:
                        delta["tool_calls"] = call_deltas
                if text:
                    delta["content"] = text
                finish = _oai_finish(out)
                if finish and tool_stream is not None and tool_stream.seen_call:
                    finish = "tool_calls"
                usage = usage_dict(out.prompt_tokens, out.completion_tokens, out.cached_tokens)
                await resp.write(_sse(_chunk(delta, finish)))
            if req.stream_options and req.stream_options.get("include_usage"):
                await resp.write(
                    _sse(
                        {
                            "id": cid,
                            "object": "chat.completion.chunk",
                            "created": created,
                            "model": model,
                            "choices": [],
                            "usage": usage,
                        }
                    )
                )
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp

        out = await _collect_raw(state, treq)
        content = out.output_str
        message = {"role": "assistant", "content": content}
        finish = _oai_finish(out) or "stop"
        if state.server_args.reasoning_parser:
            from sglang_tpu.parser.reasoning_parser import ReasoningParser

            r = ReasoningParser(state.server_args.reasoning_parser).parse(content)
            message["content"] = r.content
            if r.reasoning:
                message["reasoning_content"] = r.reasoning
        if req.tools and state.server_args.tool_call_parser:
            from sglang_tpu.parser.function_call import FunctionCallParser

            parser = FunctionCallParser(
                req.tools, state.server_args.tool_call_parser
            )
            if parser.has_tool_call(message["content"] or ""):
                normal, calls = parser.parse_non_stream(message["content"])
                if calls:
                    message["content"] = normal or None
                    message["tool_calls"] = calls
                    finish = "tool_calls"
        return web.json_response(
            {
                "id": cid,
                "object": "chat.completion",
                "created": created,
                "model": model,
                "choices": [
                    {
                        "index": 0,
                        "message": message,
                        "finish_reason": finish,
                    }
                ],
                "usage": usage_dict(
                    out.prompt_tokens, out.completion_tokens, out.cached_tokens
                ),
            }
        )

    async def v1_embeddings(request):
        if not _auth_ok(state, request):
            return web.Response(status=401, text="unauthorized")
        body = await request.json()
        inputs = body.get("input")
        if isinstance(inputs, str):
            inputs = [inputs]
        try:
            if inputs and isinstance(inputs[0], int):  # token-id input
                outs = await state.tm.run_on_scheduler(
                    lambda: [state.engine.encode(input_ids=inputs)]
                )
            elif inputs and isinstance(inputs[0], list):
                outs = await state.tm.run_on_scheduler(
                    lambda: state.engine.encode(input_ids=inputs)
                )
            else:
                outs = await state.tm.run_on_scheduler(
                    lambda: state.engine.encode(prompt=inputs)
                )
        except (ValueError, RuntimeError) as e:
            return web.json_response({"error": str(e)}, status=400)
        data = [
            {"object": "embedding", "index": i, "embedding": o["embedding"]}
            for i, o in enumerate(outs)
        ]
        pt = sum(o["meta_info"]["prompt_tokens"] for o in outs)
        return web.json_response(
            {
                "object": "list",
                "data": data,
                "model": body.get("model", state.server_args.served_model_name),
                "usage": {"prompt_tokens": pt, "total_tokens": pt},
            }
        )

    async def open_session(request):
        body = await request.json() if request.can_read_body else {}
        sid = state.engine.open_session(body.get("capacity_of_str_len"))
        return web.json_response({"session_id": sid})

    async def close_session(request):
        body = await request.json()
        ok = state.engine.close_session(body.get("session_id", ""))
        return web.json_response({"success": ok}, status=200 if ok else 404)

    async def load_lora(request):
        body = await request.json()
        try:
            slot = await state.tm.run_on_scheduler(
                lambda: state.engine.load_lora_adapter(
                    body["lora_name"], body["lora_path"]
                )
            )
            return web.json_response({"success": True, "slot": slot})
        except Exception as e:
            return web.json_response({"error": str(e)}, status=400)

    async def unload_lora(request):
        body = await request.json()
        ok = await state.tm.run_on_scheduler(
            lambda: state.engine.unload_lora_adapter(body.get("lora_name", ""))
        )
        return web.json_response({"success": ok})

    async def update_weights_from_disk(request):
        body = await request.json()
        try:
            await state.tm.run_on_scheduler(
                lambda: state.engine.update_weights_from_disk(body["model_path"])
            )
            return web.json_response({"success": True})
        except Exception as e:
            return web.json_response(
                {"success": False, "error": str(e)}, status=400
            )

    async def release_memory(request):
        try:
            await state.tm.run_on_scheduler(
                state.engine.release_memory_occupation
            )
            return web.json_response({"success": True})
        except Exception as e:
            return web.json_response(
                {"success": False, "error": str(e)}, status=409
            )

    async def resume_memory(request):
        await state.tm.run_on_scheduler(state.engine.resume_memory_occupation)
        return web.json_response({"success": True})

    async def init_weights_update_group(request):
        # reference /init_weights_update_group: here it opens the TCP
        # weight-sync receiver and returns its port for the trainer
        body = await request.json()
        port = state.engine.init_weights_update_group(
            host=body.get("host", "0.0.0.0"), port=int(body.get("port", 0))
        )
        return web.json_response({"success": True, "port": port})

    async def update_weights_from_distributed(request):
        body = await request.json()
        import asyncio as _aio

        ok = await _aio.get_running_loop().run_in_executor(
            None,
            lambda: state.engine.update_weights_from_distributed(
                version=int(body.get("version", 1)),
                timeout=float(body.get("timeout", 120.0)),
            ),
        )
        return web.json_response({"success": ok}, status=200 if ok else 408)

    async def v1_score(request):
        body = await request.json()
        prompt = body.get("prompt", body.get("query", ""))
        choices = body.get("choices", body.get("items", []))
        try:
            scores = await state.tm.run_on_scheduler(
                lambda: state.engine.score(prompt, choices)
            )
            return web.json_response({"scores": scores})
        except Exception as e:
            return web.json_response({"error": str(e)}, status=400)

    async def v1_rerank(request):
        """Likelihood-based reranking (reference /v1/rerank): score each
        document's average per-token logprob given the query, return
        results sorted by relevance."""
        body = await request.json()
        query = body.get("query", "")
        docs = body.get("documents", [])
        try:
            scores = await state.tm.run_on_scheduler(
                lambda: state.engine.score(query, docs)
            )
        except Exception as e:
            return web.json_response({"error": str(e)}, status=400)
        results = sorted(
            (
                {
                    "index": i,
                    "relevance_score": s_,
                    "document": {"text": d},
                }
                for i, (d, s_) in enumerate(zip(docs, scores))
            ),
            key=lambda r_: -r_["relevance_score"],
        )
        return web.json_response(
            {
                "model": body.get("model", state.server_args.served_model_name),
                "results": results,
            }
        )

    async def start_profile(request):
        """jax.profiler trace capture (reference `/start_profile` ->
        torch.profiler; xplane traces viewable in TensorBoard/XProf)."""
        body = await request.json() if request.can_read_body else {}
        outdir = body.get("output_dir", "/tmp/sglang_tpu_profile")
        try:
            import jax

            jax.profiler.start_trace(outdir)
            return web.json_response({"success": True, "output_dir": outdir})
        except Exception as e:
            return web.json_response({"error": str(e)}, status=400)

    async def stop_profile(request):
        try:
            import jax

            jax.profiler.stop_trace()
            return web.json_response({"success": True})
        except Exception as e:
            return web.json_response({"error": str(e)}, status=400)

    r.add_post("/start_profile", start_profile)
    r.add_post("/stop_profile", stop_profile)
    r.add_post("/v1/score", v1_score)
    r.add_post("/v1/rerank", v1_rerank)
    r.add_post("/update_weights_from_disk", update_weights_from_disk)
    r.add_post("/release_memory_occupation", release_memory)
    r.add_post("/resume_memory_occupation", resume_memory)
    r.add_post("/load_lora_adapter", load_lora)
    r.add_post("/unload_lora_adapter", unload_lora)
    r.add_get("/health", health)
    r.add_post("/open_session", open_session)
    r.add_post("/close_session", close_session)
    r.add_post("/v1/embeddings", v1_embeddings)
    r.add_post("/encode", v1_embeddings)
    r.add_get("/health_generate", health_generate)
    r.add_get("/get_model_info", get_model_info)
    r.add_get("/get_server_info", get_server_info)
    r.add_get("/metrics", metrics)
    r.add_post("/init_weights_update_group", init_weights_update_group)
    r.add_post(
        "/update_weights_from_distributed", update_weights_from_distributed
    )
    r.add_post("/flush_cache", flush_cache)
    r.add_post("/pause_generation", pause_generation)
    r.add_post("/continue_generation", continue_generation)
    r.add_post("/abort_request", abort_request)
    r.add_post("/generate", generate)
    r.add_post("/v1/messages", v1_messages)
    r.add_post("/api/generate", ollama_generate)
    r.add_post("/api/chat", ollama_chat)
    r.add_get("/api/tags", ollama_tags)
    r.add_get("/v1/models", v1_models)
    r.add_post("/v1/completions", v1_completions)
    r.add_post("/v1/chat/completions", v1_chat_completions)
    r.add_post("/v1/responses", v1_responses)
    r.add_get("/v1/responses/{resp_id}", get_response)
    r.add_post("/v1/conversations", conv_create)
    r.add_get("/v1/conversations/{conv_id}", conv_get)
    r.add_post("/v1/conversations/{conv_id}", conv_update)
    r.add_delete("/v1/conversations/{conv_id}", conv_delete)
    r.add_get("/v1/conversations/{conv_id}/items", conv_items_list)
    r.add_post("/v1/conversations/{conv_id}/items", conv_items_create)
    r.add_get(
        "/v1/conversations/{conv_id}/items/{item_id}", conv_item_get
    )
    r.add_delete(
        "/v1/conversations/{conv_id}/items/{item_id}", conv_item_delete
    )
    r.add_post("/diffusion_generate", diffusion_generate)
    r.add_post("/v1/audio/transcriptions", v1_audio_transcriptions)
    return app


def _native_dict(out) -> dict:
    return {
        "text": out.output_str,
        "output_ids": out.output_ids,
        "meta_info": {
            "id": out.rid,
            "finish_reason": out.finish_reason.to_json() if out.finish_reason else None,
            "prompt_tokens": out.prompt_tokens,
            "completion_tokens": out.completion_tokens,
            "cached_tokens": out.cached_tokens,
            **(
                {"output_token_logprobs": out.output_token_logprobs}
                if out.output_token_logprobs is not None
                else {}
            ),
        },
    }


async def _collect_raw(state: ServerState, treq):
    last = None
    async for out in state.tm.generate_request(treq):
        last = out
    return last


async def _collect(state: ServerState, treq) -> dict:
    return _native_dict(await _collect_raw(state, treq))


def _oai_finish(out) -> Optional[str]:
    if not out.finished or out.finish_reason is None:
        return None
    kind = out.finish_reason.kind
    return {"stop": "stop", "length": "length", "abort": "abort"}.get(kind, "stop")


# patch helper used above (CompletionRequest has no stream_options field)
def _include_usage(self) -> bool:
    return False


CompletionRequest.stream_options_include_usage = _include_usage


def launch_server(server_args: ServerArgs):
    configure_logger(server_args.log_level.upper())
    state = ServerState(server_args)
    # gRPC OpenAI pass-through RPCs re-enter the HTTP app over loopback
    state.http_base_url = f"http://127.0.0.1:{server_args.port}"
    app = build_app(state)
    if server_args.grpc_port:
        from sglang_tpu.entrypoints.grpc_server import build_grpc_server

        async def _start_grpc(app):
            g = build_grpc_server(state, server_args.host, server_args.grpc_port)
            await g.start()
            app["grpc_server"] = g
            logger.info("grpc listening on :%d", server_args.grpc_port)

        async def _stop_grpc(app):
            await app["grpc_server"].stop(1.0)

        app.on_startup.append(_start_grpc)
        app.on_cleanup.append(_stop_grpc)
    logger.info(
        "server listening on %s:%d", server_args.host, server_args.port
    )
    web.run_app(
        app, host=server_args.host, port=server_args.port, print=None
    )


def main():
    import argparse

    parser = argparse.ArgumentParser(description="sglang_tpu HTTP server")
    ServerArgs.add_cli_args(parser)
    args = parser.parse_args()
    launch_server(ServerArgs.from_cli_args(args))


if __name__ == "__main__":
    main()
