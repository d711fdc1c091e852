"""Offline Python engine API.

Parity with reference `srt/entrypoints/engine.py:178 class Engine`
(`generate:314` building a `GenerateReqInput` and driving the tokenizer
manager). TPU-native difference: no subprocess tree (`_launch_subprocesses`
`:740`) — the engine, scheduler, and model live in ONE process per host
because JAX is multi-controller; `Engine.generate` pumps `Scheduler.step()`
directly.
"""

from __future__ import annotations

import time
import uuid
from typing import Any, Dict, Iterator, List, Optional, Union

import numpy as np

from sglang_tpu.managers.io_struct import (
    GenerateReqInput,
    ReqStrOutput,
    TokenizedGenerateReqInput,
)
from sglang_tpu.managers.scheduler import Scheduler
from sglang_tpu.model_executor.model_runner import ModelRunner
from sglang_tpu.sampling.sampling_params import SamplingParams
from sglang_tpu.server_args import ServerArgs
from sglang_tpu.utils import configure_logger, get_logger

logger = get_logger(__name__)


def _load_tokenizer(server_args: ServerArgs):
    if server_args.skip_tokenizer_init:
        return None
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(
        server_args.tokenizer_path,
        trust_remote_code=server_args.trust_remote_code,
        revision=server_args.revision,
    )


class Engine:
    """In-process serving engine: tokenize -> schedule -> detokenize."""

    def __init__(self, server_args: Optional[ServerArgs] = None, **kwargs):
        if server_args is None:
            server_args = ServerArgs(**kwargs)
        configure_logger(server_args.log_level.upper())
        self.server_args = server_args
        from sglang_tpu.plugins import load_plugins

        self.plugins = load_plugins(server_args)
        self.tokenizer = _load_tokenizer(server_args)
        # audio (whisper-class) checkpoints run the dedicated encoder-
        # decoder transcription path, not the paged-KV scheduler
        # (reference: srt/models/whisper.py + /v1/audio/transcriptions)
        self.is_audio_model = False
        self.audio_model = None
        archs = _read_architectures(server_args.model_path)
        if "WhisperForConditionalGeneration" in archs:
            self._init_audio(server_args)
            return
        self.runner = ModelRunner(server_args)
        self.scheduler = Scheduler(server_args, self.runner, self.tokenizer)
        from sglang_tpu.managers.session import SessionManager

        self.sessions = SessionManager()
        self.tm = None  # lazy pump thread for the async API
        logger.info(
            "engine ready: %s, kv capacity %d tokens",
            server_args.model_path,
            self.runner.max_total_tokens,
        )

    # -------------------------------------------------------------- audio

    def _init_audio(self, server_args: ServerArgs) -> None:
        import json as _json
        import os as _os

        import jax.numpy as jnp

        from sglang_tpu.models.whisper import WhisperForConditionalGeneration

        with open(
            _os.path.join(server_args.model_path, "config.json")
        ) as f:
            cfg = _json.load(f)
        dtype = (
            jnp.bfloat16 if server_args.dtype == "bfloat16" else jnp.float32
        )
        self.audio_model = WhisperForConditionalGeneration(
            cfg, dtype=dtype
        ).load(server_args.model_path)
        self.is_audio_model = True
        self.runner = None
        self.scheduler = None
        self.sessions = None
        self.tm = None
        self._feature_extractor = None
        logger.info("audio engine ready: %s", server_args.model_path)

    def transcribe(
        self,
        audio_bytes: Optional[bytes] = None,
        mel: Optional[np.ndarray] = None,
        prompt_ids: Optional[List[int]] = None,
        max_new_tokens: int = 256,
        temperature: float = 0.0,
    ) -> Dict[str, Any]:
        """`/v1/audio/transcriptions` backend: WAV bytes (or precomputed
        log-mel features) -> token ids (+ text when a tokenizer is
        loaded)."""
        if not self.is_audio_model:
            raise ValueError("transcribe() requires a whisper-class model")
        if mel is None:
            if audio_bytes is None:
                raise ValueError("provide audio_bytes or mel")
            from sglang_tpu.entrypoints.audio import decode_wav

            pcm, sr = decode_wav(audio_bytes)
            if self._feature_extractor is None:
                from transformers import WhisperFeatureExtractor

                try:
                    self._feature_extractor = (
                        WhisperFeatureExtractor.from_pretrained(
                            self.server_args.model_path
                        )
                    )
                except OSError:
                    # no preprocessor config (test checkpoints): build one
                    # matching the model geometry — chunk length bounded so
                    # padded features fit max_source_positions
                    self._feature_extractor = WhisperFeatureExtractor(
                        feature_size=self.audio_model.n_mels,
                        chunk_length=max(
                            1, self.audio_model.max_source * 2 // 100
                        ),
                    )
            feats = self._feature_extractor(
                pcm, sampling_rate=sr, return_tensors="np"
            )
            mel = feats["input_features"][0]
        ids = self.audio_model.transcribe_ids(
            np.asarray(mel),
            prompt_ids=prompt_ids,
            max_new_tokens=max_new_tokens,
            temperature=temperature,
        )[0]
        text = None
        if self.tokenizer is not None:
            text = self.tokenizer.decode(ids, skip_special_tokens=True)
        return {"token_ids": ids, "text": text}

    # ------------------------------------------------------------ generate

    def generate(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        sampling_params: Optional[Union[Dict, List[Dict]]] = None,
        input_ids: Optional[Union[List[int], List[List[int]]]] = None,
        return_logprob: bool = False,
        top_logprobs_num: int = 0,
        stream: bool = False,
        rid: Optional[Union[str, List[str]]] = None,
        session_params: Optional[Dict] = None,
        lora_path: Optional[str] = None,
        image_data=None,
        input_embeds=None,
    ) -> Union[Dict, List[Dict], Iterator[Dict]]:
        """Synchronous generation (batch or single). With `stream=True` and a
        single prompt, returns an iterator of incremental dicts."""
        if self.is_audio_model:
            raise ValueError(
                "audio model: use Engine.transcribe / /v1/audio/transcriptions"
            )
        if getattr(self.runner.model, "is_encoder", False):
            raise ValueError(
                "encoder-only model: use Engine.encode / /v1/embeddings"
            )
        gri = GenerateReqInput(
            text=prompt,
            input_ids=input_ids,
            sampling_params=sampling_params,
            rid=rid,
            return_logprob=return_logprob,
            top_logprobs_num=top_logprobs_num,
            stream=stream,
            session_params=session_params,
            lora_path=lora_path,
            image_data=image_data,
            input_embeds=input_embeds,
        )
        was_batch = gri.is_batch()
        singles = gri.unbatch()
        treqs = [self._tokenize_one(g) for g in singles]
        session_id = (gri.session_params or {}).get("id")
        if session_id is not None:
            if was_batch or stream:
                raise ValueError("sessions support single non-stream requests")
            treqs[0].input_ids = self.sessions.prepare_input(
                session_id, treqs[0].input_ids
            )
        if stream and not was_batch:
            return self._stream_one(treqs[0])
        results = self._run_to_completion(treqs)
        outs = [self._to_dict(results[t.rid]) for t in treqs]
        if session_id is not None:
            self.sessions.commit_turn(
                session_id, treqs[0].input_ids + results[treqs[0].rid].output_ids
            )
        return outs if was_batch else outs[0]

    def _tokenize_one(self, g: GenerateReqInput) -> TokenizedGenerateReqInput:
        if g.input_embeds is not None:
            # embedding-level input (reference input_embeds): every prompt
            # row takes the given vector; token ids are placeholders, and
            # the request bypasses the prefix cache like any mm request
            import numpy as _np

            emb = _np.asarray(g.input_embeds, dtype=_np.float32)
            ids = list(g.input_ids) if g.input_ids is not None else [0] * len(emb)
            if len(ids) != len(emb):
                raise ValueError("input_embeds length must match input_ids")
            sp = (
                g.sampling_params
                if isinstance(g.sampling_params, SamplingParams)
                else SamplingParams.from_dict(g.sampling_params)
            )
            return TokenizedGenerateReqInput(
                rid=g.rid or uuid.uuid4().hex,
                input_ids=ids,
                sampling_params=sp,
                return_logprob=g.return_logprob,
                top_logprobs_num=g.top_logprobs_num,
                stream=g.stream,
                lora_path=g.lora_path,
                arrival_time=time.monotonic(),
                mm_embeds=emb,
                mm_positions=_np.arange(len(emb)),
            )
        if g.input_ids is not None:
            ids = list(g.input_ids)
        else:
            if self.tokenizer is None:
                raise ValueError("text input requires a tokenizer")
            ids = self.tokenizer.encode(g.text)
        sp = (
            g.sampling_params
            if isinstance(g.sampling_params, SamplingParams)
            else SamplingParams.from_dict(g.sampling_params)
        )
        mm_embeds = mm_positions = None
        mrope_positions = mrope_delta = None
        if g.image_data is not None:
            # per-model-family multimodal processors (reference
            # `srt/multimodal/processors/`): payload normalization, tower
            # dispatch, feature reassembly, placeholder/M-RoPE positions
            from sglang_tpu.multimodal import get_mm_processor

            proc = get_mm_processor(
                self.runner.model, self._encode_images, self.runner.params
            )
            res = proc.process(ids, g.image_data)
            mm_embeds = res.mm_embeds
            mm_positions = res.mm_positions
            mrope_positions = res.mrope_positions
            mrope_delta = res.mrope_delta
        return TokenizedGenerateReqInput(
            rid=g.rid or uuid.uuid4().hex,
            input_ids=ids,
            sampling_params=sp,
            return_logprob=g.return_logprob,
            top_logprobs_num=g.top_logprobs_num,
            stream=g.stream,
            lora_path=g.lora_path,
            arrival_time=time.monotonic(),
            mm_embeds=mm_embeds,
            mm_positions=mm_positions,
            mrope_positions=mrope_positions,
            mrope_delta=mrope_delta,
        )

    def _encode_images(self, pixel_values, grid_thw=None):
        """Vision encode — local tower, or the remote encode server when
        --encode-server-url is set (encode disaggregation, reference
        `srt/disaggregation/encode_server.py`)."""
        if self.server_args.encode_server_url:
            if not hasattr(self, "_encode_client"):
                from sglang_tpu.disaggregation.encode import EncodeClient

                self._encode_client = EncodeClient(
                    self.server_args.encode_server_url
                )
            return self._encode_client.encode(pixel_values, grid_thw=grid_thw)
        if grid_thw is not None:
            return self.runner.encode_images(pixel_values, grid_thw=grid_thw)
        return self.runner.encode_images(pixel_values)

    # -------------------------------------------------------------- async

    def _ensure_tm(self):
        """Lazily start the pump thread (TokenizerManager). Once live, ALL
        generation — sync included — routes through it, so the scheduler
        is only ever stepped from one thread."""
        if getattr(self, "tm", None) is None:
            from sglang_tpu.managers.tokenizer_manager import TokenizerManager

            self.tm = TokenizerManager(
                self.server_args, self.scheduler, self.tokenizer
            )
        return self.tm

    async def async_generate(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        sampling_params: Optional[Union[Dict, List[Dict]]] = None,
        input_ids: Optional[Union[List[int], List[List[int]]]] = None,
        stream: bool = False,
        rid: Optional[str] = None,
        lora_path: Optional[str] = None,
        image_data=None,
    ):
        """Asyncio-native generation (reference Engine.async_generate):
        awaitable single/batch results, or an async iterator of
        incremental dicts with stream=True (single prompt)."""
        tm = self._ensure_tm()
        gri = GenerateReqInput(
            text=prompt,
            input_ids=input_ids,
            sampling_params=sampling_params,
            rid=rid,
            stream=stream,
            lora_path=lora_path,
            image_data=image_data,
        )
        was_batch = gri.is_batch()
        singles = gri.unbatch()
        if image_data is not None or any(
            g.image_data is not None for g in singles
        ):
            treqs = [
                await tm.run_on_scheduler(lambda g=g: self._tokenize_one(g))
                for g in singles
            ]
        else:
            treqs = [self._tokenize_one(g) for g in singles]
        if stream and not was_batch:
            async def _aiter():
                async for out in tm.generate_request(treqs[0]):
                    yield self._to_dict(out)

            return _aiter()

        async def _one(treq):
            final = None
            async for out in tm.generate_request(treq):
                final = out
            return self._to_dict(final)

        import asyncio

        outs = await asyncio.gather(*(_one(t) for t in treqs))
        return list(outs) if was_batch else outs[0]

    def _run_to_completion(
        self, treqs: List[TokenizedGenerateReqInput]
    ) -> Dict[str, ReqStrOutput]:
        tm = getattr(self, "tm", None)
        if tm is not None:
            # the pump thread owns the scheduler now: route through it
            import asyncio

            async def _all():
                async def _one(t):
                    final = None
                    async for out in tm.generate_request(t):
                        final = out
                    return final

                outs = await asyncio.gather(*(_one(t) for t in treqs))
                return {t.rid: o for t, o in zip(treqs, outs)}

            return asyncio.run(_all())
        pending = set()
        for t in treqs:
            self.scheduler.add_request(t)
            pending.add(t.rid)
        results: Dict[str, ReqStrOutput] = {}
        while pending and self.scheduler.has_work():
            for out in self.scheduler.step():
                if out.finished:
                    results[out.rid] = out
                    pending.discard(out.rid)
        return results

    def _stream_one(self, treq: TokenizedGenerateReqInput) -> Iterator[Dict]:
        self.scheduler.add_request(treq)
        done = False
        while not done and self.scheduler.has_work():
            for out in self.scheduler.step():
                if out.rid != treq.rid:
                    continue
                yield self._to_dict(out)
                if out.finished:
                    done = True

    def _to_dict(self, out: ReqStrOutput) -> Dict[str, Any]:
        d = {
            "text": out.output_str,
            "output_ids": out.output_ids,
            "meta_info": {
                "id": out.rid,
                "finish_reason": out.finish_reason.to_json()
                if out.finish_reason
                else None,
                "prompt_tokens": out.prompt_tokens,
                "completion_tokens": out.completion_tokens,
                "cached_tokens": out.cached_tokens,
            },
        }
        if out.ttft is not None:
            d["meta_info"]["ttft"] = out.ttft
        if out.output_token_logprobs is not None:
            d["meta_info"]["output_token_logprobs"] = out.output_token_logprobs
        return d

    # ------------------------------------------------------------- encode

    def encode(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        input_ids: Optional[Union[List[int], List[List[int]]]] = None,
        pooling: str = "last",
    ) -> Union[Dict, List[Dict]]:
        """Embedding extraction (reference `Engine.encode` / `/v1/embeddings`).

        Runs prefill forwards and pools hidden states; KV pages are borrowed
        from the pool for the forward and freed immediately."""
        single = False
        if prompt is not None:
            if isinstance(prompt, str):
                prompt, single = [prompt], True
            ids_list = [self.tokenizer.encode(p) for p in prompt]
        else:
            if input_ids and isinstance(input_ids[0], int):
                ids_list, single = [input_ids], True
            else:
                ids_list = list(input_ids)
        sched = self.scheduler
        results = []
        max_tokens = self.runner.prefill_token_buckets[-1]
        max_seqs = self.runner.extend_seq_bucket
        i = 0
        while i < len(ids_list):
            batch_ids: List[List[int]] = []
            tok = 0
            while (
                i < len(ids_list)
                and len(batch_ids) < max_seqs
                and tok + len(ids_list[i]) <= max_tokens
            ):
                batch_ids.append(ids_list[i])
                tok += len(ids_list[i])
                i += 1
            if not batch_ids:
                raise ValueError(
                    f"input of {len(ids_list[i])} tokens exceeds max prefill "
                    f"bucket {max_tokens}"
                )
            results.extend(self._encode_batch(batch_ids, pooling))
        outs = [
            {
                "embedding": emb.tolist(),
                "meta_info": {"prompt_tokens": len(ids)},
            }
            for emb, ids in zip(results, ids_list)
        ]
        return outs[0] if single else outs

    def _encode_batch(self, ids_list: List[List[int]], pooling: str):
        sched = self.scheduler
        ps = sched.page_size
        all_pages = []
        input_ids: List[int] = []
        positions: List[int] = []
        out_loc: List[int] = []
        b = len(ids_list)
        page_table = np.zeros((b, self.runner.max_pages_per_req), dtype=np.int32)
        seq_lens = np.zeros(b, dtype=np.int32)
        extend_lens = np.zeros(b, dtype=np.int32)
        try:
            for i, ids in enumerate(ids_list):
                n_pages = -(-len(ids) // ps)
                pages = sched.allocator.alloc(n_pages)
                if pages is None:
                    raise RuntimeError("KV pool exhausted during encode")
                all_pages.append(pages)
                page_table[i, :n_pages] = pages
                seq_lens[i] = len(ids)
                extend_lens[i] = len(ids)
                input_ids.extend(ids)
                positions.extend(range(len(ids)))
                out_loc.extend(
                    pages[p // ps] * ps + p % ps for p in range(len(ids))
                )
            return self.runner.forward_embedding(
                np.asarray(input_ids, dtype=np.int32),
                np.asarray(positions, dtype=np.int32),
                np.asarray(out_loc, dtype=np.int32),
                page_table,
                seq_lens,
                extend_lens,
                pooling=pooling,
            )
        finally:
            for pages in all_pages:
                sched.allocator.free(pages)

    # --------------------------------------------------------------- score

    def diffusion_generate(
        self,
        input_ids=None,
        text: str = None,
        max_new_tokens: int = 64,
        block_size: int = 32,
        mask_id: int = None,
        threshold: float = 0.95,
        algorithm: str = "low_confidence",
    ) -> dict:
        """Block-diffusion decoding for dLLM checkpoints (reference
        `srt/dllm/`, LLaDA-class). mask_id defaults to the config's
        mask_token_id."""
        from sglang_tpu.dllm import DllmConfig, diffusion_generate

        if input_ids is None:
            if self.tokenizer is None:
                raise ValueError("text input requires a tokenizer")
            input_ids = self.tokenizer.encode(text)
        mc = self.runner.model_config
        if mask_id is None:
            mask_id = mc.hf_config.get("mask_token_id")
            if mask_id is None:
                raise ValueError(
                    "dLLM needs mask_id (config mask_token_id absent)"
                )
        cfg = DllmConfig(
            block_size=block_size, mask_id=int(mask_id),
            threshold=threshold, algorithm=algorithm,
        )

        def run():
            return diffusion_generate(
                self.runner, self.scheduler.allocator, list(input_ids),
                max_new_tokens, cfg, set(mc.eos_token_ids),
            )

        if getattr(self, "tm", None) is not None:
            # serialize against the scheduler pump thread
            import threading

            done = threading.Event()
            box = {}

            def call():
                try:
                    box["r"] = run()
                except Exception as e:
                    box["e"] = e
                finally:
                    done.set()

            self.tm._inbox.put(("call_sync", call))
            if not done.wait(timeout=600):
                raise TimeoutError("diffusion_generate timed out")
            if "e" in box:
                raise box["e"]
            out_ids = box["r"]
        else:
            out_ids = run()
        d = {"output_ids": out_ids, "meta_info": {
            "prompt_tokens": len(input_ids),
            "completion_tokens": len(out_ids),
            "algorithm": algorithm,
            "block_size": block_size,
        }}
        if self.tokenizer is not None:
            d["text"] = self.tokenizer.decode(out_ids)
        return d

    def score(self, prompt: str, choices: List[str]) -> List[float]:
        """Average per-token logprob of each continuation given `prompt`
        (reference `/v1/score` + the DSL `select` scoring,
        `lang/choices.py`)."""
        p_ids = self.tokenizer.encode(prompt)
        scores = []
        for c in choices:
            full = self.tokenizer.encode(prompt + c)
            k = 0
            while k < min(len(p_ids), len(full)) and p_ids[k] == full[k]:
                k += 1
            k = max(k, 1)  # at least one context token
            if k >= len(full):
                scores.append(float("-inf"))
                continue
            logits = self._score_forward(full)  # [T, V] f32
            x = logits[:-1]
            x = x - x.max(axis=-1, keepdims=True)
            lse = np.log(np.exp(x).sum(axis=-1))
            tgt = np.asarray(full[1:])
            tok_lp = x[np.arange(len(tgt)), tgt] - lse
            cont = tok_lp[k - 1 :]
            scores.append(float(cont.mean()))
        return scores

    def _score_forward(self, ids: List[int]) -> np.ndarray:
        sched = self.scheduler
        ps = sched.page_size
        n_pages = -(-len(ids) // ps)
        pages = sched.allocator.alloc(n_pages)
        if pages is None:
            raise RuntimeError("KV pool exhausted during score")
        try:
            pt = np.zeros((1, self.runner.max_pages_per_req), dtype=np.int32)
            pt[0, :n_pages] = pages
            out_loc = np.asarray(
                [pages[i // ps] * ps + i % ps for i in range(len(ids))],
                dtype=np.int32,
            )
            return self.runner.forward_extend_logits(
                np.asarray(ids, dtype=np.int32),
                np.arange(len(ids), dtype=np.int32),
                out_loc,
                pt,
                np.asarray([len(ids)], dtype=np.int32),
                np.asarray([len(ids)], dtype=np.int32),
            )
        finally:
            sched.allocator.free(pages)

    # ------------------------------------------------------ weight lifecycle

    def _require_idle(self, what: str) -> None:
        """Resolve any trailing in-flight chunk (its rows are finished
        requests' wasted compute); real live work raises."""
        s = self.scheduler
        if s.waiting_queue or s.running_batch.reqs or s.chunked_req:
            raise RuntimeError(f"cannot {what} while requests are live")
        while s._inflight is not None:
            s.step()

    def update_weights_from_disk(self, model_path: str) -> bool:
        self._require_idle("update weights")
        self.runner.update_weights_from_disk(model_path)
        return True

    def update_weights_from_tensor(self, named_tensors) -> int:
        self._require_idle("update weights")
        return self.runner.update_weights_from_tensor(named_tensors)

    # RL weight sync over DCN (reference init_weights_update_group +
    # update_weights_from_distributed, model_runner.py:1980 — NCCL group
    # broadcast replaced by a TCP push stream, see weight_sync.py)
    def init_weights_update_group(self, host: str = "0.0.0.0",
                                  port: int = 0) -> int:
        """Open the weight-sync receiver; returns its port. The trainer
        pushes batches with `weight_sync.push_weights((host, port), ...)`."""
        from sglang_tpu.model_executor.weight_sync import WeightSyncReceiver

        if getattr(self, "_weight_sync", None) is not None:
            return self._weight_sync.port

        def apply(tensors):
            if self.tm is not None:
                # run on the scheduler pump thread so the swap never races
                # a forward step ("call_sync" seam, as the PD server uses)
                import threading

                done = threading.Event()
                box = {}

                def job():
                    try:
                        box["r"] = self.runner.update_weights_from_tensor(
                            tensors
                        )
                    except Exception as e:
                        box["e"] = e
                    finally:
                        done.set()

                self.tm._inbox.put(("call_sync", job))
                if not done.wait(timeout=300):
                    raise TimeoutError("weight apply timed out")
                if "e" in box:
                    raise box["e"]
                return box["r"]
            self._require_idle("update weights")
            return self.runner.update_weights_from_tensor(tensors)

        self._weight_sync = WeightSyncReceiver(apply, host=host, port=port)
        return self._weight_sync.port

    def update_weights_from_distributed(self, version: int = 1,
                                        timeout: float = 120.0) -> bool:
        """Block until the trainer's push number `version` has been applied
        (the reference route receives the broadcast here; our receiver
        applies pushes as they arrive, so this is a barrier)."""
        ws = getattr(self, "_weight_sync", None)
        if ws is None:
            raise RuntimeError("call init_weights_update_group first")
        return ws.wait_version(version, timeout)

    def release_memory_occupation(self) -> bool:
        self._require_idle("release memory")
        self.scheduler.flush_cache()
        self.runner.release_memory_occupation()
        return True

    def resume_memory_occupation(self) -> bool:
        self.runner.resume_memory_occupation()
        self.scheduler.runner.kv_layers = self.runner.kv_layers
        return True

    # ---------------------------------------------------------------- lora

    def load_lora_adapter(self, lora_name: str, lora_path: str) -> int:
        """Load a PEFT adapter into the pool (reference
        `/load_lora_adapter`). Triggers a jit re-trace on next step."""
        return self.runner.ensure_lora_manager().load(lora_name, lora_path)

    def unload_lora_adapter(self, lora_name: str) -> bool:
        lm = self.runner.lora_manager
        return lm.unload(lora_name) if lm is not None else False

    # ------------------------------------------------------------ sessions

    def open_session(self, capacity_of_str_len: Optional[int] = None) -> str:
        return self.sessions.open(capacity=capacity_of_str_len)

    def close_session(self, session_id: str) -> bool:
        return self.sessions.close(session_id)

    # ------------------------------------------------------------- control

    def flush_cache(self) -> bool:
        return self.scheduler.flush_cache()

    def abort_request(self, rid: str) -> bool:
        return self.scheduler.abort_request(rid)

    def get_server_info(self) -> Dict[str, Any]:
        s = self.scheduler.stats
        return {
            "model_path": self.server_args.model_path,
            "max_total_tokens": self.runner.max_total_tokens,
            "page_size": self.server_args.page_size,
            "tp_size": self.server_args.tp_size,
            "version": _version(),
            "stats": {
                "prefill_tokens": s.num_prefill_tokens,
                "decode_tokens": s.num_decode_tokens,
                "cached_tokens": s.num_cached_tokens,
                "cache_hit_rate": s.cache_hit_rate(),
                "finished": s.num_finished,
                "retractions": s.num_retractions,
            },
        }

    def shutdown(self):
        if getattr(self, "tm", None) is not None:
            self.tm.shutdown()
        pass  # single-process: nothing to tear down


def _read_architectures(model_path: str) -> List[str]:
    import json as _json
    import os as _os

    try:
        with open(_os.path.join(model_path, "config.json")) as f:
            return list(_json.load(f).get("architectures") or [])
    except (OSError, ValueError):
        return []


def _version() -> str:
    from sglang_tpu.version import __version__

    return __version__
