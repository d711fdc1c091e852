"""Server/engine configuration.

Parity with the reference's `python/sglang/srt/server_args.py:357 ServerArgs`
(an ~8k-LoC dataclass); this is the same idea redesigned for a TPU-native
engine: one typed dataclass carrying every knob, a CLI binding, and a
`__post_init__` that derives defaults (bucket ladders, memory budgets, mesh
shape) from the model + hardware instead of CUDA-specific backends.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import random
import tempfile
from dataclasses import dataclass
from typing import List, Optional

from sglang_tpu.utils import get_logger, next_power_of_2, round_up

logger = get_logger(__name__)

SCHEDULE_POLICIES = ["lpm", "fcfs", "lof", "random", "dfs-weight", "priority"]
LOAD_FORMATS = ["auto", "safetensors", "gguf", "dummy", "zeros"]
QUANT_METHODS = [None, "int8", "int4", "awq", "gptq", "fp8", "fp8_block", "w8a8_int8", "w8a8_fp8"]
KV_CACHE_DTYPES = ["auto", "bfloat16", "fp8_e4m3", "fp8_e5m2", "int8", "int4"]
ATTENTION_BACKENDS = ["auto", "pallas", "reference"]
GRAMMAR_BACKENDS = ["native", "none"]
SPEC_ALGORITHMS = [None, "NGRAM", "EAGLE", "EAGLE3", "DFLASH", "STANDALONE", "MTP", "NEXTN"]


@dataclass
class ServerArgs:
    # --- Model & tokenizer ---
    model_path: str = ""
    tokenizer_path: Optional[str] = None
    trust_remote_code: bool = False
    context_length: Optional[int] = None  # override model max len
    dtype: str = "bfloat16"
    load_format: str = "auto"
    model_override_args: Optional[str] = None  # JSON dict merged into HF config
    revision: Optional[str] = None
    served_model_name: Optional[str] = None

    # --- Quantization ---
    quantization: Optional[str] = None
    kv_cache_dtype: str = "auto"

    # --- Memory / KV cache ---
    mem_fraction_static: Optional[float] = None
    max_total_tokens: Optional[int] = None  # KV pool capacity in tokens
    page_size: int = 64  # tokens per KV page (TPU: multiple of 8 sublanes)
    max_num_reqs: Optional[int] = None

    # --- Scheduling ---
    # KV cache events for external cache-aware routers
    enable_kv_cache_events: bool = False
    kv_events_addr: Optional[str] = None  # zmq PUB bind, e.g. tcp://*:5557

    # HiCache: host-RAM second tier behind the device radix cache
    enable_hierarchical_cache: bool = False
    # multimodal encode disaggregation: route vision encoding to a remote
    # encode server (disaggregation/encode.py)
    encode_server_url: Optional[str] = None
    hicache_size: float = 0.0  # GiB; 0 = 2x the device KV pool
    # async tier IO (reference cache_controller worker threads): spill
    # readbacks + host/disk loads run off the scheduler thread; decode
    # keeps stepping while transfers are in flight
    hicache_async: bool = True
    hicache_write_policy: str = "write_through"
    # L3 tier behind the host-RAM cache: a local directory (file store)
    # or a redis://host[:port]/prefix URL (remote shared store)
    hicache_storage_dir: Optional[str] = None
    hicache_storage_size: float = 0.0  # GiB; 0 = unbounded

    # --- Scheduling ---
    schedule_policy: str = "lpm"
    # priority preemption: a strictly-higher-priority waiting request may
    # retract lower-priority running ones when admission is blocked
    # (reference `schedule_policy.py:1008 preempt_to_schedule`)
    enable_priority_preemption: bool = False
    # abort requests stuck in the waiting queue longer than this many
    # seconds (0 = disabled; reference request-age aborts `scheduler.py:1537`)
    waiting_queue_timeout: float = 0.0
    schedule_conservativeness: float = 1.0
    chunked_prefill_size: int = 2048
    max_prefill_tokens: int = 8192
    # offline-throughput knob: skip a prefill round while KV headroom is
    # below this many tokens (0 = admit eagerly). Fewer, fuller prefill
    # rounds amortize the per-round compile-bucket padding; decode keeps
    # running while headroom accumulates. Raises TTFT — leave 0 for
    # latency-sensitive serving.
    prefill_accumulate_tokens: int = 0
    max_running_requests: Optional[int] = None
    stream_interval: int = 8
    # fused-chain depth while latency-sensitive (streaming) requests run:
    # a new arrival cannot be admitted mid-chunk, so TTFT floors at one
    # chunk (~K * step_time). 4 keeps dispatch amortized while capping
    # the admission wait at ~80 ms (measured TTFT lever, round 5 — the
    # 296 ms median @ 4 rps in ONLINE_r04 was chain-wait dominated).
    online_chain_depth: int = 3
    disable_radix_cache: bool = False
    enable_overlap_schedule: bool = True
    retract_decode_steps: int = 20
    # run decode tokens of running requests as 1-token rows inside prefill
    # extend forwards (reference --enable-mixed-chunk): decode keeps
    # progressing through long prefill phases
    enable_mixed_chunk: bool = True
    max_queued_requests: Optional[int] = None
    # decode steps fused into one jitted lax.scan chunk (1 = off). Amortizes
    # host->device dispatch/transfer latency; over-generates up to K-1
    # tokens past a stop condition (trimmed at resolution).
    decode_multi_step: int = 8

    # --- Shape bucketing (the TPU "CUDA graph" equivalent) ---
    decode_bs_buckets: Optional[List[int]] = None
    prefill_token_buckets: Optional[List[int]] = None

    # --- Parallelism ---
    tp_size: int = 1
    dp_size: int = 1
    # pipeline parallelism over the "pipe" mesh axis (reference --pp-size,
    # scheduler_pp_mixin.py): layers stack-sharded across stages, GPipe
    # microbatch schedule inside every jitted step
    pp_size: int = 1
    # microbatches per pipelined decode step (0 = pp_size)
    pp_microbatches: int = 0
    # DP-attention (reference --enable-dp-attention): attention + KV pool
    # sharded over the "data" axis, dense/MoE parts run over dp x tp
    enable_dp_attention: bool = False
    # attention context parallelism (reference --attn-cp-size): prefill
    # rows round-robin across the "data" axis, decode data-local
    attn_cp_size: int = 1
    # CP work split: "round-robin" (request granularity) or "in-seq"
    # (attention-block granularity: one long prompt splits across all cp
    # ranks — reference --nsa-prefill-cp-mode); both keep the KV pool
    # replicated over the axis. "pool-sharded" range-partitions the pool
    # itself and stripes every sequence's pages across ranks (contexts
    # beyond one chip's pool; partial-attention psum merge per call)
    attn_cp_mode: str = "round-robin"
    # SP for the dense parts of MoE models (reference --moe-dense-tp-size):
    # 1 = replicate dense-MLP weights, shard the token axis over "model"
    # (skips the dense layers' per-layer all-reduce)
    moe_dense_tp_size: Optional[int] = None
    # expert parallelism (reference --enable-ep-moe / moe_a2a_backend):
    # experts sharded over the "model" axis, tokens dispatched via
    # all_to_all inside shard_map (parallel/ep.py)
    enable_ep_moe: bool = False
    # capacity factor for the EP dispatch buckets (overflow picks drop;
    # >= ep axis size makes dispatch lossless)
    ep_capacity_factor: float = 2.0
    nnodes: int = 1
    node_rank: int = 0
    dist_init_addr: Optional[str] = None

    # --- Attention / kernels ---
    attention_backend: str = "auto"

    # --- Sampling / constrained decoding ---
    grammar_backend: str = "native"
    # "name=module:attr" jittable fn(logits, params) -> logits entries
    custom_logit_processors: Optional[List[str]] = None
    constrained_json_whitespace_pattern: Optional[str] = None

    # --- Observability ---
    # JSONL file receiving one OTLP-shaped span record per finished request
    # (reference observability/trace.py OTLP export; file-backed here)
    request_span_log: Optional[str] = None
    # real OTLP/HTTP export of the same spans (reference
    # `process_tracing_init`): POST {endpoint}/v1/traces from a batching
    # background thread; off by default, no external deps
    otlp_traces_endpoint: Optional[str] = None
    # directory receiving crash-state JSON dumps on engine-fatal errors
    # (reference srt/state_capturer/)
    crash_dump_dir: Optional[str] = None

    # --- Output parsing (chat API) ---
    tool_call_parser: Optional[str] = None  # hermes | llama3 | mistral
    reasoning_parser: Optional[str] = None  # deepseek-r1 | qwen3

    # --- Responses API / gateway features ---
    # append-only JSONL journal making /v1/conversations survive restarts
    conversation_journal_path: Optional[str] = None
    # honor request-level {"type": "mcp", ...} tools in /v1/responses
    # (runs MCP servers named by the REQUEST — connecting to arbitrary
    # URLs / spawning commands — so it is opt-in; reference gateway's
    # per-request MCP client, sgl-model-gateway mcp_utils.rs)
    enable_request_mcp: bool = False

    # --- Speculative decoding ---
    speculative_algorithm: Optional[str] = None
    speculative_num_draft_tokens: int = 4
    speculative_ngram_min_match: int = 1
    speculative_ngram_max_match: int = 4
    speculative_draft_model_path: Optional[str] = None
    speculative_eagle_topk: int = 4
    speculative_num_steps: int = 3

    # --- LoRA ---
    lora_paths: Optional[List[str]] = None
    max_loras_per_batch: int = 4
    max_lora_rank: Optional[int] = None

    # --- Server ---
    host: str = "127.0.0.1"
    port: int = 30000
    grpc_port: Optional[int] = None  # serve gRPC alongside HTTP when set
    api_key: Optional[str] = None
    log_level: str = "info"
    log_requests: bool = False
    show_time_cost: bool = False
    enable_metrics: bool = False

    # --- Misc ---
    plugins: Optional[List[str]] = None  # modules exposing register(api)
    random_seed: Optional[int] = None
    skip_tokenizer_init: bool = False
    watchdog_timeout: float = 300.0
    device: str = "auto"  # auto | tpu | cpu

    def __post_init__(self):
        if "://" in self.model_path:
            # remote weights (file:// s3:// redis://) resolve to a local
            # cache dir once, up front (reference srt/connector/)
            from sglang_tpu.connector import resolve_model_path

            self.model_path = resolve_model_path(self.model_path)
        if self.tokenizer_path is None:
            self.tokenizer_path = self.model_path
        if self.served_model_name is None:
            self.served_model_name = self.model_path
        if self.random_seed is None:
            self.random_seed = random.randint(0, 2**31 - 1)
        if self.quantization == "awq" or self.quantization == "gptq":
            pass  # group-wise int4; resolved by checkpoint config at load
        if self.kv_cache_dtype not in KV_CACHE_DTYPES:
            raise ValueError(f"bad kv_cache_dtype {self.kv_cache_dtype}")
        if self.schedule_policy not in SCHEDULE_POLICIES:
            raise ValueError(f"bad schedule_policy {self.schedule_policy}")
        if self.hicache_write_policy != "write_through":
            raise ValueError(
                "only hicache_write_policy=write_through is implemented"
            )
        if self.page_size % 8 != 0:
            raise ValueError("page_size must be a multiple of 8 (TPU sublanes)")
        if self.decode_bs_buckets is None:
            self.decode_bs_buckets = [8, 16, 32, 64, 128, 256]
        if self.prefill_token_buckets is None:
            cap = max(512, next_power_of_2(self.chunked_prefill_size))
            b, buckets = 512, []
            while b <= cap:
                buckets.append(b)
                b *= 2
            if buckets[-1] < cap:
                buckets.append(cap)
            self.prefill_token_buckets = buckets
        self.decode_bs_buckets = sorted(set(self.decode_bs_buckets))
        self.prefill_token_buckets = sorted(set(self.prefill_token_buckets))
        if self.mem_fraction_static is None:
            self.mem_fraction_static = 0.85
        if self.chunked_prefill_size % self.page_size != 0:
            self.chunked_prefill_size = round_up(
                self.chunked_prefill_size, self.page_size
            )
        if self.speculative_algorithm is not None:
            self.speculative_algorithm = self.speculative_algorithm.upper()
            if (
                self.speculative_algorithm in ("STANDALONE", "EAGLE", "EAGLE3", "DFLASH")
                and not self.speculative_draft_model_path
            ):
                raise ValueError(
                    f"{self.speculative_algorithm} speculation needs "
                    "--speculative-draft-model-path"
                )
            if self.speculative_algorithm not in (
                "NGRAM", "EAGLE", "EAGLE3", "DFLASH", "STANDALONE", "MTP",
                "NEXTN",
            ):
                raise ValueError(
                    f"bad speculative_algorithm {self.speculative_algorithm}"
                )
            # Overlap scheduling and spec decoding both reorder the sample
            # feedback path; run spec decoding in the simple loop first.
            self.enable_overlap_schedule = False

    # ------------------------------------------------------------------ CLI

    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser) -> None:
        # raw field defaults (NOT a constructed instance — __post_init__
        # derives fields like tokenizer_path from model_path, which must
        # stay None on the CLI so the real model_path flows through)
        for f in dataclasses.fields(ServerArgs):
            name = "--" + f.name.replace("_", "-")
            if f.default is not dataclasses.MISSING:
                default = f.default
            elif f.default_factory is not dataclasses.MISSING:
                default = f.default_factory()
            else:
                default = None
            if f.type == "bool" or isinstance(default, bool):
                parser.add_argument(
                    name,
                    action="store_true" if not default else "store_false",
                    default=default,
                )
            elif f.name in (
                "decode_bs_buckets",
                "prefill_token_buckets",
                "lora_paths",
                "custom_logit_processors",
                "plugins",
            ):
                parser.add_argument(name, nargs="*", default=None)
            else:
                ann = str(f.type)
                if default is not None:
                    typ = type(default)
                elif "int" in ann:
                    typ = int
                elif "float" in ann:
                    typ = float
                else:
                    typ = str
                if typ not in (int, float, str):
                    typ = str
                parser.add_argument(name, type=typ, default=default)

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "ServerArgs":
        kwargs = {
            f.name: getattr(args, f.name)
            for f in dataclasses.fields(cls)
            if hasattr(args, f.name)
        }
        if kwargs.get("decode_bs_buckets"):
            kwargs["decode_bs_buckets"] = [int(x) for x in kwargs["decode_bs_buckets"]]
        if kwargs.get("prefill_token_buckets"):
            kwargs["prefill_token_buckets"] = [
                int(x) for x in kwargs["prefill_token_buckets"]
            ]
        return cls(**kwargs)

    def model_override(self) -> dict:
        if not self.model_override_args:
            return {}
        return json.loads(self.model_override_args)


@dataclass
class PortArgs:
    """In-process queue names / socket addrs (reference `server_args.py:7805`).

    The reference allocates ZMQ IPC endpoints between its tokenizer /
    scheduler / detokenizer subprocesses. On TPU hosts the engine is a
    single process (JAX is multi-controller across hosts), so these are
    only used by the HTTP server and multi-host control channel.
    """

    scheduler_input_ipc: str = ""
    detokenizer_ipc: str = ""
    http_port: int = 30000

    @classmethod
    def init_new(cls, server_args: ServerArgs) -> "PortArgs":
        base = tempfile.mkdtemp(prefix="sglang_tpu_")
        return cls(
            scheduler_input_ipc=os.path.join(base, "scheduler"),
            detokenizer_ipc=os.path.join(base, "detokenizer"),
            http_port=server_args.port,
        )
