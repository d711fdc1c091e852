"""Model runner: owns params, KV pool, and the bucketed jitted step functions.

Parity with reference `srt/model_executor/model_runner.py:326 ModelRunner`
(init device/model/memory pool, `forward:3300` dispatch, `sample:3493`) plus
`cuda_graph_runner.py:578` — on TPU, bucketed `jax.jit` with donated KV
buffers *is* the CUDA-graph mechanism: every (mode, token-bucket, seq-bucket,
sampling-variant) tuple compiles once and replays from the XLA compilation
cache afterwards.

Step contract:
    next_ids, token_logprobs, kv' = step(params, kv, fb, logits_idx, sinfo, rng)
with kv donated (in-place page scatter) and every shape static.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.attention import create_attention_backend
from sglang_tpu.layers.sampler import (
    sample,
    update_counts_extend,
    update_counts_sampled,
)
from sglang_tpu.mem_cache.memory_pool import (
    KV_DTYPE_MAP,
    KVCachePool,
    compute_num_pages,
)
from sglang_tpu.model_executor.forward_batch_info import (
    ForwardBatch,
    ForwardMode,
    make_decode_batch,
    make_extend_batch,
)
from sglang_tpu.model_loader.loader import load_model_weights
from sglang_tpu.models.registry import get_model_class
from sglang_tpu.parallel.mesh import create_mesh, get_device_kind
from sglang_tpu.sampling.sampling_batch_info import SamplingBatchInfo
from sglang_tpu.server_args import ServerArgs
from sglang_tpu.utils import (
    cdiv,
    get_logger,
    next_power_of_2,
    pad_to_bucket,
    round_up,
)

logger = get_logger(__name__)


class ModelRunner:
    def __init__(
        self,
        server_args: ServerArgs,
        model_config: Optional[ModelConfig] = None,
        mesh=None,
    ):
        self.server_args = server_args
        self.model_config = model_config or ModelConfig.from_server_args(server_args)
        if server_args.device == "cpu":
            # An installed TPU PJRT plugin outranks JAX_PLATFORMS, so
            # `--device cpu` must pin the platform explicitly; only
            # possible before the first backend initialization.
            os.environ.setdefault("JAX_PLATFORMS", "cpu")
            try:
                jax.config.update("jax_platforms", "cpu")
            except RuntimeError:
                if jax.devices()[0].platform != "cpu":
                    raise RuntimeError(
                        "--device cpu requested but the JAX backend is "
                        "already initialized on "
                        f"{jax.devices()[0].platform}"
                    )
        self.device_kind = (
            get_device_kind() if server_args.device == "auto" else server_args.device
        )
        if self.device_kind == "tpu":
            # persistent compilation cache = persistent "CUDA graphs"
            try:
                jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
                # cache EVERYTHING: on a tunneled runtime even a trivial
                # convert/broadcast costs a ~0.4 s remote-compile round trip,
                # and startup runs ~100 of them (weight upload, pool init)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 0.0
                )
            except Exception:
                pass
        if server_args.nnodes > 1 and mesh is None:
            # multi-host: one process per host joins the jax cluster; the
            # mesh then spans all hosts' chips and TP collectives ride
            # ICI/DCN (reference torch.distributed bootstrap,
            # `parallel_state.py:1613` — here jax.distributed owns it)
            jax.distributed.initialize(
                coordinator_address=server_args.dist_init_addr,
                num_processes=server_args.nnodes,
                process_id=server_args.node_rank,
            )
        self.pp_size = server_args.pp_size
        self.dp_size = (
            server_args.dp_size if server_args.enable_dp_attention else 1
        )
        # CP reuses the "data" mesh axis (mutually exclusive with
        # DP-attention — both claim row ownership on that axis)
        self.cp_size = getattr(server_args, "attn_cp_size", 1) or 1
        if self.cp_size > 1 and self.dp_size > 1:
            raise ValueError("attn_cp_size and enable-dp-attention conflict")
        if self.cp_size > 1:
            self.dp_size = self.cp_size
        self.mesh = mesh if mesh is not None else create_mesh(
            tp_size=server_args.tp_size,
            dp_size=self.dp_size,
            pp_size=self.pp_size,
        )
        self.tp_size = server_args.tp_size

        model_cls = get_model_class(self.model_config)
        self.model = model_cls(self.model_config)
        # models that place sharding constraints (dense-SP) need the mesh
        self.model.mesh = self.mesh
        if server_args.enable_ep_moe:
            if not hasattr(self.model, "enable_ep"):
                raise NotImplementedError(
                    f"{model_cls.__name__} does not support --enable-ep-moe"
                )
            # before load: flips expert shardings from FFN-TP to expert-EP
            self.model.enable_ep(
                self.mesh,
                capacity_factor=server_args.ep_capacity_factor,
            )
        # hybrid models (linear attention / Mamba-class layers) carry
        # slot-indexed recurrent state pools instead of paged KV on some
        # layers and need per-seq state slots in the ForwardBatch
        self.kv_kinds = getattr(self.model, "kv_kinds", None)
        self._needs_state_slots = self.kv_kinds is not None
        if self._needs_state_slots and (self.pp_size > 1 or self.dp_size > 1):
            raise NotImplementedError(
                "hybrid linear-attention models do not compose with "
                "pp_size>1 / --enable-dp-attention yet"
            )
        self.attn_backend = create_attention_backend(
            server_args.attention_backend, on_tpu=self.device_kind == "tpu"
        )
        # Layer-scanned forward (compile the layer body once instead of
        # num_layers times — see model_executor/scan_forward.py). Models
        # with non-uniform layers keep the unrolled loop (they override
        # `forward`), as do pp/dp/cp meshes (own pool partitioning) and
        # hybrid/NSA models (non-array kv layers).
        from sglang_tpu.models.llama import LlamaForCausalLM

        self._use_scan = (
            self.pp_size == 1
            and self.dp_size == 1
            and self.cp_size == 1
            and self.kv_kinds is None
            and not getattr(self.model, "use_nsa", False)
            and type(self.model).forward is LlamaForCausalLM.forward
            and os.environ.get("SGLANG_TPU_NO_SCAN") != "1"
        )
        logger.info(
            "model: %s, %d layers, attn backend: %s, layer_scan: %s",
            model_cls.__name__,
            self.model.num_layers,
            type(self.attn_backend).__name__,
            self._use_scan,
        )

        self.params = load_model_weights(
            self.model,
            self.model_config,
            self.mesh,
            load_format=server_args.load_format,
            seed=server_args.random_seed,
        )
        # forward dispatch: pp>1 swaps in the GPipe pipelined forward
        # (stacked layer params + stacked KV, sharded over "pipe")
        self._model_forward = self.model.forward
        if self.pp_size > 1:
            from sglang_tpu.parallel.pp_executor import PPForward, stack_layers

            self.params["layers"] = stack_layers(
                self.params["layers"],
                self.model.param_shardings()["layers"][0],
                self.mesh,
            )
            self._pp_forward = PPForward(
                self.model,
                self.mesh,
                self.pp_size,
                microbatches=server_args.pp_microbatches,
            )
            self._model_forward = self._pp_forward
        if self._use_scan:
            from sglang_tpu.model_executor.scan_forward import layers_stackable

            if not layers_stackable(self.params["layers"]):
                logger.info("layer params not uniform; keeping unrolled loop")
                self._use_scan = False
        self.lora_manager = None
        if server_args.lora_paths:
            from sglang_tpu.lora.lora_manager import LoRAManager

            self.lora_manager = LoRAManager(
                self.model,
                max_loras=server_args.max_loras_per_batch,
                max_rank=server_args.max_lora_rank,
                uniform_layout=self._use_scan,
            )
            for spec in server_args.lora_paths:
                name, _, path = spec.partition("=")
                self.lora_manager.load(name, path or name)
        # bucket ladders
        self.decode_bs_buckets = list(server_args.decode_bs_buckets)
        self.prefill_token_buckets = list(server_args.prefill_token_buckets)
        self.extend_seq_bucket = min(
            64, server_args.max_running_requests or 64, self.decode_bs_buckets[-1]
        )
        # rounded up to a multiple of 16 so the attention kernel's page-block
        # DMA loop (pblk pages per chunk) never indexes past the table edge
        self.max_pages_per_req = round_up(
            cdiv(self.model_config.context_length, server_args.page_size), 16
        )
        if self._use_scan:
            # stack BEFORE the KV pool exists: the stacking transient
            # (~one stacked leaf) and the pool must not coexist on a
            # 16 GiB chip with an 8B model
            from sglang_tpu.model_executor.scan_forward import (
                stack_layer_params,
            )

            self.params["layers"] = stack_layer_params(
                self.params["layers"],
                self.model.param_shardings()["layers"][0],
                self.mesh,
            )
        self._init_kv_pool()
        if self._use_scan:
            from sglang_tpu.model_executor.scan_forward import ScanForward

            self._model_forward = ScanForward(
                self.model, self.num_pages, self.page_size
            )
        # custom logit processors: "name=module:attr" -> jittable
        # fn(logits [B,V], params [B,P]) -> logits (reference
        # custom_logit_processor; ours are named + registered at launch
        # so the jitted step can close over them)
        self.custom_procs: list = []
        self.custom_proc_index: dict = {}
        for spec in server_args.custom_logit_processors or []:
            name, _, target = spec.partition("=")
            mod, _, attr = target.partition(":")
            import importlib

            fn = getattr(importlib.import_module(mod), attr)
            self.custom_proc_index[name] = len(self.custom_procs)
            self.custom_procs.append(fn)
        self._custom_procs_t = tuple(self.custom_procs)
        self.rng_key = jax.random.PRNGKey(server_args.random_seed)
        # EAGLE3: verify/extend-hidden forwards return multi-layer aux
        # features instead of the final hidden (set by the spec worker
        # before the first jit trace)
        self.capture_aux = False
        self._step_counter = 0
        self._jit_cache = {}
        self._chain = None  # device-resident decode-chunk chain state
        # chain-tail KV batching (ops/chain_tail.py): replace the per-step
        # page RMW inside fused decode chains with a contiguous tail buffer
        # + one flush per chunk (~K-fold less page-RMW traffic). Needs the
        # layer-scanned forward (the tail carries per layer), a standard
        # [P, 2kvh, ps, d] pool (no MLA/hybrid state), full attention, and
        # a single DP region.
        # DEFAULT OFF — honest negative result (docs/PERFORMANCE.md r5):
        # the page-RMW it removes is worth 1.7 ms/step at bs=128, but the
        # batched tail attention + merge costs 3.2 ms/step in XLA (small-op
        # launch/relayout tax across 32 scanned layers) and the flush 0.7,
        # a net LOSS of ~2.3 ms/step on v5e. Kept env-gated for future
        # generations / an eventual in-kernel tail chunk.
        import os as _os

        self._chain_tail = (
            self._use_scan
            and getattr(self.model, "supports_chain_tail", False)
            and getattr(self.model, "sliding_window", -1) <= 0
            and not self._needs_state_slots
            and self.dp_size == 1
            and server_args.kv_cache_dtype != "int4"  # tail is int8-rowed
            and _os.environ.get("SGLANG_TPU_CHAIN_TAIL", "0") == "1"
        )


    def slots_budget(self) -> int:
        """Stable per-request device slot count (sampler penalty rows and
        hybrid recurrent-state pools share this indexing; the scheduler
        uses the same formula for its slot pool)."""
        sa = self.server_args
        running = min(sa.max_running_requests or 1 << 30, self.decode_bs_buckets[-1])
        return running + self.extend_seq_bucket

    # ---------------------------------------------------------------- pools

    # HBM per chip by TPU generation (GiB) — used when the runtime exposes
    # no memory_stats (some PJRT plugins return None)
    _HBM_BY_GEN = {"v4": 32, "v5e": 16, "v5p": 95, "v6e": 32}

    def _available_kv_bytes(self) -> int:
        sa = self.server_args
        param_bytes = sum(
            x.nbytes for x in jax.tree_util.tree_leaves(self.params)
        )
        stats = None
        try:
            stats = jax.local_devices()[0].memory_stats()
        except Exception:
            pass
        if stats and "bytes_limit" in stats:
            limit = stats["bytes_limit"]
            used = stats["bytes_in_use"]
        else:
            import os

            gb = os.environ.get("SGLANG_TPU_HBM_GB")
            if gb is None:
                gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
                gb = self._HBM_BY_GEN.get(gen, 16)
            # nameplate HBM minus the XLA runtime's own reserve: measured
            # ~1.75 GiB unusable on v5e (readback succeeds at 14 GiB of
            # buffers, fails at 15) — without this the pool sizing eats
            # the executables' temp arena and the first big compile OOMs
            limit = int(float(gb) * (1 << 30)) - (1792 << 20)
            used = param_bytes
        logger.info(
            "hbm: limit %.2f GiB, in_use %.2f GiB (params %.2f GiB), "
            "mem_fraction %.2f",
            limit / (1 << 30),
            used / (1 << 30),
            param_bytes / (1 << 30),
            sa.mem_fraction_static,
        )
        budget = int(limit * sa.mem_fraction_static) - used
        if budget > 0:
            return budget
        if self.device_kind != "tpu":
            return 1 << 30  # CPU tests: small pool unless max_total_tokens
        raise RuntimeError(
            f"no HBM left for KV cache (params {param_bytes >> 30} GiB, "
            f"limit {limit >> 30} GiB); lower model size or quantize"
        )

    def _init_kv_pool(self):
        sa = self.server_args
        mc = self.model_config
        store_dtype = KV_DTYPE_MAP[sa.kv_cache_dtype] or mc.dtype
        kv_heads_local = mc.num_key_value_heads  # sharded over "model" by GSPMD
        # hybrid models: only full-attention layers hold paged KV; linear
        # layers get slot-indexed recurrent state pools (MambaPool analogue,
        # reference memory_pool.py:195 / HybridLinearKVPool)
        paged_layer_count = (
            sum(k == "paged" for k in self.kv_kinds)
            if self.kv_kinds is not None
            else mc.num_hidden_layers
        )
        state_bytes = 0
        if self.kv_kinds is not None:
            slots = self.slots_budget()
            sspecs = self.model.state_specs(slots)
            per_layer = sum(
                int(np.prod(v.shape)) * jnp.dtype(v.dtype).itemsize
                for v in sspecs.values()
            )
            # count state kinds directly — parallel hybrids (FalconH1)
            # declare one paged AND one linear kind per decoder layer
            state_bytes = per_layer * sum(
                1 for k in self.kv_kinds if k != "paged"
            )
        # NSA models carry a per-layer paged index-key plane alongside the
        # latent pool (reference NSATokenToKVPool, `memory_pool.py:1981`)
        nsa_idx_dim = (
            getattr(self.model, "nsa_index_head_dim", 0)
            if getattr(self.model, "use_nsa", False)
            else 0
        )
        if nsa_idx_dim and (
            self.pp_size > 1
            or self.dp_size > 1
            or self.kv_kinds is not None
            or sa.enable_hierarchical_cache
            or sa.kv_cache_dtype not in ("auto", "bfloat16")
        ):
            raise NotImplementedError(
                "NSA does not compose with pp/dp-attention/hybrid/hicache/"
                "quantized-KV yet (the index-key plane is bf16 and local)"
            )
        if paged_layer_count == 0:
            # pure-SSM model (Mamba2): no paged KV is ever read, but the
            # allocator/page-table protocol still tracks the token budget —
            # size the index space only (zero HBM cost, empty pool)
            num_pages = (
                cdiv(sa.max_total_tokens, sa.page_size) + 1
                if sa.max_total_tokens
                else cdiv(1 << 16, sa.page_size) + 1
            )
        else:
            num_pages = compute_num_pages(
                self._available_kv_bytes() - state_bytes,
                sa.page_size,
                paged_layer_count,
                kv_heads_local,
                mc.head_dim,
                store_dtype,
                max_total_tokens=sa.max_total_tokens,
                extra_bytes_per_page_layer=(
                    sa.page_size * nsa_idx_dim * jnp.dtype(mc.dtype).itemsize
                ),
            )
        # int8 KV composes with tp>1 since the r3 row-per-head scale-plane
        # relayout: values shard by KV head over "model"; the per-page
        # scale plane (3% of pool bytes) shards on the page dim only and
        # keeps its rows replicated — GSPMD keeps the math identical
        # (tested: tp=2 int8-KV output == tp=1 exactly on a CPU mesh).
        head_spec = (
            "model"
            if mc.num_key_value_heads * 2 % max(1, self.tp_size) == 0
            else None
        )
        page_spec = "data" if self.dp_size > 1 else None
        if self.dp_size > 1:
            # DP-attention: page space range-partitioned over "data"
            num_pages -= num_pages % self.dp_size
        kv_sharding = NamedSharding(
            self.mesh, P(page_spec, head_spec, None, None)
        )
        stacked_sharding = None
        if self.pp_size > 1:
            # PP: one stacked [L, ...] pool, layer axis over "pipe"
            stacked_sharding = NamedSharding(
                self.mesh, P("pipe", page_spec, head_spec, None, None)
            )
        self.kv_pool = KVCachePool(
            num_pages=num_pages,
            page_size=sa.page_size,
            num_layers=paged_layer_count,
            num_kv_heads=mc.num_key_value_heads,
            head_dim=mc.head_dim,
            dtype=mc.dtype,
            kv_cache_dtype=sa.kv_cache_dtype,
            sharding=kv_sharding,
            stacked_sharding=stacked_sharding,
            fused=self._use_scan,
        )
        if self.kv_kinds is not None:
            # interleave paged arrays and state-pool dicts by model layer
            slots = self.slots_budget()
            sspecs = self.model.state_specs(slots)
            paged_iter = iter(self.kv_pool.layers)
            layers = []
            for kind in self.kv_kinds:
                if kind == "paged":
                    layers.append(next(paged_iter))
                else:
                    layers.append(
                        {
                            k: jnp.zeros(v.shape, v.dtype)
                            for k, v in sspecs.items()
                        }
                    )
            self.kv_layers = layers
        elif nsa_idx_dim:
            idx_sharding = NamedSharding(self.mesh, P(page_spec, None, None))
            self.kv_layers = [
                (
                    layer,
                    jax.device_put(
                        jnp.zeros(
                            (num_pages, sa.page_size, nsa_idx_dim), mc.dtype
                        ),
                        idx_sharding,
                    ),
                )
                for layer in self.kv_pool.layers
            ]
        elif self._use_scan:
            self.kv_layers = self.kv_pool.fused
        else:
            self.kv_layers = (
                self.kv_pool.stacked
                if self.kv_pool.stacked is not None
                else self.kv_pool.layers
            )
        if self.cp_size > 1:
            cp_mode = getattr(self.server_args, "attn_cp_mode", "round-robin")
            if cp_mode == "pool-sharded":
                from sglang_tpu.parallel.cp_attention import (
                    PoolShardedCPBackend,
                )

                self.attn_backend = PoolShardedCPBackend(
                    self.mesh, self.cp_size, num_pages, sa.page_size
                )
            else:
                from sglang_tpu.parallel.cp_attention import (
                    CPAttentionBackend,
                )

                self.attn_backend = CPAttentionBackend(
                    self.attn_backend, self.mesh, self.cp_size, mode=cp_mode
                )
        elif self.dp_size > 1:
            from sglang_tpu.parallel.dp_attention import DPAttentionBackend

            self.attn_backend = DPAttentionBackend(
                self.attn_backend,
                self.mesh,
                self.dp_size,
                pages_per_rank=num_pages // self.dp_size,
                page_size=sa.page_size,
            )
        self.num_pages = num_pages
        self.page_size = sa.page_size

    @property
    def max_total_tokens(self) -> int:
        return self.kv_pool.capacity_tokens

    # ------------------------------------------------------- weight lifecycle

    def update_weights_from_disk(self, model_path: str) -> None:
        """Reload weights from a new checkpoint of the SAME architecture
        (reference `model_runner.py:1750 update_weights_from_disk` — the RL
        weight-sync path). The params pytree keeps its treedef, so every
        compiled step stays valid."""
        from sglang_tpu.model_loader.loader import load_safetensors_weights

        mc = self.model_config
        old_path = mc.model_path
        mc.model_path = model_path
        try:
            new_params = load_safetensors_weights(self.model, mc, self.mesh)
        except Exception:
            mc.model_path = old_path
            raise
        self.params = new_params
        self._restack_pp_params()
        logger.info("weights updated from %s", model_path)

    def update_weights_from_tensor(self, named_tensors) -> int:
        """In-place update from (hf_name -> numpy) pairs (reference
        `update_weights_from_tensor:2070`). Fused targets require all their
        source tensors in one call."""
        from sglang_tpu.model_loader.loader import _device_put_leafdict, _execute_rule
        from sglang_tpu.model_loader.weight_mapping import get_in_tree, set_in_tree

        class _MemIndex:
            def __init__(self, d):
                self.d = {k: np.asarray(v) for k, v in d.items()}

            def has(self, name):
                return name in self.d

            def get(self, name):
                return self.d[name]

        index = _MemIndex(dict(named_tensors))
        specs = self.model.param_specs()
        shardings = self.model.param_shardings()
        n = 0
        stacked_layers = self._use_scan and not isinstance(
            self.params.get("layers"), list
        )
        for rule in self.model.weight_rules():
            if not all(index.has(s) for s in rule.sources):
                continue
            value = _execute_rule(self.model, rule, index)
            if value is None:
                continue
            spec = get_in_tree(shardings, rule.target)
            sds = get_in_tree(specs, rule.target)
            placed = _device_put_leafdict(value, spec, sds, self.mesh)
            if stacked_layers and rule.target[0] == "layers":
                from sglang_tpu.model_executor.scan_forward import (
                    set_stacked_layer_value,
                )

                set_stacked_layer_value(
                    self.params["layers"],
                    tuple(rule.target[2:]),
                    int(rule.target[1]),
                    placed,
                )
            else:
                set_in_tree(self.params, rule.target, placed)
            n += 1
        logger.info("updated %d weight groups from tensors", n)
        return n

    def release_memory_occupation(self) -> None:
        """Free params + KV HBM for a co-located trainer (reference
        `/release_memory_occupation`, torch_memory_saver role)."""
        self._released_capacity = self.kv_pool.capacity_tokens
        self.params = None
        self.kv_pool = None
        self.kv_layers = None
        self._penalty_counts = None
        import gc

        gc.collect()
        logger.info("released model + KV memory")

    def resume_memory_occupation(self) -> None:
        """Re-load weights and re-create the KV pool after release."""
        from sglang_tpu.model_loader.loader import load_model_weights

        self.params = load_model_weights(
            self.model,
            self.model_config,
            self.mesh,
            load_format=self.server_args.load_format,
            seed=self.server_args.random_seed,
        )
        self._restack_pp_params()
        # keep the pool geometry identical so scheduler page state stays valid
        prev = self.server_args.max_total_tokens
        self.server_args.max_total_tokens = self._released_capacity
        try:
            self._init_kv_pool()
        finally:
            self.server_args.max_total_tokens = prev
        logger.info("resumed model + KV memory")

    def _restack_pp_params(self) -> None:
        """Re-stack per-layer params (over "pipe" for PP, or the plain [L]
        scan axis) after any path that reloads them as a per-layer list
        (weight lifecycle)."""
        if not isinstance(self.params.get("layers"), list):
            return
        if self.pp_size > 1:
            from sglang_tpu.parallel.pp_executor import stack_layers

            self.params["layers"] = stack_layers(
                self.params["layers"],
                self.model.param_shardings()["layers"][0],
                self.mesh,
            )
        elif self._use_scan:
            from sglang_tpu.model_executor.scan_forward import (
                stack_layer_params,
            )

            self.params["layers"] = stack_layer_params(
                self.params["layers"],
                self.model.param_shardings()["layers"][0],
                self.mesh,
            )

    # ---------------------------------------------------------------- jit

    def ensure_lora_manager(self):
        if self.lora_manager is None:
            from sglang_tpu.lora.lora_manager import LoRAManager

            self.lora_manager = LoRAManager(
                self.model,
                max_loras=self.server_args.max_loras_per_batch,
                max_rank=self.server_args.max_lora_rank,
                uniform_layout=self._use_scan,
            )
        return self.lora_manager

    def _params(self):
        """Params pytree, with the live LoRA pool attached when adapters
        are loaded (a different treedef -> its own jit variant)."""
        if self.lora_manager is not None and self.lora_manager.pool is not None:
            p = {**self.params, "lora": self.lora_manager.pool}
            if self.lora_manager.pool_extras is not None:
                p["lora_extra"] = self.lora_manager.pool_extras
            return p
        return self.params

    def _get_step_fn(self):
        key = "step"
        if key not in self._jit_cache:

            def _step(params, kv_layers, counts, fb, logits_indices, sinfo, rng):
                if self._needs_state_slots:
                    fb = dataclasses.replace(fb, state_slots=sinfo.slot_ids)
                hidden, new_kv = self._model_forward(
                    params, kv_layers, fb, self.attn_backend
                )
                if sinfo.need_penalties and fb.mode.is_extend():
                    # fresh-slot reset + re-count outputs on retraction
                    sentinel = counts.shape[0] - 1
                    tslots = jnp.where(
                        fb.token_kind > 0,
                        sinfo.slot_ids[
                            jnp.clip(fb.token_to_seq, 0, sinfo.slot_ids.shape[0] - 1)
                        ],
                        sentinel,
                    )
                    counts = update_counts_extend(
                        counts,
                        fb.input_ids,
                        tslots,
                        fb.token_kind,
                        sinfo.slot_ids,
                        sinfo.fresh_mask,
                    )
                sel = hidden[logits_indices]
                if fb.lora_ids is not None and "lora_extra" in params:
                    logits = self.model.compute_logits(
                        params, sel, lora_ids=fb.lora_ids[logits_indices]
                    )
                else:
                    logits = self.model.compute_logits(params, sel)
                next_ids, tok_lp = sample(
                    logits, sinfo, rng, counts,
                    custom_procs=self._custom_procs_t,
                )
                if sinfo.need_penalties:
                    counts = update_counts_sampled(counts, next_ids, sinfo)
                return next_ids, tok_lp, new_kv, counts

            self._jit_cache[key] = jax.jit(_step, donate_argnums=(1, 2))
        return self._jit_cache[key]

    # --------------------------------------------------------- penalty state

    def set_max_slots(self, n: int) -> None:
        self._max_slots = n

    def _get_counts(self, need: bool) -> jax.Array:
        """Slot-indexed output-token count matrix (lazy; row S = sentinel
        absorbing padding writes)."""
        if not need:
            if getattr(self, "_dummy_counts", None) is None:
                self._dummy_counts = jnp.zeros((1, 1), dtype=jnp.int32)
            return self._dummy_counts
        if getattr(self, "_penalty_counts", None) is None:
            slots = getattr(self, "_max_slots", 256)
            self._penalty_counts = jnp.zeros(
                (slots + 1, self.model_config.vocab_size), dtype=jnp.int32
            )
            logger.info(
                "penalty count state: %d slots x %d vocab (%.1f MiB)",
                slots,
                self.model_config.vocab_size,
                self._penalty_counts.nbytes / (1 << 20),
            )
        return self._penalty_counts

    def _put_counts(self, need: bool, counts: jax.Array) -> None:
        if need:
            self._penalty_counts = counts
        else:
            self._dummy_counts = counts

    # ------------------------------------------------------------- forward

    def _forward_capture_aux(self, params, kv_layers, fb):
        """EAGLE3 multi-layer feature capture, scan-aware."""
        if self._use_scan:
            return self._model_forward.capture_aux(
                params, kv_layers, fb, self.attn_backend
            )
        return self.model.forward_capture_aux(
            params, kv_layers, fb, self.attn_backend
        )

    def forward_decode(
        self,
        input_ids,  # [b] numpy, or a padded [bb] DEVICE array (overlap mode:
        # the previous step's next_ids — never materialized on host)
        positions: np.ndarray,
        out_cache_loc: np.ndarray,
        page_table: np.ndarray,  # [b, max_pages_per_req]
        seq_lens: np.ndarray,
        sampling_info: SamplingBatchInfo,
        lora_ids: Optional[np.ndarray] = None,
        mrope_delta: Optional[np.ndarray] = None,  # [b] (Qwen2-VL)
    ) -> Tuple[jax.Array, jax.Array]:
        self._chain = None
        b = len(seq_lens)
        bb = pad_to_bucket(b, self.decode_bs_buckets)
        if isinstance(input_ids, jax.Array):
            assert input_ids.shape[0] == bb, (input_ids.shape, bb)
            ids = input_ids
        else:
            ids = _pad(input_ids, bb)
        zero_slot = (
            self.lora_manager.zero_slot if self.lora_manager is not None else 0
        )
        fb = make_decode_batch(
            ids,
            _pad(positions, bb),
            _pad(out_cache_loc, bb),
            _pad2(page_table, bb, self.max_pages_per_req),
            _pad(seq_lens, bb),
            lora_ids=_pad(lora_ids, bb, fill=zero_slot)
            if lora_ids is not None
            else None,
        )
        if mrope_delta is not None:
            fb = dataclasses.replace(
                fb, mrope_delta=jnp.asarray(_pad(mrope_delta, bb))
            )
        logits_indices = jnp.arange(bb, dtype=jnp.int32)
        return self._run(fb, logits_indices, sampling_info)

    def forward_extend(
        self,
        input_ids: np.ndarray,  # [t] packed tokens
        positions: np.ndarray,
        out_cache_loc: np.ndarray,
        page_table: np.ndarray,  # [b, max_pages_per_req]
        seq_lens: np.ndarray,  # [b]
        extend_lens: np.ndarray,  # [b] query lens
        sampling_info: SamplingBatchInfo,
        output_start: Optional[np.ndarray] = None,  # [b] prompt lengths
        lora_ids: Optional[np.ndarray] = None,  # [t] per-token adapter slot
        mm_rows: Optional[np.ndarray] = None,  # [m] packed-row indices
        mm_embeds: Optional[np.ndarray] = None,  # [m, H] image embeddings
        mrope_positions: Optional[np.ndarray] = None,  # [3, t] (Qwen2-VL)
    ) -> Tuple[jax.Array, jax.Array]:
        self._chain = None
        t, b = len(input_ids), len(seq_lens)
        tt = pad_to_bucket(t, self.prefill_token_buckets)
        bb = pad_to_bucket(b, [self.extend_seq_bucket])
        cu = np.zeros(bb + 1, dtype=np.int32)
        cu[1 : b + 1] = np.cumsum(extend_lens)
        cu[b + 1 :] = cu[b]
        fb = make_extend_batch(
            _pad(input_ids, tt),
            _pad(positions, tt),
            _pad(out_cache_loc, tt),
            _pad2(page_table, bb, self.max_pages_per_req),
            _pad(seq_lens, bb),
            cu,
            output_start=_pad(output_start, bb, fill=1 << 30)
            if output_start is not None
            else None,
            lora_ids=_pad(
                lora_ids,
                tt,
                fill=self.lora_manager.zero_slot if self.lora_manager else 0,
            )
            if lora_ids is not None
            else None,
            page_size=self.page_size,
        )
        if mm_rows is not None and len(mm_rows) > 0:
            h = mm_embeds.shape[1]
            rows = np.full(tt, -1, dtype=np.int32)
            rows[: len(mm_rows)] = mm_rows
            emb = np.zeros((tt, h), dtype=np.float32)
            emb[: len(mm_rows)] = mm_embeds
            fb = dataclasses.replace(
                fb, mm_rows=jnp.asarray(rows), mm_embeds=jnp.asarray(emb)
            )
        if mrope_positions is not None:
            p3 = np.zeros((3, tt), dtype=np.int32)
            p3[:, : mrope_positions.shape[1]] = mrope_positions
            fb = dataclasses.replace(fb, mrope_positions=jnp.asarray(p3))
        # last token of each sequence (pad rows point at token 0)
        li = np.zeros(bb, dtype=np.int32)
        li[:b] = cu[1 : b + 1] - 1
        return self._run(fb, jnp.asarray(li), sampling_info)

    def encode_images(self, pixel_values: np.ndarray, grid_thw=None) -> np.ndarray:
        """Vision tower + projector (multimodal models) -> language-space
        embeddings. Grid-native models (Qwen2-VL) take patchified rows +
        a (t, h, w) grid; CLIP-style models take [N, 3, S, S]. One jit
        per input geometry."""
        n = pixel_values.shape[0]
        if grid_thw is not None:
            key = ("vision", n, grid_thw)
            if key not in self._jit_cache:
                self._jit_cache[key] = jax.jit(
                    lambda p, x, g=grid_thw: self.model.encode_images(p, x, g)
                )
            return np.asarray(
                self._jit_cache[key](
                    self.params, jnp.asarray(pixel_values, dtype=jnp.float32)
                )
            )
        key = ("vision", n)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                lambda p, x: self.model.encode_images(p, x)
            )
        return np.asarray(
            self._jit_cache[key](
                self.params, jnp.asarray(pixel_values, dtype=jnp.float32)
            )
        )

    def forward_extend_packed(
        self,
        input_ids: np.ndarray,  # [t] packed ragged tokens
        positions: np.ndarray,
        out_cache_loc: np.ndarray,
        page_table: np.ndarray,
        seq_lens: np.ndarray,
        extend_lens: np.ndarray,
        sampling_meta,  # SamplingMeta
        output_start: Optional[np.ndarray] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Extend forward with ALL host metadata in one i32 + one f32 blob
        (same transfer-amortization as the decode chunks). Returns device
        (next_ids [bb], tok_lp [bb]) — resolution happens at the caller."""
        from sglang_tpu.model_executor.forward_batch_info import (
            EXTEND_QBLK,
            build_attn_blocks,
            build_write_jobs,
        )
        from sglang_tpu.sampling.sampling_batch_info import unpack_sinfo

        self._chain = None
        t, b = len(input_ids), len(seq_lens)
        tt = pad_to_bucket(t, self.prefill_token_buckets)
        bb = pad_to_bucket(b, [self.extend_seq_bucket])
        assert sampling_meta.padded_bs == bb
        pmax = self.max_pages_per_req
        cu = np.zeros(bb + 1, dtype=np.int32)
        cu[1 : b + 1] = np.cumsum(extend_lens)
        cu[b + 1 :] = cu[b]
        token_to_seq = np.clip(
            np.searchsorted(cu, np.arange(tt), side="right") - 1, 0, bb - 1
        ).astype(np.int32)
        total = int(cu[-1])
        valid = np.arange(tt) < total
        if output_start is not None:
            os_pad = _pad(output_start, bb, fill=1 << 30)
            is_out = _pad(positions, tt) >= os_pad[token_to_seq]
        else:
            is_out = np.zeros(tt, dtype=bool)
        token_kind = np.where(valid, np.where(is_out, 2, 1), 0).astype(np.int32)
        nb = tt // EXTEND_QBLK + bb
        blk = build_attn_blocks(cu, _pad(seq_lens, bb), EXTEND_QBLK, nb)
        jmax = tt // self.page_size + 2 * bb
        wr_pages, wr_src = build_write_jobs(
            out_cache_loc, min(total, t), self.page_size, jmax
        )
        i32_parts = [
            _pad(input_ids, tt),
            _pad(positions, tt),
            _pad(out_cache_loc, tt),
            _pad2(page_table, bb, pmax).ravel(),
            _pad(seq_lens, bb),
            cu,
            token_kind,
            token_to_seq,
            *blk,
            wr_pages,
            wr_src.ravel(),
        ]
        i32_blob, f32_blob = sampling_meta.pack(extra_i32=i32_parts)
        # packed upload excludes grammar masks (flag 5 forced off) but
        # keeps everything after it (need_custom)
        flags = (
            tuple(sampling_meta.flags[:5])
            + (False,)
            + tuple(sampling_meta.flags[6:])
        )
        rng = jax.random.fold_in(self.rng_key, self._step_counter)
        self._step_counter += 1
        key = ("extend_packed", tt, bb, nb, flags)
        if key not in self._jit_cache:
            model, backend = self.model, self.attn_backend
            fwd = self._model_forward
            ps_ = self.page_size

            def _extend(params, kv_layers, counts, i32, f32, rng):
                o = 0

                def take(n, shape=None):
                    nonlocal o
                    v = jax.lax.dynamic_slice(i32, (o,), (n,))
                    o += n
                    return v.reshape(shape) if shape else v

                ids = take(tt)
                pos = take(tt)
                loc = take(tt)
                pt = take(bb * pmax, (bb, pmax))
                seq = take(bb)
                cu_d = take(bb + 1)
                kind = take(tt)
                t2s = take(tt)
                bseq, bqoff, bnrows, bpos0 = (
                    take(nb),
                    take(nb),
                    take(nb),
                    take(nb),
                )
                wrp = take(jmax)
                wrs = take(jmax * ps_, (jmax, ps_))
                sinfo = unpack_sinfo(i32, f32, o, bb, flags)
                fb = ForwardBatch(
                    input_ids=ids,
                    positions=pos,
                    out_cache_loc=loc,
                    page_table=pt,
                    seq_lens=seq,
                    cu_q_lens=cu_d,
                    token_to_seq=t2s,
                    token_kind=kind,
                    blk_seq=bseq,
                    blk_qoff=bqoff,
                    blk_nrows=bnrows,
                    blk_pos0=bpos0,
                    state_slots=sinfo.slot_ids
                    if self._needs_state_slots
                    else None,
                    wr_pages=wrp,
                    wr_src=wrs,
                    mode=ForwardMode.EXTEND,
                )
                hidden, new_kv = fwd(params, kv_layers, fb, backend)
                if sinfo.need_penalties:
                    sentinel = counts.shape[0] - 1
                    tslots = jnp.where(
                        kind > 0, sinfo.slot_ids[t2s], sentinel
                    )
                    counts = update_counts_extend(
                        counts, ids, tslots, kind, sinfo.slot_ids,
                        sinfo.fresh_mask,
                    )
                logits_idx = jnp.maximum(cu_d[1:] - 1, 0)
                logits = model.compute_logits(params, hidden[logits_idx])
                next_ids, tok_lp = sample(
                    logits, sinfo, rng, counts,
                    custom_procs=self._custom_procs_t,
                )
                if sinfo.need_penalties:
                    counts = update_counts_sampled(counts, next_ids, sinfo)
                return next_ids, tok_lp, new_kv, counts

            self._jit_cache[key] = jax.jit(_extend, donate_argnums=(1, 2))
        need_pen = sampling_meta.flags[3]
        counts = self._get_counts(need_pen)
        next_ids, tok_lp, new_kv, counts = self._jit_cache[key](
            self.params,
            self.kv_layers,
            counts,
            jnp.asarray(i32_blob),
            jnp.asarray(f32_blob),
            rng,
        )
        self.kv_layers = new_kv
        self._put_counts(need_pen, counts)
        return next_ids, tok_lp

    def _get_multi_fn(self, k_steps: int, flags, bb: int, pmax: int):
        """One jitted K-step decode scan shared by fresh and chained
        dispatches: every cross-chunk quantity (first ids, base seq lens,
        rng key) is an explicit device argument, so a chained chunk costs
        ZERO host->device uploads."""
        from sglang_tpu.sampling.sampling_batch_info import unpack_sinfo

        tail_mode = self._chain_tail
        key = ("multi", k_steps, flags, bb, pmax, tail_mode)
        if key not in self._jit_cache:
            ps = self.page_size
            ctx = self.model_config.context_length
            model, backend = self.model, self.attn_backend
            fwd = self._model_forward
            num_pages = self.num_pages

            def _multi(params, kv_layers, counts, i32, f32, ids0, base, rng):
                nbb = bb
                # i32 blob: page table then packed sampling state
                pt = jax.lax.dynamic_slice(i32, (0,), (nbb * pmax,)).reshape(
                    nbb, pmax
                )
                sinfo = unpack_sinfo(i32, f32, nbb * pmax, nbb, flags)
                rows = jnp.arange(nbb, dtype=jnp.int32)
                valid = base > 0
                if tail_mode:
                    # chain-tail KV batching (ops/chain_tail.py): the K new
                    # rows accumulate in a step-major tail buffer (ONE
                    # leading-axis append per step); one page RMW per
                    # touched page flushes them after the scan
                    pool0 = (
                        kv_layers[0]
                        if isinstance(kv_layers, tuple)
                        else kv_layers
                    )
                    L = model.num_layers
                    kvh2, _, d_ = pool0.shape[1:]
                    tv0 = jnp.zeros(
                        (L, nbb, kvh2, k_steps, d_), pool0.dtype
                    )
                    ts0 = (
                        jnp.zeros((L, nbb, kvh2, k_steps), jnp.float32)
                        if isinstance(kv_layers, tuple)
                        else None
                    )

                def body(carry, k):
                    if tail_mode:
                        kv, tv, ts, cnts, ids, key = carry
                    else:
                        kv, cnts, ids, key = carry
                    pos = jnp.where(valid, base - 1 + k, 0)  # token position
                    in_ctx = pos < ctx
                    loc = jnp.where(
                        valid & in_ctx,
                        pt[rows, pos // ps] * ps + pos % ps,
                        0,
                    )
                    seq = jnp.where(valid, base + k, 0)
                    fb = ForwardBatch(
                        input_ids=ids,
                        positions=pos,
                        out_cache_loc=loc,
                        page_table=pt,
                        seq_lens=seq,
                        cu_q_lens=jnp.arange(nbb + 1, dtype=jnp.int32),
                        token_to_seq=rows,
                        token_kind=jnp.where(valid, 2, 0).astype(jnp.int32),
                        blk_seq=rows,
                        blk_qoff=rows,
                        blk_nrows=valid.astype(jnp.int32),
                        blk_pos0=seq - 1,
                        state_slots=sinfo.slot_ids
                        if self._needs_state_slots
                        else None,
                        mode=ForwardMode.DECODE,
                        tail_step=k if tail_mode else None,
                    )
                    if tail_mode:
                        hidden, kv, new_rows, new_scales = fwd.forward_tail(
                            params, kv, (tv, ts), fb, backend
                        )
                        tv = jax.lax.dynamic_update_slice_in_dim(
                            tv, new_rows[:, :, :, None, :], k, axis=3
                        )
                        if ts is not None:
                            ts = jax.lax.dynamic_update_slice_in_dim(
                                ts, new_scales[..., None], k, axis=3
                            )
                    else:
                        hidden, kv = fwd(params, kv, fb, backend)
                    logits = model.compute_logits(params, hidden)
                    step_key = jax.random.fold_in(key, k)
                    next_ids, tok_lp = sample(
                        logits, sinfo, step_key, cnts,
                        custom_procs=self._custom_procs_t,
                    )
                    if sinfo.need_penalties:
                        cnts = update_counts_sampled(cnts, next_ids, sinfo)
                    out_carry = (
                        (kv, tv, ts, cnts, next_ids, key)
                        if tail_mode
                        else (kv, cnts, next_ids, key)
                    )
                    return out_carry, (next_ids, tok_lp)

                if tail_mode:
                    carry0 = (kv_layers, tv0, ts0, counts, ids0, rng)
                else:
                    carry0 = (kv_layers, counts, ids0, rng)
                final, (all_ids, all_lp) = jax.lax.scan(
                    body, carry0, jnp.arange(k_steps, dtype=jnp.int32)
                )
                if tail_mode:
                    kv_layers, tvf, tsf, counts, last_ids, _ = final
                    from sglang_tpu.ops.chain_tail import (
                        build_tail_flush_jobs,
                        flush_tail,
                    )

                    import os as _os

                    if "flush" not in _os.environ.get(
                        "SGLANG_TAIL_ABLATE", ""
                    ):
                        wrp, wrs = build_tail_flush_jobs(
                            base, pt, k_steps, ps, ctx
                        )
                        kv_layers = flush_tail(
                            kv_layers, tvf, tsf, wrp, wrs, num_pages
                        )
                else:
                    kv_layers, counts, last_ids, _ = final
                # device-side carry for the next chained chunk
                new_base = jnp.where(valid, base + k_steps, base)
                rng_next = jax.random.fold_in(rng, k_steps)
                return (
                    all_ids,
                    all_lp,
                    last_ids,
                    new_base,
                    rng_next,
                    kv_layers,
                    counts,
                )

            self._jit_cache[key] = jax.jit(_multi, donate_argnums=(1, 2))
        return self._jit_cache[key]

    def decode_chain_ready(self) -> bool:
        """True when a chained multi-step chunk can dispatch with zero
        uploads (device state present and the page-table horizon covers
        another k tokens per row)."""
        c = getattr(self, "_chain", None)
        return c is not None and c["horizon_left"] > 0

    def invalidate_decode_chain(self) -> None:
        self._chain = None

    def forward_decode_multi(
        self,
        first_input_ids,  # [b] numpy or [bb] device array (overlap chain)
        base_seq_lens: np.ndarray,  # [b] kv length after the FIRST step
        page_table: np.ndarray,  # [b, Pmax] covering kv_len+horizon*k tokens
        sampling_meta,  # SamplingMeta (host-side numpy)
        k_steps: int,
        horizon: int = 1,
    ):
        """K fused decode steps in one jitted lax.scan (reference
        CUDA-graph'd multi-step decode; here it also amortizes dispatch/
        transfer latency). Slot/position metadata per step is derived ON
        DEVICE from the page table; host metadata ships as ONE i32 + ONE
        f32 blob. With `horizon` > 1 the page table covers horizon*k
        tokens ahead and the next horizon-1 chunks dispatch via
        `forward_decode_multi_chained` with NO uploads at all — base seq
        lens, first ids, and the rng key all carry on device.

        Returns (all_ids [K, bb] dev, all_lp [K, bb] dev, last_ids [bb] dev).
        """
        b = len(base_seq_lens)
        bb = pad_to_bucket(b, self.decode_bs_buckets)
        assert sampling_meta.padded_bs == bb
        pmax = self.max_pages_per_req
        chained_ids = isinstance(first_input_ids, jax.Array)
        i32_blob, f32_blob = sampling_meta.pack(
            extra_i32=[_pad2(page_table, bb, pmax)]
        )
        i32_dev = jnp.asarray(i32_blob)
        f32_dev = jnp.asarray(f32_blob)
        base_dev = jnp.asarray(_pad(base_seq_lens, bb))
        ids0 = (
            first_input_ids
            if chained_ids
            else jnp.asarray(_pad(first_input_ids, bb))
        )
        # packed upload excludes grammar masks (flag 5 forced off) but
        # keeps everything after it (need_custom)
        flags = (
            tuple(sampling_meta.flags[:5])
            + (False,)
            + tuple(sampling_meta.flags[6:])
        )
        rng = jax.random.fold_in(self.rng_key, self._step_counter)
        self._step_counter += k_steps * horizon
        fn = self._get_multi_fn(k_steps, flags, bb, pmax)
        need_pen = sampling_meta.flags[3]
        counts = self._get_counts(need_pen)
        all_ids, all_lp, last_ids, new_base, rng_next, new_kv, counts = fn(
            self.params, self.kv_layers, counts, i32_dev, f32_dev, ids0,
            base_dev, rng,
        )
        self.kv_layers = new_kv
        self._put_counts(need_pen, counts)
        self._chain = {
            "fn": fn,
            "i32": i32_dev,
            "f32": f32_dev,
            "ids": last_ids,
            "base": new_base,
            "rng": rng_next,
            "need_pen": need_pen,
            "k": k_steps,
            "horizon_left": horizon - 1,
        }
        return all_ids, all_lp, last_ids

    def forward_decode_multi_chained(self):
        """Dispatch the next K-step chunk entirely from device-resident
        state — zero host->device transfers (the zero-overhead analogue of
        reference CUDA-graph replay chains)."""
        c = self._chain
        assert c is not None and c["horizon_left"] > 0
        counts = self._get_counts(c["need_pen"])
        all_ids, all_lp, last_ids, new_base, rng_next, new_kv, counts = c["fn"](
            self.params, self.kv_layers, counts, c["i32"], c["f32"],
            c["ids"], c["base"], c["rng"],
        )
        self.kv_layers = new_kv
        self._put_counts(c["need_pen"], counts)
        c.update(
            ids=last_ids, base=new_base, rng=rng_next,
            horizon_left=c["horizon_left"] - 1,
        )
        return all_ids, all_lp, last_ids

    def forward_verify(
        self,
        input_ids: np.ndarray,  # [t] packed (pending + draft tokens per seq)
        positions: np.ndarray,
        out_cache_loc: np.ndarray,
        page_table: np.ndarray,
        seq_lens: np.ndarray,  # [b] kv length after this step
        extend_lens: np.ndarray,  # [b] 1 + num_draft_i
        num_draft: int,
        need_hidden: bool = True,
    ) -> np.ndarray:
        """Target-verify forward: greedy argmax at every packed position
        (reference EAGLEWorker.verify / TARGET_VERIFY mode — here the
        unified ragged extend serves as the verify kernel)."""
        from sglang_tpu.model_executor.forward_batch_info import ForwardMode

        self._chain = None
        t, b = len(input_ids), len(seq_lens)
        bb = pad_to_bucket(b, self.decode_bs_buckets)
        tt = bb * (1 + num_draft)
        cu = np.zeros(bb + 1, dtype=np.int32)
        cu[1 : b + 1] = np.cumsum(extend_lens)
        cu[b + 1 :] = cu[b]
        fb = make_extend_batch(
            _pad(input_ids, tt),
            _pad(positions, tt),
            _pad(out_cache_loc, tt),
            _pad2(page_table, bb, self.max_pages_per_req),
            _pad(seq_lens, bb),
            cu,
            mode=ForwardMode.TARGET_VERIFY,
            page_size=self.page_size,
        )
        if "verify" not in self._jit_cache:

            def _verify(params, kv_layers, fb):
                if self.capture_aux:
                    # EAGLE3: the draft consumes multi-layer aux features
                    hidden, aux, new_kv = self._forward_capture_aux(
                        params, kv_layers, fb
                    )
                else:
                    hidden, new_kv = self._model_forward(
                        params, kv_layers, fb, self.attn_backend
                    )
                    aux = hidden
                logits = self.model.compute_logits(params, hidden)
                return (
                    jnp.argmax(logits, axis=-1).astype(jnp.int32),
                    aux.astype(jnp.float32),
                    new_kv,
                )

            self._jit_cache["verify"] = jax.jit(_verify, donate_argnums=(1,))
        ids, hidden, new_kv = self._jit_cache["verify"](
            self.params, self.kv_layers, fb
        )
        self.kv_layers = new_kv
        # hidden rows feed EAGLE/MTP draft workers (feature capture — the
        # reference's spec workers read these instead of recomputing).
        # NGRAM/host-only drafts skip the fetch: [t, H] f32 per verify
        # round is ~10 MB over the tunneled runtime (measured: it halved
        # ngram spec throughput).
        self._last_verify_hidden = (
            np.asarray(hidden)[:t] if need_hidden else None
        )
        return np.asarray(ids)[:t]

    def forward_embedding(
        self,
        input_ids: np.ndarray,
        positions: np.ndarray,
        out_cache_loc: np.ndarray,
        page_table: np.ndarray,
        seq_lens: np.ndarray,
        extend_lens: np.ndarray,
        pooling: str = "last",
    ) -> np.ndarray:
        """Pooled hidden states per sequence (reference `/encode` +
        `serving_embedding.py`; pooling: last-token or mean)."""
        self._chain = None
        t, b = len(input_ids), len(seq_lens)
        tt = pad_to_bucket(t, self.prefill_token_buckets)
        bb = pad_to_bucket(b, [self.extend_seq_bucket])
        cu = np.zeros(bb + 1, dtype=np.int32)
        cu[1 : b + 1] = np.cumsum(extend_lens)
        cu[b + 1 :] = cu[b]
        fb = make_extend_batch(
            _pad(input_ids, tt),
            _pad(positions, tt),
            _pad(out_cache_loc, tt),
            _pad2(page_table, bb, self.max_pages_per_req),
            _pad(seq_lens, bb),
            cu,
            page_size=self.page_size,
        )
        key = f"embed_{pooling}"
        if key not in self._jit_cache:

            def _embed(params, kv_layers, fb, cu_dev):
                hidden, new_kv = self._model_forward(
                    params, kv_layers, fb, self.attn_backend
                )
                if pooling == "last":
                    idx = jnp.maximum(cu_dev[1:] - 1, 0)
                    pooled = hidden[idx]
                elif pooling == "cls":  # first token (BERT-family [CLS])
                    pooled = hidden[cu_dev[:-1]]
                else:  # mean over each seq's tokens
                    seg = jnp.clip(fb.token_to_seq, 0, bb - 1)
                    valid = (fb.token_kind > 0).astype(hidden.dtype)[:, None]
                    sums = jnp.zeros((bb, hidden.shape[1]), hidden.dtype)
                    sums = sums.at[seg].add(hidden * valid)
                    counts = jnp.zeros((bb, 1), hidden.dtype).at[seg].add(valid)
                    pooled = sums / jnp.maximum(counts, 1)
                if getattr(self.model, "is_classifier", False):
                    # classification/reward head: the "embedding" is the
                    # label logits (reference qwen2_rm.py / llama_classification.py)
                    return self.model.head(params, pooled), new_kv
                return pooled.astype(jnp.float32), new_kv

            self._jit_cache[key] = jax.jit(_embed, donate_argnums=(1,))
        pooled, new_kv = self._jit_cache[key](
            self.params, self.kv_layers, fb, jnp.asarray(cu)
        )
        self.kv_layers = new_kv
        return np.asarray(pooled)[:b]

    def forward_extend_logits(
        self,
        input_ids: np.ndarray,
        positions: np.ndarray,
        out_cache_loc: np.ndarray,
        page_table: np.ndarray,
        seq_lens: np.ndarray,
        extend_lens: np.ndarray,
    ) -> np.ndarray:
        """All-token logits for an extend batch (HF-parity tests, /v1/score,
        prompt logprobs — reference LogitsProcessor extend-logprob path)."""
        self._chain = None
        t, b = len(input_ids), len(seq_lens)
        tt = pad_to_bucket(t, self.prefill_token_buckets)
        bb = pad_to_bucket(b, [self.extend_seq_bucket])
        cu = np.zeros(bb + 1, dtype=np.int32)
        cu[1 : b + 1] = np.cumsum(extend_lens)
        cu[b + 1 :] = cu[b]
        fb = make_extend_batch(
            _pad(input_ids, tt),
            _pad(positions, tt),
            _pad(out_cache_loc, tt),
            _pad2(page_table, bb, self.max_pages_per_req),
            _pad(seq_lens, bb),
            cu,
            page_size=self.page_size,
        )
        if self._needs_state_slots:
            # sinfo-free path (parity tests / scoring): one state slot per
            # batch row
            fb = dataclasses.replace(
                fb, state_slots=jnp.arange(bb, dtype=jnp.int32)
            )
        if "logits_all" not in self._jit_cache:

            def _fwd(params, kv_layers, fb):
                hidden, new_kv = self._model_forward(
                    params, kv_layers, fb, self.attn_backend
                )
                return self.model.compute_logits(params, hidden), new_kv

            self._jit_cache["logits_all"] = jax.jit(_fwd, donate_argnums=(1,))
        logits, new_kv = self._jit_cache["logits_all"](self.params, self.kv_layers, fb)
        self.kv_layers = new_kv
        return np.asarray(logits)[:t]

    def forward_dllm_block(
        self,
        input_ids: np.ndarray,  # [T] current block guesses (masks included)
        positions: np.ndarray,  # [T] true positions (rope)
        mask_positions: np.ndarray,  # [T] attention-mask positions
        out_cache_loc: np.ndarray,
        page_table: np.ndarray,
        seq_lens: np.ndarray,
        extend_lens: np.ndarray,
    ) -> np.ndarray:
        """One dLLM denoising iteration (reference `srt/dllm/algorithm/`):
        all-position logits over the active block with BIDIRECTIONAL
        attention inside the block (mask_positions = block_end-1 for the
        block rows) and causal attention to the prefix. Runs on the jnp
        reference attention backend — the Pallas kernel's block-diffusion
        mask is the perf follow-up."""
        import dataclasses as _dc

        from sglang_tpu.layers.attention.reference_backend import (
            ReferenceAttentionBackend,
        )

        self._chain = None
        t, b = len(input_ids), len(seq_lens)
        tt = pad_to_bucket(t, self.prefill_token_buckets)
        bb = pad_to_bucket(b, [self.extend_seq_bucket])
        cu = np.zeros(bb + 1, dtype=np.int32)
        cu[1 : b + 1] = np.cumsum(extend_lens)
        cu[b + 1 :] = cu[b]
        fb = make_extend_batch(
            _pad(input_ids, tt),
            _pad(positions, tt),
            _pad(out_cache_loc, tt),
            _pad2(page_table, bb, self.max_pages_per_req),
            _pad(seq_lens, bb),
            cu,
            page_size=self.page_size,
        )
        fb = _dc.replace(
            fb, mask_positions=jnp.asarray(_pad(mask_positions, tt))
        )
        if self._needs_state_slots:
            fb = _dc.replace(
                fb, state_slots=jnp.arange(bb, dtype=jnp.int32)
            )
        if "dllm_block" not in self._jit_cache:
            ref_backend = ReferenceAttentionBackend()

            def _fwd(params, kv_layers, fb):
                hidden, new_kv = self._model_forward(
                    params, kv_layers, fb, ref_backend
                )
                return self.model.compute_logits(params, hidden), new_kv

            self._jit_cache["dllm_block"] = jax.jit(_fwd, donate_argnums=(1,))
        logits, new_kv = self._jit_cache["dllm_block"](
            self.params, self.kv_layers, fb
        )
        self.kv_layers = new_kv
        return np.asarray(logits)[:t]

    def forward_extend_hidden(
        self,
        input_ids: np.ndarray,
        positions: np.ndarray,
        out_cache_loc: np.ndarray,
        page_table: np.ndarray,
        seq_lens: np.ndarray,
        extend_lens: np.ndarray,
    ) -> np.ndarray:
        """Post-final-norm hidden states for an extend batch (the EAGLE
        worker's target-feature catch-up; reference captures these as
        `hidden_states` through the spec worker). Rewrites the same KV
        values at out_cache_loc, so re-running over committed tokens is
        harmless."""
        self._chain = None
        t, b = len(input_ids), len(seq_lens)
        tt = pad_to_bucket(t, self.prefill_token_buckets)
        bb = pad_to_bucket(b, [self.extend_seq_bucket])
        cu = np.zeros(bb + 1, dtype=np.int32)
        cu[1 : b + 1] = np.cumsum(extend_lens)
        cu[b + 1 :] = cu[b]
        fb = make_extend_batch(
            _pad(input_ids, tt),
            _pad(positions, tt),
            _pad(out_cache_loc, tt),
            _pad2(page_table, bb, self.max_pages_per_req),
            _pad(seq_lens, bb),
            cu,
            page_size=self.page_size,
        )
        if "hidden_all" not in self._jit_cache:

            def _fwd(params, kv_layers, fb):
                if self.capture_aux:
                    _, aux, new_kv = self._forward_capture_aux(
                        params, kv_layers, fb
                    )
                    return aux.astype(jnp.float32), new_kv
                hidden, new_kv = self._model_forward(
                    params, kv_layers, fb, self.attn_backend
                )
                return hidden.astype(jnp.float32), new_kv

            self._jit_cache["hidden_all"] = jax.jit(_fwd, donate_argnums=(1,))
        hidden, new_kv = self._jit_cache["hidden_all"](self.params, self.kv_layers, fb)
        self.kv_layers = new_kv
        return np.asarray(hidden)[:t]

    def copy_partial_pages(self, pairs) -> None:
        """Copy the first `off` token-slots of page src into page dst for
        each (src, dst, off) — tree-verify scratch pages must carry the
        real KV that shares the boundary page. Donated jit per bucket;
        pad rows write the garbage page 0."""
        if not pairs:
            return
        self._chain = None
        m = len(pairs)
        mb = max(1, next_power_of_2(m))
        src = np.zeros(mb, np.int32)
        dst = np.zeros(mb, np.int32)
        off = np.zeros(mb, np.int32)
        for i, (s_, d_, o_) in enumerate(pairs):
            src[i], dst[i], off[i] = s_, d_, o_
        key = ("pcopy", mb)
        if key not in self._jit_cache:
            ps = self.page_size

            if self._use_scan:
                L, P_ = self.model.num_layers, self.num_pages

                def _copy(kv, src, dst, off):
                    # fused pool: copy every layer's region in one scatter
                    lo = jnp.arange(L, dtype=jnp.int32)[:, None] * P_
                    srcs = (lo + src[None, :]).reshape(-1)
                    dsts = (lo + dst[None, :]).reshape(-1)
                    offs = jnp.tile(off, L)
                    rows = jnp.arange(ps)
                    mask = rows[None, :] < offs[:, None]  # [L*m, ps]
                    scales = None
                    if isinstance(kv, tuple):
                        kv, scales = kv
                    kv = kv.at[dsts].set(
                        jnp.where(mask[:, None, :, None], kv[srcs], kv[dsts])
                    )
                    if scales is None:
                        return kv
                    lanes = jnp.arange(128)
                    smask = lanes[None, :] < offs[:, None]  # [L*m, 128]
                    scales = scales.at[dsts].set(
                        jnp.where(
                            smask[:, None, :], scales[srcs], scales[dsts]
                        )
                    )
                    return (kv, scales)

            else:

                def _copy(kv_layers, src, dst, off):
                    rows = jnp.arange(ps)
                    mask = rows[None, :] < off[:, None]  # [m, ps]
                    # pages are head-major [P, 2kvh, ps, d]: token dim is axis 2
                    return [
                        l.at[dst].set(
                            jnp.where(mask[:, None, :, None], l[src], l[dst])
                        )
                        for l in kv_layers
                    ]

            self._jit_cache[key] = jax.jit(_copy, donate_argnums=(0,))
        self.kv_layers = self._jit_cache[key](
            self.kv_layers, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(off)
        )

    # -------------------------------------------------- KV page host I/O

    def gather_kv_pages(self, pages) -> np.ndarray:
        """Copy KV pages device->host as one [n, L, ...] array (HiCache
        write path). One jitted gather + one transfer; page count padded to
        a power of two so compiles are bucketed.

        int8 KV pools carry a per-page scale plane: the gather returns ONE
        uint8 blob [n, L, page_bytes + scale_bytes] (values' int8 bytes then
        the f32 plane's bytes), so HiCache slabs, the PD TCP transfer, and
        remote stores stay payload-agnostic (reference kvcacheio moves
        opaque per-page buffers the same way)."""
        n = len(pages)
        nb = max(1, next_power_of_2(n))
        key = ("kv_gather", nb)
        if key not in self._jit_cache:

            if self._use_scan:
                L, P_ = self.model.num_layers, self.num_pages

                def _gather(kv, idx):
                    full = jnp.arange(L, dtype=jnp.int32)[:, None] * P_ + idx
                    if isinstance(kv, tuple):
                        return (
                            jnp.swapaxes(kv[0][full], 0, 1),
                            jnp.swapaxes(kv[1][full], 0, 1),
                        )
                    return jnp.swapaxes(kv[full], 0, 1)  # [n, L, ...]

            else:

                def _gather(kv_layers, idx):
                    if isinstance(kv_layers[0], tuple):
                        return (
                            jnp.stack([l[0][idx] for l in kv_layers], axis=1),
                            jnp.stack([l[1][idx] for l in kv_layers], axis=1),
                        )
                    return jnp.stack([l[idx] for l in kv_layers], axis=1)

            self._jit_cache[key] = jax.jit(_gather)
        idx = np.zeros(nb, dtype=np.int32)
        idx[:n] = pages
        out = self._jit_cache[key](self.kv_layers, jnp.asarray(idx))
        return self.fetch_gathered_kv((out, n))

    def _dispatch_kv_gather(self, pages):
        # identical dispatch path to gather_kv_pages, minus the readback
        n = len(pages)
        nb = max(1, next_power_of_2(n))
        key = ("kv_gather", nb)
        if key not in self._jit_cache:
            # build the jit through the sync path at this exact bucket
            # (compile only; the tiny readback is a one-time cost)
            pad = list(pages) + [0] * (nb - n)
            return (None, self.gather_kv_pages(pad), n)
        idx = np.zeros(nb, dtype=np.int32)
        idx[:n] = pages
        out = self._jit_cache[key](self.kv_layers, jnp.asarray(idx))
        return (out, n)

    def gather_kv_pages_async(self, pages):
        """Dispatch the page gather WITHOUT blocking on the readback:
        returns an opaque handle for `fetch_gathered_kv` (called from the
        HiCache worker thread — async spill, reference
        `cache_controller.py` write-through workers). Device execution
        order guarantees the gather reads the pages' current contents
        even if they are freed/rewritten by later dispatches."""
        return self._dispatch_kv_gather(pages)

    def fetch_gathered_kv(self, handle) -> np.ndarray:
        """Blocking half of the page gather (thread-safe: pure readback +
        numpy packing, no jax dispatch)."""
        if len(handle) == 3:  # cold-compile dispatch already fetched
            _, data, n = handle
            return data[:n]
        out, n = handle
        if not self.kv_pool.has_scales:
            return np.asarray(jax.device_get(out))[:n]
        vals, sc = jax.device_get(out)
        vals = np.asarray(vals)[:n]
        sc = np.asarray(sc)[:n]
        L = vals.shape[1]
        blob = np.concatenate(
            [
                vals.reshape(n, L, -1).view(np.uint8),
                sc.reshape(n, L, -1).view(np.uint8),
            ],
            axis=-1,
        )
        return blob

    def scatter_kv_pages(self, pages, data: np.ndarray) -> None:
        """Write host KV pages into the device pool (HiCache load path).
        Donates the pool so XLA updates in place; padding rows target page
        0 (the garbage page) harmlessly. For int8 KV pools `data` is the
        uint8 blob `gather_kv_pages` produced (values bytes + scale-plane
        bytes per page per layer)."""
        self._chain = None
        n = len(pages)
        has_scales = self.kv_pool.has_scales
        if has_scales:
            pool = self.kv_pool
            # store geometry from the pool arrays themselves (int4 packs
            # two values per byte so the stored head dim is halved)
            ref = pool.fused if pool.fused is not None else pool.layers[0]
            vshape = tuple(ref[0].shape[1:])
            vdtype = np.dtype(str(ref[0].dtype))
            vbytes = int(np.prod(vshape)) * vdtype.itemsize
            L = data.shape[1]
            vals = (
                np.ascontiguousarray(data[..., :vbytes])
                .view(vdtype)
                .reshape((n, L) + vshape)
            )
            sc = (
                np.ascontiguousarray(data[..., vbytes:])
                .view(np.float32)
                .reshape(n, L, pool.scale_rows, 128)
            )
            payload = (vals, sc)
        else:
            payload = data
        nb = max(1, next_power_of_2(n))
        key = ("kv_scatter", nb)
        if key not in self._jit_cache:

            if self._use_scan:
                L_, P_ = self.model.num_layers, self.num_pages

                def _scatter(kv, idx, vals):
                    full = jnp.arange(L_, dtype=jnp.int32)[:, None] * P_ + idx
                    if isinstance(kv, tuple):
                        return (
                            kv[0].at[full].set(jnp.swapaxes(vals[0], 0, 1)),
                            kv[1].at[full].set(jnp.swapaxes(vals[1], 0, 1)),
                        )
                    return kv.at[full].set(jnp.swapaxes(vals, 0, 1))

            else:

                def _scatter(kv_layers, idx, vals):
                    if isinstance(kv_layers[0], tuple):
                        return [
                            (
                                l[0].at[idx].set(vals[0][:, i]),
                                l[1].at[idx].set(vals[1][:, i]),
                            )
                            for i, l in enumerate(kv_layers)
                        ]
                    return [
                        l.at[idx].set(vals[:, i])
                        for i, l in enumerate(kv_layers)
                    ]

            self._jit_cache[key] = jax.jit(_scatter, donate_argnums=(0,))
        idx = np.zeros(nb, dtype=np.int32)
        idx[:n] = pages

        def _pad(a):
            if nb == n:
                return a
            pad = np.zeros((nb - n,) + a.shape[1:], dtype=a.dtype)
            return np.concatenate([a, pad], axis=0)

        payload = jax.tree.map(_pad, payload)
        self.kv_layers = self._jit_cache[key](
            self.kv_layers, jnp.asarray(idx), jax.tree.map(jnp.asarray, payload)
        )

    def _run(self, fb: ForwardBatch, logits_indices, sinfo: SamplingBatchInfo):
        rng = jax.random.fold_in(self.rng_key, self._step_counter)
        self._step_counter += 1
        step = self._get_step_fn()
        counts = self._get_counts(sinfo.need_penalties)
        next_ids, tok_lp, new_kv, counts = step(
            self._params(), self.kv_layers, counts, fb, logits_indices, sinfo, rng
        )
        self.kv_layers = new_kv
        self._put_counts(sinfo.need_penalties, counts)
        return next_ids, tok_lp


def _pad(arr: np.ndarray, n: int, fill=0) -> np.ndarray:
    arr = np.asarray(arr)
    if len(arr) == n:
        return arr
    out = np.full(n, fill, dtype=arr.dtype if arr.dtype != np.float64 else np.float32)
    out[: len(arr)] = arr
    return out


def _pad2(arr: np.ndarray, rows: int, cols: int) -> np.ndarray:
    arr = np.asarray(arr)
    out = np.zeros((rows, cols), dtype=np.int32)
    r, c = min(arr.shape[0], rows), min(arr.shape[1], cols)
    out[:r, :c] = arr[:r, :c]
    return out
