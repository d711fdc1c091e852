"""HF config normalization.

Parity with reference `python/sglang/srt/configs/model_config.py` — load the
HuggingFace `config.json`, normalize the fields every subsystem needs
(attention geometry, vocab, rope, norm eps), and attach engine-level
decisions (dtype, quantization, kv-cache dtype, context length).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax.numpy as jnp

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

_DTYPE_MAP = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float16": jnp.bfloat16,  # TPU has no fp16; promote to bf16
    "auto": jnp.bfloat16,
}


def _load_hf_config_dict(model_path: str, revision: Optional[str] = None) -> dict:
    cfg_file = os.path.join(model_path, "config.json")
    if os.path.isfile(cfg_file):
        with open(cfg_file) as f:
            return json.load(f)
    # GGUF checkpoints carry their config in the file's metadata
    from sglang_tpu.model_loader.gguf import find_gguf

    if find_gguf(model_path):
        from sglang_tpu.model_loader.gguf import GGUFIndex

        return GGUFIndex(model_path).hf_config()
    # Fall back to transformers for hub paths / exotic formats.
    from transformers import AutoConfig

    cfg = AutoConfig.from_pretrained(model_path, revision=revision)
    return cfg.to_dict()


@dataclass
class ModelConfig:
    model_path: str
    hf_config: Dict[str, Any] = field(default_factory=dict)

    # Normalized geometry
    architectures: List[str] = field(default_factory=list)
    model_type: str = ""
    hidden_size: int = 0
    num_hidden_layers: int = 0
    num_attention_heads: int = 0
    num_key_value_heads: int = 0
    head_dim: int = 0
    intermediate_size: int = 0
    vocab_size: int = 0
    max_position_embeddings: int = 0
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Optional[dict] = None
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    mlp_bias: bool = False
    sliding_window: Optional[int] = None
    # MoE
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    num_shared_experts: int = 0
    norm_topk_prob: bool = False
    # Engine-level
    dtype: Any = jnp.bfloat16
    context_length: int = 0
    quantization: Optional[str] = None
    quant_config: Optional[dict] = None
    kv_cache_dtype: str = "auto"
    # SP for the dense parts of MoE models (reference moe_dense_tp_size,
    # `server_args.py:645`): 1 = replicate dense-MLP weights and shard the
    # TOKEN axis over "model", skipping the per-layer all-reduce the dense
    # parts would otherwise pay
    moe_dense_tp_size: Optional[int] = None
    bos_token_id: Optional[int] = None
    eos_token_ids: List[int] = field(default_factory=list)

    @classmethod
    def from_server_args(cls, server_args) -> "ModelConfig":
        return cls.load(
            server_args.model_path,
            dtype=server_args.dtype,
            context_length=server_args.context_length,
            quantization=server_args.quantization,
            kv_cache_dtype=server_args.kv_cache_dtype,
            override=server_args.model_override(),
            revision=server_args.revision,
            moe_dense_tp_size=getattr(server_args, "moe_dense_tp_size", None),
        )

    @classmethod
    def load(
        cls,
        model_path: str,
        dtype: str = "bfloat16",
        context_length: Optional[int] = None,
        quantization: Optional[str] = None,
        kv_cache_dtype: str = "auto",
        override: Optional[dict] = None,
        revision: Optional[str] = None,
        moe_dense_tp_size: Optional[int] = None,
    ) -> "ModelConfig":
        if "://" in model_path:
            from sglang_tpu.connector import resolve_model_path

            model_path = resolve_model_path(model_path)
        hf = _load_hf_config_dict(model_path, revision)
        if override:
            hf.update(override)
        return cls.from_hf_dict(
            hf,
            model_path=model_path,
            dtype=dtype,
            context_length=context_length,
            quantization=quantization,
            kv_cache_dtype=kv_cache_dtype,
        )._with_dense_sp(moe_dense_tp_size)

    @classmethod
    def from_hf_dict(
        cls,
        hf: dict,
        model_path: str = "",
        dtype: str = "bfloat16",
        context_length: Optional[int] = None,
        quantization: Optional[str] = None,
        kv_cache_dtype: str = "auto",
    ) -> "ModelConfig":
        if "text_config" in hf:
            # multimodal wrapper configs (llava, qwen2-vl, ...): language
            # -model fields live in the nested text_config. Top-level keys
            # win when present (qwen2-vl duplicates geometry there); the
            # nested dict fills the gaps (llava keeps everything nested).
            tc = hf["text_config"]
            if not isinstance(tc, dict):
                tc = tc.to_dict()
            merged = dict(hf)
            for k, v in tc.items():
                merged.setdefault(k, v)
            # the wrapper owns the architecture identity
            if hf.get("architectures"):
                merged["architectures"] = hf["architectures"]
            if hf.get("model_type"):
                merged["model_type"] = hf["model_type"]
            hf = merged
        # GPT-2-era field aliases (gpt2, gpt_bigcode, gpt-j configs)
        for src, dst in (
            ("n_embd", "hidden_size"),
            ("n_layer", "num_hidden_layers"),
            ("n_head", "num_attention_heads"),
            ("n_positions", "max_position_embeddings"),
            ("n_inner", "intermediate_size"),
            ("ffn_hidden_size", "intermediate_size"),  # falcon
            ("ffn_dim", "intermediate_size"),  # opt
            ("d_model", "hidden_size"),  # dbrx
            ("n_heads", "num_attention_heads"),  # dbrx
            ("n_layers", "num_hidden_layers"),  # dbrx
            ("max_seq_len", "max_position_embeddings"),  # dbrx
            ("layer_norm_epsilon", "rms_norm_eps"),
            ("norm_eps", "rms_norm_eps"),  # lfm2
        ):
            if hf.get(src) is not None and dst not in hf:
                hf = dict(hf)
                hf[dst] = hf[src]
        if hf.get("intermediate_size") is None and (
            hf.get("n_embd")
            or (hf.get("model_type") == "falcon" and hf.get("hidden_size"))
        ):
            # GPT-2/Falcon-style configs: FFN defaults to 4x hidden.
            # (Only for those families — SSM configs like mamba2 have no
            # FFN and derive their projections from `expand` instead.)
            hf = dict(hf)
            hf["intermediate_size"] = 4 * (
                hf.get("n_embd") or hf["hidden_size"]
            )
        if hf.get("model_type") == "falcon":
            # falcon's config carries num_kv_heads, but the CLASSIC
            # decoder ignores it: multi_query wins (1 kv head), else MHA
            hf = dict(hf)
            if hf.get("new_decoder_architecture"):
                hf["num_key_value_heads"] = (
                    hf.get("num_kv_heads") or hf.get("num_attention_heads")
                )
            elif hf.get("multi_query", True):
                hf["num_key_value_heads"] = 1
            else:
                hf["num_key_value_heads"] = hf.get("num_attention_heads")
        if hf.get("multi_query") and "num_key_value_heads" not in hf:
            hf = dict(hf)
            hf["num_key_value_heads"] = 1
        n_heads = hf.get("num_attention_heads", 0)
        hidden = hf.get("hidden_size", 0)
        head_dim = hf.get("head_dim") or (hidden // n_heads if n_heads else 0)
        kv_heads = hf.get("num_key_value_heads") or n_heads
        max_pos = hf.get("max_position_embeddings", 4096)
        eos = hf.get("eos_token_id")
        if eos is None:
            eos_ids = []
        elif isinstance(eos, int):
            eos_ids = [eos]
        else:
            eos_ids = list(eos)
        quant_config = hf.get("quantization_config")
        if quantization is None and quant_config is not None:
            qm = quant_config.get("quant_method", "").lower()
            if qm in ("awq", "gptq"):
                quantization = qm
            elif qm in ("fp8",):
                quantization = (
                    "fp8_block"
                    if quant_config.get("weight_block_size")
                    else "fp8"
                )
            elif qm == "compressed-tensors":
                # scheme from the first config group (llm-compressor
                # emits one group for the linear layers)
                groups = quant_config.get("config_groups", {})
                g0 = next(iter(groups.values()), {}) if groups else {}
                wcfg = g0.get("weights") or {}
                wbits = wcfg.get("num_bits", 8)
                acts = g0.get("input_activations")
                if wcfg.get("type") == "float" and wbits == 8:
                    quantization = "fp8"  # ct FP8 scheme (per-channel)
                elif wbits == 8:
                    quantization = "w8a8_int8" if acts else "int8"
                else:
                    quantization = "int4"
        cfg = cls(
            model_path=model_path,
            hf_config=hf,
            architectures=hf.get("architectures", []) or [],
            model_type=hf.get("model_type", ""),
            hidden_size=hidden,
            num_hidden_layers=hf.get("num_hidden_layers", 0),
            num_attention_heads=n_heads,
            num_key_value_heads=kv_heads,
            head_dim=head_dim,
            intermediate_size=hf.get("intermediate_size", 0),
            vocab_size=hf.get("vocab_size", 0),
            max_position_embeddings=max_pos,
            rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
            rope_theta=hf.get("rope_theta", 10000.0),
            rope_scaling=hf.get("rope_scaling"),
            # HF PretrainedConfig defaults tying to True; a null/absent
            # value in config.json means "unset", not False (starcoder2
            # saves null and ships no lm_head tensor)
            tie_word_embeddings=(
                True
                if hf.get("tie_word_embeddings") is None
                else bool(hf["tie_word_embeddings"])
            ),
            attention_bias=hf.get("attention_bias", False)
            or hf.get("qkv_bias", False),
            mlp_bias=hf.get("mlp_bias", False),
            sliding_window=hf.get("sliding_window"),
            num_experts=hf.get("num_experts", 0)
            or hf.get("num_local_experts", 0)
            or hf.get("n_routed_experts", 0),
            num_experts_per_tok=hf.get("num_experts_per_tok", 0),
            moe_intermediate_size=hf.get("moe_intermediate_size", 0),
            num_shared_experts=hf.get("n_shared_experts", 0) or 0,
            norm_topk_prob=hf.get("norm_topk_prob", False),
            dtype=_DTYPE_MAP.get(dtype, jnp.bfloat16),
            context_length=context_length or max_pos,
            quantization=quantization,
            quant_config=quant_config,
            kv_cache_dtype=kv_cache_dtype,
            bos_token_id=hf.get("bos_token_id"),
            eos_token_ids=eos_ids,
        )
        return cfg

    def _with_dense_sp(self, moe_dense_tp_size):
        if moe_dense_tp_size is not None:
            self.moe_dense_tp_size = moe_dense_tp_size
        return self

    @property
    def is_hybrid(self) -> bool:
        """True when some layers use linear attention / recurrent state
        instead of paged KV (Qwen3-Next, Mamba2, Mamba hybrids) — prefix
        caching is disabled because recurrent state cannot be
        prefix-shared (reference mamba_radix_cache gating)."""
        lt = (
            self.hf_config.get("layer_types")
            or self.hf_config.get("layers_block_type")
            or ()
        )
        return (
            "linear_attention" in lt
            or "mamba" in lt
            or "conv" in lt  # LFM2 short-conv layers
            or self.model_type in ("mamba2", "falcon_mamba", "falcon_h1")
            or bool(self.hf_config.get("attn_layer_indices"))
        )

    @property
    def kv_head_dim_total(self) -> int:
        return self.num_key_value_heads * self.head_dim

    def kv_cache_bytes_per_token(self) -> int:
        """Bytes of KV storage per token (all layers, this-host shard)."""
        if self.kv_cache_dtype == "int8":
            # int8 values + per-(token, head) f32 scale sidecar
            per_head = self.head_dim + 4
            return 2 * self.num_hidden_layers * self.num_key_value_heads * per_head
        if self.kv_cache_dtype == "int4":
            # nibble-packed values + per-(token, head) f32 scale sidecar
            per_head = self.head_dim // 2 + 4
            return 2 * self.num_hidden_layers * self.num_key_value_heads * per_head
        elem = 1 if self.kv_cache_dtype.startswith("fp8") else 2
        return 2 * self.num_hidden_layers * self.kv_head_dim_total * elem

    def get_total_num_params(self) -> int:
        h, i, v, L = (
            self.hidden_size,
            self.intermediate_size,
            self.vocab_size,
            self.num_hidden_layers,
        )
        q = self.num_attention_heads * self.head_dim
        kv = self.kv_head_dim_total
        per_layer = h * (q + 2 * kv) + q * h + 3 * h * i
        if self.num_experts:
            per_layer = h * (q + 2 * kv) + q * h + 3 * h * (
                self.moe_intermediate_size or i
            ) * self.num_experts
        embed = v * h * (1 if self.tie_word_embeddings else 2)
        return per_layer * L + embed
