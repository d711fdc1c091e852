"""GGUF checkpoint reader.

Parity with reference GGUF support (`model_loader/loader.py` GGUF branch
+ `--load-format gguf`): serve llama.cpp-ecosystem checkpoints directly.
Implemented from the public GGUF/GGML format specification
(github.com/ggml-org/ggml/blob/master/docs/gguf.md):

- container: "GGUF" magic, v2/v3 little-endian, metadata KV section,
  tensor info table, aligned data blob.
- dequantization for the common tensor types: F32, F16, BF16, Q8_0,
  Q4_0, Q4_1, Q4_K, Q5_K, Q6_K (the Q4_K_M / Q5_K_M family used by most
  published GGUF files).
- llama.cpp tensor-name mapping (token_embd, blk.N.attn_q, ...) back to
  HF names, including the INVERSE of llama.cpp's Q/K row permutation
  (its conversion interleaves rope pairs; we restore HF layout so the
  standard rotary path applies).
- model config recovered from GGUF metadata when no config.json exists.

The reader presents the same `.has(name)` / `.get(name)` surface as
`SafetensorsIndex`, so every WeightRule and quantize path works on GGUF
checkpoints unchanged (weights arrive dequantized to f32; on-the-fly
int8/int4 requantization via --quantization still applies).
"""

from __future__ import annotations

import os
import struct
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

_GGUF_MAGIC = b"GGUF"

# metadata value types
_T_U8, _T_I8, _T_U16, _T_I16, _T_U32, _T_I32, _T_F32, _T_BOOL = range(8)
_T_STR, _T_ARR, _T_U64, _T_I64, _T_F64 = 8, 9, 10, 11, 12

_SCALAR_FMT = {
    _T_U8: "<B", _T_I8: "<b", _T_U16: "<H", _T_I16: "<h",
    _T_U32: "<I", _T_I32: "<i", _T_F32: "<f", _T_U64: "<Q",
    _T_I64: "<q", _T_F64: "<d",
}

# ggml tensor types (id -> (block_elems, block_bytes))
GGML_F32, GGML_F16 = 0, 1
GGML_Q4_0, GGML_Q4_1 = 2, 3
GGML_Q8_0 = 8
GGML_Q4_K, GGML_Q5_K, GGML_Q6_K = 12, 13, 14
GGML_BF16 = 30

_BLOCK = {
    GGML_F32: (1, 4),
    GGML_F16: (1, 2),
    GGML_BF16: (1, 2),
    GGML_Q4_0: (32, 18),
    GGML_Q4_1: (32, 20),
    GGML_Q8_0: (32, 34),
    GGML_Q4_K: (256, 144),
    GGML_Q5_K: (256, 176),
    GGML_Q6_K: (256, 210),
}


class _Reader:
    def __init__(self, buf: memoryview):
        self.buf = buf
        self.pos = 0

    def scalar(self, t: int):
        fmt = _SCALAR_FMT[t]
        size = struct.calcsize(fmt)
        (v,) = struct.unpack_from(fmt, self.buf, self.pos)
        self.pos += size
        return v

    def string(self) -> str:
        n = self.scalar(_T_U64)
        s = bytes(self.buf[self.pos : self.pos + n]).decode("utf-8", "replace")
        self.pos += n
        return s

    def value(self, t: int):
        if t == _T_BOOL:
            return bool(self.scalar(_T_U8))
        if t == _T_STR:
            return self.string()
        if t == _T_ARR:
            et = self.scalar(_T_U32)
            n = self.scalar(_T_U64)
            return [self.value(et) for _ in range(n)]
        return self.scalar(t)


# ------------------------------------------------------------ dequant


def _f16(u16: np.ndarray) -> np.ndarray:
    return u16.view(np.float16).astype(np.float32)


def _dequant(ttype: int, raw: np.ndarray, n_elems: int) -> np.ndarray:
    """raw uint8 blob -> f32 [n_elems] (row-major as stored)."""
    if ttype == GGML_F32:
        return raw.view(np.float32)[:n_elems].astype(np.float32)
    if ttype == GGML_F16:
        return raw.view(np.float16)[:n_elems].astype(np.float32)
    if ttype == GGML_BF16:
        out = np.zeros(n_elems, dtype=np.uint32)
        out[:] = raw.view(np.uint16)[:n_elems].astype(np.uint32) << 16
        return out.view(np.float32).copy()
    be, bb = _BLOCK[ttype]
    nb = n_elems // be
    blocks = raw[: nb * bb].reshape(nb, bb)
    if ttype == GGML_Q8_0:
        d = _f16(blocks[:, 0:2].copy().view(np.uint16)[:, 0])  # [nb]
        qs = blocks[:, 2:34].view(np.int8).astype(np.float32)
        return (qs * d[:, None]).reshape(-1)[:n_elems]
    if ttype == GGML_Q4_0:
        d = _f16(blocks[:, 0:2].copy().view(np.uint16)[:, 0])
        q = blocks[:, 2:18]
        lo = (q & 0x0F).astype(np.int8) - 8
        hi = (q >> 4).astype(np.int8) - 8
        vals = np.concatenate([lo, hi], axis=1).astype(np.float32)  # [nb, 32]
        return (vals * d[:, None]).reshape(-1)[:n_elems]
    if ttype == GGML_Q4_1:
        d = _f16(blocks[:, 0:2].copy().view(np.uint16)[:, 0])
        m = _f16(blocks[:, 2:4].copy().view(np.uint16)[:, 0])
        q = blocks[:, 4:20]
        lo = (q & 0x0F).astype(np.float32)
        hi = (q >> 4).astype(np.float32)
        vals = np.concatenate([lo, hi], axis=1)
        return (vals * d[:, None] + m[:, None]).reshape(-1)[:n_elems]
    if ttype == GGML_Q6_K:
        # layout: ql[128] qh[64] scales[16 i8] d[f16]
        ql = blocks[:, 0:128]
        qh = blocks[:, 128:192]
        sc = blocks[:, 192:208].view(np.int8).astype(np.float32)  # [nb,16]
        d = _f16(blocks[:, 208:210].copy().view(np.uint16)[:, 0])
        q = np.zeros((nb, 256), dtype=np.float32)
        for g in range(2):  # two 128-element halves
            hi = qh[:, g * 32 : g * 32 + 32]
            # elements l in [0,32): four 6-bit values share qh byte bits
            base = g * 128
            l32 = np.arange(32)
            q[:, base + l32] = (
                (ql[:, g * 64 + l32] & 0x0F)
                | (((hi[:, l32] >> 0) & 3) << 4)
            ).astype(np.float32) - 32.0
            q[:, base + 32 + l32] = (
                (ql[:, g * 64 + 32 + l32] & 0x0F)
                | (((hi[:, l32] >> 2) & 3) << 4)
            ).astype(np.float32) - 32.0
            q[:, base + 64 + l32] = (
                (ql[:, g * 64 + l32] >> 4) | (((hi[:, l32] >> 4) & 3) << 4)
            ).astype(np.float32) - 32.0
            q[:, base + 96 + l32] = (
                (ql[:, g * 64 + 32 + l32] >> 4)
                | (((hi[:, l32] >> 6) & 3) << 4)
            ).astype(np.float32) - 32.0
        scale_per_elem = np.repeat(sc, 16, axis=1)  # [nb, 256]
        return (d[:, None] * scale_per_elem * q).reshape(-1)[:n_elems]
    if ttype in (GGML_Q4_K, GGML_Q5_K):
        # layout: d[f16] dmin[f16] scales[12] qs (+qh[32] for Q5_K)
        d = _f16(blocks[:, 0:2].copy().view(np.uint16)[:, 0])
        dmin = _f16(blocks[:, 2:4].copy().view(np.uint16)[:, 0])
        scb = blocks[:, 4:16]  # 12 bytes: 8x(6-bit scale, 6-bit min)
        sc = np.zeros((nb, 8), dtype=np.float32)
        mn = np.zeros((nb, 8), dtype=np.float32)
        for j in range(8):  # standard K-quant 6-bit unpack
            if j < 4:
                sc[:, j] = (scb[:, j] & 63).astype(np.float32)
                mn[:, j] = (scb[:, j + 4] & 63).astype(np.float32)
            else:
                sc[:, j] = (
                    (scb[:, j + 4] & 0x0F) | ((scb[:, j - 4] >> 6) << 4)
                ).astype(np.float32)
                mn[:, j] = (
                    (scb[:, j + 4] >> 4) | ((scb[:, j] >> 6) << 4)
                ).astype(np.float32)
        if ttype == GGML_Q4_K:
            qs = blocks[:, 16:144]
            vals = np.zeros((nb, 256), dtype=np.float32)
            for g in range(4):  # 4 chunks of 64: 32 low then 32 high nibbles
                chunk = qs[:, g * 32 : g * 32 + 32]
                vals[:, g * 64 : g * 64 + 32] = (chunk & 0x0F).astype(np.float32)
                vals[:, g * 64 + 32 : g * 64 + 64] = (chunk >> 4).astype(np.float32)
        else:  # Q5_K: extra high-bit plane
            qh = blocks[:, 16:48]
            qs = blocks[:, 48:176]
            vals = np.zeros((nb, 256), dtype=np.float32)
            for g in range(4):
                chunk = qs[:, g * 32 : g * 32 + 32]
                hb_lo = ((qh >> (2 * g)) & 1)[:, :32].astype(np.float32)
                hb_hi = ((qh >> (2 * g + 1)) & 1)[:, :32].astype(np.float32)
                vals[:, g * 64 : g * 64 + 32] = (
                    (chunk & 0x0F).astype(np.float32) + hb_lo * 16.0
                )
                vals[:, g * 64 + 32 : g * 64 + 64] = (
                    (chunk >> 4).astype(np.float32) + hb_hi * 16.0
                )
        sub = np.repeat(np.arange(8), 32)  # element -> sub-block
        out = d[:, None] * sc[:, sub] * vals - dmin[:, None] * mn[:, sub]
        return out.reshape(-1)[:n_elems]
    raise ValueError(f"unsupported ggml tensor type {ttype}")


# ------------------------------------------------------------- container


class GGUFFile:
    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            data = f.read()
        self._data = memoryview(data)
        r = _Reader(self._data)
        assert bytes(self._data[:4]) == _GGUF_MAGIC, "not a GGUF file"
        r.pos = 4
        version = r.scalar(_T_U32)
        assert version in (2, 3), f"unsupported GGUF version {version}"
        n_tensors = r.scalar(_T_U64)
        n_kv = r.scalar(_T_U64)
        self.metadata: Dict[str, Any] = {}
        for _ in range(n_kv):
            key = r.string()
            t = r.scalar(_T_U32)
            self.metadata[key] = r.value(t)
        self.tensors: Dict[str, Tuple[List[int], int, int]] = {}
        for _ in range(n_tensors):
            name = r.string()
            nd = r.scalar(_T_U32)
            dims = [r.scalar(_T_U64) for _ in range(nd)]
            ttype = r.scalar(_T_U32)
            off = r.scalar(_T_U64)
            self.tensors[name] = (dims, ttype, off)
        align = self.metadata.get("general.alignment", 32)
        self._base = (r.pos + align - 1) // align * align

    def get(self, name: str) -> np.ndarray:
        dims, ttype, off = self.tensors[name]
        n = 1
        for d in dims:
            n *= d
        be, bb = _BLOCK[ttype]
        nbytes = (n // be) * bb if be > 1 else n * bb
        raw = np.frombuffer(
            self._data, dtype=np.uint8, count=nbytes, offset=self._base + off
        )
        flat = _dequant(ttype, raw, n)
        # GGUF dims are [ne0 (contiguous), ne1, ...]; numpy wants reversed
        return flat.reshape(list(reversed(dims)))


# --------------------------------------------------------- HF adaptation


def _unpermute(w: np.ndarray, n_heads: int) -> np.ndarray:
    """Invert llama.cpp's Q/K permutation. Its converter applies
    `reshape(n_head, 2, d/2, in).swapaxes(1, 2)` (HF -> GGUF, grouping
    rope half-pairs); the inverse regroups with the axes swapped."""
    out_f, in_f = w.shape
    return (
        w.reshape(n_heads, out_f // n_heads // 2, 2, in_f)
        .swapaxes(1, 2)
        .reshape(out_f, in_f)
    )


class GGUFIndex:
    """SafetensorsIndex-compatible view over a GGUF checkpoint: HF tensor
    names in, dequantized f32 arrays out."""

    def __init__(self, path: str):
        if os.path.isdir(path):
            ggufs = [p for p in sorted(os.listdir(path)) if p.endswith(".gguf")]
            assert ggufs, f"no .gguf in {path}"
            path = os.path.join(path, ggufs[0])
        self.f = GGUFFile(path)
        md = self.f.metadata
        arch = md.get("general.architecture", "llama")
        self.n_heads = md.get(f"{arch}.attention.head_count", 1)
        self.n_kv_heads = md.get(
            f"{arch}.attention.head_count_kv", self.n_heads
        )
        self.name_map = self._build_name_map()

    def _build_name_map(self) -> Dict[str, str]:
        m = {
            "model.embed_tokens.weight": "token_embd.weight",
            "model.norm.weight": "output_norm.weight",
            "lm_head.weight": "output.weight",
        }
        sub = {
            "input_layernorm.weight": "attn_norm.weight",
            "post_attention_layernorm.weight": "ffn_norm.weight",
            "self_attn.q_proj.weight": "attn_q.weight",
            "self_attn.k_proj.weight": "attn_k.weight",
            "self_attn.v_proj.weight": "attn_v.weight",
            "self_attn.o_proj.weight": "attn_output.weight",
            "mlp.gate_proj.weight": "ffn_gate.weight",
            "mlp.up_proj.weight": "ffn_up.weight",
            "mlp.down_proj.weight": "ffn_down.weight",
            "self_attn.q_proj.bias": "attn_q.bias",
            "self_attn.k_proj.bias": "attn_k.bias",
            "self_attn.v_proj.bias": "attn_v.bias",
        }
        i = 0
        while f"blk.{i}.attn_q.weight" in self.f.tensors:
            for hf, gg in sub.items():
                m[f"model.layers.{i}.{hf}"] = f"blk.{i}.{gg}"
            i += 1
        return m

    def has(self, name: str) -> bool:
        gg = self.name_map.get(name)
        return gg is not None and gg in self.f.tensors

    def get(self, name: str) -> np.ndarray:
        w = self.f.get(self.name_map[name])
        if ".self_attn.q_proj.weight" in name:
            w = _unpermute(w, self.n_heads)
        elif ".self_attn.k_proj.weight" in name:
            w = _unpermute(w, self.n_kv_heads)
        return w

    def close(self):
        pass

    # ---------------------------------------------------------- config

    def hf_config(self) -> Dict[str, Any]:
        """Recover an HF-style config dict from GGUF metadata (used when
        the checkpoint ships without config.json)."""
        md = self.f.metadata
        arch = md.get("general.architecture", "llama")

        def g(key, default=None):
            return md.get(f"{arch}.{key}", default)

        vocab = md.get("tokenizer.ggml.tokens")
        vocab_size = len(vocab) if vocab else g("vocab_size", 32000)
        cfg = {
            "architectures": ["LlamaForCausalLM"],
            "model_type": "llama",
            "hidden_size": g("embedding_length"),
            "num_hidden_layers": g("block_count"),
            "num_attention_heads": g("attention.head_count"),
            "num_key_value_heads": g(
                "attention.head_count_kv", g("attention.head_count")
            ),
            "intermediate_size": g("feed_forward_length"),
            "max_position_embeddings": g("context_length", 4096),
            "rms_norm_eps": g("attention.layer_norm_rms_epsilon", 1e-5),
            "rope_theta": g("rope.freq_base", 10000.0),
            "vocab_size": vocab_size,
            "tie_word_embeddings": "output.weight" not in self.f.tensors,
            "torch_dtype": "float32",
        }
        if md.get("tokenizer.ggml.bos_token_id") is not None:
            cfg["bos_token_id"] = md["tokenizer.ggml.bos_token_id"]
        if md.get("tokenizer.ggml.eos_token_id") is not None:
            cfg["eos_token_id"] = md["tokenizer.ggml.eos_token_id"]
        if arch == "qwen2":
            cfg["architectures"] = ["Qwen2ForCausalLM"]
            cfg["model_type"] = "qwen2"
        return cfg


def find_gguf(model_path: str) -> Optional[str]:
    if model_path.endswith(".gguf") and os.path.isfile(model_path):
        return model_path
    if os.path.isdir(model_path):
        for p in sorted(os.listdir(model_path)):
            if p.endswith(".gguf"):
                return os.path.join(model_path, p)
    return None
