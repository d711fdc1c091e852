"""GGUF checkpoint loading (reference GGUF load-format support): container
parsing, dequantization, llama.cpp name mapping + Q/K unpermutation, and
an end-to-end engine drive that must match HF greedy token-for-token."""

import json
import os
import struct
import uuid

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sglang_tpu.model_loader.gguf import (
    GGML_F16,
    GGML_F32,
    GGML_Q4_0,
    GGML_Q8_0,
    GGUFFile,
    GGUFIndex,
    _dequant,
)

# ----------------------------------------------------------- test writer


def _w_str(out, s: str):
    b = s.encode()
    out.append(struct.pack("<Q", len(b)))
    out.append(b)


def _w_kv(out, key, val):
    _w_str(out, key)
    if isinstance(val, bool):
        out.append(struct.pack("<I", 7))
        out.append(struct.pack("<B", int(val)))
    elif isinstance(val, int):
        out.append(struct.pack("<I", 4))  # u32
        out.append(struct.pack("<I", val))
    elif isinstance(val, float):
        out.append(struct.pack("<I", 6))
        out.append(struct.pack("<f", val))
    elif isinstance(val, str):
        out.append(struct.pack("<I", 8))
        _w_str(out, val)
    else:
        raise TypeError(type(val))


def _quant_q8_0(flat: np.ndarray) -> bytes:
    blocks = flat.reshape(-1, 32).astype(np.float32)
    d = np.abs(blocks).max(axis=1) / 127.0
    d = np.where(d == 0, 1e-8, d)
    q = np.clip(np.round(blocks / d[:, None]), -127, 127).astype(np.int8)
    out = bytearray()
    for i in range(len(blocks)):
        out += np.float16(d[i]).tobytes()
        out += q[i].tobytes()
    return bytes(out)


def write_gguf(path, meta: dict, tensors: dict, ttype=GGML_F32):
    """Minimal GGUF v3 writer (test-only)."""
    out = []
    out.append(b"GGUF")
    out.append(struct.pack("<I", 3))
    out.append(struct.pack("<Q", len(tensors)))
    out.append(struct.pack("<Q", len(meta)))
    for k, v in meta.items():
        _w_kv(out, k, v)
    blobs, offsets = [], []
    off = 0
    for name, arr in tensors.items():
        arr32 = np.ascontiguousarray(arr, dtype=np.float32)
        if ttype == GGML_F32 or arr32.size % 32:
            blob, tt = arr32.tobytes(), GGML_F32
        elif ttype == GGML_F16:
            blob, tt = arr32.astype(np.float16).tobytes(), GGML_F16
        else:
            blob, tt = _quant_q8_0(arr32.reshape(-1)), GGML_Q8_0
        # GGUF dims are reversed vs numpy
        dims = list(reversed(arr32.shape))
        out.append(struct.pack("<Q", len(name)) + name.encode())
        out.append(struct.pack("<I", len(dims)))
        for d in dims:
            out.append(struct.pack("<Q", d))
        out.append(struct.pack("<I", tt))
        out.append(struct.pack("<Q", off))
        blobs.append(blob)
        off += (len(blob) + 31) // 32 * 32
    header = b"".join(out)
    pad = (-len(header)) % 32
    with open(path, "wb") as f:
        f.write(header + b"\x00" * pad)
        for blob in blobs:
            f.write(blob)
            f.write(b"\x00" * ((-len(blob)) % 32))


# ------------------------------------------------------------- dequants


def test_dequant_f32_f16_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(64).astype(np.float32)
    assert np.allclose(_dequant(GGML_F32, np.frombuffer(x.tobytes(), np.uint8), 64), x)
    h = _dequant(
        GGML_F16, np.frombuffer(x.astype(np.float16).tobytes(), np.uint8), 64
    )
    assert np.allclose(h, x, atol=2e-3)


def test_dequant_q8_0_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(96).astype(np.float32)
    raw = np.frombuffer(_quant_q8_0(x), dtype=np.uint8)
    y = _dequant(GGML_Q8_0, raw, 96)
    assert np.abs(y - x).max() < np.abs(x).max() / 100


def test_dequant_q4_0():
    # hand-built block: d=0.5, nibbles 0..15 then 15..0
    d = np.float16(0.5).tobytes()
    lo = np.arange(16, dtype=np.uint8)
    hi = np.arange(16, dtype=np.uint8)[::-1]
    qs = (lo | (hi << 4)).astype(np.uint8).tobytes()
    raw = np.frombuffer(d + qs, dtype=np.uint8)
    y = _dequant(GGML_Q4_0, raw, 32)
    exp = np.concatenate([np.arange(16) - 8, (np.arange(16)[::-1]) - 8]) * 0.5
    assert np.allclose(y, exp)


# --------------------------------------------------------- file + index


def _tiny_meta(vocab=256):
    return {
        "general.architecture": "llama",
        "llama.embedding_length": 64,
        "llama.block_count": 2,
        "llama.attention.head_count": 4,
        "llama.attention.head_count_kv": 2,
        "llama.feed_forward_length": 128,
        "llama.context_length": 256,
        "llama.attention.layer_norm_rms_epsilon": 1e-6,
        "llama.rope.freq_base": 10000.0,
        "llama.vocab_size": vocab,
        "general.alignment": 32,
    }


def _permute(w, n_heads):
    """llama.cpp convert-script permutation (HF -> GGUF), forward form."""
    out_f, in_f = w.shape
    return (
        w.reshape(n_heads, 2, out_f // n_heads // 2, in_f)
        .swapaxes(1, 2)
        .reshape(out_f, in_f)
    )


def _hf_to_gguf_tensors(model):
    sd = {k: v.numpy().astype(np.float32) for k, v in model.state_dict().items()}
    out = {"token_embd.weight": sd["model.embed_tokens.weight"],
           "output_norm.weight": sd["model.norm.weight"]}
    i = 0
    while f"model.layers.{i}.input_layernorm.weight" in sd:
        p = f"model.layers.{i}."
        g = f"blk.{i}."
        out[g + "attn_norm.weight"] = sd[p + "input_layernorm.weight"]
        out[g + "ffn_norm.weight"] = sd[p + "post_attention_layernorm.weight"]
        out[g + "attn_q.weight"] = _permute(sd[p + "self_attn.q_proj.weight"], 4)
        out[g + "attn_k.weight"] = _permute(sd[p + "self_attn.k_proj.weight"], 2)
        out[g + "attn_v.weight"] = sd[p + "self_attn.v_proj.weight"]
        out[g + "attn_output.weight"] = sd[p + "self_attn.o_proj.weight"]
        out[g + "ffn_gate.weight"] = sd[p + "mlp.gate_proj.weight"]
        out[g + "ffn_up.weight"] = sd[p + "mlp.up_proj.weight"]
        out[g + "ffn_down.weight"] = sd[p + "mlp.down_proj.weight"]
        i += 1
    return out


@pytest.fixture(scope="module")
def hf_model():
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    return LlamaForCausalLM(cfg).eval()


def test_container_and_name_mapping(tmp_path, hf_model):
    gg = tmp_path / "m.gguf"
    write_gguf(str(gg), _tiny_meta(), _hf_to_gguf_tensors(hf_model))
    f = GGUFFile(str(gg))
    assert f.metadata["llama.embedding_length"] == 64
    idx = GGUFIndex(str(gg))
    cfg = idx.hf_config()
    assert cfg["num_hidden_layers"] == 2 and cfg["tie_word_embeddings"]
    # unpermuted q must equal the original HF tensor
    q_hf = hf_model.state_dict()["model.layers.0.self_attn.q_proj.weight"].numpy()
    got = idx.get("model.layers.0.self_attn.q_proj.weight")
    assert np.allclose(got, q_hf, atol=1e-6)
    assert idx.has("model.embed_tokens.weight")
    assert not idx.has("model.layers.9.self_attn.q_proj.weight")


def _engine_greedy(model_dir, prompt, n=12):
    from sglang_tpu import Engine

    eng = Engine(
        model_path=model_dir, dtype="float32", device="cpu", page_size=16,
        context_length=256, max_total_tokens=2048,
        prefill_token_buckets=[64], decode_bs_buckets=[4],
        max_running_requests=4, skip_tokenizer_init=True, random_seed=0,
        log_level="warning",
    )
    out = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": n, "temperature": 0.0, "ignore_eos": True},
    )
    eng.shutdown()
    return out["output_ids"]


def test_gguf_engine_matches_hf(tmp_path, hf_model):
    d = tmp_path / "gguf_model"
    d.mkdir()
    write_gguf(str(d / "m.gguf"), _tiny_meta(), _hf_to_gguf_tensors(hf_model))
    prompt = np.random.default_rng(3).integers(3, 250, size=9).tolist()
    with torch.no_grad():
        ref = hf_model.generate(
            torch.tensor([prompt]), max_new_tokens=12, do_sample=False,
            pad_token_id=0, eos_token_id=None,
        )[0, 9:].tolist()
    assert _engine_greedy(str(d), prompt) == ref


def test_gguf_q8_engine_close_to_hf(tmp_path, hf_model):
    """Q8_0-quantized GGUF: generation runs and mostly agrees with fp32."""
    d = tmp_path / "gguf_q8"
    d.mkdir()
    write_gguf(
        str(d / "m.gguf"), _tiny_meta(), _hf_to_gguf_tensors(hf_model),
        ttype=GGML_Q8_0,
    )
    prompt = np.random.default_rng(4).integers(3, 250, size=7).tolist()
    with torch.no_grad():
        ref = hf_model.generate(
            torch.tensor([prompt]), max_new_tokens=10, do_sample=False,
            pad_token_id=0, eos_token_id=None,
        )[0, 7:].tolist()
    got = _engine_greedy(str(d), prompt, n=10)
    agree = sum(a == b for a, b in zip(got, ref))
    assert agree >= 7, (got, ref)
