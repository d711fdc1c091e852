"""AWQ/GPTQ ingestion tests: pack/unpack round-trips and end-to-end logit
parity of an AWQ checkpoint against an HF model carrying the dequantized
weights (reference `test/registered/quant/test_awq.py` role, hardware-free)."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sglang_tpu.quantization.ingest import (
    AWQ_ORDER,
    dequant_reference,
    unpack_awq_int32,
    unpack_gptq_qweight,
    unpack_gptq_qzeros,
)

GROUP = 32


def pack_awq(vals: np.ndarray) -> np.ndarray:
    """[r, c] uint4 -> [r, c/8] int32 with AWQ interleaved order."""
    r, c = vals.shape
    packed = np.zeros((r, c // 8), dtype=np.uint32)
    for k in range(8):
        packed |= vals[:, AWQ_ORDER[k]::8].astype(np.uint32) << (4 * k)
    return packed.astype(np.int32)


def pack_gptq_qweight(vals: np.ndarray) -> np.ndarray:
    """[in, out] uint4 -> [in/8, out] int32 sequential along IN."""
    r, c = vals.shape
    packed = np.zeros((r // 8, c), dtype=np.uint32)
    for k in range(8):
        packed |= vals[k::8, :].astype(np.uint32) << (4 * k)
    return packed.astype(np.int32)


def pack_gptq_qzeros(vals: np.ndarray) -> np.ndarray:
    """[g, out] uint4 -> [g, out/8] int32 sequential along OUT, -1 offset."""
    v = (vals.astype(np.int32) - 1) & 0xF
    g, c = v.shape
    packed = np.zeros((g, c // 8), dtype=np.uint32)
    for k in range(8):
        packed |= v[:, k::8].astype(np.uint32) << (4 * k)
    return packed.astype(np.int32)


def test_awq_pack_roundtrip():
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 16, size=(64, 32)).astype(np.uint8)
    assert np.array_equal(unpack_awq_int32(pack_awq(vals)), vals)


def test_gptq_pack_roundtrip():
    rng = np.random.default_rng(1)
    w = rng.integers(0, 16, size=(64, 24)).astype(np.uint8)
    assert np.array_equal(unpack_gptq_qweight(pack_gptq_qweight(w)), w)
    z = rng.integers(1, 16, size=(2, 24)).astype(np.uint8)
    assert np.array_equal(unpack_gptq_qzeros(pack_gptq_qzeros(z)), z)


def _awq_quantize(w_in_out: np.ndarray):
    """[in, out] f32 -> (q, z, s) unsigned AWQ tensors + dequant value.

    Forces C order: safetensors' numpy save writes the raw buffer and
    silently corrupts F-contiguous arrays (which `w.T.astype(...)` yields).
    """
    w_in_out = np.ascontiguousarray(w_in_out)
    in_f, out_f = w_in_out.shape
    g = in_f // GROUP
    wg = w_in_out.reshape(g, GROUP, out_f)
    wmin = wg.min(axis=1)
    wmax = wg.max(axis=1)
    s = ((wmax - wmin) / 15.0).clip(min=1e-8)
    z = np.clip(np.round(-wmin / s), 0, 15).astype(np.uint8)
    q = np.clip(
        np.round(wg / s[:, None, :]) + z[:, None, :].astype(np.float64), 0, 15
    ).astype(np.uint8)
    deq = dequant_reference(q.reshape(in_f, out_f), z, s, GROUP)
    return q.reshape(in_f, out_f), z, s.astype(np.float32), deq


@pytest.fixture(scope="module")
def awq_checkpoint(tmp_path_factory):
    from safetensors.numpy import save_file
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("awq_llama")
    cfg = LlamaConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(cfg).eval()
    tensors = {}
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    linear_suffixes = (
        "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj",
    )
    with torch.no_grad():
        for name, w in sd.items():
            base = name[: -len(".weight")] if name.endswith(".weight") else name
            if any(base.endswith(sfx) for sfx in linear_suffixes):
                w_io = w.T.astype(np.float32)  # [in, out]
                q, z, s, deq = _awq_quantize(w_io)
                tensors[f"{base}.qweight"] = pack_awq(q)
                tensors[f"{base}.qzeros"] = pack_awq(z)
                tensors[f"{base}.scales"] = s
                # overwrite the HF model with the dequantized weights so it
                # becomes the exact oracle for the quantized engine
                dict(hf.named_parameters())[name].copy_(torch.tensor(deq.T))
            else:
                tensors[name] = w
    save_file(tensors, os.path.join(path, "model.safetensors"))
    d = cfg.to_dict()
    d["architectures"] = ["LlamaForCausalLM"]
    d["quantization_config"] = {
        "quant_method": "awq", "bits": 4, "group_size": GROUP, "version": "gemm",
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(d, f)
    return str(path), hf


def test_awq_checkpoint_logits_match(awq_checkpoint):
    path, hf_deq = awq_checkpoint
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.test_utils import tiny_server_args

    sa = tiny_server_args(model_path=path, load_format="auto", dtype="float32")
    mc = ModelConfig.from_server_args(sa)
    assert mc.quantization == "awq"
    runner = ModelRunner(sa, mc)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 256, size=12).astype(np.int32)
    with torch.no_grad():
        hf_logits = (
            hf_deq(torch.tensor(prompt[None].astype(np.int64))).logits[0].numpy()
        )
    ps = runner.page_size
    n_pages = -(-len(prompt) // ps)
    pages = list(range(1, 1 + n_pages))
    out_loc = np.array(
        [pages[i // ps] * ps + i % ps for i in range(len(prompt))], dtype=np.int32
    )
    pt = np.zeros((1, runner.max_pages_per_req), dtype=np.int32)
    pt[0, : len(pages)] = pages
    logits = runner.forward_extend_logits(
        prompt, np.arange(len(prompt)), out_loc, pt,
        np.array([len(prompt)]), np.array([len(prompt)]),
    )
    np.testing.assert_allclose(logits, hf_logits, atol=5e-3, rtol=5e-3)


def test_gptq_act_order():
    """desc_act checkpoints (shuffled g_idx): row permutation + runtime
    activation gather reproduce the exact original quantization grid."""
    import jax.numpy as jnp

    from sglang_tpu.layers.linear import Int4Linear
    from sglang_tpu.quantization.ingest import load_one_gptq, to_int4_layout

    rng = np.random.default_rng(0)
    in_f, out_f, group = 64, 32, 16
    g = in_f // group
    q = rng.integers(0, 16, size=(in_f, out_f)).astype(np.uint8)
    z = rng.integers(6, 10, size=(g, out_f)).astype(np.uint8)
    s = (rng.random((g, out_f)).astype(np.float32) + 0.5) * 0.1
    # act-order: rows assigned to groups in a shuffled order
    g_idx = np.repeat(np.arange(g), group)
    rng.shuffle(g_idx)

    class Idx:
        def has(self, name):
            return True

        def get(self, name):
            if name.endswith("qweight"):
                return pack_gptq_qweight(q)
            if name.endswith("qzeros"):
                return pack_gptq_qzeros(z)  # packer applies the -1 offset
            if name.endswith("scales"):
                return s
            if name.endswith("g_idx"):
                return g_idx.astype(np.int32)
            raise KeyError(name)

    part = load_one_gptq(Idx(), "m")
    assert "perm" in part
    w = to_int4_layout([part])
    m = Int4Linear(group_size=group, has_zeros=True)
    x = rng.standard_normal((4, in_f)).astype(np.float32)
    y = np.asarray(
        m.apply({k: jnp.asarray(v) for k, v in w.items()}, jnp.asarray(x))
    )
    # oracle: dequantize with per-row g_idx group lookup (original order)
    wdeq = (q.astype(np.float32) - z[g_idx].astype(np.float32)) * s[g_idx]
    ref = x @ wdeq
    np.testing.assert_allclose(y, ref, rtol=2e-3, atol=2e-3)


@pytest.fixture(scope="module")
def gptq_actorder_checkpoint(tmp_path_factory):
    """Tiny llama GPTQ checkpoint with desc_act (shuffled g_idx) on every
    linear; the HF model is overwritten with the exact dequant oracle."""
    from safetensors.numpy import save_file
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("gptq_ao_llama")
    cfg = LlamaConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, tie_word_embeddings=True,
    )
    torch.manual_seed(1)
    hf = LlamaForCausalLM(cfg).eval()
    rng = np.random.default_rng(7)
    tensors = {}
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    linear_suffixes = (
        "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj",
    )
    with torch.no_grad():
        for name, w in sd.items():
            base = name[: -len(".weight")] if name.endswith(".weight") else name
            if not any(base.endswith(sfx) for sfx in linear_suffixes):
                tensors[name] = w
                continue
            w_io = np.ascontiguousarray(w.T.astype(np.float32))  # [in, out]
            in_f, out_f = w_io.shape
            g = in_f // GROUP
            # g_idx comes from the layer INPUT's activation order, so
            # projections sharing an input (q/k/v; gate/up) share it
            share_key = (base.rsplit(".", 1)[0], in_f)
            if not hasattr(hf, "_gidx_cache"):
                hf._gidx_cache = {}
            if share_key not in hf._gidx_cache:
                gi_ = np.repeat(np.arange(g), GROUP)
                rng.shuffle(gi_)
                hf._gidx_cache[share_key] = gi_
            g_idx = hf._gidx_cache[share_key]
            # per-group asymmetric quant over the rows ASSIGNED to it
            z = np.zeros((g, out_f), np.uint8)
            s = np.zeros((g, out_f), np.float32)
            q = np.zeros((in_f, out_f), np.uint8)
            for gi in range(g):
                rows = np.where(g_idx == gi)[0]
                wg = w_io[rows]
                s_g = ((wg.max(0) - wg.min(0)) / 15.0).clip(min=1e-8)
                z_g = np.clip(np.round(-wg.min(0) / s_g), 0, 15)
                q[rows] = np.clip(
                    np.round(wg / s_g) + z_g, 0, 15
                ).astype(np.uint8)
                z[gi] = z_g.astype(np.uint8)
                s[gi] = s_g.astype(np.float32)
            deq = (q.astype(np.float32) - z[g_idx]) * s[g_idx]
            tensors[f"{base}.qweight"] = pack_gptq_qweight(q)
            tensors[f"{base}.qzeros"] = pack_gptq_qzeros(z)
            tensors[f"{base}.scales"] = s
            tensors[f"{base}.g_idx"] = g_idx.astype(np.int32)
            dict(hf.named_parameters())[name].copy_(torch.tensor(deq.T))
    save_file(tensors, os.path.join(path, "model.safetensors"))
    d = cfg.to_dict()
    d["architectures"] = ["LlamaForCausalLM"]
    d["quantization_config"] = {
        "quant_method": "gptq", "bits": 4, "group_size": GROUP,
        "desc_act": True,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(d, f)
    return str(path), hf


def test_gptq_actorder_checkpoint_logits_match(gptq_actorder_checkpoint):
    path, hf = gptq_actorder_checkpoint
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.test_utils import tiny_server_args

    sa = tiny_server_args(model_path=path, load_format="auto", dtype="float32")
    mc = ModelConfig.from_server_args(sa)
    assert mc.quantization == "gptq"
    runner = ModelRunner(sa, mc)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 250, size=11).astype(np.int32)
    with torch.no_grad():
        hf_logits = hf(torch.tensor(prompt[None].astype(np.int64))).logits[0].numpy()
    ps = runner.page_size
    n_pages = -(-len(prompt) // ps)
    pages = list(range(1, 1 + n_pages))
    out_loc = np.array(
        [pages[i // ps] * ps + i % ps for i in range(len(prompt))], dtype=np.int32
    )
    pt = np.zeros((1, runner.max_pages_per_req), dtype=np.int32)
    pt[0, : len(pages)] = pages
    logits = runner.forward_extend_logits(
        prompt, np.arange(len(prompt)), out_loc, pt,
        np.array([len(prompt)]), np.array([len(prompt)]),
    )
    np.testing.assert_allclose(logits, hf_logits, atol=5e-3, rtol=5e-3)


def test_compressed_tensors_checkpoint(tmp_path):
    """llm-compressor W8A8-int8 checkpoints (compressed-tensors format):
    int8 weight + per-channel weight_scale load into the int8 layout and
    runner logits match the dequant-oracle HF model."""
    from safetensors.numpy import save_file
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, tie_word_embeddings=True,
    )
    torch.manual_seed(2)
    hf = LlamaForCausalLM(cfg).eval()
    tensors = {}
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    linear_suffixes = (
        "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj",
    )
    with torch.no_grad():
        for name, w in sd.items():
            base = name[: -len(".weight")] if name.endswith(".weight") else name
            if not any(base.endswith(sfx) for sfx in linear_suffixes):
                tensors[name] = w
                continue
            wf = w.astype(np.float32)  # [out, in]
            scale = (np.abs(wf).max(axis=1, keepdims=True) / 127.0).clip(1e-8)
            q = np.clip(np.round(wf / scale), -128, 127).astype(np.int8)
            tensors[f"{base}.weight"] = q
            tensors[f"{base}.weight_scale"] = scale.astype(np.float32)
            dict(hf.named_parameters())[name].copy_(
                torch.tensor(q.astype(np.float32) * scale)
            )
    save_file(tensors, os.path.join(tmp_path, "model.safetensors"))
    d = cfg.to_dict()
    d["architectures"] = ["LlamaForCausalLM"]
    d["quantization_config"] = {
        "quant_method": "compressed-tensors",
        "config_groups": {
            "group_0": {
                "weights": {"num_bits": 8, "symmetric": True},
                "input_activations": None,
                "targets": ["Linear"],
            }
        },
    }
    with open(os.path.join(tmp_path, "config.json"), "w") as f:
        json.dump(d, f)

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.test_utils import tiny_server_args

    sa = tiny_server_args(model_path=str(tmp_path), load_format="auto", dtype="float32")
    mc = ModelConfig.from_server_args(sa)
    assert mc.quantization == "int8"  # weight-only scheme (no act quant)
    runner = ModelRunner(sa, mc)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 250, size=10).astype(np.int32)
    with torch.no_grad():
        hf_logits = hf(torch.tensor(prompt[None].astype(np.int64))).logits[0].numpy()
    ps = runner.page_size
    pages = list(range(1, 1 + -(-len(prompt) // ps)))
    out_loc = np.array(
        [pages[i // ps] * ps + i % ps for i in range(len(prompt))], dtype=np.int32
    )
    pt = np.zeros((1, runner.max_pages_per_req), dtype=np.int32)
    pt[0, : len(pages)] = pages
    logits = runner.forward_extend_logits(
        prompt, np.arange(len(prompt)), out_loc, pt,
        np.array([len(prompt)]), np.array([len(prompt)]),
    )
    np.testing.assert_allclose(logits, hf_logits, atol=5e-3, rtol=5e-3)


def test_compressed_tensors_fp8_scheme(tmp_path_factory):
    """compressed-tensors FP8 (Q6): ct config with float 8-bit weights maps
    onto the Fp8Linear per-channel layout; logits track the float model."""
    import json
    import os

    import jax.numpy as jnp
    import numpy as np
    import safetensors.flax
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    src = tmp_path_factory.mktemp("ctfp8_src")
    cfg = LlamaConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, tie_word_embeddings=True,
    )
    torch.manual_seed(9)
    hf = LlamaForCausalLM(cfg).eval()
    hf.save_pretrained(src)

    import safetensors.numpy

    tensors = safetensors.numpy.load_file(
        os.path.join(src, "model.safetensors")
    )
    dst = tmp_path_factory.mktemp("ctfp8_ckpt")
    out = {}
    for name, w in tensors.items():
        if w.ndim == 2 and "embed" not in name and "norm" not in name:
            wf = np.asarray(w, dtype=np.float32)  # [out, in]
            amax = np.abs(wf).max(axis=1, keepdims=True)
            s = (amax / 448.0).clip(min=1e-8)
            out[name] = jnp.asarray(wf / s, dtype=jnp.float8_e4m3fn)
            out[name + "_scale"] = jnp.asarray(s.reshape(-1), dtype=jnp.float32)
        else:
            out[name] = jnp.asarray(w)
    safetensors.flax.save_file(out, os.path.join(dst, "model.safetensors"))
    with open(os.path.join(src, "config.json")) as f:
        c = json.load(f)
    c["quantization_config"] = {
        "quant_method": "compressed-tensors",
        "config_groups": {
            "group_0": {
                "weights": {"num_bits": 8, "type": "float", "strategy": "channel"},
                "input_activations": None,
            }
        },
    }
    with open(os.path.join(dst, "config.json"), "w") as f:
        json.dump(c, f)

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.test_utils import tiny_server_args

    sa = tiny_server_args(model_path=str(dst), load_format="auto", dtype="float32")
    mc = ModelConfig.from_server_args(sa)
    assert mc.quantization == "fp8"
    runner = ModelRunner(sa, mc)
    rng = np.random.default_rng(4)
    prompt = rng.integers(3, 250, size=10).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(prompt[None].astype(np.int64))).logits[0].numpy()
    ps = runner.page_size
    pages = list(range(1, 1 + (-(-len(prompt) // ps))))
    out_loc = np.array(
        [pages[i // ps] * ps + i % ps for i in range(len(prompt))], dtype=np.int32
    )
    pt = np.zeros((1, runner.max_pages_per_req), dtype=np.int32)
    pt[0, : len(pages)] = pages
    got = runner.forward_extend_logits(
        prompt, np.arange(len(prompt)), out_loc, pt,
        np.array([len(prompt)]), np.array([len(prompt)]),
    )
    corr = np.corrcoef(got.reshape(-1), want.reshape(-1))[0, 1]
    assert corr > 0.99, corr
