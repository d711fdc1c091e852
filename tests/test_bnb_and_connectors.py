"""bitsandbytes NF4 checkpoint ingestion (Q7) + remote weight connectors
(F9 / C16 loader tail). The BnB path is validated the AWQ way: pack a real
float checkpoint into the on-disk NF4 format (packed codes + absmax +
quant_map + quant_state JSON sidecar), load through the normal engine
path, and compare logits against the float model."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_nf4_pack_dequant_roundtrip():
    from sglang_tpu.quantization.bnb import dequant_nf4, pack_nf4

    rng = np.random.default_rng(0)
    w = rng.standard_normal((32, 64)).astype(np.float32) * 0.1
    packed, absmax = pack_nf4(w)
    back = dequant_nf4(packed, absmax, w.shape)
    # nf4 is 4-bit: expect ~relative block error bounded by the codebook
    err = np.abs(back - w).max()
    assert err < np.abs(w).max() * 0.15
    # exactly representable values round-trip exactly
    w2 = np.zeros((2, 64), dtype=np.float32)
    w2[:, 0] = 1.0
    w2[:, 1] = -1.0
    p2, a2 = pack_nf4(w2)
    np.testing.assert_allclose(dequant_nf4(p2, a2, w2.shape), w2, atol=1e-7)


def _export_bnb(src_dir, dst_dir):
    """Re-export a float HF checkpoint in BnB-4bit on-disk form (every
    2D non-embedding weight NF4-packed; quant_state JSON sidecars)."""
    import safetensors.numpy

    from sglang_tpu.quantization.bnb import NF4_CODE, pack_nf4

    os.makedirs(dst_dir, exist_ok=True)
    tensors = safetensors.numpy.load_file(
        os.path.join(src_dir, "model.safetensors")
    )
    out = {}
    for name, w in tensors.items():
        if (
            w.ndim == 2
            and "embed" not in name
            and "lm_head" not in name
            and w.size % 64 == 0
        ):
            packed, absmax = pack_nf4(w)
            out[name] = packed
            out[name + ".absmax"] = absmax
            out[name + ".quant_map"] = NF4_CODE
            qs = json.dumps(
                {"shape": list(w.shape), "blocksize": 64, "dtype": "float32"}
            ).encode()
            out[name + ".quant_state.bitsandbytes__nf4"] = np.frombuffer(
                qs, dtype=np.uint8
            ).copy()
        else:
            out[name] = w
    safetensors.numpy.save_file(out, os.path.join(dst_dir, "model.safetensors"))
    with open(os.path.join(src_dir, "config.json")) as f:
        cfg = json.load(f)
    cfg["quantization_config"] = {
        "quant_method": "bitsandbytes",
        "load_in_4bit": True,
        "bnb_4bit_quant_type": "nf4",
    }
    with open(os.path.join(dst_dir, "config.json"), "w") as f:
        json.dump(cfg, f)


def test_bnb_checkpoint_serves(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    src = tmp_path_factory.mktemp("bnb_src")
    cfg = LlamaConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, tie_word_embeddings=True,
    )
    torch.manual_seed(3)
    hf = LlamaForCausalLM(cfg).eval()
    hf.save_pretrained(src)
    dst = tmp_path_factory.mktemp("bnb_ckpt")
    _export_bnb(str(src), str(dst))

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.test_utils import tiny_server_args

    sa = tiny_server_args(model_path=str(dst), load_format="auto", dtype="float32")
    mc = ModelConfig.from_server_args(sa)
    assert (mc.quant_config or {}).get("quant_method") == "bitsandbytes"
    runner = ModelRunner(sa, mc)
    rng = np.random.default_rng(1)
    prompt = rng.integers(3, 250, size=11).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(prompt[None].astype(np.int64))).logits[0].numpy()
    ps = runner.page_size
    n_pages = -(-len(prompt) // ps)
    pages = list(range(1, 1 + n_pages))
    out_loc = np.array(
        [pages[i // ps] * ps + i % ps for i in range(len(prompt))],
        dtype=np.int32,
    )
    pt = np.zeros((1, runner.max_pages_per_req), dtype=np.int32)
    pt[0, : len(pages)] = pages
    got = runner.forward_extend_logits(
        prompt, np.arange(len(prompt)), out_loc, pt,
        np.array([len(prompt)]), np.array([len(prompt)]),
    )
    # 4-bit weights: logits track the float model closely at tiny scale
    corr = np.corrcoef(got.reshape(-1), want.reshape(-1))[0, 1]
    assert corr > 0.98, corr
    # and greedy argmax mostly agrees
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree > 0.8, agree


def test_file_scheme_model_path(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("file_scheme")
    cfg = LlamaConfig(
        hidden_size=64, num_hidden_layers=1, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).eval().save_pretrained(path)
    from tests.test_utils import tiny_server_args

    sa = tiny_server_args(model_path=f"file://{path}", load_format="auto")
    assert sa.model_path == str(path)


def test_s3_scheme_gated_error():
    from sglang_tpu.connector import resolve_model_path

    try:
        import boto3  # noqa

        pytest.skip("boto3 present; gated-error path not reachable")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="boto3"):
        resolve_model_path("s3://bucket/model")


def test_unknown_scheme_rejected():
    from sglang_tpu.connector import resolve_model_path

    with pytest.raises(ValueError, match="unsupported"):
        resolve_model_path("gs://bucket/model")


# ------------------------------------------------------- blockwise FP8 (Q1)

def test_fp8_block_quantize_roundtrip():
    import jax.numpy as jnp

    from sglang_tpu.layers.linear import Fp8BlockLinear

    rng = np.random.default_rng(3)
    w = rng.standard_normal((96, 64)).astype(np.float32) * 0.2
    m = Fp8BlockLinear(block=32)
    q = m.quantize(w)
    assert q["q"].shape == (96, 64) and q["s"].shape == (3, 2)
    x = rng.standard_normal((5, 96)).astype(np.float32)
    got = np.asarray(m.apply({k: jnp.asarray(v) for k, v in q.items()}, jnp.asarray(x)))
    want = x @ w
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.06, rel


def _export_fp8_block(src_dir, dst_dir, block=32):
    """Re-export a float checkpoint in DeepSeek-style block-fp8 form:
    `weight` e4m3 [out, in] + `weight_scale_inv` [out/B, in/B]."""
    import ml_dtypes
    import safetensors.numpy

    from sglang_tpu.layers.linear import Fp8BlockLinear

    os.makedirs(dst_dir, exist_ok=True)
    tensors = safetensors.numpy.load_file(
        os.path.join(src_dir, "model.safetensors")
    )
    m = Fp8BlockLinear(block=block)
    out = {}
    for name, w in tensors.items():
        if (
            w.ndim == 2 and "embed" not in name and "lm_head" not in name
            and w.shape[0] % block == 0 and w.shape[1] % block == 0
        ):
            q = m.quantize(np.asarray(w, dtype=np.float32).T)  # [in, out]
            out[name] = np.ascontiguousarray(q["q"].T)  # back to [out, in]
            out[name + "_scale_inv"] = np.ascontiguousarray(q["s"].T)
        else:
            out[name] = w
    assert out[next(k for k in out if k.endswith("_scale_inv"))].dtype == np.float32
    # true F8_E4M3 on-disk dtype needs the flax backend (numpy's lacks fp8)
    import jax.numpy as jnp
    import safetensors.flax

    safetensors.flax.save_file(
        {k: jnp.asarray(v) for k, v in out.items()},
        os.path.join(dst_dir, "model.safetensors"),
    )
    with open(os.path.join(src_dir, "config.json")) as f:
        cfg = json.load(f)
    cfg["quantization_config"] = {
        "quant_method": "fp8",
        "fmt": "e4m3",
        "weight_block_size": [block, block],
        "activation_scheme": "dynamic",
    }
    with open(os.path.join(dst_dir, "config.json"), "w") as f:
        json.dump(cfg, f)


def test_fp8_block_checkpoint_serves(tmp_path_factory):
    """DeepSeek-style block-fp8 checkpoint through the normal engine path:
    quantization auto-detects as fp8_block and logits track the float
    model (reference fp8.py block path + weight_scale_inv ingest)."""
    from transformers import LlamaConfig, LlamaForCausalLM

    src = tmp_path_factory.mktemp("fp8b_src")
    cfg = LlamaConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, tie_word_embeddings=True,
    )
    torch.manual_seed(5)
    hf = LlamaForCausalLM(cfg).eval()
    hf.save_pretrained(src)
    dst = tmp_path_factory.mktemp("fp8b_ckpt")
    _export_fp8_block(str(src), str(dst), block=32)

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.test_utils import tiny_server_args

    sa = tiny_server_args(model_path=str(dst), load_format="auto", dtype="float32")
    mc = ModelConfig.from_server_args(sa)
    assert mc.quantization == "fp8_block"
    runner = ModelRunner(sa, mc)
    rng = np.random.default_rng(2)
    prompt = rng.integers(3, 250, size=11).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(prompt[None].astype(np.int64))).logits[0].numpy()
    ps = runner.page_size
    n_pages = -(-len(prompt) // ps)
    pages = list(range(1, 1 + n_pages))
    out_loc = np.array(
        [pages[i // ps] * ps + i % ps for i in range(len(prompt))],
        dtype=np.int32,
    )
    pt = np.zeros((1, runner.max_pages_per_req), dtype=np.int32)
    pt[0, : len(pages)] = pages
    got = runner.forward_extend_logits(
        prompt, np.arange(len(prompt)), out_loc, pt,
        np.array([len(prompt)]), np.array([len(prompt)]),
    )
    corr = np.corrcoef(got.reshape(-1), want.reshape(-1))[0, 1]
    assert corr > 0.99, corr
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree > 0.85, agree
