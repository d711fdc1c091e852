"""FP4 storage-format ingestion (Q5): MXFP4 + NVFP4 round trips and a
full engine load of a tiny llama checkpoint exported as MXFP4
(reference srt/layers/quantization/{mxfp4,modelopt_quant}.py)."""

import json
import os

import numpy as np
import pytest

from sglang_tpu.quantization.fp4 import (
    E2M1_CODE,
    dequant_mxfp4,
    dequant_nvfp4,
    pack_mxfp4,
    pack_nvfp4,
)


def test_mxfp4_roundtrip_exact_on_grid():
    """Values already on the e2m1 grid x power-of-two scales survive the
    pack/dequant round trip exactly."""
    rng = np.random.default_rng(0)
    g, b = 6, 32
    codes = rng.integers(0, 16, size=(4, g * b))
    exps = rng.integers(-8, 8, size=(4, g))
    w = E2M1_CODE[codes].reshape(4, g, b) * (2.0 ** exps)[..., None]
    w = w.reshape(4, g * b)
    blocks, scales = pack_mxfp4(w)
    back = dequant_mxfp4(blocks, scales)
    np.testing.assert_allclose(back, w, rtol=0, atol=0)


def test_mxfp4_quantization_error_bounded():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((8, 128)).astype(np.float32)
    blocks, scales = pack_mxfp4(w)
    back = dequant_mxfp4(blocks, scales)
    # e2m1 relative step is 0.25 at worst within a block's dynamic range
    amax = np.abs(w.reshape(8, -1, 32)).max(-1, keepdims=True)
    err = np.abs(back.reshape(8, -1, 32) - w.reshape(8, -1, 32))
    assert (err <= 0.25 * amax + 1e-6).all()


def test_nvfp4_roundtrip_error_bounded():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((16, 64)).astype(np.float32)
    packed, s8, s2 = pack_nvfp4(w)
    assert packed.shape == (16, 32)
    back = dequant_nvfp4(packed, s8, s2)
    amax = np.abs(w.reshape(16, -1, 16)).max(-1, keepdims=True)
    err = np.abs(back.reshape(16, -1, 16) - w.reshape(16, -1, 16))
    assert (err <= 0.3 * amax + 1e-6).all()


def test_engine_loads_mxfp4_checkpoint(tmp_path):
    """Export a tiny llama checkpoint with every linear stored as MXFP4
    blocks/scales; the engine must load it (quantization_config
    quant_method=mxfp4) and generate the same tokens as the dense
    checkpoint quantized the same way."""
    torch = pytest.importorskip("torch")
    import safetensors.numpy
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    dense_dir = tmp_path / "dense"
    fp4_dir = tmp_path / "fp4"
    for d in (dense_dir, fp4_dir):
        os.makedirs(d)
        hf.config.save_pretrained(d)

    fp4_tensors = {}
    dense_tensors = {}
    for k, v in sd.items():
        is_linear = k.endswith("proj.weight")
        if is_linear:
            blocks, scales = pack_mxfp4(v.astype(np.float32))
            base = k[: -len(".weight")]
            fp4_tensors[base + "_blocks"] = blocks
            fp4_tensors[base + "_scales"] = scales
            # dense reference carries the SAME quantization error
            dense_tensors[k] = dequant_mxfp4(blocks, scales)
        else:
            fp4_tensors[k] = v
            dense_tensors[k] = v
    safetensors.numpy.save_file(
        fp4_tensors, str(fp4_dir / "model.safetensors")
    )
    safetensors.numpy.save_file(
        dense_tensors, str(dense_dir / "model.safetensors")
    )
    for d, extra in ((dense_dir, {}), (fp4_dir, {
        "quantization_config": {"quant_method": "mxfp4"}
    })):
        with open(d / "config.json") as f:
            c = json.load(f)
        c["architectures"] = ["LlamaForCausalLM"]
        c.update(extra)
        with open(d / "config.json", "w") as f:
            json.dump(c, f)

    from sglang_tpu import Engine

    kw = dict(
        dtype="float32", device="cpu", page_size=16, context_length=256,
        max_total_tokens=2048, prefill_token_buckets=[64],
        decode_bs_buckets=[4], max_running_requests=4,
        skip_tokenizer_init=True, random_seed=0, log_level="warning",
    )
    ids = [5, 9, 23, 48, 7, 3]
    sp = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}
    e1 = Engine(model_path=str(dense_dir), **kw)
    want = e1.generate(input_ids=ids, sampling_params=sp)["output_ids"]
    e1.shutdown()
    e2 = Engine(model_path=str(fp4_dir), **kw)
    got = e2.generate(input_ids=ids, sampling_params=sp)["output_ids"]
    e2.shutdown()
    assert got == want
