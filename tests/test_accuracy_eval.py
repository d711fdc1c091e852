"""Accuracy gates on a REAL (trained) checkpoint, served by the engine.

The reference pins GSM8K/MMLU floors per quantization method
(`test/registered/quant/test_w8a8_quantization.py:95` GSM8K > 0.69,
`test_awq.py:46` MMLU > 0.64; harness `test/run_eval.py`). This environment
has no network, so the checkpoint is TRAINED here (scripts/train_tiny_lm.py:
2-digit addition with a held-out split — quantization error shows up as
wrong sums) and served through the full engine stack: tokenizer-free
generate, scheduler, radix cache, paged attention, sampler.

Gates: BF16/FP32 exact-match >= 0.90 on 200 held-out problems; W8A16 INT8
and dynamic W8A8 INT8 within 0.05 of the float baseline; AWQ INT4 (packed
checkpoint ingest) within 0.15. Numbers are recorded in EVALS.md.
"""

import json
import os
import shutil

import numpy as np
import pytest

from scripts.train_tiny_lm import (
    decode_answer,
    encode_problem,
    make_splits,
    train_and_export,
)

CKPT = os.environ.get("SGLANG_TPU_EVAL_CKPT", "/tmp/sglang_tpu_eval_lm")
N_EVAL = 200


@pytest.fixture(scope="module")
def checkpoint():
    return train_and_export(CKPT, steps=1500)


def _serve_and_eval(model_path, quantization=None, n=N_EVAL):
    from sglang_tpu import Engine

    engine = Engine(
        model_path=model_path,
        device="cpu",
        dtype="float32",
        quantization=quantization,
        skip_tokenizer_init=True,
        page_size=16,
        max_total_tokens=8192,
        context_length=64,
        chunked_prefill_size=256,
        decode_bs_buckets=[8, 32],
        prefill_token_buckets=[256],
        max_running_requests=32,
        random_seed=0,
        log_level="warning",
    )
    try:
        _, ev = make_splits(0)
        probs = [(int(a), int(b)) for a, b in ev[:n]]
        prompts = [encode_problem(a, b)[0] for a, b in probs]
        outs = engine.generate(
            input_ids=prompts,
            sampling_params={"max_new_tokens": 6, "temperature": 0.0},
        )
        correct = sum(
            decode_answer(o["output_ids"]) == str(a + b)
            for o, (a, b) in zip(outs, probs)
        )
        return correct / n
    finally:
        engine.shutdown()


def _write_awq_checkpoint(src_dir: str, dst_dir: str, group: int = 128):
    """Quantize the trained float checkpoint to a packed AWQ INT4 g128
    checkpoint (the engine's normal AWQ ingest path then dequantizes it)."""
    from safetensors.numpy import load_file, save_file

    from tests.test_quant_ingest import pack_awq

    os.makedirs(dst_dir, exist_ok=True)
    t = load_file(os.path.join(src_dir, "model.safetensors"))
    out = {}
    linears = (
        "q_proj", "k_proj", "v_proj", "o_proj",
        "gate_proj", "up_proj", "down_proj",
    )
    for name, w in t.items():
        if any(l in name for l in linears):
            # HF weight is [out, in]; AWQ packs along the out dim with
            # tensors laid out [in, ...]
            wt = w.T.astype(np.float32)  # [in, out]
            cin, cout = wt.shape
            g = min(group, cin)
            wg = wt.reshape(cin // g, g, cout)
            wmax = wg.max(axis=1)
            wmin = wg.min(axis=1)
            scales = np.maximum((wmax - wmin) / 15.0, 1e-8)  # [in/g, out]
            zeros = np.clip(np.round(-wmin / scales), 0, 15)
            q = np.clip(
                np.round(wg / scales[:, None]) + zeros[:, None], 0, 15
            ).astype(np.int32)  # [in/g, g, out]
            q = q.reshape(cin, cout)
            base = name[: -len(".weight")]
            out[base + ".qweight"] = pack_awq(q)
            out[base + ".qzeros"] = pack_awq(zeros.astype(np.int32))
            out[base + ".scales"] = scales.astype(np.float32)
        else:
            out[name] = w
    save_file(out, os.path.join(dst_dir, "model.safetensors"))
    with open(os.path.join(src_dir, "config.json")) as f:
        cfg = json.load(f)
    cfg["quantization_config"] = {
        "quant_method": "awq",
        "bits": 4,
        "group_size": group,
        "zero_point": True,
        "version": "gemm",
    }
    with open(os.path.join(dst_dir, "config.json"), "w") as f:
        json.dump(cfg, f)
    return dst_dir


def test_float_accuracy_floor(checkpoint):
    acc = _serve_and_eval(checkpoint)
    print(f"\nEVAL float32: exact-match {acc:.3f}")
    assert acc >= 0.90, acc


def test_w8a16_int8_accuracy(checkpoint):
    base = _serve_and_eval(checkpoint)
    acc = _serve_and_eval(checkpoint, quantization="int8")
    print(f"\nEVAL int8 (W8A16): {acc:.3f} vs float {base:.3f}")
    assert acc >= base - 0.05, (acc, base)
    assert acc >= 0.85, acc


def test_w8a8_int8_accuracy(checkpoint):
    base = _serve_and_eval(checkpoint)
    acc = _serve_and_eval(checkpoint, quantization="w8a8_int8")
    print(f"\nEVAL w8a8_int8: {acc:.3f} vs float {base:.3f}")
    assert acc >= base - 0.05, (acc, base)


def test_awq_int4_accuracy(checkpoint):
    base = _serve_and_eval(checkpoint)
    awq_dir = _write_awq_checkpoint(checkpoint, CKPT + "_awq")
    acc = _serve_and_eval(awq_dir)
    print(f"\nEVAL awq int4 g128: {acc:.3f} vs float {base:.3f}")
    assert acc >= base - 0.15, (acc, base)


def _kv_dtype_eval(checkpoint, kv_dtype):
    base = _serve_and_eval(checkpoint)
    from sglang_tpu import Engine

    engine = Engine(
        model_path=checkpoint,
        device="cpu",
        dtype="float32",
        kv_cache_dtype=kv_dtype,
        skip_tokenizer_init=True,
        page_size=16,
        max_total_tokens=8192,
        context_length=64,
        chunked_prefill_size=256,
        decode_bs_buckets=[8, 32],
        prefill_token_buckets=[256],
        max_running_requests=32,
        random_seed=0,
        log_level="warning",
    )
    try:
        _, ev = make_splits(0)
        probs = [(int(a), int(b)) for a, b in ev[:N_EVAL]]
        prompts = [encode_problem(a, b)[0] for a, b in probs]
        outs = engine.generate(
            input_ids=prompts,
            sampling_params={"max_new_tokens": 6, "temperature": 0.0},
        )
        acc = sum(
            decode_answer(o["output_ids"]) == str(a + b)
            for o, (a, b) in zip(outs, probs)
        ) / N_EVAL
    finally:
        engine.shutdown()
    print(f"\nEVAL {kv_dtype} KV: {acc:.3f} vs float {base:.3f}")
    assert acc >= base - 0.10, (acc, base, kv_dtype)


def test_fp8_kv_cache_accuracy(checkpoint):
    # reference fp8-KV GSM8K gate (test_fp8kv_triton.py:54)
    _kv_dtype_eval(checkpoint, "fp8_e4m3")


def test_int8_kv_cache_accuracy(checkpoint):
    # int8 KV is the v5e serving default (per-(token, head) scales) —
    # gate it like the reference gates fp8 KV
    _kv_dtype_eval(checkpoint, "int8")


def test_int4_kv_cache_accuracy(checkpoint):
    # int4 KV ships as a 2x-capacity option (PERFORMANCE.md); gate its
    # accuracy with the same Δ bound as the other KV dtypes
    _kv_dtype_eval(checkpoint, "int4")
