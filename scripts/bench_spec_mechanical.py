"""Speculative decoding mechanical win at 8B geometry (real chip).

Measures the two primitives that set the speculative speedup ceiling:
- one fused multi-step DECODE chunk (K steps, the non-spec baseline)
- one TARGET_VERIFY forward over 1+k tokens per row (the spec round)

Spec throughput = bs * (1 + E[accept]) / t_verify; baseline = bs / t_decode.
The break-even accept length is (t_verify / t_decode) - 1. With the NGRAM
accept length measured on the trained repeat-task model (6.64,
scripts/bench_spec_ngram.py), the projected 8B speedup is printed.

Usage: python scripts/bench_spec_mechanical.py [bs] [seq] [k]
"""

import sys
import time

import numpy as np


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    seq = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 7

    sys.path.insert(0, ".")
    from bench import llama8b_cfg

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_batch_info import SamplingBatchInfo
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    sa = ServerArgs(
        model_path="bench-llama-8b",
        load_format="zeros",
        quantization="int8",
        skip_tokenizer_init=True,
        random_seed=0,
        log_level="warning",
        context_length=2048,
        mem_fraction_static=0.88,
        page_size=64,
        decode_bs_buckets=[bs],
        prefill_token_buckets=[bs * (1 + k)],
        decode_multi_step=16,
    )
    mc = ModelConfig.from_hf_dict(
        llama8b_cfg(), model_path=sa.model_path, dtype=sa.dtype,
        context_length=sa.context_length, quantization=sa.quantization,
    )
    runner = ModelRunner(sa, mc)
    ps = sa.page_size
    pages_per = -(-(seq + 64 + 1) // ps)
    pt = np.zeros((bs, runner.max_pages_per_req), dtype=np.int32)
    nx = 1
    for i in range(bs):
        pt[i, :pages_per] = range(nx, nx + pages_per)
        nx += pages_per
    assert nx <= runner.num_pages, (nx, runner.num_pages)

    # --- baseline: fused multi-step decode, chained (steady-state path)
    sp = SamplingParams(temperature=0.0, ignore_eos=True)
    meta = SamplingBatchInfo.meta_from_reqs(
        [sp] * bs, padded_bs=bs, slots=list(range(bs)),
        max_slots=runner.slots_budget(),
    )
    base = np.full(bs, seq, dtype=np.int32)
    ids = np.zeros(bs, dtype=np.int32)
    kd = sa.decode_multi_step
    _, _, last = runner.forward_decode_multi(ids, base, pt, meta, kd, horizon=8)
    np.asarray(last)
    n_ch = 0
    t0 = time.perf_counter()
    while runner.decode_chain_ready() and n_ch < 6:
        _, _, last = runner.forward_decode_multi_chained()
        n_ch += 1
    np.asarray(last)
    t_decode = (time.perf_counter() - t0) / (n_ch * kd)
    print(f"decode: {t_decode*1e3:.2f} ms/step ({bs/t_decode:.0f} tok/s)")

    # --- verify: 1+k tokens per row, ragged TARGET_VERIFY
    tlens = np.full(bs, 1 + k, dtype=np.int32)
    tot = int(tlens.sum())
    input_ids = np.zeros(tot, dtype=np.int32)
    positions = np.concatenate([np.arange(seq, seq + 1 + k)] * bs).astype(np.int32)
    out_loc = np.concatenate(
        [pt[i, (seq + np.arange(1 + k)) // ps] * ps + (seq + np.arange(1 + k)) % ps
         for i in range(bs)]
    ).astype(np.int32)
    seq_lens = np.full(bs, seq + 1 + k, dtype=np.int32)
    runner.forward_verify(input_ids, positions, out_loc, pt, seq_lens, tlens, num_draft=k)
    t0 = time.perf_counter()
    n = 6
    for _ in range(n):
        out = runner.forward_verify(
            input_ids, positions, out_loc, pt, seq_lens, tlens, num_draft=k
        )
    np.asarray(out)
    t_verify = (time.perf_counter() - t0) / n
    ratio = t_verify / t_decode
    print(f"verify(1+{k}): {t_verify*1e3:.2f} ms/round = {ratio:.2f} decode steps")
    print(f"break-even accept length: {ratio - 1:.2f}")
    for acc in (2.0, 4.0, 6.64):
        print(
            f"projected speedup at accept={acc}: "
            f"{(1 + acc) / ratio:.2f}x  "
            f"({bs * (1 + acc) / t_verify:.0f} tok/s)"
        )


if __name__ == "__main__":
    main()
