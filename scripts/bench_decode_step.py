"""Steady-state decode chunk benchmark on the real ModelRunner (8B int8
geometry, zeros weights): measures tok/s of forward_decode_multi chunks at a
fixed batch size, isolating the fused decode graph from scheduler/prefill.
"""

import os
import sys
import time

import numpy as np


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    seq = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    kv_dtype = os.environ.get("BENCH_KV", "auto")

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
        kv_cache_dtype=kv_dtype,
        skip_tokenizer_init=True,
        random_seed=0,
        log_level="warning",
        context_length=2048,
        mem_fraction_static=0.88,
        page_size=64,
        decode_bs_buckets=[bs],
        prefill_token_buckets=[2048],
        decode_multi_step=k,
    )
    mc = ModelConfig.from_hf_dict(
        llama8b_cfg(),
        model_path=sa.model_path,
        dtype=sa.dtype,
        context_length=sa.context_length,
        quantization=sa.quantization,
        kv_cache_dtype=sa.kv_cache_dtype,
    )
    t0 = time.perf_counter()
    runner = ModelRunner(sa, mc)
    print(f"runner up {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    ps = sa.page_size
    pages_per = -(-(seq + 20 * k) // ps)  # room for the timed chunks
    page_table = np.zeros((bs, runner.max_pages_per_req), np.int32)
    nx = 1
    for i in range(bs):
        page_table[i, :pages_per] = range(nx, nx + pages_per)
        nx += pages_per
    assert nx <= runner.num_pages, (nx, runner.num_pages)
    seq_lens = np.full(bs, seq, np.int32)
    ids = np.full(bs, 17, np.int32)

    meta = SamplingBatchInfo.meta_from_reqs(
        [SamplingParams(temperature=0.0)] * bs, padded_bs=bs
    )

    t0 = time.perf_counter()
    out = runner.forward_decode_multi(ids, seq_lens, page_table, meta, k)
    import jax

    jax.block_until_ready(out)
    print(f"compile+first chunk {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    n = 16
    t0 = time.perf_counter()
    base = seq_lens.copy()
    for i in range(n):
        base = base + k
        out = runner.forward_decode_multi(ids, base, page_table, meta, k)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    toks = n * k * bs
    print(
        f"bs={bs} seq={seq} k={k} kv={kv_dtype}: {dt/n/k*1000:.2f} ms/step, "
        f"{toks/dt:.0f} tok/s"
    )


if __name__ == "__main__":
    main()
