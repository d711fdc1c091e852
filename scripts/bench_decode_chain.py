"""Chained decode chunk benchmark: the ZERO-upload dispatch path the real
serving loop runs (fresh dispatch once, then `forward_decode_multi_chained`
replays from device-resident state). This is the number that matches the
offline bench's per-step decode time; `bench_decode_step.py` measures the
fresh-dispatch path, which on a tunneled runtime is RTT-dominated.

Usage: bench_decode_chain.py [bs] [seq] [k]
Env: BENCH_KV=int8|auto
"""

import os
import sys
import time

import numpy as np

KV_DTYPE = os.environ.get("BENCH_KV", "int8")
QUANT = os.environ.get("BENCH_QUANT", "int8")


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    seq = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import llama8b_cfg

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_batch_info import SamplingBatchInfo
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    sa = ServerArgs(
        model_path="bench-llama-8b",
        load_format="zeros",
        quantization=QUANT,
        kv_cache_dtype=KV_DTYPE,
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

    import jax

    ps = sa.page_size
    n_chunks = 12  # chained chunks measured per fresh dispatch
    pages_per = -(-(seq + (n_chunks + 2) * k) // ps)
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

    # compile + fresh dispatch with a deep horizon
    t0 = time.perf_counter()
    out = runner.forward_decode_multi(
        ids, seq_lens, page_table, meta, k, horizon=n_chunks + 2
    )
    jax.block_until_ready(out)
    print(f"compile+fresh chunk {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    out = runner.forward_decode_multi_chained()  # warm the chained fn
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(n_chunks):
        out = runner.forward_decode_multi_chained()
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    toks = n_chunks * k * bs
    print(
        f"CHAINED bs={bs} seq={seq} k={k} kv={KV_DTYPE} q={QUANT}: "
        f"{dt/n_chunks/k*1000:.2f} ms/step, {toks/dt:.0f} tok/s"
    )


if __name__ == "__main__":
    main()
