"""Offline throughput benchmark — prints ONE JSON line.

Methodology parity with reference `python/sglang/bench_serving.py` offline
mode (`--dataset-name random`, infinite request rate; output throughput =
generated tokens / wall time) against the in-repo baseline
`BASELINE.md`: Llama-3.1-8B offline output throughput > 3800 tok/s on the
reference's 1-GPU CI runner (test_bench_serving_1gpu_part1.py:43).

Runs the real engine (scheduler + radix cache + paged KV + bucketed jit)
with dummy weights in Llama-3.1-8B geometry on whatever single chip is
available. Set BENCH_TINY=1 for a CPU smoke run.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_TOKS = 3800.0  # reference CI floor, 1 GPU


def llama8b_cfg():
    return dict(
        architectures=["LlamaForCausalLM"],
        model_type="llama",
        hidden_size=4096,
        num_hidden_layers=32,
        num_attention_heads=32,
        num_key_value_heads=8,
        intermediate_size=14336,
        vocab_size=128256,
        max_position_embeddings=8192,
        rms_norm_eps=1e-5,
        rope_theta=500000.0,
        tie_word_embeddings=False,
        bos_token_id=128000,
        eos_token_id=128001,
    )


def tiny_cfg():
    return dict(
        architectures=["LlamaForCausalLM"],
        model_type="llama",
        hidden_size=256,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=4,
        intermediate_size=512,
        vocab_size=1024,
        max_position_embeddings=2048,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=True,
        bos_token_id=1,
        eos_token_id=2,
    )


def _warm_all_buckets(sched, runner, mc):
    import sys as _sys
    import time as _time

    from sglang_tpu.sampling.sampling_batch_info import SamplingBatchInfo
    from sglang_tpu.sampling.sampling_params import SamplingParams

    k = sched.server_args.decode_multi_step
    sp = SamplingParams(temperature=0.0, ignore_eos=True)
    for bs in runner.decode_bs_buckets:
        t0 = _time.perf_counter()
        meta = SamplingBatchInfo.meta_from_reqs(
            [sp] * bs, padded_bs=bs, slots=list(range(bs)),
            max_slots=sched.max_slots,
        )
        base = np.ones(bs, dtype=np.int32)
        pt = np.zeros((bs, runner.max_pages_per_req), dtype=np.int32)
        ids = np.zeros(bs, dtype=np.int32)
        _, _, last = runner.forward_decode_multi(ids, base, pt, meta, k)
        # chained variant (device-resident first ids)
        runner.forward_decode_multi(last, base, pt, meta, k)
        # single-step fallback (runs after retraction under page pressure)
        runner.forward_decode(
            ids, base - 1, np.zeros(bs, dtype=np.int32), pt, base,
            meta.to_sinfo(),
        )
        print(
            f"# warm decode bs={bs}: {_time.perf_counter() - t0:.0f}s",
            file=_sys.stderr,
        )
    bb = runner.extend_seq_bucket
    ctx_chunk = min(mc.context_length - 64, 1024)
    for tt in runner.prefill_token_buckets:
        t0 = _time.perf_counter()
        nseq = min(bb, -(-tt // ctx_chunk))
        per = tt // nseq
        meta = SamplingBatchInfo.meta_from_reqs(
            [sp] * nseq, padded_bs=bb, slots=list(range(nseq)),
            max_slots=sched.max_slots,
        )
        input_ids = np.zeros(tt, dtype=np.int32)
        positions = np.concatenate(
            [np.arange(per, dtype=np.int32)] * nseq
        )[:tt]
        out_loc = np.zeros(tt, dtype=np.int32)
        pt = np.zeros((nseq, runner.max_pages_per_req), dtype=np.int32)
        seq_lens = np.full(nseq, per, dtype=np.int32)
        extend_lens = np.full(nseq, per, dtype=np.int32)
        extend_lens[-1] = tt - per * (nseq - 1)
        seq_lens[-1] = extend_lens[-1]
        runner.forward_extend_packed(
            input_ids, positions, out_loc, pt, seq_lens, extend_lens, meta,
            output_start=np.full(nseq, 1 << 20, dtype=np.int32),
        )
        print(
            f"# warm extend tt={tt}: {_time.perf_counter() - t0:.0f}s",
            file=_sys.stderr,
        )


def main():
    tiny = os.environ.get("BENCH_TINY") == "1"
    # v5e has 16 GiB HBM: 8B bf16 does not fit — 8-bit weights are the
    # single-chip serving config. W8A8 (dynamic per-token act quant) over
    # W8A16: the v5e MXU runs int8xint8 at 244 TOPS vs 147 TFLOPs bf16
    # (measured), which lifts prefill AND keeps large-batch decode off the
    # bf16 compute wall (bs=192 matmul body: 15.1 -> ~11 ms/step).
    # Accuracy-gated: tests/test_accuracy_eval.py::test_w8a8_int8_accuracy.
    quant = os.environ.get("BENCH_QUANT", None if tiny else "w8a8_int8")
    # 500 prompts = the reference CI methodology
    # (test_bench_serving_1gpu_part1.py:43); the longer steady phase also
    # amortizes burst ramp/drain (measured 2600 -> 2809 tok/s vs 300)
    num_prompts = int(os.environ.get("BENCH_NUM_PROMPTS", "16" if tiny else "500"))
    # workload shape: "random" = blog_v0_2 random-dataset bounds;
    # "sharegpt" = sharegpt-like length distribution (lognormal body +
    # long tail, like the reference CI's 500-prompt sharegpt run)
    dataset = os.environ.get("BENCH_DATASET", "random")

    if tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
    from sglang_tpu.managers.scheduler import Scheduler
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    hf = tiny_cfg() if tiny else llama8b_cfg()
    # int8 KV default on v5e: Mosaic's int8->bf16 upcast is the one fast
    # 8-bit path, the kernel wins 1.13-1.27x and the 1.94x pool doubles
    # serving concurrency — warm 3-pass median 1628 vs 1409 tok/s bf16.
    # (fp8 KV still loses on v5e: no native fp8 compute — 185 vs 606.)
    kv_dtype = os.environ.get("BENCH_KV", "auto" if tiny else "int8")
    sa = ServerArgs(
        model_path="bench-llama-8b" if not tiny else "bench-tiny",
        load_format="zeros",
        quantization=quant,
        kv_cache_dtype=kv_dtype,
        skip_tokenizer_init=True,
        random_seed=0,
        log_level="warning",
        context_length=2048,
        max_total_tokens=4096 if tiny else None,
        # 0.90 measured safe (pool 67200 tokens, 0 retractions) and worth
        # ~+3% decode concurrency; 0.92 risks the compile temp arena
        mem_fraction_static=float(os.environ.get("BENCH_MEM_FRAC", "0.90")),
        # ps=128 halves the decode kernel's per-page DMA count but costs
        # more page-granularity waste (measured e2e 1434 vs 1591 tok/s at
        # ps=64 on this workload's short sequences) — ps=64 stays default
        page_size=64 if not tiny else 16,
        # 8192-token prefill rounds (round 5): halves the round count (and
        # its ~26 ms/round dispatch+readback tax) and doubles the ramp
        # rate at the start of a burst — measured 2396 -> 2575 tok/s warm
        max_prefill_tokens=int(os.environ.get("BENCH_PREFILL_TOKENS", "8192")),
        chunked_prefill_size=int(os.environ.get("BENCH_PREFILL_TOKENS", "8192")),
        # offline throughput: longest-output-first admission (reference
        # `lof` policy) compresses the end-of-pass drain tail — the last
        # admitted requests have the shortest outputs, so the batch never
        # idles at low occupancy finishing a few long stragglers
        # (measured 2220 -> 2396 tok/s warm; kept tokens/step 77 -> 91)
        schedule_policy=os.environ.get("BENCH_POLICY", "lof"),
        # few buckets: each (bucket, variant) pair is one XLA compile, and
        # decode is weight-read-bound so padded rows are nearly free
        # KV pool (~46k tokens) caps concurrency near 70 at this workload's
        # lengths, so bs>128 buckets never run — don't warm/compile them
        # int8 KV's 1.94x pool sustains ~190 concurrent at this workload's
        # lengths — the 192 bucket is reachable and decode is weight-bound,
        # so bigger batches amortize the same weight reads
        decode_bs_buckets=(
            [int(x) for x in os.environ["BENCH_BS_BUCKETS"].split(",")]
            if os.environ.get("BENCH_BS_BUCKETS")
            else ([32, 64, 128, 192] if kv_dtype == "int8" else [32, 64, 96, 128])
        )
        if not tiny
        else [8, 16, 32],
        # finer prefill buckets: steady-state rounds average ~2.1-2.6k real
        # tokens (admission is pool-limited, not budget-limited), and with
        # only {2048, 4096} most rounds padded to 4096 — measured ~2x token
        # cost (42.5s prefill_run for 325k tokens vs 131us/tok honest rate)
        prefill_token_buckets=(
            [int(x) for x in os.environ["BENCH_PREFILL_BUCKETS"].split(",")]
            if os.environ.get("BENCH_PREFILL_BUCKETS")
            else [2048, 4096, 6144, 8192]
        )
        if not tiny
        else [512],
        max_running_requests=256,
        device="cpu" if tiny else "auto",
        decode_multi_step=int(os.environ.get("BENCH_MULTI_STEP", "16")),
        # accumulate KV headroom before prefill rounds: fewer, fuller
        # rounds (105 -> 78 per 3 passes) — measured 2079 -> 2154 tok/s;
        # 10240 showed no further gain
        prefill_accumulate_tokens=int(os.environ.get("BENCH_ACCUM", "6144")),
    )
    mc = ModelConfig.from_hf_dict(
        hf,
        model_path=sa.model_path,
        dtype=sa.dtype,
        context_length=sa.context_length,
        quantization=sa.quantization,
        kv_cache_dtype=sa.kv_cache_dtype,
    )
    t0 = time.perf_counter()
    runner = ModelRunner(sa, mc)
    sched = Scheduler(sa, runner)
    print(
        f"# engine up in {time.perf_counter() - t0:.1f}s; "
        f"kv pool {runner.max_total_tokens} tokens",
        file=sys.stderr,
    )

    rng = np.random.default_rng(0)
    if dataset == "sharegpt":
        # sharegpt-shaped lengths: lognormal body with a long tail
        # (median input ~190, median output ~160), clipped to the bench
        # context budget — the reference CI's sharegpt workload shape
        in_lens = np.clip(
            rng.lognormal(5.25, 0.9, size=num_prompts), 16, 1280
        ).astype(np.int64)
        out_lens = np.clip(
            rng.lognormal(5.1, 0.8, size=num_prompts), 8, 640
        ).astype(np.int64)
        out_lens = np.minimum(out_lens, 2000 - in_lens)
    else:
        # random-dataset workload (reference blog_v0_2 methodology, scaled
        # to one round): input 128..512, output 64..256, infinite rate
        in_lens = rng.integers(128, 512, size=num_prompts)
        out_lens = rng.integers(64, 256, size=num_prompts)
    if tiny:
        in_lens, out_lens = in_lens // 8, out_lens // 8

    # Warm EVERY serving jit variant (each decode bucket x {fresh, chained}
    # chunk + each prefill token bucket) so the measured phase replays from
    # cache — production serving compiles once and serves forever; without
    # this the measurement is mostly XLA compilation.
    _warm_all_buckets(sched, runner, mc)
    # short unmeasured serving pre-pass: the first measured pass used to
    # run ~15% under steady state (host-side dispatch paths, allocator
    # and radix state warm up beyond the compile cache)
    for i in range(32 if not tiny else 4):
        sched.add_request(
            TokenizedGenerateReqInput(
                rid=f"warm{i}",
                input_ids=rng.integers(
                    3, mc.vocab_size - 1, size=int(in_lens[i % len(in_lens)])
                ).tolist(),
                sampling_params=SamplingParams(
                    max_new_tokens=32, ignore_eos=True, temperature=0.0
                ),
            )
        )
    while sched.has_work():
        sched.step()
    sched.flush_cache()
    print(f"# warmup done at {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # THREE measured passes, median reported: the tunneled runtime's
    # per-dispatch latency varies run to run (measured 595-957 tok/s on
    # identical code); the median is the honest point estimate. The radix
    # cache is flushed between passes so each pass does the same work.
    # 5 passes: the tunneled runtime throws occasional ~700 tok/s freak
    # passes on identical code; a 5-pass median tolerates two of them
    n_pass = 1 if tiny else int(os.environ.get("BENCH_PASSES", "5"))
    results = []
    measured_wall = 0.0
    for p in range(n_pass):
        for i in range(num_prompts):
            sched.add_request(
                TokenizedGenerateReqInput(
                    rid=f"p{p}r{i}",
                    input_ids=rng.integers(
                        3, mc.vocab_size - 1, size=int(in_lens[i])
                    ).tolist(),
                    sampling_params=SamplingParams(
                        max_new_tokens=int(out_lens[i]),
                        ignore_eos=True,
                        temperature=0.0,
                    ),
                )
            )
        t1 = time.perf_counter()
        done = 0
        gen_tokens = 0
        while sched.has_work():
            for out in sched.step():
                if out.finished:
                    done += 1
                    gen_tokens += out.completion_tokens
        elapsed = time.perf_counter() - t1
        measured_wall += elapsed
        assert done == num_prompts, f"{done}/{num_prompts} finished"
        results.append(gen_tokens / elapsed)
        print(f"# pass {p}: {results[-1]:.1f} tok/s", file=sys.stderr)
        sched.flush_cache()
    toks_per_s = sorted(results)[len(results) // 2]
    # where the scheduler thread spent the measured window (host view;
    # "dispatch" includes device wait when the pipeline is not deep enough).
    # Stage counters accumulate over ALL measured passes, so compare against
    # the summed pass wall time (r2's negative "untracked" compared 3-pass
    # stage totals to 1-pass elapsed).
    stages = dict(sched.stats.stage_time)
    accounted = sum(stages.values())
    stages["untracked"] = measured_wall - accounted
    print(
        "# stage times: "
        + ", ".join(f"{k}={v:.2f}s" for k, v in sorted(stages.items())),
        file=sys.stderr,
    )
    print(
        "# stage max: "
        + ", ".join(
            f"{k}={v:.2f}s" for k, v in sorted(sched.stats.stage_max.items())
        ),
        file=sys.stderr,
    )
    print(
        f"# prefill {sched.stats.num_prefill_tokens} tok in "
        f"{sched.stats.num_prefill_steps} rounds; decode "
        f"{sched.stats.num_decode_tokens} tok in "
        f"{sched.stats.num_decode_steps} steps; "
        f"retractions {sched.stats.num_retractions}",
        file=sys.stderr,
    )
    st = sched.stats
    if st.decode_bucket_row_steps:
        print(
            "# decode rows/step: "
            f"bucket {st.decode_bucket_row_steps / st.num_decode_steps:.1f}, "
            f"chain {st.decode_chain_row_steps / st.num_decode_steps:.1f}, "
            f"live {st.decode_live_row_steps / st.num_decode_steps:.1f}, "
            f"kept {st.num_decode_tokens / st.num_decode_steps:.1f} "
            f"(eff {st.num_decode_tokens / st.decode_bucket_row_steps:.2f})",
            file=sys.stderr,
        )
    if st.prefill_padded_tokens:
        print(
            f"# prefill padding: real {st.num_prefill_tokens} / padded "
            f"{st.prefill_padded_tokens} "
            f"({st.num_prefill_tokens / st.prefill_padded_tokens:.2f} fill)",
            file=sys.stderr,
        )

    kv_tag = "" if kv_dtype == "auto" else f"_kv{kv_dtype}"
    ds_tag = "" if dataset == "random" else f"_{dataset}"
    result = {
        "metric": f"offline_output_throughput_llama8b_{quant or 'bf16'}{kv_tag}{ds_tag}"
        if not tiny
        else "offline_output_throughput_tiny_cpu",
        "value": round(toks_per_s, 1),
        "unit": "tok/s",
        "vs_baseline": round(toks_per_s / BASELINE_TOKS, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
