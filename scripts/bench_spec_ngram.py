"""NGRAM speculative decoding: measured win on a real trained model.

Trains a tiny repeat-task LM (induction — the model genuinely continues
patterns from its context), serves it through the full engine, and
measures tokens/s + accept length with and without NGRAM speculation on
the same prompts. This is the train-free speculation route the reference
gates in CI (`srt/speculative/ngram_worker.py`; accept-length assertions
in its spec kits).

Run on the chip: python scripts/bench_spec_ngram.py
On CPU:          SGLANG_TPU_SPEC_BENCH_DEVICE=cpu python scripts/bench_spec_ngram.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.train_tiny_lm import BOS, REP_SEP, REP_VOCAB, train_repeat_and_export

CKPT = os.environ.get("SGLANG_TPU_SPEC_CKPT", "/tmp/sglang_tpu_repeat_lm")
DEVICE = os.environ.get("SGLANG_TPU_SPEC_BENCH_DEVICE", "auto")
N_PROMPTS = int(os.environ.get("SGLANG_TPU_SPEC_PROMPTS", "64"))
OUT_LEN = 96


def make_prompts(n, seed=0):
    rng = np.random.default_rng(seed)
    prompts = []
    for _ in range(n):
        L = int(rng.integers(4, 11))
        pat = rng.integers(4, REP_VOCAB, size=L).tolist()
        prompts.append([BOS] + pat + [REP_SEP] + pat + [REP_SEP])
    return prompts


def run(ckpt, prompts, spec):
    from sglang_tpu import Engine

    engine = Engine(
        model_path=ckpt,
        device=DEVICE,
        dtype="float32",
        skip_tokenizer_init=True,
        page_size=16,
        max_total_tokens=65536,
        context_length=512,
        chunked_prefill_size=512,
        decode_bs_buckets=[16, 64],
        prefill_token_buckets=[512],
        max_running_requests=64,
        random_seed=0,
        log_level="warning",
        decode_multi_step=int(os.environ.get("SGLANG_TPU_SPEC_BASE_K", "8")),
        speculative_algorithm="NGRAM" if spec else None,
        speculative_num_draft_tokens=int(os.environ.get("SGLANG_TPU_SPEC_DRAFT", "8")),
        speculative_ngram_min_match=1,
        speculative_ngram_max_match=int(os.environ.get("SGLANG_TPU_SPEC_MAXMATCH", "4")),
    )
    try:
        # warm all jit variants so the measurement is serving, not compiles
        engine.generate(
            input_ids=prompts,
            sampling_params={"max_new_tokens": OUT_LEN, "temperature": 0.0,
                             "ignore_eos": True},
        )
        sched = engine.scheduler
        base_steps = sched.stats.num_decode_steps
        s0, a0 = sched.stats.num_spec_steps, sched.stats.num_spec_accepted
        t0 = time.perf_counter()
        outs = engine.generate(
            input_ids=prompts,
            sampling_params={"max_new_tokens": OUT_LEN, "temperature": 0.0,
                             "ignore_eos": True},
        )
        dt = time.perf_counter() - t0
        toks = sum(len(o["output_ids"]) for o in outs)
        steps = sched.stats.num_decode_steps - base_steps
        spec_steps = sched.stats.num_spec_steps - s0
        accepted = sched.stats.num_spec_accepted - a0
        acc_len = accepted / spec_steps if spec_steps else float("nan")
        return dict(
            toks=toks, dt=dt, tps=toks / dt, steps=steps,
            accept_len=acc_len, outs=outs,
        )
    finally:
        engine.shutdown()


def main():
    print("# training repeat-task LM (cached after first run)...",
          file=sys.stderr)
    ckpt = train_repeat_and_export(CKPT, steps=1500, log=lambda m: print(
        f"#   {m}", file=sys.stderr))
    prompts = make_prompts(N_PROMPTS)

    base = run(ckpt, prompts, spec=False)
    spec = run(ckpt, prompts, spec=True)

    # speculation must be lossless: greedy outputs identical
    mismatch = sum(
        b["output_ids"] != s["output_ids"]
        for b, s in zip(base["outs"], spec["outs"])
    )
    print(
        f"baseline: {base['tps']:8.1f} tok/s  ({base['steps']} decode steps)\n"
        f"ngram:    {spec['tps']:8.1f} tok/s  ({spec['steps']} verify steps, "
        f"accept length {spec['accept_len']:.2f})\n"
        f"speedup:  {spec['tps'] / base['tps']:.2f}x   "
        f"output mismatches: {mismatch}/{len(prompts)}"
    )
    tag = os.environ.get("SGLANG_TPU_SPEC_TAG")
    if tag:
        import json

        with open(f"SPEC_{tag}.json", "w") as f:
            json.dump(
                {
                    "suite": "ngram-speculative",
                    "baseline_tok_s": round(base["tps"], 1),
                    "ngram_tok_s": round(spec["tps"], 1),
                    "speedup": round(spec["tps"] / base["tps"], 2),
                    "accept_length": round(spec["accept_len"], 2),
                    "lossless_mismatches": mismatch,
                    "n_prompts": len(prompts),
                    # the non-spec baseline's fused chain depth: 4 is the
                    # engine's own latency-mode serving configuration
                    # (online_chain_depth — what the server runs under
                    # streaming traffic), 8/16 are offline-throughput
                    # chains
                    "baseline_chain_k": int(
                        os.environ.get("SGLANG_TPU_SPEC_BASE_K", "8")
                    ),
                },
                f,
                indent=1,
            )


if __name__ == "__main__":
    main()
