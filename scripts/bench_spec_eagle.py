"""EAGLE + STANDALONE speculative decoding: first on-chip e2e numbers.

Round-4 verdict: EAGLE/MTP had CPU-correct suites but zero on-chip e2e
measurements. This script serves the trained repeat-task LM through the
full engine on the real chip in three configurations and reports
tokens/s + accept length for each:

- baseline: fused decode chains at the latency-mode depth (k=4)
- EAGLE with a SYNTHETIC (untrained) draft head: measures the real
  on-chip cost of the EAGLE round pipeline (draft extend + tree draft +
  target verify + accept) — accept length ~1 (bonus token only), so the
  number is honest pipeline overhead, not a win claim
- STANDALONE with the TARGET ITSELF as the draft model: greedy
  self-drafting accepts everything, giving the UPPER BOUND of the
  separate-draft-model path's on-chip e2e speedup (a perfectly-trained
  draft of equal size; real drafts are smaller and cheaper per token)

Run: SGLANG_TPU_SPEC_TAG=r05 python scripts/bench_spec_eagle.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.bench_spec_ngram import make_prompts
from scripts.train_tiny_lm import train_repeat_and_export

CKPT = os.environ.get("SGLANG_TPU_SPEC_CKPT", "/tmp/sglang_tpu_repeat_lm")
DEVICE = os.environ.get("SGLANG_TPU_SPEC_BENCH_DEVICE", "auto")
N_PROMPTS = int(os.environ.get("SGLANG_TPU_SPEC_PROMPTS", "64"))
OUT_LEN = 96
BASE_K = int(os.environ.get("SGLANG_TPU_SPEC_BASE_K", "4"))


def save_eagle_draft(path, target_ckpt):
    """Synthetic EAGLE-1 draft head matching the target's geometry."""
    from safetensors.numpy import save_file

    with open(os.path.join(target_ckpt, "config.json")) as f:
        tc = json.load(f)
    h = tc["hidden_size"]
    heads = tc["num_attention_heads"]
    kv = tc.get("num_key_value_heads", heads)
    inter = tc["intermediate_size"]
    vocab = tc["vocab_size"]
    hd = h // heads
    rng = np.random.default_rng(11)

    def W(*shape, scale=0.05):
        return np.ascontiguousarray(
            rng.standard_normal(shape).astype(np.float32) * scale
        )

    tensors = {
        "embed_tokens.weight": W(vocab, h),
        "fc.weight": W(h, 2 * h),
        "fc.bias": np.zeros(h, dtype=np.float32),
        "layers.0.post_attention_layernorm.weight": np.ones(h, dtype=np.float32),
        "layers.0.self_attn.q_proj.weight": W(heads * hd, h),
        "layers.0.self_attn.k_proj.weight": W(kv * hd, h),
        "layers.0.self_attn.v_proj.weight": W(kv * hd, h),
        "layers.0.self_attn.o_proj.weight": W(h, heads * hd),
        "layers.0.mlp.gate_proj.weight": W(inter, h),
        "layers.0.mlp.up_proj.weight": W(inter, h),
        "layers.0.mlp.down_proj.weight": W(h, inter),
    }
    os.makedirs(path, exist_ok=True)
    save_file(tensors, os.path.join(path, "model.safetensors"))
    cfg = dict(tc)
    cfg["num_hidden_layers"] = 1
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    return path


def run(ckpt, prompts, algo=None, draft=None):
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
        decode_multi_step=BASE_K,
        speculative_algorithm=algo,
        speculative_draft_model_path=draft,
        speculative_num_draft_tokens=int(
            os.environ.get("SGLANG_TPU_SPEC_DRAFT", "6")
        ),
    )
    try:
        sp = {"max_new_tokens": OUT_LEN, "temperature": 0.0, "ignore_eos": True}
        engine.generate(input_ids=prompts, sampling_params=sp)  # warm
        sched = engine.scheduler
        s0, a0 = sched.stats.num_spec_steps, sched.stats.num_spec_accepted
        t0 = time.perf_counter()
        outs = engine.generate(input_ids=prompts, sampling_params=sp)
        dt = time.perf_counter() - t0
        toks = sum(len(o["output_ids"]) for o in outs)
        ss = sched.stats.num_spec_steps - s0
        acc = (sched.stats.num_spec_accepted - a0) / ss if ss else float("nan")
        return dict(tps=toks / dt, accept=acc, outs=outs)
    finally:
        engine.shutdown()


def main():
    ckpt = train_repeat_and_export(
        CKPT, steps=1500, log=lambda m: print(f"# {m}", file=sys.stderr)
    )
    draft_dir = save_eagle_draft("/tmp/sglang_tpu_eagle_draft", ckpt)
    prompts = make_prompts(N_PROMPTS)

    base = run(ckpt, prompts)
    eagle = run(ckpt, prompts, algo="EAGLE", draft=draft_dir)
    standalone = run(ckpt, prompts, algo="STANDALONE", draft=ckpt)

    mm_e = sum(
        b["output_ids"] != s["output_ids"]
        for b, s in zip(base["outs"], eagle["outs"])
    )
    mm_s = sum(
        b["output_ids"] != s["output_ids"]
        for b, s in zip(base["outs"], standalone["outs"])
    )
    print(
        f"baseline (k={BASE_K} chains): {base['tps']:8.1f} tok/s\n"
        f"eagle (untrained draft):     {eagle['tps']:8.1f} tok/s "
        f"(accept {eagle['accept']:.2f}, mismatches {mm_e})\n"
        f"standalone (self-draft UB):  {standalone['tps']:8.1f} tok/s "
        f"(accept {standalone['accept']:.2f}, mismatches {mm_s})"
    )
    tag = os.environ.get("SGLANG_TPU_SPEC_TAG")
    if tag:
        with open(f"SPEC_EAGLE_{tag}.json", "w") as f:
            json.dump(
                {
                    "suite": "eagle-standalone-e2e",
                    "baseline_chain_k": BASE_K,
                    "baseline_tok_s": round(base["tps"], 1),
                    "eagle_untrained_tok_s": round(eagle["tps"], 1),
                    "eagle_accept_length": round(eagle["accept"], 2),
                    "eagle_lossless_mismatches": mm_e,
                    "standalone_selfdraft_tok_s": round(standalone["tps"], 1),
                    "standalone_accept_length": round(standalone["accept"], 2),
                    "standalone_lossless_mismatches": mm_s,
                    "n_prompts": len(prompts),
                    "note": (
                        "eagle draft is UNTRAINED (pipeline-cost "
                        "measurement); standalone self-draft is the "
                        "equal-size perfectly-trained upper bound"
                    ),
                },
                f,
                indent=1,
            )


if __name__ == "__main__":
    main()
