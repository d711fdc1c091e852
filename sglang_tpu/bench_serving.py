"""Online serving benchmark: TTFT / ITL / TPOT / throughput.

Parity with reference `python/sglang/bench_serving.py` (metric definitions
at `:101-102`; random-dataset methodology from `benchmark/blog_v0_2`):
drives a running server's `/generate` streaming endpoint at a given request
rate and reports the standard serving metrics.

Usage:
  python -m sglang_tpu.bench_serving --base-url http://127.0.0.1:30000 \
      --num-prompts 100 --request-rate 4 --random-input 512 --random-output 256
"""

from __future__ import annotations

import argparse
import asyncio
import json
import random
import time
from dataclasses import dataclass, field
from typing import List

import aiohttp
import numpy as np


@dataclass
class ReqResult:
    prompt_tokens: int = 0
    output_tokens: int = 0
    ttft: float = 0.0  # time to first token (s)
    itl: List[float] = field(default_factory=list)  # inter-token latencies
    e2e: float = 0.0
    ok: bool = False
    error: str = ""


async def _one_request(
    session: aiohttp.ClientSession,
    base_url: str,
    input_ids: List[int],
    output_len: int,
) -> ReqResult:
    r = ReqResult(prompt_tokens=len(input_ids))
    payload = {
        "input_ids": input_ids,
        "stream": True,
        "sampling_params": {
            "max_new_tokens": output_len,
            "temperature": 0.0,
            "ignore_eos": True,
        },
    }
    t0 = time.perf_counter()
    last = t0
    n_tokens = 0
    try:
        async with session.post(f"{base_url}/generate", json=payload) as resp:
            if resp.status != 200:
                r.error = f"HTTP {resp.status}: {await resp.text()}"
                return r
            async for line in resp.content:
                line = line.decode().strip()
                if not line.startswith("data: ") or line == "data: [DONE]":
                    continue
                chunk = json.loads(line[6:])
                now = time.perf_counter()
                new_n = chunk["meta_info"]["completion_tokens"]
                if n_tokens == 0 and new_n > 0:
                    r.ttft = now - t0
                elif new_n > n_tokens:
                    # spread the batch of tokens over the interval
                    per = (now - last) / (new_n - n_tokens)
                    r.itl.extend([per] * (new_n - n_tokens))
                n_tokens = new_n
                last = now
        r.output_tokens = n_tokens
        r.e2e = time.perf_counter() - t0
        r.ok = n_tokens > 0
    except aiohttp.ClientError as e:
        r.error = str(e)
    return r


async def run_benchmark(args) -> dict:
    rng = np.random.default_rng(args.seed)
    vocab = args.vocab_size
    reqs = []
    for _ in range(args.num_prompts):
        ilen = max(4, int(rng.normal(args.random_input, args.random_input * args.range_ratio)))
        olen = max(4, int(rng.normal(args.random_output, args.random_output * args.range_ratio)))
        ids = rng.integers(4, vocab - 4, size=ilen).tolist()
        reqs.append((ids, olen))

    conn = aiohttp.TCPConnector(limit=0)
    timeout = aiohttp.ClientTimeout(total=args.timeout)
    results: List[ReqResult] = []
    t_start = time.perf_counter()
    async with aiohttp.ClientSession(connector=conn, timeout=timeout) as session:
        tasks = []
        for ids, olen in reqs:
            tasks.append(
                asyncio.create_task(_one_request(session, args.base_url, ids, olen))
            )
            if args.request_rate < float("inf"):
                await asyncio.sleep(random.expovariate(args.request_rate))
        results = list(await asyncio.gather(*tasks))
    wall = time.perf_counter() - t_start

    good = [r for r in results if r.ok]
    if not good:
        errs = {r.error for r in results}
        raise RuntimeError(f"no successful requests: {errs}")
    out_tokens = sum(r.output_tokens for r in good)
    in_tokens = sum(r.prompt_tokens for r in good)
    ttfts = np.array([r.ttft for r in good])
    itls = np.array([x for r in good for x in r.itl]) if any(r.itl for r in good) else np.array([0.0])
    e2es = np.array([r.e2e for r in good])
    tpots = np.array(
        [r.e2e / max(r.output_tokens, 1) for r in good]
    )
    metrics = {
        "completed": len(good),
        "failed": len(results) - len(good),
        "duration_s": round(wall, 2),
        "total_input_tokens": in_tokens,
        "total_output_tokens": out_tokens,
        "request_throughput_rps": round(len(good) / wall, 3),
        "input_throughput_tok_s": round(in_tokens / wall, 1),
        "output_throughput_tok_s": round(out_tokens / wall, 1),
        "mean_ttft_ms": round(float(ttfts.mean()) * 1000, 1),
        "median_ttft_ms": round(float(np.median(ttfts)) * 1000, 1),
        "p99_ttft_ms": round(float(np.percentile(ttfts, 99)) * 1000, 1),
        "mean_itl_ms": round(float(itls.mean()) * 1000, 2),
        "median_itl_ms": round(float(np.median(itls)) * 1000, 2),
        "p99_itl_ms": round(float(np.percentile(itls, 99)) * 1000, 2),
        "mean_tpot_ms": round(float(tpots.mean()) * 1000, 2),
        "median_e2e_ms": round(float(np.median(e2es)) * 1000, 1),
    }
    return metrics


def main():
    p = argparse.ArgumentParser(description="sglang_tpu serving benchmark")
    p.add_argument("--base-url", default="http://127.0.0.1:30000")
    p.add_argument("--num-prompts", type=int, default=100)
    p.add_argument("--request-rate", type=float, default=float("inf"),
                   help="Poisson arrival rate (req/s); inf = all at once")
    p.add_argument("--random-input", type=int, default=512)
    p.add_argument("--random-output", type=int, default=256)
    p.add_argument("--range-ratio", type=float, default=0.3)
    p.add_argument("--vocab-size", type=int, default=32000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--timeout", type=float, default=1800)
    args = p.parse_args()
    metrics = asyncio.run(run_benchmark(args))
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
