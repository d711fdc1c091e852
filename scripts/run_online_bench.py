"""Online serving gate -> ONLINE_r{N}.json.

Launches the HTTP server on the real chip in the headline serving config
(llama-8B geometry, w8a8-int8 weights, int8 KV — same buckets as
bench.py so the persistent compile cache is shared), drives
`sglang_tpu.bench_serving` at fixed request rates, and records
TTFT/ITL/throughput. Reference analogue:
`test/registered/perf/test_bench_serving_1gpu_part1.py:137-142` (median
TTFT/ITL gates at fixed rates).

Usage: python scripts/run_online_bench.py [round_tag]
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PORT = 30117


def write_model_dir() -> str:
    from transformers import LlamaConfig

    from bench import llama8b_cfg

    d = tempfile.mkdtemp(prefix="online_llama8b_")
    cfg = llama8b_cfg()
    cfg.pop("architectures", None)
    LlamaConfig(**cfg, architectures=["LlamaForCausalLM"]).save_pretrained(d)
    return d


def wait_healthy(base, timeout=420):
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            with urllib.request.urlopen(f"{base}/health", timeout=5) as r:
                if r.status == 200:
                    return True
        except Exception:
            time.sleep(3)
    return False


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r04"
    model_dir = write_model_dir()
    base = f"http://127.0.0.1:{PORT}"
    server_cmd = [
        sys.executable, "-m", "sglang_tpu.launch_server",
        "--model-path", model_dir,
        "--load-format", "zeros",
        "--quantization", "w8a8_int8",
        "--kv-cache-dtype", "int8",
        "--skip-tokenizer-init",
        "--random-seed", "0",
        "--context-length", "2048",
        "--mem-fraction-static", "0.88",
        "--page-size", "64",
        "--max-prefill-tokens", "4096",
        "--chunked-prefill-size", "4096",
        # finer low-end buckets: a 512-token online prompt pads 2x into a
        # 1024 bucket otherwise (~30 ms of TTFT)
        "--prefill-token-buckets", "512", "768", "1024", "2048", "4096",
        "--decode-bs-buckets", "32", "64", "128", "192",
        "--max-running-requests", "256",
        "--decode-multi-step", "16",
        "--port", str(PORT),
        "--log-level", "warning",
    ]
    srv = subprocess.Popen(
        server_cmd, stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
        text=True, start_new_session=True,
    )
    result = {"suite": "online-serving", "tag": tag, "ok": False}
    try:
        if not wait_healthy(base):
            err = ""
            try:
                srv.stderr and (err := srv.stderr.read()[-2000:])
            except Exception:
                pass
            result["error"] = f"server never became healthy: {err}"
            return finish(result, tag, 1)
        # warm the serving graphs (compile-cache hits when bench.py ran
        # with the same config; otherwise this pays the cold compiles)
        t0 = time.time()
        subprocess.run(
            [sys.executable, "-m", "sglang_tpu.bench_serving",
             "--base-url", base, "--num-prompts", "32",
             "--request-rate", "inf", "--random-input", "256",
             "--random-output", "32"],
            capture_output=True, text=True, timeout=1800,
        )
        # paced warm passes compile the online_chain_depth chain variants
        # at the small decode buckets AND the small prefill buckets (the
        # inf burst packs prompts into large rounds and never uses them)
        for inp in ("384", "700", "512"):
            subprocess.run(
                [sys.executable, "-m", "sglang_tpu.bench_serving",
                 "--base-url", base, "--num-prompts", "16",
                 "--request-rate", "4", "--random-input", inp,
                 "--random-output", "48"],
                capture_output=True, text=True, timeout=1800,
            )
        result["warmup_s"] = round(time.time() - t0, 1)
        runs = []
        for rate, n_prompts in (("1", 48), ("4", 120), ("8", 120), ("inf", 120)):
            p = subprocess.run(
                [sys.executable, "-m", "sglang_tpu.bench_serving",
                 "--base-url", base, "--num-prompts", str(n_prompts),
                 "--request-rate", rate, "--random-input", "512",
                 "--random-output", "128", "--seed", "0"],
                capture_output=True, text=True, timeout=1800,
            )
            try:
                start = p.stdout.index("{")
                metrics = json.loads(p.stdout[start:])
            except Exception:
                metrics = {"error": p.stdout[-500:] + p.stderr[-500:]}
            metrics["request_rate"] = rate
            runs.append(metrics)
        result["runs"] = runs
        # GATES (reference pins median TTFT < 86 ms and ITL < 10 ms at
        # 1 req/s on its CUDA CI GPU —
        # test_bench_serving_1gpu_part1.py:137-142). This chip sits behind
        # a ~26 ms-per-readback tunnel and serves 4-step fused chains, so
        # the pinned floors are this engine's own measured band +
        # headroom, asserted the same way: the run FAILS (rc!=0) past
        # them.
        gates = {
            "rate1_median_ttft_ms": 150.0,
            "rate1_median_e2e_ms": 11000.0,
            "rate1_mean_tpot_ms": 30.0,
        }
        result["gates"] = gates
        failures = []
        r1 = runs[0]
        if "error" in r1:
            failures.append(f"rate-1 run failed: {r1['error'][:200]}")
        else:
            if r1.get("median_ttft_ms", 1e9) > gates["rate1_median_ttft_ms"]:
                failures.append(
                    f"median TTFT {r1.get('median_ttft_ms')} ms > "
                    f"{gates['rate1_median_ttft_ms']} @ 1 req/s"
                )
            if r1.get("median_e2e_ms", 1e9) > gates["rate1_median_e2e_ms"]:
                failures.append(
                    f"median e2e {r1.get('median_e2e_ms')} ms > "
                    f"{gates['rate1_median_e2e_ms']} @ 1 req/s"
                )
            if r1.get("mean_tpot_ms", 1e9) > gates["rate1_mean_tpot_ms"]:
                failures.append(
                    f"mean TPOT {r1.get('mean_tpot_ms')} ms > "
                    f"{gates['rate1_mean_tpot_ms']} @ 1 req/s"
                )
        result["gate_failures"] = failures
        result["ok"] = (
            all("error" not in r for r in runs) and not failures
        )
        return finish(result, tag, 0 if result["ok"] else 1)
    finally:
        try:
            os.killpg(os.getpgid(srv.pid), signal.SIGTERM)
        except Exception:
            pass


def finish(result, tag, rc):
    out = f"ONLINE_{tag}.json"
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return rc


if __name__ == "__main__":
    sys.exit(main())
