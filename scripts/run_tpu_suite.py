"""On-device kernel test suite -> TPUTEST_r{N}.json.

Runs the Pallas-kernel correctness tests on the real chip with
SGLANG_TPU_TEST_DEVICE=tpu, which (a) compiles the REAL Mosaic kernels
(interpret=False), (b) uses the serving head dim (d=128 — hardware DMA
tiling), and (c) applies the on-device tolerance bounds (the v5e MXU
contracts f32 operands at bf16 input precision; see
tests/test_pallas_attention.py for the measured bounds).

Engine-level tests stay on the CPU suite (the tiny geometries they use
pay 30s+ per XLA compile on the tunneled runtime and exercise no
device-specific code beyond what the kernel tests cover).

Usage: python scripts/run_tpu_suite.py [round_tag]
"""

import json
import os
import subprocess
import sys
import time

FILES = [
    "tests/test_pallas_attention.py",
    "tests/test_kv_write.py",
    "tests/test_quant_matmul.py",
    "tests/test_nsa.py",
]


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r04"
    env = dict(os.environ, SGLANG_TPU_TEST_DEVICE="tpu")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", *FILES, "-q", "--tb=line"],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    tail = "\n".join(proc.stdout.strip().splitlines()[-5:])
    result = {
        "suite": "tpu-device-kernels",
        "files": FILES,
        "rc": proc.returncode,
        "ok": proc.returncode == 0,
        "wall_s": round(time.time() - t0, 1),
        "tail": tail,
    }
    out = f"TPUTEST_{tag}.json"
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
