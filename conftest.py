"""Pytest root conftest.

Tests run on CPU by default (reference parity: the CPU suite proves the
runtime is device-portable, `test/run_suite.py:27`). A virtual 8-device CPU
platform enables multi-chip sharding tests without TPU hardware. Set
SGLANG_TPU_TEST_DEVICE=tpu to run the suite on a real chip.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

if os.environ.get("SGLANG_TPU_TEST_DEVICE", "cpu") == "cpu":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
