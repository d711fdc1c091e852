"""Pytest root conftest.

Tests run on CPU by default (reference parity: the CPU suite proves the
runtime is device-portable, `test/run_suite.py:27`). A virtual 8-device CPU
platform enables multi-chip sharding tests without TPU hardware. Set
SGLANG_TPU_TEST_DEVICE=tpu to run the suite on a real chip.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

# No network in CI: fail fast instead of retrying against the HF hub.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

if os.environ.get("SGLANG_TPU_TEST_DEVICE", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # An already-registered TPU PJRT plugin (sitecustomize) outranks the env
    # var; the config update wins as long as no backend is initialized yet.
    import jax

    jax.config.update("jax_platforms", "cpu")
