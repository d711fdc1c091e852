"""sglang_tpu — a TPU-native LLM serving engine (JAX/XLA/Pallas).

Public surface parity with reference `python/sglang/__init__.py`:
`sglang_tpu.Engine` (offline API), `ServerArgs`, `SamplingParams`.
"""

from sglang_tpu.sampling.sampling_params import SamplingParams
from sglang_tpu.server_args import ServerArgs
from sglang_tpu.version import __version__


def __getattr__(name):
    # Lazy import: `Engine` pulls in jax; keep `import sglang_tpu` light.
    if name == "Engine":
        from sglang_tpu.entrypoints.engine import Engine

        return Engine
    raise AttributeError(name)


__all__ = ["Engine", "SamplingParams", "ServerArgs", "__version__"]
