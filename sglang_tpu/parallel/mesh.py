"""Device mesh construction.

Replaces the reference's entire `distributed/` stack (§2 P10:
GroupCoordinator + NCCL/custom-allreduce/MSCCL++): on TPU all collectives
are XLA ops over a `jax.sharding.Mesh`, laid out so TP collectives ride ICI.
Axes: ("data", "model") — "model" is the tensor-parallel axis (innermost so
TP all-reduces stay on the fastest links), "data" is the replica axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

MESH_AXES = ("data", "pipe", "model")


def get_device_kind() -> str:
    return jax.devices()[0].platform  # "tpu" | "cpu" | "gpu"


def create_mesh(
    tp_size: int = 1,
    dp_size: int = 1,
    pp_size: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    """("data", "pipe", "model") mesh. "model" innermost so TP collectives
    ride the fastest ICI links; "pipe" between so stage neighbors are
    adjacent; "data" outermost (DP-attention groups never exchange KV).
    Size-1 axes are free — PartitionSpecs that don't name them replicate."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    total = tp_size * dp_size * pp_size
    if total > n:
        raise ValueError(f"tp*dp*pp={total} exceeds {n} devices")
    used = devices[:total]
    arr = np.array(used).reshape(dp_size, pp_size, tp_size)
    mesh = Mesh(arr, MESH_AXES)
    logger.info(
        "mesh: data=%d pipe=%d model=%d on %s",
        dp_size, pp_size, tp_size, used[0].platform,
    )
    return mesh


def shard(mesh: Mesh, spec: PartitionSpec) -> NamedSharding:
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
