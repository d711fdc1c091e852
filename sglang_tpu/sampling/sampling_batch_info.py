"""Batched device-side sampling tensors.

Parity with reference `srt/sampling/sampling_batch_info.py:23
SamplingBatchInfo` — per-batch arrays for temperature / top-k / top-p /
min-p, penalty state, and the grammar vocab mask. All arrays are padded to
the decode bucket so the jitted sample step has static shapes.

Penalty state (frequency/presence/repetition — reference
`sampling/penaltylib/orchestrator.py`) is a [B, vocab] int32 count matrix
kept ON DEVICE across steps and updated in the jitted step itself; it is
only materialized when some request in the batch uses penalties (static
flag -> separate jit variant).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.sampling.sampling_params import TOP_K_ALL, SamplingParams


@jax.tree_util.register_dataclass
@dataclass
class SamplingBatchInfo:
    temperature: jax.Array  # [B] f32
    top_k: jax.Array  # [B] i32
    top_p: jax.Array  # [B] f32
    min_p: jax.Array  # [B] f32
    # static flags (select the jit variant)
    is_all_greedy: bool = field(metadata=dict(static=True), default=False)
    need_top_p: bool = field(metadata=dict(static=True), default=False)
    need_min_p: bool = field(metadata=dict(static=True), default=False)

    @classmethod
    def from_reqs(
        cls, params_list: List[SamplingParams], padded_bs: int
    ) -> "SamplingBatchInfo":
        n = len(params_list)
        temperature = np.ones(padded_bs, dtype=np.float32)
        top_k = np.full(padded_bs, 1, dtype=np.int32)
        top_p = np.ones(padded_bs, dtype=np.float32)
        min_p = np.zeros(padded_bs, dtype=np.float32)
        for i, sp in enumerate(params_list):
            temperature[i] = sp.temperature
            top_k[i] = min(sp.top_k, TOP_K_ALL)
            top_p[i] = sp.top_p
            min_p[i] = sp.min_p
        return cls(
            temperature=jnp.asarray(temperature),
            top_k=jnp.asarray(top_k),
            top_p=jnp.asarray(top_p),
            min_p=jnp.asarray(min_p),
            is_all_greedy=all(sp.is_greedy for sp in params_list),
            need_top_p=any(sp.top_p < 1.0 for sp in params_list),
            need_min_p=any(sp.min_p > 0.0 for sp in params_list),
        )
