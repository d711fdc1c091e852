"""Batched device-side sampling tensors.

Parity with reference `srt/sampling/sampling_batch_info.py:23
SamplingBatchInfo` + `sampling/penaltylib/orchestrator.py` — per-batch
arrays for temperature / top-k / top-p / min-p, penalty params, logit bias,
and EOS blocking for min_new_tokens. All arrays are padded to the decode
bucket so the jitted sample step has static shapes.

Penalty state design (TPU-native): a persistent device-side token-count
matrix `[max_slots+1, vocab]` lives in the ModelRunner (slot = stable
per-request index assigned by the scheduler; the extra row absorbs padding).
The jitted step zeroes fresh rows, scatter-adds prompt tokens on extend and
sampled tokens at sample time, and the sampler gathers `counts[slot_ids]`
to apply frequency/presence/repetition — no [B, vocab] host transfer ever
happens (the reference re-uploads penalty tensors on batch changes).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.sampling.sampling_params import TOP_K_ALL, SamplingParams

MAX_BIAS_TOKENS = 32  # per-request logit_bias entries (padded)
MAX_STOP_TOKENS = 8  # per-request blocked-EOS ids for min_new_tokens


@jax.tree_util.register_dataclass
@dataclass
class SamplingBatchInfo:
    temperature: jax.Array  # [B] f32
    top_k: jax.Array  # [B] i32
    top_p: jax.Array  # [B] f32
    min_p: jax.Array  # [B] f32
    # penalty params + slot mapping
    slot_ids: jax.Array  # [B] i32 (padding rows -> max_slots sentinel row)
    freq_pen: jax.Array  # [B] f32
    pres_pen: jax.Array  # [B] f32
    rep_pen: jax.Array  # [B] f32
    fresh_mask: jax.Array  # [B] bool — zero this slot's counts (new request)
    count_mask: jax.Array  # [B] f32 — 1 when the sampled token is kept
    # logit bias (sparse, padded)
    bias_ids: jax.Array  # [B, MAX_BIAS_TOKENS] i32 (pad = 0)
    bias_vals: jax.Array  # [B, MAX_BIAS_TOKENS] f32 (pad = 0)
    # min_new_tokens EOS blocking (pad = 0 with weight 0)
    block_ids: jax.Array  # [B, MAX_STOP_TOKENS] i32
    block_mask: jax.Array  # [B, MAX_STOP_TOKENS] f32 (1 = block this id)
    # grammar vocab bitmask, big-endian packed (reference sgl-kernel
    # apply_token_bitmask; [B, 1] dummy when unused)
    vocab_mask_packed: jax.Array = None  # [B, ceil(V/8)] uint8
    # static flags (select the jit variant)
    is_all_greedy: bool = field(metadata=dict(static=True), default=False)
    need_top_p: bool = field(metadata=dict(static=True), default=False)
    need_min_p: bool = field(metadata=dict(static=True), default=False)
    need_penalties: bool = field(metadata=dict(static=True), default=False)
    need_bias: bool = field(metadata=dict(static=True), default=False)
    need_grammar: bool = field(metadata=dict(static=True), default=False)

    @classmethod
    def from_reqs(
        cls,
        params_list: List[SamplingParams],
        padded_bs: int,
        slots: Optional[List[int]] = None,
        fresh: Optional[List[bool]] = None,
        count_sample: Optional[List[bool]] = None,
        eos_blocked: Optional[List[List[int]]] = None,
        max_slots: int = 0,
        grammar_masks: Optional[np.ndarray] = None,  # [n, V] bool or None
    ) -> "SamplingBatchInfo":
        n = len(params_list)
        temperature = np.ones(padded_bs, dtype=np.float32)
        top_k = np.full(padded_bs, 1, dtype=np.int32)
        top_p = np.ones(padded_bs, dtype=np.float32)
        min_p = np.zeros(padded_bs, dtype=np.float32)
        slot_ids = np.full(padded_bs, max_slots, dtype=np.int32)
        freq = np.zeros(padded_bs, dtype=np.float32)
        pres = np.zeros(padded_bs, dtype=np.float32)
        rep = np.ones(padded_bs, dtype=np.float32)
        fresh_m = np.zeros(padded_bs, dtype=bool)
        count_m = np.zeros(padded_bs, dtype=np.float32)
        bias_ids = np.zeros((padded_bs, MAX_BIAS_TOKENS), dtype=np.int32)
        bias_vals = np.zeros((padded_bs, MAX_BIAS_TOKENS), dtype=np.float32)
        block_ids = np.zeros((padded_bs, MAX_STOP_TOKENS), dtype=np.int32)
        block_mask = np.zeros((padded_bs, MAX_STOP_TOKENS), dtype=np.float32)
        need_penalties = False
        need_bias = False
        for i, sp in enumerate(params_list):
            temperature[i] = sp.temperature
            top_k[i] = min(sp.top_k, TOP_K_ALL)
            top_p[i] = sp.top_p
            min_p[i] = sp.min_p
            freq[i] = sp.frequency_penalty
            pres[i] = sp.presence_penalty
            rep[i] = sp.repetition_penalty
            if (
                sp.frequency_penalty != 0.0
                or sp.presence_penalty != 0.0
                or sp.repetition_penalty != 1.0
            ):
                need_penalties = True
            if slots is not None:
                slot_ids[i] = slots[i]
            if fresh is not None:
                fresh_m[i] = fresh[i]
            count_m[i] = (
                1.0 if (count_sample is None or count_sample[i]) else 0.0
            )
            if sp.logit_bias:
                need_bias = True
                for j, (tid, v) in enumerate(sp.logit_bias.items()):
                    if j >= MAX_BIAS_TOKENS:
                        break
                    bias_ids[i, j] = tid
                    bias_vals[i, j] = v
            if eos_blocked is not None and eos_blocked[i]:
                need_bias = True
                for j, tid in enumerate(eos_blocked[i][:MAX_STOP_TOKENS]):
                    block_ids[i, j] = tid
                    block_mask[i, j] = 1.0
        need_grammar = grammar_masks is not None
        if need_grammar:
            full = np.ones((padded_bs, grammar_masks.shape[1]), dtype=bool)
            full[: len(grammar_masks)] = grammar_masks
            packed = np.packbits(full, axis=1)
        else:
            packed = np.zeros((padded_bs, 1), dtype=np.uint8)
        return cls(
            temperature=jnp.asarray(temperature),
            top_k=jnp.asarray(top_k),
            top_p=jnp.asarray(top_p),
            min_p=jnp.asarray(min_p),
            slot_ids=jnp.asarray(slot_ids),
            freq_pen=jnp.asarray(freq),
            pres_pen=jnp.asarray(pres),
            rep_pen=jnp.asarray(rep),
            fresh_mask=jnp.asarray(fresh_m),
            count_mask=jnp.asarray(count_m),
            bias_ids=jnp.asarray(bias_ids),
            bias_vals=jnp.asarray(bias_vals),
            block_ids=jnp.asarray(block_ids),
            block_mask=jnp.asarray(block_mask),
            vocab_mask_packed=jnp.asarray(packed),
            is_all_greedy=all(sp.is_greedy for sp in params_list),
            need_top_p=any(sp.top_p < 1.0 for sp in params_list),
            need_min_p=any(sp.min_p > 0.0 for sp in params_list),
            need_penalties=need_penalties,
            need_bias=need_bias,
            need_grammar=need_grammar,
        )
