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
MAX_STOP_TOKENS = 32  # per-request blocked-EOS ids for min_new_tokens
CUSTOM_PARAMS_DIM = 8  # per-request custom-logit-processor params (padded)


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
    # custom logit processors: per-row registry index (-1 = none) + params
    proc_ids: jax.Array = None  # [B] i32
    proc_params: jax.Array = None  # [B, CUSTOM_PARAMS_DIM] f32
    # static flags (select the jit variant)
    is_all_greedy: bool = field(metadata=dict(static=True), default=False)
    need_top_p: bool = field(metadata=dict(static=True), default=False)
    need_min_p: bool = field(metadata=dict(static=True), default=False)
    need_penalties: bool = field(metadata=dict(static=True), default=False)
    need_bias: bool = field(metadata=dict(static=True), default=False)
    need_grammar: bool = field(metadata=dict(static=True), default=False)
    need_custom: bool = field(metadata=dict(static=True), default=False)

    @classmethod
    def from_reqs(cls, *args, **kwargs) -> "SamplingBatchInfo":
        return cls.meta_from_reqs(*args, **kwargs).to_sinfo()

    @classmethod
    def meta_from_reqs(
        cls,
        params_list: List[SamplingParams],
        padded_bs: int,
        slots: Optional[List[int]] = None,
        fresh: Optional[List[bool]] = None,
        count_sample: Optional[List[bool]] = None,
        eos_blocked: Optional[List[List[int]]] = None,
        max_slots: int = 0,
        grammar_masks: Optional[np.ndarray] = None,  # [n, V] bool or None
        custom_proc_ids: Optional[List[int]] = None,  # [n] registry index/-1
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
        proc_ids = np.full(padded_bs, -1, dtype=np.int32)
        proc_params = np.zeros((padded_bs, CUSTOM_PARAMS_DIM), dtype=np.float32)
        need_custom = False
        if custom_proc_ids is not None:
            for i, pid in enumerate(custom_proc_ids):
                if pid is None or pid < 0:
                    continue
                need_custom = True
                proc_ids[i] = pid
                cp = params_list[i].custom_params or []
                for j, v in enumerate(cp[:CUSTOM_PARAMS_DIM]):
                    proc_params[i, j] = v
        need_grammar = grammar_masks is not None
        if need_grammar:
            full = np.ones((padded_bs, grammar_masks.shape[1]), dtype=bool)
            full[: len(grammar_masks)] = grammar_masks
            packed = np.packbits(full, axis=1)
        else:
            packed = np.zeros((padded_bs, 1), dtype=np.uint8)
        return SamplingMeta(
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            min_p=min_p,
            slot_ids=slot_ids,
            freq_pen=freq,
            pres_pen=pres,
            rep_pen=rep,
            fresh_mask=fresh_m,
            count_mask=count_m,
            bias_ids=bias_ids,
            bias_vals=bias_vals,
            block_ids=block_ids,
            block_mask=block_mask,
            vocab_mask_packed=packed,
            proc_ids=proc_ids,
            proc_params=proc_params,
            flags=(
                all(sp.is_greedy for sp in params_list),
                any(sp.top_p < 1.0 for sp in params_list),
                any(sp.min_p > 0.0 for sp in params_list),
                need_penalties,
                need_bias,
                need_grammar,
                need_custom,
            ),
        )


# Field split for the two-blob packed upload (decode multi-step): every
# int-like field rides one i32 blob, every float field one f32 blob — two
# host->device transfers per chunk instead of fifteen.
_I32_FIELDS = (
    "top_k", "slot_ids", "fresh_mask", "bias_ids", "block_ids", "proc_ids",
)
_F32_FIELDS = (
    "temperature",
    "top_p",
    "min_p",
    "freq_pen",
    "pres_pen",
    "rep_pen",
    "count_mask",
    "bias_vals",
    "block_mask",
    "proc_params",
)


@dataclass
class SamplingMeta:
    """Host-side (numpy) sampling batch state; `.to_sinfo()` ships each
    field separately, `.pack()` ships two blobs (see unpack_sinfo)."""

    temperature: np.ndarray
    top_k: np.ndarray
    top_p: np.ndarray
    min_p: np.ndarray
    slot_ids: np.ndarray
    freq_pen: np.ndarray
    pres_pen: np.ndarray
    rep_pen: np.ndarray
    fresh_mask: np.ndarray
    count_mask: np.ndarray
    bias_ids: np.ndarray
    bias_vals: np.ndarray
    block_ids: np.ndarray
    block_mask: np.ndarray
    vocab_mask_packed: np.ndarray
    flags: tuple  # (greedy, top_p, min_p, penalties, bias, grammar, custom)
    proc_ids: np.ndarray = None
    proc_params: np.ndarray = None

    @property
    def padded_bs(self) -> int:
        return len(self.temperature)

    def to_sinfo(self) -> "SamplingBatchInfo":
        f = self.flags
        return SamplingBatchInfo(
            temperature=jnp.asarray(self.temperature),
            top_k=jnp.asarray(self.top_k),
            top_p=jnp.asarray(self.top_p),
            min_p=jnp.asarray(self.min_p),
            slot_ids=jnp.asarray(self.slot_ids),
            freq_pen=jnp.asarray(self.freq_pen),
            pres_pen=jnp.asarray(self.pres_pen),
            rep_pen=jnp.asarray(self.rep_pen),
            fresh_mask=jnp.asarray(self.fresh_mask),
            count_mask=jnp.asarray(self.count_mask),
            bias_ids=jnp.asarray(self.bias_ids),
            bias_vals=jnp.asarray(self.bias_vals),
            block_ids=jnp.asarray(self.block_ids),
            block_mask=jnp.asarray(self.block_mask),
            vocab_mask_packed=jnp.asarray(self.vocab_mask_packed),
            proc_ids=jnp.asarray(
                self.proc_ids
                if self.proc_ids is not None
                else np.full(self.padded_bs, -1, dtype=np.int32)
            ),
            proc_params=jnp.asarray(
                self.proc_params
                if self.proc_params is not None
                else np.zeros((self.padded_bs, CUSTOM_PARAMS_DIM), np.float32)
            ),
            is_all_greedy=f[0],
            need_top_p=f[1],
            need_min_p=f[2],
            need_penalties=f[3],
            need_bias=f[4],
            need_grammar=f[5],
            need_custom=f[6] if len(f) > 6 else False,
        )

    def _field(self, name: str) -> np.ndarray:
        v = getattr(self, name)
        if v is None:  # optional custom-proc fields default to "none"
            if name == "proc_ids":
                return np.full(self.padded_bs, -1, dtype=np.int32)
            return np.zeros((self.padded_bs, CUSTOM_PARAMS_DIM), np.float32)
        return np.asarray(v)

    def pack(self, extra_i32: list = ()) -> tuple:
        """(i32_blob, f32_blob) numpy arrays; extra_i32 arrays are
        prepended (page tables, seq lens, input ids...)."""
        i32 = [np.asarray(a).ravel().astype(np.int32) for a in extra_i32]
        i32 += [
            self._field(f).ravel().astype(np.int32) for f in _I32_FIELDS
        ]
        f32 = [
            self._field(f).ravel().astype(np.float32) for f in _F32_FIELDS
        ]
        return np.concatenate(i32), np.concatenate(f32)


def unpack_sinfo(
    i32: jax.Array, f32: jax.Array, off_i32: int, padded_bs: int, flags: tuple
) -> "SamplingBatchInfo":
    """Rebuild a device SamplingBatchInfo from the packed blobs (inside
    jit). `off_i32` skips the caller's extra_i32 prefix. Grammar masks are
    not packed — the packed-upload path excludes grammar batches."""
    b = padded_bs
    o = off_i32
    fields = {}
    for name in _I32_FIELDS:
        n = b * (
            MAX_BIAS_TOKENS
            if name == "bias_ids"
            else MAX_STOP_TOKENS
            if name == "block_ids"
            else 1
        )
        val = jax.lax.dynamic_slice(i32, (o,), (n,))
        if name == "bias_ids":
            val = val.reshape(b, MAX_BIAS_TOKENS)
        elif name == "block_ids":
            val = val.reshape(b, MAX_STOP_TOKENS)
        elif name == "fresh_mask":
            val = val.astype(bool)
        fields[name] = val
        o += n
    o = 0
    for name in _F32_FIELDS:
        n = b * (
            MAX_BIAS_TOKENS
            if name == "bias_vals"
            else MAX_STOP_TOKENS
            if name == "block_mask"
            else CUSTOM_PARAMS_DIM
            if name == "proc_params"
            else 1
        )
        val = jax.lax.dynamic_slice(f32, (o,), (n,))
        if name == "bias_vals":
            val = val.reshape(b, MAX_BIAS_TOKENS)
        elif name == "block_mask":
            val = val.reshape(b, MAX_STOP_TOKENS)
        elif name == "proc_params":
            val = val.reshape(b, CUSTOM_PARAMS_DIM)
        fields[name] = val
        o += n
    return SamplingBatchInfo(
        vocab_mask_packed=jnp.zeros((b, 1), dtype=jnp.uint8),
        is_all_greedy=flags[0],
        need_top_p=flags[1],
        need_min_p=flags[2],
        need_penalties=flags[3],
        need_bias=flags[4],
        need_grammar=False,
        need_custom=flags[6] if len(flags) > 6 else False,
        **fields,
    )
