"""LoRA adapter loading + batched multi-adapter application.

Parity with reference `srt/lora/lora_manager.py:53 LoRAManager` (adapter
memory pool, per-request adapter batching) and the bgmv/sgmv Triton
backends (`lora/backend/`). TPU design: adapters live stacked on device as
`A [L+1, in, R]`, `B [L+1, R, out]` (slot L = zero adapter for requests
without LoRA; ranks padded to the pool max), and application is the same
sort-by-group + `jax.lax.ragged_dot` dispatch as the MoE layer — exact,
static-shaped, MXU-native.

Weight naming follows PEFT checkpoints:
  base_model.model.model.layers.{i}.self_attn.q_proj.lora_A.weight [r, in]
  ... lora_B.weight [out, r]; scaling = lora_alpha / r.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

# fused-target composition: engine target -> HF sub-module names
TARGET_PARTS = {
    "qkv": ("q_proj", "k_proj", "v_proj"),
    "o": ("o_proj",),
    "gate_up": ("gate_proj", "up_proj"),
    "down": ("down_proj",),
}


def lora_apply(
    x: jax.Array,  # [T, in]
    a: jax.Array,  # [L+1, in, R]
    b: jax.Array,  # [L+1, R, out]
    lora_ids: jax.Array,  # [T] i32 in [0, L]; L = the zero adapter
) -> jax.Array:
    """Batched per-token LoRA delta via grouped matmuls."""
    t = x.shape[0]
    nl = a.shape[0]
    order = jnp.argsort(lora_ids)
    xs = x[order]
    group_sizes = jnp.bincount(lora_ids, length=nl)
    h = jax.lax.ragged_dot(
        xs, a, group_sizes, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    y = jax.lax.ragged_dot(
        h, b, group_sizes, preferred_element_type=jnp.float32
    )
    out = jnp.zeros((t, b.shape[2]), dtype=jnp.float32)
    out = out.at[order].set(y)
    return out.astype(x.dtype)


def lora_rows_apply(
    rows: jax.Array,  # [T, r] per-token A-side rows (already gathered)
    b: jax.Array,  # [L+1, r, out]
    lora_ids: jax.Array,  # [T] i32
) -> jax.Array:
    """Per-token rows x their slot's B (embedding LoRA: the A gather is
    just indexing the embedding-side A by token id)."""
    t = rows.shape[0]
    nl = b.shape[0]
    order = jnp.argsort(lora_ids)
    group_sizes = jnp.bincount(lora_ids, length=nl)
    y = jax.lax.ragged_dot(
        rows[order], b, group_sizes, preferred_element_type=jnp.float32
    )
    out = jnp.zeros((t, b.shape[2]), dtype=jnp.float32)
    out = out.at[order].set(y)
    return out.astype(rows.dtype)


class LoRAAdapter:
    def __init__(
        self, name: str, path: str, rank: int, scaling: float, weights,
        extras: Optional[dict] = None,
    ):
        self.name = name
        self.path = path
        self.rank = rank
        self.scaling = scaling
        # weights[layer][target] = (A [in, r], B [r, out]) numpy, scaling folded
        self.weights = weights
        # model-level targets (reference `srt/lora/` vocab-parallel
        # embedding + lm_head adapters): {"embed": (A [vocab, r],
        # B [r, hidden]), "lm_head": (A [hidden, r], B [r, vocab])}
        self.extras = extras or {}


def load_adapter(name: str, path: str) -> LoRAAdapter:
    """Read a PEFT LoRA checkpoint directory."""
    cfg_path = os.path.join(path, "adapter_config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    rank = cfg["r"]
    scaling = cfg.get("lora_alpha", rank) / rank
    from safetensors import safe_open

    st_path = os.path.join(path, "adapter_model.safetensors")
    tensors = {}
    with safe_open(st_path, framework="numpy") as f:
        for key in f.keys():
            tensors[key] = f.get_tensor(key)

    def find(layer: int, part: str, which: str) -> Optional[np.ndarray]:
        for pat in (
            f"base_model.model.model.layers.{layer}.self_attn.{part}.lora_{which}.weight",
            f"base_model.model.model.layers.{layer}.mlp.{part}.lora_{which}.weight",
            f"model.layers.{layer}.self_attn.{part}.lora_{which}.weight",
            f"model.layers.{layer}.mlp.{part}.lora_{which}.weight",
        ):
            if pat in tensors:
                return tensors[pat]
        return None

    n_layers = 0
    for key in tensors:
        for tok in key.split("."):
            if tok.isdigit():
                n_layers = max(n_layers, int(tok) + 1)
    # store RAW per-part (A [in,r], B [r,out]); fused into the engine's
    # merged-matmul layout at pool-build time (needs model geometry)
    weights: List[Dict[str, Tuple[np.ndarray, np.ndarray]]] = []
    for i in range(n_layers):
        per_layer = {}
        for target, parts in TARGET_PARTS.items():
            for part in parts:
                a = find(i, part, "A")
                bmat = find(i, part, "B")
                if a is None or bmat is None:
                    continue
                per_layer[part] = (
                    np.asarray(a, np.float32).T,  # [in, r]
                    np.asarray(bmat, np.float32).T,  # [r, out]
                )
        weights.append(per_layer)
    # model-level targets (PEFT embed/lm_head adapters)
    extras = {}
    for pre in ("base_model.model.model", "model", "base_model.model"):
        ea = tensors.get(f"{pre}.embed_tokens.lora_embedding_A")
        eb = tensors.get(f"{pre}.embed_tokens.lora_embedding_B")
        if ea is not None and eb is not None:
            # PEFT embedding layout: A [r, vocab], B [hidden, r];
            # delta_embed = (B @ A).T -> A.T [vocab, r] @ B.T [r, hidden]
            extras["embed"] = (
                np.asarray(ea, np.float32).T,
                np.asarray(eb, np.float32).T * scaling,
            )
            break
    for pre in ("base_model.model", "base_model.model.model", ""):
        la = tensors.get(f"{pre}.lm_head.lora_A.weight".lstrip("."))
        lb = tensors.get(f"{pre}.lm_head.lora_B.weight".lstrip("."))
        if la is not None and lb is not None:
            extras["lm_head"] = (
                np.asarray(la, np.float32).T,  # [hidden, r]
                np.asarray(lb, np.float32).T * scaling,  # [r, vocab]
            )
            break
    return LoRAAdapter(name, path, rank, scaling, weights, extras)


def fuse_target(adapter: LoRAAdapter, layer: int, target: str, part_dims):
    """Fuse an adapter's per-part A/B for one fused target into
    (A [in, sum_r], B [sum_r, total_out]) where B columns sit at each
    part's true offset inside the merged matmul output (absent parts
    contribute nothing)."""
    if layer >= len(adapter.weights):
        return None
    per_layer = adapter.weights[layer]
    parts = TARGET_PARTS[target]
    present = [
        (j, per_layer[p]) for j, p in enumerate(parts) if p in per_layer
    ]
    if not present:
        return None
    in_dim = present[0][1][0].shape[0]
    total_out = sum(part_dims)
    total_r = sum(ab[0].shape[1] for _, ab in present)
    a_f = np.zeros((in_dim, total_r), np.float32)
    b_f = np.zeros((total_r, total_out), np.float32)
    col_off = np.concatenate([[0], np.cumsum(part_dims)])
    ro = 0
    for j, (a, b) in present:
        r = a.shape[1]
        a_f[:, ro : ro + r] = a
        b_f[ro : ro + r, col_off[j] : col_off[j] + b.shape[1]] = (
            b * adapter.scaling
        )
        ro += r
    return a_f, b_f


class LoRAManager:
    """Adapter registry + stacked device pool (reference LoRAManager +
    `lora/mem_pool.py`)."""

    def __init__(
        self,
        model,
        max_loras: int = 4,
        max_rank: Optional[int] = None,
        uniform_layout: bool = False,
    ):
        self.model = model
        self.max_loras = max_loras
        self.adapters: Dict[str, int] = {}  # name -> slot
        self._loaded: List[Optional[LoRAAdapter]] = [None] * max_loras
        # lifecycle (reference lora/{eviction_policy,lora_registry}.py):
        # pin counts from in-flight requests gate eviction; a use counter
        # orders LRU victims among unpinned slots
        self._pins: List[int] = [0] * max_loras
        self._last_use: List[int] = [0] * max_loras
        self._use_clock = 0
        self.max_rank = max_rank or 0
        # uniform_layout (layer-scanned runners): every layer carries every
        # target at one pool-wide rank so the pool stacks to [L, ...]
        # arrays and rides the scan's xs
        self.uniform_layout = uniform_layout
        self.pool = None  # params["lora"]: [layer][target] = {"a": .., "b": ..}
        self.pool_extras = None  # params["lora_extra"]: embed/lm_head stacks

    @property
    def zero_slot(self) -> int:
        return self.max_loras

    def load(self, name: str, path: str) -> int:
        if name in self.adapters:
            return self.adapters[name]
        adapter = load_adapter(name, path)
        free = next(
            (i for i, a in enumerate(self._loaded) if a is None), None
        )
        if free is None:
            # LRU-evict an unpinned adapter (pinned = referenced by an
            # in-flight request; evicting it would silently swap the
            # adapter under the request's slot id)
            victims = [
                i
                for i in range(self.max_loras)
                if self._pins[i] == 0
            ]
            if not victims:
                raise RuntimeError(
                    f"adapter pool full ({self.max_loras}) and every slot "
                    "is pinned by in-flight requests; retry later"
                )
            free = min(victims, key=lambda i: self._last_use[i])
            old = self._loaded[free]
            self.adapters.pop(old.name, None)
            self._loaded[free] = None
            logger.info("evicted LRU LoRA %s from slot %d", old.name, free)
        self._loaded[free] = adapter
        self.adapters[name] = free
        self._rebuild_pool()
        logger.info("loaded LoRA %s (rank %d) into slot %d", name, adapter.rank, free)
        return free

    def unload(self, name: str) -> bool:
        slot = self.adapters.pop(name, None)
        if slot is None:
            return False
        self._loaded[slot] = None
        self._rebuild_pool()
        return True

    def slot_of(self, name: Optional[str]) -> int:
        if name is None:
            return self.zero_slot
        if name not in self.adapters:
            raise ValueError(f"unknown LoRA adapter {name}")
        slot = self.adapters[name]
        self._use_clock += 1
        self._last_use[slot] = self._use_clock
        return slot

    def acquire(self, name: Optional[str]) -> int:
        """slot_of + pin: called at request admission; `release(slot)` at
        request finish/abort. Pinned slots are never LRU-evicted."""
        slot = self.slot_of(name)
        if slot < self.max_loras:
            self._pins[slot] += 1
        return slot

    def release(self, slot: int) -> None:
        if 0 <= slot < self.max_loras and self._pins[slot] > 0:
            self._pins[slot] -= 1

    def _target_dims(self, target: str):
        m = self.model
        if target == "qkv":
            return (m.q_size, m.kv_size, m.kv_size)
        if target == "o":
            return (m.hidden_size,)
        if target == "gate_up":
            inter = m.config.intermediate_size
            return (inter, inter)
        if target == "down":
            return (m.hidden_size,)
        raise ValueError(target)

    def _rebuild_pool(self):
        """Stack all loaded adapters into [L+1, ...] device tensors (slot
        L+1 is all-zero: requests without LoRA route there)."""
        live = [a for a in self._loaded if a is not None]
        if not live:
            self.pool = None
            self.pool_extras = None
            return
        n_layers = max(len(a.weights) for a in live)
        uniform = self.uniform_layout
        if uniform:
            n_layers = self.model.num_layers
            uni_r = self.max_rank or max(a.rank for a in live)
        target_in_dims = {
            "qkv": self.model.hidden_size,
            "o": self.model.q_size,
            "gate_up": self.model.hidden_size,
            "down": self.model.config.intermediate_size,
        }
        pool = []
        for i in range(n_layers):
            per_layer = {}
            for target in TARGET_PARTS:
                part_dims = self._target_dims(target)
                fused = {
                    slot: fuse_target(a, i, target, part_dims)
                    for slot, a in enumerate(self._loaded)
                    if a is not None and i < len(a.weights)
                }
                fused = {s_: f for s_, f in fused.items() if f is not None}
                if not fused and not uniform:
                    continue
                out_dim = sum(part_dims)
                if fused:
                    in_dim = next(iter(fused.values()))[0].shape[0]
                    max_r = max(f[0].shape[1] for f in fused.values())
                else:
                    in_dim = target_in_dims[target]
                    max_r = 1
                if uniform:
                    max_r = max(max_r, uni_r)
                a_stack = np.zeros(
                    (self.max_loras + 1, in_dim, max_r), np.float32
                )
                b_stack = np.zeros(
                    (self.max_loras + 1, max_r, out_dim), np.float32
                )
                for slot, (a_w, b_w) in fused.items():
                    r = a_w.shape[1]
                    a_stack[slot, :, :r] = a_w
                    b_stack[slot, :r, :] = b_w
                per_layer[target] = {
                    "a": jnp.asarray(a_stack, self.model.config.dtype),
                    "b": jnp.asarray(b_stack, self.model.config.dtype),
                }
            pool.append(per_layer)
        if uniform:
            # stacked [L, ...] pool for the scanned forward
            pool = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *pool)
        self.pool = pool
        # model-level targets: stacked [L+1, ...] like the layer targets
        extras = {}
        dt = self.model.config.dtype
        for kind, (in_dim, out_dim) in (
            ("embed", (self.model.config.vocab_size, self.model.hidden_size)),
            ("lm_head", (self.model.hidden_size, self.model.config.vocab_size)),
        ):
            have = {
                slot: a.extras[kind]
                for slot, a in enumerate(self._loaded)
                if a is not None and kind in a.extras
            }
            if not have:
                continue
            max_r = max(ab[0].shape[1] for ab in have.values())
            a_stack = np.zeros((self.max_loras + 1, in_dim, max_r), np.float32)
            b_stack = np.zeros((self.max_loras + 1, max_r, out_dim), np.float32)
            for slot, (a_w, b_w) in have.items():
                r = a_w.shape[1]
                a_stack[slot, :, :r] = a_w
                b_stack[slot, :r, :] = b_w
            extras[kind] = {
                "a": jnp.asarray(a_stack, dt),
                "b": jnp.asarray(b_stack, dt),
            }
        self.pool_extras = extras or None
