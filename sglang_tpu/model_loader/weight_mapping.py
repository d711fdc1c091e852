"""Declarative HF-checkpoint -> params-pytree weight mapping.

Role parity with the reference's per-model `load_weights` methods (e.g.
`models/llama.py` stacked_params_mapping) — but declarative: each model
returns a list of `WeightRule`s and the loader executes them, so quantization
/ sharding / dummy-init are handled uniformly in one place.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

# How the HF tensor(s) are turned into the target leaf dict / array:
#   "linear"      : sources are HF [out, in] weights -> transpose each to
#                   [in, out], concat on the out axis, then quantize with the
#                   layer's LinearMethod.
#   "linear_bias" : sources are HF [out] biases -> concat -> the "b" entry.
#   "embed"       : single [vocab, hidden] table, kept as-is.
#   "lm_head"     : HF [vocab, hidden] -> transpose to [hidden, vocab].
#   "norm"        : single [hidden] vector.
#   "raw"         : single tensor stored untransformed.
#   "router"      : MoE gate [E, hidden] -> [hidden, E] f32.
#   "moe_w1"      : per-expert (gate, up) pairs -> stacked [E, hidden, 2M].
#   "moe_w2"      : per-expert down projections -> stacked [E, M, hidden].
#   "linear_nt"   : like "linear" but the sources are already [in, out]
#                   (GPT-2 Conv1D convention) — no transpose.
KINDS = (
    "linear",
    "linear_bias",
    "embed",
    "lm_head",
    "norm",
    "raw",
    "router",
    "moe_w1",
    "moe_w2",
    "linear_raw",
    "linear_nt",
)


@dataclass
class WeightRule:
    target: Tuple  # path into the params pytree, e.g. ("layers", 3, "qkv")
    sources: List[str]  # HF safetensors tensor names, concat order
    kind: str = "linear"
    method_key: Optional[str] = None  # linear-method registry key (see model)
    # optional layout fix applied AFTER transpose/concat, BEFORE quantize —
    # e.g. de-interleaving GPT-NeoX/Falcon/Persimmon fused per-head QKV
    # into the engine's [q | k | v] column blocks
    transform: Optional[callable] = None

    def __post_init__(self):
        assert self.kind in KINDS, self.kind


def set_in_tree(tree: dict, path: Sequence, value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {}) if isinstance(node, dict) else node[p]
    node[path[-1]] = value


def get_in_tree(tree, path: Sequence):
    node = tree
    for p in path:
        node = node[p]
    return node
