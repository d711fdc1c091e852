"""Constrained decoding (reference `srt/constrained/`, SURVEY §2 G).

The reference delegates to external compilers (xgrammar/outlines/
llguidance); none ship in this image, so the `native` backend implements
the full pipeline in-tree: regex subset -> NFA -> DFA (interval-labelled),
JSON-schema -> regex, DFA x token-vocabulary -> per-state vocab masks with
lazy caching, applied to logits on device as a packed bitmask.
"""

from sglang_tpu.constrained.grammar_backend import (
    GrammarBackend,
    NativeGrammar,
    create_grammar_backend,
)

__all__ = ["GrammarBackend", "NativeGrammar", "create_grammar_backend"]
