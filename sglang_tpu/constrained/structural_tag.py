"""Structural-tag grammars: free text with hard-triggered constrained
regions.

Parity with reference structural tags (xgrammar `structural_tag` via
`sampling_params.structural_tag`): the model generates freely until it
emits a structure's `begin` literal, at which point output is constrained
to that structure's JSON schema followed by its `end` literal, then free
text resumes (repeatable). Spec format:

    {"type": "structural_tag",
     "structures": [{"begin": "<function=get_weather>",
                     "schema": {...json schema...},
                     "end": "</function>"}],
     "triggers": ["<function="]}

This is not expressible as a plain regex (a `.*` around the tag would let
the subset construction keep the free-text interpretation alive and the
mask would never tighten), so the DFA is built directly as a product:

- FREE states: a multi-pattern KMP automaton over the `begin` literals —
  tracks progress toward any begin; every FREE state accepts (EOS is
  always allowed in free text, including mid-prefix). Completing a begin
  jumps into that structure's region.
- REGION states: the DFA of (schema-regex + end-literal), compiled by the
  native engine; non-accepting (once triggered, the structure must be
  completed). Its accept states merge back into FREE root.
"""

from __future__ import annotations

import json
from typing import Dict, List, Tuple

from sglang_tpu.constrained.json_schema import schema_to_regex
from sglang_tpu.constrained.regex_engine import (
    DFA,
    MAX_CP,
    _Parser,
    compile_ast,
)


def _literal_ast(s: str):
    parts = [("cls", ((ord(c), ord(c)),)) for c in s]
    if not parts:
        return ("empty",)
    return ("cat", parts) if len(parts) > 1 else parts[0]


def _kmp_states(patterns: List[str]) -> Tuple[List[str], Dict[Tuple[int, str], int], Dict[int, int]]:
    """Multi-pattern prefix automaton. States are the distinct prefixes of
    the patterns ('' = root). Returns (states, delta over pattern chars,
    completions: state -> pattern index completed there)."""
    prefixes = {""}
    for p in patterns:
        for i in range(1, len(p) + 1):
            prefixes.add(p[:i])
    states = sorted(prefixes, key=lambda s: (len(s), s))
    sid = {s: i for i, s in enumerate(states)}
    chars = sorted({c for p in patterns for c in p})
    delta: Dict[Tuple[int, str], int] = {}
    for s in states:
        for c in chars:
            t = s + c
            # longest suffix of t that is a prefix of some pattern
            while t and t not in prefixes:
                t = t[1:]
            delta[(sid[s], c)] = sid[t]
    completions: Dict[int, int] = {}
    for i, p in enumerate(patterns):
        if p:
            completions.setdefault(sid[p], i)
    return states, delta, completions


def compile_structural_tag(spec: str) -> DFA:
    obj = json.loads(spec)
    structures = obj.get("structures", [])
    if not structures:
        raise ValueError("structural_tag needs at least one structure")
    begins = [s["begin"] for s in structures]
    for b in begins:
        if not b:
            raise ValueError("structural_tag begin must be non-empty")

    # region DFAs: schema regex + end literal
    regions: List[DFA] = []
    for s in structures:
        schema = s.get("schema")
        schema_ast = (
            _Parser(schema_to_regex(json.dumps(schema))).parse()
            if schema is not None
            else ("empty",)
        )
        ast = ("cat", [schema_ast, _literal_ast(s.get("end", ""))])
        regions.append(compile_ast(ast))

    states, delta, completions = _kmp_states(begins)
    n_free = len(states)
    offsets = []
    total = n_free
    for r in regions:
        offsets.append(total)
        total += r.num_states

    transitions: List[List[Tuple[Tuple[int, int], int]]] = [[] for _ in range(total)]
    accepting = [False] * total

    def _region_target(ri: int, local: int) -> int:
        # a region's accept state behaves as FREE root (structure done)
        if regions[ri].accepting[local]:
            return 0
        return offsets[ri] + local

    # FREE states: pattern chars via KMP; everything else back to root.
    # Completing begin_i lands at region i's start (or straight back to
    # root if the whole region is empty / immediately accepting).
    pat_chars = sorted({c for b in begins for c in b})
    for s_i in range(n_free):
        row: List[Tuple[Tuple[int, int], int]] = []
        prev = 0
        for c in pat_chars:
            cp = ord(c)
            nxt = delta[(s_i, c)]
            if nxt in completions:
                tgt = _region_target(completions[nxt], 0)
            else:
                tgt = nxt
            if cp > prev:
                row.append(((prev, cp - 1), 0))
            row.append(((cp, cp), tgt))
            prev = cp + 1
        if prev <= MAX_CP:
            row.append(((prev, MAX_CP), 0))
        transitions[s_i] = row
        accepting[s_i] = True  # EOS allowed anywhere in free text

    for ri, r in enumerate(regions):
        off = offsets[ri]
        for local in range(r.num_states):
            transitions[off + local] = [
                (iv, _region_target(ri, t)) for iv, t in r.transitions[local]
            ]
            accepting[off + local] = False
    # region state 0 might itself be accepting (empty schema+end):
    # _region_target already redirected entries; its own row is unused then.
    return DFA(transitions, accepting)
