"""EBNF (GBNF-dialect) grammar front-end for the native constrained
decoder.

Parity with the reference's EBNF support (xgrammar `Grammar.from_ebnf`,
routed via `constrained/xgrammar_backend.py` and the `ebnf` sampling
param). The dialect is the common llama.cpp/xgrammar "GBNF" surface:

    root      ::= "yes" | "no" | answer
    answer    ::= [a-z]+ (" " [a-z]+)*
    # comments run to end of line

Rules: `name ::= expr`. Expressions: alternation `|`, sequencing by
juxtaposition, grouping `(...)`, quantifiers `* + ? {m} {m,} {m,n}`,
terminal strings `"..."` (escapes \\n \\t \\r \\\\ \\" \\xHH \\uHHHH),
character classes `[a-z0-9^-]` (with `^` negation and escapes), and rule
references. The start symbol is `root`.

Compilation strategy — TPU-native means *precomputed, static* vocab
masks, so the grammar is lowered onto the same interval-NFA/DFA engine as
regexes (`regex_engine.py`) rather than interpreted by a pushdown
automaton at decode time: rule references are inlined. Non-recursive
grammars compile exactly. Recursive rules are expanded to a bounded
nesting depth (`max_depth`, default 10) — a standard regular
approximation that is strictly conservative: every emitted string is in
the grammar; strings nested deeper than the bound are unreachable. The
expansion is memoized per (rule, remaining-depth) so shared sub-grammars
stay shared in the AST.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from sglang_tpu.constrained.regex_engine import (
    DFA,
    Intervals,
    _negate,
    _normalize,
    compile_ast,
)

DEAD = ("dead",)  # matches nothing; pruned during expansion


# ----------------------------------------------------------------- parsing


class _EbnfParser:
    """GBNF text -> {rule_name: AST with ("ref", name) leaves}."""

    def __init__(self, text: str):
        self.p = text
        self.i = 0

    # -- lexing helpers

    def _skip_ws(self, newlines: bool) -> None:
        while self.i < len(self.p):
            c = self.p[self.i]
            if c == "#":  # comment to end of line
                while self.i < len(self.p) and self.p[self.i] != "\n":
                    self.i += 1
            elif c in " \t\r" or (newlines and c == "\n"):
                self.i += 1
            elif c == "\\" and self.i + 1 < len(self.p) and self.p[self.i + 1] == "\n":
                self.i += 2  # line continuation
            else:
                return

    def peek(self) -> Optional[str]:
        return self.p[self.i] if self.i < len(self.p) else None

    def _ident(self) -> str:
        j = self.i
        while self.i < len(self.p) and (
            self.p[self.i].isalnum() or self.p[self.i] in "_-"
        ):
            self.i += 1
        if self.i == j:
            raise ValueError(f"expected rule name at offset {self.i}")
        return self.p[j : self.i]

    # -- grammar of the grammar

    def parse(self) -> Dict[str, tuple]:
        rules: Dict[str, tuple] = {}
        while True:
            self._skip_ws(newlines=True)
            if self.i >= len(self.p):
                break
            name = self._ident()
            self._skip_ws(newlines=True)
            if self.p[self.i : self.i + 3] != "::=":
                raise ValueError(f"expected '::=' after rule '{name}'")
            self.i += 3
            body = self._alternation()
            if name in rules:  # later definitions extend (GBNF habit)
                prev = rules[name]
                branches = list(prev[1]) if prev[0] == "alt" else [prev]
                branches.append(body)
                rules[name] = ("alt", branches)
            else:
                rules[name] = body
        if "root" not in rules:
            raise ValueError("EBNF grammar must define a 'root' rule")
        return rules

    def _at_rule_start(self) -> bool:
        """True if the cursor sits at `name ::=` (ends the current body)."""
        j = self.i
        while j < len(self.p) and (self.p[j].isalnum() or self.p[j] in "_-"):
            j += 1
        if j == self.i:
            return False
        while j < len(self.p) and self.p[j] in " \t":
            j += 1
        return self.p[j : j + 3] == "::="

    def _alternation(self) -> tuple:
        branches = [self._sequence()]
        while True:
            self._skip_ws(newlines=True)
            if self.peek() == "|":
                self.i += 1
                branches.append(self._sequence())
            else:
                break
        return ("alt", branches) if len(branches) > 1 else branches[0]

    def _sequence(self) -> tuple:
        parts: List[tuple] = []
        while True:
            # newlines end a rule body unless the next line starts with `|`
            self._skip_ws(newlines=False)
            c = self.peek()
            if c == "\n":
                j = self.i
                self._skip_ws(newlines=True)
                if self.peek() == "|" or self.i >= len(self.p) or self._at_rule_start():
                    self.i = j
                    break
                continue
            if c is None or c in "|)":
                break
            if self._at_rule_start():
                break
            parts.append(self._repeat())
        if not parts:
            return ("empty",)
        return ("cat", parts) if len(parts) > 1 else parts[0]

    def _repeat(self) -> tuple:
        atom = self._atom()
        while True:
            self._skip_ws(newlines=False)
            c = self.peek()
            if c == "*":
                self.i += 1
                atom = ("star", atom)
            elif c == "+":
                self.i += 1
                atom = ("plus", atom)
            elif c == "?":
                self.i += 1
                atom = ("opt", atom)
            elif c == "{":
                j = self.p.find("}", self.i)
                if j < 0:
                    raise ValueError("unbalanced { in quantifier")
                spec = self.p[self.i + 1 : j]
                self.i = j + 1
                atom = _bounded(atom, spec)
            else:
                return atom

    def _atom(self) -> tuple:
        c = self.peek()
        if c == "(":
            self.i += 1
            node = self._alternation()
            self._skip_ws(newlines=True)
            if self.peek() != ")":
                raise ValueError("unbalanced ( in grammar")
            self.i += 1
            return node
        if c == '"':
            return self._terminal()
        if c == "[":
            return ("cls", self._char_class())
        name = self._ident()
        return ("ref", name)

    def _escape(self) -> int:
        e = self.p[self.i]
        self.i += 1
        simple = {"n": 10, "t": 9, "r": 13, "\\": 92, '"': 34, "'": 39,
                  "]": 93, "[": 91, "^": 94, "-": 45, "0": 0, "f": 12, "v": 11}
        if e in simple:
            return simple[e]
        if e == "x":
            cp = int(self.p[self.i : self.i + 2], 16)
            self.i += 2
            return cp
        if e == "u":
            cp = int(self.p[self.i : self.i + 4], 16)
            self.i += 4
            return cp
        if e == "U":
            cp = int(self.p[self.i : self.i + 8], 16)
            self.i += 8
            return cp
        return ord(e)

    def _terminal(self) -> tuple:
        assert self.p[self.i] == '"'
        self.i += 1
        parts: List[tuple] = []
        while True:
            if self.i >= len(self.p):
                raise ValueError('unterminated " terminal')
            c = self.p[self.i]
            if c == '"':
                self.i += 1
                break
            self.i += 1
            cp = self._escape() if c == "\\" else ord(c)
            parts.append(("cls", ((cp, cp),)))
        if not parts:
            return ("empty",)
        return ("cat", parts) if len(parts) > 1 else parts[0]

    def _char_class(self) -> Intervals:
        assert self.p[self.i] == "["
        self.i += 1
        negate = False
        if self.peek() == "^":
            self.i += 1
            negate = True
        ranges: List[Tuple[int, int]] = []
        first = True
        while True:
            c = self.peek()
            if c is None:
                raise ValueError("unbalanced [ in grammar")
            if c == "]" and not first:
                self.i += 1
                break
            first = False
            self.i += 1
            start = self._escape() if c == "\\" else ord(c)
            if (
                self.peek() == "-"
                and self.i + 1 < len(self.p)
                and self.p[self.i + 1] != "]"
            ):
                self.i += 1
                c2 = self.p[self.i]
                self.i += 1
                end = self._escape() if c2 == "\\" else ord(c2)
                ranges.append((min(start, end), max(start, end)))
            else:
                ranges.append((start, start))
        iv = _normalize(ranges)
        return _negate(iv) if negate else iv


def _bounded(atom: tuple, spec: str) -> tuple:
    if "," in spec:
        lo_s, hi_s = spec.split(",", 1)
        lo = int(lo_s) if lo_s.strip() else 0
        hi = int(hi_s) if hi_s.strip() else None
    else:
        lo = hi = int(spec)
    parts = [atom] * lo
    if hi is None:
        parts.append(("star", atom))
    else:
        if hi < lo:
            raise ValueError(f"bad repeat {{{spec}}}")
        parts += [("opt", atom)] * (hi - lo)
    if not parts:
        return ("empty",)
    return ("cat", parts) if len(parts) > 1 else parts[0]


# -------------------------------------------------------------- expansion


def _expand(node: tuple, rules: Dict[str, tuple], depth: int,
            memo: Dict[Tuple[str, int], tuple]) -> tuple:
    """Inline ("ref", name) nodes; a reference at depth 0 becomes DEAD and
    is pruned, yielding the depth-bounded regular approximation."""
    kind = node[0]
    if kind == "ref":
        name = node[1]
        if name not in rules:
            raise ValueError(f"undefined rule '{name}'")
        if depth <= 0:
            return DEAD
        key = (name, depth)
        got = memo.get(key)
        if got is None:
            memo[key] = DEAD  # cycle guard while expanding
            got = memo[key] = _expand(rules[name], rules, depth - 1, memo)
        return got
    if kind in ("cls", "empty", "dead"):
        return node
    if kind == "cat":
        parts = [_expand(c, rules, depth, memo) for c in node[1]]
        if any(p[0] == "dead" for p in parts):
            return DEAD
        parts = [p for p in parts if p[0] != "empty"]
        if not parts:
            return ("empty",)
        return ("cat", parts) if len(parts) > 1 else parts[0]
    if kind == "alt":
        parts = [_expand(c, rules, depth, memo) for c in node[1]]
        parts = [p for p in parts if p[0] != "dead"]
        if not parts:
            return DEAD
        return ("alt", parts) if len(parts) > 1 else parts[0]
    if kind in ("star", "plus", "opt"):
        inner = _expand(node[1], rules, depth, memo)
        if inner[0] == "dead":
            return DEAD if kind == "plus" else ("empty",)
        if inner[0] == "empty":
            return ("empty",)
        return (kind, inner)
    raise ValueError(f"bad grammar node {kind}")


def ebnf_to_ast(text: str, max_depth: int = 10) -> tuple:
    """Parse GBNF text and return a regex-engine AST for the root rule."""
    rules = _EbnfParser(text).parse()
    ast = _expand(("ref", "root"), rules, max_depth + 1, {})
    if ast[0] == "dead":
        raise ValueError(
            f"grammar matches nothing within recursion depth {max_depth}"
        )
    return ast


def compile_ebnf(text: str, max_depth: int = 10) -> DFA:
    return compile_ast(ebnf_to_ast(text, max_depth))
