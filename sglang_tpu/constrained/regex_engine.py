"""Regex subset -> NFA -> DFA compiler (interval-labelled transitions).

Native replacement for the reference's xgrammar/outlines regex path
(`constrained/outlines_backend.py`): the DFA drives token-level vocab masks
(`token_fsm.py`). Supported syntax: literals, `.`, escapes (\\d \\w \\s \\D
\\W \\S, \\n \\t \\r, punctuation escapes, \\uXXXX \\xXX), classes
`[a-z^-]`, groups `(...)` (non-capturing `(?:...)`), alternation `|`,
quantifiers `* + ? {m} {m,} {m,n}`, anchors are implicit (full match).
"""

from __future__ import annotations

from typing import Dict, FrozenSet, List, Optional, Set, Tuple

MAX_CP = 0x10FFFF

# An interval set is a sorted tuple of (lo, hi) inclusive codepoint ranges.
Intervals = Tuple[Tuple[int, int], ...]

DIGIT: Intervals = ((48, 57),)
WORD: Intervals = ((48, 57), (65, 90), (95, 95), (97, 122))
SPACE: Intervals = ((9, 13), (32, 32))
DOT: Intervals = ((0, 9), (11, MAX_CP))  # any except \n


def _negate(iv: Intervals) -> Intervals:
    out = []
    prev = 0
    for lo, hi in iv:
        if lo > prev:
            out.append((prev, lo - 1))
        prev = hi + 1
    if prev <= MAX_CP:
        out.append((prev, MAX_CP))
    return tuple(out)


def _normalize(ranges: List[Tuple[int, int]]) -> Intervals:
    if not ranges:
        return ()
    ranges.sort()
    out = [list(ranges[0])]
    for lo, hi in ranges[1:]:
        if lo <= out[-1][1] + 1:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])
    return tuple((a, b) for a, b in out)


# ----------------------------------------------------------------- parsing

class _Parser:
    """Recursive-descent regex parser producing an AST."""

    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0

    def peek(self) -> Optional[str]:
        return self.p[self.i] if self.i < len(self.p) else None

    def next(self) -> str:
        c = self.p[self.i]
        self.i += 1
        return c

    def parse(self):
        node = self.alternation()
        if self.i != len(self.p):
            raise ValueError(f"unexpected '{self.peek()}' at {self.i}")
        return node

    def alternation(self):
        branches = [self.concat()]
        while self.peek() == "|":
            self.next()
            branches.append(self.concat())
        return ("alt", branches) if len(branches) > 1 else branches[0]

    def concat(self):
        parts = []
        while self.peek() is not None and self.peek() not in "|)":
            parts.append(self.repeat())
        if not parts:
            return ("empty",)
        return ("cat", parts) if len(parts) > 1 else parts[0]

    def repeat(self):
        atom = self.atom()
        while True:
            c = self.peek()
            if c == "*":
                self.next()
                atom = ("star", atom)
            elif c == "+":
                self.next()
                atom = ("plus", atom)
            elif c == "?":
                self.next()
                atom = ("opt", atom)
            elif c == "{":
                save = self.i
                self.next()
                spec = ""
                while self.peek() is not None and self.peek() != "}":
                    spec += self.next()
                if self.peek() != "}":
                    self.i = save
                    break
                self.next()
                atom = self._bounded(atom, spec)
            else:
                break
            # lazy quantifier suffix (semantics identical for full-match DFA)
            if self.peek() == "?":
                self.next()
        return atom

    def _bounded(self, atom, spec: str):
        if "," in spec:
            lo_s, hi_s = spec.split(",", 1)
            lo = int(lo_s) if lo_s else 0
            hi = int(hi_s) if hi_s.strip() else None
        else:
            lo = hi = int(spec)
        if hi is not None and hi < lo:
            raise ValueError(f"bad repeat {{{spec}}}")
        parts = [atom] * lo
        if hi is None:
            parts.append(("star", atom))
        else:
            parts += [("opt", atom)] * (hi - lo)
        if not parts:
            return ("empty",)
        return ("cat", parts) if len(parts) > 1 else parts[0]

    def atom(self):
        c = self.peek()
        if c == "(":
            self.next()
            if self.peek() == "?":
                self.next()
                k = self.next()
                if k != ":":
                    raise ValueError(f"unsupported group (?{k}")
            node = self.alternation()
            if self.peek() != ")":
                raise ValueError("unbalanced (")
            self.next()
            return node
        if c == "[":
            return ("cls", self.char_class())
        if c == ".":
            self.next()
            return ("cls", DOT)
        if c == "\\":
            self.next()
            return ("cls", self.escape())
        if c in "*+?{":
            raise ValueError(f"dangling quantifier at {self.i}")
        self.next()
        return ("cls", ((ord(c), ord(c)),))

    def escape(self) -> Intervals:
        e = self.next()
        table = {
            "d": DIGIT,
            "D": _negate(DIGIT),
            "w": WORD,
            "W": _negate(WORD),
            "s": SPACE,
            "S": _negate(SPACE),
            "n": ((10, 10),),
            "t": ((9, 9),),
            "r": ((13, 13),),
            "f": ((12, 12),),
            "v": ((11, 11),),
            "0": ((0, 0),),
        }
        if e in table:
            return table[e]
        if e == "x":
            h = self.next() + self.next()
            cp = int(h, 16)
            return ((cp, cp),)
        if e == "u":
            h = "".join(self.next() for _ in range(4))
            cp = int(h, 16)
            return ((cp, cp),)
        return ((ord(e), ord(e)),)

    def char_class(self) -> Intervals:
        assert self.next() == "["
        negate = False
        if self.peek() == "^":
            self.next()
            negate = True
        ranges: List[Tuple[int, int]] = []
        first = True
        while True:
            c = self.peek()
            if c is None:
                raise ValueError("unbalanced [")
            if c == "]" and not first:
                self.next()
                break
            first = False
            if c == "\\":
                self.next()
                iv = self.escape()
                if len(iv) == 1 and iv[0][0] == iv[0][1]:
                    start = iv[0][0]
                else:
                    ranges.extend(iv)
                    continue
            else:
                start = ord(self.next())
            if self.peek() == "-" and self.i + 1 < len(self.p) and self.p[self.i + 1] != "]":
                self.next()
                if self.peek() == "\\":
                    self.next()
                    end_iv = self.escape()
                    end = end_iv[0][0]
                else:
                    end = ord(self.next())
                ranges.append((min(start, end), max(start, end)))
            else:
                ranges.append((start, start))
        iv = _normalize(ranges)
        return _negate(iv) if negate else iv


# --------------------------------------------------------------------- NFA

class NFA:
    def __init__(self):
        self.transitions: List[List[Tuple[Intervals, int]]] = []
        self.epsilons: List[List[int]] = []

    def new_state(self) -> int:
        self.transitions.append([])
        self.epsilons.append([])
        return len(self.transitions) - 1

    def add(self, s: int, iv: Intervals, t: int):
        self.transitions[s].append((iv, t))

    def eps(self, s: int, t: int):
        self.epsilons[s].append(t)


def _build_nfa(node, nfa: NFA) -> Tuple[int, int]:
    kind = node[0]
    if kind == "empty":
        s = nfa.new_state()
        t = nfa.new_state()
        nfa.eps(s, t)
        return s, t
    if kind == "cls":
        s = nfa.new_state()
        t = nfa.new_state()
        nfa.add(s, node[1], t)
        return s, t
    if kind == "cat":
        first_s, prev_t = _build_nfa(node[1][0], nfa)
        for child in node[1][1:]:
            cs, ct = _build_nfa(child, nfa)
            nfa.eps(prev_t, cs)
            prev_t = ct
        return first_s, prev_t
    if kind == "alt":
        s = nfa.new_state()
        t = nfa.new_state()
        for child in node[1]:
            cs, ct = _build_nfa(child, nfa)
            nfa.eps(s, cs)
            nfa.eps(ct, t)
        return s, t
    if kind == "star":
        s = nfa.new_state()
        t = nfa.new_state()
        cs, ct = _build_nfa(node[1], nfa)
        nfa.eps(s, cs)
        nfa.eps(s, t)
        nfa.eps(ct, cs)
        nfa.eps(ct, t)
        return s, t
    if kind == "plus":
        cs, ct = _build_nfa(node[1], nfa)
        t = nfa.new_state()
        nfa.eps(ct, cs)
        nfa.eps(ct, t)
        return cs, t
    if kind == "opt":
        s = nfa.new_state()
        t = nfa.new_state()
        cs, ct = _build_nfa(node[1], nfa)
        nfa.eps(s, cs)
        nfa.eps(s, t)
        nfa.eps(ct, t)
        return s, t
    raise ValueError(kind)


# --------------------------------------------------------------------- DFA

class DFA:
    """Deterministic automaton with interval-labelled transitions.

    state 0 is the start. `transitions[s]` is a list of ((lo, hi), target)
    sorted by lo. `accepting` is a boolean per state.
    """

    def __init__(
        self,
        transitions: List[List[Tuple[Tuple[int, int], int]]],
        accepting: List[bool],
    ):
        self.transitions = transitions
        self.accepting = accepting

    @property
    def num_states(self) -> int:
        return len(self.transitions)

    def step(self, state: int, cp: int) -> int:
        """Next state for codepoint `cp`, or -1 (dead)."""
        import bisect

        row = self.transitions[state]
        idx = bisect.bisect_right(row, (( cp, MAX_CP + 1), 1 << 30)) - 1
        if idx >= 0:
            (lo, hi), tgt = row[idx]
            if lo <= cp <= hi:
                return tgt
        return -1

    def step_string(self, state: int, s: str) -> int:
        for ch in s:
            state = self.step(state, ord(ch))
            if state < 0:
                return -1
        return state


def compile_regex(pattern: str) -> DFA:
    return compile_ast(_Parser(pattern).parse())


def compile_ast(ast, max_nfa_states: int = 200_000) -> DFA:
    """Compile a regex AST (the node tuples produced by `_Parser` — also
    emitted by the EBNF front-end in `ebnf.py`) down to a DFA."""
    nfa = NFA()
    start, accept = _build_nfa(ast, nfa)
    if len(nfa.transitions) > max_nfa_states:
        raise ValueError(
            f"grammar too large ({len(nfa.transitions)} NFA states); "
            "simplify it or lower the recursion depth"
        )

    def eclose(states: FrozenSet[int]) -> FrozenSet[int]:
        stack = list(states)
        seen = set(states)
        while stack:
            s = stack.pop()
            for t in nfa.epsilons[s]:
                if t not in seen:
                    seen.add(t)
                    stack.append(t)
        return frozenset(seen)

    start_set = eclose(frozenset([start]))
    dfa_states: Dict[FrozenSet[int], int] = {start_set: 0}
    transitions: List[List[Tuple[Tuple[int, int], int]]] = [[]]
    accepting: List[bool] = [accept in start_set]
    work = [start_set]
    while work:
        cur = work.pop()
        cur_id = dfa_states[cur]
        # split the codepoint space at all interval boundaries
        bounds: Set[int] = set()
        moves: List[Tuple[int, int, int]] = []  # (lo, hi, nfa_target)
        for s in cur:
            for iv, t in nfa.transitions[s]:
                for lo, hi in iv:
                    bounds.add(lo)
                    bounds.add(hi + 1)
                    moves.append((lo, hi, t))
        pts = sorted(bounds)
        for a, b in zip(pts, pts[1:]):
            tgt = frozenset(t for lo, hi, t in moves if lo <= a and b - 1 <= hi)
            if not tgt:
                continue
            tgt = eclose(tgt)
            if tgt not in dfa_states:
                dfa_states[tgt] = len(transitions)
                transitions.append([])
                accepting.append(accept in tgt)
                work.append(tgt)
            transitions[cur_id].append(((a, b - 1), dfa_states[tgt]))
        transitions[cur_id].sort()
        # merge adjacent ranges to the same target
        merged = []
        for (lo, hi), t in transitions[cur_id]:
            if merged and merged[-1][1] == t and merged[-1][0][1] + 1 == lo:
                merged[-1] = ((merged[-1][0][0], hi), t)
            else:
                merged.append(((lo, hi), t))
        transitions[cur_id] = [(iv, t) for iv, t in merged]
    return DFA(transitions, accepting)
