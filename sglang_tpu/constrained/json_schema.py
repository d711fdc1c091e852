"""JSON schema -> regex translation.

Native replacement for the reference's xgrammar JSON-schema compiler
(`constrained/xgrammar_backend.py:61` dispatch); same approach as the
public outlines `build_regex_from_schema`. Supports: object (properties /
required / additionalProperties=false), array (items, min/maxItems),
string (enum, pattern, min/maxLength), number, integer, boolean, null,
enum/const of scalars, anyOf/oneOf, $ref to #/$defs and #/definitions,
nested combinations.
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict

WS = r"[ \n\t]{0,8}"  # bounded whitespace (keeps the DFA small)

STRING_INNER = r'(?:[^"\\\x00-\x1f]|\\["\\/bfnrt]|\\u[0-9a-fA-F]{4})'
STRING = f'"{STRING_INNER}*"'
INTEGER = r"-?(?:0|[1-9][0-9]*)"
NUMBER = r"-?(?:0|[1-9][0-9]*)(?:\.[0-9]+)?(?:[eE][-+]?[0-9]+)?"
BOOLEAN = r"(?:true|false)"
NULL = r"null"


def _escape_literal(s: str) -> str:
    return re.escape(s)


class SchemaCompiler:
    def __init__(self, root: Dict[str, Any], max_depth: int = 8):
        self.root = root
        self.max_depth = max_depth

    def _resolve_ref(self, ref: str) -> Dict[str, Any]:
        if not ref.startswith("#/"):
            raise ValueError(f"unsupported $ref {ref}")
        node: Any = self.root
        for part in ref[2:].split("/"):
            node = node[part]
        return node

    def regex(self, schema: Any, depth: int = 0) -> str:
        if depth > self.max_depth:
            # depth cap: degrade to a generic scalar (prevents DFA blowup on
            # recursive schemas; xgrammar uses a pushdown automaton instead)
            return f"(?:{STRING}|{NUMBER}|{BOOLEAN}|{NULL})"
        if schema is True or schema == {}:
            return self._any_value(depth)
        if "$ref" in schema:
            return self.regex(self._resolve_ref(schema["$ref"]), depth + 1)
        if "const" in schema:
            return _escape_literal(json.dumps(schema["const"]))
        if "enum" in schema:
            opts = "|".join(_escape_literal(json.dumps(v)) for v in schema["enum"])
            return f"(?:{opts})"
        for comb in ("anyOf", "oneOf"):
            if comb in schema:
                opts = "|".join(self.regex(s, depth + 1) for s in schema[comb])
                return f"(?:{opts})"
        if "allOf" in schema and len(schema["allOf"]) == 1:
            return self.regex(schema["allOf"][0], depth)
        t = schema.get("type")
        if isinstance(t, list):
            opts = "|".join(
                self.regex({**schema, "type": one}, depth) for one in t
            )
            return f"(?:{opts})"
        if t == "object" or (t is None and "properties" in schema):
            return self._object(schema, depth)
        if t == "array":
            return self._array(schema, depth)
        if t == "string":
            return self._string(schema)
        if t == "integer":
            return INTEGER
        if t == "number":
            return NUMBER
        if t == "boolean":
            return BOOLEAN
        if t == "null":
            return NULL
        return self._any_value(depth)

    def _any_value(self, depth: int) -> str:
        if depth >= self.max_depth:
            return f"(?:{STRING}|{NUMBER}|{BOOLEAN}|{NULL})"
        inner = self._any_value(depth + 2)
        arr = f"\\[{WS}(?:{inner}(?:{WS},{WS}{inner}){{0,6}})?{WS}\\]"
        obj = f"\\{{{WS}(?:{STRING}{WS}:{WS}{inner}(?:{WS},{WS}{STRING}{WS}:{WS}{inner}){{0,6}})?{WS}\\}}"
        return f"(?:{STRING}|{NUMBER}|{BOOLEAN}|{NULL}|{arr}|{obj})"

    def _string(self, schema: Dict[str, Any]) -> str:
        if "pattern" in schema:
            pat = schema["pattern"]
            # user patterns describe the *content*; strip anchors
            pat = pat.lstrip("^").rstrip("$")
            return f'"{pat}"'
        lo = schema.get("minLength")
        hi = schema.get("maxLength")
        if lo is not None or hi is not None:
            lo = lo or 0
            rep = f"{{{lo},{hi}}}" if hi is not None else f"{{{lo},}}"
            return f'"{STRING_INNER}{rep}"'
        return STRING

    def _object(self, schema: Dict[str, Any], depth: int) -> str:
        props = schema.get("properties", {})
        required = set(schema.get("required", list(props.keys())))
        if not props:
            inner = self._any_value(depth + 1)
            pair = f"{STRING}{WS}:{WS}{inner}"
            return f"\\{{{WS}(?:{pair}(?:{WS},{WS}{pair}){{0,8}})?{WS}\\}}"
        parts = []
        first = True
        # fixed property order (xgrammar does the same for required props)
        for name, sub in props.items():
            key = _escape_literal(json.dumps(name))
            val = self.regex(sub, depth + 1)
            pair = f"{key}{WS}:{WS}{val}"
            sep = "" if first else f"{WS},{WS}"
            if name in required:
                parts.append(f"{sep}{pair}")
                first = False
            else:
                # optional property keeps its slot but may be absent
                parts.append(f"(?:{sep}{pair})?")
        body = "".join(parts)
        return f"\\{{{WS}{body}{WS}\\}}"

    def _array(self, schema: Dict[str, Any], depth: int) -> str:
        item = self.regex(schema.get("items", True), depth + 1)
        lo = schema.get("minItems", 0)
        hi = schema.get("maxItems")
        more = f"(?:{WS},{WS}{item})"
        if hi is None:
            if lo == 0:
                body = f"(?:{item}{more}*)?"
            else:
                body = f"{item}{more}{{{lo - 1},}}"
        elif hi == 0:
            body = ""
        elif lo == 0:
            body = f"(?:{item}{more}{{0,{hi - 1}}})?"
        else:
            body = f"{item}{more}{{{lo - 1},{hi - 1}}}"
        return f"\\[{WS}{body}{WS}\\]"


def schema_to_regex(schema: str | Dict[str, Any]) -> str:
    if isinstance(schema, str):
        schema = json.loads(schema)
    return SchemaCompiler(schema).regex(schema)
