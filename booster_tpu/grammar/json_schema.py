"""JSON Schema → GBNF conversion for constrained JSON output.

Reference analog: /root/reference/cpp/common/json-schema-to-grammar.cpp.
Supports the practical subset: object/properties/required, array/items with
min/max, string (enum/const), number/integer/boolean/null, anyOf/oneOf,
$ref into $defs/definitions.  Unknown subschemas degrade to generic JSON
values (same degradation the reference applies).
"""

from __future__ import annotations

import json
import re
from typing import Any

_PRIMITIVES = {
    "space": r'( " " | "\n" )?',
    "ws": r'( " " | "\n" )?',
    "string": r'"\"" ( [^"\\\x00-\x1f] | "\\" (["\\/bfnrt] | "u" [0-9a-fA-F]{4}) )* "\"" space',
    "number": r'"-"? ( [0-9] | [1-9] [0-9]* ) ( "." [0-9]+ )? ( [eE] [-+]? [0-9]+ )? space',
    "integer": r'"-"? ( [0-9] | [1-9] [0-9]* ) space',
    "boolean": r'( "true" | "false" ) space',
    "null": r'"null" space',
    "value": r"object | array | string | number | boolean | null",
    "object": r'"{" space ( string ":" space value ( "," space string ":" space value )* )? "}" space',
    "array": r'"[" space ( value ( "," space value )* )? "]" space',
}


def _lit(s: str) -> str:
    """GBNF-quote a literal string (GBNF escapes match JSON's)."""
    return json.dumps(s)


class _Converter:
    def __init__(self, schema: dict):
        self.schema = schema
        self.rules: dict[str, str] = {"space": _PRIMITIVES["space"]}
        self.defs = schema.get("$defs", schema.get("definitions", {}))
        self.counter = 0

    def _need(self, name: str) -> str:
        if name not in self.rules:
            self.rules[name] = _PRIMITIVES[name]
            # pull in transitive primitive deps
            for dep in ("string", "number", "boolean", "null", "value",
                        "object", "array", "space"):
                if re.search(rf"\b{dep}\b", self.rules[name]) and dep not in self.rules:
                    self._need(dep)
        return name

    def _fresh(self, hint: str) -> str:
        self.counter += 1
        name = re.sub(r"[^a-zA-Z0-9-]", "-", hint) or "r"
        return f"{name}{self.counter}"

    def convert(self, schema: Any, name: str) -> str:
        if schema is True or schema == {}:
            return self._need("value")
        if "$ref" in schema:
            ref = schema["$ref"]
            key = ref.split("/")[-1]
            if key in self.defs:
                rule = self._fresh(key)
                # register placeholder to break cycles
                if f"def-{key}" not in self.rules:
                    self.rules[f"def-{key}"] = "null"  # placeholder
                    self.rules[f"def-{key}"] = self._expr(self.defs[key], key)
                return f"def-{key}"
            return self._need("value")
        rule_name = self._fresh(name)
        self.rules[rule_name] = self._expr(schema, name)
        return rule_name

    def _expr(self, schema: Any, name: str) -> str:
        if schema is True or schema == {}:
            return self._need("value")
        if "enum" in schema:
            alts = " | ".join(_lit(json.dumps(v)) for v in schema["enum"])
            return f"( {alts} ) space"
        if "const" in schema:
            return f"{_lit(json.dumps(schema['const']))} space"
        for comb in ("oneOf", "anyOf"):
            if comb in schema:
                subs = [self.convert(s, f"{name}-{i}") for i, s in enumerate(schema[comb])]
                return "( " + " | ".join(subs) + " )"
        t = schema.get("type")
        if isinstance(t, list):
            subs = [self.convert({**schema, "type": ti}, f"{name}-{ti}") for ti in t]
            return "( " + " | ".join(subs) + " )"
        if t == "object" and "properties" in schema:
            props = schema["properties"]
            required = set(schema.get("required", props.keys()))
            parts = []
            first = True
            for key, sub in props.items():
                sub_rule = self.convert(sub, f"{name}-{key}")
                piece = f'{_lit(json.dumps(key))} space ":" space {sub_rule}'
                if not first:
                    piece = f'"," space {piece}'
                if key not in required:
                    piece = f"( {piece} )?"
                parts.append(piece)
                first = False
            body = " ".join(parts)
            self._need("space")
            return f'"{{" space {body} "}}" space'
        if t == "array":
            item = self.convert(schema.get("items", True), f"{name}-item")
            min_i = int(schema.get("minItems", 0))
            max_i = schema.get("maxItems")
            self._need("space")
            if min_i == 0 and max_i is None:
                return f'"[" space ( {item} ( "," space {item} )* )? "]" space'
            rep = f'( "," space {item} )'
            lo = max(min_i - 1, 0)
            bound = f"{{{lo},{int(max_i) - 1}}}" if max_i is not None else f"{{{lo},}}"
            head = item if min_i >= 1 else f"( {item}"
            if min_i >= 1:
                return f'"[" space {item} {rep}{bound} "]" space'
            return f'"[" space ( {item} {rep}{bound} )? "]" space'
        if t in ("string",) :
            return self._need("string")
        if t in ("number",):
            return self._need("number")
        if t == "integer":
            return self._need("integer")
        if t == "boolean":
            return self._need("boolean")
        if t == "null":
            return self._need("null")
        return self._need("value")


def json_schema_to_gbnf(schema: dict | str) -> str:
    if isinstance(schema, str):
        schema = json.loads(schema)
    conv = _Converter(schema)
    root = conv.convert(schema, "root")
    lines = [f"root ::= {root} space" if root != "root" else ""]
    lines = [f"root ::= {root}"]
    for rname, body in conv.rules.items():
        lines.append(f"{rname} ::= {body}")
    return "\n".join(lines) + "\n"
