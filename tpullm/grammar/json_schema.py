"""JSON schema -> GBNF (common/json-schema-to-grammar.cpp analogue).

Covers the common schema subset: object (properties/required/
additionalProperties=false), array (items, minItems/maxItems), string
(enum, const), number/integer/boolean/null, anyOf/oneOf, $defs/$ref,
nested combinations. Output reuses a shared JSON primitive rule set.
"""
from __future__ import annotations

import json
import re

_PRIMS = r"""
space ::= " "?
string ::= "\"" char* "\"" space
char ::= [^"\\\x7F\x00-\x1F] | "\\" (["\\bfnrt] | "u" [0-9a-fA-F] [0-9a-fA-F] [0-9a-fA-F] [0-9a-fA-F])
number ::= ("-"? ([0-9] | [1-9] [0-9]*)) ("." [0-9]+)? ([eE] [-+]? [0-9]+)? space
integer ::= ("-"? ([0-9] | [1-9] [0-9]*)) space
boolean ::= ("true" | "false") space
null ::= "null" space
value ::= object | array | string | number | boolean | null
object ::= "{" space ( string ":" space value ("," space string ":" space value)* )? "}" space
array ::= "[" space ( value ("," space value)* )? "]" space
"""


def _lit(s: str) -> str:
    return json.dumps(s)


class _Conv:
    def __init__(self, schema: dict):
        self.schema = schema
        self.rules: dict[str, str] = {}
        self.defs = schema.get("$defs", schema.get("definitions", {}))

    def add(self, name: str, body: str) -> str:
        base = re.sub(r"[^a-zA-Z0-9-]+", "-", name).strip("-") or "r"
        key = base
        i = 0
        while key in self.rules and self.rules[key] != body:
            i += 1
            key = f"{base}{i}"
        self.rules[key] = body
        return key

    def visit(self, sch, name: str) -> str:
        if not isinstance(sch, dict):
            return "value"
        if "$ref" in sch:
            ref = sch["$ref"].split("/")[-1]
            return self.visit(self.defs.get(ref, {}), ref)
        if "const" in sch:
            return self.add(name, _lit(json.dumps(sch["const"])) + " space")
        if "enum" in sch:
            alts = " | ".join(_lit(json.dumps(v)) for v in sch["enum"])
            return self.add(name, f"({alts}) space")
        for comb in ("anyOf", "oneOf"):
            if comb in sch:
                subs = [self.visit(s, f"{name}-{i}") for i, s in enumerate(sch[comb])]
                return self.add(name, " | ".join(subs))
        t = sch.get("type")
        if isinstance(t, list):
            subs = [self.visit({**sch, "type": ti}, f"{name}-{ti}") for ti in t]
            return self.add(name, " | ".join(subs))
        if t == "object" and "properties" in sch:
            req = set(sch.get("required", []))
            parts = []
            first = True
            # required properties in declaration order; optional ones too
            # (optional handled as ? groups between commas — simplified to
            # all-required when any optional follows a required, the common
            # constrained-generation case)
            for k, v in sch["properties"].items():
                sub = self.visit(v, f"{name}-{k}")
                kv = f'{_lit(json.dumps(k))} space ":" space {sub}'
                if first:
                    seg = kv if k in req else f"({kv})?"
                else:
                    seg = f'"," space {kv}' if k in req else f'("," space {kv})?'
                parts.append(seg)
                first = False
            inner = " ".join(parts)
            return self.add(name, f'"{{" space {inner} "}}" space')
        if t == "object":
            return "object"
        if t == "array":
            item = self.visit(sch.get("items", {}), f"{name}-item")
            mn = int(sch.get("minItems", 0))
            mx = sch.get("maxItems")
            if mn == 0 and mx is None:
                body = f'( {item} ("," space {item})* )?'
            else:
                lo = max(mn - 1, 0)
                rep = f'("," space {item}){{{lo},{mx - 1 if mx else ""}}}' \
                    if mx else f'("," space {item}){{{lo},}}'
                body = f"{item} {rep}" if mn >= 1 else f"( {item} {rep} )?"
            return self.add(name, f'"[" space {body} "]" space')
        if t == "string":
            return "string"
        if t == "integer":
            return "integer"
        if t == "number":
            return "number"
        if t == "boolean":
            return "boolean"
        if t == "null":
            return "null"
        return "value"

    def convert(self) -> str:
        root = self.visit(self.schema, "root")
        out = []
        if root != "root":
            out.append(f"root ::= {root}")
        for k, v in self.rules.items():
            out.append(f"{k} ::= {v}")
        out.append(_PRIMS.strip())
        return "\n".join(out)


def json_schema_to_gbnf(schema) -> str:
    if isinstance(schema, str):
        schema = json.loads(schema)
    return _Conv(schema).convert()
