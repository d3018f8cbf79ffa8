"""GBNF text -> flat element-encoded rules.

Mirrors the reference grammar parser's output encoding
(llama_grammar_element, src/llama-grammar.h): per rule a flat list of
(type, value) pairs, alternates separated by ALT, terminated by END.
Repetition operators are rewritten into fresh rules exactly like the
reference (x* -> S ::= x S | eps, etc).
"""
from __future__ import annotations

END, ALT, RULE_REF, CHAR, CHAR_NOT, CHAR_RNG_UPPER, CHAR_ALT, CHAR_ANY = range(8)

_ESCAPES = {"n": 10, "t": 9, "r": 13, '"': 34, "[": 91, "]": 93, "\\": 92,
            "/": 47, "'": 39}


class GBNFError(ValueError):
    pass


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self.rule_ids: dict[str, int] = {}
        self.rules: dict[int, list[tuple[int, int]]] = {}

    # -- lexing helpers --

    def _ws(self, newlines=True):
        t = self.text
        while self.pos < len(t):
            c = t[self.pos]
            if c == "#":  # comment to end of line
                while self.pos < len(t) and t[self.pos] != "\n":
                    self.pos += 1
            elif c in " \t" or (newlines and c in "\r\n"):
                self.pos += 1
            else:
                break

    def _name(self) -> str:
        t = self.text
        start = self.pos
        while self.pos < len(t) and (t[self.pos].isalnum() or t[self.pos] in "-_"):
            self.pos += 1
        if self.pos == start:
            raise GBNFError(f"expected name at {start}: {t[start:start+20]!r}")
        return t[start: self.pos]

    def rule_id(self, name: str) -> int:
        if name not in self.rule_ids:
            self.rule_ids[name] = len(self.rule_ids)
        return self.rule_ids[name]

    def _new_rule(self, base: str) -> int:
        i = 0
        while f"{base}_{i}" in self.rule_ids:
            i += 1
        return self.rule_id(f"{base}_{i}")

    def _char(self) -> int:
        """One (possibly escaped) char -> code point."""
        t = self.text
        c = t[self.pos]
        self.pos += 1
        if c != "\\":
            return ord(c)
        e = t[self.pos]
        self.pos += 1
        if e in _ESCAPES:
            return _ESCAPES[e]
        if e == "x":
            v = int(t[self.pos: self.pos + 2], 16)
            self.pos += 2
            return v
        if e == "u":
            v = int(t[self.pos: self.pos + 4], 16)
            self.pos += 4
            return v
        if e == "U":
            v = int(t[self.pos: self.pos + 8], 16)
            self.pos += 8
            return v
        raise GBNFError(f"bad escape \\{e}")

    # -- grammar of grammars --

    def parse(self) -> tuple[list[list[tuple[int, int]]], int]:
        self._ws()
        while self.pos < len(self.text):
            name = self._name()
            rid = self.rule_id(name)
            self._ws()
            if self.text[self.pos: self.pos + 3] != "::=":
                raise GBNFError(f"expected ::= after {name}")
            self.pos += 3
            self._ws()
            elems = self._alternates(name)
            self.rules[rid] = elems + [(END, 0)]
            self._ws()
        if "root" not in self.rule_ids:
            raise GBNFError("no root rule")
        n = len(self.rule_ids)
        out = []
        for i in range(n):
            if i not in self.rules:
                name = [k for k, v in self.rule_ids.items() if v == i][0]
                raise GBNFError(f"undefined rule '{name}'")
            out.append(self.rules[i])
        _check_left_recursion(out, self.rule_ids)
        return out, self.rule_ids["root"]

    def _at_rule_end(self) -> bool:
        """A newline ends a rule iff what follows looks like `name ::=`."""
        save = self.pos
        t = self.text
        while self.pos < len(t) and t[self.pos] in " \t\r\n#":
            if t[self.pos] == "#":
                while self.pos < len(t) and t[self.pos] != "\n":
                    self.pos += 1
            else:
                self.pos += 1
        if self.pos >= len(t):
            return True
        probe = self.pos
        try:
            self._name()
            self._ws(newlines=False)
            is_rule = self.text[self.pos: self.pos + 3] == "::="
        except GBNFError:
            is_rule = False
        self.pos = probe if not is_rule else probe
        if is_rule:
            self.pos = probe
            return True
        self.pos = save if False else probe
        return False

    def _alternates(self, base: str) -> list[tuple[int, int]]:
        out = self._sequence(base)
        self._ws(newlines=False)
        while self.pos < len(self.text):
            if self.text[self.pos] == "|":
                self.pos += 1
                self._ws()
                out.append((ALT, 0))
                out.extend(self._sequence(base))
                self._ws(newlines=False)
            elif self.text[self.pos] in "\r\n":
                save = self.pos
                if self._at_rule_end():
                    self.pos = save
                    break
                # continuation line: keep parsing this rule
                self._ws()
                if self.pos < len(self.text) and self.text[self.pos] == "|":
                    continue
                break
            else:
                break
        return out

    def _sequence(self, base: str) -> list[tuple[int, int]]:
        out: list[tuple[int, int]] = []
        last_start = 0
        while self.pos < len(self.text):
            self._ws(newlines=False)
            if self.pos >= len(self.text):
                break
            c = self.text[self.pos]
            if c == '"':
                last_start = len(out)
                self.pos += 1
                while self.text[self.pos] != '"':
                    out.append((CHAR, self._char()))
                self.pos += 1
            elif c == "[":
                last_start = len(out)
                self.pos += 1
                neg = self.text[self.pos] == "^"
                if neg:
                    self.pos += 1
                first = True
                while self.text[self.pos] != "]":
                    lo = self._char()
                    t = (CHAR_NOT if neg else CHAR) if first else CHAR_ALT
                    out.append((t, lo))
                    first = False
                    if self.text[self.pos] == "-" and self.text[self.pos + 1] != "]":
                        self.pos += 1
                        out.append((CHAR_RNG_UPPER, self._char()))
                self.pos += 1
            elif c == ".":
                last_start = len(out)
                out.append((CHAR_ANY, 0))
                self.pos += 1
            elif c == "(":
                last_start = len(out)
                self.pos += 1
                self._ws()
                sub = self._alternates(base)
                if self.text[self.pos] != ")":
                    raise GBNFError(f"expected ) at {self.pos}")
                self.pos += 1
                rid = self._new_rule(base)
                self.rules[rid] = sub + [(END, 0)]
                out.append((RULE_REF, rid))
            elif c.isalnum() or c in "-_":
                save = self.pos
                name = self._name()
                self._ws(newlines=False)
                if self.text[self.pos: self.pos + 3] == "::=":
                    self.pos = save  # next rule starts
                    break
                last_start = len(out)
                out.append((RULE_REF, self.rule_id(name)))
            elif c in "*+?{":
                body = out[last_start:]
                del out[last_start:]
                if not body:
                    raise GBNFError(f"repetition with no operand at {self.pos}")
                if c == "{":
                    self.pos += 1
                    mn = self._int()
                    mx = None
                    if self.text[self.pos] == ",":
                        self.pos += 1
                        if self.text[self.pos] != "}":
                            mx = self._int()
                    else:
                        mx = mn
                    if self.text[self.pos] != "}":
                        raise GBNFError("expected }")
                    self.pos += 1
                else:
                    self.pos += 1
                    mn, mx = {"*": (0, None), "+": (1, None), "?": (0, 1)}[c]
                out.append((RULE_REF, self._rep_rule(base, body, mn, mx)))
                last_start = len(out) - 1
            else:
                break
        return out

    def _int(self) -> int:
        s = self.pos
        while self.text[self.pos].isdigit():
            self.pos += 1
        return int(self.text[s: self.pos])

    def _rep_rule(self, base: str, body, mn: int, mx) -> int:
        """body repeated [mn, mx] times -> rule id (reference rewrite rules)."""
        if mx is None:
            # S ::= body S | (body if mn else eps); prefix with mn-1 copies
            rid = self._new_rule(base)
            star = body + [(RULE_REF, rid), (ALT, 0)] + (body if mn else []) + [(END, 0)]
            self.rules[rid] = star
            if mn <= 1:
                return rid
            wrap = self._new_rule(base)
            self.rules[wrap] = body * (mn - 1) + [(RULE_REF, rid), (END, 0)]
            return wrap
        # bounded: mn copies + (mx-mn) nested optionals
        opt = None
        for _ in range(mx - mn):
            rid = self._new_rule(base)
            tail = body + ([(RULE_REF, opt)] if opt is not None else [])
            self.rules[rid] = tail + [(ALT, 0), (END, 0)]
            opt = rid
        wrap = self._new_rule(base)
        seq = body * mn + ([(RULE_REF, opt)] if opt is not None else [])
        self.rules[wrap] = seq + [(END, 0)]
        return wrap


def _check_left_recursion(rules, rule_ids: dict) -> None:
    """Reject left-recursive grammars (llama_grammar_detect_left_recursion,
    src/llama-grammar.cpp): a rule whose expansion can re-enter itself
    without consuming a character drives the pushdown automaton into
    unbounded recursion. Detected as a cycle in the "first position" graph
    (rule -> rules referenced before any character element, skipping over
    nullable references)."""
    def split_alts(r):
        alts, cur = [], []
        for t, v in r:
            if t in (ALT, END):
                alts.append(cur)
                cur = []
            else:
                cur.append((t, v))
        return alts

    alts = [split_alts(r) for r in rules]
    n = len(rules)
    nullable = [False] * n
    changed = True
    while changed:
        changed = False
        for i in range(n):
            if nullable[i]:
                continue
            for alt in alts[i]:
                ok = True
                for t, v in alt:
                    if t == RULE_REF:
                        if not nullable[v]:
                            ok = False
                            break
                    else:  # any char element consumes input
                        ok = False
                        break
                if ok:
                    nullable[i] = True
                    changed = True
                    break
    first = [set() for _ in range(n)]
    for i in range(n):
        for alt in alts[i]:
            for t, v in alt:
                if t == RULE_REF:
                    first[i].add(v)
                    if not nullable[v]:
                        break
                else:
                    break
    # cycle detection over the first-position graph (iterative DFS)
    color = [0] * n  # 0=white 1=grey 2=black
    names = {v: k for k, v in rule_ids.items()}
    for start in range(n):
        if color[start]:
            continue
        stack = [(start, iter(first[start]))]
        color[start] = 1
        while stack:
            node, it = stack[-1]
            for nxt in it:
                if color[nxt] == 1:
                    raise GBNFError(
                        f"left recursion detected in rule "
                        f"'{names.get(nxt, nxt)}'")
                if color[nxt] == 0:
                    color[nxt] = 1
                    stack.append((nxt, iter(first[nxt])))
                    break
            else:
                color[node] = 2
                stack.pop()


def parse_gbnf(text: str):
    """-> (rules, root_id); rules[i] is a flat [(type, value), ...] list."""
    return _Parser(text).parse()
