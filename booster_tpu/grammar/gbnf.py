"""GBNF parser + grammar pushdown automaton.

Clean-room implementation of the GBNF format (behavior parity:
grammar_parser::parse, /root/reference/cpp/common/grammar-parser.cpp, and the
accept/advance machine in /root/reference/cpp/src/llama-grammar.cpp).

A grammar is a list of rules; each rule is a list of *alternates*; each
alternate is a sequence of elements:
    ("char", [(lo, hi), ...])   — codepoint must fall in one of the ranges
    ("char_not", [(lo, hi)...]) — codepoint must NOT fall in any range
    ("any",)                    — any codepoint
    ("ref", rule_id)            — push sub-rule
The automaton state is a stack set (the grammar may be locally ambiguous).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Optional

Element = tuple
Alternate = list  # list[Element]


@dataclass
class Grammar:
    rules: list[list[Alternate]]  # rules[id] = list of alternates
    start: int = 0
    names: dict[str, int] = None

    def start_stacks(self) -> list[tuple]:
        """Initial automaton stacks: one per start-rule alternate."""
        stacks = []
        for alt in self.rules[self.start]:
            stacks.extend(_expand(tuple(reversed(alt)), self.rules))
        return _dedup(stacks)


def _expand(stack: tuple, rules) -> list[tuple]:
    """Expand rule refs at the top of the stack until a terminal (or empty)."""
    if not stack:
        return [stack]
    top = stack[-1]
    if top[0] != "ref":
        return [stack]
    rest = stack[:-1]
    out = []
    for alt in rules[top[1]]:
        out.extend(_expand(rest + tuple(reversed(alt)), rules))
    return out


def _dedup(stacks: Iterable[tuple]) -> list[tuple]:
    seen = set()
    out = []
    for s in stacks:
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def _matches(elem: Element, cp: int) -> bool:
    kind = elem[0]
    if kind == "any":
        return True
    inside = any(lo <= cp <= hi for lo, hi in elem[1])
    return inside if kind == "char" else not inside


def advance_stacks(stacks: list[tuple], cp: int, rules) -> list[tuple]:
    """Consume one codepoint; returns the new stack set (empty = rejected)."""
    out = []
    for stack in stacks:
        if not stack:
            continue
        top = stack[-1]
        if top[0] == "ref":  # shouldn't happen (stacks kept expanded)
            continue
        if _matches(top, cp):
            out.extend(_expand(stack[:-1], rules))
    return _dedup(out)


def stacks_accept_cp(stacks: list[tuple], cp: int) -> bool:
    return any(stack and stack[-1][0] != "ref" and _matches(stack[-1], cp)
               for stack in stacks)


def stacks_done(stacks: list[tuple]) -> bool:
    """True if generation may stop (some stack fully consumed)."""
    return any(not s for s in stacks)


# --------------------------------------------------------------------------
# GBNF text parser
# --------------------------------------------------------------------------


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self.names: dict[str, int] = {}
        self.rules: dict[int, list[Alternate]] = {}

    def error(self, msg: str):
        line = self.text[: self.pos].count("\n") + 1
        raise ValueError(f"GBNF parse error at line {line}: {msg}")

    def rule_id(self, name: str) -> int:
        if name not in self.names:
            self.names[name] = len(self.names)
        return self.names[name]

    def _ws(self, newlines: bool = False):
        while self.pos < len(self.text):
            c = self.text[self.pos]
            if c == "#":  # comment to end of line
                while self.pos < len(self.text) and self.text[self.pos] != "\n":
                    self.pos += 1
            elif c in " \t" or (newlines and c in "\r\n"):
                self.pos += 1
            else:
                break

    def _peek(self) -> str:
        return self.text[self.pos] if self.pos < len(self.text) else ""

    def _name(self) -> str:
        start = self.pos
        while self._peek().isalnum() or self._peek() in "-_":
            self.pos += 1
        if start == self.pos:
            self.error("expected rule name")
        return self.text[start : self.pos]

    def _char(self) -> int:
        c = self._peek()
        if c == "\\":
            self.pos += 1
            e = self._peek()
            self.pos += 1
            if e == "x":
                v = int(self.text[self.pos : self.pos + 2], 16)
                self.pos += 2
                return v
            if e == "u":
                v = int(self.text[self.pos : self.pos + 4], 16)
                self.pos += 4
                return v
            if e == "U":
                v = int(self.text[self.pos : self.pos + 8], 16)
                self.pos += 8
                return v
            return {"n": 10, "r": 13, "t": 9}.get(e, ord(e))
        self.pos += 1
        return ord(c)

    def _alternates(self, rule_name: str) -> list[Alternate]:
        alts = [[]]
        # start index of the last SYMBOL in alts[-1]: a quoted literal is
        # one symbol of several char elements, and repetition operators
        # apply to the whole symbol (llama.cpp last_sym_start semantics,
        # common/grammar-parser.cpp parse_sequence)
        last_start = 0

        def _last_symbol():
            seq = alts[-1][last_start:]
            if not seq:
                self.error("operator with no preceding element")
            del alts[-1][last_start:]
            if len(seq) == 1:
                return seq[0]
            lit_name = f"{rule_name}_lit{len(self.names)}"
            lit_id = self.rule_id(lit_name)
            self.rules[lit_id] = [list(seq)]
            return ("ref", lit_id)

        while True:
            self._ws()
            c = self._peek()
            if c == "" or c in "\r\n":
                # rule continues on next line only if it starts with |
                save = self.pos
                self._ws(newlines=True)
                if self._peek() == "|":
                    self.pos += 1
                    alts.append([])
                    last_start = 0
                    continue
                self.pos = save
                break
            if c == ")":
                break  # end of a parenthesized group (caller consumes it)
            if c == "|":
                self.pos += 1
                alts.append([])
                last_start = 0
            elif c == '"':
                self.pos += 1
                last_start = len(alts[-1])
                while self._peek() != '"':
                    if self._peek() == "":
                        self.error("unterminated string")
                    cp = self._char()
                    alts[-1].append(("char", ((cp, cp),)))
                self.pos += 1
            elif c == "[":
                last_start = len(alts[-1])
                self.pos += 1
                negate = self._peek() == "^"
                if negate:
                    self.pos += 1
                ranges = []
                while self._peek() != "]":
                    if self._peek() == "":
                        self.error("unterminated char class")
                    lo = self._char()
                    hi = lo
                    if self._peek() == "-" and self.text[self.pos + 1] != "]":
                        self.pos += 1
                        hi = self._char()
                    ranges.append((lo, hi))
                self.pos += 1
                alts[-1].append(("char_not" if negate else "char", tuple(ranges)))
            elif c == ".":
                self.pos += 1
                last_start = len(alts[-1])
                alts[-1].append(("any",))
            elif c == "(":
                self.pos += 1
                last_start = len(alts[-1])
                sub_name = f"{rule_name}_{len(self.names)}"
                sub_id = self.rule_id(sub_name)
                self.rules[sub_id] = self._alternates(sub_name)
                self._ws(newlines=True)
                if self._peek() != ")":
                    self.error("expected )")
                self.pos += 1
                alts[-1].append(("ref", sub_id))
            elif c.isalnum() or c in "-_":
                last_start = len(alts[-1])
                name = self._name()
                alts[-1].append(("ref", self.rule_id(name)))
            elif c in "*+?":
                self.pos += 1
                last = _last_symbol()
                rep_name = f"{rule_name}_rep{len(self.names)}"
                rep_id = self.rule_id(rep_name)
                if c == "*":
                    self.rules[rep_id] = [[last, ("ref", rep_id)], []]
                elif c == "+":
                    self.rules[rep_id] = [[last, ("ref", rep_id)], [last]]
                else:  # ?
                    self.rules[rep_id] = [[last], []]
                last_start = len(alts[-1])
                alts[-1].append(("ref", rep_id))
            elif c == "{":
                # {m,n} bounded repetition
                self.pos += 1
                start = self.pos
                while self._peek() not in "}":
                    self.pos += 1
                spec = self.text[start : self.pos]
                self.pos += 1
                last = _last_symbol()
                if "," in spec:
                    lo_s, hi_s = spec.split(",", 1)
                    m = int(lo_s) if lo_s else 0
                    n = int(hi_s) if hi_s.strip() else None
                else:
                    m = n = int(spec)
                seq = [last] * m
                if n is None:
                    rep_name = f"{rule_name}_rep{len(self.names)}"
                    rep_id = self.rule_id(rep_name)
                    self.rules[rep_id] = [[last, ("ref", rep_id)], []]
                    seq.append(("ref", rep_id))
                else:
                    for _ in range(n - m):
                        opt_name = f"{rule_name}_opt{len(self.names)}"
                        opt_id = self.rule_id(opt_name)
                        self.rules[opt_id] = [[last], []]
                        seq.append(("ref", opt_id))
                last_start = len(alts[-1])
                alts[-1].extend(seq)
            else:
                self.error(f"unexpected character {c!r}")
        return alts

    def parse(self) -> Grammar:
        self._ws(newlines=True)
        while self.pos < len(self.text):
            name = self._name()
            rid = self.rule_id(name)
            self._ws()
            if self.text[self.pos : self.pos + 3] != "::=":
                self.error("expected ::=")
            self.pos += 3
            self._ws()
            self.rules[rid] = self._alternates(name)
            self._ws(newlines=True)
        if "root" not in self.names:
            raise ValueError("grammar has no 'root' rule")
        n = len(self.names)
        rules = [None] * n
        for name, rid in self.names.items():
            if rid not in self.rules:
                raise ValueError(f"undefined rule {name!r}")
            rules[rid] = self.rules[rid]
        return Grammar(rules=rules, start=self.names["root"], names=dict(self.names))


def parse_gbnf(text: str) -> Grammar:
    return _Parser(text).parse()
