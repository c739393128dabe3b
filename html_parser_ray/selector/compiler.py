"""CSS selector compiler with the reference grammar and rejection rules.

Grammar (ref: src/selector/runtime.zig:13-523): tag or ``*``, ``#id`` (at most
one per compound), ``.class``, attr ops ``[a] [a=v] [a^=v] [a$=v] [a*=v]
[a~=v] [a|=v]``, combinators descendant/``>``/``+``/``~`` (leading combinators
allowed for scoped queries), grouping with ``,``, pseudos ``:first-child``
``:last-child`` ``:nth-child(An+B|odd|even|k)``, ``:not(<simple>)`` with a
single simple selector. Unknown pseudos and the reference's whole invalid-
selector list (ref: src/selector/runtime.zig:595-623) reject.
"""

from __future__ import annotations

import re

from html_parser_ray.selector.ast import (
    ADJACENT,
    CHILD,
    DESCENDANT,
    NONE,
    OP_CONTAINS,
    OP_DASH,
    OP_EQ,
    OP_EXISTS,
    OP_INCLUDES,
    OP_PREFIX,
    OP_SUFFIX,
    AttrSelector,
    Compound,
    NotSimple,
    NthExpr,
    Pseudo,
    Selector,
    SIBLING,
)

_WS = " \n\r\t\x0c"
# ident: start [A-Za-z_:], continue [A-Za-z0-9_-]
# (ref: src/selector/runtime.zig:371-378, 435-441)
_RE_IDENT = re.compile(r"[A-Za-z_:][A-Za-z0-9_\-]*")
_RE_TAG_START = re.compile(r"[A-Za-z_]")
_RE_INT = re.compile(r"[+-]?\d+\Z")


class InvalidSelectorError(ValueError):
    """Raised for selectors the reference rejects (error.InvalidSelector)."""


class _Parser:
    def __init__(self, source: str) -> None:
        self.src = source
        self.i = 0
        self.n = len(source)

    def error(self) -> InvalidSelectorError:
        return InvalidSelectorError(f"invalid selector: {self.src!r}")

    def peek(self) -> str:
        return self.src[self.i]

    def skip_ws(self) -> bool:
        start = self.i
        while self.i < self.n and self.src[self.i] in _WS:
            self.i += 1
        return self.i > start

    def consume_if(self, c: str) -> bool:
        if self.i < self.n and self.src[self.i] == c:
            self.i += 1
            return True
        return False

    def parse(self) -> Selector:
        # ref: src/selector/runtime.zig:47-156
        self.skip_ws()
        if self.i >= self.n:
            raise self.error()
        groups: list[tuple[Compound, ...]] = []
        while True:
            compounds: list[Compound] = []
            first_comb = NONE
            if self.i < self.n:
                c = self.peek()
                if c == ">":
                    self.i += 1
                    self.skip_ws()
                    first_comb = CHILD
                elif c == "+":
                    self.i += 1
                    self.skip_ws()
                    first_comb = ADJACENT
                elif c == "~":
                    self.i += 1
                    self.skip_ws()
                    first_comb = SIBLING
            compounds.append(self.parse_compound(first_comb))

            while True:
                saw_ws = self.skip_ws()
                if self.i >= self.n or self.peek() == ",":
                    break
                comb = DESCENDANT if saw_ws else NONE
                c = self.peek()
                if c == ">":
                    self.i += 1
                    self.skip_ws()
                    comb = CHILD
                elif c == "+":
                    self.i += 1
                    self.skip_ws()
                    comb = ADJACENT
                elif c == "~":
                    self.i += 1
                    self.skip_ws()
                    comb = SIBLING
                if comb == NONE:
                    raise self.error()
                compounds.append(self.parse_compound(comb))

            if not compounds:
                raise self.error()
            groups.append(tuple(compounds))

            self.skip_ws()
            if self.i >= self.n:
                break
            if self.peek() != ",":
                raise self.error()
            self.i += 1
            self.skip_ws()
            if self.i >= self.n:
                raise self.error()

        return Selector(source=self.src, groups=tuple(groups))

    def parse_ident(self) -> str:
        m = _RE_IDENT.match(self.src, self.i)
        if m is None:
            raise self.error()
        self.i = m.end()
        return m.group()

    def parse_compound(self, combinator: int) -> Compound:
        # ref: src/selector/runtime.zig:158-220
        tag: bytes | None = None
        id_: bytes | None = None
        classes: list[bytes] = []
        attrs: list[AttrSelector] = []
        pseudos: list[Pseudo] = []
        nots: list[NotSimple] = []
        consumed = False

        if self.i < self.n:
            c = self.peek()
            if c == "*":
                self.i += 1
                consumed = True
            elif _RE_TAG_START.match(c):
                tag = self.parse_ident().lower().encode()
                consumed = True

        while self.i < self.n:
            c = self.peek()
            if c == "#":
                self.i += 1
                if id_ is not None:
                    raise self.error()  # "#a#b" rejected (ref: runtime.zig:186-188)
                id_ = self.parse_ident().encode()
                consumed = True
            elif c == ".":
                self.i += 1
                classes.append(self.parse_ident().encode())
                consumed = True
            elif c == "[":
                self.i += 1
                attrs.append(self.parse_attr_selector())
                consumed = True
            elif c == ":":
                self.i += 1
                self.parse_pseudo(pseudos, nots)
                consumed = True
            else:
                break

        if not consumed:
            raise self.error()
        return Compound(
            combinator=combinator,
            tag=tag,
            id=id_,
            classes=tuple(classes),
            attrs=tuple(attrs),
            pseudos=tuple(pseudos),
            nots=tuple(nots),
        )

    def parse_attr_selector(self) -> AttrSelector:
        # ref: src/selector/runtime.zig:222-260
        self.skip_ws()
        m = _RE_IDENT.match(self.src, self.i)
        if m is None:
            raise self.error()
        self.i = m.end()
        name = m.group().lower().encode()
        self.skip_ws()

        op_map = {"^": OP_PREFIX, "$": OP_SUFFIX, "*": OP_CONTAINS,
                  "~": OP_INCLUDES, "|": OP_DASH}
        if self.consume_if("="):
            return AttrSelector(name, OP_EQ, self.parse_attr_value_then_close())
        if self.i < self.n and self.peek() in op_map:
            op = op_map[self.peek()]
            self.i += 1
            if not self.consume_if("="):
                raise self.error()
            return AttrSelector(name, op, self.parse_attr_value_then_close())
        if self.consume_if("]"):
            return AttrSelector(name, OP_EXISTS)
        raise self.error()

    def parse_attr_value_then_close(self) -> bytes:
        # ref: src/selector/runtime.zig:262-268, 347-369
        self.skip_ws()
        v = self.parse_value_token()
        self.skip_ws()
        if not self.consume_if("]"):
            raise self.error()
        return v

    def parse_value_token(self) -> bytes:
        if self.i >= self.n:
            raise self.error()
        c = self.peek()
        if c in "'\"":
            self.i += 1
            end = self.src.find(c, self.i)
            if end < 0:
                raise self.error()
            out = self.src[self.i : end]
            self.i = end + 1
            return out.encode()
        start = self.i
        while self.i < self.n and self.src[self.i] != "]" and self.src[self.i] not in _WS:
            self.i += 1
        if self.i == start:
            raise self.error()
        return self.src[start : self.i].encode()

    def parse_pseudo(self, pseudos: list[Pseudo], nots: list[NotSimple]) -> None:
        # ref: src/selector/runtime.zig:270-306
        name = self.parse_ident().lower()
        if name == "first-child":
            pseudos.append(Pseudo("first-child"))
            return
        if name == "last-child":
            pseudos.append(Pseudo("last-child"))
            return
        if name == "nth-child":
            self.skip_ws()
            if not self.consume_if("("):
                raise self.error()
            self.skip_ws()
            end = self.src.find(")", self.i)
            if end < 0:
                raise self.error()
            arg = self.src[self.i : end].strip(_WS)
            self.i = end + 1
            nth = _parse_nth_expr(arg)
            if nth is None:
                raise self.error()
            pseudos.append(Pseudo("nth-child", nth))
            return
        if name == "not":
            self.skip_ws()
            if not self.consume_if("("):
                raise self.error()
            self.skip_ws()
            item = self.parse_simple_not()
            self.skip_ws()
            if not self.consume_if(")"):
                raise self.error()
            nots.append(item)
            return
        raise self.error()  # unknown pseudo (ref: runtime.zig:305)

    def parse_simple_not(self) -> NotSimple:
        # ref: src/selector/runtime.zig:308-336
        if self.i >= self.n:
            raise self.error()
        c = self.peek()
        if c == "#":
            self.i += 1
            return NotSimple("id", self.parse_ident().encode())
        if c == ".":
            self.i += 1
            return NotSimple("class", self.parse_ident().encode())
        if c == "[":
            self.i += 1
            return NotSimple("attr", attr=self.parse_attr_selector())
        if _RE_IDENT.match(c):
            return NotSimple("tag", self.parse_ident().lower().encode())
        raise self.error()


def _parse_nth_expr(expr: str) -> NthExpr | None:
    # ref: src/selector/runtime.zig:447-482
    if not expr:
        return None
    low = expr.lower()
    if low == "odd":
        return NthExpr(2, 1)
    if low == "even":
        return NthExpr(2, 0)
    n_idx = -1
    for i, ch in enumerate(expr):
        if ch in "nN":
            n_idx = i
            break
    if n_idx >= 0:
        a_part = expr[:n_idx].strip(_WS)
        b_part = expr[n_idx + 1 :].strip(_WS)
        if not a_part or a_part == "+":
            a = 1
        elif a_part == "-":
            a = -1
        else:
            a = _parse_signed(a_part)
            if a is None:
                return None
        if not b_part:
            b = 0
        else:
            b = _parse_signed(b_part)
            if b is None:
                return None
        return NthExpr(a, b)
    only = _parse_signed(expr)
    if only is None:
        return None
    return NthExpr(0, only)


def _parse_signed(s: str) -> int | None:
    if not _RE_INT.match(s):
        return None
    try:
        v = int(s)
    except ValueError:
        return None
    if v < -(2**31) or v >= 2**31:
        return None
    return v


def compile_selector(source: str | bytes) -> Selector:
    """Compile selector text; raises InvalidSelectorError on rejection.

    Each compound additionally gets an exec-compiled flat predicate attached
    (selector/codegen.py — the comptime-compile analog); pseudo-class
    compounds keep the interpreted matcher."""
    if isinstance(source, bytes):
        source = source.decode("utf-8", errors="replace")
    sel = _Parser(source).parse()

    from html_parser_ray.selector.codegen import attach_predicates

    attach_predicates(sel)
    return sel
