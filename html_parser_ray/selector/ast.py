"""Compiled CSS selector representation.

The reference compiles to a struct-of-arrays AST with index ranges
(ref: src/selector/ast.zig:163-267); the Python analog is a small tree of
frozen dataclasses — compiled once per distinct selector per process and held
in actor state, so representation compactness is not the bottleneck it is in
the per-document Zig path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# combinator constants
NONE = 0
DESCENDANT = 1
CHILD = 2
ADJACENT = 3
SIBLING = 4

# attr ops
OP_EXISTS = 0
OP_EQ = 1
OP_PREFIX = 2
OP_SUFFIX = 3
OP_CONTAINS = 4
OP_INCLUDES = 5
OP_DASH = 6


@dataclass(frozen=True)
class AttrSelector:
    name: bytes  # lowercased
    op: int
    value: bytes = b""


@dataclass(frozen=True)
class NthExpr:
    """An+B matcher (ref: src/selector/ast.zig:87-106)."""

    a: int
    b: int

    def matches(self, position: int) -> bool:
        if self.a == 0:
            return position == self.b
        diff = position - self.b
        if self.a > 0:
            return diff >= 0 and diff % self.a == 0
        return diff <= 0 and (-diff) % (-self.a) == 0


@dataclass(frozen=True)
class Pseudo:
    kind: str  # "first-child" | "last-child" | "nth-child"
    nth: NthExpr | None = None


@dataclass(frozen=True)
class NotSimple:
    kind: str  # "tag" | "id" | "class" | "attr"
    text: bytes = b""
    attr: AttrSelector | None = None


@dataclass(frozen=True)
class Compound:
    combinator: int = NONE
    tag: bytes | None = None  # lowercased
    id: bytes | None = None
    classes: tuple[bytes, ...] = ()
    attrs: tuple[AttrSelector, ...] = ()
    pseudos: tuple[Pseudo, ...] = ()
    nots: tuple[NotSimple, ...] = ()


@dataclass(frozen=True)
class Selector:
    source: str
    groups: tuple[tuple[Compound, ...], ...] = field(default=())
