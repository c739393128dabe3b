"""Debug query API: first match + near-miss diagnostics.

Python analog of the reference's ``QueryDebugReport`` / ``explainFirstMatch``
(ref: src/selector/matcher_debug.zig:18-103, src/common.zig:69-125): scans
elements in preorder, counts per-group evaluations/matches, and records up to
8 near-misses classified by the *first failing predicate* of the first group
(order: tag, id, class, attr, pseudo, :not, then scope/combinator).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from html_parser_ray.html.tables import token_includes
from html_parser_ray.html.tokenizer import KIND_ELEMENT
from html_parser_ray.selector.ast import NONE, Compound, Selector
from html_parser_ray.selector.matcher import (
    _match_from_right,
    _matches_attr,
    _matches_not,
    _matches_pseudo,
    _matches_scope_anchor,
)

MAX_NEAR_MISSES = 8
MAX_SELECTOR_GROUPS = 8


@dataclass
class Failure:
    kind: str = "none"  # tag|id|class|attr|pseudo|not_simple|combinator|scope
    group_index: int = -1
    compound_index: int = -1
    predicate_index: int = -1

    def is_none(self) -> bool:
        return self.kind == "none"


@dataclass
class QueryDebugReport:
    selector_source: str = ""
    scope_root: int | None = None
    visited_elements: int = 0
    matched_index: int | None = None
    matched_group: int | None = None
    group_eval_counts: list[int] = field(default_factory=list)
    group_match_counts: list[int] = field(default_factory=list)
    near_misses: list[tuple[int, Failure]] = field(default_factory=list)

    def push_near_miss(self, node_index: int, reason: Failure) -> None:
        if len(self.near_misses) < MAX_NEAR_MISSES:
            self.near_misses.append((node_index, reason))


def _classify_compound_failure(
    doc, sel: Selector, comp: Compound, index: int, g: int, c: int
) -> Failure:
    # ref: src/selector/matcher_debug.zig:105+ — predicate order matches the
    # matcher: tag, id, classes, attrs, pseudos, nots
    pred = 0
    if comp.tag is not None:
        if doc.name[index] != comp.tag:
            return Failure("tag", g, c, pred)
        pred += 1
    if comp.id is not None:
        if doc.attrs(index).get(b"id") != comp.id:
            return Failure("id", g, c, pred)
        pred += 1
    for cls in comp.classes:
        v = doc.attrs(index).get(b"class")
        if v is None or not token_includes(v, cls):
            return Failure("class", g, c, pred)
        pred += 1
    for a in comp.attrs:
        if not _matches_attr(doc, index, a):
            return Failure("attr", g, c, pred)
        pred += 1
    for p in comp.pseudos:
        if not _matches_pseudo(doc, index, p):
            return Failure("pseudo", g, c, pred)
        pred += 1
    for item in comp.nots:
        if _matches_not(doc, index, item):
            return Failure("not_simple", g, c, pred)
        pred += 1
    return Failure()


def _classify_group_failure(
    doc, sel: Selector, group: tuple[Compound, ...], index: int, scope_root, g: int
) -> Failure:
    rightmost = len(group) - 1
    comp = group[rightmost]
    reason = _classify_compound_failure(doc, sel, comp, index, g, rightmost)
    if not reason.is_none():
        return reason
    if len(group) == 1 and comp.combinator != NONE and not _matches_scope_anchor(
        doc, comp.combinator, index, scope_root
    ):
        return Failure("scope", g, rightmost)
    if len(group) > 1:
        return Failure("combinator", g, rightmost)
    return Failure()


def explain_first_match(
    doc, sel: Selector, scope_root: int | None = None
) -> QueryDebugReport:
    """First match with diagnostics (does not use index acceleration — the
    debug path intentionally visits candidates in scan order, like the ref)."""
    report = QueryDebugReport(
        selector_source=sel.source,
        scope_root=scope_root,
        group_eval_counts=[0] * min(len(sel.groups), MAX_SELECTOR_GROUPS),
        group_match_counts=[0] * min(len(sel.groups), MAX_SELECTOR_GROUPS),
    )
    if scope_root is None:
        start, end_incl = 1, len(doc.kind) - 1
    else:
        start = scope_root + 1
        end_incl = doc.subtree_end[scope_root]

    for i in range(start, end_incl + 1):
        if doc.kind[i] != KIND_ELEMENT:
            continue
        report.visited_elements += 1
        first_failure = Failure()
        for g, group in enumerate(sel.groups):
            if not group:
                continue
            if g < MAX_SELECTOR_GROUPS:
                report.group_eval_counts[g] += 1
            if _match_from_right(doc, group, len(group) - 1, i, scope_root):
                if g < MAX_SELECTOR_GROUPS:
                    report.group_match_counts[g] += 1
                report.matched_index = i
                report.matched_group = g
                return report
            if first_failure.is_none():
                first_failure = _classify_group_failure(
                    doc, sel, group, i, scope_root, g
                )
        if not first_failure.is_none():
            report.push_near_miss(i, first_failure)
    return report
