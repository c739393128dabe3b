"""Right-to-left selector matcher over the index-array DOM.

Algorithm parity with the reference (ref: src/selector/matcher.zig):
- a node matches a group when the rightmost compound matches it and each
  combinator step can be satisfied walking left — ``>`` to the parent, ``+`` to
  the previous element sibling, descendant/``~`` backtracking over all
  ancestors / all previous element siblings (ref: matcher.zig:43-179);
- the leftmost compound with a leading combinator must anchor to the scope
  root (document for unscoped queries; ref: src/common.zig:156-187);
- predicate order: tag, id, classes, attr ops, pseudos, :not
  (ref: matcher.zig:253-304);
- ``query_one`` returns the minimum matching index across groups
  (ref: matcher.zig:23-31), with id/tag index acceleration and duplicate-id
  fall-back-to-scan (ref: matcher.zig:181-234);
- ``query_all`` yields matches in document preorder within the scope window
  ``(scope_root, subtree_end]`` (ref: src/html/document.zig:226-248).

Python recursion replaces the reference's explicit frame stack; the recursion
depth is bounded by the compound count, not the document depth, because each
backtracking step consumes one compound.
"""

from __future__ import annotations

from html_parser_ray.html.tables import token_includes
from html_parser_ray.html.tokenizer import INVALID, KIND_ELEMENT
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
    Selector,
    SIBLING,
)


def _matches_attr(doc, index: int, sel: AttrSelector) -> bool:
    # ref: src/selector/matcher.zig:343-365
    return _matches_attr_in(doc.attrs(index), sel)


def _matches_attr_in(attrs: dict, sel: AttrSelector) -> bool:
    """Attr-op semantics over an already-fetched attr dict (the compound
    matcher fetches each node's attrs ONCE and threads the dict through —
    the per-node attr memo lookup was ~30% of a cached query op)."""
    raw = attrs.get(sel.name)
    if raw is None:
        return False
    v = sel.value
    op = sel.op
    if op == OP_EXISTS:
        return True
    if op == OP_EQ:
        return raw == v
    if op == OP_PREFIX:
        return raw.startswith(v)
    if op == OP_SUFFIX:
        return raw.endswith(v)
    if op == OP_CONTAINS:
        return v in raw
    if op == OP_INCLUDES:
        return token_includes(raw, v)
    if op == OP_DASH:
        return raw == v or (len(raw) > len(v) and raw.startswith(v) and raw[len(v)] == 0x2D)
    return False


def _matches_pseudo(doc, index: int, pseudo) -> bool:
    # ref: src/selector/matcher.zig:327-341
    k = pseudo.kind
    if k == "first-child":
        return doc.prev_element_sibling(index) is None
    if k == "last-child":
        return doc.next_element_sibling(index) is None
    # nth-child
    if doc.parent_element(index) is None:
        return False
    return pseudo.nth.matches(doc.element_position(index))


def matches_compound(doc, comp: Compound, index: int) -> bool:
    # ref: src/selector/matcher.zig:242-305; predicate order preserved, but
    # the node's attr dict is fetched at most once per compound evaluation.
    # Compiler-built compounds carry an exec-compiled flat predicate
    # (selector/codegen.py, parity-pinned) — the interpreted chain below
    # remains for pseudo-class compounds and hand-built test Compounds.
    pred = getattr(comp, "_pred", None)
    if pred is not None:
        return pred(doc, index)
    if doc.kind[index] != KIND_ELEMENT:
        return False
    if comp.tag is not None and doc.name[index] != comp.tag:
        return False
    attrs = None
    if comp.id is not None:
        attrs = doc.attrs(index)
        if attrs.get(b"id") != comp.id:
            return False
    if comp.classes:
        if attrs is None:
            attrs = doc.attrs(index)
        cls = attrs.get(b"class")
        if cls is None:
            return False
        # exact token membership, case-sensitive (ref: matcher.zig:372-408)
        tokens = None
        for want in comp.classes:
            if tokens is None:
                tokens = set(_split_ws(cls))
            if want not in tokens:
                return False
    if comp.attrs:
        if attrs is None:
            attrs = doc.attrs(index)
        for a in comp.attrs:
            if not _matches_attr_in(attrs, a):
                return False
    for p in comp.pseudos:
        if not _matches_pseudo(doc, index, p):
            return False
    if comp.nots:
        if attrs is None:
            attrs = doc.attrs(index)
        for item in comp.nots:
            if _matches_not_in(doc, attrs, index, item):
                return False
    return True


import re as _re

_RE_WS_SPLIT = _re.compile(rb"[ \n\r\t\x0c]+")


def _split_ws(value: bytes) -> list[bytes]:
    return [t for t in _RE_WS_SPLIT.split(value) if t]


def _matches_not(doc, index: int, item) -> bool:
    # ref: src/selector/matcher.zig:307-325
    return _matches_not_in(doc, doc.attrs(index), index, item)


def _matches_not_in(doc, attrs: dict, index: int, item) -> bool:
    k = item.kind
    if k == "tag":
        # item.text is lowercased at compile time, node names at parse time
        return doc.name[index] == item.text
    if k == "id":
        return attrs.get(b"id") == item.text
    if k == "class":
        cls = attrs.get(b"class")
        return cls is not None and token_includes(cls, item.text)
    return _matches_attr_in(attrs, item.attr)


def _matches_scope_anchor(doc, combinator: int, index: int, scope_root: int | None) -> bool:
    # ref: src/common.zig:156-187
    if combinator == NONE:
        return True
    anchor = 0 if scope_root is None else scope_root
    if combinator == CHILD:
        p = doc.parent[index]
        return p != INVALID and p == anchor
    if combinator == DESCENDANT:
        p = doc.parent[index]
        while p != INVALID:
            if p == anchor:
                return True
            if p == 0:
                break
            p = doc.parent[p]
        return False
    if combinator == ADJACENT:
        return doc.prev_element_sibling(index) == anchor
    if combinator == SIBLING:
        prev = doc.prev_element_sibling(index)
        while prev is not None:
            if prev == anchor:
                return True
            prev = doc.prev_element_sibling(prev)
        return False
    return True


def _match_from_right(
    doc, compounds: tuple[Compound, ...], rel: int, index: int, scope_root: int | None
) -> bool:
    # ref: src/selector/matcher.zig:56-179 — the reference's explicit
    # frame-stack backtracking, ported verbatim (no Python recursion, so
    # pathological thousand-compound chains cannot hit the recursion limit;
    # the reference spills its frames to the page allocator for the same
    # reason). Frame = [rel_index, node_index, phase, cursor]; phases:
    # 0 = enter, 1 = scan_descendant, 2 = scan_sibling.
    if rel == 0:
        # single-compound group (the common cached-query shape): no
        # backtracking possible — skip the frame machinery entirely
        comp = compounds[0]
        return matches_compound(doc, comp, index) and (
            comp.combinator == NONE
            or _matches_scope_anchor(doc, comp.combinator, index, scope_root)
        )
    frames = [[rel, index, 0, -1]]
    while frames:
        fr = frames[-1]
        phase = fr[2]
        if phase == 0:
            rel_i = fr[0]
            node = fr[1]
            comp = compounds[rel_i]
            if not matches_compound(doc, comp, node):
                frames.pop()
                continue
            if rel_i == 0:
                if comp.combinator == NONE or _matches_scope_anchor(
                    doc, comp.combinator, node, scope_root
                ):
                    return True
                frames.pop()
                continue
            comb = comp.combinator
            if comb == CHILD:
                p = doc.parent_element(node)
                if p is None:
                    frames.pop()
                    continue
                fr[0] = rel_i - 1
                fr[1] = p
            elif comb == ADJACENT:
                prev = doc.prev_element_sibling(node)
                if prev is None:
                    frames.pop()
                    continue
                fr[0] = rel_i - 1
                fr[1] = prev
            elif comb == DESCENDANT:
                p = doc.parent_element(node)
                if p is None:
                    frames.pop()
                    continue
                fr[2] = 1
                fr[3] = p
                frames.append([rel_i - 1, p, 0, -1])
            elif comb == SIBLING:
                prev = doc.prev_element_sibling(node)
                if prev is None:
                    frames.pop()
                    continue
                fr[2] = 2
                fr[3] = prev
                frames.append([rel_i - 1, prev, 0, -1])
            else:
                # NONE in non-leftmost position cannot be produced by the compiler
                frames.pop()
        elif phase == 1:
            nxt = doc.parent_element(fr[3])
            if nxt is None:
                frames.pop()
                continue
            fr[3] = nxt
            frames.append([fr[0] - 1, nxt, 0, -1])
        else:
            nxt = doc.prev_element_sibling(fr[3])
            if nxt is None:
                frames.pop()
                continue
            fr[3] = nxt
            frames.append([fr[0] - 1, nxt, 0, -1])
    return False


def matches_selector_at(doc, selector: Selector, index: int, scope_root: int | None = None) -> bool:
    """Does node ``index`` match any group (ref: src/selector/matcher.zig:34-41)."""
    for group in selector.groups:
        if group and _match_from_right(doc, group, len(group) - 1, index, scope_root):
            return True
    return False


def query_all(doc, selector: Selector, scope_root: int | None = None) -> list[int]:
    """All matching element indexes in preorder within scope
    (ref: src/html/document.zig:226-248).

    When every group's rightmost compound names a tag or a class, candidates
    come from the per-tag / per-class accel indexes instead of a full node
    scan — output equals the scan's because a match requires the rightmost
    tag (resp. class token) to hold on the node, and candidate lists (and
    their sorted union) are already preorder. The reference reserves accel
    for queryOne (matcher.zig:181-234) and has no class index; extending
    both to queryAll is observation-equivalent and pure win here.
    """
    if scope_root is None:
        start, end_incl = 1, len(doc.kind) - 1
    else:
        start = scope_root + 1
        end_incl = doc.subtree_end[scope_root]
    groups = [g for g in selector.groups if g]
    if not groups:
        return []
    out = []
    # candidate list per group: tag accel, else class accel (beyond-reference,
    # scan-equal: candidates still pass the full matcher) — None means the
    # group needs the scan
    cand_lists: list[list[int]] | None = []
    for g in groups:
        comp = g[-1]
        if comp.tag is not None:
            cand_lists.append(doc.tag_index(comp.tag))
        elif comp.classes:
            cand_lists.append(doc.class_index(comp.classes[0]))
        else:
            cand_lists = None
            break
    if cand_lists is not None:
        if len(cand_lists) == 1:
            cand = cand_lists[0]
        else:
            u: set[int] = set()
            for lst in cand_lists:
                u.update(lst)
            cand = sorted(u)
        # single-compound groups with a codegen predicate skip the
        # _match_from_right/matches_compound frames entirely (scope is
        # already enforced by the candidate window; no combinators exist)
        preds = [
            getattr(g[-1], "_pred", None)
            if len(g) == 1 and g[-1].combinator == NONE
            else None
            for g in groups
        ]
        for i in cand:
            if i < start:
                continue
            if i > end_incl:
                break
            for group, pred in zip(groups, preds):
                if (
                    pred(doc, i)
                    if pred is not None
                    else _match_from_right(doc, group, len(group) - 1, i, scope_root)
                ):
                    out.append(i)
                    break
        return out
    # scan fallback: one vectorized element-kind mask instead of a Python
    # test per node (text/doc nodes never match)
    import numpy as np

    kinds = np.asarray(doc.kind)
    cand = np.flatnonzero(kinds[start : end_incl + 1] == KIND_ELEMENT) + start
    for i in cand:
        i = int(i)
        for group in groups:
            if _match_from_right(doc, group, len(group) - 1, i, scope_root):
                out.append(i)
                break
    return out


def _in_scope(doc, idx: int, scope_root: int | None) -> bool:
    if scope_root is None:
        return idx > 0
    return scope_root < idx <= doc.subtree_end[scope_root]


def _first_match_for_group(doc, group: tuple[Compound, ...], scope_root: int | None):
    # ref: src/selector/matcher.zig:181-234 with id/tag acceleration
    rightmost = len(group) - 1
    comp = group[rightmost]

    if comp.id is not None:
        hit = doc.id_index().get(comp.id)
        if hit is None:
            # id index is exact in Python (no hash collisions): a miss is
            # definitive for the *first* element with that id, but duplicate
            # ids mean a later element could still match -> only when the id
            # is entirely absent can we return early.
            return None
        if _in_scope(doc, hit, scope_root) and _match_from_right(
            doc, group, rightmost, hit, scope_root
        ):
            return hit
        # duplicate-id / failed-predicate fallback to scan semantics
        # (ref: src/selector/matcher.zig:190-195)
    elif comp.tag is not None:
        candidates = doc.tag_index(comp.tag)
        if scope_root is not None:
            scope_end = doc.subtree_end[scope_root]
            for idx in candidates:
                if idx <= scope_root:
                    continue
                if idx > scope_end:
                    break
                if _match_from_right(doc, group, rightmost, idx, scope_root):
                    return idx
            return None
        if rightmost == 0 and comp.combinator == NONE:
            # cached-query hot shape: single compound, no scope anchoring —
            # evaluate the compound directly on each tag-index candidate
            for idx in candidates:
                if matches_compound(doc, comp, idx):
                    return idx
            return None
        for idx in candidates:
            if _match_from_right(doc, group, rightmost, idx, scope_root):
                return idx
        return None
    elif comp.classes:
        # per-class accel (beyond-reference; scan-equal — see class_index)
        # ONLY when a prior query already built the index: query_one's value
        # is the early exit, and an eager O(doc) index build on a one-shot
        # lookup would decode every element's attrs before the first hit
        candidates = doc.class_index_if_built(comp.classes[0])
        if candidates is not None:
            for idx in candidates:
                if idx <= (scope_root if scope_root is not None else 0):
                    continue
                if scope_root is not None and idx > doc.subtree_end[scope_root]:
                    break
                if _match_from_right(doc, group, rightmost, idx, scope_root):
                    return idx
            return None

    if scope_root is None:
        start, end_incl = 1, len(doc.kind) - 1
    else:
        start = scope_root + 1
        end_incl = doc.subtree_end[scope_root]
    kinds = doc.kind
    for i in range(start, end_incl + 1):
        if kinds[i] != KIND_ELEMENT:
            continue
        if _match_from_right(doc, group, rightmost, i, scope_root):
            return i
    return None


def query_one(doc, selector: Selector, scope_root: int | None = None):
    """First match = min index across groups (ref: src/selector/matcher.zig:23-31)."""
    best = None
    for group in selector.groups:
        if not group:
            continue
        idx = _first_match_for_group(doc, group, scope_root)
        if idx is not None and (best is None or idx < best):
            best = idx
    return best
