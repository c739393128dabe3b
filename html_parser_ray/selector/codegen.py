"""Compound-predicate code generation — the Python analog of the reference's
comptime-compiled matcher (ref: src/selector/compile_time.zig:6-58).

A compound like ``a[href^=https][class*=button]:not(.missing)`` interpreted
by ``matcher.matches_compound`` costs a chain of function calls and loop
dispatch per candidate node (~2 µs/op — the round-2 honesty-table gap vs the
reference's 766 ns). Each codegen-able compound is instead exec-compiled ONCE
at selector-compile time into a single flat function (one attrs fetch, the
predicate chain inlined as straight-line code, byte literals embedded), which
the matcher calls directly. Selector compilation is LRU-cached per process /
per actor, so the codegen cost amortizes exactly like the reference's
comptime specialization.

Pseudo-classes (:first-child/:last-child/:nth-child) need structural
navigation and fall back to the interpreted path (``build_predicate`` returns
``None``). Parity between the generated and interpreted matchers is pinned by
tests/test_selector_codegen.py across the vendored conformance corpora.
"""

from __future__ import annotations

from html_parser_ray.selector.ast import (
    OP_CONTAINS,
    OP_DASH,
    OP_EQ,
    OP_EXISTS,
    OP_INCLUDES,
    OP_PREFIX,
    OP_SUFFIX,
    AttrSelector,
    Compound,
)


def _attr_test(var: str, sel: AttrSelector) -> "list[str] | None":
    """Positive attr-op test lines: falls through when the op HOLDS, returns
    False otherwise. ``None`` marks an op that can never hold (compile-time
    constant False). Semantics mirror matcher._matches_attr_in
    (ref: src/selector/matcher.zig:343-365)."""
    v = sel.value
    op = sel.op
    lines = [f"    if {var} is None: return False"]
    if op == OP_EXISTS:
        return lines
    if op == OP_EQ:
        lines.append(f"    if {var} != {v!r}: return False")
    elif op == OP_PREFIX:
        lines.append(f"    if not {var}.startswith({v!r}): return False")
    elif op == OP_SUFFIX:
        lines.append(f"    if not {var}.endswith({v!r}): return False")
    elif op == OP_CONTAINS:
        lines.append(f"    if {v!r} not in {var}: return False")
    elif op == OP_INCLUDES:
        if not v:
            return None  # token_includes(_, b"") is always False
        lines.append(
            f"    if {v!r} not in {var} or {v!r} not in _WS_SPLIT({var}): return False"
        )
    elif op == OP_DASH:
        # raw == v or raw.startswith(v + b"-")  (ref: matcher.zig:356-364)
        lines.append(
            f"    if {var} != {v!r} and not {var}.startswith({v + b'-'!r}): return False"
        )
    else:
        return None
    return lines


def _attr_holds_expr(var: str, sel: AttrSelector) -> "str | None":
    """Boolean expression that is True when the attr op HOLDS (for :not
    negation); assumes ``var`` may be None. ``None`` marks never-holds."""
    v = sel.value
    op = sel.op
    if op == OP_EXISTS:
        return f"{var} is not None"
    base = f"{var} is not None"
    if op == OP_EQ:
        return f"{var} == {v!r}"
    if op == OP_PREFIX:
        return f"({base} and {var}.startswith({v!r}))"
    if op == OP_SUFFIX:
        return f"({base} and {var}.endswith({v!r}))"
    if op == OP_CONTAINS:
        return f"({base} and {v!r} in {var})"
    if op == OP_INCLUDES:
        if not v:
            return None
        return f"({base} and {v!r} in {var} and {v!r} in _WS_SPLIT({var}))"
    if op == OP_DASH:
        return f"({base} and ({var} == {v!r} or {var}.startswith({v + b'-'!r})))"
    return None


def build_predicate(comp: Compound, skip_kind_tag: bool = False):
    """exec-compile ``comp`` into ``pred(doc, index) -> bool`` matching
    ``matcher.matches_compound`` exactly, or ``None`` when the compound needs
    the interpreted path (pseudo-classes). ``skip_kind_tag`` omits the
    kind/tag guards — ONLY sound when every candidate index comes from the
    per-tag accel index (which contains exactly the elements of that tag)."""
    if comp.pseudos:
        return None

    lines = ["def _pred(doc, index):"]
    if not skip_kind_tag:
        lines.append("    if doc.kind[index] != _ELEMENT: return False")
        if comp.tag is not None:
            lines.append(f"    if doc.name[index] != {comp.tag!r}: return False")

    needs_attrs = bool(
        comp.id is not None
        or comp.classes
        or comp.attrs
        or any(n.kind != "tag" for n in comp.nots)
    )
    if needs_attrs:
        lines.append("    _attrs = doc.attrs(index)")
        lines.append("    _get = _attrs.get")
    if comp.id is not None:
        lines.append(f"    if _get(b'id') != {comp.id!r}: return False")
    if comp.classes:
        lines.append("    _cls = _get(b'class')")
        lines.append("    if _cls is None: return False")
        # substring prefilter at C speed, then exact token membership
        for want in comp.classes:
            lines.append(f"    if {want!r} not in _cls: return False")
        lines.append("    _toks = _WS_SPLIT(_cls)")
        for want in comp.classes:
            lines.append(f"    if {want!r} not in _toks: return False")
    for i, a in enumerate(comp.attrs):
        var = f"_v{i}"
        lines.append(f"    {var} = _get({a.name!r})")
        test = _attr_test(var, a)
        if test is None:
            return _always_false
        lines.extend(test)
    for j, item in enumerate(comp.nots):
        k = item.kind
        if k == "tag":
            lines.append(f"    if doc.name[index] == {item.text!r}: return False")
        elif k == "id":
            lines.append(f"    if _get(b'id') == {item.text!r}: return False")
        elif k == "class":
            if not item.text:
                continue  # token_includes with empty token never matches
            var = f"_nc{j}"
            lines.append(f"    {var} = _get(b'class')")
            lines.append(
                f"    if {var} is not None and {item.text!r} in {var} "
                f"and {item.text!r} in _WS_SPLIT({var}): return False"
            )
        else:
            var = f"_na{j}"
            lines.append(f"    {var} = _get({item.attr.name!r})")
            holds = _attr_holds_expr(var, item.attr)
            if holds is None:
                continue  # never matches -> :not never rejects
            lines.append(f"    if {holds}: return False")
    lines.append("    return True")

    from html_parser_ray.html.tables import RE_WS_RUN
    from html_parser_ray.html.tokenizer import KIND_ELEMENT

    ns = {"_ELEMENT": KIND_ELEMENT, "_WS_SPLIT": RE_WS_RUN.split}
    exec("\n".join(lines), ns)  # noqa: S102 - compile-time codegen, no user input
    return ns["_pred"]


def _always_false(doc, index):  # a compound containing a never-true predicate
    return False


def attach_predicates(selector) -> None:
    """Attach generated predicates to every compound of a compiled selector
    (frozen dataclasses: set via object.__setattr__; ``None`` = interpreted)."""
    for group in selector.groups:
        for comp in group:
            object.__setattr__(comp, "_pred", build_predicate(comp))
    # Fast plan for the cached-query hot shape (single group, single tagged
    # compound, codegen'd predicate, no id accel subtleties): Document
    # .query_one runs ``for idx in tag_index(tag): if pred(doc, idx)``
    # directly, skipping three interpreter frames per call. Semantics equal
    # the matcher's tag-accel branch by construction (tag_index is preorder);
    # parity pinned in tests/test_selector_codegen.py.
    fast = None
    if len(selector.groups) == 1 and len(selector.groups[0]) == 1:
        comp = selector.groups[0][0]
        pred = getattr(comp, "_pred", None)
        from html_parser_ray.selector.ast import NONE as _COMB_NONE

        if (
            comp.tag is not None
            and comp.id is None
            and pred is not None
            and comp.combinator == _COMB_NONE
        ):
            fast = (comp.tag, build_predicate(comp, skip_kind_tag=True))
    object.__setattr__(selector, "_fast_single", fast)
