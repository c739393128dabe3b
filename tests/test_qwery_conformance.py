"""Qwery contextual-selector conformance (scope-root `root` tag).

Cases and fixtures vendored from the reference repo
(ref: bench/conformance_cases/qwery_cases.json, qwery_doc.html,
qwery_frag.html; runner semantics tools/scripts.zig:1712-1770 — scoped count
with scope root = first `<root>` element). Only the doc/frag contexts vendor
cleanly (the "document" context uses an external css-select fixture the
conformance runner downloads; not available offline).
"""

from __future__ import annotations

import pytest

from html_parser_ray import parse_html

QWERY_DOC_HTML = (
    '<root><div id="hsoob"><div class="a b"><div class="d e sib" test="fg" '
    'id="booshTest"><p><span id="spanny"></span></p></div><em nopass="copyrighters" '
    'rel="copyright booshrs" test="f g" class="sib"></em><span class="h i a sib">'
    '</span></div><p class="odd"></p></div><div id="lonelyHsoob"></div></root>'
)

QWERY_FRAG_HTML = (
    '<root><div class="d i v"><p id="oooo"><em></em><em id="emem"></em></p></div>'
    '<p id="sep"><div class="a"><span></span></div></p></root>'
)

CASES = [
    (".a span", "frag", 1),
    ("> div p em", "frag", 2),
    ("#emem", "frag", 1),
    (".d.i #emem", "frag", 1),
    (".d #oooo #emem", "frag", 1),
    ("> div #oooo", "frag", 1),
    ("#hsoob .a", "doc", 2),
    ("#hsoob div", "doc", 2),
    ("p.odd", "doc", 1),
    (".d ~ .sib", "doc", 2),
    (".a .d + .sib", "doc", 1),
    ("#hsoob > div > .h", "doc", 1),
    ("#hsoob #spanny", "doc", 1),
    (".a #spanny", "doc", 1),
    (".a #booshTest #spanny", "doc", 1),
    ("> #hsoob", "doc", 1),
]


@pytest.fixture(scope="module")
def docs():
    return {
        "doc": parse_html(QWERY_DOC_HTML),
        "frag": parse_html(QWERY_FRAG_HTML),
    }


@pytest.mark.parametrize("selector,context,expected", CASES)
def test_qwery_contextual(docs, selector, context, expected):
    doc = docs[context]
    root = doc.find_first_tag(b"root")
    assert root is not None
    got = len(doc.query_all(selector, scope_root=root))
    assert got == expected, f"{context} {selector}: got {got} want {expected}"


@pytest.mark.parametrize("mode", [False, True])
@pytest.mark.parametrize("selector,context,expected", CASES)
def test_qwery_contextual_both_profiles(mode, selector, context, expected):
    # strictest & fastest profiles give equal results (ref: README.md:35-38)
    html = QWERY_DOC_HTML if context == "doc" else QWERY_FRAG_HTML
    doc = parse_html(html, drop_whitespace_text=mode)
    root = doc.find_first_tag(b"root")
    got = len(doc.query_all(selector, scope_root=root))
    assert got == expected
