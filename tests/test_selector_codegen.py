"""Generated-predicate parity: the exec-compiled compound predicates
(selector/codegen.py) must agree with the interpreted matcher on EVERY node
of every doc for selectors covering each predicate kind. ``compile_selector``
attaches predicates; parsing via ``_Parser`` directly yields the interpreted
form, so both engines run the same AST."""

from __future__ import annotations

from html_parser_ray import compile_selector, parse_html
from html_parser_ray.selector.compiler import _Parser
from html_parser_ray.selector.matcher import matches_selector_at, query_all

SELECTORS = [
    "a",
    "#a1",
    ".nav",
    "a.nav.button",
    "a[href]",
    "a[href=https://example/1]",
    "a[href^=https]",
    "a[href$=/3]",
    "a[href*=loc]",
    "a[class~=nav]",
    "a[lang|=en]",
    "a[lang|=en-US]",
    "a:not(.missing)",
    "a:not(.nav)",
    "a:not([href^=https])",
    "a:not(b)",
    "a:not(#a1)",
    "a[href^=https][class*=button]:not(.missing)",
    "div a",
    "div > a",
    "a + a",
    "a ~ a",
    "li:first-child",
    "li:last-child",
    "li:nth-child(2n+1)",
    "ul > li.item:not(.skip)",
]

DOCS = [
    # attr-heavy page (the honesty-table fixture)
    "<html><body><div id='root'>"
    + "".join(
        f"<a id='a{i}' href='https://example/{i}' class='nav button' lang='en-US'>x</a>"
        if i % 4 == 0
        else f"<a id='a{i}' href='/local/{i}' class='nav link' lang='en'>x</a>"
        for i in range(24)
    )
    + "</div></body></html>",
    # structure-heavy page
    "<html><body><ul><li class='item'>1<li class='item skip'>2"
    "<li class='item'>3</ul><div><div><a class=''>deep</a></div></div>"
    "<a href>empty</a><a class=' nav  button '>ws-classes</a></body></html>",
    # edge attr values: entities, empty, dashes
    "<html><body><a href='a&amp;b' class='x-y' lang='en'>e</a>"
    "<a href='' class='button-like'>f</a><a id='a1'>g</a></body></html>",
]


def test_codegen_parity_query_all_and_per_node():
    for html in DOCS:
        doc = parse_html(html)
        for s in SELECTORS:
            fast = compile_selector(s)
            interp = _Parser(s).parse()  # no predicates attached
            assert query_all(doc, fast) == query_all(doc, interp), (s, html[:60])
            for i in range(1, len(doc.kind)):
                assert matches_selector_at(doc, fast, i) == matches_selector_at(
                    doc, interp, i
                ), (s, i)


def test_codegen_attaches_only_outside_pseudos():
    sel = compile_selector("li:nth-child(2n+1)")
    assert getattr(sel.groups[0][-1], "_pred") is None  # interpreted fallback
    sel = compile_selector("a[href^=https]")
    assert getattr(sel.groups[0][-1], "_pred") is not None


def test_codegen_never_true_includes():
    # [class~=""] can never hold; :not of it never rejects
    doc = parse_html("<html><body><a class='x'>t</a></body></html>")
    assert query_all(doc, compile_selector('a[class~=""]')) == []
    interp = _Parser('a[class~=""]').parse()
    assert query_all(doc, interp) == []


def test_fast_single_query_one_parity():
    """Document.query_one's fast single-compound plan (tag candidates +
    skip_kind_tag predicate) must return exactly what the matcher's
    query_one returns, for every selector on every fixture doc — including
    tag-less / grouped / pseudo selectors that must NOT take the fast path,
    and no-match selectors that must return None."""
    from html_parser_ray.selector.matcher import query_one as matcher_query_one

    extra = ["b", "b.x", "a.button-like", "a[href='']", "em:not(.x)"]
    for html in DOCS:
        doc = parse_html(html)
        for s in SELECTORS + extra:
            sel = compile_selector(s)
            assert doc.query_one(s) == matcher_query_one(doc, sel, None), s


def test_fast_single_plan_gating():
    """The fast plan exists exactly for single-group single-compound tagged
    pseudo-free selectors without an id."""
    assert compile_selector("a[href^=https]")._fast_single is not None
    assert compile_selector("a.nav:not(.x)")._fast_single is not None
    # gated off: grouped, combinator, tag-less, pseudo, id
    assert compile_selector("a, b")._fast_single is None
    assert compile_selector("div a")._fast_single is None
    assert compile_selector(".nav")._fast_single is None
    assert compile_selector("a:first-child")._fast_single is None
    assert compile_selector("a#x")._fast_single is None
