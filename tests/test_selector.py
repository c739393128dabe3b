"""Selector compiler + matcher parity tests (fixture matrices, rejection list,
scoped queries, nth-child variants, qwery doc/frag conformance cases)."""

from __future__ import annotations

import pytest

from html_parser_ray import InvalidSelectorError, compile_selector, parse_html
from tests.conftest import SELECTOR_FIXTURE_HTML, ids_of

# ref: src/html/document.zig:977-1053 — identical for comptime/runtime/cached
MATRIX = [
    ("li", ["li1", "li2", "li3"]),
    ("#li2", ["li2"]),
    (".item", ["li1", "li2", "li3"]),
    ("li, .item", ["li1", "li2", "li3"]),
    ("[data-k]", ["li1", "li2", "li3"]),
    ("[data-k=v]", ["li1"]),
    ("[data-prefix^=pre]", ["li1", "li2"]),
    ("[data-suffix$=end]", ["li1", "li2"]),
    ("[data-sub*=middle]", ["li1", "li2"]),
    ("[data-words~=beta]", ["li1", "li2"]),
    ("[lang|=en]", ["li1", "li2"]),
    ("ul > li", ["li1", "li2", "li3"]),
    ("ul li > span.name", ["name1", "name2", "name3"]),
    ("li + li", ["li2", "li3"]),
    ("li ~ li", ["li2", "li3"]),
    ("a.link + span.marker", ["after_a2"]),
    ("a.hot ~ a.link", ["a3"]),
    ("li:first-child", ["li1"]),
    ("li:last-child", ["li3"]),
    ("li:nth-child(2)", ["li2"]),
    ("li:nth-child(2n+1)", ["li1", "li3"]),
    ("li:not(.skip)", ["li1", "li2"]),
    ("li:not([data-k=x])", ["li1", "li2"]),
    ("li#li1, li#li3", ["li1", "li3"]),
    (".does-not-exist", []),
    # bench query cases (ref: tools/scripts.zig:140-143)
    ("a[href^=https][class*=button]:not(.missing)", []),
    ("a[href^=https][class*=nav]:not(.missing)", []),
]


@pytest.mark.parametrize("sel,expected", MATRIX)
def test_query_matrix(fixture_doc, sel, expected):
    got = ids_of(fixture_doc, fixture_doc.query_all(sel))
    assert got == expected
    # query_one == first of query_all (min index across groups,
    # ref: src/selector/matcher.zig:23-31)
    one = fixture_doc.query_one(sel)
    if expected:
        assert ids_of(fixture_doc, [one]) == [expected[0]]
    else:
        assert one is None


# ref: src/selector/runtime.zig:595-623
INVALID_SELECTORS = [
    "",
    ",",
    "div >",
    "div +",
    "div ~",
    "div,",
    "#a#b",
    "div:not()",
    "div:not(.a,.b)",
    "div:nth-child()",
    "div:nth-child(2n+)",
    "div:unknown",
    "[attr",
    "div[attr^]",
]


@pytest.mark.parametrize("sel", INVALID_SELECTORS)
def test_invalid_selectors_rejected(sel):
    with pytest.raises(InvalidSelectorError):
        compile_selector(sel)


# ref: src/selector/runtime.zig:578-593
VALID_NTH = [
    ":nth-child(odd)",
    ":nth-child(even)",
    ":nth-child(3n+1)",
    ":nth-child(+3n-2)",
    ":nth-child(-n+6)",
    ":nth-child(-n+5)",
    ":nth-child(2)",
]


@pytest.mark.parametrize("sel", VALID_NTH)
def test_valid_nth_variants_compile(sel):
    compile_selector(sel)


def test_attr_operator_coverage_compiles():
    # ref: src/selector/runtime.zig:525-542
    sel = compile_selector("div[a][b=v][c^=x][d$=y][e*=z][f~=m][g|=en]")
    comp = sel.groups[0][0]
    assert len(comp.attrs) == 7
    ops = [a.op for a in comp.attrs]
    assert ops == [0, 1, 2, 3, 4, 5, 6]


def test_combinator_chain_and_grouping_compiles():
    # ref: src/selector/runtime.zig:544-558
    sel = compile_selector("a b > c + d ~ e, #x")
    assert len(sel.groups) == 2
    combs = [c.combinator for c in sel.groups[0]]
    assert combs == [0, 1, 2, 3, 4]


def test_nth_child_counts():
    # ref: src/html/document.zig:1567-1606
    doc = parse_html(
        "<div id='pseudos'><div></div><div></div><div></div><div></div>"
        "<a></a><div></div><div></div></div>"
    )
    scope = None
    assert len(doc.query_all("#pseudos :nth-child(odd)")) == 4
    assert len(doc.query_all("#pseudos :nth-child(3n+1)")) == 3
    assert len(doc.query_all("#pseudos :nth-child(+3n-2)")) == 3
    assert len(doc.query_all("#pseudos :nth-child(-n+6)")) == 6
    assert len(doc.query_all("#pseudos :nth-child(-n+5)")) == 5


def test_scoped_queries_complete_descendants(fixture_doc):
    # ref: src/html/document.zig:1055-1081
    doc = fixture_doc
    lst = doc.query_one("#list")
    assert ids_of(doc, doc.query_all("li", scope_root=lst)) == ["li1", "li2", "li3"]
    assert ids_of(doc, doc.query_all("span.name", scope_root=lst)) == [
        "name1",
        "name2",
        "name3",
    ]
    assert ids_of(doc, doc.query_all("li:not(.skip)", scope_root=lst)) == ["li1", "li2"]
    sibs = doc.query_one("#sibs")
    assert ids_of(doc, doc.query_all("a.link", scope_root=sibs)) == ["a1", "a2", "a3"]
    assert ids_of(doc, doc.query_all("a + span.marker", scope_root=sibs)) == ["after_a2"]
    assert doc.query_all("li", scope_root=sibs) == []
    assert ids_of(doc, [doc.query_one("a.link", scope_root=sibs)]) == ["a1"]


def test_scoped_id_fallback_on_duplicate_ids():
    # ref: src/html/document.zig:1541-1555
    doc = parse_html(
        "<div id='outside'><span id='dup' class='x'></span></div>"
        "<div id='scope'><span id='dup' class='y'></span></div>"
    )
    scope = doc.query_one("#scope")
    found = doc.query_one("#dup.y", scope_root=scope)
    assert found is not None
    assert doc.get_attr(doc.parent[found], b"id") == b"scope"


def test_duplicate_id_unscoped_first_match_semantics():
    # first element with the id fails the class predicate; scan must find the
    # second (ref: src/selector/matcher.zig:186-198)
    doc = parse_html(
        "<i id='dup' class='x'></i><i id='dup' class='y'></i>"
    )
    found = doc.query_one("#dup.y")
    assert found is not None
    assert doc.get_attr(found, b"class") == b"y"


def test_leading_combinator_scoped():
    # ref: src/html/document.zig:1608-1639 (qwery doc/frag shapes)
    frag = parse_html(
        "<root><div class='d i v'><p id='oooo'><em></em><em id='emem'></em></p></div>"
        "<p id='sep'><div class='a'><span></span></div></p></root>"
    )
    root = frag.query_one("root")
    assert len(frag.query_all("> div p em", scope_root=root)) == 2
    assert len(frag.query_all("> div #oooo", scope_root=root)) == 1

    docctx = parse_html(
        "<root><div id='hsoob'><div class='a b'><div class='d e sib' id='booshTest'>"
        "<p><span id='spanny'></span></p></div><em class='sib'></em>"
        "<span class='h i a sib'></span></div><p class='odd'></p></div>"
        "<div id='lonelyHsoob'></div></root>"
    )
    ctx_root = docctx.query_one("root")
    assert len(docctx.query_all("> #hsoob", scope_root=ctx_root)) == 1


def test_multiple_classes_one_compound():
    # ref: src/html/document.zig:1511-1522
    doc = parse_html(
        "<div id='x' class='alpha beta gamma'></div><div id='y' class='alpha beta'></div>"
    )
    assert ids_of(doc, doc.query_all("div.alpha.beta.gamma")) == ["x"]
    assert doc.query_all("div.alpha.beta.delta") == []


def test_class_separators_all_ws_chars():
    # ref: src/html/document.zig:1524-1539
    doc = parse_html("<div id='t' class='a\tb\nc\rd\x0ce'></div>")
    for cls in "abcde":
        assert doc.query_one(f"#t.{cls}") is not None
    assert doc.query_one("#t[class~=d]") is not None
    assert doc.query_one("#t[class~=e]") is not None


def test_universal_and_ancestry():
    # ref: tools/tests/behavioral_tests.zig:48-58
    doc = parse_html("<div id='a'><span id='b'><em id='c'></em></span></div>")
    assert doc.query_one("#a #c") is not None
    assert doc.parent[doc.query_one("#c")] == doc.query_one("#b")


def test_case_insensitive_pseudo_names():
    doc = parse_html("<ul><li id='x'></li><li id='y'></li></ul>")
    assert ids_of(doc, doc.query_all("li:FIRST-CHILD")) == ["x"]


def test_not_tag_and_not_id():
    doc = parse_html("<div id='a'></div><span id='b'></span>")
    assert ids_of(doc, doc.query_all("*:not(div)")) == ["b"]
    assert ids_of(doc, doc.query_all("*:not(#a)")) == ["b"]


def test_pathological_compound_depth_no_recursion_limit():
    # ref spills match frames to the heap (matcher.zig:62-77); the iterative
    # port must survive thousand-compound chains that would blow Python's
    # recursion limit in a recursive formulation
    n = 2500
    sel = compile_selector(" > ".join(["div"] * n))
    doc = parse_html("<div>" * n + "x" + "</div>" * n)
    from html_parser_ray.selector.matcher import query_all as qa

    assert len(qa(doc, sel)) == 1


def test_query_all_accel_equals_brute_force():
    """Tag/class candidate enumeration must equal the per-node brute force
    on a corpus exercising duplicate classes, multi-token class attrs,
    entity-encoded attrs, scoped queries, and grouped selectors."""
    from html_parser_ray.html.document import parse_html

    html = (
        b"<html><head></head><body>"
        b'<div id="root" class="wrap outer">'
        b'<a class="button link">1</a>'
        b'<a class="  button\tlink  ">2</a>'  # odd whitespace tokens
        b'<a class="buttonish">3</a>'          # substring, not a token
        b'<span class="button">4</span>'
        b'<p class="a&amp;b">amp</p>'          # entity-decoded class value
        b"<ul><li class=wrap>unquoted</li><li>plain</li></ul>"
        b"</div>"
        b'<div class="wrap">outside scope</div>'
        b"</body></html>"
    )
    doc = parse_html(html)
    n = len(doc.kind)
    selectors = [
        ".button", ".wrap", ".button.link", "a.button", "span.button, .wrap",
        ".a\\&b" if False else ".buttonish",  # keep grammar-simple cases
        "div .button", ".wrap > a", "ul li.wrap", "*",
    ]
    for sel in selectors:
        got = doc.query_all(sel)
        brute = [i for i in range(1, n) if doc.matches(i, sel)]
        assert got == brute, sel
        assert doc.query_one(sel) == (brute[0] if brute else None), sel
    # scoped: accel candidates must respect the scope window
    root = doc.query_one("#root")
    for sel in [".wrap", ".button", "a.link, li.wrap"]:
        got = doc.query_all(sel, scope_root=root)
        brute = [
            i
            for i in range(root + 1, doc.subtree_end[root] + 1)
            if doc.matches(i, sel, scope_root=root)
        ]
        assert got == brute, ("scoped", sel)
