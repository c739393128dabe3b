"""Tokenizer / tree-builder parity tests.

Every case is ported from a reference test with the expectation pinned there
(citations inline); the reference's own test suite is the oracle.
"""

from __future__ import annotations

import pytest

from html_parser_ray import parse_html
from html_parser_ray.html.tokenizer import KIND_ELEMENT, KIND_TEXT


def tags_preorder(doc):
    return [doc.name[i].decode() for i in range(len(doc.kind)) if doc.kind[i] == KIND_ELEMENT]


def test_basic_parse_and_structure():
    # ref: src/html/document.zig:907-922
    doc = parse_html(
        "<html><head><title>A</title></head><body>"
        "<div id='x' class='a b'>ok</div><p>n</p></body></html>"
    )
    one = doc.query_one("div#x")
    assert one is not None and doc.tag_name(one) == "div"
    assert len(doc.query_all("body > *")) == 2


def test_tag_name_keeps_lt_in_malformed_start_tag():
    # ref: src/root.zig:72-85 — "<div<div>" keeps '<' in the tag name
    doc = parse_html("<div<div>")
    assert doc.name[1] == b"div<div"


def test_whitespace_after_lt_before_name():
    # parser skips whitespace between '<' and the name (ref: src/html/parser.zig:136-137)
    doc = parse_html("<  div id='x'>ok</div>")
    assert doc.query_one("div#x") is not None


def test_trailing_lone_lt_consumed():
    # ref: src/html/parser.zig:52-56
    doc = parse_html("abc<")
    texts = [i for i in range(len(doc.kind)) if doc.kind[i] == KIND_TEXT]
    assert len(texts) == 1
    t = texts[0]
    assert doc.source[doc.name_start[t] : doc.name_end[t]] == b"abc"


def test_comments_doctype_pi_skipped():
    # ref: src/html/parser.zig:424-470
    doc = parse_html(
        "<!doctype html><!-- a comment --><?php echo ?><!-->x<div id='d'></div>"
    )
    assert doc.query_one("#d") is not None
    # "<!-->" short form consumed, following "x" is text
    texts = [
        doc.source[doc.name_start[i] : doc.name_end[i]]
        for i in range(len(doc.kind))
        if doc.kind[i] == KIND_TEXT
    ]
    assert b"x" in texts


def test_unterminated_comment_runs_to_eof():
    doc = parse_html("<div id='a'></div><!-- never closed <p id='x'>")
    assert doc.query_one("#a") is not None
    assert doc.query_one("#x") is None


def test_malformed_nesting_permissive():
    # ref: tools/tests/behavioral_tests.zig:115-125
    doc = parse_html("<div id='a'><span id='b'></div><p id='c'>tail")
    assert doc.query_one("#a") is not None
    assert doc.query_one("#b") is not None
    assert doc.query_one("#c") is not None


def test_unmatched_close_ignored():
    # ref: src/html/parser.zig:341-364 — "</x>" with no open x is a no-op
    doc = parse_html("<div id='a'></span></div><p id='b'></p>")
    assert doc.query_one("#a") is not None
    assert doc.query_one("#b") is not None
    # p is a sibling of div, not a child
    assert doc.parent[doc.query_one("#b")] == 0


def test_close_tag_pops_through_stack():
    # "</div>" closes span implicitly (stack scan, ref: src/html/parser.zig:341-361)
    doc = parse_html("<div id='a'><span id='b'><em id='c'></div><p id='d'>")
    d = doc.query_one("#d")
    assert doc.parent[d] == 0


def test_void_tags_self_close():
    doc = parse_html("<div><br id='b'><img id='i' src='x'><span id='s'></span></div>")
    b = doc.query_one("#b")
    assert doc.subtree_end[b] == b
    s = doc.query_one("#s")
    assert doc.parent[s] == doc.query_one("div")


def test_explicit_self_close_on_non_void_stays_open():
    # only void and svg honor '/>' (ref: src/html/parser.zig:191, 197)
    doc = parse_html("<div id='a'/><p id='b'></p>")
    bidx = doc.query_one("#b")
    assert doc.parent[bidx] == doc.query_one("#a")


def test_rawtext_script_with_embedded_lt():
    # ref: src/html/document.zig:1377-1388
    doc = parse_html(
        '<script>if (a < b) { x = "<tag>"; }</ScRiPt   ><div id=\'after\'></div>'
    )
    s = doc.query_one("script")
    a = doc.query_one("div#after")
    assert s is not None and a is not None and doc.subtree_end[s] < a
    t = s + 1
    assert doc.kind[t] == KIND_TEXT
    assert (
        doc.source[doc.name_start[t] : doc.name_end[t]]
        == b'if (a < b) { x = "<tag>"; }'
    )


def test_rawtext_unterminated_to_eof():
    # ref: src/html/document.zig:1390-1401
    doc = parse_html("<script>const a = 1; <div>still script")
    s = doc.query_one("script")
    assert doc.subtree_end[s] == len(doc.kind) - 1
    assert doc.query_one("div") is None


def test_rawtext_title_textarea_style():
    for tag in ("style", "title", "textarea"):
        doc = parse_html(f"<{tag}>a <b> c</{tag}><p id='p'></p>")
        el = doc.query_one(tag)
        assert doc.inner_text(el, normalize=False) == "a <b> c"
        assert doc.query_one("#p") is not None
        assert doc.query_one("b") is None


def test_script_content_is_single_text_child():
    # ref: src/html/document.zig:958-975
    doc = parse_html("<script>const x = 1;</script><div>ok</div>")
    s = doc.query_one("script")
    assert doc.subtree_end[s] > s
    t = s + 1
    assert doc.kind[t] == KIND_TEXT
    assert doc.source[doc.name_start[t] : doc.name_end[t]] == b"const x = 1;"
    assert doc.query_one("div") > doc.subtree_end[s]


def test_plaintext_swallows_rest():
    # ref: src/html/parser.zig:244-257
    doc = parse_html("<plaintext><div id='x'>all raw</div>")
    p = doc.query_one("plaintext")
    assert doc.query_one("#x") is None
    assert doc.inner_text(p, normalize=False) == "<div id='x'>all raw</div>"


def test_svg_skipped_with_nested_and_text_child():
    # ref: src/html/document.zig:1403-1424
    doc = parse_html(
        "<div id='before'></div><svg id='s'><g><svg id='inner'>"
        "<rect id='r'/></svg><circle id='c'/></g></svg><div id='after'></div>"
    )
    svg = doc.query_one("svg")
    assert (
        doc.inner_text(svg, normalize=False)
        == "<g><svg id='inner'><rect id='r'/></svg><circle id='c'/></g>"
    )
    assert len(doc.query_all("svg")) == 1
    assert doc.query_one("#before") is not None
    assert doc.query_one("#after") is not None
    for missing in ("#inner", "#r", "#c"):
        assert doc.query_one(missing) is None


def test_svg_quoted_attr_bait():
    # ref: src/html/document.zig:1426-1438
    doc = parse_html(
        "<div id='x' data-k=\"prefix <svg attr='x'> suffix\"></div><p id='after'></p>"
    )
    x = doc.query_one("#x")
    assert doc.get_attr(x, b"data-k") == b"prefix <svg attr='x'> suffix"
    assert doc.query_one("#after") is not None


def test_svg_self_closing_no_text_child():
    # ref: src/html/document.zig:1440-1455
    doc = parse_html(
        "<div id='before'></div><svg id='s' viewBox='0 0 1 1' /><div id='after'></div>"
    )
    svg = doc.query_one("svg")
    assert doc.inner_text(svg, normalize=False) == ""
    assert doc.first_element_child(svg) is None
    assert doc.query_one("#before") is not None
    assert doc.query_one("#after") is not None


def test_svg_unterminated():
    doc = parse_html("<svg><g><path></g>")
    svg = doc.query_one("svg")
    assert doc.subtree_end[svg] == len(doc.kind) - 1
    assert doc.inner_text(svg, normalize=False) == "<g><path></g>"


def test_optional_close_matrix():
    # ref: src/html/document.zig:1457-1477
    doc = parse_html(
        "<html><head><title>x</title><body>"
        "<p id='p1'>a<div id='d1'></div>"
        "<ul><li id='li1'>x<li id='li2'>y</ul>"
        "<dl><dt id='dt1'>a<dd id='dd1'>b<dt id='dt2'>c</dl>"
        "<table><tr><td id='td1'>1<th id='th1'>2<td id='td2'>3</tr></table>"
        "</body></html>"
    )
    for sel in (
        "#p1 + #d1",
        "#li1 + #li2",
        "#dt1 + #dd1",
        "#dd1 + #dt2",
        "#td1 + #th1",
        "#th1 + #td2",
        "head + body",
    ):
        assert doc.query_one(sel) is not None, sel


def test_option_implicit_close():
    doc = parse_html("<select><option id='o1'>a<option id='o2'>b</select>")
    assert doc.query_one("#o1 + #o2") is not None


def test_drop_whitespace_text_nodes():
    # ref: src/html/parser.zig:115-133 + src/root.zig writeHtml drop test
    keep = parse_html("<div> a <span> b </span> c </div>")
    drop = parse_html("<div>  <span> b </span>  </div>", drop_whitespace_text=True)
    keep_texts = sum(1 for k in keep.kind if k == KIND_TEXT)
    drop_texts = sum(1 for k in drop.kind if k == KIND_TEXT)
    assert keep_texts == 3
    assert drop_texts == 1  # only " b " survives


def test_mixed_case_tags_queryable_lowercase():
    # ref: src/html/document.zig:1496-1509
    doc = parse_html("<DiV ID='x' ClAsS='A b' DaTa-K='v'><SpAn id='y'></SpAn></DiV>")
    assert doc.query_one("div#x[data-k=v]") is not None
    assert doc.query_one("div > span#y") is not None
    div = doc.query_one("div#x")
    assert doc.get_attr(div, b"class") == b"A b"


def test_preorder_node_ids():
    # ref: tools/tests/behavioral_tests.zig:70-92
    doc = parse_html(
        "<div id='a'><section id='b'><span id='c'></span></section><p id='d'></p></div>"
    )
    got = [(doc.get_attr(i, b"id") or b"").decode() for i in doc.query_all("*[id]")]
    assert got == ["a", "b", "c", "d"]


def test_html_head_body_helpers():
    # ref: tools/tests/behavioral_tests.zig:6-22
    doc = parse_html(
        "<!doctype html><html><head><title>x</title></head>"
        "<body><h1 id='t'>T</h1></body></html>"
    )
    assert doc.html() is not None
    assert doc.head() is not None
    assert doc.body() is not None
    frag = parse_html("<section id='frag'><p>ok</p></section>")
    assert frag.html() is None
    assert frag.head() is None
    assert frag.body() is None


def test_element_navigation_skips_text():
    # ref: tools/tests/behavioral_tests.zig:96-113
    doc = parse_html(
        "<div id='r'>hello<span id='s1'></span>world<b id='b1'></b><i id='i1'></i></div>"
    )
    root = doc.query_one("div#r")
    first = doc.first_element_child(root)
    assert doc.get_attr(first, b"id") == b"s1"
    nxt = doc.next_element_sibling(first)
    assert doc.get_attr(nxt, b"id") == b"b1"
    kids = list(doc.children(root))
    assert [doc.get_attr(k, b"id").decode() for k in kids] == ["s1", "b1", "i1"]


def test_empty_and_edge_inputs():
    for s in ("", "<", ">", "<>", "</>", "<!", "<!-", "<!--", "a"):
        doc = parse_html(s)
        assert doc.subtree_end[0] == len(doc.kind) - 1
