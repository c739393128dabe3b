"""Additional reference-parity edge cases (quirks pinned by the reference's
scanner/parser/entity code paths)."""

from __future__ import annotations

from html_parser_ray import parse_html
from html_parser_ray.html import entities
from html_parser_ray.html.tokenizer import KIND_TEXT


def test_rawtext_close_with_attrs_does_not_close():
    # ref: src/html/parser.zig:512-516 — after the name only ws then '>' closes
    doc = parse_html("<script>x</script foo></script><p id='p'></p>")
    s = doc.query_one("script")
    t = s + 1
    assert doc.source[doc.name_start[t] : doc.name_end[t]] == b"x</script foo>"
    assert doc.query_one("#p") is not None


def test_rawtext_close_case_and_whitespace():
    doc = parse_html("<TEXTAREA>a<b</TeXtArEa\t\n  ><i id='i'></i>")
    ta = doc.query_one("textarea")
    assert doc.inner_text(ta, normalize=False) == "a<b"
    assert doc.query_one("#i") is not None


def test_svg_with_comment_and_pi_inside():
    # ref: src/html/scanner.zig:73-92 — comments/PIs inside svg are skipped
    doc = parse_html(
        "<svg><!-- <svg> bait --><?pi <svg> ?><g></g></svg><p id='after'></p>"
    )
    assert doc.query_one("#after") is not None
    assert len(doc.query_all("svg")) == 1


def test_svg_closing_with_whitespace():
    doc = parse_html("<svg><g></g></ svg ><p id='after'></p>")
    assert doc.query_one("#after") is not None


def test_entities_no_double_decode():
    # single pass: "&amp;amp;" -> "&amp;" (never "&")
    assert entities.decode(b"&amp;amp;") == b"&amp;"
    doc = parse_html("<p id='x'>&amp;amp;</p>")
    assert doc.inner_text(doc.query_one("#x")) == "&amp;"


def test_entity_inside_rawtext_not_decoded_until_inner_text():
    doc = parse_html("<script>&amp;</script>")
    s = doc.query_one("script")
    t = s + 1
    # raw span keeps the entity; innerText decodes (same as ref lazy decode)
    assert doc.source[doc.name_start[t] : doc.name_end[t]] == b"&amp;"
    assert doc.inner_text(s) == "&"


def test_inner_text_on_text_node_directly():
    doc = parse_html("<p>  a&amp;b  </p>")
    p = doc.query_one("p")
    t = p + 1
    assert doc.kind[t] == KIND_TEXT
    assert doc.inner_text(t) == "a&b"
    assert doc.inner_text(t, normalize=False) == "  a&b  "


def test_attr_eq_then_gt():
    # "a=>" -> empty value (ref: attr_inline.zig:313-314)
    doc = parse_html("<div id='x' a=></div>")
    assert doc.get_attr(doc.query_one("#x"), b"a") == b""


def test_attr_eq_then_slash():
    doc = parse_html("<div id='x' a=/></div>")
    assert doc.get_attr(doc.query_one("#x"), b"a") == b""


def test_duplicate_id_index_first_occurrence():
    doc = parse_html("<i id='d'></i><b id='d'></b>")
    assert doc.id_index()[b"d"] == doc.query_one("#d")
    assert doc.name[doc.query_one("#d")] == b"i"


def test_empty_id_not_indexed():
    # ref: src/html/document.zig:582 — zero-length ids are skipped
    doc = parse_html("<i id=''></i><b id='x'></b>")
    assert b"" not in doc.id_index()
    assert doc.query_one("#x") is not None


def test_tag_index_matches_scan():
    doc = parse_html("<div><p id='1'></p><span><p id='2'></p></span></div>")
    from html_parser_ray.html.tokenizer import KIND_ELEMENT

    scan = [
        i
        for i in range(1, len(doc.kind))
        if doc.kind[i] == KIND_ELEMENT and doc.name[i] == b"p"
    ]
    assert doc.tag_index(b"p") == scan


def test_unterminated_tag_at_eof_attr_region():
    # ref: src/html/parser.zig:180-189 — attr region extends to EOF
    doc = parse_html("<div id='x' class='y'")
    d = doc.query_one("div")
    assert d is not None
    assert doc.get_attr(d, b"id") == b"x"
    assert doc.get_attr(d, b"class") == b"y"


def test_nth_child_counts_elements_not_text():
    doc = parse_html("<ul>text<li id='a'></li>more<li id='b'></li></ul>")
    assert doc.get_attr(doc.query_one("li:nth-child(1)"), b"id") == b"a"
    assert doc.get_attr(doc.query_one("li:nth-child(2)"), b"id") == b"b"


def test_first_child_skips_text_nodes():
    doc = parse_html("<div id='r'>  <span id='s'></span></div>")
    r = doc.query_one("#r")
    assert doc.get_attr(doc.first_element_child(r), b"id") == b"s"


def test_scope_query_excludes_scope_root_itself():
    doc = parse_html("<div id='a' class='x'><div id='b' class='x'></div></div>")
    a = doc.query_one("#a")
    got = doc.query_all(".x", scope_root=a)
    assert [doc.get_attr(i, b"id") for i in got] == [b"b"]


def test_selector_quoted_attr_values_with_spaces():
    doc = parse_html("<div id='x' data-t='a b'></div>")
    assert doc.query_one("div[data-t='a b']") is not None
    assert doc.query_one('div[data-t="a b"]') is not None
    assert doc.query_one("div[data-t='a c']") is None


def test_dash_match_semantics():
    doc = parse_html("<p id='a' lang='en'></p><p id='b' lang='en-US'></p><p id='c' lang='ennn'></p>")
    got = [(doc.get_attr(i, b"id") or b"").decode() for i in doc.query_all("[lang|=en]")]
    assert got == ["a", "b"]
