"""HTML serializer tests (raw-path parity with ref: src/root.zig:87-236).

The reference's serializer output depends on whether attributes were lazily
materialized in place; this functional engine always emits the raw form, which
equals the reference's output for never-read attributes (its default round-trip
tests below). The mutated-state variants are intentionally not reproduced.
"""

from __future__ import annotations

from html_parser_ray import parse_html
from html_parser_ray.html.serialize import to_html, write_node


def test_roundtrip_simple_subtree():
    # ref: src/root.zig:87-103
    doc = parse_html("<div id='a'><span>v</span></div>")
    div = doc.query_one("div")
    assert to_html(doc, div) == b"<div id='a'><span>v</span></div>"


def test_void_tags_no_close():
    doc = parse_html("<img id='i' class='x'>")
    img = doc.query_one("img#i")
    assert to_html(doc, img) == b"<img id='i' class='x'>"


def test_self_only_excludes_children():
    # ref: src/root.zig:222-239
    doc = parse_html("<div id='a'><span>v</span></div>")
    div = doc.query_one("div")
    out = bytearray()
    write_node(doc, div, out, self_only=True)
    assert bytes(out) == b"<div id='a'>"


def test_document_roundtrip_drops_comments_doctype():
    doc = parse_html("<!DOCTYPE html><!-- c --><p id='x'>hi</p>")
    assert to_html(doc, 0) == b"<p id='x'>hi</p>"


def test_complex_document_raw_roundtrip():
    # ref: src/root.zig:166-217 (raw path: no attrs were read before printing)
    src = (
        "<!DOCTYPE html>\n"
        "<html><head>\n"
        "<title>Title</title>\n"
        "<meta charset='utf-8'><!-- comment -->\n"
        "<script>var x = 1 < 2;</script>\n"
        "</head><body>\n"
        "<div id='root' class='a b' data-q='1>2'>Hello&nbsp;<span>World</span></div>\n"
        "<img src='x.png' alt='hi'>\n"
        "<br>\n"
        "<ul><li>One</li><li>Two</li></ul>\n"
        "</body></html>"
    )
    doc = parse_html(src)
    html_el = doc.html()
    expected = (
        "<html><head>\n"
        "<title>Title</title>\n"
        "<meta charset='utf-8'>\n"
        "<script>var x = 1 < 2;</script>\n"
        "</head><body>\n"
        "<div id='root' class='a b' data-q='1>2'>Hello&nbsp;<span>World</span></div>\n"
        "<img src='x.png' alt='hi'>\n"
        "<br>\n"
        "<ul><li>One</li><li>Two</li></ul>\n"
        "</body></html>"
    ).encode()
    assert to_html(doc, html_el) == expected


def test_meta_position_and_charset():
    # ref: src/root.zig:190-199 — node offsets inside <head>
    src = (
        "<!DOCTYPE html>\n"
        "<html><head>\n"
        "<title>Title</title>\n"
        "<meta charset='utf-8'>\n"
        "</head><body></body></html>"
    )
    doc = parse_html(src)
    html_el = doc.html()
    # +1 head, +2 text, +3 title, +4 text(Title), +5 text, +6 meta
    assert doc.get_attr(html_el + 6, b"charset") == b"utf-8"


def test_long_mixed_case_tag_name_parity():
    """Reference lowercases only the first 8 name bytes in place
    (parser.zig:144-151); >8-byte mixed-case tails keep their case in
    re-serialization. Round-1 divergence, closed in round 2."""
    from html_parser_ray.html.document import parse_html
    from html_parser_ray.html.serialize import to_html

    cases = [
        (b"<VeRyLoNgTagName a=1>x</VeRyLoNgTagName>",
         b"<verylongTagName a=1>x</verylongTagName>"),
        (b"<CUSTOMELEMENT>y</CUSTOMELEMENT>", b"<customelEMENT>y</customelEMENT>"),
        (b"<SHORTTAG>z</SHORTTAG>", b"<shorttag>z</shorttag>"),  # exactly 8
    ]
    for src, want in cases:
        assert to_html(parse_html(src)) == want, src
