"""Attr-heavy selector stress (ref: src/html/document.zig:1818-1858) plus the
bench-case selectors over a generated attr-heavy page (the rust-lang.html
bench fixture isn't vendored; the 1024-anchor generator from the stress test
is)."""

from __future__ import annotations

import pytest

from html_parser_ray import compile_selector, parse_html
from html_parser_ray.selector.matcher import query_all, query_one


@pytest.fixture(scope="module")
def attr_heavy_doc():
    parts = ["<html><body><div id='root'>"]
    for i in range(1024):
        if i % 4 == 0:
            parts.append(
                f"<a id='a{i}' href='https://example/{i}' class='nav button'>x</a>"
            )
        else:
            parts.append(
                f"<a id='a{i}' href='/local/{i}' class='nav link'>x</a>"
            )
    parts.append("</div></body></html>")
    return parse_html("".join(parts))


def test_attr_heavy_query_one_stable(attr_heavy_doc):
    doc = attr_heavy_doc
    selector = "a[href^=https][class*=button]:not(.missing)"
    compiled = compile_selector(selector)
    first = None
    for _ in range(64):
        a = doc.query_one(selector)  # string (cached-compile) path
        b = query_one(doc, compiled)  # precompiled path
        assert a == b
        if first is None:
            first = a
        assert a == first
    assert doc.get_attr(first, b"id") == b"a0"


def test_attr_heavy_counts(attr_heavy_doc):
    doc = attr_heavy_doc
    assert len(doc.query_all("a[href^=https][class*=button]:not(.missing)")) == 256
    assert len(doc.query_all("a[href^=https][class*=nav]:not(.missing)")) == 256
    assert len(doc.query_all("a.nav")) == 1024
    assert len(doc.query_all("a.link")) == 768
    assert len(doc.query_all("#root > a")) == 1024
    assert len(doc.query_all("a:not(.button)")) == 768


def test_attr_heavy_profiles_agree(attr_heavy_doc):
    html = bytes(attr_heavy_doc.source)
    fast = parse_html(html, drop_whitespace_text=True)
    sel = compile_selector("a[href^=https][class*=button]:not(.missing)")
    assert len(query_all(fast, sel)) == len(query_all(attr_heavy_doc, sel))


def test_structure_parents(attr_heavy_doc):
    # node 1 is <html>, child of the document root (ref asserts parent == 0)
    assert attr_heavy_doc.parent[1] == 0
