"""Selector grammar whitespace/edge handling (ref: src/selector/runtime.zig
parseAttrSelector skipWs placement, value token forms)."""

from __future__ import annotations

import pytest

from html_parser_ray import InvalidSelectorError, compile_selector, parse_html


@pytest.fixture(scope="module")
def doc():
    return parse_html(
        "<div id='x' a='v' data-p='prefix-rest' lang='en-US' klass='tok1 tok2'></div>"
    )


def test_ws_inside_brackets(doc):
    # '[' ws name ws '=' ws value ws ']' all legal
    assert doc.query_one("[ a = v ]") is not None
    assert doc.query_one("[ a ]") is not None
    assert doc.query_one("div[ data-p ^= prefix ]") is not None


def test_two_char_ops_no_ws_between(doc):
    # '^ =' (space between op char and '=') is invalid
    for sel in ("[a ^ = v]", "[a $ = v]", "[a * = v]", "[a ~ = v]", "[a | = v]"):
        with pytest.raises(InvalidSelectorError):
            compile_selector(sel)


def test_quoted_values_and_empty(doc):
    assert doc.query_one("[a='v']") is not None
    assert doc.query_one('[a="v"]') is not None
    with pytest.raises(InvalidSelectorError):
        compile_selector("[a=]")  # missing value token
    with pytest.raises(InvalidSelectorError):
        compile_selector("[a='unterminated")


def test_ws_around_combinators(doc):
    d = parse_html("<ul><li id='i1'></li><li id='i2'></li></ul>")
    assert len(d.query_all("ul   >   li")) == 2
    assert len(d.query_all("li   +   li")) == 1
    assert len(d.query_all("ul\t>\nli")) == 2


def test_grouping_ws(doc):
    d = parse_html("<p id='a'></p><i id='b'></i>")
    assert len(d.query_all("  p  ,  i  ")) == 2
    assert len(d.query_all("p,i")) == 2


def test_nth_child_paren_ws():
    d = parse_html("<ul><li id='a'></li><li id='b'></li></ul>")
    assert len(d.query_all("li:nth-child( 2 )")) == 1
    assert len(d.query_all("li:nth-child( odd )")) == 1
    # "2 n" IS valid (a_part trims to "2", ref runtime.zig:462-470)...
    assert len(d.query_all("li:nth-child(2 n)")) == 1  # == 2n -> second li
    # ...but inner whitespace in the B part is not ("+ 1" fails parseSignedInt)
    with pytest.raises(InvalidSelectorError):
        compile_selector("li:nth-child(2n + 1)")


def test_not_ws():
    d = parse_html("<p id='a' class='x'></p><p id='b'></p>")
    assert len(d.query_all("p:not( .x )")) == 1
    assert len(d.query_all("p:not( #a )")) == 1


def test_ident_start_rules():
    # ids/classes may not start with a digit (IdentStartTable excludes digits)
    for sel in ("#2", ".9x", "#-dash"):
        with pytest.raises(InvalidSelectorError):
            compile_selector(sel)
    # but digits may continue an ident
    compile_selector("#a2")
    compile_selector(".b9")
    # tags may not start with ':' or digits
    with pytest.raises(InvalidSelectorError):
        compile_selector("2div")
