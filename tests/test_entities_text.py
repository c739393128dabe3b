"""Entity decode + whitespace normalization parity tests."""

from __future__ import annotations

import pytest

from html_parser_ray import parse_html
from html_parser_ray.html import entities
from html_parser_ray.html.text import NormState, normalize_bytes, normalize_segment


def test_decode_named_and_numeric():
    # ref: src/html/entities.zig:138-142
    assert entities.decode(b"a&amp;b&#x20;") == b"a&b "
    assert entities.decode(b"&lt;&gt;&quot;&apos;") == b"<>\"'"


def test_decode_passthrough_invalid():
    # unknown names, unterminated, too-short tails pass through
    assert entities.decode(b"&nbsp;") == b"&nbsp;"
    assert entities.decode(b"&amp") == b"&amp"
    assert entities.decode(b"a & b") == b"a & b"
    assert entities.decode(b"&#;") == b"&#;"
    assert entities.decode(b"&#x;") == b"&#x;"
    assert entities.decode(b"&") == b"&"
    assert entities.decode(b"&lt") == b"&lt"  # < 4 bytes remaining


def test_decode_numeric_limits():
    # cap at U+10FFFF (ref: src/html/entities.zig:113-119)
    assert entities.decode(b"&#x10FFFF;") == "\U0010ffff".encode()
    assert entities.decode(b"&#1114112;") == b"&#1114112;"  # 0x110000 rejected
    assert entities.decode(b"&#xD800;") == b"&#xD800;"  # surrogate rejected
    assert entities.decode(b"&#65;") == b"A"
    assert entities.decode(b"&#x41;") == b"A"
    assert entities.decode(b"&#X41;") == b"A"


def test_normalize_basic():
    # ref: src/html/document.zig:1083-1096
    doc = parse_html("<div id='x'>  alpha \n\t beta   gamma  </div>")
    node = doc.query_one("#x")
    assert doc.inner_text(node) == "alpha beta gamma"
    # ref: src/html/document.zig:1098-1111 — non-normalized
    assert doc.inner_text(node, normalize=False) == "  alpha \n\t beta   gamma  "


def test_normalize_across_text_node_boundaries():
    # ref: src/html/document.zig:1113-1126
    doc = parse_html("<div id='x'>A <b></b>   B</div>")
    assert doc.inner_text(doc.query_one("#x")) == "A B"


def test_normalize_pending_space_no_leading():
    doc = parse_html("<div id='x'><b>  </b>A</div>")
    assert doc.inner_text(doc.query_one("#x")) == "A"


def test_decode_and_normalize_combined():
    # ref: src/html/document.zig:1128-1148
    doc = parse_html("<div id='x'>  alpha  &amp;   beta  </div>")
    node = doc.query_one("#x")
    assert doc.inner_text(node, normalize=False) == "  alpha  &   beta  "
    assert doc.inner_text(node) == "alpha & beta"


def test_decoded_whitespace_entity_participates_in_normalization():
    # &#x20; decodes to a space which the normalizer then collapses
    doc = parse_html("<div id='x'>a&#x20;&#x20;  b</div>")
    assert doc.inner_text(doc.query_one("#x")) == "a b"


def test_inner_text_subtree_concatenation():
    # ref: src/html/document.zig:1167-1186 — "a<b></b>b" -> "ab"
    doc = parse_html("<div id='x'>single</div><div id='y'>a<b></b>b</div>")
    assert doc.inner_text(doc.query_one("#x")) == "single"
    assert doc.inner_text(doc.query_one("#y")) == "ab"


def test_inner_text_of_text_node_and_empty_element():
    doc = parse_html("<div id='x'></div>")
    assert doc.inner_text(doc.query_one("#x")) == ""


def test_norm_state_machine_segments():
    out = bytearray()
    st = NormState()
    normalize_segment(out, b"  A ", st)
    normalize_segment(out, b"", st)
    normalize_segment(out, b"   ", st)
    normalize_segment(out, b"B", st)
    assert bytes(out) == b"A B"


def test_normalize_all_five_ws_chars():
    assert normalize_bytes(b"a \t\n\r\x0cb") == b"a b"
    assert normalize_bytes(b" \t ") == b""
