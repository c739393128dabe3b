"""Example tour of the single-document API — mirrors the reference's
examples/ directory (basic_parse_query, cached_selector, debug_query_report,
inner_text_options, instrumentation_hooks, navigation_and_children,
query_time_decode, runtime_selector, strict_vs_fastest_parse).

Run: python examples/basic_usage.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from html_parser_ray import compile_selector, parse_html
from html_parser_ray.html.instrumentation import parse_with_hooks, query_one_with_hooks
from html_parser_ray.selector.debug import explain_first_match
from html_parser_ray.selector.matcher import query_all, query_one


def basic_parse_query():
    doc = parse_html("<div id='a'><span class='k'>v</span></div>")
    span = doc.query_one("span.k")
    assert doc.tag_name(span) == "span"
    assert doc.tag_name(doc.parent_element(span)) == "div"
    assert doc.query_one("div > span.k") is not None


def cached_selector():
    # compile once, reuse across documents (actor-state pattern)
    sel = compile_selector("li.item")
    for html in ("<ul><li class='item'>1</li></ul>", "<ol><li class='item'>2</li></ol>"):
        doc = parse_html(html)
        assert len(query_all(doc, sel)) == 1
        assert query_one(doc, sel) is not None


def debug_query_report():
    doc = parse_html("<div class='a'></div><div class='b'></div>")
    rep = explain_first_match(doc, compile_selector("div.c"))
    assert rep.matched_index is None
    assert rep.visited_elements == 2
    assert [f.kind for _, f in rep.near_misses] == ["class", "class"]


def inner_text_options():
    doc = parse_html("<p id='x'>  a  &amp;  b  </p>")
    p = doc.query_one("#x")
    assert doc.inner_text(p) == "a & b"  # normalized (default)
    assert doc.inner_text(p, normalize=False) == "  a  &  b  "


def instrumentation_hooks():
    seen = {}

    class Hooks:
        def on_parse_end(self, stats):
            seen["nodes"] = stats.node_count

        def on_query_end(self, stats):
            seen["matched"] = stats.matched

    doc = parse_with_hooks("<div><p>x</p></div>", Hooks())
    query_one_with_hooks(doc, "p", Hooks())
    assert seen == {"nodes": 4, "matched": True}


def navigation_and_children():
    doc = parse_html("<div id='r'>t<a id='k1'></a><b id='k2'></b></div>")
    r = doc.query_one("#r")
    kids = [doc.get_attr(c, b"id").decode() for c in doc.children(r)]
    assert kids == ["k1", "k2"]
    first = doc.first_element_child(r)
    assert doc.next_element_sibling(first) == doc.query_one("#k2")


def query_time_decode():
    # attributes decode lazily at query time, source stays immutable
    doc = parse_html("<a id='x' href='a&amp;b'></a>")
    assert doc.get_attr(doc.query_one("#x"), b"href") == b"a&b"
    assert b"a&amp;b" in doc.source


def runtime_selector():
    from html_parser_ray import InvalidSelectorError

    assert compile_selector("ul > li.item[data-p^=pre]:not(.skip) span") is not None
    try:
        compile_selector("div:unknown")
        raise AssertionError("should reject")
    except InvalidSelectorError:
        pass


def strict_vs_fastest_parse():
    html = "<div> <span> x </span> </div>"
    strict = parse_html(html)  # keeps whitespace text nodes
    fastest = parse_html(html, drop_whitespace_text=True)
    assert len(strict.kind) > len(fastest.kind)
    # selector results agree across profiles
    assert [strict.name[i] for i in strict.query_all("span")] == [
        fastest.name[i] for i in fastest.query_all("span")
    ]


EXAMPLES = [
    basic_parse_query,
    cached_selector,
    debug_query_report,
    inner_text_options,
    instrumentation_hooks,
    navigation_and_children,
    query_time_decode,
    runtime_selector,
    strict_vs_fastest_parse,
]

if __name__ == "__main__":
    for fn in EXAMPLES:
        fn()
        print(f"ok {fn.__name__}")
