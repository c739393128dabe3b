"""Debug query reports + instrumentation hooks (ref: src/selector/
matcher_debug.zig tests at src/html/document.zig:1911-2007 and
src/debug/instrumentation.zig examples)."""

from __future__ import annotations

from html_parser_ray import compile_selector, parse_html
from html_parser_ray.html.instrumentation import (
    parse_with_hooks,
    query_all_with_hooks,
    query_one_with_hooks,
)
from html_parser_ray.selector.debug import explain_first_match


def test_debug_report_match():
    doc = parse_html("<div id='a'></div><div id='b' class='x'></div>")
    sel = compile_selector("div.x")
    rep = explain_first_match(doc, sel)
    assert rep.matched_index == doc.query_one("div.x")
    assert rep.matched_group == 0
    assert rep.visited_elements == 2
    # first div is a near-miss failing on class
    assert rep.near_misses
    idx, failure = rep.near_misses[0]
    assert failure.kind == "class"


def test_debug_report_no_match_classifications():
    doc = parse_html(
        "<div id='a' class='x'></div><span id='b'></span>"
    )
    rep = explain_first_match(doc, compile_selector("div.y"))
    assert rep.matched_index is None
    kinds = {f.kind for _, f in rep.near_misses}
    assert "class" in kinds  # div fails class
    assert "tag" in kinds  # span fails tag
    rep2 = explain_first_match(doc, compile_selector("p > div"))
    kinds2 = [f.kind for _, f in rep2.near_misses]
    assert "combinator" in kinds2

    rep3 = explain_first_match(doc, compile_selector("section#a[q]:first-child"))
    assert rep3.matched_index is None


def test_debug_group_counters():
    doc = parse_html("<ul><li id='x'></li><li id='y'></li></ul>")
    rep = explain_first_match(doc, compile_selector("p, li"))
    assert rep.matched_group == 1
    assert rep.group_eval_counts[0] >= 1


def test_parse_and_query_hooks():
    events = []

    class Hooks:
        def on_parse_start(self):
            events.append("ps")

        def on_parse_end(self, stats):
            events.append(("pe", stats.input_len, stats.node_count))

        def on_query_start(self):
            events.append("qs")

        def on_query_end(self, stats):
            events.append(("qe", stats.kind, stats.matched))

    html = "<div id='a'><span>x</span></div>"
    doc = parse_with_hooks(html, Hooks())
    assert events[0] == "ps"
    assert events[1][0] == "pe"
    assert events[1][1] == len(html)
    assert events[1][2] == len(doc.kind)

    assert query_one_with_hooks(doc, "span", Hooks()) is not None
    assert ("qe", "one", True) in events
    assert query_all_with_hooks(doc, "em", Hooks()) == []
    assert ("qe", "all", False) in events


def test_partial_hooks_object():
    class OnlyEnd:
        def on_parse_end(self, stats):
            self.stats = stats

    h = OnlyEnd()
    parse_with_hooks("<p>x</p>", h)
    assert h.stats.node_count == 3  # document + p + text
