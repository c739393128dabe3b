"""Tree-construction conformance (html5lib .dat format, reference criterion).

Criterion = element-tag preorder sequence equality with wrapper filtering
(ref: tools/scripts.zig:1994-2062) over the hand-authored spec-tree corpora
under tests/data/ (authored from published html5lib-tests/WHATWG semantics;
upstream suites are unreachable in this sandbox — no network, no cache).

Measured round-2 rates: tree_construction 75/94, whatwg_extra 95/100
(combined 170/194 = 87.6%, vs the reference's 524/600 = 87.3% and
440/500 = 88% on the upstream corpora). Failures are exclusively the expected permissive-
parser divergences: adoption agency (no formatting-element reconstruction),
table foster parenting (no reordering), spec token rewrites (</br>, <image>,
lone </p>), opaque svg subtrees, <xmp> rawtext, loose td/tr outside tables,
and the harness's own comment/doctype expected-line quirk (shared with the
reference harness).
"""

from __future__ import annotations

import os

from html_parser_ray.conformance import parse_dat, run_dat_file

DATA = os.path.join(os.path.dirname(__file__), "data")

# floors sit just under the measured pass counts so a tokenizer regression
# (any previously-passing case breaking) fails the suite
FLOORS = {
    "tree_construction.dat": (94, 75),
    "whatwg_extra.dat": (100, 94),
}

def test_dat_parser_shape():
    with open(os.path.join(DATA, "tree_construction.dat"), encoding="utf-8") as f:
        cases = parse_dat(f.read())
    assert len(cases) == 94
    # first case sanity
    assert cases[0].html == "<p>One<p>Two"
    assert cases[0].expected == ["p", "p"]
    # empty-#errors sections must not leak into the html payload
    assert not any("#errors" in c.html for c in cases)


def test_tree_construction_pass_rate():
    for fname, (total, floor) in FLOORS.items():
        r = run_dat_file(os.path.join(DATA, fname))
        assert r.total == total, (fname, r.total)
        assert r.passed >= floor, (
            f"{fname}: {r.passed}/{r.total} passed, floor {floor}; "
            f"first failures: {r.failures[:3]}"
        )


def test_combined_rate_at_least_80pct():
    total = passed = 0
    for fname in FLOORS:
        r = run_dat_file(os.path.join(DATA, fname))
        total += r.total
        passed += r.passed
    assert passed / total >= 0.80, f"{passed}/{total}"


def test_wrapper_filter_and_foreign_content():
    """The criterion internals: wrappers dropped, svg/math payloads take the
    element token (ref: scripts.zig:1791-1809)."""
    from html_parser_ray.conformance import _tree_line_tag

    assert _tree_line_tag("svg circle") == "circle"
    assert _tree_line_tag("math mi") == "mi"
    assert _tree_line_tag("div") == "div"
    assert _tree_line_tag("svg") == "svg"

    from html_parser_ray.conformance import engine_tag_sequence

    assert engine_tag_sequence("<html><head></head><body><p>x</p></body></html>") == ["p"]
    assert engine_tag_sequence("<table><tbody><tr><td>x</td></tr></tbody></table>") == [
        "table",
        "td",
    ]
