"""Structural invariants of the tokenizer under adversarial input
(property-based; the reference has no fuzzing — this guards the from-scratch
implementation's index arithmetic)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from html_parser_ray import parse_html
from html_parser_ray.extract.boilerplate import extract_text_blocks
from html_parser_ray.html.tokenizer import INVALID, KIND_DOCUMENT, KIND_ELEMENT, KIND_TEXT

# html-ish soup: tags, brackets, quotes, entities, whitespace, text
_soup = st.text(
    alphabet=st.sampled_from(
        list("<>/=\"' abcdiv!-&;#xpspanliul\n\t\x0c0123456789.~?")
    ),
    max_size=200,
)


def check_invariants(doc):
    n = len(doc.kind)
    assert n >= 1
    assert doc.kind[0] == KIND_DOCUMENT
    assert doc.subtree_end[0] == n - 1
    for i in range(n):
        se = doc.subtree_end[i]
        assert i <= se < n, f"subtree_end out of range at {i}"
        p = doc.parent[i]
        if i == 0:
            assert p == INVALID
        else:
            assert p != INVALID and p < i, f"parent not before child at {i}"
            # child fully inside parent subtree
            assert doc.subtree_end[p] >= se, f"subtree nesting broken at {i}"
        if doc.kind[i] == KIND_TEXT:
            assert se == i
            assert 0 <= doc.name_start[i] <= doc.name_end[i] <= len(doc.source)
        if doc.kind[i] == KIND_ELEMENT:
            assert doc.name[i]
            prev = doc.prev_sibling[i]
            if prev != INVALID:
                assert prev < i and doc.parent[prev] == doc.parent[i]


@settings(max_examples=300, deadline=None)
@given(_soup)
def test_tokenizer_invariants_fuzz(s):
    doc = parse_html(s)
    check_invariants(doc)


@settings(max_examples=100, deadline=None)
@given(_soup)
def test_extraction_never_crashes_fuzz(s):
    doc = parse_html(s)
    blocks = extract_text_blocks(doc)
    for b in blocks:
        assert isinstance(b, bytes)


@settings(max_examples=100, deadline=None)
@given(_soup)
def test_query_all_matches_are_elements(s):
    doc = parse_html(s)
    for idx in doc.query_all("*"):
        assert doc.kind[idx] == KIND_ELEMENT
    # queryAll preorder property
    ids = doc.query_all("*")
    assert ids == sorted(ids)


@settings(max_examples=100, deadline=None)
@given(_soup, st.sampled_from(["div", "p", "li", "span [q]", "a > b", "*:first-child"]))
def test_query_one_is_first_of_query_all(s, sel):
    doc = parse_html(s)
    allm = doc.query_all(sel)
    one = doc.query_one(sel)
    if allm:
        assert one == allm[0]
    else:
        assert one is None


@settings(max_examples=100, deadline=None)
@given(_soup, st.sampled_from(["div", "p", "*[a]", "li:first-child", "div > p"]))
def test_profiles_agree_on_selector_results(s, sel):
    """strictest vs fastest profiles yield identical element matches
    (analog of ref: src/html/document.zig:1641-1680 — query equivalence;
    note innerText may differ when whitespace-only nodes are dropped, which
    is why the extraction pipeline defaults to the strictest profile)."""
    a = parse_html(s, drop_whitespace_text=False)
    b = parse_html(s, drop_whitespace_text=True)
    ids_a = [a.name[i] for i in a.query_all(sel)]
    ids_b = [b.name[i] for i in b.query_all(sel)]
    assert ids_a == ids_b
