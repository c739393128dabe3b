"""Extraction layer tests: boilerplate strip, span emission, layout stub."""

from __future__ import annotations

from html_parser_ray import parse_html
from html_parser_ray.extract.boilerplate import ExtractConfig, extract_text_blocks
from html_parser_ray.extract.extractor import SpanExtractor
from html_parser_ray.extract.layout import LayoutParser


def blocks(html: str, **cfg) -> list[str]:
    doc = parse_html(html)
    out = extract_text_blocks(doc, ExtractConfig(**cfg) if cfg else None)
    return [b.decode() for b in out]


def test_basic_article_extraction():
    html = (
        "<html><head><title>t</title><script>var x=1<2;</script></head><body>"
        "<header><h1>Site</h1><nav><a href='/a'>Home</a><a href='/b'>About</a></nav></header>"
        "<main><article><p>First paragraph of content.</p>"
        "<p>Second   paragraph with  spaces.</p></article></main>"
        "<aside class='sidebar'><p>ads here</p></aside>"
        "<footer><p>copyright</p></footer>"
        "</body></html>"
    )
    got = blocks(html)
    assert got == [
        "First paragraph of content.",
        "Second paragraph with spaces.",
    ]


def test_link_density_prunes_nav_like_blocks():
    html = (
        "<div><p id='links'><a href='/1'>one</a> <a href='/2'>two</a> "
        "<a href='/3'>three</a></p>"
        "<p id='content'>Real content with <a href='/x'>one link</a> inside a "
        "much longer paragraph of actual text.</p></div>"
    )
    got = blocks(html)
    assert got == [
        "Real content with one link inside a much longer paragraph of actual text."
    ]


def test_entities_and_normalization_in_blocks():
    html = "<p>  a &amp;   b  </p>"
    assert blocks(html) == ["a & b"]


def test_class_id_heuristics_drop_chrome():
    html = (
        "<div class='content'><p>keep me</p></div>"
        "<div class='ad'><p>buy stuff</p></div>"
        "<div id='cookie-banner'><p>accept cookies</p></div>"
        "<div class='advertising'><p>more ads</p></div>"
    )
    assert blocks(html) == ["keep me"]


def test_svg_and_rawtext_never_leak():
    html = (
        "<p>before</p><svg><text>vector</text></svg>"
        "<style>.x{}</style><script>var a;</script><p>after</p>"
    )
    assert blocks(html) == ["before", "after"]


def test_table_cells_are_blocks():
    html = "<table><tr><td>c1</td><td>c2</td></tr></table>"
    assert blocks(html) == ["c1", "c2"]


def test_bare_text_outside_blocks():
    assert blocks("hello world") == ["hello world"]


def test_deterministic():
    html = "<main><p>x</p></main>"
    assert blocks(html) == blocks(html)


def test_span_extractor_end_to_end():
    ex = SpanExtractor()
    spans = [
        {"kind": "text", "text": "  plain   text ", "media_ref": "", "offset": 0},
        {
            "kind": "html",
            "text": "<html><body><nav><a href='/'>Home</a></nav>"
            "<p>First.</p><p>Second.</p></body></html>",
            "media_ref": "",
            "offset": 1,
        },
        {"kind": "media", "text": "", "media_ref": "media://pdf/000123", "offset": 2},
    ]
    out = ex.extract_document(spans)
    assert [o["kind"] for o in out] == ["text", "text", "text", "media"]
    assert [o["offset"] for o in out] == [0, 1, 2, 3]
    assert out[0]["text"] == "plain text"
    assert out[1]["text"] == "First."
    assert out[2]["text"] == "Second."
    assert out[3]["media_ref"] == "media://pdf/000123"
    assert "layout_fingerprint" in out[3]["text"]


def test_span_extractor_empty_and_unknown_kinds():
    ex = SpanExtractor()
    assert ex.extract_document([]) == []
    out = ex.extract_document(
        [{"kind": "mystery", "text": "x", "media_ref": "", "offset": 0}]
    )
    assert out == []


def test_layout_stub_deterministic():
    a = LayoutParser().parse("media://pdf/1")
    b = LayoutParser().parse("media://pdf/1")
    c = LayoutParser().parse("media://pdf/2")
    assert a == b
    assert a != c
    assert 1 <= a["num_pages"] <= 32


def test_extract_stats_accumulate():
    ex = SpanExtractor()
    ex.extract_document([{"kind": "html", "text": "<p>x</p>", "media_ref": "", "offset": 0}])
    ex.extract_document([{"kind": "text", "text": "y", "media_ref": "", "offset": 0}])
    assert ex.stats.docs == 2
    assert ex.stats.spans_in == 2
    assert ex.stats.html_bytes == len("<p>x</p>")


def test_split_batch_counts_bytes_and_tolerates_null_text():
    """The split budget is BYTES (multi-byte text must split at the same
    byte threshold as ASCII) and a null text span must not NaN-poison its
    row's total (which silently disabled the split)."""
    import pyarrow as pa

    from html_parser_ray.sources.corpus import SPAN_STRUCT
    from html_parser_ray.stages.split import split_batch

    big_cjk = "世" * 600_000  # 600k codepoints = 1.8 MB UTF-8
    batch = pa.table(
        {
            "doc_id": pa.array(["cjk", "withnull"], type=pa.string()),
            "spans": pa.array(
                [
                    [
                        {"kind": "html", "text": big_cjk, "media_ref": "", "offset": 0},
                        {"kind": "html", "text": big_cjk, "media_ref": "", "offset": 1},
                    ],
                    [
                        {"kind": "html", "text": "x" * 3_000_000, "media_ref": "", "offset": 0},
                        {"kind": "media", "text": None, "media_ref": "m", "offset": 1},
                    ],
                ],
                type=pa.list_(SPAN_STRUCT),
            ),
        }
    )
    out = split_batch(batch, max_bytes=1_000_000, max_spans=64)
    by_doc = {}
    for row in out.to_pylist():
        by_doc.setdefault(row["doc_id"], []).append(row)
    # 2 x 1.8MB spans at a 1MB budget -> one span per fragment
    assert len(by_doc["cjk"]) == 2
    # the null-text row is 3MB oversized and MUST still split
    assert len(by_doc["withnull"]) == 2


def test_native_scratch_growth_does_not_pin_fallback():
    """A large batch grows the native scratch; subsequent small batches must
    still take the native path (the old len(mv)-capacity sizing counted the
    grown scratch against the int32 guard and copied it whole every batch)."""
    import pyarrow as pa

    from html_parser_ray.sources.corpus import SPAN_STRUCT
    from html_parser_ray.stages.extract_stage import ExtractSpansBatch

    stage = ExtractSpansBatch()
    big_html = "<div><p>" + ("word " * 120_000) + "</p></div>"  # ~600 KB
    big = pa.table(
        {
            "doc_id": pa.array(["big"], type=pa.string()),
            "spans": pa.array(
                [[{"kind": "html", "text": big_html, "media_ref": "", "offset": 0}]],
                type=pa.list_(SPAN_STRUCT),
            ),
        }
    )
    small_html = "<p>alpha beta</p>"
    small = pa.table(
        {
            "doc_id": pa.array(["small"], type=pa.string()),
            "spans": pa.array(
                [[{"kind": "html", "text": small_html, "media_ref": "", "offset": 0}]],
                type=pa.list_(SPAN_STRUCT),
            ),
        }
    )
    before = stage.extractor.stats.native_fallbacks
    out_big = stage(big)
    out_small = stage(small)
    assert out_big.num_rows == 1 and out_small.num_rows == 1
    got = out_small.column("spans_out").to_pylist()[0]
    assert [s["text"] for s in got] == ["alpha beta"]
    # if the native kernel is available at all, neither batch fell back
    if stage._batch_native is not None:
        assert stage.extractor.stats.native_fallbacks == before


def test_boilerplate_class_id_precheck_case_insensitive():
    """Attr NAMES are case-insensitive at the parse layer, so CLASS=/Id=
    must mark boilerplate exactly like their lowercase twins (the old
    byte precheck silently bypassed the verdict for them)."""
    from html_parser_ray.extract.boilerplate import extract_text_blocks
    from html_parser_ray.html.document import parse_html

    for attr in ('class="advert"', 'CLASS="advert"', 'Class="advert"'):
        html = f'<div {attr}><p>junk nav</p></div><p>real content</p>'
        got = extract_text_blocks(parse_html(html))
        assert got == [b"real content"], attr
    for attr in ('id="footer"', 'ID="footer"', 'Id="footer"'):
        html = f'<div {attr}><p>foot junk</p></div><p>keep me</p>'
        got = extract_text_blocks(parse_html(html))
        assert got == [b"keep me"], attr
