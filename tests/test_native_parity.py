"""Native (C) fused extractor must be byte-identical to the Python fused path
(which is itself pinned to the DOM oracle by test_fused_parity.py).

Skips when the native path is unavailable (no system compiler) — the engine
then runs the Python fused path everywhere, covered by the other suites.
"""

from __future__ import annotations

import random

import pytest

from html_parser_ray.extract.fused import extract_blocks_fused
from html_parser_ray.native import get_native_extractor
from html_parser_ray.sources import corpus as corpus_mod
from tests.test_fused_parity import EDGE_CASES

nat = get_native_extractor()
pytestmark = pytest.mark.skipif(
    nat is None, reason="native extractor unavailable (no compiler)"
)


def test_edge_cases_parity():
    for src in EDGE_CASES:
        assert nat(src) == extract_blocks_fused(src), src


def test_corpus_families_parity():
    for fi, fam in enumerate(corpus_mod._HTML_FAMILIES):
        for seed in range(40):
            rng = random.Random((fi << 16) ^ seed)
            src = fam(rng).encode()
            assert nat(src) == extract_blocks_fused(src), (fi, seed)


def test_fuzz_parity():
    pieces = [
        "<div>", "</div>", "<p>", "</p>", "<li>", "</ul>", "<ul>", "<span>",
        "</span>", "<a href='x'>", "</a>", "text ", "&amp; ", "  ", "<br>",
        "<script>s</script>", "<!-- c -->", "<b", ">", "<", "</crazy>",
        "<table>", "<tr>", "<td>", "cell", "<img src='i'>",
        "<div class='menu'>", "<aside>", "</aside>", "\n\t", "&#65;",
        "&#x1F600;", "<svg>", "</svg>", "<textarea>", "</textarea>",
        "<PLAINTEXT>", "<?pi?>", "<!doctype>", "</p >", "< sp>", "<div<div>",
        "&bogus;", "&lt", "<p CLASS='SideBar'>", "<input type=x>",
        "<address>", "</address>", "<caption>", "<div class='yyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyyy sidebar'>", "<p id=advert-x>", "word&#x20;next", "&#0;", "&#1114111;", "&#1114112;",
    ]
    for seed in range(600):
        rng = random.Random(seed)
        src = "".join(
            rng.choice(pieces) for _ in range(rng.randint(1, 80))
        ).encode()
        assert nat(src) == extract_blocks_fused(src), (seed, src[:120])


def test_drop_whitespace_parity():
    for src in EDGE_CASES:
        assert nat(src, True) == extract_blocks_fused(
            src, drop_whitespace_text=True
        ), src


def test_extractor_routes_native_and_falls_back():
    from html_parser_ray.extract.boilerplate import ExtractConfig
    from html_parser_ray.extract.extractor import SpanExtractor

    ex = SpanExtractor()
    assert ex._native is not None
    # non-default config must NOT use the native path (fixed default tables)
    ex2 = SpanExtractor(config=ExtractConfig(max_link_density=0.9))
    assert ex2._native is None
    # both produce output for the same row
    spans = [{"kind": "html", "text": "<p>hello <a href='#'>x</a></p>", "media_ref": "", "offset": 0}]
    assert ex.extract_document(spans)
    assert ex2.extract_document(spans)


def test_empty_and_pathological_inputs():
    cases = [b"", b"<", b"&", b"\x00" * 64, b"<" * 500, b"&" * 500, b">" * 100,
             b"<p>" + b"&amp;" * 2000 + b"</p>", bytes(range(256)) * 4]
    for src in cases:
        assert nat(src) == extract_blocks_fused(src), src[:40]


def test_batch_stage_counts_native_fallbacks():
    """The batched-native stage degrades to Python ONLY on the known
    capacity/overflow signals, and every degradation increments
    extractor.stats.native_fallbacks (silent perf cliffs are a bug)."""
    import pyarrow as pa

    from html_parser_ray.stages.extract_stage import ExtractSpansBatch

    stage = ExtractSpansBatch()
    if stage._batch_native is None:
        import pytest

        pytest.skip("no native batch kernel in this environment")

    def batch():
        spans = [[{"kind": "html", "text": "<p>hi</p>", "media_ref": "", "offset": 0}]]
        return pa.table({"doc_id": pa.array(["d0"]), "spans": pa.array(spans)})

    stage(batch())
    assert stage.extractor.stats.native_fallbacks == 0

    # force the exception path: a batch-native callable that raises the
    # declared capacity signal must degrade AND count
    real = stage._batch_native

    def boom(*a, **k):
        raise pa.ArrowCapacityError("synthetic >2GB batch")

    stage._batch_native = boom
    out = stage(batch())
    assert out.num_rows == 1
    assert stage.extractor.stats.native_fallbacks == 1

    # an UNKNOWN exception must escape (observable), not silently degrade
    def unexpected(*a, **k):
        raise RuntimeError("regression in the vectorized emit path")

    stage._batch_native = unexpected
    import pytest

    with pytest.raises(RuntimeError):
        stage(batch())
    stage._batch_native = real
