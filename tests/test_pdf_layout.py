"""Real PDF layout branch: writer/parser roundtrip, escape and FlateDecode
handling, error paths, the layout stage plumbing, and serial-twin parity of
the media_layout_features pipeline."""

from __future__ import annotations

import pytest

from html_parser_ray.extract.layout import PDF_REF_PREFIX, LayoutParser
from html_parser_ray.functions.pdfcodec import (
    PdfError,
    encode_pdf,
    parse_pdf,
    synth_pdf,
)


def test_roundtrip_text_rects_pages():
    pdf = encode_pdf(
        [
            {
                "texts": [(72, 720, 12, "Hello world"), (72, 700, 10, "second")],
                "rects": [(10, 20, 30, 40), (1, 2, 3, 4)],
            },
            {"texts": [(50, 600, 14, "page two")], "media_box": (400, 500)},
        ]
    )
    doc = parse_pdf(pdf)
    assert doc["num_pages"] == 2
    assert doc["pages"][0]["texts"] == [
        (72.0, 720.0, 12.0, "Hello world"),
        (72.0, 700.0, 10.0, "second"),
    ]
    assert doc["pages"][0]["rects"] == [(10.0, 20.0, 30.0, 40.0), (1.0, 2.0, 3.0, 4.0)]
    assert doc["pages"][1]["media_box"] == (400.0, 500.0)


def test_escapes_and_compression_both_ways():
    tricky = "parens () backslash \\ nested (deep)"
    for compress in (False, True):
        pdf = encode_pdf([{"texts": [(0, 0, 9, tricky)]}], compress=compress)
        doc = parse_pdf(pdf)
        assert doc["pages"][0]["texts"][0][3] == tricky
        assert (b"/FlateDecode" in pdf) == compress


def test_parser_not_writer_inverse():
    # hand-written PDF with TJ arrays, octal escapes and multiple content
    # streams per page — shapes the writer never produces
    import zlib

    content1 = b"BT /F1 11 Tf 10 20 Td [(ab) -120 (cd)] TJ ET"
    content2 = b"BT 5 6 Td (\\101\\102) Tj ET 7 8 9 10 re S"
    comp = zlib.compress(content2)
    head = (
        b"%PDF-1.7\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Contents 5 0 R >>\nendobj\n"
    )
    obj4 = (
        b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(content1), content1)
    )
    obj5 = (
        b"5 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream\nendobj\n"
        % (len(comp), comp)
    )
    pdf = head + obj4 + obj5 + b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    doc = parse_pdf(pdf)
    assert doc["num_pages"] == 1
    texts = doc["pages"][0]["texts"]
    assert [t[3] for t in texts] == ["ab", "cd", "AB"]  # octal \101\102 = AB
    assert texts[0][:2] == (10.0, 20.0)
    assert doc["pages"][0]["rects"] == [(7.0, 8.0, 9.0, 10.0)]
    assert doc["version"] == "1.7"


def test_error_paths():
    with pytest.raises(PdfError):
        parse_pdf(b"not a pdf")
    with pytest.raises(PdfError):
        parse_pdf(b"%PDF-1.4\nno objects here")
    # valid header+objects but no pages
    with pytest.raises(PdfError):
        parse_pdf(b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\n")


def test_synth_pdf_deterministic_and_parseable():
    a = synth_pdf("media://pdf/000123")
    assert a == synth_pdf("media://pdf/000123")
    assert a != synth_pdf("media://pdf/000124")
    doc = parse_pdf(a)
    assert 1 <= doc["num_pages"] <= 4
    assert all(pg["texts"] for pg in doc["pages"])


def test_layout_parser_real_for_pdf_refs_legacy_otherwise():
    lp = LayoutParser()
    meta = lp.parse(f"{PDF_REF_PREFIX}000042")
    assert set(meta) >= {
        "num_pages",
        "n_text_spans",
        "n_rects",
        "text_chars",
        "layout_fingerprint",
    }
    assert meta["n_text_spans"] > 0 and meta["text_chars"] > 0
    # derived from the REAL parse, not the keyed hash
    from html_parser_ray.functions.pdfcodec import parse_pdf as pp

    doc = pp(synth_pdf(f"{PDF_REF_PREFIX}000042"))
    assert meta["num_pages"] == doc["num_pages"]
    legacy = lp.parse("img://something")
    assert set(legacy) == {"media_ref", "layout_model", "layout_fingerprint", "num_pages"}


def test_layout_stage_matches_serial_twin(ray_session):
    import ray.data

    from html_parser_ray.stages.layout_stage import (
        build_layout_feature_pipeline,
        synth_pdf_refs,
    )

    ds = ray.data.from_arrow(synth_pdf_refs(24))
    out = (
        build_layout_feature_pipeline(ds, concurrency=2)
        .sort("media_ref")
        .to_pandas()
    )
    lp = LayoutParser()
    refs = sorted(synth_pdf_refs(24).column("media_ref").to_pylist())
    assert list(out["media_ref"]) == refs
    for _, row in out.iterrows():
        m = lp.parse(row["media_ref"])
        assert row["num_pages"] == m["num_pages"]
        assert row["n_text_spans"] == m["n_text_spans"]
        assert row["layout_fingerprint"] == m["layout_fingerprint"]

def _assemble(objs: "list[bytes]") -> bytes:
    """Writer-shaped assembly (header + xref + trailer) around hand-authored
    object bodies — for cases encode_pdf's page model can't express."""
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
        len(objs) + 1,
        xref_at,
    )
    return bytes(out)


def _array_contents_pdf() -> bytes:
    c1 = b"BT 1 2 Td (part one) Tj ET"
    c2 = b"BT 3 4 Td (part two) Tj ET"
    return _assemble(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>",
            b"<< /Length %d >>\nstream\n" % len(c1) + c1 + b"\nendstream",
            b"<< /Length %d >>\nstream\n" % len(c2) + c2 + b"\nendstream",
        ]
    )


def test_contents_array_form_parses_in_order():
    doc = parse_pdf(_array_contents_pdf())
    assert doc["num_pages"] == 1
    assert [t[3] for t in doc["pages"][0]["texts"]] == ["part one", "part two"]


def test_contents_unparsable_ref_raises():
    bad = _assemble(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /Contents /NotARef >>",
        ]
    )
    with pytest.raises(PdfError):
        parse_pdf(bad)
    empty = _assemble(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /Contents [ ] >>",
        ]
    )
    with pytest.raises(PdfError):
        parse_pdf(empty)
