"""Lance end-to-end test, gated on library availability (VERDICT item 8).

The production input format per BASELINE.json input_hint is Lance;
``read_corpus(..., file_format="lance")`` routes to ``ray.data.read_lance``.
This container ships Ray's ``read_lance`` entry point but NOT the ``lance``
/ ``pylance`` package it imports at call time, so the write step (and thus
the end-to-end read) cannot run here — the test skips with that reason and
runs for real wherever ``import lance`` succeeds. The parquet branch of the
same reader is exercised by the rest of the suite and by the negative test
below (the lance branch must still be reachable and fail for the RIGHT
reason, not a typo'd code path).
"""

from __future__ import annotations

import pytest


def test_lance_roundtrip_when_available(tmp_path):
    lance = pytest.importorskip(
        "lance", reason="lance/pylance not installed in this container"
    )
    import ray.data

    from html_parser_ray.pipelines.extraction import build_extraction_pipeline, read_corpus
    from html_parser_ray.sources.corpus import generate_documents

    tbl = generate_documents(20, seed=42)
    uri = str(tmp_path / "corpus.lance")
    lance.write_dataset(tbl, uri)

    ds = read_corpus(uri, file_format="lance")
    assert ds.count() == 20
    out = build_extraction_pipeline(ds, batch_size=8, concurrency=2)
    assert out.count() == 20


@pytest.mark.usefixtures("ray_session")
def test_lance_branch_reachable():
    """Without the lance package, the lance branch must fail at the library
    import — proving the routing itself is wired (not silently falling back
    to parquet)."""
    try:
        import lance  # noqa: F401

        pytest.skip("lance installed; covered by the roundtrip test")
    except ImportError:
        pass
    from html_parser_ray.pipelines.extraction import read_corpus

    with pytest.raises(Exception) as exc_info:
        ds = read_corpus("/tmp/nonexistent.lance", file_format="lance")
        ds.count()
    msg = str(exc_info.value).lower()
    assert "lance" in msg or "no module" in msg
