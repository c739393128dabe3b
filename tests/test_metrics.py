"""Extraction metrics rollup tests."""

from __future__ import annotations

import pytest

from html_parser_ray.pipelines.extraction import build_extraction_pipeline
from html_parser_ray.sources.corpus import generate_documents
from html_parser_ray.stages.metrics import rollup_metrics


@pytest.mark.usefixtures("ray_session")
def test_rollup_totals_and_partitions():
    import ray.data

    t = generate_documents(30, seed=42)
    ds = ray.data.from_arrow(t).repartition(4)
    extracted = build_extraction_pipeline(
        ds, batch_size=8, emit_metrics=True, concurrency=2
    ).materialize()

    totals = rollup_metrics(extracted)
    assert totals.num_rows == 1
    row = totals.to_pylist()[0]
    assert row["partition_id"] == -1
    assert row["docs"] == 30
    assert row["spans_in"] > 0
    assert row["spans_out"] > 0
    assert row["html_bytes"] > 0
    assert row["parse_errors"] == 0

    per_part = rollup_metrics(extracted, by_partition=4)
    rows = per_part.to_pylist()
    assert sum(r["docs"] for r in rows) == 30
    assert sum(r["spans_out"] for r in rows) == row["spans_out"]
    assert {r["partition_id"] for r in rows} <= {0, 1, 2, 3}
