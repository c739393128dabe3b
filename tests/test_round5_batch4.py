"""Round-5 fourth batch: the FULL OUTER join, robust statistics (median +
MAD per group), and the CSV source family — each sf0.001 oracle parity plus
the semantic edge its form pins (one-sided contexts coalesce to 0,
even-count .5-exact medians, RFC-4180 quoting roundtrip)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from _parity import SF, _as_df, _parity


@pytest.mark.usefixtures("ray_session")
def test_full_outer_matches_oracle_at_sf0001():
    from html_parser_ray.pipelines.relational import events_user_day_activity

    out = _as_df(events_user_day_activity(SF))
    # the join is genuinely OUTER at this sf: both one-sided shapes occur
    assert ((out["n_purchases"] > 0) & (out["n_clicks"] == 0)).any()
    assert ((out["n_purchases"] == 0) & (out["n_clicks"] > 0)).any()
    _parity(
        "events_user_day_activity",
        events_user_day_activity,
        {"events": f"{SF}/events.parquet"},
    )


@pytest.mark.usefixtures("ray_session")
def test_full_outer_one_sided_contexts(tmp_path):
    """A purchase-only context keeps (n, 0), a click-only context keeps
    (0, n), a both-sides context holds both counts, and other event types
    never create a context."""
    from html_parser_ray.pipelines.relational import events_user_day_activity

    d = tmp_path / "sff"
    d.mkdir()
    us = 86_400_000_000
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 1, 2, 3], pa.int64()),
                # user 1 day 0: 2 purchases; day 1: 1 click + 1 purchase;
                # user 2 day 0: 3... no — 1 click only; user 3: view only
                "ts": pa.array(
                    [0, 5, us, us + 1, 0, 0], pa.timestamp("us")
                ),
                "event_type": pa.array(
                    ["purchase", "purchase", "click", "purchase", "click", "view"]
                ),
            }
        ),
        d / "events.parquet",
    )
    out = _as_df(events_user_day_activity(str(d)))
    assert list(map(tuple, out.to_numpy())) == [
        (1, 0, 2, 0),
        (1, 1, 1, 1),
        (2, 0, 0, 1),
    ]


@pytest.mark.usefixtures("ray_session")
def test_mad_matches_oracle_at_sf0001():
    from html_parser_ray.pipelines.relational import supplier_balance_mad_by_nation

    _parity(
        "supplier_balance_mad_by_nation",
        supplier_balance_mad_by_nation,
        {
            "supplier": f"{SF}/supplier.parquet",
            "nation": f"{SF}/nation.parquet",
        },
    )


@pytest.mark.usefixtures("ray_session")
def test_mad_even_count_half_exact(tmp_path):
    """Even-count groups interpolate the two middles — in integer cents the
    median and MAD are exact x.0/x.5 doubles, bit-comparable to SQL."""
    from html_parser_ray.pipelines.relational import supplier_balance_mad_by_nation

    d = tmp_path / "sfm"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "s_nationkey": pa.array([0, 0, 0, 0, 1], pa.int32()),
                # nation 0 cents: 100, 200, 300, 401 -> median 250.0;
                # deviations sorted: 50, 50, 150, 151 -> MAD (50+150)/2 = 100.0
                "s_acctbal": pa.array([1.00, 2.00, 3.00, 4.01, 9.99], pa.float64()),
            }
        ),
        d / "supplier.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], pa.int32()),
                "n_name": pa.array(["ALPHA", "BETA"]),
            }
        ),
        d / "nation.parquet",
    )
    out = _as_df(supplier_balance_mad_by_nation(str(d)))
    assert list(map(tuple, out.to_numpy())) == [
        ("ALPHA", 4, 250.0, 100.0),
        ("BETA", 1, 999.0, 0.0),
    ]


@pytest.mark.usefixtures("ray_session")
def test_csv_roundtrip_matches_oracle_at_sf0001():
    from html_parser_ray.pipelines.text_analysis import html_roundtrip_extract_csv

    _parity(
        "html_roundtrip_extract_csv",
        html_roundtrip_extract_csv,
        {"documents": f"{SF}/documents.parquet"},
    )


@pytest.mark.usefixtures("ray_session")
def test_csv_quoting_survives_hostile_text(tmp_path):
    """Commas, double quotes and the full page markup must survive the
    CSV writer -> Arrow reader -> extraction roundtrip byte-for-byte, and
    a quoted NEWLINE payload must parse (newlines_in_values) — the parser
    then whitespace-normalizes it, same as any in-markup newline."""
    from html_parser_ray.pipelines.text_analysis import html_roundtrip_extract_csv

    d = tmp_path / "sfcsv"
    d.mkdir()
    texts = [
        'she said ""hello"", twice',
        "commas, everywhere, always",
        "plain words only",
        "line one\nline two",  # RFC-4180 quoted newline
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(texts),
            }
        ),
        d / "documents.parquet",
    )
    out = _as_df(html_roundtrip_extract_csv(str(d)))
    assert out["doc_id"].tolist() == [1, 2, 3, 4]
    assert out["main_text"].tolist() == texts[:3] + ["line one line two"]
