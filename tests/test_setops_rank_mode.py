"""Round-5 additions: ordinal windows (RANK/DENSE_RANK/ROW_NUMBER), the
EXCEPT-DISTINCT set operation over a composite key, and mode-per-group —
each sf0.001 oracle parity plus the semantic edge its SQL form pins
(tie sharing, side-bit verdict, deterministic argmax tiebreak)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from _parity import SF, _as_df, _oracle


@pytest.mark.usefixtures("ray_session")
def test_rank_matches_oracle_at_sf0001():
    import __ray_entry__ as entrymod

    from html_parser_ray.pipelines.temporal import orders_rank_in_customer

    out = _as_df(orders_rank_in_customer(SF))
    oracle = _oracle(
        duckdb.connect(),
        {"orders": f"{SF}/orders.parquet"},
        entrymod.oracle_sql()["orders_rank_in_customer"],
    )
    pd.testing.assert_frame_equal(
        out.astype({c: oracle[c].dtype for c in oracle.columns}), oracle
    )


@pytest.mark.usefixtures("ray_session")
def test_rank_tie_semantics(tmp_path):
    """Tied prices: RANK shares and skips (1,1,3), DENSE_RANK compresses
    (1,1,2), ROW_NUMBER breaks the tie by o_orderkey (1,2,3)."""
    from html_parser_ray.pipelines.temporal import orders_rank_in_customer

    d = tmp_path / "sfr"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
                "o_orderkey": pa.array([10, 11, 12, 20], pa.int64()),
                "o_totalprice": pa.array([50.0, 50.0, 10.0, 7.0], pa.float64()),
            }
        ),
        d / "orders.parquet",
    )
    out = _as_df(orders_rank_in_customer(str(d)))
    got = out.set_index("o_orderkey")
    assert got.loc[[10, 11, 12], "price_rank"].tolist() == [1, 1, 3]
    assert got.loc[[10, 11, 12], "price_dense_rank"].tolist() == [1, 1, 2]
    assert got.loc[[10, 11, 12], "price_row_number"].tolist() == [1, 2, 3]
    assert got.loc[20].tolist() == [2, 1, 1, 1]


@pytest.mark.usefixtures("ray_session")
def test_except_matches_oracle_at_sf0001():
    import __ray_entry__ as entrymod

    from html_parser_ray.pipelines.relational import events_purchase_no_click_days

    out = _as_df(events_purchase_no_click_days(SF))
    assert len(out) > 0  # the sf0.001 result is non-trivial by construction
    oracle = _oracle(
        duckdb.connect(),
        {"events": f"{SF}/events.parquet"},
        entrymod.oracle_sql()["events_purchase_no_click_days"],
    )
    pd.testing.assert_frame_equal(
        out.astype({c: oracle[c].dtype for c in oracle.columns}), oracle
    )


@pytest.mark.usefixtures("ray_session")
def test_except_side_bit_verdict(tmp_path):
    """purchase-only day kept; purchase+click day dropped; click-only day
    dropped; other event types ignored entirely."""
    from html_parser_ray.pipelines.relational import events_purchase_no_click_days

    d = tmp_path / "sfe"
    d.mkdir()
    us = 86_400_000_000  # one day in microseconds
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 1, 2, 3], pa.int64()),
                "ts": pa.array(
                    [0, us, us, 2 * us, 0, 0], pa.timestamp("us")
                ),
                "event_type": pa.array(
                    ["purchase", "purchase", "click", "click", "view", "purchase"]
                ),
            }
        ),
        d / "events.parquet",
    )
    out = _as_df(events_purchase_no_click_days(str(d)))
    # user 1 day 0: purchase only -> kept; day 1: both -> dropped;
    # day 2: click only -> dropped; user 2: view only -> ignored;
    # user 3 day 0: purchase only -> kept
    assert list(map(tuple, out.to_numpy())) == [
        (1, "1970-01-01"),
        (3, "1970-01-01"),
    ]


@pytest.mark.usefixtures("ray_session")
def test_mode_matches_oracle_at_sf0001():
    import __ray_entry__ as entrymod

    from html_parser_ray.pipelines.relational import events_type_mode_user

    out = _as_df(events_type_mode_user(SF))
    oracle = _oracle(
        duckdb.connect(),
        {"events": f"{SF}/events.parquet"},
        entrymod.oracle_sql()["events_type_mode_user"],
    )
    pd.testing.assert_frame_equal(
        out.astype({c: oracle[c].dtype for c in oracle.columns}), oracle
    )


@pytest.mark.usefixtures("ray_session")
def test_mode_tiebreak_smaller_user(tmp_path):
    """Equal counts must resolve to the smaller user_id — the rule that
    makes a holistic argmax deterministic under any partitioning."""
    from html_parser_ray.pipelines.relational import events_type_mode_user

    d = tmp_path / "sfm"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["a", "a", "a", "a", "b"]),
                "user_id": pa.array([9, 9, 2, 2, 5], pa.int64()),
            }
        ),
        d / "events.parquet",
    )
    out = _as_df(events_type_mode_user(str(d)))
    assert list(map(tuple, out.to_numpy())) == [("a", 2, 2), ("b", 5, 1)]


@pytest.mark.usefixtures("ray_session")
def test_lag_matches_oracle_at_sf0001():
    import __ray_entry__ as entrymod

    from html_parser_ray.pipelines.temporal import events_user_lag

    out = _as_df(events_user_lag(SF))
    oracle = _oracle(
        duckdb.connect(),
        {"events": f"{SF}/events.parquet"},
        entrymod.oracle_sql()["events_user_lag"],
    )
    pd.testing.assert_frame_equal(
        out.astype({c: oracle[c].dtype for c in oracle.columns}), oracle
    )


@pytest.mark.usefixtures("ray_session")
def test_lag_first_event_excluded_and_gap_exact(tmp_path):
    """A user's first event has no predecessor (SQL's NULL lag -> excluded);
    ties on ts chain by event_id; gaps are exact microseconds."""
    from html_parser_ray.pipelines.temporal import events_user_lag

    d = tmp_path / "sfl"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([10, 11, 12, 20], pa.int64()),
                "user_id": pa.array([1, 1, 1, 2], pa.int64()),
                # events 10 and 11 tie on ts -> chain by event_id
                "ts": pa.array([1000, 1000, 2500, 7], pa.timestamp("us")),
            }
        ),
        d / "events.parquet",
    )
    out = _as_df(events_user_lag(str(d)))
    # user 1: 10 (first, excluded), 11 lags 10 (gap 0), 12 lags 11 (gap 1500)
    # user 2: single event -> excluded
    assert list(map(tuple, out.to_numpy())) == [(11, 10, 0), (12, 11, 1500)]


@pytest.mark.usefixtures("ray_session")
def test_string_agg_matches_oracle_at_sf0001():
    import __ray_entry__ as entrymod

    from html_parser_ray.pipelines.relational import nation_supplier_names

    out = _as_df(nation_supplier_names(SF))
    oracle = _oracle(
        duckdb.connect(),
        {
            "supplier": f"{SF}/supplier.parquet",
            "nation": f"{SF}/nation.parquet",
        },
        entrymod.oracle_sql()["nation_supplier_names"],
    )
    pd.testing.assert_frame_equal(
        out.astype({c: oracle[c].dtype for c in oracle.columns}), oracle
    )
    # the ordered-aggregate property: every roster is name-sorted
    for names in out["names"]:
        parts = names.split(",")
        assert parts == sorted(parts)
