"""Unit tests for the window / anti-join / Q3 operators added late round 3:
``orders_running_total`` (SUM OVER PARTITION BY), ``customers_inactive_by_
nation`` (distributed anti-join), and ``shipping_priority`` (three-table join
+ global top-k). Tiny planted corpora with hand-computed expectations; the
sf0.01 DuckDB oracles in __ray_entry__ are the scale check."""

from __future__ import annotations

import pandas as pd
import pytest


def _df(result):
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    return result


@pytest.fixture(scope="module")
def tpch_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tpch_tiny")
    ts = pd.Timestamp
    pd.DataFrame(
        {
            "n_nationkey": [0, 1, 2],
            "n_name": ["ALPHA", "BETA", "GAMMA"],
        }
    ).to_parquet(d / "nation.parquet")
    pd.DataFrame(
        {
            "c_custkey": [1, 2, 3, 4],
            "c_name": ["a", "b", "c", "d"],
            "c_nationkey": [0, 0, 1, 2],
            "c_acctbal": [10.00, 20.50, 5.25, 7.00],
            "c_mktsegment": ["BUILDING", "BUILDING", "MACHINERY", "BUILDING"],
        }
    ).to_parquet(d / "customer.parquet")
    pd.DataFrame(
        {
            # cust 1: three orders, middle-date one written FIRST and a
            # same-date tie (orders 101/103 on 2000-03-01; key breaks it);
            # cust 2: one recent order (active); cust 3: old order only;
            # cust 4: no orders at all
            "o_orderkey": [103, 101, 102, 201, 301],
            "o_custkey": [1, 1, 1, 2, 3],
            "o_orderstatus": ["F"] * 5,
            "o_totalprice": [100.00, 50.25, 10.00, 99.99, 1.01],
            "o_orderdate": [
                ts("2000-03-01"),
                ts("2000-03-01"),
                ts("1999-01-01"),
                ts("2001-05-01"),
                ts("1998-01-01"),
            ],
            "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "1-URGENT", "5-LOW"],
        }
    ).to_parquet(d / "orders.parquet")
    pd.DataFrame(
        {
            # nation 0: four suppliers (even n -> ceil-rank picks the LOWER
            # middle for q50); nation 1: a single supplier
            "s_suppkey": [1, 2, 3, 4, 5],
            "s_nationkey": [0, 0, 0, 0, 1],
            "s_acctbal": [1.00, 2.00, 3.00, 4.00, 9.99],
        }
    ).to_parquet(d / "supplier.parquet")
    pd.DataFrame(
        {
            # two lines for order 101 past the ship cutoff (must pre-sum),
            # one line before the cutoff (must drop), one line for order 201
            # (order date past the cutoff -> order drops), one line for 301
            # (customer not in BUILDING -> drops at the semi-join)
            "l_orderkey": [101, 101, 101, 201, 301],
            "l_partkey": [1] * 5,
            "l_suppkey": [1] * 5,
            "l_linenumber": [1, 2, 3, 1, 1],
            "l_quantity": [1.0] * 5,
            "l_extendedprice": [100.00, 200.00, 999.00, 50.00, 70.00],
            "l_discount": [0.10, 0.00, 0.00, 0.00, 0.00],
            "l_tax": [0.0] * 5,
            "l_returnflag": ["N"] * 5,
            "l_linestatus": ["O"] * 5,
            "l_shipdate": [
                ts("2000-06-01"),
                ts("2000-07-01"),
                ts("1997-01-01"),
                ts("2001-06-01"),
                ts("2000-06-01"),
            ],
        }
    ).to_parquet(d / "lineitem.parquet")
    return str(d)


@pytest.mark.usefixtures("ray_session")
def test_orders_running_total(tpch_dir):
    from html_parser_ray.pipelines.temporal import orders_running_total

    out = _df(orders_running_total(tpch_dir, num_partitions=4))
    got = {
        (r.o_custkey, r.o_orderkey): r.cum_spend_cents for r in out.itertuples()
    }
    # cust 1 in DATE order: 102 (1999, 1000c) -> 101 (2000-03, +5025)
    # -> 103 (same date, higher key, +10000)
    assert got == {
        (1, 102): 1000,
        (1, 101): 6025,
        (1, 103): 16025,
        (2, 201): 9999,
        (3, 301): 101,
    }
    # output ordering contract: (custkey, orderkey)
    assert list(out["o_orderkey"]) == [101, 102, 103, 201, 301]


@pytest.mark.usefixtures("ray_session")
def test_customers_inactive_by_nation(tpch_dir):
    from html_parser_ray.pipelines.relational import customers_inactive_by_nation

    out = _df(
        customers_inactive_by_nation(tpch_dir, cutoff="2001-01-01", num_partitions=4)
    )
    # cust 2 ordered in 2001 -> active; 1 (ALPHA), 3 (BETA), 4 (GAMMA,
    # order-less) are inactive
    got = {
        r.n_name: (r.n_inactive, r.acctbal_cents_sum) for r in out.itertuples()
    }
    assert got == {"ALPHA": (1, 1000), "BETA": (1, 525), "GAMMA": (1, 700)}
    assert list(out["n_name"]) == ["ALPHA", "BETA", "GAMMA"]


@pytest.mark.usefixtures("ray_session")
def test_shipping_priority(tpch_dir):
    from html_parser_ray.pipelines.relational import shipping_priority

    out = _df(
        shipping_priority(
            tpch_dir, segment="BUILDING", cutoff="2000-06-01", k=10, num_partitions=4
        )
    )
    # only order 101 survives: date < cutoff, customer 1 is BUILDING, and ONE
    # of its three lines ships strictly after the cutoff (the 2000-06-01 line
    # equals the cutoff and drops — Q3 uses strict >).
    # revenue_bp = 20000c * (100-0)
    assert len(out) == 1
    r = out.iloc[0]
    assert r["o_orderkey"] == 101
    assert r["revenue_bp"] == 20000 * 100
    assert r["o_orderpriority"] == "2-HIGH"
    assert pd.Timestamp(r["o_orderdate"]) == pd.Timestamp("2000-03-01")


@pytest.mark.usefixtures("ray_session")
def test_shipping_priority_topk_truncates(tpch_dir):
    from html_parser_ray.pipelines.relational import shipping_priority

    out = _df(
        shipping_priority(
            tpch_dir, segment="BUILDING", cutoff="2002-01-01", k=1, num_partitions=4
        )
    )
    # cutoff past every date: no lineitem ships after it -> empty result
    assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
def test_orders_rollup(tpch_dir):
    from html_parser_ray.pipelines.relational import orders_rollup

    out = _df(orders_rollup(tpch_dir))
    got = {
        (r.o_orderpriority, r.o_orderstatus): (r.n_orders, r.total_cents)
        for r in out.itertuples()
    }
    # finest level: every order is status F
    assert got[("1-URGENT", "F")] == (2, 10000 + 9999)
    assert got[("2-HIGH", "F")] == (1, 5025)
    # rollup levels derive exactly from the finest
    assert got[("1-URGENT", "ALL")] == (2, 19999)
    assert got[("ALL", "ALL")] == (5, 10000 + 5025 + 1000 + 9999 + 101)
    # 4 finest (priority, F) + 4 per-priority + 1 grand total
    assert len(out) == 4 + 4 + 1


@pytest.mark.usefixtures("ray_session")
def test_supplier_balance_quantiles_by_nation(tpch_dir):
    from html_parser_ray.pipelines.relational import (
        supplier_balance_quantiles_by_nation,
    )

    out = _df(supplier_balance_quantiles_by_nation(tpch_dir, num_partitions=4))
    got = {
        r.n_name: (r.n_suppliers, r.q25, r.q50, r.q75) for r in out.itertuples()
    }
    # ceil-rank rule on [100,200,300,400]: q25 -> rank 1, q50 -> rank 2
    # (LOWER middle, matching quantile_disc), q75 -> rank 3
    assert got["ALPHA"] == (4, 100, 200, 300)
    # single value: every quantile is it
    assert got["BETA"] == (1, 999, 999, 999)
    assert list(out["n_name"]) == ["ALPHA", "BETA"]


@pytest.mark.usefixtures("ray_session")
def test_orders_late_ship_counts(tpch_dir):
    from html_parser_ray.pipelines.relational import orders_late_ship_counts

    out = _df(orders_late_ship_counts(tpch_dir, cutoff="2000-06-15"))
    got = {
        r.o_orderpriority: (r.n_orders, r.n_with_late, r.late_lines)
        for r in out.itertuples()
    }
    # 101 (2-HIGH) has ONE line after 2000-06-15; 201 (1-URGENT) has one late
    # line; order 103 (1-URGENT) and 102 (3-MEDIUM) have none -> LEFT rows kept
    assert got["1-URGENT"] == (2, 1, 1)
    assert got["2-HIGH"] == (1, 1, 1)
    assert got["3-MEDIUM"] == (1, 0, 0)
    assert got["5-LOW"] == (1, 0, 0)


@pytest.mark.usefixtures("ray_session")
def test_orders_trailing_spend(tpch_dir):
    from html_parser_ray.pipelines.temporal import orders_trailing_spend

    out = _df(orders_trailing_spend(tpch_dir, window=2, num_partitions=4))
    got = {
        (r.o_custkey, r.o_orderkey): r.trailing_spend_cents
        for r in out.itertuples()
    }
    # cust 1 date order: 102 (1000) -> 101 (5025) -> 103 (10000); window 2
    assert got == {
        (1, 102): 1000,
        (1, 101): 1000 + 5025,
        (1, 103): 5025 + 10000,
        (2, 201): 9999,
        (3, 301): 101,
    }


@pytest.mark.usefixtures("ray_session")
def test_events_cohort_retention(tmp_path):
    import numpy as np

    from html_parser_ray.pipelines.temporal import events_cohort_retention

    mon = pd.Timestamp("2024-01-01")  # a Monday
    rows = [
        # user 1: first week W0 (two events, one on Sunday -> same week),
        # returns in W2
        (1, mon + pd.Timedelta(hours=5)),
        (1, mon + pd.Timedelta(days=6, hours=23)),
        (1, mon + pd.Timedelta(weeks=2, days=3)),
        # user 2: W0 only
        (2, mon + pd.Timedelta(days=2)),
        # user 3: first seen W1
        (3, mon + pd.Timedelta(weeks=1)),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    df.to_parquet(tmp_path / "events.parquet")

    out = events_cohort_retention(str(tmp_path), num_partitions=4)
    w0 = int(
        (np.datetime64("2024-01-01", "D") - np.datetime64(0, "D")).astype(int)
    )
    got = {
        (r.cohort_day, r.week_offset): r.n_users for r in out.itertuples()
    }
    assert got == {
        (w0, 0): 2,       # users 1 and 2 active in their first week
        (w0, 2): 1,       # user 1 returns two weeks later
        (w0 + 7, 0): 1,   # user 3's cohort starts the next Monday
    }
    assert list(out.columns) == ["cohort_day", "week_offset", "n_users"]


@pytest.mark.usefixtures("ray_session")
def test_events_type_pivot(tmp_path):
    from html_parser_ray.pipelines.relational import events_type_pivot

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "ts": [base] * 5,
            "event_type": ["click", "click", "view", "purchase", "unknown"],
        }
    )
    df.to_parquet(tmp_path / "events.parquet")
    out = _df(events_type_pivot(str(tmp_path), num_partitions=4))
    got = out.set_index("user_id")
    # user 1: 2 clicks + 1 view; user 2: 1 purchase; the out-of-vocabulary
    # type is dropped (fixed pivot vocabulary), but the user row survives
    assert got.loc[1, ["n_click", "n_view", "n_purchase"]].tolist() == [2, 1, 0]
    assert got.loc[2, ["n_purchase", "n_click"]].tolist() == [1, 0]
    assert list(out.columns) == [
        "user_id", "n_click", "n_error", "n_purchase", "n_signup", "n_view",
    ]


@pytest.mark.usefixtures("ray_session")
def test_doc_stratified_sample(tmp_path):
    import hashlib

    from html_parser_ray.pipelines.text_analysis import doc_stratified_sample

    # lang a: 6 docs (cap 3 -> md5-lowest three win); lang b: 2 docs (all kept)
    df = pd.DataFrame(
        {
            "doc_id": list(range(10, 16)) + [20, 21],
            "lang": ["a"] * 6 + ["b"] * 2,
            "text": ["x"] * 8,
        }
    )
    df.to_parquet(tmp_path / "documents.parquet")
    out = _df(doc_stratified_sample(str(tmp_path), per_group=3))
    by_hash = sorted(range(10, 16), key=lambda i: hashlib.md5(str(i).encode()).hexdigest()[:16])
    assert sorted(out[out["lang"] == "a"]["doc_id"]) == sorted(by_hash[:3])
    assert sorted(out[out["lang"] == "b"]["doc_id"]) == [20, 21]
