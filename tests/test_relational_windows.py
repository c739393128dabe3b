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
