"""Differential tests for the window operators: random small orders tables,
the distributed pipelines vs independent single-process pandas twins (the
twins use pandas' own window machinery, not the pipelines' partition logic,
so a hash-partitioning or ordering bug cannot cancel out)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _df(result):
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    return result


@st.composite
def orders_tables(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    custkeys = draw(
        st.lists(st.integers(1, 6), min_size=n, max_size=n)
    )
    # duplicate dates are common on purpose: they exercise the orderkey
    # tie-break inside one (custkey, date) run
    day_offsets = draw(st.lists(st.integers(0, 20), min_size=n, max_size=n))
    prices = draw(
        st.lists(
            st.integers(1, 99_999), min_size=n, max_size=n
        )  # cents, exact
    )
    base = pd.Timestamp("2000-01-01")
    return pd.DataFrame(
        {
            "o_orderkey": np.arange(1, n + 1, dtype="int64"),
            "o_custkey": pd.array(custkeys, dtype="int64"),
            "o_orderdate": [base + pd.Timedelta(days=d) for d in day_offsets],
            "o_totalprice": [p / 100.0 for p in prices],
        }
    )


def _twin_running(df: pd.DataFrame) -> dict:
    df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]).copy()
    df["cents"] = np.rint(df["o_totalprice"].to_numpy() * 100).astype("int64")
    df["cum"] = df.groupby("o_custkey")["cents"].cumsum()
    return dict(zip(df["o_orderkey"], df["cum"]))


def _twin_trailing(df: pd.DataFrame, window: int) -> dict:
    df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]).copy()
    df["cents"] = np.rint(df["o_totalprice"].to_numpy() * 100).astype("int64")
    roll = (
        df.groupby("o_custkey")["cents"]
        .rolling(window, min_periods=1)
        .sum()
        .reset_index(level=0, drop=True)
        .astype("int64")
    )
    return dict(zip(df["o_orderkey"], roll))


@pytest.mark.usefixtures("ray_session")
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(df=orders_tables(), window=st.integers(1, 4))
def test_windows_match_pandas_twin(df, window, tmp_path_factory):
    from html_parser_ray.pipelines.temporal import (
        orders_running_total,
        orders_trailing_spend,
    )

    d = tmp_path_factory.mktemp("orders_diff")
    df.to_parquet(d / "orders.parquet")

    run = _df(orders_running_total(str(d), num_partitions=4))
    got_run = dict(zip(run["o_orderkey"], run["cum_spend_cents"]))
    assert got_run == _twin_running(df)

    trail = _df(orders_trailing_spend(str(d), window=window, num_partitions=4))
    got_trail = dict(zip(trail["o_orderkey"], trail["trailing_spend_cents"]))
    assert got_trail == _twin_trailing(df, window)
