"""Round-5 operator tour: table profiling, Bloom-filtered semi-join, and
exact-integer outlier detection — the audit passes a pipeline runs when a
NEW data source lands, before any training-data job touches it.

Builds a tiny events/orders/customer trio with planted nulls, duplicate
values and one extreme outlier, then runs:

  1. events_profile        — per-column rows / nulls / exact distincts;
  2. orders_bloom_semi_join — segment-filtered order rollup through a
                              Bloom pre-filter + exact co-partitioned verify;
  3. events_value_outliers  — |x - mean| > 3*std per event type, computed
                              entirely in integer arithmetic.

Run:

    python examples/profiling_and_skew.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(smoke: bool = False) -> None:
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from html_parser_ray.pipelines.relational import (
        events_profile,
        events_value_outliers,
        orders_bloom_semi_join,
    )

    n = 60
    rng = np.random.RandomState(4)
    values = np.round(rng.uniform(1, 20, size=n), 2)
    values[7] = 9_999.99  # the planted outlier
    events = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "event_type": pa.array(["view" if i % 2 else "click" for i in range(n)]),
            "props": pa.array(["{}" if i % 3 else None for i in range(n)]),
            "ts": pa.array([i * 10**6 for i in range(n)], pa.timestamp("us")),
            "user_id": pa.array([i % 9 for i in range(n)], pa.int64()),
            "value": pa.array(values, pa.float64()),
        }
    )
    customers = pd.DataFrame(
        {
            "c_custkey": range(20),
            "c_mktsegment": ["BUILDING" if i % 4 == 0 else "OTHER" for i in range(20)],
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": range(100),
            "o_custkey": [i % 20 for i in range(100)],
            "o_orderpriority": [f"{1 + i % 3}-P" for i in range(100)],
            "o_totalprice": np.round(rng.uniform(10, 500, size=100), 2),
        }
    )

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(events, f"{d}/events.parquet")
        customers.to_parquet(f"{d}/customer.parquet")
        orders.to_parquet(f"{d}/orders.parquet")

        profile = events_profile(d)
        print("profile:\n", profile.to_string(index=False))
        by_col = profile.set_index("col_name")
        assert by_col.loc["props", "n_null"] == n - sum(1 for i in range(n) if i % 3)
        assert by_col.loc["event_type", "n_distinct"] == 2

        semi = orders_bloom_semi_join(d)
        print("bloom semi-join rollup:\n", semi.to_string(index=False))
        building = set(customers.loc[customers["c_mktsegment"] == "BUILDING", "c_custkey"])
        expected = sum(1 for k in orders["o_custkey"] if k in building)
        assert int(semi["n_orders"].sum()) == expected

        outliers = events_value_outliers(d)
        if not isinstance(outliers, pd.DataFrame):
            outliers = outliers.to_pandas()
        print("outliers:\n", outliers.to_string(index=False))
        assert 7 in set(outliers["event_id"])  # the planted spike

    print("profiling_and_skew: OK")


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    run()
    ray.shutdown()
