"""Tour of the round-5 SQL-parity operator families: ordinal windows
(RANK / DENSE_RANK / ROW_NUMBER), the LAG offset window, EXCEPT-DISTINCT
set operations, mode-per-group, the order-sensitive string_agg, sequence
pattern matching (MATCH_RECOGNIZE-lite), inter-arrival-time statistics,
and FIRST_VALUE/LAST_VALUE endpoint windows.

Each runs over a tiny synthetic table written to a temp dir (the operators
read ``{sf_dir}/<table>.parquet``, same contract as the driver queries) and
asserts the semantic edge its SQL form pins: rank-tie sharing, first-event
exclusion, the side-bit EXCEPT verdict, the deterministic argmax tiebreak,
and in-group ordering inside the concatenated aggregate.
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _df(out) -> pd.DataFrame:
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    return out.reset_index(drop=True)


def run(smoke: bool = False) -> None:
    # the tour is already smoke-sized (tiny synthetic tables); the flag is
    # accepted for harness uniformity
    del smoke
    from html_parser_ray.pipelines.relational import (
        events_purchase_no_click_days,
        events_type_mode_user,
        nation_supplier_names,
    )
    from html_parser_ray.pipelines.temporal import (
        events_interarrival_stats,
        events_sequence_match,
        events_user_lag,
        orders_first_last,
        orders_rank_in_customer,
    )

    rng = np.random.RandomState(11)
    us_day = 86_400_000_000

    with tempfile.TemporaryDirectory() as d:
        # orders: customer 1 has a price tie; customer 2 a single order
        pq.write_table(
            pa.table(
                {
                    "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
                    "o_orderkey": pa.array([10, 11, 12, 20], pa.int64()),
                    "o_totalprice": pa.array([50.0, 50.0, 10.0, 7.0]),
                    # same date for 10/11 — the endpoint window breaks the
                    # tie by o_orderkey (10 first)
                    "o_orderdate": pa.array([0, 0, 5, 9], pa.timestamp("us")),
                }
            ),
            f"{d}/orders.parquet",
        )
        ranks = _df(orders_rank_in_customer(d)).set_index("o_orderkey")
        print("ordinal windows:\n", ranks.to_string())
        assert ranks.loc[[10, 11, 12], "price_rank"].tolist() == [1, 1, 3]
        assert ranks.loc[[10, 11, 12], "price_dense_rank"].tolist() == [1, 1, 2]

        # events: per-user lag chains (ts strictly increasing within a user —
        # the ts-tie edge is pinned by tests/test_setops_rank_mode.py);
        # purchase/click day overlap for the EXCEPT verdict
        n = 60
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(n), pa.int64()),
                    "user_id": pa.array([i % 3 for i in range(n)], pa.int64()),
                    "ts": pa.array(
                        [int(i // 3) * us_day // 4 for i in range(n)],
                        pa.timestamp("us"),
                    ),
                    "event_type": pa.array(
                        [
                            ["purchase", "click", "view"][i % 3]
                            if i % 7
                            else "purchase"
                            for i in range(n)
                        ]
                    ),
                    "value": pa.array(rng.uniform(1, 9, size=n).round(2)),
                }
            ),
            f"{d}/events.parquet",
        )

        lag = _df(events_user_lag(d))
        print("lag rows:", len(lag))
        assert (lag["gap_us"] >= 0).all()  # ordered by (ts, event_id)
        assert len(lag) == n - 3  # exactly one first-event exclusion per user

        exc = _df(events_purchase_no_click_days(d))
        print("purchase-no-click (user, day) pairs:", len(exc))

        mode = _df(events_type_mode_user(d))
        print("mode per type:\n", mode.to_string(index=False))
        assert set(mode["event_type"]) == {"purchase", "click", "view"}

        # sixth batch: sequence matching, inter-arrival stats, endpoints
        seq = _df(events_sequence_match(d))
        print("view->purchase converters:", len(seq))
        assert (seq["n_matches"] >= 1).all()

        gaps = _df(events_interarrival_stats(d))
        print("inter-arrival stats:\n", gaps.to_string(index=False))
        # every same-(user,type) chain is ts-ordered: max <= sum, counts > 0
        assert (gaps["max_gap_us"] <= gaps["sum_gap_us"]).all()

        fl = _df(orders_first_last(d)).set_index("o_custkey")
        print("order endpoints:\n", fl.to_string())
        # cust 1: date tie at 0 -> key 10 (50.0) first; key 12 (10.0) last
        assert fl.loc[1, "first_price"] == 50.0
        assert fl.loc[1, "last_price"] == 10.0
        assert fl.loc[2, "first_price"] == fl.loc[2, "last_price"] == 7.0

        # suppliers: two nations, rosters must concatenate name-ordered
        pq.write_table(
            pa.table(
                {
                    "s_nationkey": pa.array([0, 0, 0, 1], pa.int32()),
                    "s_name": pa.array(["s-c", "s-a", "s-b", "s-z"]),
                }
            ),
            f"{d}/supplier.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "n_nationkey": pa.array([0, 1], pa.int32()),
                    "n_name": pa.array(["ALPHA", "BETA"]),
                }
            ),
            f"{d}/nation.parquet",
        )
        rosters = _df(nation_supplier_names(d))
        print("rosters:\n", rosters.to_string(index=False))
        assert rosters.set_index("n_name").loc["ALPHA", "names"] == "s-a,s-b,s-c"

    print("windows_and_setops: OK")


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    run()
    ray.shutdown()
