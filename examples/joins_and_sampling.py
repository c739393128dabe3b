"""Tour of the round-5 join, dedup and sampling additions: the range (band)
attribution join, the FULL OUTER join, the Pareto skyline, the decorrelated
correlated subquery, passage-level chunk dedup, NTILE bucketing,
gaps-and-islands streaks, Markov transitions, co-occurrence contexts,
median+MAD robust stats, deterministic weighted sampling, and the CSV
source roundtrip.

Each runs over a tiny synthetic table written to a temp dir (the operators
read ``{sf_dir}/<table>.parquet``, same contract as the driver queries) and
asserts the semantic edge its form pins: half-open window boundaries,
one-sided outer contexts, tie-keeping domination, strict-average exactness,
trailing-partial chunk drops, the NTILE remainder rule, gap splitting,
cross-user chain isolation, once-per-context pair counting, .5-exact
medians, hash-deterministic weighted picks, and RFC-4180 quoting survival.
"""

from __future__ import annotations

import os
import sys
import tempfile

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
    from html_parser_ray.pipelines.dedup import doc_chunk_dupes
    from html_parser_ray.pipelines.relational import (
        events_user_day_activity,
        orders_above_customer_avg,
        part_pareto_front,
        supplier_balance_mad_by_nation,
    )
    from html_parser_ray.pipelines.temporal import (
        events_click_attribution,
        events_type_cooccurrence,
        events_type_transitions,
        events_user_active_islands,
        events_value_ntile,
    )
    from html_parser_ray.pipelines.text_analysis import (
        doc_weighted_sample,
        html_roundtrip_extract_csv,
    )

    us = 86_400_000_000  # one day in microseconds

    with tempfile.TemporaryDirectory() as d:
        # ---- events table exercising every temporal edge ------------------
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(list(range(1, 9)), pa.int64()),
                    "user_id": pa.array([1, 1, 1, 1, 1, 2, 2, 3], pa.int64()),
                    "ts": pa.array(
                        [
                            10 * us,          # 1: purchase (user 1)
                            9 * us,           # 2: click exactly W before -> in
                            10 * us - 1,      # 3: click just inside -> in
                            10 * us,          # 4: click AT purchase -> out
                            11 * us,          # 5: view next day
                            0,                # 6: user 2 click day 0
                            2 * us,           # 7: user 2 click day 2 (gap!)
                            5,                # 8: user 3 purchase, clickless
                        ],
                        pa.timestamp("us"),
                    ),
                    "event_type": pa.array(
                        [
                            "purchase",
                            "click",
                            "click",
                            "click",
                            "view",
                            "click",
                            "click",
                            "purchase",
                        ]
                    ),
                    "value": pa.array([0.1, 0.2, 0.3, 0.4, 0.5, 0.5, 0.7, 0.8]),
                }
            ),
            os.path.join(d, "events.parquet"),
        )

        # range (band) join: half-open [ts-W, ts) window, per user
        att = _df(events_click_attribution(d))
        assert list(map(tuple, att.to_numpy())) == [(1, 2), (8, 0)]
        print("events_click_attribution: boundary clicks", att.to_numpy().tolist())

        # FULL OUTER join: one-sided contexts coalesce to 0
        act = _df(events_user_day_activity(d))
        day9 = act[(act.user_id == 1) & (act.day == 9)].iloc[0]
        assert (day9.n_purchases, day9.n_clicks) == (0, 2)  # click-only day
        day10 = act[(act.user_id == 1) & (act.day == 10)].iloc[0]
        assert (day10.n_purchases, day10.n_clicks) == (1, 1)  # both sides
        print("events_user_day_activity: outer contexts", len(act))

        # gaps-and-islands: user 2's 1-day gap splits the streak
        isl = _df(events_user_active_islands(d))
        u2 = isl[isl.user_id == 2]
        assert len(u2) == 2 and u2.n_days.tolist() == [1, 1]
        print("events_user_active_islands:", len(isl), "runs")

        # Markov transitions: chains never cross users
        tr = _df(events_type_transitions(d))
        assert ("click", "click") in set(zip(tr.prev_type, tr.event_type))
        print("events_type_transitions:", len(tr), "pairs")

        # co-occurrence: once per (user, day) context
        co = _df(events_type_cooccurrence(d))
        assert ("click", "purchase") in set(zip(co.type_a, co.type_b))
        print("events_type_cooccurrence:", len(co), "pairs")

        # NTILE: first n%tiles buckets take the remainder
        nt = _df(events_value_ntile(d))
        assert set(nt.tile) <= {1, 2, 3, 4}
        print("events_value_ntile:", len(nt), "assignments")

    with tempfile.TemporaryDirectory() as d:
        # ---- orders: the decorrelated correlated subquery ------------------
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
                    "o_custkey": pa.array([7, 7, 7, 9], pa.int64()),
                    # cust 7 avg = 20.00 exactly; only 30.00 exceeds it
                    "o_totalprice": pa.array([10.0, 20.0, 30.0, 5.0]),
                }
            ),
            os.path.join(d, "orders.parquet"),
        )
        above = _df(orders_above_customer_avg(d))
        assert list(map(tuple, above.to_numpy())) == [(3, 7, 3000)]
        print("orders_above_customer_avg: strict >, exact integer cents")

        # ---- part: tie-keeping Pareto skyline ------------------------------
        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
                    "p_retailprice": pa.array([10.0, 10.0, 5.0, 6.0]),
                    "p_size": pa.array([50, 50, 20, 20], pa.int64()),
                }
            ),
            os.path.join(d, "part.parquet"),
        )
        front = _df(part_pareto_front(d))
        assert front.p_partkey.tolist() == [1, 2, 3]  # identical pts both stay
        print("part_pareto_front: tie-keeping domination,", len(front), "on front")

        # ---- supplier/nation: median + MAD ---------------------------------
        pq.write_table(
            pa.table(
                {
                    "s_nationkey": pa.array([0, 0, 0, 0], pa.int32()),
                    "s_acctbal": pa.array([1.00, 2.00, 3.00, 4.01]),
                }
            ),
            os.path.join(d, "supplier.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "n_nationkey": pa.array([0], pa.int32()),
                    "n_name": pa.array(["ALPHA"]),
                }
            ),
            os.path.join(d, "nation.parquet"),
        )
        mad = _df(supplier_balance_mad_by_nation(d))
        assert list(map(tuple, mad.to_numpy())) == [("ALPHA", 4, 250.0, 100.0)]
        print("supplier_balance_mad_by_nation: .5-exact even-count medians")

    with tempfile.TemporaryDirectory() as d:
        # ---- documents: chunk dedup, weighted sample, CSV roundtrip --------
        shared = "a b c d e f g h"  # exactly one k=8 chunk
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array(
                        [
                            shared + " tail1 tail2",  # partial tail dropped
                            shared + " " + shared,     # chunk twice
                            "different words entirely here now ok fine yes",
                        ]
                    ),
                    "n_chars": pa.array([40, 33, 46], pa.int64()),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        chunks = _df(doc_chunk_dupes(d))
        assert list(map(tuple, chunks.to_numpy())) == [(shared, 2, 3)]
        print("doc_chunk_dupes: trailing partials dropped, distinct-doc gate")

        sample = _df(doc_weighted_sample(d, k=2))
        assert len(sample) == 2  # deterministic md5//weight priority pick
        print("doc_weighted_sample: picked", sample.doc_id.tolist())

        csv_out = _df(html_roundtrip_extract_csv(d))
        assert csv_out.main_text.tolist()[1] == shared + " " + shared
        print("html_roundtrip_extract_csv: RFC-4180 roundtrip exact")

    print("joins_and_sampling tour: all semantic edges hold")


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    run()
    ray.shutdown()
