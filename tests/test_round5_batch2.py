"""Round-5 second batch: passage-level chunk dedup, the decorrelated
correlated subquery, the skyline (Pareto front), Markov transition counts,
NTILE equi-depth bucketing, and gaps-and-islands streaks — each sf0.001
oracle parity plus the semantic edge its SQL form pins (trailing-partial
chunks dropped, strict-inequality exactness, tie-keeping domination,
cross-user chain isolation, NTILE's first-r-buckets rule, gap splitting)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from _parity import SF, _as_df, _parity


@pytest.mark.usefixtures("ray_session")
def test_chunk_dupes_matches_oracle_at_sf0001():
    from html_parser_ray.pipelines.dedup import doc_chunk_dupes

    _parity(
        "doc_chunk_dupes", doc_chunk_dupes, {"documents": f"{SF}/documents.parquet"}
    )


@pytest.mark.usefixtures("ray_session")
def test_chunk_dupes_trailing_partial_and_threshold(tmp_path):
    """Only FULL k-word chunks count (trailing partials are dropped), a
    chunk needs >= min_docs DISTINCT docs (repeats within one doc don't
    qualify it), and n_occurrences counts every occurrence."""
    from html_parser_ray.pipelines.dedup import doc_chunk_dupes

    d = tmp_path / "sfc"
    d.mkdir()
    shared = "a b c d e f g h"  # exactly one k=8 chunk
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        # doc 1: shared chunk + 7-word tail (dropped partial)
                        shared + " t1 t2 t3 t4 t5 t6 t7",
                        # doc 2: the shared chunk twice (2 occurrences)
                        shared + " " + shared,
                        # doc 3: its own chunk twice — repeated WITHIN one
                        # doc only, so n_docs=1 -> filtered out
                        "z1 z2 z3 z4 z5 z6 z7 z8 z1 z2 z3 z4 z5 z6 z7 z8",
                    ]
                ),
            }
        ),
        d / "documents.parquet",
    )
    out = _as_df(doc_chunk_dupes(str(d)))
    assert list(map(tuple, out.to_numpy())) == [(shared, 2, 3)]


@pytest.mark.usefixtures("ray_session")
def test_above_customer_avg_matches_oracle_at_sf0001():
    from html_parser_ray.pipelines.relational import orders_above_customer_avg

    _parity(
        "orders_above_customer_avg",
        orders_above_customer_avg,
        {"orders": f"{SF}/orders.parquet"},
    )


@pytest.mark.usefixtures("ray_session")
def test_above_customer_avg_strict_and_exact(tmp_path):
    """The comparison is STRICT (an order equal to its customer's average
    is excluded) and exact in integer cents — 10.00/20.00/30.00 averages
    to exactly 20.00, which float averaging could miss."""
    from html_parser_ray.pipelines.relational import orders_above_customer_avg

    d = tmp_path / "sfa"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
                "o_custkey": pa.array([7, 7, 7, 9], pa.int64()),
                # cust 7 avg = 20.00 exactly; only the 30.00 order exceeds it
                # cust 9: single order equals its own avg -> excluded
                "o_totalprice": pa.array([10.0, 20.0, 30.0, 5.0], pa.float64()),
            }
        ),
        d / "orders.parquet",
    )
    out = _as_df(orders_above_customer_avg(str(d)))
    assert list(map(tuple, out.to_numpy())) == [(3, 7, 3000)]


@pytest.mark.usefixtures("ray_session")
def test_pareto_front_matches_oracle_at_sf0001():
    from html_parser_ray.pipelines.relational import part_pareto_front

    _parity(
        "part_pareto_front", part_pareto_front, {"part": f"{SF}/part.parquet"}
    )


@pytest.mark.usefixtures("ray_session")
def test_pareto_front_tie_keeping_domination(tmp_path):
    """Identical points never eliminate each other (both stay on the
    front); strict domination on either axis with >= on the other does
    eliminate; incomparable points coexist."""
    from html_parser_ray.pipelines.relational import part_pareto_front

    d = tmp_path / "sfp"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                # (cents, size): 1&2 identical -> both kept; 3 dominated by
                # 1 (same price, smaller size); 4 cheaper but smaller ->
                # incomparable, kept; 5 dominated by 4 (pricier, same size)
                "p_retailprice": pa.array([10.0, 10.0, 10.0, 5.0, 6.0]),
                "p_size": pa.array([50, 50, 49, 20, 20], pa.int64()),
            }
        ),
        d / "part.parquet",
    )
    out = _as_df(part_pareto_front(str(d)))
    assert out["p_partkey"].tolist() == [1, 2, 4]


@pytest.mark.usefixtures("ray_session")
def test_transitions_match_oracle_at_sf0001():
    from html_parser_ray.pipelines.temporal import events_type_transitions

    _parity(
        "events_type_transitions",
        events_type_transitions,
        {"events": f"{SF}/events.parquet"},
    )


@pytest.mark.usefixtures("ray_session")
def test_transitions_chain_isolation_and_tie_order(tmp_path):
    """Chains never cross users (user boundaries emit no pair), a user's
    first event has no predecessor, and ties on ts chain by event_id."""
    from html_parser_ray.pipelines.temporal import events_type_transitions

    d = tmp_path / "sft"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([10, 11, 12, 20], pa.int64()),
                "user_id": pa.array([1, 1, 1, 2], pa.int64()),
                # events 10 and 11 tie on ts -> ordered by event_id
                "ts": pa.array([1000, 1000, 2000, 5], pa.timestamp("us")),
                "event_type": pa.array(["a", "b", "a", "z"]),
            }
        ),
        d / "events.parquet",
    )
    out = _as_df(events_type_transitions(str(d)))
    # user 1: a->b (tie chained by id), b->a; user 2: single event, no pair
    assert list(map(tuple, out.to_numpy())) == [("a", "b", 1), ("b", "a", 1)]


@pytest.mark.usefixtures("ray_session")
def test_ntile_matches_oracle_at_sf0001():
    from html_parser_ray.pipelines.temporal import events_value_ntile

    _parity(
        "events_value_ntile",
        events_value_ntile,
        {"events": f"{SF}/events.parquet"},
    )


@pytest.mark.usefixtures("ray_session")
def test_ntile_first_buckets_take_remainder(tmp_path):
    """SQL NTILE over n=6, tiles=4: the first n%tiles=2 buckets hold
    ceil(n/tiles)=2 rows, the rest hold 1 -> tiles 1,1,2,2,3,4 in value
    order; ties on value break by event_id."""
    from html_parser_ray.pipelines.temporal import events_value_ntile

    d = tmp_path / "sfn"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                "event_type": pa.array(["x"] * 6),
                # 5 and 6 tie on value -> event_id orders them
                "value": pa.array([0.1, 0.2, 0.3, 0.4, 0.5, 0.5]),
            }
        ),
        d / "events.parquet",
    )
    out = _as_df(events_value_ntile(str(d)))
    assert out.sort_values("event_id")["tile"].tolist() == [1, 1, 2, 2, 3, 4]


@pytest.mark.usefixtures("ray_session")
def test_islands_match_oracle_at_sf0001():
    from html_parser_ray.pipelines.temporal import events_user_active_islands

    _parity(
        "events_user_active_islands",
        events_user_active_islands,
        {"events": f"{SF}/events.parquet"},
    )


@pytest.mark.usefixtures("ray_session")
def test_islands_gap_split_and_day_dedup(tmp_path):
    """Multiple events on one day collapse to one active day, a 1-day gap
    splits the run, and runs never cross users."""
    from html_parser_ray.pipelines.temporal import events_user_active_islands

    d = tmp_path / "sfi"
    d.mkdir()
    us = 86_400_000_000  # one day in microseconds
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 1, 1, 2], pa.int64()),
                # user 1: days 0,0,1 (dup day 0), gap, days 3,4; user 2: day 4
                "ts": pa.array(
                    [0, 10, us, 3 * us, 4 * us + 5, 4 * us],
                    pa.timestamp("us"),
                ),
            }
        ),
        d / "events.parquet",
    )
    out = _as_df(events_user_active_islands(str(d)))
    assert list(map(tuple, out.to_numpy())) == [
        (1, 0, 1, 2),
        (1, 3, 4, 2),
        (2, 4, 4, 1),
    ]
