"""Round-5 sixth batch: sequence pattern matching (MATCH_RECOGNIZE-lite),
inter-arrival-time statistics, and FIRST_VALUE/LAST_VALUE endpoint windows —
each sf0.001 oracle parity plus the semantic edge its form pins
(non-overlapping match counting, tie ordering by event_id, same-(user,type)
gap masking across partition layouts, date-tie endpoint picks) and a
hot-key skew stress."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from _parity import SF, _as_df, _parity

_H_US = 3_600_000_000


@pytest.mark.usefixtures("ray_session")
def test_sequence_match_matches_oracle_at_sf0001():
    from html_parser_ray.pipelines.temporal import events_sequence_match

    _parity(
        "events_sequence_match",
        events_sequence_match,
        {"events": f"{SF}/events.parquet"},
    )


@pytest.mark.usefixtures("ray_session")
def test_interarrival_stats_matches_oracle_at_sf0001():
    from html_parser_ray.pipelines.temporal import events_interarrival_stats

    _parity(
        "events_interarrival_stats",
        events_interarrival_stats,
        {"events": f"{SF}/events.parquet"},
    )


@pytest.mark.usefixtures("ray_session")
def test_orders_first_last_matches_oracle_at_sf0001():
    from html_parser_ray.pipelines.temporal import orders_first_last

    _parity(
        "orders_first_last",
        orders_first_last,
        {"orders": f"{SF}/orders.parquet"},
    )


def _write_events(d, rows) -> None:
    """rows: (event_id, user_id, ts_us, event_type)."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[3] for r in rows]),
            }
        ),
        str(d / "events.parquet"),
    )


@pytest.mark.usefixtures("ray_session")
def test_sequence_match_nonoverlap_and_tie_order(tmp_path):
    """Two semantics pins: (a) match counting is leftmost NON-overlapping —
    'vvpvp' counts 2, not 3; (b) ties on ts order by event_id, so a
    same-timestamp (purchase, view) pair with ids out of insertion order
    still sequences as the ids dictate."""
    from html_parser_ray.pipelines.temporal import events_sequence_match

    d = tmp_path / "seq"
    d.mkdir()
    rows = [
        # user 1: v v p v p -> 2 non-overlapping matches
        (1, 1, 0, "view"),
        (2, 1, 1, "view"),
        (3, 1, 2, "purchase"),
        (4, 1, 3, "view"),
        (5, 1, 4, "purchase"),
        # user 2: same ts for both; event_id order puts view BEFORE
        # purchase -> 'vp' -> 1 match (insertion order says otherwise)
        (11, 2, 100, "purchase"),
        (10, 2, 100, "view"),
        # user 3: view never converts -> excluded (zero matches)
        (20, 3, 0, "view"),
        (21, 3, 1, "click"),
    ]
    _write_events(d, rows)
    out = _as_df(events_sequence_match(str(d)))
    assert list(map(tuple, out.to_numpy())) == [(1, 2), (2, 1)]


@pytest.mark.usefixtures("ray_session")
def test_interarrival_gaps_never_cross_users_or_types(tmp_path):
    """Gap chains are per (user, type): interleaved users and types on one
    timeline must not leak gaps across either key, and the partition count
    must not change the answer (gap pairs co-locate by user)."""
    from html_parser_ray.pipelines.temporal import events_interarrival_stats

    d = tmp_path / "gaps"
    d.mkdir()
    rows = [
        # user 1 clicks at 0, 10, 30 -> gaps 10, 20; view at 5 (no gap)
        (1, 1, 0, "click"),
        (2, 1, 5 * _H_US, "view"),
        (3, 1, 10, "click"),
        (4, 1, 30, "click"),
        # user 2 click at 20 -> would make a bogus 10us gap if chained
        # across users
        (5, 2, 20, "click"),
    ]
    _write_events(d, rows)
    for parts in (1, 7):
        out = _as_df(events_interarrival_stats(str(d), num_partitions=parts))
        assert list(map(tuple, out.to_numpy())) == [("click", 2, 30, 20)]


@pytest.mark.usefixtures("ray_session")
def test_first_last_date_ties_break_by_orderkey(tmp_path):
    """Orders on the same date order by o_orderkey; single-order customers
    get first == last; output is one row per customer."""
    from html_parser_ray.pipelines.temporal import orders_first_last

    d = tmp_path / "fl"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([3, 1, 2, 9], pa.int64()),
                "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
                "o_orderdate": pa.array([0, 0, _H_US, 5], pa.timestamp("us")),
                "o_totalprice": pa.array([30.0, 10.0, 20.0, 99.5]),
            }
        ),
        str(d / "orders.parquet"),
    )
    out = _as_df(orders_first_last(str(d)))
    # cust 1: date ties at 0 -> key 1 first (10.0); last is key 2 at t=1h
    assert list(map(tuple, out.to_numpy())) == [
        (1, 3, 10.0, 20.0),
        (2, 1, 99.5, 99.5),
    ]


# ---------------------------------------------------------------------------
# Property differentials (serial twins over randomized inputs) and skew.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_EVT_ROWS = st.lists(
    st.tuples(
        st.integers(1, 3),  # user_id (few users -> long sequences)
        st.integers(0, 50),  # ts in us (small range -> frequent ties)
        st.sampled_from(["view", "purchase", "click"]),
    ),
    min_size=1,
    max_size=40,
)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_EVT_ROWS)
def test_sequence_match_matches_serial_twin(tmp_path_factory, rows):
    """Distributed count == a serial re.findall over the (ts, event_id)-
    sorted per-user string, for any block split, with heavy ts ties."""
    import re

    from html_parser_ray.pipelines.temporal import events_sequence_match

    d = tmp_path_factory.mktemp("seqprop")
    recs = [(i, u, t, ty) for i, (u, t, ty) in enumerate(rows)]
    _write_events(d, recs)
    out = _as_df(events_sequence_match(str(d)))

    want = []
    for u in sorted({r[1] for r in recs}):
        seq = "".join(
            ty[0] for _, _, _, ty in sorted(
                (r for r in recs if r[1] == u), key=lambda r: (r[2], r[0])
            )
        )
        n = len(re.findall("v[^p]*p", seq))
        if n >= 1:
            want.append((u, n))
    assert list(map(tuple, out.to_numpy())) == want


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_EVT_ROWS)
def test_interarrival_matches_serial_twin(tmp_path_factory, rows):
    from html_parser_ray.pipelines.temporal import events_interarrival_stats

    d = tmp_path_factory.mktemp("gapprop")
    recs = [(i, u, t, ty) for i, (u, t, ty) in enumerate(rows)]
    _write_events(d, recs)
    out = _as_df(events_interarrival_stats(str(d)))

    gaps: dict[str, list[int]] = {}
    for u in {r[1] for r in recs}:
        for ty in {r[3] for r in recs}:
            ts = sorted(
                (r[2], r[0]) for r in recs if r[1] == u and r[3] == ty
            )
            for a, b in zip(ts, ts[1:]):
                gaps.setdefault(ty, []).append(b[0] - a[0])
    want = [
        (ty, len(v), sum(v), max(v)) for ty, v in sorted(gaps.items())
    ]
    assert list(map(tuple, out.to_numpy())) == want


@pytest.mark.usefixtures("ray_session")
def test_first_last_hot_customer_skew(tmp_path):
    """One customer owning ~96% of 50k orders: the exchange co-locates the
    hot key in one partition (partition memory = hot-key rows, documented
    bound) and the endpoint picks stay exact vs a direct computation."""
    from html_parser_ray.pipelines.temporal import orders_first_last

    d = tmp_path / "flskew"
    d.mkdir()
    n_hot, n_cold = 48_000, 2_000
    n = n_hot + n_cold
    idx = np.arange(n, dtype=np.int64)
    cust = np.where(idx < n_hot, 1, 2 + (idx % 40))
    # dates descend so the FIRST order is the LAST row written; many ties
    date = (n - idx) // 7
    price = (idx % 1000) / 1.0
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(idx, pa.int64()),
                "o_custkey": pa.array(cust, pa.int64()),
                "o_orderdate": pa.array(date, pa.timestamp("us")),
                "o_totalprice": pa.array(price, pa.float64()),
            }
        ),
        str(d / "orders.parquet"),
    )
    out = _as_df(orders_first_last(str(d))).set_index("o_custkey")
    df = pd.DataFrame(
        {"k": idx, "c": cust, "d": date, "p": price}
    ).sort_values(["c", "d", "k"])
    g = df.groupby("c")
    first = g.head(1).set_index("c")["p"]
    last = g.tail(1).set_index("c")["p"]
    assert (out["n_orders"] == g.size()).all()
    assert (out["first_price"] == first).all()
    assert (out["last_price"] == last).all()
