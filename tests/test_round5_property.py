"""Property-based differentials for the round-5 operators whose semantics
have a trivially-correct brute-force twin: random tiny inputs, the
distributed pipeline must match an O(n^2)/O(n log n) in-memory oracle
exactly. Complements the sf0.001 DuckDB parity tests with adversarial
shapes (ties, gaps, empty sides, single users) the fixed tables can't
generate. Example counts stay small because every example runs a real
Ray pipeline."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from _parity import _as_df

_DAY_US = 86_400_000_000

# (user, ts-in-quarter-days, type) event rows: few users and a tiny time
# domain force tied timestamps, shared days, and cross-user interleaving
_EVENTS = st.lists(
    st.tuples(
        st.integers(1, 3),  # user_id
        st.integers(0, 12),  # ts in quarter-day ticks
        st.sampled_from(["click", "purchase", "view"]),
    ),
    min_size=1,
    max_size=24,
)


def _write_events(d, rows) -> str:
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(1, len(rows) + 1), pa.int64()),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [r[1] * (_DAY_US // 4) for r in rows], pa.timestamp("us")
                ),
                "event_type": pa.array([r[2] for r in rows]),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_EVENTS)
def test_band_join_matches_nested_loop(tmp_path_factory, rows):
    """events_click_attribution == the O(n^2) nested-loop band join."""
    from html_parser_ray.pipelines.temporal import events_click_attribution

    d = tmp_path_factory.mktemp("band")
    _write_events(d, rows)
    out = _as_df(events_click_attribution(str(d)))
    want = []
    for i, (u, t, k) in enumerate(rows, start=1):
        if k != "purchase":
            continue
        ts = t * (_DAY_US // 4)
        n = sum(
            1
            for (u2, t2, k2) in rows
            if k2 == "click"
            and u2 == u
            and ts - _DAY_US <= t2 * (_DAY_US // 4) < ts
        )
        want.append((i, n))
    assert list(map(tuple, out.to_numpy())) == sorted(want)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_EVENTS)
def test_islands_match_brute_force(tmp_path_factory, rows):
    """events_user_active_islands == per-user consecutive-run scan."""
    from html_parser_ray.pipelines.temporal import events_user_active_islands

    d = tmp_path_factory.mktemp("isl")
    _write_events(d, rows)
    out = _as_df(events_user_active_islands(str(d)))
    want = []
    for u in sorted({r[0] for r in rows}):
        days = sorted({r[1] // 4 for r in rows if r[0] == u})
        start = prev = days[0]
        for day in days[1:]:
            if day != prev + 1:
                want.append((u, start, prev, prev - start + 1))
                start = day
            prev = day
        want.append((u, start, prev, prev - start + 1))
    assert list(map(tuple, out.to_numpy())) == want


_POINTS = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6)),  # (price, size) tiny grid
    min_size=1,
    max_size=40,
)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_POINTS)
def test_pareto_front_matches_quadratic(tmp_path_factory, pts):
    """part_pareto_front == the O(n^2) NOT-EXISTS domination scan; the tiny
    grid forces duplicate points and dense domination chains."""
    from html_parser_ray.pipelines.relational import part_pareto_front

    d = tmp_path_factory.mktemp("par")
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(1, len(pts) + 1), pa.int64()),
                "p_retailprice": pa.array([float(p) for p, _ in pts]),
                "p_size": pa.array([s for _, s in pts], pa.int64()),
            }
        ),
        os.path.join(d, "part.parquet"),
    )
    out = _as_df(part_pareto_front(str(d)))
    keep = []
    for i, (p, s) in enumerate(pts):
        dominated = any(
            (p2 <= p and s2 >= s) and (p2 < p or s2 > s) for (p2, s2) in pts
        )
        if not dominated:
            keep.append(i + 1)
    assert out["p_partkey"].tolist() == keep


_DOCS = st.lists(
    st.lists(st.sampled_from("abcd"), min_size=1, max_size=20), min_size=1, max_size=8
)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_DOCS)
def test_chunk_dupes_match_brute_force(tmp_path_factory, word_lists):
    """doc_chunk_dupes (k=2) == the per-doc stride-2 chunk scan; the 4-word
    alphabet forces heavy cross-doc chunk collisions."""
    from collections import defaultdict

    from html_parser_ray.pipelines.dedup import doc_chunk_dupes

    k = 2
    d = tmp_path_factory.mktemp("chk")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(1, len(word_lists) + 1), pa.int64()),
                "text": pa.array([" ".join(ws) for ws in word_lists]),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    out = _as_df(doc_chunk_dupes(str(d), k=k))
    occ: dict[str, list[int]] = defaultdict(list)
    for i, ws in enumerate(word_lists, start=1):
        for s in range(0, len(ws) - k + 1, k):
            occ[" ".join(ws[s : s + k])].append(i)
    want = sorted(
        (ch, len(set(ids)), len(ids))
        for ch, ids in occ.items()
        if len(set(ids)) >= 2
    )
    assert list(map(tuple, out.to_numpy())) == want


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(0, 9), min_size=1, max_size=20),
    st.integers(2, 5),
)
def test_ntile_matches_sql_rule(tmp_path_factory, values, tiles):
    """events_value_ntile == the closed-form SQL rule on one group: sort by
    (value, id), first n%tiles buckets take ceil(n/tiles) rows."""
    from html_parser_ray.pipelines.temporal import events_value_ntile

    d = tmp_path_factory.mktemp("nt")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(1, len(values) + 1), pa.int64()),
                "event_type": pa.array(["x"] * len(values)),
                "value": pa.array([v / 10 for v in values]),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    out = _as_df(events_value_ntile(str(d), tiles=tiles)).set_index("event_id")
    order = sorted(range(len(values)), key=lambda i: (values[i], i))
    n = len(values)
    q, r = divmod(n, tiles)
    want = {}
    rank = 0
    for tile in range(1, tiles + 1):
        size = q + 1 if tile <= r else q
        for _ in range(size):
            if rank < n:
                want[order[rank] + 1] = tile
                rank += 1
    assert {i: int(out.loc[i, "tile"]) for i in want} == want


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_EVENTS)
def test_transitions_match_brute_force(tmp_path_factory, rows):
    """events_type_transitions == per-user sorted consecutive-pair count."""
    from collections import Counter

    from html_parser_ray.pipelines.temporal import events_type_transitions

    d = tmp_path_factory.mktemp("tr")
    _write_events(d, rows)
    out = _as_df(events_type_transitions(str(d)))
    want: Counter = Counter()
    for u in {r[0] for r in rows}:
        ev = sorted(
            (t, i + 1, k) for i, (u2, t, k) in enumerate(rows) if u2 == u
        )
        for (_, _, a), (_, _, b) in zip(ev, ev[1:]):
            want[(a, b)] += 1
    assert list(map(tuple, out.to_numpy())) == [
        (a, b, n) for (a, b), n in sorted(want.items())
    ]


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_EVENTS)
def test_cooccurrence_matches_brute_force(tmp_path_factory, rows):
    """events_type_cooccurrence == distinct-triple pair count."""
    from collections import Counter
    from itertools import combinations

    from html_parser_ray.pipelines.temporal import events_type_cooccurrence

    d = tmp_path_factory.mktemp("co")
    _write_events(d, rows)
    out = _as_df(events_type_cooccurrence(str(d)))
    contexts: dict = {}
    for u, t, k in rows:
        contexts.setdefault((u, t // 4), set()).add(k)
    want: Counter = Counter()
    for types in contexts.values():
        for a, b in combinations(sorted(types), 2):
            want[(a, b)] += 1
    assert list(map(tuple, out.to_numpy())) == [
        (a, b, n) for (a, b), n in sorted(want.items())
    ]


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_EVENTS)
def test_full_outer_matches_brute_force(tmp_path_factory, rows):
    """events_user_day_activity == dict-count FULL OUTER with 0 fills."""
    from collections import Counter

    from html_parser_ray.pipelines.relational import events_user_day_activity

    d = tmp_path_factory.mktemp("fo")
    _write_events(d, rows)
    out = _as_df(events_user_day_activity(str(d)))
    p: Counter = Counter()
    c: Counter = Counter()
    for u, t, k in rows:
        if k == "purchase":
            p[(u, t // 4)] += 1
        elif k == "click":
            c[(u, t // 4)] += 1
    keys = sorted(set(p) | set(c))
    want = [(u, day, p.get((u, day), 0), c.get((u, day), 0)) for u, day in keys]
    assert list(map(tuple, out.to_numpy())) == want


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(1, 4), st.integers(0, 400)),  # (custkey, cents)
        min_size=1,
        max_size=24,
    )
)
def test_above_avg_matches_exact_rational(tmp_path_factory, orders):
    """orders_above_customer_avg == the exact-rational strict compare."""
    from fractions import Fraction

    from html_parser_ray.pipelines.relational import orders_above_customer_avg

    d = tmp_path_factory.mktemp("avg")
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(1, len(orders) + 1), pa.int64()),
                "o_custkey": pa.array([c for c, _ in orders], pa.int64()),
                "o_totalprice": pa.array([v / 100 for _, v in orders]),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )
    out = _as_df(orders_above_customer_avg(str(d)))
    sums: dict = {}
    for c, v in orders:
        n, s = sums.get(c, (0, 0))
        sums[c] = (n + 1, s + v)
    want = [
        (i + 1, c, v)
        for i, (c, v) in enumerate(orders)
        if Fraction(v) > Fraction(sums[c][1], sums[c][0])
    ]
    assert list(map(tuple, out.to_numpy())) == want


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 500)),  # (nation, cents)
        min_size=1,
        max_size=20,
    )
)
def test_mad_matches_statistics_median(tmp_path_factory, balances):
    """supplier_balance_mad_by_nation == statistics.median twins."""
    from statistics import median

    from html_parser_ray.pipelines.relational import supplier_balance_mad_by_nation

    d = tmp_path_factory.mktemp("mad")
    pq.write_table(
        pa.table(
            {
                "s_nationkey": pa.array([n for n, _ in balances], pa.int32()),
                "s_acctbal": pa.array([v / 100 for _, v in balances]),
            }
        ),
        os.path.join(d, "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1, 2], pa.int32()),
                "n_name": pa.array(["N_A", "N_B", "N_C"]),
            }
        ),
        os.path.join(d, "nation.parquet"),
    )
    out = _as_df(supplier_balance_mad_by_nation(str(d)))
    want = []
    for idx, name in enumerate(["N_A", "N_B", "N_C"]):
        vals = [float(v) for n, v in balances if n == idx]
        if not vals:
            continue
        med = median(vals)
        want.append((name, len(vals), med, median(abs(v - med) for v in vals)))
    assert list(map(tuple, out.to_numpy())) == want
