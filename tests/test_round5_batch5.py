"""Round-5 fifth batch: bivariate statistics (Pearson corr + regression per
group), INTERSECT DISTINCT over a composite key, and the referential-
integrity (FK orphan) audit — each sf0.001 oracle parity plus the semantic
edge its form pins (two-limb int->double bit parity, degenerate-variance
NULLs, single-side exclusion, synthetic orphans + NULL child keys)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from _parity import SF, _as_df, _oracle, _parity


def test_two_limb_double_matches_duckdb_expression():
    """The pinned int->double rounding sequence: relational._two_limb_double
    and __ray_entry__._two_limb_sql must produce bit-identical doubles for
    ints far beyond 2^53 (where DuckDB's plain HUGEINT->DOUBLE cast is NOT
    correctly rounded — the very reason the two-limb form exists)."""
    import random
    import struct

    import duckdb

    from __ray_entry__ import _two_limb_sql
    from html_parser_ray.pipelines.relational import _two_limb_double

    con = duckdb.connect()
    rng = random.Random(5)
    exprs, vals = [], []
    for _ in range(300):
        v = rng.getrandbits(rng.randint(4, 94)) * rng.choice([1, -1])
        vals.append(v)
        exprs.append(_two_limb_sql(f"CAST('{v}' AS HUGEINT)"))
    row = con.execute("SELECT " + ", ".join(exprs)).fetchone()
    for v, got in zip(vals, row):
        assert struct.pack("<d", got) == struct.pack("<d", _two_limb_double(v)), v


@pytest.mark.usefixtures("ray_session")
def test_hour_value_corr_matches_oracle_at_sf0001():
    from html_parser_ray.pipelines.relational import events_hour_value_corr

    out = _as_df(events_hour_value_corr(SF))
    # non-degenerate at this sf: every group carries real statistics
    assert out["corr_hour_value"].notna().all()
    assert (out["corr_hour_value"].abs() < 1).all()
    _parity(
        "events_hour_value_corr",
        events_hour_value_corr,
        {"events": f"{SF}/events.parquet"},
    )


@pytest.mark.usefixtures("ray_session")
def test_hour_value_corr_degenerate_groups_yield_nulls(tmp_path):
    """Zero variance on either axis must yield SQL NULLs, matching the
    oracle's CASE guards: a constant-value group (vy=0) keeps its slope
    (hours vary) but has no corr; a single-event group (vx=vy=0) has
    neither; and the oracle agrees cell-for-cell on the same input."""
    import duckdb

    import __ray_entry__ as entrymod
    from html_parser_ray.pipelines.relational import events_hour_value_corr

    d = tmp_path / "sfd"
    d.mkdir()
    h = 3_600_000_000  # one hour in us
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(
                    ["const", "const", "const", "lonely", "vary", "vary", "vary"]
                ),
                "ts": pa.array([0, h, 2 * h, 5 * h, 0, h, 2 * h], pa.timestamp("us")),
                "value": pa.array([7.25, 7.25, 7.25, 1.0, 1.0, 2.0, 4.0]),
            }
        ),
        d / "events.parquet",
    )
    out = _as_df(events_hour_value_corr(str(d)))
    by = out.set_index("event_type")
    assert pd.isna(by.loc["const", "corr_hour_value"])  # vy == 0
    assert by.loc["const", "slope_cents_per_hour"] == 0.0  # vx > 0, num == 0
    assert by.loc["const", "intercept_cents"] == 725.0
    assert pd.isna(by.loc["lonely", "corr_hour_value"])  # single event
    assert pd.isna(by.loc["lonely", "slope_cents_per_hour"])
    assert pd.isna(by.loc["lonely", "intercept_cents"])
    assert by.loc["vary", "corr_hour_value"] > 0.9
    oracle = _oracle(
        duckdb.connect(),
        {"events": str(d / "events.parquet")},
        entrymod.oracle_sql()["events_hour_value_corr"],
    )
    pd.testing.assert_frame_equal(out, oracle)


@pytest.mark.usefixtures("ray_session")
def test_balance_band_intersect_matches_oracle_at_sf0001():
    from html_parser_ray.pipelines.relational import balance_band_intersect

    _parity(
        "balance_band_intersect",
        balance_band_intersect,
        {
            "supplier": f"{SF}/supplier.parquet",
            "customer": f"{SF}/customer.parquet",
        },
    )


@pytest.mark.usefixtures("ray_session")
def test_balance_band_intersect_excludes_single_side_cells(tmp_path):
    """A cell present on one side only is excluded; duplicates within a side
    collapse (DISTINCT semantics); a cell needs BOTH side-bits to survive."""
    from html_parser_ray.pipelines.relational import balance_band_intersect

    d = tmp_path / "sfi"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "s_nationkey": pa.array([1, 1, 2, 3], pa.int32()),
                # nation 1 band 0 (twice -> collapses), nation 2 band 1,
                # nation 3 band -1 (negative-balance banding)
                "s_acctbal": pa.array([10.0, 999.99, 1500.0, -0.01]),
            }
        ),
        d / "supplier.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_nationkey": pa.array([1, 3, 9], pa.int32()),
                "c_acctbal": pa.array([500.0, -400.0, 2.0]),
            }
        ),
        d / "customer.parquet",
    )
    out = _as_df(balance_band_intersect(str(d)))
    # (1,0) both sides; (3,-1) both sides; (2,1) supplier-only and (9,0)
    # customer-only are excluded
    assert list(map(tuple, out.to_numpy())) == [(1, 0), (3, -1)]


@pytest.mark.usefixtures("ray_session")
def test_fk_orphan_audit_matches_oracle_at_sf0001():
    from html_parser_ray.pipelines.hygiene import fk_orphan_audit

    out = _as_df(fk_orphan_audit(SF))
    assert len(out) == 7
    # the committed testdata is referentially clean: the audit must say so
    assert (out["orphan_rows"] == 0).all()
    assert (out["matched_keys"] == out["child_keys"]).all()
    _parity(
        "fk_orphan_audit",
        fk_orphan_audit,
        {
            "customer": f"{SF}/customer.parquet",
            "nation": f"{SF}/nation.parquet",
            "events": f"{SF}/events.parquet",
            "orders": f"{SF}/orders.parquet",
            "lineitem": f"{SF}/lineitem.parquet",
            "part": f"{SF}/part.parquet",
            "supplier": f"{SF}/supplier.parquet",
        },
    )


@pytest.mark.usefixtures("ray_session")
def test_fk_orphan_audit_counts_orphans_and_null_children(tmp_path):
    """Synthetic orphans are counted as rows AND keys; NULL child keys count
    as orphan ROWS but never as keys (SQL COUNT DISTINCT / EXISTS
    semantics); and the oracle agrees on the same input."""
    import duckdb

    import __ray_entry__ as entrymod
    import html_parser_ray.pipelines.hygiene as hyg

    d = tmp_path / "sfo"
    d.mkdir()
    pq.write_table(
        pa.table({"n_nationkey": pa.array([1, 2], pa.int32())}),
        d / "nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                # 5 rows: key 1 resolves (x2), key 7 orphan (x2), one NULL
                "c_nationkey": pa.array([1, 1, 7, 7, None], pa.int32()),
            }
        ),
        d / "customer.parquet",
    )
    edge = ("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey")
    orig = hyg.FK_EDGES
    hyg.FK_EDGES = [edge]
    try:
        out = _as_df(hyg.fk_orphan_audit(str(d)))
        assert list(map(tuple, out.to_numpy())) == [
            (edge[0], 5, 2, 1, 3)  # rows, keys{1,7}, matched{1}, orphans{7,7,NULL}
        ]
        oracle = _oracle(
            duckdb.connect(),
            {
                "customer": str(d / "customer.parquet"),
                "nation": str(d / "nation.parquet"),
            },
            entrymod.oracle_sql()["fk_orphan_audit"],
        )
        pd.testing.assert_frame_equal(
            out.astype({c: oracle[c].dtype for c in oracle.columns}), oracle
        )
    finally:
        hyg.FK_EDGES = orig


# ---------------------------------------------------------------------------
# Property differentials (brute-force serial twins) and hot-key skew stress
# for the fifth-batch operators — the adversarial shapes (ties, degenerate
# groups, one hot key owning ~96% of rows) the fixed tables can't generate.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_H_US = 3_600_000_000

_CORR_ROWS = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),  # event_type (few groups -> ties)
        st.integers(0, 23),  # hour
        st.integers(-10_000, 10_000),  # cents (negative values too)
    ),
    min_size=1,
    max_size=30,
)


def _write_corr_events(d, rows) -> None:
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows]),
                "ts": pa.array([r[1] * _H_US for r in rows], pa.timestamp("us")),
                "value": pa.array([r[2] / 100.0 for r in rows]),
            }
        ),
        str(d / "events.parquet"),
    )


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_CORR_ROWS)
def test_hour_value_corr_matches_serial_twin(tmp_path_factory, rows):
    """The distributed moment partials + combine must equal a serial
    one-pass computation BIT-exactly, for any block split — including
    degenerate (single-row / constant) groups and negative cents."""
    import math

    from html_parser_ray.pipelines.relational import (
        _two_limb_double,
        events_hour_value_corr,
    )

    d = tmp_path_factory.mktemp("corrprop")
    _write_corr_events(d, rows)
    out = _as_df(events_hour_value_corr(str(d)))

    want = []
    for t in sorted({r[0] for r in rows}):
        xs = [h for g, h, _ in rows if g == t]
        ys = [c for g, _, c in rows if g == t]
        n, sx, sy = len(xs), sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        num, vx, vy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
        corr = (
            _two_limb_double(num)
            / math.sqrt(_two_limb_double(vx) * _two_limb_double(vy))
            if vx > 0 and vy > 0
            else None
        )
        slope = _two_limb_double(num) / _two_limb_double(vx) if vx > 0 else None
        inter = (
            (_two_limb_double(sy) - slope * _two_limb_double(sx))
            / _two_limb_double(n)
            if slope is not None
            else None
        )
        want.append((t, n, corr, slope, inter))
    got = [
        (r.event_type, r.n_events, _nan_none(r.corr_hour_value),
         _nan_none(r.slope_cents_per_hour), _nan_none(r.intercept_cents))
        for r in out.itertuples()
    ]
    assert got == want  # tuple == is bit-exact for floats (no tolerance)


def _nan_none(x):
    return None if pd.isna(x) else x


_BAND_ROWS = st.lists(
    st.tuples(st.integers(1, 4), st.integers(-2200, 2200)),  # (nation, balance)
    max_size=16,
)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_BAND_ROWS, _BAND_ROWS)
def test_balance_band_intersect_matches_set_twin(tmp_path_factory, sup, cus):
    """Distributed INTERSECT == plain Python set intersection, including
    empty sides (typed empty frame) and negative-balance banding."""
    import math

    from html_parser_ray.pipelines.relational import balance_band_intersect

    d = tmp_path_factory.mktemp("bandprop")
    pq.write_table(
        pa.table(
            {
                "s_nationkey": pa.array([r[0] for r in sup], pa.int32()),
                "s_acctbal": pa.array([r[1] / 1.0 for r in sup], pa.float64()),
            }
        ),
        str(d / "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_nationkey": pa.array([r[0] for r in cus], pa.int32()),
                "c_acctbal": pa.array([r[1] / 1.0 for r in cus], pa.float64()),
            }
        ),
        str(d / "customer.parquet"),
    )
    out = _as_df(balance_band_intersect(str(d)))
    want = sorted(
        {(n, math.floor(b / 1000.0)) for n, b in sup}
        & {(n, math.floor(b / 1000.0)) for n, b in cus}
    )
    assert list(map(tuple, out.to_numpy())) == want


@pytest.mark.usefixtures("ray_session")
def test_fk_orphan_audit_hot_key_skew(tmp_path):
    """One child key owning ~96% of 50k rows: the value_counts partials must
    collapse the hot key map-side (the exchange carries distincts x blocks,
    never rows) and the audit must stay exact vs a serial count."""
    import html_parser_ray.pipelines.hygiene as hyg

    d = tmp_path / "sfskew"
    d.mkdir()
    n_hot, n_cold = 48_000, 2_000
    n = n_hot + n_cold
    idx = np.arange(n, dtype=np.int64)
    user = np.where(idx < n_hot, 1, 2 + (idx % 40))  # users 2..41
    pq.write_table(
        pa.table({"user_id": pa.array(user, pa.int64())}), d / "events.parquet"
    )
    # parents: hot key 1 resolves; odd cold users are orphans
    parents = np.array([1] + [u for u in range(2, 42) if u % 2 == 0], np.int64)
    pq.write_table(
        pa.table({"c_custkey": pa.array(parents, pa.int64())}),
        d / "customer.parquet",
    )
    edge = ("events.user_id->customer.c_custkey", "events", "user_id", "customer", "c_custkey")
    orig = hyg.FK_EDGES
    hyg.FK_EDGES = [edge]
    try:
        out = _as_df(hyg.fk_orphan_audit(str(d)))
    finally:
        hyg.FK_EDGES = orig
    orphan_users = [u for u in range(2, 42) if u % 2 == 1]
    orphan_rows = int(np.isin(user, orphan_users).sum())
    assert list(map(tuple, out.to_numpy())) == [
        (edge[0], n, 41, 1 + 20, orphan_rows)
    ]
