"""Hot-key skew stress for the round-5 partition-keyed operators: ONE user
owns ~96% of a 50k-event table (the documented worst case — skew bound =
the largest single key's rows landing on one partition). The operators must
stay correct (DuckDB parity) and the per-partition kernels must stay
vectorized enough to finish promptly on the hot partition."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from _parity import _as_df, _oracle

N_HOT = 48_000
N_COLD = 2_000


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    """50k events: user 1 owns 48k rows; 40 cold users share the rest.
    Deterministic splitmix-ish value/type assignment, many ts ties."""
    d = tmp_path_factory.mktemp("skew")
    n = N_HOT + N_COLD
    rng = np.arange(n, dtype=np.int64)
    user = np.where(rng < N_HOT, 1, 2 + (rng % 40))
    # coarse ts grid (1000 distinct instants over ~3 days) -> heavy ties
    ts = (rng * 2_654_435_761 % 1000) * 250_000_000
    types = np.array(["click", "purchase", "view", "signup"], dtype=object)[
        rng % 4
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(rng + 1, pa.int64()),
                "user_id": pa.array(user, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "event_type": pa.array(types),
                "value": pa.array((rng % 97) / 10.0),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


def _check(query: str, fn, skew_dir: str) -> None:
    import __ray_entry__ as entrymod

    out = _as_df(fn(skew_dir))
    oracle = _oracle(
        duckdb.connect(),
        {"events": f"{skew_dir}/events.parquet"},
        entrymod.oracle_sql()[query],
    )
    assert len(out) == len(oracle) and len(out) > 0
    pd.testing.assert_frame_equal(
        out.astype({c: oracle[c].dtype for c in oracle.columns}), oracle
    )


@pytest.mark.usefixtures("ray_session")
def test_band_join_survives_hot_user(skew_dir):
    """48k of 50k events on one user: the rank-sweep band join is still one
    lexsort + cumsum on the hot partition — never the O(hot^2) nested loop
    a naive band join would pay (~10^9 comparisons)."""
    from html_parser_ray.pipelines.temporal import events_click_attribution

    _check("events_click_attribution", events_click_attribution, skew_dir)


@pytest.mark.usefixtures("ray_session")
def test_ntile_survives_hot_group(skew_dir):
    from html_parser_ray.pipelines.temporal import events_value_ntile

    _check("events_value_ntile", events_value_ntile, skew_dir)


@pytest.mark.usefixtures("ray_session")
def test_transitions_survive_hot_user(skew_dir):
    from html_parser_ray.pipelines.temporal import events_type_transitions

    _check("events_type_transitions", events_type_transitions, skew_dir)


@pytest.mark.usefixtures("ray_session")
def test_islands_survive_hot_user(skew_dir):
    from html_parser_ray.pipelines.temporal import events_user_active_islands

    _check("events_user_active_islands", events_user_active_islands, skew_dir)


@pytest.mark.usefixtures("ray_session")
def test_full_outer_survives_hot_user(skew_dir):
    from html_parser_ray.pipelines.relational import events_user_day_activity

    _check("events_user_day_activity", events_user_day_activity, skew_dir)
