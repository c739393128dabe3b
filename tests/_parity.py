"""Shared sf0.001 oracle-parity helpers for the operator test suites
(one copy — the comparison policy lives here, not per-file)."""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _oracle(con, views: dict[str, str], sql: str) -> pd.DataFrame:
    for name, path in views.items():
        con.execute(f"DROP VIEW IF EXISTS {name}")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).df()


def _as_df(out) -> pd.DataFrame:
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    return out.reset_index(drop=True)


def _parity(query: str, fn, views: dict[str, str]) -> None:
    """Run the Ray operator and its committed oracle SQL side-by-side at
    sf0.001 and require exact frame equality (and a non-trivial result).
    Both sides are pinned to SF: the operator reads SF directly and the
    caller's `views` must point at the same SF parquet files."""
    import __ray_entry__ as entrymod

    out = _as_df(fn(SF))
    assert len(out) > 0  # sf0.001 is non-trivial for every parity-tested query
    oracle = _oracle(duckdb.connect(), views, entrymod.oracle_sql()[query])
    pd.testing.assert_frame_equal(
        out.astype({c: oracle[c].dtype for c in oracle.columns}), oracle
    )
