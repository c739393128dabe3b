"""Event sessionization — the windowed/stateful streaming-style operator.

Sessions = per-user event runs split at gaps > ``gap_minutes``. Round-2 shape
(the 100 TB form): hash-partition events by ``user_id`` (all of one user's
events co-locate in one partition), then ONE vectorized pandas pass per
partition — sort by (user_id, ts), ``np.diff`` the timestamps, and count
session breaks where the gap exceeds the threshold *within* a user run. This
replaces the round-1 ``groupby(user_id).map_groups`` (one Python dispatch per
~3-row user group — a scale-killer at real user cardinality; VERDICT.md §wrong
item 4). The SQL oracle uses lag/window functions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

import pyarrow as pa

from html_parser_ray.pipelines.shuffle import hash_partitioned, read_table, sort_output


def events_sessionize(
    sf_dir: str, gap_minutes: int = 30, num_partitions: int = 16
) -> "ray.data.Dataset | pd.DataFrame":
    """Per-user session stats: (user_id, n_events, n_sessions)."""
    ds = read_table(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        users = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "n_events": pd.Series(dtype="int64"),
                    "n_sessions": pd.Series(dtype="int64"),
                }
            )
        # a "break" is a gap > threshold between consecutive events of the
        # SAME user; user boundaries never count as breaks
        same_user = users[1:] == users[:-1]
        is_break = same_user & (np.diff(ts) > gap)
        brk = pd.DataFrame({"user_id": users[1:][is_break]})
        breaks_per_user = brk.groupby("user_id").size() if len(brk) else pd.Series(dtype="int64")
        out = (
            g.groupby("user_id", as_index=False)
            .agg(n_events=("ts", "size"))
            .set_index("user_id")
        )
        out["n_sessions"] = breaks_per_user.reindex(out.index).fillna(0).astype("int64") + 1
        return out.reset_index().astype(
            {"user_id": "int64", "n_events": "int64", "n_sessions": "int64"}
        )

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("n_events", pa.int64()), ("n_sessions", pa.int64())]
    )
    return sort_output(
        hash_partitioned(ds, ["user_id"], per_partition, num_partitions),
        ["user_id"],
        out_schema,
    )
