"""Event sessionization — the windowed/stateful streaming-style operator.

Sessions = per-user event runs split at gaps > ``gap_minutes``. Expressed
Ray-Data-first as ``groupby(user_id).map_groups`` (hash shuffle on the user
key co-locates each user's events; sort + gap scan inside the group is
vectorized numpy). The SQL oracle uses lag/window functions — this is the
classic "window op as groupby.map_groups" mapping documented in SURVEY §2.8.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def events_sessionize(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Per-user session stats: (user_id, n_events, n_sessions)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_user(group: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(group["ts"].to_numpy())
        n = len(ts)
        if n == 0:
            return pd.DataFrame(columns=["user_id", "n_events", "n_sessions"])
        breaks = int((np.diff(ts) > gap).sum()) if n > 1 else 0
        return pd.DataFrame(
            {
                "user_id": [group["user_id"].iloc[0]],
                "n_events": [n],
                "n_sessions": [breaks + 1],
            }
        )

    df = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
    )
    return (
        df.astype({"user_id": "int64", "n_events": "int64", "n_sessions": "int64"})
        .sort_values("user_id")
        .reset_index(drop=True)
    )
