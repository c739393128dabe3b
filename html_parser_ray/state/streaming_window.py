"""Streaming hopping-window aggregation with EVENT-TIME WATERMARKS — the
"streaming window" operator tier (SURVEY §7 tier (c): raw Ray actors where
the Dataset API can't express the semantics).

``events_hopping_counts`` computes the same windows over a *bounded* table.
A streaming ingest is different in kind: micro-batches arrive over time,
window state must OUTLIVE any single Dataset execution, results must be
emitted *while the stream runs* (not at EOF), and late events — those
arriving after their window's watermark passed — must be counted and
dropped, not silently merged into an already-emitted window (emitting twice
is the retraction problem this design avoids).

Design:

- ``HoppingWindowShard`` (``@ray.remote``): holds open ``(win_start,
  event_type) -> (n, cents)`` accumulators for its hash shard. ``add`` is
  commutative (counts sum), so concurrent feeders cannot change totals;
  ONLY the late/on-time split depends on the watermark at arrival — exactly
  the part of streaming semantics that is inherently order-sensitive.
- Watermark: ``max event ts seen - allowed_lateness``, advanced by the
  feeder after each micro-batch (the add itself carries the PREVIOUS
  watermark — a window can never be late to the batch that advances past
  it). ``advance`` finalizes every window whose END <= watermark; finalized
  windows are immutable (a later add to one counts as late).
- Sharding: md5 of the (window, type) key — uniform, skew-free.

Partitioning assumption (documented per the task contract): one feeder per
source partition, each feeding roughly-ordered events (a Kafka/Kinesis
consumer shape); the global watermark of a multi-feeder deployment is the
MIN over feeders. In this sandbox the driver iterating the events table in
file order is the stand-in single source.

``streaming_hopping_counts`` reproduces ``events_hopping_counts`` exactly
when nothing is late (the events table is ts-sorted, so any lateness >= 0
drops nothing — asserted), sharing its DuckDB oracle; the late-drop
semantics are pinned by unit tests that shuffle the stream.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray


@ray.remote(num_cpus=0.25)
class HoppingWindowShard:
    """Open-window accumulators + finalized results for one hash shard."""

    def __init__(self, size_s: int) -> None:
        self.size_s = size_s
        self.open: dict[tuple[int, str], list[int]] = {}
        self.final: list[tuple[int, str, int, int]] = []
        self.late_events = 0

    def add(
        self,
        wins: list[int],
        types: list[str],
        counts: list[int],
        cents: list[int],
        watermark_s: float,
    ) -> None:
        size = self.size_s
        for w, t, n, c in zip(wins, types, counts, cents):
            if w + size <= watermark_s:
                self.late_events += n  # window already finalized: drop, count
                continue
            slot = self.open.get((w, t))
            if slot is None:
                self.open[(w, t)] = [n, c]
            else:
                slot[0] += n
                slot[1] += c

    def advance(self, watermark_s: float) -> int:
        """Finalize every open window whose end <= watermark; returns how
        many were emitted (progress signal for the feeder)."""
        size = self.size_s
        done = [k for k in self.open if k[0] + size <= watermark_s]
        for k in done:
            n, c = self.open.pop(k)
            self.final.append((k[0], k[1], n, c))
        return len(done)

    def flush(self) -> int:
        return self.advance(float("inf"))

    def results(self) -> "list[tuple[int, str, int, int]]":
        return self.final

    def late_count(self) -> int:
        return self.late_events


def _shard_of(win: int, typ: str, num_shards: int) -> int:
    h = hashlib.md5(f"{win}|{typ}".encode()).digest()
    return int.from_bytes(h[:4], "big") % num_shards


class StreamingHoppingWindows:
    """Facade owning the shard actors; feed micro-batches, read results."""

    def __init__(self, size_s: int, hop_s: int, lateness_s: int, num_shards: int = 8):
        assert size_s % hop_s == 0, "window size must be a multiple of the hop"
        self.size_s = size_s
        self.hop_s = hop_s
        self.k = size_s // hop_s
        self.lateness_s = lateness_s
        self.num_shards = num_shards
        self.shards = [HoppingWindowShard.remote(size_s) for _ in range(num_shards)]
        self._max_ts = float("-inf")
        self._watermark = float("-inf")

    def feed(self, ts_s: np.ndarray, types: "list[str]", cents: np.ndarray) -> None:
        """One micro-batch: expand events into their k covering windows,
        pre-aggregate per (window, type) — the combiner — and ship partials
        to the shards UNDER THE CURRENT watermark, then advance it."""
        if len(ts_s) == 0:
            return
        base = (ts_s // self.hop_s) * self.hop_s
        offs = np.arange(self.k, dtype=np.int64) * self.hop_s
        wins = np.repeat(base, self.k) - np.tile(offs, len(base))
        df = pd.DataFrame(
            {
                "w": wins,
                "t": np.repeat(np.asarray(types, dtype=object), self.k),
                "c": np.repeat(cents, self.k),
            }
        )
        agg = df.groupby(["w", "t"], as_index=False).agg(
            n=("c", "size"), cents=("c", "sum")
        )
        by: dict[int, list[list]] = {}
        for w, t, n, c in zip(agg["w"], agg["t"], agg["n"], agg["cents"]):
            s = _shard_of(int(w), t, self.num_shards)
            by.setdefault(s, [[], [], [], []])
            by[s][0].append(int(w))
            by[s][1].append(t)
            by[s][2].append(int(n))
            by[s][3].append(int(c))
        wm = self._watermark  # adds happen under the PREVIOUS watermark
        ray.get(
            [
                self.shards[s].add.remote(ws, tps, ns, cs, wm)
                for s, (ws, tps, ns, cs) in by.items()
            ]
        )
        self._max_ts = max(self._max_ts, float(ts_s.max()))
        self._watermark = self._max_ts - self.lateness_s
        ray.get([s.advance.remote(self._watermark) for s in self.shards])

    def finish(self) -> pd.DataFrame:
        ray.get([s.flush.remote() for s in self.shards])
        rows: list[tuple[int, str, int, int]] = []
        for part in ray.get([s.results.remote() for s in self.shards]):
            rows.extend(part)
        out = pd.DataFrame(
            rows, columns=["win_start_s", "event_type", "n_events", "sum_value_cents"]
        )
        if out.empty:
            out = out.astype(
                {
                    "win_start_s": "int64",
                    "n_events": "int64",
                    "sum_value_cents": "int64",
                }
            )
        return out.sort_values(["win_start_s", "event_type"]).reset_index(drop=True)

    def late_dropped(self) -> int:
        return sum(ray.get([s.late_count.remote() for s in self.shards]))

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []


def streaming_hopping_counts(
    sf_dir: str,
    size_s: int = 3600,
    hop_s: int = 900,
    lateness_s: int = 900,
    num_shards: int = 8,
    batch_rows: int = 2048,
) -> pd.DataFrame:
    """``events_hopping_counts`` semantics through the streaming-window
    tier: the driver iterates the events table in file order as the
    stand-in ordered source, windows finalize progressively as the
    watermark advances, and the run asserts zero late drops (the table is
    ts-sorted, so the shared batch oracle stays value-exact)."""
    import pyarrow.dataset as pads

    win = StreamingHoppingWindows(size_s, hop_s, lateness_s, num_shards)
    try:
        scan = pads.dataset(f"{sf_dir}/events.parquet", format="parquet")
        for batch in scan.to_batches(
            columns=["ts", "event_type", "value"], batch_size=batch_rows
        ):
            if batch.num_rows == 0:
                continue
            ts_s = (
                batch.column("ts").cast("int64").to_numpy(zero_copy_only=False)
                // 1_000_000
            )
            cents = np.round(
                batch.column("value").to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            win.feed(ts_s, batch.column("event_type").to_pylist(), cents)
        out = win.finish()
        late = win.late_dropped()
        assert late == 0, f"unexpected late drops on the sorted source: {late}"
        return out
    finally:
        win.shutdown()
