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

Design (partition-parallel since round 5 — VERDICT r4 item 2):

- ``HoppingWindowShard`` (``@ray.remote``): holds open ``(win_start,
  event_type) -> (n, cents)`` accumulators for its hash shard. ``add`` is
  commutative (counts sum), so concurrent feeders cannot change totals;
  ONLY the late/on-time split depends on the watermark — and the shard
  pins that split by tracking the highest watermark it has FINALIZED to:
  an add against an already-finalized window is late no matter how stale
  the sender's watermark view was (finalized windows are immutable — this
  is what makes concurrent feeders safe against re-opening/double-emit).
- ``WatermarkCoordinator`` (``@ray.remote``): per-feeder event-time
  watermarks with a **MIN-combine** — the global watermark of a
  multi-feeder deployment is the minimum over feeders (a window may only
  finalize once EVERY source partition is past it). A feeder that reaches
  end-of-partition reports +inf (the idle-source convention) so it stops
  holding the global watermark back.
- ``Feeder`` (``@ray.remote``): one per SOURCE PARTITION. Consumes its
  partition's micro-batches in order, pre-aggregates each batch per
  (window, type) — the combiner — ships partials to the shards, then
  reports its local watermark (max event ts seen - allowed_lateness) and
  advances the shards to the returned global MIN. Feeders run fully
  concurrently; the proof obligation is only per-feeder in-order delivery
  (the Kafka/Kinesis per-partition ordering guarantee).
- Sharding: md5 of the (window, type) key — uniform, skew-free.

Zero-late-drop invariant on time-sorted partitions: an event with ts t in
feeder i produces windows ending strictly after t; the global watermark is
<= feeder i's watermark <= t - lateness <= t at every moment the event's
adds can race a finalization, so no on-time event ever meets a finalized
window. (The sandbox's single events file is round-robin-sliced into
``num_feeders`` batch-interleaved sub-streams — each a time-ordered
subsequence, while the feeders' PROGRESS interleaves arbitrarily, i.e. the
disordered multi-consumer shape. In production each feeder consumes its own
file / Kafka partition instead; only the slicing is the stand-in.)

``streaming_hopping_counts`` reproduces ``events_hopping_counts`` exactly
under the bounded-disorder ingest contract (each feeder's stream regresses
in event time by at most ``lateness_s`` — the per-partition ordering a log
source guarantees). Each feeder MEASURES its stream's disorder, so an
out-of-contract input fails deterministically with a contract diagnosis
instead of a scheduling-race-dependent drop count (found by the
randomized-input differential: the adversarial generator's shuffled events
table made the old zero-drop assert flake with the race). The late-drop
semantics themselves are pinned by unit tests that shuffle the stream
through the ``StreamingHoppingWindows`` API.
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
        # highest watermark this shard has FINALIZED to: the late check uses
        # max(sender's watermark, this) so a concurrent feeder with a stale
        # watermark view can never re-open (and double-emit) a finalized
        # window — the multi-feeder safety property.
        self.finalized_wm = float("-inf")

    def add(
        self,
        wins: list[int],
        types: list[str],
        counts: list[int],
        cents: list[int],
        watermark_s: float,
    ) -> None:
        size = self.size_s
        wm = max(watermark_s, self.finalized_wm)
        for w, t, n, c in zip(wins, types, counts, cents):
            if w + size <= wm:
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
        many were emitted (progress signal for the feeder). Monotone: a
        stale (lower) watermark from a lagging feeder is a no-op."""
        if watermark_s <= self.finalized_wm:
            return 0
        self.finalized_wm = watermark_s
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

    def snapshot(self) -> dict:
        """Complete shard state for a checkpoint (open windows, finalized
        results, late count, finalize watermark). Taken at a micro-batch
        boundary it is a consistent cut: adds are synchronous (feeders
        ray.get their adds before reporting), so no in-flight update can
        straddle the snapshot."""
        return {
            "size_s": self.size_s,
            "open": [(k[0], k[1], v[0], v[1]) for k, v in self.open.items()],
            "final": list(self.final),
            "late_events": self.late_events,
            "finalized_wm": self.finalized_wm,
        }

    def restore(self, snap: dict) -> None:
        if snap["size_s"] != self.size_s:  # not assert: must survive -O
            raise ValueError("window size mismatch")
        self.open = {(w, t): [n, c] for w, t, n, c in snap["open"]}
        self.final = [tuple(row) for row in snap["final"]]
        self.late_events = snap["late_events"]
        self.finalized_wm = snap["finalized_wm"]


@ray.remote(num_cpus=0)
class WatermarkCoordinator:
    """Per-feeder event-time watermarks with a MIN-combine: the global
    watermark is the minimum over all registered feeders, so a window
    finalizes only once every source partition has moved past it. A feeder
    reports +inf at end-of-partition (idle-source convention)."""

    def __init__(self, num_feeders: int) -> None:
        self._wm = [float("-inf")] * num_feeders

    def report(self, feeder_id: int, watermark_s: float) -> float:
        # monotone per feeder (out-of-order RPCs can't move time backwards)
        if watermark_s > self._wm[feeder_id]:
            self._wm[feeder_id] = watermark_s
        return min(self._wm)

    def global_min(self) -> float:
        return min(self._wm)


def _shard_of(win: int, typ: str, num_shards: int) -> int:
    h = hashlib.md5(f"{win}|{typ}".encode()).digest()
    return int.from_bytes(h[:4], "big") % num_shards


def _window_partials(
    ts_s: np.ndarray, types: "list[str]", cents: np.ndarray, hop_s: int, k: int
) -> pd.DataFrame:
    """Expand events into their k covering windows and pre-aggregate per
    (window, type) — the map-side combiner shared by every feeder."""
    base = (ts_s // hop_s) * hop_s
    offs = np.arange(k, dtype=np.int64) * hop_s
    wins = np.repeat(base, k) - np.tile(offs, len(base))
    df = pd.DataFrame(
        {
            "w": wins,
            "t": np.repeat(np.asarray(types, dtype=object), k),
            "c": np.repeat(cents, k),
        }
    )
    return df.groupby(["w", "t"], as_index=False).agg(n=("c", "size"), cents=("c", "sum"))


def _ship_partials(shards, agg: pd.DataFrame, watermark_s: float) -> "list":
    """Group the combined partials by destination shard and send one add per
    shard; returns the in-flight refs (caller decides when to wait)."""
    num_shards = len(shards)
    by: dict[int, list[list]] = {}
    for w, t, n, c in zip(agg["w"], agg["t"], agg["n"], agg["cents"]):
        s = _shard_of(int(w), t, num_shards)
        slot = by.setdefault(s, [[], [], [], []])
        slot[0].append(int(w))
        slot[1].append(t)
        slot[2].append(int(n))
        slot[3].append(int(c))
    return [
        shards[s].add.remote(ws, tps, ns, cs, watermark_s)
        for s, (ws, tps, ns, cs) in by.items()
    ]


class StreamingHoppingWindows:
    """Facade owning the shard actors; feed micro-batches (single-feeder
    form, used by the unit tests) or attach concurrent ``Feeder`` actors
    (partition-parallel form), then read results."""

    def __init__(self, size_s: int, hop_s: int, lateness_s: int, num_shards: int = 8):
        if size_s % hop_s != 0:  # not assert: must survive python -O
            raise ValueError("window size must be a multiple of the hop")
        self.size_s = size_s
        self.hop_s = hop_s
        self.k = size_s // hop_s
        self.lateness_s = lateness_s
        self.num_shards = num_shards
        self.shards = [HoppingWindowShard.remote(size_s) for _ in range(num_shards)]
        self._max_ts = float("-inf")
        self._watermark = float("-inf")

    def feed(self, ts_s: np.ndarray, types: "list[str]", cents: np.ndarray) -> None:
        """One micro-batch from a SINGLE feeder (a 1-partition deployment):
        ship partials under the current watermark, then advance it."""
        if len(ts_s) == 0:
            return
        agg = _window_partials(ts_s, types, cents, self.hop_s, self.k)
        # adds happen under the PREVIOUS watermark — a window can never be
        # late to the batch that advances past it
        ray.get(_ship_partials(self.shards, agg, self._watermark))
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

    def snapshot(self) -> dict:
        """Checkpoint of the whole window state (per-shard snapshots + the
        facade's watermark), taken at a micro-batch boundary. Pair it with
        the SOURCE position (batch seq / Kafka offset) the ingest has acked
        so a restore replays from exactly the next micro-batch — the
        standard state-backend + source-offset checkpoint shape.

        CONSISTENCY CONTRACT (multi-feeder): window adds are counts, not
        idempotent claims, so the snapshot is a consistent cut ONLY when
        no add is in flight — every feeder must be between micro-batches
        (a ``Feeder`` ray.get()s all of a batch's shard adds before acking
        its source position, so "between batches" == "all acked adds
        applied"). Snapshotting while a feeder's batch is mid-ship can
        capture that batch on some shards but not others, and the replay
        from the un-acked offset would then double-count it on the shards
        that had it. The single-feeder micro-batch API satisfies this by
        construction; a multi-feeder deployment must quiesce (join or
        pause) its feeders first — the standard Chandy-Lamport-free
        stop-the-world checkpoint, matching the feeders' wave shape."""
        return {
            "shards": ray.get([s.snapshot.remote() for s in self.shards]),
            "max_ts": self._max_ts,
            "watermark": self._watermark,
            "size_s": self.size_s,
            "hop_s": self.hop_s,
            "lateness_s": self.lateness_s,
        }

    def restore(self, snap: dict) -> None:
        """Load a checkpoint into this (fresh) shard set. The full window
        geometry must match — restoring onto a different hop/lateness would
        silently mix two window grids in the output."""
        # raise, not assert: silently mixing two window grids under
        # python -O is exactly the failure these guards exist to stop
        if len(snap["shards"]) != self.num_shards:
            raise ValueError("shard count mismatch")
        if snap["size_s"] != self.size_s:
            raise ValueError("window size mismatch")
        if snap["hop_s"] != self.hop_s:
            raise ValueError("hop mismatch")
        if snap["lateness_s"] != self.lateness_s:
            raise ValueError("lateness mismatch")
        ray.get(
            [
                s.restore.remote(sh)
                for s, sh in zip(self.shards, snap["shards"])
            ]
        )
        self._max_ts = snap["max_ts"]
        self._watermark = snap["watermark"]

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []


@ray.remote(num_cpus=0.25)
class Feeder:
    # num_cpus=0.25: a feeder is scan + per-batch combine + RPC — mostly
    # waiting on shard acks. The whole streaming actor set (8 shards x 0.25
    # + 4 feeders x 0.25 + coordinator 0) then fits in 3 CPUs, safely inside
    # even a 4-CPU test session (whole-CPU reservations would deadlock
    # actor scheduling there — the Dataset.join lesson from shuffle.py).
    """One source-partition consumer: reads its slice of the events table in
    order, ships combined partials, reports its watermark to the
    coordinator and advances the shards to the global MIN.

    Partition assignment, best available granularity first (all three keep
    each feeder's stream a time-ordered subsequence of a time-sorted source;
    ``run`` measures the stream's actual disorder so the caller can enforce
    the bounded-disorder contract with an accurate diagnosis):

    1. FILES ``i::n`` in name order when the source directory has at least
       ``num_feeders`` parquet files — the real one-consumer-per-partition
       shape (log shards name-sort by time);
    2. ROW GROUPS ``i::n`` in file order otherwise, when the source has at
       least ``num_feeders`` row groups — skipped row groups are never
       decoded (no read amplification);
    3. batch ``seq % n == fid`` over a shared scan as the last resort
       (single file, single row group) — the only mode that decodes rows it
       discards, and only then on an input too small for it to matter.

    The watermark protocol and shard adds are identical in all modes.
    """

    def __init__(
        self,
        feeder_id: int,
        num_feeders: int,
        path: str,
        shards: "list",
        coordinator,
        size_s: int,
        hop_s: int,
        lateness_s: int,
        batch_rows: int,
    ) -> None:
        self.fid = feeder_id
        self.n = num_feeders
        self.path = path
        self.shards = shards
        self.coord = coordinator
        self.k = size_s // hop_s
        self.hop_s = hop_s
        self.lateness_s = lateness_s
        self.batch_rows = batch_rows

    COLUMNS = ["ts", "event_type", "value"]

    def _partition_files(self) -> "list[str]":
        """Time-ordered (name-sorted) file list of the source."""
        import glob
        import os

        if os.path.isdir(self.path):
            return sorted(glob.glob(os.path.join(self.path, "*.parquet")))
        return [self.path]

    def _my_batches(self):
        """Yield this feeder's batches at the best available granularity
        (files > row groups > interleaved batches — see class docstring)."""
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        files = self._partition_files()
        if len(files) >= self.n:
            own = files[self.fid :: self.n]
            scan = pads.dataset(own, format="parquet")
            yield from scan.to_batches(
                columns=self.COLUMNS, batch_size=self.batch_rows
            )
            return
        # (file index, row-group index) pairs in global time order
        rgs = [
            (f, rg)
            for f in files
            for rg in range(pq.ParquetFile(f).metadata.num_row_groups)
        ]
        if len(rgs) >= self.n:
            # group own row groups by file (order-preserving: rgs is
            # file-major so the i::n subsequence stays time-ordered after
            # grouping) — one file open per file, not per row group
            by_file: dict[str, list[int]] = {}
            for f, rg in rgs[self.fid :: self.n]:
                by_file.setdefault(f, []).append(rg)
            for f, row_groups in by_file.items():
                pf = pq.ParquetFile(f)
                yield from pf.iter_batches(
                    row_groups=row_groups,
                    columns=self.COLUMNS,
                    batch_size=self.batch_rows,
                )
            return
        # last resort: shared scan, own every n-th batch (decodes rows it
        # discards — only reachable for single-file single-row-group inputs)
        scan = pads.dataset(files, format="parquet")
        for seq, batch in enumerate(
            scan.to_batches(columns=self.COLUMNS, batch_size=self.batch_rows)
        ):
            if seq % self.n == self.fid:
                yield batch

    def run(self) -> dict:
        """Consume the partition to EOF; returns ``{"processed": rows,
        "disorder_s": d}`` where ``disorder_s`` is the largest backward
        time jump observed in THIS feeder's stream (max over batches of
        previous-local-max minus batch-min, 0 on a sorted stream). The
        zero-late-drop guarantee holds whenever ``disorder_s <=
        lateness_s`` for every feeder — the bounded-disorder ingest
        contract — so the caller can tell an out-of-contract input apart
        from an engine bug."""
        global_wm = float("-inf")
        local_max_ts = float("-inf")
        processed = 0
        disorder_s = 0.0
        for batch in self._my_batches():
            if batch.num_rows == 0:
                continue
            import pyarrow as pa

            # normalize to us BEFORE the int cast: a ns- or ms-resolution
            # ts column would otherwise shift every window start by x1000
            # (the batch oracle normalizes via astype('datetime64[us]'))
            ts_s = (
                batch.column("ts")
                .cast(pa.timestamp("us"))
                .cast("int64")
                .to_numpy(zero_copy_only=False)
                // 1_000_000
            )
            if local_max_ts != float("-inf"):
                disorder_s = max(
                    disorder_s, local_max_ts - float(ts_s.min())
                )
            cents = np.round(
                batch.column("value").to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            agg = _window_partials(
                ts_s, batch.column("event_type").to_pylist(), cents, self.hop_s, self.k
            )
            # ship under the last-known GLOBAL watermark (<= the true global
            # min: staleness only under-reports lateness, and the shard-side
            # finalized_wm max() restores exactness — never double-emits)
            refs = _ship_partials(self.shards, agg, global_wm)
            processed += int(batch.num_rows)
            local_max_ts = max(local_max_ts, float(ts_s.max()))
            # adds must land before the watermark that covers them advances
            # the shards (otherwise this feeder's own events could be
            # finalized past)
            ray.get(refs)
            new_wm = ray.get(
                self.coord.report.remote(self.fid, local_max_ts - self.lateness_s)
            )
            if new_wm > global_wm:  # skip no-op advance fan-outs
                global_wm = new_wm
                ray.get([s.advance.remote(global_wm) for s in self.shards])
        # end-of-partition: stop holding the global watermark back
        ray.get(self.coord.report.remote(self.fid, float("inf")))
        return {"processed": processed, "disorder_s": disorder_s}


def streaming_hopping_counts(
    sf_dir: str,
    size_s: int = 3600,
    hop_s: int = 900,
    lateness_s: int = 900,
    num_shards: int = 8,
    batch_rows: int = 2048,
    num_feeders: int = 4,
) -> pd.DataFrame:
    """``events_hopping_counts`` semantics through the streaming-window
    tier, ingested by ``num_feeders`` CONCURRENT partition feeders: each
    consumes a time-ordered slice of the events table, watermarks combine
    by MIN across feeders, windows finalize progressively, and the run
    asserts zero late drops (per-feeder bounded disorder + the MIN-combine
    guarantee — so the shared batch oracle stays value-exact). Input whose
    per-feeder disorder exceeds ``lateness_s`` violates the ingest contract
    and raises ValueError deterministically (measured by the feeders), never
    a racy drop count."""
    from html_parser_ray.state.fleet import fit_counts

    # fit the 0.25-CPU fleet to the cluster (8 shards + 4 feeders = 3.0
    # CPUs deadlocks a 2-CPU session); results are count-invariant
    num_shards, num_feeders = fit_counts(
        [num_shards, num_feeders], frac=0.25, reserve=0.25
    )
    win = StreamingHoppingWindows(size_s, hop_s, lateness_s, num_shards)
    coord = WatermarkCoordinator.remote(num_feeders)
    feeders = [
        Feeder.remote(
            i,
            num_feeders,
            f"{sf_dir}/events.parquet",
            win.shards,
            coord,
            size_s,
            hop_s,
            lateness_s,
            batch_rows,
        )
        for i in range(num_feeders)
    ]
    try:
        runs = ray.get([f.run.remote() for f in feeders])
        out = win.finish()
        late = win.late_dropped()
        # The zero-late-drop guarantee (module docstring) is conditional on
        # the bounded-disorder ingest contract: each feeder's stream may
        # regress in time by at most lateness_s. Check the contract FIRST
        # so an out-of-contract input fails deterministically with the
        # right diagnosis — whether such an input actually drops events is
        # a scheduling race (whichever feeder's watermark report lands
        # first), and a racy assert misattributes the cause to the engine.
        max_disorder = max(r["disorder_s"] for r in runs)
        if max_disorder > lateness_s:
            raise ValueError(
                "input violates the bounded-disorder ingest contract: a "
                f"feeder partition regressed {max_disorder:.0f}s in event "
                f"time, over the {lateness_s}s allowed lateness. This "
                "query reproduces the batch oracle exactly and therefore "
                "requires per-partition disorder <= lateness (the "
                "Kafka/Kinesis per-partition ordering guarantee); use the "
                "StreamingHoppingWindows API directly for drop-and-count "
                "semantics on unordered streams."
            )
        if late != 0:  # raise, not assert: the invariant must hold under -O
            raise RuntimeError(
                f"engine bug: {late} late window-contributions dropped on "
                f"an in-contract input (max feeder disorder "
                f"{max_disorder:.0f}s <= lateness {lateness_s}s guarantees "
                "zero drops)"
            )
        return out
    finally:
        for f in feeders:
            ray.kill(f)
        ray.kill(coord)
        win.shutdown()
