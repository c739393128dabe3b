"""Streaming hopping windows (state/streaming_window.py): equality with the
batch operator on the sorted source, PROGRESSIVE emission while the stream
runs, late-event drop-and-count semantics on a disordered stream, and
conservation (on-time + late accounts for every event exactly once)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


def test_matches_batch_operator_on_sorted_source():
    from html_parser_ray.pipelines.temporal import events_hopping_counts
    from html_parser_ray.state.streaming_window import streaming_hopping_counts

    got = streaming_hopping_counts(SF)
    exp = events_hopping_counts(SF)
    if not isinstance(exp, pd.DataFrame):
        exp = exp.to_pandas()
    exp = exp.sort_values(["win_start_s", "event_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({c: exp[c].dtype for c in exp.columns}), exp
    )


def _feed_events(win, ts_s, types, cents, chunk=16):
    for i in range(0, len(ts_s), chunk):
        win.feed(
            np.asarray(ts_s[i : i + chunk], dtype=np.int64),
            list(types[i : i + chunk]),
            np.asarray(cents[i : i + chunk], dtype=np.int64),
        )


def test_progressive_emission_before_eof():
    """Windows must finalize WHILE the stream runs (watermark-driven), not
    at flush: after feeding events far past a window's end, its results are
    already on the shards' finalized lists."""
    import ray

    from html_parser_ray.state.streaming_window import StreamingHoppingWindows

    win = StreamingHoppingWindows(size_s=100, hop_s=50, lateness_s=0, num_shards=2)
    try:
        _feed_events(win, [10, 20, 500], ["a", "a", "a"], [100, 100, 100], chunk=3)
        emitted = []
        for part in ray.get([s.results.remote() for s in win.shards]):
            emitted.extend(part)
        # windows [0,100) and [-50,50) cover ts 10/20; both ended before the
        # watermark (500 - 0), so they are finalized pre-EOF
        assert {e[0] for e in emitted} >= {0, -50}
    finally:
        win.shutdown()


def test_late_events_drop_and_count_conservation():
    """Disordered stream with lateness=0: events whose window finalized
    before they arrive are dropped AND counted; on-time + late == total
    (x the per-event window fan-out)."""
    from html_parser_ray.state.streaming_window import StreamingHoppingWindows

    rng = np.random.RandomState(7)
    n = 400
    ts = rng.randint(0, 5000, size=n)  # heavily disordered
    types = ["t"] * n
    cents = np.ones(n, dtype=np.int64)
    win = StreamingHoppingWindows(size_s=100, hop_s=50, lateness_s=0, num_shards=4)
    try:
        _feed_events(win, ts, types, cents, chunk=25)
        out = win.finish()
        late = win.late_dropped()
        fanout = 2  # size/hop
        assert late > 0, "a shuffled stream with zero lateness must drop"
        assert int(out["n_events"].sum()) + late == n * fanout
    finally:
        win.shutdown()


def test_lateness_absorbs_bounded_disorder():
    """With allowed_lateness >= the stream's max disorder, nothing drops and
    the result equals the order-free groupby truth."""
    from html_parser_ray.state.streaming_window import StreamingHoppingWindows

    rng = np.random.RandomState(11)
    base = np.sort(rng.randint(0, 5000, size=300))
    jitter = rng.randint(0, 200, size=300)  # bounded disorder
    ts = base.copy()
    ts[::3] = np.maximum(0, ts[::3] - jitter[::3])
    types = [("a" if i % 2 else "b") for i in range(300)]
    cents = rng.randint(0, 100, size=300).astype(np.int64)

    win = StreamingHoppingWindows(size_s=100, hop_s=50, lateness_s=300, num_shards=4)
    try:
        _feed_events(win, ts, types, cents, chunk=20)
        out = win.finish()
        assert win.late_dropped() == 0
    finally:
        win.shutdown()

    # order-free truth
    rows = []
    for t, typ, c in zip(ts, types, cents):
        b = (t // 50) * 50
        for o in (0, 50):
            rows.append({"win_start_s": b - o, "event_type": typ, "c": c})
    truth = (
        pd.DataFrame(rows)
        .groupby(["win_start_s", "event_type"], as_index=False)
        .agg(n_events=("c", "size"), sum_value_cents=("c", "sum"))
        .sort_values(["win_start_s", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.astype({c: truth[c].dtype for c in truth.columns}), truth
    )


# ---------------------------------------------------------------------------
# Partition-parallel ingest (round 5: VERDICT r4 item 2)
# ---------------------------------------------------------------------------


def test_multi_feeder_concurrent_matches_batch_oracle():
    """>=4 CONCURRENT feeder actors over batch-interleaved slices of the
    events table (small micro-batches so progress genuinely interleaves)
    must reproduce the batch operator exactly, with zero late drops."""
    from html_parser_ray.pipelines.temporal import events_hopping_counts
    from html_parser_ray.state.streaming_window import streaming_hopping_counts

    got = streaming_hopping_counts(SF, batch_rows=64, num_feeders=4)
    exp = events_hopping_counts(SF)
    if not isinstance(exp, pd.DataFrame):
        exp = exp.to_pandas()
    exp = exp.sort_values(["win_start_s", "event_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({c: exp[c].dtype for c in exp.columns}), exp
    )


def test_out_of_contract_input_raises_deterministically(tmp_path):
    """Input whose per-feeder streams regress in event time beyond the
    allowed lateness violates the bounded-disorder ingest contract and must
    raise a ValueError naming the contract — DETERMINISTICALLY. (Before the
    fix, whether such input tripped the zero-drop assert depended on a
    watermark-report scheduling race: the randomized differential's
    shuffled generator passed on seed 9001 and failed on 9002/9003.)"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from html_parser_ray.state.streaming_window import streaming_hopping_counts

    # descending time blocks: EVERY feeder's slice regresses by ~10_000s
    # between consecutive batches, far over lateness_s=50
    n = 160
    ts_s = np.repeat(np.arange(8)[::-1] * 10_000, 20) + np.tile(
        np.arange(20), 8
    )
    f = tmp_path / "events.parquet"
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(ts_s * 1_000_000, type=pa.timestamp("us")),
                "event_type": pa.array(["t"] * n),
                "value": pa.array(np.ones(n)),
            }
        ),
        f,
    )
    with pytest.raises(ValueError, match="bounded-disorder ingest contract"):
        streaming_hopping_counts(
            str(tmp_path), size_s=100, hop_s=50, lateness_s=50,
            num_shards=2, batch_rows=20, num_feeders=2,
        )


def test_multi_feeder_bounded_disorder_within_lateness_is_exact(tmp_path):
    """The zero-late-drop guarantee's actual precondition is per-feeder
    disorder <= lateness_s, not strict sortedness: a jittered stream whose
    regressions stay under the allowed lateness must reproduce the
    order-free truth exactly through the CONCURRENT multi-feeder path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from html_parser_ray.state.streaming_window import streaming_hopping_counts

    rng = np.random.RandomState(23)
    n = 3000
    base = np.sort(rng.randint(0, 400_000, size=n))
    ts_s = np.maximum(0, base - rng.randint(0, 180, size=n))  # disorder < 180
    types = np.array(["a", "b"])[rng.randint(0, 2, size=n)]
    value = rng.randint(0, 5000, size=n) / 100.0
    f = tmp_path / "events.parquet"
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(ts_s * 1_000_000, type=pa.timestamp("us")),
                "event_type": pa.array(types.tolist()),
                "value": pa.array(value),
            }
        ),
        f,
        row_group_size=250,  # 12 row groups -> real row-group assignment
    )
    got = streaming_hopping_counts(
        str(tmp_path), size_s=100, hop_s=50, lateness_s=200,
        num_shards=4, batch_rows=125, num_feeders=4,
    )
    rows = []
    for t, typ, v in zip(ts_s, types, value):
        b = (t // 50) * 50
        cents = int(round(v * 100))
        for o in (0, 50):
            rows.append({"win_start_s": b - o, "event_type": typ, "c": cents})
    truth = (
        pd.DataFrame(rows)
        .groupby(["win_start_s", "event_type"], as_index=False)
        .agg(n_events=("c", "size"), sum_value_cents=("c", "sum"))
        .sort_values(["win_start_s", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({c: truth[c].dtype for c in truth.columns}), truth
    )


def test_multi_feeder_disordered_shards_match_batch_truth(tmp_path):
    """Disordered shards: each feeder's sub-stream is time-ordered but the
    PARTITIONS cover wildly different time ranges (contiguous time slices
    assigned round-robin to batches), so feeders' watermarks diverge and
    the MIN-combine is what keeps finalization correct. Result must equal
    the order-free groupby truth with zero late drops."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from html_parser_ray.state.streaming_window import streaming_hopping_counts

    rng = np.random.RandomState(5)
    n = 4000
    ts_s = np.sort(rng.randint(0, 500_000, size=n))
    types = np.array(["a", "b", "c"])[rng.randint(0, 3, size=n)]
    value = rng.randint(0, 10_000, size=n) / 100.0
    tbl = pa.table(
        {
            "ts": pa.array(ts_s * 1_000_000, type=pa.timestamp("us")),
            "event_type": pa.array(types.tolist()),
            "value": pa.array(value),
        }
    )
    d = tmp_path / "sfx"
    d.mkdir()
    pq.write_table(tbl, d / "events.parquet", row_group_size=500)

    got = streaming_hopping_counts(
        str(d), size_s=100, hop_s=50, lateness_s=50, num_shards=4,
        batch_rows=100, num_feeders=5,
    )

    rows = []
    for t, typ, v in zip(ts_s, types, value):
        b = (t // 50) * 50
        cents = int(round(v * 100))
        for o in (0, 50):
            rows.append({"win_start_s": b - o, "event_type": typ, "c": cents})
    truth = (
        pd.DataFrame(rows)
        .groupby(["win_start_s", "event_type"], as_index=False)
        .agg(n_events=("c", "size"), sum_value_cents=("c", "sum"))
        .sort_values(["win_start_s", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({c: truth[c].dtype for c in truth.columns}), truth
    )


def test_shard_never_reopens_finalized_window():
    """Multi-feeder safety core: an add carrying a STALE watermark that
    targets an already-finalized window must be counted late, never
    re-opened (re-opening = double emission after flush)."""
    import ray

    from html_parser_ray.state.streaming_window import HoppingWindowShard

    shard = HoppingWindowShard.remote(100)
    try:
        ray.get(shard.add.remote([0], ["t"], [3], [30], float("-inf")))
        assert ray.get(shard.advance.remote(150.0)) == 1  # [0,100) finalized
        # a lagging feeder still thinks the watermark is -inf
        ray.get(shard.add.remote([0], ["t"], [2], [20], float("-inf")))
        ray.get(shard.flush.remote())
        results = ray.get(shard.results.remote())
        assert results == [(0, "t", 3, 30)]  # the late 2 events NOT merged
        assert ray.get(shard.late_count.remote()) == 2
    finally:
        ray.kill(shard)


def test_watermark_coordinator_min_combine():
    import ray

    from html_parser_ray.state.streaming_window import WatermarkCoordinator

    c = WatermarkCoordinator.remote(3)
    try:
        assert ray.get(c.report.remote(0, 100.0)) == float("-inf")  # 2 unstarted
        assert ray.get(c.report.remote(1, 50.0)) == float("-inf")
        assert ray.get(c.report.remote(2, 200.0)) == 50.0  # min over feeders
        assert ray.get(c.report.remote(1, float("inf"))) == 100.0  # EOF frees it
        # monotone per feeder: a stale re-report can't move time backwards
        assert ray.get(c.report.remote(0, 10.0)) == 100.0
    finally:
        ray.kill(c)


def test_per_file_partition_assignment(tmp_path):
    """When the source is a directory of time-sharded parquet files, each
    feeder must consume its OWN files (true per-partition consumption, no
    batch interleave) and still reproduce the order-free truth with zero
    late drops."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from html_parser_ray.state.streaming_window import (
        Feeder,
        streaming_hopping_counts,
    )

    rng = np.random.RandomState(9)
    n = 2400
    ts_s = np.sort(rng.randint(0, 200_000, size=n))
    types = np.array(["x", "y"])[rng.randint(0, 2, size=n)]
    value = rng.randint(0, 5000, size=n) / 100.0

    d = tmp_path / "sfy"
    evdir = d / "events.parquet"  # a DIRECTORY whose name the query derives
    evdir.mkdir(parents=True)
    shard = n // 8
    for i in range(8):  # 8 time-contiguous shards, name-sorted by time
        sl = slice(i * shard, (i + 1) * shard)
        pq.write_table(
            pa.table(
                {
                    "ts": pa.array(ts_s[sl] * 1_000_000, type=pa.timestamp("us")),
                    "event_type": pa.array(types[sl].tolist()),
                    "value": pa.array(value[sl]),
                }
            ),
            evdir / f"part-{i:03d}.parquet",
        )

    # the per-file branch must actually engage: a feeder over this source
    # owns exactly files 1 and 5 of the 8 (undecorated class so the check
    # runs in-process, no actor round-trip)
    plain = Feeder.__ray_metadata__.modified_class
    fd = plain(1, 4, str(evdir), [], None, 100, 50, 50, 100)
    files = fd._partition_files()
    assert files == sorted(str(evdir / f"part-{i:03d}.parquet") for i in range(8))
    own_rows = sum(b.num_rows for b in fd._my_batches())
    assert own_rows == 2 * shard  # files[1::4] -> shards 1 and 5 only

    got = streaming_hopping_counts(
        str(d), size_s=100, hop_s=50, lateness_s=100, num_shards=4,
        batch_rows=100, num_feeders=4,
    )

    rows = []
    for t, typ, v in zip(ts_s, types, value):
        b = (t // 50) * 50
        cents = int(round(v * 100))
        for o in (0, 50):
            rows.append({"win_start_s": b - o, "event_type": typ, "c": cents})
    truth = (
        pd.DataFrame(rows)
        .groupby(["win_start_s", "event_type"], as_index=False)
        .agg(n_events=("c", "size"), sum_value_cents=("c", "sum"))
        .sort_values(["win_start_s", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({c: truth[c].dtype for c in truth.columns}), truth
    )


def test_row_group_partition_assignment(tmp_path):
    """A single file with >= num_feeders row groups must assign ROW GROUPS
    round-robin (skipped groups never decoded), not batch-interleave a
    shared scan."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from html_parser_ray.state.streaming_window import Feeder

    n = 800
    ts_s = np.arange(n, dtype=np.int64)
    f = tmp_path / "events.parquet"
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(ts_s * 1_000_000, type=pa.timestamp("us")),
                "event_type": pa.array(["t"] * n),
                "value": pa.array(np.ones(n)),
            }
        ),
        f,
        row_group_size=100,  # 8 row groups
    )
    plain = Feeder.__ray_metadata__.modified_class
    fd = plain(2, 4, str(f), [], None, 100, 50, 50, 50)
    batches = list(fd._my_batches())
    rows = sum(b.num_rows for b in batches)
    assert rows == 200  # row groups 2 and 6 only
    seen = np.concatenate(
        [b.column("ts").cast("int64").to_numpy(zero_copy_only=False) // 1_000_000 for b in batches]
    )
    # exactly the rows of row groups 2 and 6, in time order within the feeder
    expected = np.concatenate([np.arange(200, 300), np.arange(600, 700)])
    assert (seen == expected).all()


def test_snapshot_restore_kill_resume_equals_uninterrupted():
    """Checkpoint story: feed half the stream, snapshot at the micro-batch
    boundary, KILL every shard actor, restore the snapshot into a fresh
    shard set, feed the rest — output and late counts must equal the
    uninterrupted run exactly (including windows finalized before the
    kill and lateness decisions after it)."""
    import numpy as np

    from html_parser_ray.state.streaming_window import StreamingHoppingWindows

    rng = np.random.RandomState(21)
    base = np.sort(rng.randint(0, 8000, size=400))
    ts = base.copy()
    ts[::5] = np.maximum(0, ts[::5] - rng.randint(0, 400, size=80))  # some late
    types = [("a" if i % 3 else "b") for i in range(400)]
    cents = rng.randint(0, 100, size=400).astype(np.int64)

    def uninterrupted():
        win = StreamingHoppingWindows(size_s=200, hop_s=100, lateness_s=100, num_shards=4)
        try:
            _feed_events(win, ts, types, cents, chunk=40)
            return win.finish(), win.late_dropped()
        finally:
            win.shutdown()

    def with_kill_restore():
        win = StreamingHoppingWindows(size_s=200, hop_s=100, lateness_s=100, num_shards=4)
        try:
            _feed_events(win, ts[:200], types[:200], cents[:200], chunk=40)
            snap = win.snapshot()
        finally:
            win.shutdown()  # the "failure"
        win2 = StreamingHoppingWindows(size_s=200, hop_s=100, lateness_s=100, num_shards=4)
        try:
            win2.restore(snap)
            _feed_events(win2, ts[200:], types[200:], cents[200:], chunk=40)
            return win2.finish(), win2.late_dropped()
        finally:
            win2.shutdown()

    out_a, late_a = uninterrupted()
    out_b, late_b = with_kill_restore()
    assert late_a == late_b
    pd.testing.assert_frame_equal(out_a, out_b)
