"""Regression tests for the round-5 final-session review findings.

Each test pins one of the four correctness fixes from the r5 code review of
the post-judge diff (3660b58..HEAD):

1. ``_flatten_words`` drops NULL texts (the SQL-oracle rule
   ``unnest(string_split(NULL, ' '))`` = no rows) instead of crashing every
   word-based operator (doc_chunk_dupes was the reported crash).
2. ``write_warc_dataset`` content-addresses shards over payload BYTES —
   two batches with identical uris and payload lengths but different
   content must land in different shards, not silently overwrite.
3. The nation-join queries follow inner-join semantics on orphan
   ``s_nationkey`` (the oracle's ``JOIN nation`` drops them; the engine
   previously emitted NaN-named rows).
4. ``doc_pack_assignments``' range math survives the full signed-64-bit
   doc_id domain (int64 ``ids - lo`` wraps negative when ids and lo sit at
   opposite ends; the fix subtracts in uint64 wraparound arithmetic).
"""

from __future__ import annotations

import glob

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(d, doc_ids, texts):
    d.mkdir(exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(doc_ids)),
                "source": pa.array(["s"] * len(doc_ids)),
                "n_chars": pa.array(
                    [len(t) if t is not None else 0 for t in texts], pa.int64()
                ),
            }
        ),
        d / "documents.parquet",
    )


@pytest.mark.usefixtures("ray_session")
def test_word_operators_tolerate_null_text(tmp_path):
    """NULL text -> no words (oracle: unnest(string_split(NULL)) = no rows);
    covers every _flatten_words consumer via doc_chunk_dupes + term stats."""
    from html_parser_ray.pipelines.dedup import doc_chunk_dupes, shingle_dupes
    from html_parser_ray.pipelines.text_analysis import doc_repetition_stats

    d = tmp_path / "sfnullwords"
    chunk = " ".join(["tok"] * 10)
    # two identical 10-word docs (a guaranteed shared chunk) + a NULL doc
    _write_docs(d, [1, 2, 3], [chunk, chunk, None])

    chunks = doc_chunk_dupes(str(d), k=5, min_docs=2)
    chunks = chunks if isinstance(chunks, pd.DataFrame) else chunks.to_pandas()
    # NULL doc contributes nothing: the shared chunk spans docs 1+2 only
    assert list(chunks["n_docs"]) == [2]
    assert list(chunks["n_occurrences"]) == [4]  # 2 anchors per 10-word doc

    sh = shingle_dupes(str(d), k=5, min_docs=2)
    sh = sh if isinstance(sh, pd.DataFrame) else sh.to_pandas()
    assert not sh.empty and set(sh["n_docs"]) == {2}

    rep = doc_repetition_stats(str(d))
    rep = rep if isinstance(rep, pd.DataFrame) else rep.to_pandas()
    assert 3 not in set(rep["doc_id"])  # no words -> no per-doc stats row


@pytest.mark.usefixtures("ray_session")
def test_warc_shard_tag_hashes_payload_bytes(tmp_path):
    """Two single-row batches sharing (uri, payload length) but differing in
    payload BYTES must produce two shards and preserve both records."""
    import ray

    from html_parser_ray.sources.warc import read_warc, write_warc_dataset

    out = str(tmp_path / "warcout")
    rows = [
        {"uri": "https://a/x", "payload": b"version-A-bytes!"},
        {"uri": "https://a/x", "payload": b"version-B-bytes!"},  # same length
    ]
    assert len(rows[0]["payload"]) == len(rows[1]["payload"])
    # one row per block so each batch hashes independently
    n = write_warc_dataset(ray.data.from_items(rows).repartition(2), out)
    assert n == 2
    shards = sorted(glob.glob(out + "/part-*.warc.gz"))
    assert len(shards) == 2, "same-length different-content batches collided"
    back = read_warc(shards).to_pandas()
    assert sorted(bytes(p) for p in back["payload"]) == sorted(
        r["payload"] for r in rows
    )


@pytest.mark.usefixtures("ray_session")
def test_orphan_nationkey_follows_inner_join(tmp_path):
    """A supplier with an s_nationkey absent from nation must drop (oracle:
    FROM supplier JOIN nation) — not surface as a NaN-named row."""
    from html_parser_ray.pipelines.relational import (
        supplier_balance_mad_by_nation,
        supplier_balance_quantiles_by_nation,
    )

    d = tmp_path / "sforphan"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], pa.int64()),
                "n_name": pa.array(["ALGERIA", "ARGENTINA"]),
            }
        ),
        d / "nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([10, 11, 12], pa.int64()),
                "s_nationkey": pa.array([0, 1, 99], pa.int64()),  # 99 = orphan
                "s_acctbal": pa.array([100.0, 200.0, 300.0]),
            }
        ),
        d / "supplier.parquet",
    )
    for fn in (supplier_balance_mad_by_nation, supplier_balance_quantiles_by_nation):
        out = fn(str(d))
        out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
        assert list(out["n_name"]) == ["ALGERIA", "ARGENTINA"], fn.__name__
        assert not out["n_name"].isna().any(), fn.__name__


@pytest.mark.usefixtures("ray_session")
def test_doc_pack_range_math_survives_full_int64_domain(tmp_path):
    """doc_ids at opposite ends of the signed 64-bit domain: int64 (ids-lo)
    would wrap negative and scramble range monotonicity; the uint64 fix
    keeps pack assignment correct (docs pack in doc_id order)."""
    from html_parser_ray.pipelines.text_analysis import doc_pack_assignments

    d = tmp_path / "sfwide"
    lo, hi = -(2**62) - 7, 2**62 + 13
    # three docs of 3 tokens each, budget 6 -> packs [0, 0, 1] in id order
    _write_docs(d, [lo, 0, hi], ["a b c", "d e f", "g h i"])
    out = doc_pack_assignments(str(d), budget_tokens=6, num_ranges=4)
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == [lo, 0, hi]
    assert list(out["pack_id"]) == [0, 0, 1]


# ---- state-tier review fixes (second review pass) ------------------------


def test_fit_counts_sizes_against_host_cpus_when_ray_is_down(monkeypatch):
    """The auto-init path: with Ray not yet initialized, fit_counts must
    size against the host CPUs the auto-init will advertise — the pre-fix
    no-op re-created the documented 2-CPU fleet deadlock."""
    import os as _os

    import ray as _ray

    from html_parser_ray.state import fleet

    monkeypatch.setattr(_ray, "is_initialized", lambda: False)
    monkeypatch.setattr(_os, "cpu_count", lambda: 2)
    # 8 shards x 0.25 CPU on a 2-CPU host with 1.0 reserved -> 4 slots
    assert fleet.fit_counts([8], frac=0.25, reserve=1.0) == [4]


@pytest.mark.usefixtures("ray_session")
def test_dedup_null_text_forms_one_group(tmp_path):
    """DuckDB groups all NULL texts together (md5(NULL) = NULL, one GROUP BY
    group, MIN(doc_id) keeps the smallest) — both the batch and the
    streaming dedup must match instead of crashing/dropping."""
    import duckdb

    from html_parser_ray.pipelines.dedup import dedup_keep_first, exact_dedup
    from html_parser_ray.state.streaming_dedup import streaming_dedup_keep_first

    d = tmp_path / "sfnulldedup"
    _write_docs(d, [1, 2, 3, 4], ["a", None, None, "a"])

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    want_exact = con.execute(
        "SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper_doc_id, "
        "COUNT(*) AS n_docs FROM documents GROUP BY 1 ORDER BY 1"
    ).df()
    want_keep = [1, 2]  # MIN of the 'a' group and MIN of the NULL group

    got_exact = exact_dedup(str(d)).to_pandas()
    assert list(got_exact["keeper_doc_id"]) == list(want_exact["keeper_doc_id"])
    assert list(got_exact["n_docs"]) == list(want_exact["n_docs"])
    assert got_exact["text_hash"].isna().sum() == 1  # the NULL group row

    for fn in (dedup_keep_first, streaming_dedup_keep_first):
        out = fn(str(d))
        out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
        assert list(out["doc_id"]) == want_keep, fn.__name__


@pytest.mark.usefixtures("ray_session")
def test_streaming_window_normalizes_ts_resolution(tmp_path):
    """A timestamp[ns] events file must produce the same windows as the
    batch oracle (the pre-fix Feeder cast ns to int64 and floor-divided as
    if they were us — every window start off by x1000)."""
    from html_parser_ray.pipelines.temporal import events_hopping_counts
    from html_parser_ray.state.streaming_window import streaming_hopping_counts

    d = tmp_path / "sfnsts"
    d.mkdir()
    base = pd.Timestamp("2024-01-01 00:00:00")
    df = pd.DataFrame(
        {
            "event_id": np.arange(40, dtype=np.int64),
            "user_id": np.arange(40, dtype=np.int64) % 4,
            "event_type": ["click", "view"] * 20,
            "value": np.linspace(1.0, 4.0, 40),
            "ts": [base + pd.Timedelta(seconds=30 * i) for i in range(40)],
        }
    )
    df["ts"] = df["ts"].astype("datetime64[ns]")  # ns resolution on disk
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    assert tbl.schema.field("ts").type == pa.timestamp("ns")
    pq.write_table(tbl, d / "events.parquet")

    batch = events_hopping_counts(str(d))
    batch = batch if isinstance(batch, pd.DataFrame) else batch.to_pandas()
    stream = streaming_hopping_counts(str(d))
    stream = stream if isinstance(stream, pd.DataFrame) else stream.to_pandas()
    pd.testing.assert_frame_equal(
        batch.reset_index(drop=True), stream.reset_index(drop=True)
    )


def test_streaming_window_geometry_raises_not_asserts():
    """Geometry guards must survive python -O: plain raises, not asserts."""
    from html_parser_ray.state.streaming_window import StreamingHoppingWindows

    with pytest.raises(ValueError, match="multiple of the hop"):
        StreamingHoppingWindows(size_s=100, hop_s=30, lateness_s=10)
