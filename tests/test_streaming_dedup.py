"""Shared-mutable-index tier tests: sharded min-claim actors for streaming
exact dedup. Pins (a) commutativity — registration order cannot change
winners, (b) cross-micro-batch dedup (the thing Dataset groupby can't do),
(c) shard balance, (d) oracle equality of streaming_dedup_keep_first with
the groupby-based dedup_keep_first."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_min_claim_commutative():
    from html_parser_ray.state.streaming_dedup import StreamingDeduper, _hashes

    texts = ["a", "b", "a", "c", "b", "a"]
    ids = [30, 10, 20, 40, 50, 5]
    fwd = StreamingDeduper(num_shards=3)
    rev = StreamingDeduper(num_shards=3)
    try:
        fwd.register_batch(_hashes(texts), ids)
        rev.register_batch(list(reversed(_hashes(texts))), list(reversed(ids)))
        m_fwd = fwd.winner_mask(_hashes(texts), ids)
        m_rev = rev.winner_mask(_hashes(texts), ids)
        assert list(m_fwd) == list(m_rev)
        # winners: min id per text -> a:5, b:10, c:40
        kept = [i for i, keep in zip(ids, m_fwd) if keep]
        assert sorted(kept) == [5, 10, 40]
        assert fwd.index_size() == 3
    finally:
        fwd.shutdown()
        rev.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_cross_micro_batch_dedup():
    from html_parser_ray.state.streaming_dedup import StreamingDeduper, _hashes

    dd = StreamingDeduper(num_shards=2)
    try:
        # batch 1 claims "x" with id 7; batch 2 (later stream arrival)
        # brings a smaller id -> min semantics still pick the smaller one
        dd.register_batch(_hashes(["x", "y"]), [7, 8])
        dd.register_batch(_hashes(["x", "z"]), [3, 9])
        assert list(dd.winner_mask(_hashes(["x"]), [7])) == [False]
        assert list(dd.winner_mask(_hashes(["x"]), [3])) == [True]
        assert dd.index_size() == 3
    finally:
        dd.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_streaming_keep_first_matches_groupby_form(tmp_path):
    from html_parser_ray.pipelines.dedup import dedup_keep_first
    from html_parser_ray.state.streaming_dedup import streaming_dedup_keep_first

    # planted duplicates across what will be several read blocks
    texts = [f"text-{i % 7}" for i in range(40)]
    df = pd.DataFrame({"doc_id": range(100, 140), "text": texts})
    df.to_parquet(tmp_path / "documents.parquet")

    def _ids(res):
        import ray.data

        if isinstance(res, ray.data.Dataset):
            res = res.to_pandas()
        return list(res["doc_id"])

    a = _ids(streaming_dedup_keep_first(str(tmp_path), num_shards=4))
    b = _ids(dedup_keep_first(str(tmp_path)))
    assert a == b == list(range(100, 107))


def test_snapshot_restore_kill_resume_keeps_winners(ray_session):
    """Checkpoint the shared index mid-stream, kill the shard actors,
    restore into a fresh set, register the rest: winners equal the
    uninterrupted run. Min-claims are a CRDT, so even replaying
    already-registered batches after restore cannot change the outcome."""
    import numpy as np

    from html_parser_ray.state.streaming_dedup import StreamingDeduper, _hashes

    rng = np.random.RandomState(13)
    texts = [f"doc {i % 40}" for i in range(200)]  # heavy duplication
    ids = rng.permutation(200).astype("int64")

    def winners(dd):
        mask = dd.winner_mask(_hashes(texts), ids)
        return sorted(ids[mask].tolist())

    ref = StreamingDeduper(num_shards=4)
    try:
        ref.register_batch(_hashes(texts), ids)
        expected = winners(ref)
    finally:
        ref.shutdown()

    dd = StreamingDeduper(num_shards=4)
    try:
        dd.register_batch(_hashes(texts[:100]), ids[:100])
        snap = dd.snapshot()
    finally:
        dd.shutdown()  # the "failure"
    dd2 = StreamingDeduper(num_shards=4)
    try:
        dd2.restore(snap)
        # replay overlap (at-least-once delivery) + the remainder
        dd2.register_batch(_hashes(texts[80:]), ids[80:])
        assert winners(dd2) == expected
    finally:
        dd2.shutdown()
