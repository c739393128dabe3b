"""Round-5 third batch: the range (band) join, co-occurrence pair counts,
and deterministic weighted sampling — each sf0.001 oracle parity plus the
semantic edge its form pins (half-open window boundaries, context-level
once-per-day pair counting, the exact-integer priority arithmetic)."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from _parity import SF, _as_df, _parity


@pytest.mark.usefixtures("ray_session")
def test_click_attribution_matches_oracle_at_sf0001():
    from html_parser_ray.pipelines.temporal import events_click_attribution

    _parity(
        "events_click_attribution",
        events_click_attribution,
        {"events": f"{SF}/events.parquet"},
    )


@pytest.mark.usefixtures("ray_session")
def test_click_attribution_window_boundaries(tmp_path):
    """The attribution window is half-open [p.ts - W, p.ts): a click
    exactly W before IS counted, a click at the purchase instant is NOT,
    clicks never cross users, and a clickless purchase still emits 0
    (LEFT JOIN semantics)."""
    from html_parser_ray.pipelines.temporal import events_click_attribution

    d = tmp_path / "sfb"
    d.mkdir()
    w_us = 86_400_000_000  # the default 1-day window, in microseconds
    t0 = 10 * w_us
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
                "user_id": pa.array([1, 1, 1, 1, 1, 2, 3], pa.int64()),
                "ts": pa.array(
                    [
                        t0,          # purchase (user 1)
                        t0 - w_us,   # click exactly W before -> counted
                        t0 - 1,      # click just inside -> counted
                        t0,          # click AT the purchase -> excluded
                        t0 - w_us - 1,  # click just outside -> excluded
                        t0 - 1,      # user 2's click -> never crosses users
                        t0,          # user 3's purchase, no clicks -> 0
                    ],
                    pa.timestamp("us"),
                ),
                "event_type": pa.array(
                    [
                        "purchase",
                        "click",
                        "click",
                        "click",
                        "click",
                        "click",
                        "purchase",
                    ]
                ),
            }
        ),
        d / "events.parquet",
    )
    out = _as_df(events_click_attribution(str(d)))
    assert list(map(tuple, out.to_numpy())) == [(1, 2), (7, 0)]


@pytest.mark.usefixtures("ray_session")
def test_cooccurrence_matches_oracle_at_sf0001():
    from html_parser_ray.pipelines.temporal import events_type_cooccurrence

    _parity(
        "events_type_cooccurrence",
        events_type_cooccurrence,
        {"events": f"{SF}/events.parquet"},
    )


@pytest.mark.usefixtures("ray_session")
def test_cooccurrence_counts_contexts_not_events(tmp_path):
    """A pair counts ONCE per (user, day) context no matter how many times
    either type fires that day, a type never pairs with itself, and events
    on different days (or users) never pair."""
    from html_parser_ray.pipelines.temporal import events_type_cooccurrence

    d = tmp_path / "sfo"
    d.mkdir()
    us = 86_400_000_000
    pq.write_table(
        pa.table(
            {
                # user 1 day 0: a,a,a,b -> one (a,b); user 1 day 1: a only;
                # user 2 day 0: b,c -> one (b,c); a-vs-a never pairs
                "user_id": pa.array([1, 1, 1, 1, 1, 2, 2], pa.int64()),
                "ts": pa.array(
                    [0, 5, 9, 20, us, 0, 3], pa.timestamp("us")
                ),
                "event_type": pa.array(["a", "a", "a", "b", "a", "b", "c"]),
            }
        ),
        d / "events.parquet",
    )
    out = _as_df(events_type_cooccurrence(str(d)))
    assert list(map(tuple, out.to_numpy())) == [("a", "b", 1), ("b", "c", 1)]


@pytest.mark.usefixtures("ray_session")
def test_weighted_sample_matches_oracle_at_sf0001():
    from html_parser_ray.pipelines.text_analysis import doc_weighted_sample

    _parity(
        "doc_weighted_sample",
        doc_weighted_sample,
        {"documents": f"{SF}/documents.parquet"},
    )


@pytest.mark.usefixtures("ray_session")
def test_weighted_sample_priority_arithmetic(tmp_path):
    """The selection is exactly the k smallest md5(id)//weight keys — an
    independent hashlib twin reproduces the pick — and weight scales odds:
    the same id with a huge weight always beats itself with weight 1."""
    from html_parser_ray.functions.textfns import doc_priority_key
    from html_parser_ray.pipelines.text_analysis import doc_weighted_sample

    # independent-twin arithmetic (non-importing form of the contract)
    for i, w in [(0, 1), (7, 350), (123456, 2)]:
        expect = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) // max(w, 1)
        assert doc_priority_key(i, w) == expect
    assert doc_priority_key(7, 1000) < doc_priority_key(7, 1)  # weight wins
    assert doc_priority_key(7, 0) == doc_priority_key(7, 1)  # floor at 1

    d = tmp_path / "sfw"
    d.mkdir()
    ids = list(range(500))
    chars = [(i % 97) + 1 for i in ids]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_chars": pa.array(chars, pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    out = _as_df(doc_weighted_sample(str(d), k=25))
    want = sorted(
        ids, key=lambda i: (doc_priority_key(i, chars[i]), i)
    )[:25]
    assert out["doc_id"].tolist() == sorted(want)
    assert len(out) == 25
