"""WARC source tests: byte-exact write -> parse roundtrip (plain and
per-record gzip members), payload-bait resistance (Content-Length walk),
truncation errors, non-response skipping, and the Dataset read path."""

from __future__ import annotations

import pytest

from html_parser_ray.sources.warc import (
    build_record,
    parse_warc_bytes,
    read_warc,
    write_warc,
)

RECORDS = [
    ("https://a.test/0", b"<html><body>hello</body></html>"),
    # WARC-header and record-separator bait INSIDE the payload: the exact
    # Content-Length walk must not desynchronize
    ("https://a.test/1", b"x\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\ny"),
    ("https://a.test/2", b""),  # empty payload
    ("https://a.test/3", "unicode é中".encode()),
]


def test_roundtrip_plain(tmp_path):
    p = str(tmp_path / "shard.warc")
    assert write_warc(p, RECORDS) == 4
    got = parse_warc_bytes(open(p, "rb").read())
    assert got == RECORDS


def test_roundtrip_gzip_members(tmp_path):
    p = str(tmp_path / "shard.warc.gz")
    write_warc(p, RECORDS, gzip_records=True)
    raw = open(p, "rb").read()
    assert raw[:2] == b"\x1f\x8b"
    # more than one gzip member (per-record compression, streamable form)
    assert raw.count(b"\x1f\x8b\x08") >= len(RECORDS)
    assert parse_warc_bytes(raw) == RECORDS


def test_deterministic_bytes(tmp_path):
    p1, p2 = str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc.gz")
    write_warc(p1, RECORDS, gzip_records=True)
    write_warc(p2, RECORDS, gzip_records=True)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_non_response_records_skipped():
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\nContent-Length: 5\r\n\r\nhello"
        b"\r\n\r\n"
    )
    data = req + build_record("https://a.test/x", b"<p>kept</p>")
    got = parse_warc_bytes(data)
    assert got == [("https://a.test/x", b"<p>kept</p>")]


def test_truncated_body_raises():
    rec = build_record("https://a.test/x", b"0123456789")
    with pytest.raises(ValueError, match="truncated"):
        parse_warc_bytes(rec[:-14])  # cut into the HTTP body


def test_missing_length_raises():
    data = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc_bytes(data)


def test_resource_record_payload_is_body():
    data = (
        b"WARC/1.0\r\nWARC-Type: resource\r\n"
        b"WARC-Target-URI: https://a.test/r\r\n"
        b"Content-Type: text/plain\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n"
    )
    assert parse_warc_bytes(data) == [("https://a.test/r", b"abc")]


@pytest.mark.usefixtures("ray_session")
def test_read_warc_dataset(tmp_path):
    shards = []
    for s in range(2):
        p = str(tmp_path / f"shard-{s}.warc.gz")
        write_warc(
            p,
            [(f"https://a.test/{s}/{i}", f"<p>{s}-{i}</p>".encode()) for i in range(3)],
            gzip_records=True,
        )
        shards.append(p)
    ds = read_warc(shards)
    rows = sorted(
        (r["uri"], bytes(r["payload"])) for r in ds.take_all()
    )
    assert rows == sorted(
        (f"https://a.test/{s}/{i}", f"<p>{s}-{i}</p>".encode())
        for s in range(2)
        for i in range(3)
    )


# ---- property-based roundtrip (adversarial payloads) -----------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_payloads = st.binary(max_size=400) | st.sampled_from(
    [
        b"\r\n\r\nWARC/1.0\r\n",            # record-header bait
        b"Content-Length: 99999\r\n\r\n",   # length bait
        b"HTTP/1.1 200 OK\r\n\r\nnested",   # http-block bait
        b"\x1f\x8b\x08fake-gzip-magic",     # gzip magic inside payload
        b"",
    ]
)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    recs=st.lists(
        st.tuples(st.integers(0, 10_000), _payloads), min_size=0, max_size=12
    ),
    gz=st.booleans(),
)
def test_warc_roundtrip_property(tmp_path_factory, recs, gz):
    """write -> parse returns exactly the written (uri, payload) sequence for
    ANY payload bytes, gzipped or plain — the Content-Length walk must be
    immune to every kind of in-payload bait."""
    d = tmp_path_factory.mktemp("warcfuzz")
    path = str(d / "f.warc")
    records = [(f"https://t/{i}-{n}", p) for n, (i, p) in enumerate(recs)]
    write_warc(path, records, gzip_records=gz)
    got = parse_warc_bytes(open(path, "rb").read())
    assert got == records

def test_truncated_final_gzip_member_raises(tmp_path):
    """Cutting into the final gzip member must surface as a structural
    truncation error from the record walk — the decompressor's flush tail is
    yielded (not dropped), so the guarantee holds regardless of where the
    loss lands inside the member."""
    p = str(tmp_path / "shard.warc.gz")
    write_warc(p, RECORDS, gzip_records=True)
    raw = open(p, "rb").read()
    # cuts into record data -> the walk must raise
    for cut in (12, 20, 40):
        with pytest.raises(ValueError):
            parse_warc_bytes(raw[:-cut])
    # cuts that only eat the gzip trailer/padding lose no record bytes ->
    # the full record set must still come back (no raise, no silent drop)
    for cut in (5, 9):
        assert parse_warc_bytes(raw[:-cut]) == RECORDS


def test_dataset_sink_roundtrip(tmp_path, ray_session):
    """write_warc_dataset (distributed sink) -> read_warc recovers every
    record; shard names are content-addressed (idempotent re-run) and no
    .part temp files remain."""
    import glob

    import ray.data

    from html_parser_ray.sources.warc import read_warc, write_warc_dataset

    rows = [
        {"uri": f"https://s.test/{i}", "payload": f"<p>doc {i}</p>".encode()}
        for i in range(60)
    ]
    ds = ray.data.from_items(rows).repartition(4)
    out = str(tmp_path / "shards")
    n = write_warc_dataset(ds, out)
    assert n == 60
    shards = sorted(glob.glob(out + "/part-*.warc.gz"))
    assert len(shards) >= 2  # parallel tasks -> multiple shards
    assert not glob.glob(out + "/*.part")
    got = read_warc(shards).to_pandas()
    got = got.sort_values("uri").reset_index(drop=True)
    assert len(got) == 60
    by_uri = {r["uri"]: r["payload"] for r in rows}
    for u, p in zip(got["uri"], got["payload"]):
        assert by_uri[u] == p
    # idempotent re-run: same shard set, no duplicates
    write_warc_dataset(ray.data.from_items(rows).repartition(4), out)
    assert sorted(glob.glob(out + "/part-*.warc.gz")) == shards


@pytest.mark.usefixtures("ray_session")
def test_warc_sink_distinguishes_same_first_uri_batches(tmp_path):
    """Two blocks sharing the same first uri and row count but different
    content must write DIFFERENT shards (the old (first uri, count) tag
    collided and silently lost one block)."""
    import pandas as pd

    import ray.data

    from html_parser_ray.sources.warc import read_warc, write_warc_dataset

    a = pd.DataFrame(
        {"uri": ["https://x.test/1", "https://x.test/2"], "payload": [b"aa", b"bb"]}
    )
    b = pd.DataFrame(
        {"uri": ["https://x.test/1", "https://x.test/3"], "payload": [b"cc", b"dd"]}
    )
    ds = ray.data.from_pandas([a, b])  # two blocks, same first uri + count
    out_dir = str(tmp_path / "shards")
    n = write_warc_dataset(ds, out_dir, uri_col="uri", payload_col="payload")
    assert n == 4
    import glob

    shards = sorted(glob.glob(f"{out_dir}/part-*.warc.gz"))
    assert len(shards) == 2  # no collision
    back = read_warc(shards).to_pandas()
    assert len(back) == 4
    assert set(zip(back["uri"], back["payload"])) == {
        ("https://x.test/1", b"aa"),
        ("https://x.test/2", b"bb"),
        ("https://x.test/1", b"cc"),
        ("https://x.test/3", b"dd"),
    }


def test_http_response_lf_only_header_separator():
    """Non-compliant origin servers emit LF-only header/body separators;
    the payload must survive instead of silently becoming b''."""
    from html_parser_ray.sources.warc import parse_warc_bytes

    body = b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n<html>lf</html>"
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: https://lf.test/\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
        + body
        + b"\r\n\r\n"
    )
    out = parse_warc_bytes(rec)
    assert out == [("https://lf.test/", b"<html>lf</html>")]
