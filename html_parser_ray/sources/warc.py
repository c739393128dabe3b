"""WARC/1.0 source — the web-crawl ingestion format (CommonCrawl shape).

A 100 TB crawl arrives as many ``.warc`` / ``.warc.gz`` shards, each a
sequence of records: WARC headers, blank line, an HTTP response block of
exactly ``Content-Length`` bytes, then ``\\r\\n\\r\\n``. The production form
gzips each record as its OWN gzip member and concatenates members, so a
reader can stream records without decompressing the whole file.

Ray-Data-first shape: the FILE is the shard unit (`ray.data.read_binary_files`
streams one block per file; a real crawl has thousands of shards, so the read
parallelizes across files exactly like the reference's file-list reader,
ref: tools/bench/bench.zig:59). Record parsing is exact Content-Length
arithmetic — no regex scanning over payloads, so ``</html>`` or WARC-header
bait inside a payload cannot desynchronize the reader.

Only the subset needed for response-record pipelines is implemented
(WARC-Type response/resource, the HTTP payload split); everything is stdlib.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib

import pyarrow as pa

_CRLF = b"\r\n"
_WARC_DATE = "2000-01-01T00:00:00Z"  # fixed: deterministic, byte-stable files


def _record_id(uri: str) -> str:
    h = hashlib.md5(uri.encode()).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def build_record(uri: str, payload: bytes, content_type: str = "text/html") -> bytes:
    """One WARC/1.0 response record (headers + HTTP block + separator)."""
    http = (
        b"HTTP/1.1 200 OK\r\n"
        + f"Content-Type: {content_type}\r\n".encode()
        + f"Content-Length: {len(payload)}\r\n".encode()
        + _CRLF
        + payload
    )
    headers = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        + f"WARC-Record-ID: {_record_id(uri)}\r\n".encode()
        + f"WARC-Date: {_WARC_DATE}\r\n".encode()
        + f"WARC-Target-URI: {uri}\r\n".encode()
        + b"Content-Type: application/http; msgtype=response\r\n"
        + f"Content-Length: {len(http)}\r\n".encode()
        + _CRLF
    )
    return headers + http + _CRLF + _CRLF


def write_warc(path: str, records, gzip_records: bool = False) -> int:
    """Write ``records`` of ``(uri, payload_bytes)``; per-record gzip members
    when ``gzip_records`` (the streamable CommonCrawl form). Returns count."""
    n = 0
    with open(path, "wb") as f:
        for uri, payload in records:
            rec = build_record(uri, payload)
            if gzip_records:
                buf = io.BytesIO()
                # mtime=0: deterministic bytes
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                    gz.write(rec)
                rec = buf.getvalue()
            f.write(rec)
            n += 1
    return n


def _gunzip_members(data: bytes) -> bytes:
    """Decompress ALL concatenated gzip members (stdlib zlib keeps
    ``unused_data`` pointing at the next member)."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data))
        out.append(d.flush())
        data = d.unused_data
    return b"".join(out)


def parse_warc_bytes(data: bytes) -> list[tuple[str, bytes]]:
    """Parse one WARC shard's bytes into ``[(target_uri, payload)]``.

    Exact walk: header block up to the first blank line, ``Content-Length``
    slices the record body, the body's own HTTP header split yields the
    payload. Non-response records are skipped (their body is still sliced by
    length, so they cannot desynchronize the walk). Raises ``ValueError`` on
    a structurally truncated file — a short shard means a bad transfer, and
    silently dropping its tail would be a data-loss bug at crawl scale.
    """
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    out: list[tuple[str, bytes]] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC header block")
        header = data[pos:hdr_end]
        if not header.startswith(b"WARC/"):
            raise ValueError(f"not a WARC record at byte {pos}")
        fields: dict[bytes, bytes] = {}
        for line in header.split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields[b"content-length"])
        except KeyError:
            raise ValueError("WARC record without Content-Length") from None
        body_start = hdr_end + 4
        body_end = body_start + length
        if body_end > n:
            raise ValueError("truncated WARC record body")
        if fields.get(b"warc-type") in (b"response", b"resource"):
            uri = fields.get(b"warc-target-uri", b"").decode()
            body = data[body_start:body_end]
            if fields.get(b"content-type", b"").startswith(b"application/http"):
                split = body.find(_CRLF + _CRLF)
                payload = body[split + 4 :] if split >= 0 else b""
            else:
                payload = body  # resource record: body IS the payload
            out.append((uri, payload))
        pos = body_end
    return out


def read_warc(paths: "str | list[str]", concurrency: int | None = None):
    """``Dataset`` of ``{uri: string, payload: binary}`` from WARC shard(s).

    One input block per file (`read_binary_files`), records exploded inside
    ``map_batches`` — the shard-per-task layout a multi-node crawl read
    needs; no driver-side parsing.
    """
    import ray.data

    ds = ray.data.read_binary_files(paths)

    def explode(batch: pa.Table) -> pa.Table:
        uris: list[str] = []
        payloads: list[bytes] = []
        for blob in batch.column("bytes").to_pylist():
            for uri, payload in parse_warc_bytes(blob):
                uris.append(uri)
                payloads.append(payload)
        return pa.table(
            {
                "uri": pa.array(uris, type=pa.string()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")
