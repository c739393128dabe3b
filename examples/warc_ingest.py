"""WARC ingestion example: the web-crawl front door.

Writes a per-record-gzipped WARC shard (the CommonCrawl form), reads it back
as a Dataset (file-per-task explode, exact Content-Length walk), runs the
extraction stack over the payloads, and streams the admitted pages through
the shared-index streaming dedup — the shape of a crawl-to-training-data
front end. Run:

    python examples/warc_ingest.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(smoke: bool = False) -> None:
    from html_parser_ray.sources.warc import read_warc, write_warc
    from html_parser_ray.state.streaming_dedup import StreamingDeduper, _hashes

    with tempfile.TemporaryDirectory() as d:
        # two shards; page 7 of shard 1 duplicates page 3 of shard 0
        shards = []
        for s in range(2):
            recs = []
            for i in range(8):
                body = f"<html><body><h1>t{s}-{i}</h1><p>page {s*8+i} content"
                if s == 1 and i == 7:
                    body = "<html><body><h1>t0-3</h1><p>page 3 content"
                recs.append((f"https://crawl.test/{s}/{i}", (body + "</p></body></html>").encode()))
            p = os.path.join(d, f"shard-{s}.warc.gz")
            write_warc(p, recs, gzip_records=True)
            shards.append(p)

        pages = read_warc(shards)

        def extract(batch):
            import pyarrow as pa

            from html_parser_ray.extract.boilerplate import extract_text_blocks
            from html_parser_ray.html.document import parse_html

            uris = batch.column("uri").to_pylist()
            texts = []
            for p in batch.column("payload").to_pylist():
                doc = parse_html(p)
                texts.append(b" ".join(extract_text_blocks(doc)).decode())
            return pa.table({"uri": pa.array(uris), "text": pa.array(texts)})

        extracted = pages.map_batches(extract, batch_format="pyarrow").to_pandas()
        assert len(extracted) == 16

        dd = StreamingDeduper(num_shards=2)
        try:
            ids = list(range(len(extracted)))
            dd.register_batch(_hashes(list(extracted["text"])), ids)
            mask = dd.winner_mask(_hashes(list(extracted["text"])), ids)
            kept = extracted[mask]
            # 16 pages, one exact duplicate -> 15 admitted
            assert len(kept) == 15, len(kept)
            print(f"read {len(extracted)} pages from 2 WARC shards; admitted {len(kept)} after streaming dedup")
        finally:
            dd.shutdown()


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    run()
    ray.shutdown()
