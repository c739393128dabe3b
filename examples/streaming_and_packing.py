"""Round-4 operator tour: streaming hopping windows (event-time watermarks),
sequence packing (distributed global prefix sum), and the WARC sink.

Feeds a tiny event stream through the watermark-driven window shards
(showing progressive finalization and a late drop), packs a small document
set under a token budget, and writes/reads back a WARC shard set through
the distributed sink. Run:

    python examples/streaming_and_packing.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(smoke: bool = False) -> None:
    import numpy as np
    import pandas as pd

    import ray.data

    # ---- streaming windows: watermark finalization + a late drop ----------
    from html_parser_ray.state.streaming_window import StreamingHoppingWindows

    win = StreamingHoppingWindows(size_s=60, hop_s=30, lateness_s=0, num_shards=2)
    try:
        # in-order burst, then a jump far ahead (finalizes the early windows),
        # then one LATE event for an already-finalized window
        win.feed(np.array([5, 20, 40]), ["click"] * 3, np.array([100, 100, 100]))
        win.feed(np.array([500]), ["click"], np.array([100]))
        win.feed(np.array([10]), ["click"], np.array([100]))  # late!
        out = win.finish()
        late = win.late_dropped()
    finally:
        win.shutdown()
    assert late > 0, "the out-of-order event must be dropped-and-counted"
    print(f"finalized windows: {len(out)}; late events dropped: {late}")

    # ---- sequence packing: global prefix sum over doc_id order ------------
    from html_parser_ray.pipelines.text_analysis import doc_pack_assignments

    with tempfile.TemporaryDirectory() as d:
        docs = pd.DataFrame(
            {
                "doc_id": range(40),
                "text": [("tok " * ((i % 7 + 1) * 10)).strip() for i in range(40)],
            }
        )
        docs.to_parquet(os.path.join(d, "documents.parquet"))
        packs = doc_pack_assignments(d, budget_tokens=100)
        if not isinstance(packs, pd.DataFrame):
            packs = packs.to_pandas()
        # packs are contiguous in doc_id order and budget-bounded at start
        assert (packs.sort_values("doc_id")["pack_id"].diff().fillna(0) >= 0).all()
        print(
            f"packed {len(packs)} docs into {packs['pack_id'].nunique()} packs "
            f"(budget 100 tokens)"
        )

    # ---- WARC sink: distributed shard write -> read back ------------------
    from html_parser_ray.sources.warc import read_warc, write_warc_dataset

    with tempfile.TemporaryDirectory() as d:
        ds = ray.data.from_items(
            [
                {"uri": f"https://ex.test/{i}", "payload": f"<p>page {i}</p>".encode()}
                for i in range(24)
            ]
        ).repartition(3)
        n = write_warc_dataset(ds, d)
        back = read_warc(
            [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".gz")]
        )
        assert back.count() == n == 24
        print(f"WARC sink wrote {n} records across shards; read back {n}")


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    run()
    ray.shutdown()
