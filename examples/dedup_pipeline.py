"""Dedup example: exact + MinHash-LSH near-dup detection, distributed.

Builds a tiny documents table with planted duplicates, runs the
hash-partitioned exact dedup and the banded-LSH near-dup pipeline, and
shows the keeper / pair outputs. Run:

    python examples/dedup_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(smoke: bool = False) -> None:
    import pandas as pd

    from html_parser_ray.pipelines.dedup import (
        dedup_keep_first,
        exact_dedup,
        minhash_lsh_dupes,
    )

    rows = [
        {"doc_id": i, "text": f"unique document number {i} " + "filler " * 20}
        for i in range(20)
    ]
    shared = "the same long paragraph repeated " * 10
    rows += [
        {"doc_id": 100, "text": shared},
        {"doc_id": 101, "text": shared},           # exact dupe of 100
        {"doc_id": 102, "text": shared + " tail"},  # near dupe
    ]
    with tempfile.TemporaryDirectory() as d:
        pd.DataFrame(rows).assign(lang="en", source="ex").to_parquet(
            f"{d}/documents.parquet"
        )
        def as_df(r):
            return r if isinstance(r, pd.DataFrame) else r.to_pandas()

        groups = as_df(exact_dedup(d))
        dupes = groups[groups["n_docs"] > 1]
        assert dupes.iloc[0]["keeper_doc_id"] == 100

        keep = as_df(dedup_keep_first(d))
        assert 101 not in set(keep["doc_id"])

        pairs = as_df(minhash_lsh_dupes(d, threshold=0.7))
        assert (100, 102) in set(map(tuple, pairs.values.tolist()))
        print(f"exact groups with dupes: {len(dupes)}; near-dup pairs: {len(pairs)}")


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    run()
    ray.shutdown()
