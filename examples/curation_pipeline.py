"""Corpus-curation example: the composed training-data prep recipe.

Builds a tiny documents table with duplicates, short junk, and a known
sample split, then runs the fused dedup-keeper ∩ quality-floor ∩
deterministic-sample pipeline (`curated_corpus`, one slim-row exchange)
followed by the per-doc quality scores that justify the floor. Run:

    python examples/curation_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(smoke: bool = False) -> None:
    import pandas as pd

    from html_parser_ray.pipelines.curation import curated_corpus
    from html_parser_ray.pipelines.text_analysis import doc_repetition_stats

    rows = [
        {"doc_id": i, "text": f"document {i} " + "content word " * 30}
        for i in range(20)
    ]
    rows += [
        {"doc_id": 100, "text": rows[0]["text"]},  # exact dupe of doc 0
        {"doc_id": 101, "text": "too short"},      # fails the token floor
    ]
    with tempfile.TemporaryDirectory() as d:
        pd.DataFrame(rows).assign(lang="en", source="ex").to_parquet(
            f"{d}/documents.parquet"
        )

        def as_df(r):
            return r if isinstance(r, pd.DataFrame) else r.to_pandas()

        kept = as_df(curated_corpus(d, min_tokens=40, sample_pct=100))
        ids = set(kept["doc_id"])
        assert 100 not in ids  # the duplicate lost to keeper doc 0
        assert 101 not in ids  # the short doc fell below the floor
        assert 0 in ids

        # halving the sample keeps a strict subset, deterministically
        half = as_df(curated_corpus(d, min_tokens=40, sample_pct=50))
        assert set(half["doc_id"]) <= ids

        rep = as_df(doc_repetition_stats(d)).set_index("doc_id")
        # the planted docs repeat "content word": high top-bigram fraction
        assert rep.loc[0, "top_bigram_ppm"] > 400_000
        print(
            f"kept {len(kept)}/{len(rows)} docs; half-sample {len(half)}; "
            f"doc0 top_bigram_ppm={rep.loc[0, 'top_bigram_ppm']}"
        )


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    run()
    ray.shutdown()
