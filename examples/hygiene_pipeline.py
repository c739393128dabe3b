"""Training-data hygiene example: scrub PII, decontaminate against an eval
set, and census the corpus vocabulary.

Builds a tiny documents table with planted PII-bearing and eval-overlapping
rows, then runs the three hygiene stages a pretraining pipeline applies
between extraction and tokenization. Run:

    python examples/hygiene_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(smoke: bool = False) -> None:
    import pandas as pd

    from html_parser_ray.pipelines.hygiene import (
        decontaminate,
        doc_length_quantiles,
        ngram_topk,
        pii_scrub,
    )

    eval_text = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        {"doc_id": i, "text": f"clean document {i} " + "filler words here " * 10}
        for i in range(1, 19)
        if i % 20 != 0
    ]
    rows.append({"doc_id": 0, "text": eval_text})  # eval doc (doc_id % 20 == 0)
    rows.append({"doc_id": 99, "text": f"leaked copy: {eval_text} with a tail"})
    df = pd.DataFrame(rows)
    df["n_chars"] = df["text"].str.len().astype("int64")

    with tempfile.TemporaryDirectory() as d:
        df.assign(lang="en", source="ex").to_parquet(f"{d}/documents.parquet")

        def as_df(r):
            return r if isinstance(r, pd.DataFrame) else r.to_pandas()

        # 1. PII scrub: every doc gets counts + a redacted-text hash
        scrubbed = as_df(pii_scrub(d))
        assert (scrubbed["n_emails"] >= 1).all()  # planted contact lines

        # 2. decontamination: doc 99 shares 8-gram shingles with eval doc 0
        hits = as_df(decontaminate(d))
        assert 99 in set(hits["doc_id"])

        # 3. vocabulary census + length calibration
        grams = ngram_topk(d, n=3, k=5)
        quants = doc_length_quantiles(d)
        print(
            f"scrubbed {len(scrubbed)} docs; contaminated: "
            f"{sorted(hits['doc_id'])}; top trigram: {grams.iloc[0]['gram']!r} "
            f"x{grams.iloc[0]['n']}; en p50 length: {int(quants.iloc[0]['q50'])}"
        )


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    run()
    ray.shutdown()
