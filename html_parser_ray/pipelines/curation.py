"""Composed training-data curation: exact-dedup keepers ∩ quality floor ∩
deterministic hash sample, as ONE slim-row exchange.

This is the pipeline-composition story the single operators build toward —
the standard corpus-prep recipe (dedup first, then filter, then split) that
a 100 TB crawl runs before tokenization:

- the map side reads only (doc_id, text), reduces each document to a slim
  feature row (md5 text hash, single-space token count, md5(doc_id) sample
  bucket) and never ships text anywhere;
- ONE hash exchange by ``text_hash`` co-locates each content group; the
  keeper (min doc_id — computed over ALL duplicates, so a low-quality early
  copy correctly shadows a later one, matching the dedup-then-filter order)
  is picked per group, and the quality floor + sample cut are applied to the
  keeper row inside the same partition call — no second exchange, no join;
- output is doc-count-sized metadata (doc_id, n_tokens, bucket); the caller
  semi-joins it back to text with ``partitioned_lookup`` when materializing
  the corpus (same shape as ``dedup_keep_first``).

At scale the exchange carries one row per document (pre-shrunk by nothing —
dedup needs every row's hash exactly once), uniformly partitioned because
md5 is; skew is impossible beyond duplicate-group size, and pathological
duplicate groups reduce to one output row each.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

from html_parser_ray.functions import textfns
from html_parser_ray.pipelines.shuffle import (
    hash_partitioned,
    read_table,
    sort_output,
)


def curated_corpus(
    sf_dir: str,
    min_tokens: int = 40,
    sample_pct: int = 50,
    num_partitions: int = 16,
) -> "ray.data.Dataset | pd.DataFrame":
    """Documents that survive exact dedup (min-doc_id keeper per content
    hash), have >= ``min_tokens`` single-space tokens, and land under
    ``sample_pct`` in the deterministic md5(doc_id) bucket space."""
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def featurize(df: pd.DataFrame) -> pd.DataFrame:
        # NULL text can never pass the token floor (SQL: len(string_split(
        # NULL)) is NULL -> filtered), and its md5(NULL) group contains only
        # NULL-text rows — dropping here is oracle-equivalent and avoids a
        # None.encode crash the sibling operators already guard against
        df = df[df["text"].notna()]
        return pd.DataFrame(
            {
                "text_hash": [textfns.md5_hex(t) for t in df["text"]],
                "doc_id": df["doc_id"].astype("int64"),
                "n_tokens": pd.Series(
                    [t.count(" ") + 1 for t in df["text"]],
                    index=df.index,
                    dtype="int64",
                ),
                "bucket": pd.Series(
                    [textfns.doc_sample_bucket(i) for i in df["doc_id"]],
                    index=df.index,
                    dtype="int64",
                ),
            }
        )

    def keep(g: pd.DataFrame) -> pd.DataFrame:
        # all rows of a content hash are co-located: keeper = min doc_id,
        # then the keeper row's own features decide quality/sample fate.
        # idxmin is O(n) — the former full-partition mergesort was the
        # dominant per-partition cost at one-row-per-document scale
        if g.empty:
            return g[["doc_id", "n_tokens", "bucket"]]
        k = g.loc[g.groupby("text_hash")["doc_id"].idxmin()]
        k = k[(k["n_tokens"] >= min_tokens) & (k["bucket"] < sample_pct)]
        return k[["doc_id", "n_tokens", "bucket"]]

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("bucket", pa.int64())]
    )
    return sort_output(
        hash_partitioned(
            ds.map_batches(featurize, batch_format="pandas"),
            ["text_hash"],
            keep,
            num_partitions,
        ),
        ["doc_id"],
        out_schema,
    )
