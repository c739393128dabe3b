"""Deduplication pipelines over the ``documents`` table.

Five families, each a first-class operator:
- exact:       md5 hash -> hash-partition groupby -> keep min doc_id
- ngram-jaccard: exact pairwise word-shingle Jaccard (broadcast shingle sets;
                 quadratic — the *baseline*; SQL-oracle-checked)
- minhash+LSH: shingle -> minhash -> band buckets -> candidate pairs ->
               verified Jaccard (the scale path; near-perfect recall at high
               thresholds, pinned by tests against the exact baseline)
- simhash:     64-bit simhash -> banded buckets -> hamming<=k pairs
- embedding:   cosine near-dup pairs over the embeddings table (numpy matmul
               against a broadcast matrix)

Scale notes: exact dedup shuffles only (hash, doc_id) pairs; LSH shuffles
(bucket_key, doc_id); the quadratic baselines broadcast the full feature set
via ``ray.put`` once and are meant for verification scale only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from html_parser_ray.functions import textfns


def exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Hash-partitioned exact dedup: (text_hash, keeper_doc_id, n_dupes)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def hash_batch(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "text_hash": [textfns.md5_hex(t) for t in df["text"]],
                "doc_id": df["doc_id"],
            }
        )

    hashed = ds.map_batches(hash_batch, batch_format="pandas")
    # per-batch partial (min, count) then tiny global combine
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("text_hash", as_index=False).agg(
            keeper_doc_id=("doc_id", "min"), n_docs=("doc_id", "size")
        )
        return g

    df = hashed.map_batches(partial, batch_format="pandas").to_pandas()
    result = df.groupby("text_hash", as_index=False).agg(
        keeper_doc_id=("keeper_doc_id", "min"), n_docs=("n_docs", "sum")
    )
    return result.sort_values("text_hash").reset_index(drop=True)


def _load_shingles(sf_dir: str, k: int = 3) -> dict[int, set]:
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def sh(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "shingles": [list(textfns.word_shingles(t, k)) for t in df["text"]],
            }
        )

    df = ds.map_batches(sh, batch_format="pandas").to_pandas()
    return {d: set(s) for d, s in zip(df["doc_id"], df["shingles"])}


def ngram_jaccard_dupes(sf_dir: str, threshold: float = 0.5, k: int = 3) -> pd.DataFrame:
    """Exact pairwise shingle-Jaccard pairs >= threshold (baseline oracle op).

    Broadcast pattern: the full shingle-set dict ships to the object store
    once; each task compares its batch's docs against all higher doc_ids.
    Quadratic by construction — verification scale only.
    """
    shingles = _load_shingles(sf_dir, k)
    shingles_ref = ray.put(shingles)
    doc_ids = sorted(shingles)
    ds = ray.data.from_items([{"doc_id": d} for d in doc_ids])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        all_sh = ray.get(shingles_ref)
        ids = sorted(all_sh)
        rows = []
        for a in df["doc_id"]:
            sa = all_sh[a]
            for b_ in ids:
                if b_ <= a:
                    continue
                j = textfns.jaccard(sa, all_sh[b_])
                if j >= threshold:
                    rows.append({"doc_a": a, "doc_b": b_})
        return pd.DataFrame(rows, columns=["doc_a", "doc_b"]).astype(
            {"doc_a": "int64", "doc_b": "int64"}
        )

    df = ds.map_batches(pairs, batch_format="pandas").to_pandas()
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def minhash_lsh_dupes(
    sf_dir: str,
    threshold: float = 0.5,
    k: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
) -> pd.DataFrame:
    """MinHash + LSH near-dup pairs, verified with true Jaccard.

    shingle -> minhash (map_batches) -> band-bucket flat map ->
    groupby(bucket) candidate pairs -> verify -> distinct pairs.
    The only shuffle carries (band, bucket_hash, doc_id) triples.
    """
    rows_per_band = num_hashes // bands
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def sig(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            s = textfns.word_shingles(text, k)
            m = textfns.minhash_signature(s, num_hashes=num_hashes)
            for band in range(bands):
                chunk = m[band * rows_per_band : (band + 1) * rows_per_band]
                bucket = hash(tuple(int(x) for x in chunk)) & 0x7FFFFFFFFFFFFFFF
                out.append({"band": band, "bucket": bucket, "doc_id": doc_id})
        return pd.DataFrame(out)

    # materialize once: both the hot-bucket count and the candidate pairing
    # consume the triples (Ray re-executes a branched lazy Dataset otherwise)
    buckets = ds.map_batches(sig, batch_format="pandas").materialize()

    # find hot buckets with the combiner pattern (per-batch pandas partial
    # count -> tiny global combine). NOT map_groups over every bucket (B bands
    # x D docs groups of size ~1: per-group python dispatch dominated wall
    # time) and NOT Dataset.groupby().count() (sort-based shuffle costs ~56s
    # on 160k single-node rows); the partial tables are tiny
    def partial_count(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["band", "bucket"], as_index=False).agg(
            n=("doc_id", "size")
        )

    counts = (
        buckets.map_batches(partial_count, batch_format="pandas")
        .to_pandas()
        .groupby(["band", "bucket"], as_index=False)
        .agg(n=("n", "sum"))
    )
    hot = counts[counts["n"] > 1]
    if hot.empty:
        return pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64")}
        )
    hot_keys = set(zip(hot["band"].tolist(), hot["bucket"].tolist()))
    hot_ref = ray.put(hot_keys)

    def keep_hot(df: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(hot_ref)
        mask = [
            (band, bucket) in keys
            for band, bucket in zip(df["band"], df["bucket"])
        ]
        return df[mask]

    # hot-bucket triples are a tiny fraction; pair them up per bucket
    hot_triples = buckets.map_batches(keep_hot, batch_format="pandas").to_pandas()
    pairs: set[tuple[int, int]] = set()
    for (_, _), group in hot_triples.groupby(["band", "bucket"]):
        ids = sorted(group["doc_id"].tolist())
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    cand = pd.DataFrame(sorted(pairs), columns=["doc_a", "doc_b"]).astype("int64")
    if cand.empty:
        return pd.DataFrame(columns=["doc_a", "doc_b"]).astype("int64")

    # verify candidates with true jaccard (broadcast shingle dict)
    shingles = _load_shingles(sf_dir, k)
    keep = [
        (a, b)
        for a, b in zip(cand["doc_a"], cand["doc_b"])
        if textfns.jaccard(shingles[a], shingles[b]) >= threshold
    ]
    out = pd.DataFrame(keep, columns=["doc_a", "doc_b"]).astype("int64")
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def simhash_dupes(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """SimHash near-dup pairs: 4x16-bit band buckets -> hamming verify."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def sig(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            h = textfns.simhash64(text)
            for band in range(4):
                out.append(
                    {
                        "band": band,
                        "bucket": (h >> (band * 16)) & 0xFFFF,
                        "doc_id": doc_id,
                        "simhash": h,
                    }
                )
        return pd.DataFrame(out).astype({"simhash": "uint64", "bucket": "int64"})

    buckets = ds.map_batches(sig, batch_format="pandas").materialize()

    # same hot-bucket combiner pattern as minhash LSH
    def partial_count(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["band", "bucket"], as_index=False).agg(
            n=("doc_id", "size")
        )

    counts = (
        buckets.map_batches(partial_count, batch_format="pandas")
        .to_pandas()
        .groupby(["band", "bucket"], as_index=False)
        .agg(n=("n", "sum"))
    )
    hot = counts[counts["n"] > 1]
    if hot.empty:
        return pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64")}
        )
    hot_keys = set(zip(hot["band"].tolist(), hot["bucket"].tolist()))
    hot_ref = ray.put(hot_keys)

    def keep_hot(df: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(hot_ref)
        mask = [
            (band, bucket) in keys
            for band, bucket in zip(df["band"], df["bucket"])
        ]
        return df[mask]

    hot_triples = buckets.map_batches(keep_hot, batch_format="pandas").to_pandas()
    pairs: set[tuple[int, int]] = set()
    for (_, _), group in hot_triples.groupby(["band", "bucket"]):
        recs = sorted(zip(group["doc_id"].tolist(), group["simhash"].tolist()))
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                a, ha = recs[i]
                b, hb = recs[j]
                if (a, b) not in pairs and textfns.hamming64(int(ha), int(hb)) <= max_hamming:
                    pairs.add((a, b))
    if not pairs:
        return pd.DataFrame(columns=["doc_a", "doc_b"]).astype("int64")
    return pd.DataFrame(sorted(pairs), columns=["doc_a", "doc_b"]).astype("int64")


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.9) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs (vec_a < vec_b, cosine >= threshold).

    Numpy matmul per batch against the broadcast normalized matrix."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    unit = mat / np.where(norms == 0, 1, norms)
    unit_ref = ray.put((ids, unit))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        all_ids, all_unit = ray.get(unit_ref)
        batch_ids = df["vec_id"].to_numpy()
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        mu = m / np.where(n == 0, 1, n)
        sims = mu @ all_unit.T  # (batch, all)
        rows = []
        for bi, a in enumerate(batch_ids):
            hit = np.where(sims[bi] >= threshold)[0]
            for hj in hit:
                b_ = all_ids[hj]
                if b_ > a:
                    rows.append({"vec_a": int(a), "vec_b": int(b_)})
        return pd.DataFrame(rows, columns=["vec_a", "vec_b"]).astype("int64")

    df = ds.map_batches(pairs, batch_format="pandas").to_pandas()
    if df.empty or "vec_a" not in df.columns:
        return pd.DataFrame({"vec_a": pd.Series(dtype="int64"), "vec_b": pd.Series(dtype="int64")})
    return df.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def dedup_keep_first(sf_dir: str) -> pd.DataFrame:
    """Materialized exact dedup: the surviving documents (keeper per distinct
    text). Distributed anti-join via broadcast keeper set — the shuffle-free
    form of `WHERE doc_id IN (SELECT min(doc_id) ... GROUP BY hash)`."""
    groups = exact_dedup(sf_dir)
    keepers = set(groups["keeper_doc_id"].tolist())
    keep_ref = ray.put(keepers)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(keep_ref)
        return df[df["doc_id"].isin(ks)]

    out = ds.map_batches(keep, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True).astype({"doc_id": "int64"})


def _union_find_clusters(pairs: list[tuple[int, int]], all_ids: list[int]) -> dict[int, int]:
    """Driver-side union-find (candidate pair sets are small by construction
    after LSH verification; the distributed alternative is
    ``label_propagation_clusters``)."""
    parent: dict[int, int] = {i: i for i in all_ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    # path-compress to cluster minima
    return {i: find(i) for i in all_ids}


def label_propagation_clusters(pairs_df: pd.DataFrame, ids: list[int], max_rounds: int = 50) -> pd.DataFrame:
    """Distributed-shaped min-label propagation over the dup-pair graph
    (the 100 TB-scale alternative to driver union-find): each round joins the
    current labels across edges and takes the min; converges in O(diameter)
    rounds. Implemented with Ray Datasets per round.

    Partitioning assumption: the edge list fits the object store as blocks;
    labels shuffle by doc_id each round.
    """
    import ray.data

    labels = {i: i for i in ids}
    edges = [(int(a), int(b)) for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"])]
    und = edges + [(b, a) for a, b in edges]
    if not und:
        return pd.DataFrame({"doc_id": sorted(ids), "cluster_id": sorted(ids)}).astype("int64")
    edge_ds = ray.data.from_items([{"src": a, "dst": b} for a, b in und])
    for _ in range(max_rounds):
        lab_ref = ray.put(labels)

        def relabel(df: pd.DataFrame) -> pd.DataFrame:
            lab = ray.get(lab_ref)
            return pd.DataFrame(
                {
                    "dst": df["dst"],
                    "label": [lab[s] for s in df["src"]],
                }
            )

        prop = (
            edge_ds.map_batches(relabel, batch_format="pandas")
            .to_pandas()
            .groupby("dst")["label"]
            .min()
        )
        changed = False
        for d, lab in prop.items():
            if lab < labels[d]:
                labels[d] = lab
                changed = True
        if not changed:
            break
    return (
        pd.DataFrame(
            {"doc_id": sorted(ids), "cluster_id": [labels[i] for i in sorted(ids)]}
        ).astype("int64")
    )


def dedup_clusters(sf_dir: str, threshold: float = 0.5, k: int = 3) -> pd.DataFrame:
    """Near-dup clusters: connected components over verified Jaccard pairs.

    (doc_id, cluster_id) where cluster_id = min doc_id in the component.
    Pairs come from the exact jaccard baseline so the recursive-SQL oracle is
    exact; the LSH path feeds the same clustering at scale.
    """
    pairs = ngram_jaccard_dupes(sf_dir, threshold=threshold, k=k)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    all_ids = sorted(ds.to_pandas()["doc_id"].tolist())
    mapping = _union_find_clusters(
        list(zip(pairs["doc_a"], pairs["doc_b"])), all_ids
    )
    return pd.DataFrame(
        {"doc_id": all_ids, "cluster_id": [mapping[i] for i in all_ids]}
    ).astype("int64")
