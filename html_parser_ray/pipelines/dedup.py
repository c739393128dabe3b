"""Deduplication pipelines over the ``documents`` table — distributed end-to-end.

Five families, each a first-class operator:
- exact:       md5 hash -> per-batch partial -> hash-partitioned combine
- ngram-jaccard: exact pairwise word-shingle Jaccard (broadcast shingle sets;
                 quadratic — the *baseline*; SQL-oracle-checked)
- minhash+LSH: shingle -> minhash -> band buckets -> co-partitioned candidate
               pairing -> distributed true-Jaccard verify (pair ⋈ shingles ⋈
               shingles) — the scale path
- simhash:     64-bit simhash -> banded buckets -> co-partitioned hamming pairs
- embedding:   cosine near-dup pairs over the embeddings table (broadcast
               matrix baseline)

Scale design (the round-2 rewrite): no dedup path materializes data on the
driver and none broadcasts corpus-sized state. All combines/pairings use
``shuffle.hash_partitioned`` (hash-partition + per-partition vectorized
pandas); pair verification co-locates both pair sides with the shingle table
in one union shuffle (see ``minhash_lsh_dupes``). The only broadcast ops
left are the *documented quadratic baselines* (``ngram_jaccard_dupes``,
``embedding_neardup_pairs``) kept as verification-scale oracle twins.

Cost note (measured at sf0.1, 32 CPUs, warm workers): an exchange's fixed
cost scales with the INPUT BLOCK COUNT, so every read here uses
``shuffle.read_table`` (size-aware ``override_num_blocks``) — that plus
chaining the minhash verify into two lookup exchanges (attach-a with fused
distinct, then attach-b + inline verify) cut minhash from the round-2 9.6s
to ~3.1s and simhash to ~1.6s with the identical scale-safe shapes. Result
ordering uses ``shuffle.sort_output`` (one execution + driver sort of the
output-sized frame; Ray's Dataset.sort costs ~2.6s regardless of size).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from html_parser_ray.functions import textfns
from html_parser_ray.pipelines.shuffle import (
    distinct_rows,
    hash_partitioned,
    join_partitions,
    read_table,
    sort_output,
)
from html_parser_ray.pipelines.similarity import _unit  # one zero-vector rule


def exact_dedup(sf_dir: str, num_partitions: int = 16) -> "ray.data.Dataset":
    """Range-partitioned exact dedup: (text_hash, keeper_doc_id, n_docs).

    map-side partial (per-batch groupby) -> RANGE-partitioned final combine.
    md5 is uniform, so partitioning by the hash PREFIX gives balanced
    partitions whose key ranges are ordered: blocks sorted within each
    partition come out globally sorted, saving the separate sort barrier a
    hash-partition + sort pipeline would pay. One shuffle total, carrying
    only pre-aggregated (hash, min, count) partials.
    """
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # NULL text -> NULL hash forming ONE group (DuckDB: md5(NULL) is
        # NULL and GROUP BY collects all NULLs together) — dropna=False
        # keeps the group pandas would silently discard
        hashed = pd.DataFrame(
            {
                "text_hash": [
                    textfns.md5_hex(t) if t is not None else None
                    for t in df["text"]
                ],
                "doc_id": df["doc_id"],
            }
        )
        out = hashed.groupby("text_hash", as_index=False, dropna=False).agg(
            keeper_doc_id=("doc_id", "min"), n_docs=("doc_id", "size")
        )
        # ordered range partition: first 3 hex chars (uniform under md5);
        # the NULL group rides in the LAST partition (oracle ORDER BY is
        # ASC NULLS LAST), keeping global output order sort-free
        out["part"] = [
            (int(h[:3], 16) * num_partitions) >> 12
            if isinstance(h, str)
            else num_partitions - 1
            for h in out["text_hash"]
        ]
        return out

    partials = ds.map_batches(partial, batch_format="pandas")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.drop(columns=["part"])
            .groupby("text_hash", as_index=False, dropna=False)
            .agg(keeper_doc_id=("keeper_doc_id", "min"), n_docs=("n_docs", "sum"))
            .sort_values("text_hash", na_position="last")
            .reset_index(drop=True)
        )

    return partials.groupby("part").map_groups(combine, batch_format="pandas")


def dedup_keep_first(sf_dir: str, num_partitions: int = 8) -> "ray.data.Dataset | pd.DataFrame":
    """Materialized exact dedup: the surviving documents (keeper per distinct
    text) via a distributed hash semi-join docs ⋈ keepers — no driver set,
    no corpus-sized broadcast."""
    # repartition: map_groups-produced datasets can carry 0-column empty
    # blocks that crash the join aggregator's block unify; repartition
    # rebuilds clean uniform blocks (and is the right move post-shrink anyway)
    keepers = (
        exact_dedup(sf_dir, num_partitions)
        .select_columns(["keeper_doc_id"])
        .repartition(join_partitions(num_partitions))
    )
    docs = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    joined = docs.join(
        keepers,
        join_type="inner",
        num_partitions=join_partitions(num_partitions),
        on=("doc_id",),
        right_on=("keeper_doc_id",),
    )
    return sort_output(
        joined.select_columns(["doc_id"]),
        ["doc_id"],
        pa.schema([("doc_id", pa.int64())]),
    )


def _load_shingles(sf_dir: str, k: int = 3) -> dict[int, set]:
    """Driver-side shingle dict — used ONLY by the quadratic baseline ops."""
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def sh(df: pd.DataFrame) -> pd.DataFrame:
        # NULL docs are excluded from the pair space (SQL: the shingle CTE
        # yields no rows for them)
        df = df[df["text"].notna()]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "shingles": [list(textfns.word_shingles(t, k)) for t in df["text"]],
            }
        )

    df = ds.map_batches(sh, batch_format="pandas").to_pandas()
    if df.empty or "doc_id" not in df.columns:
        return {}  # empty corpus: to_pandas() of a zero-row dataset is 0-column
    return {d: set(s) for d, s in zip(df["doc_id"], df["shingles"])}


def ngram_jaccard_dupes(sf_dir: str, threshold: float = 0.5, k: int = 3) -> pd.DataFrame:
    """Exact pairwise shingle-Jaccard pairs >= threshold (baseline oracle op).

    Broadcast pattern: the full shingle-set dict ships to the object store
    once; each task compares its batch's docs against all higher doc_ids.
    Quadratic by construction — verification scale only (the scale path is
    ``minhash_lsh_dupes``).
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
    if df.empty or "doc_a" not in df.columns:
        # zero matching pairs: to_pandas() of a zero-row dataset is 0-column
        return pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64")}
        )
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _bucket_pairs(g: pd.DataFrame, max_bucket: int) -> pd.DataFrame:
    """Candidate (doc_a < doc_b) pairs within each (band, bucket) group of
    one partition. Buckets up to ``max_bucket`` members pair all-vs-all;
    HOT buckets (the most-duplicated content — e.g. thousands of identical
    templated pages, which collide in EVERY band so other bands cannot
    rescue them) emit a STAR against the bucket's min doc_id instead:
    O(n) candidates that keep every member connected to the keeper, so
    downstream verify/clustering still sees the whole cluster without the
    O(n²) pair blowup."""
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    for _, grp in g.groupby(["band", "bucket"], sort=False):
        n = len(grp)
        if n < 2:
            continue
        ids = np.sort(grp["doc_id"].to_numpy())
        if n > max_bucket:
            out_a.append(np.full(n - 1, ids[0], dtype=ids.dtype))
            out_b.append(ids[1:])
            continue
        ia, ib = np.triu_indices(n, k=1)
        out_a.append(ids[ia])
        out_b.append(ids[ib])
    if not out_a:
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64")})
    return pd.DataFrame(
        {
            "doc_a": np.concatenate(out_a).astype("int64"),
            "doc_b": np.concatenate(out_b).astype("int64"),
        }
    )


_SHINGLE_SEP = "\x1f"


def _shingle_sets(sf_dir: str, k: int) -> "ray.data.Dataset":
    """(doc_id, shingles: str) feature table for distributed verify.

    Shingle sets serialize to one ``\\x1f``-joined string per doc: Arrow's
    acero join kernel cannot carry ``list<string>`` non-key columns, and a
    flat string shuffles/joins as a plain binary payload."""
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def sh(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["text"].notna()]  # NULL docs: no shingles, no pairs (SQL)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "shingles": [
                    _SHINGLE_SEP.join(sorted(textfns.word_shingles(t, k)))
                    for t in df["text"]
                ],
            }
        )

    return ds.map_batches(sh, batch_format="pandas")


# Materialize between chained exchanges: a groupby's sort stage SAMPLES its
# input, and in one lazy plan that re-executes the upstream exchanges
# (measured interleaved A/B at sf0.1, 32 cpus: lazy 4.13s median vs 3.25s
# materialized — the same effect round 3 measured on the cluster pipelines).
_MINHASH_MATERIALIZE = True


def minhash_lsh_dupes(
    sf_dir: str,
    threshold: float = 0.5,
    k: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    num_partitions: int = 16,
    max_bucket: int = 256,
) -> "ray.data.Dataset | pd.DataFrame":
    """MinHash + LSH near-dup pairs, verified with true Jaccard — distributed
    end-to-end, THREE chained exchanges in one streaming plan:

    shingle table (computed once, materialized — reused by the signature
    stage and both verify sides)
      -> signature map_batches -> (band, bucket, doc_id) triples
      -> exchange 1 (band, bucket): co-partitioned per-bucket pairing
         (hot-bucket star cap)
      -> exchange 2 (doc_a): attach doc_a's shingles AND fuse the cross-band
         DISTINCT (every band-copy of a pair shares doc_a, so all copies
         co-locate here — the distinct costs no extra shuffle)
      -> exchange 3 (doc_b): attach doc_b's shingles and verify true Jaccard
         inside the partition.

    Shuffles carry triples, pairs and pair-aligned shingle strings — never
    the corpus, and nothing lands on the driver until the output-sized
    result. The round-2 form paid five dataset executions (separate attach /
    zip exchanges plus a materialized candidate list consumed twice); the
    chained form pays two (the shingle table + the streaming plan), which is
    where the wall time went at verification scale.
    """
    if num_hashes % bands:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands}) "
            "— the band bucketing reshapes the signature into equal chunks"
        )
    rows_per_band = num_hashes // bands
    # one shingle pass, three consumers (sig + both feature sides)
    sh = _shingle_sets(sf_dir, k).materialize()

    def sig(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:  # np.stack rejects empty input (empty row groups)
            return pd.DataFrame(
                {
                    "band": pd.Series(dtype="int64"),
                    "bucket": pd.Series(dtype="int64"),
                    "doc_id": pd.Series(dtype="int64"),
                }
            )
        # signatures per doc (numpy affine minhash), then VECTORIZED band
        # bucketing: polynomial hash over each band's chunk across the whole
        # batch at once (equal chunks -> equal buckets; the 61-bit Mersenne
        # modulus keeps collisions negligible). Replaces a Python
        # hash(tuple(...)) per (doc, band) — 160k calls per sf0.1 batch set.
        ids = df["doc_id"].to_numpy()
        sigs = np.stack(
            [
                textfns.minhash_signature(
                    set(s.split(_SHINGLE_SEP)) if s else set(),
                    num_hashes=num_hashes,
                )
                for s in df["shingles"]
            ]
        ).astype(np.uint64)
        chunks = sigs.reshape(len(ids), bands, rows_per_band)
        weights = (
            np.arange(1, rows_per_band + 1, dtype=np.uint64) * np.uint64(1099511628211)
        )
        mersenne = np.uint64((1 << 61) - 1)
        buckets = ((chunks * weights[None, None, :]).sum(axis=2)) % mersenne
        return pd.DataFrame(
            {
                "band": np.tile(np.arange(bands, dtype=np.int64), len(ids)),
                "bucket": buckets.reshape(-1).astype(np.int64),
                "doc_id": np.repeat(ids, bands),
            }
        )

    triples = sh.map_batches(sig, batch_format="pandas")
    pair_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    cand = hash_partitioned(
        triples,
        ["band", "bucket"],
        lambda g: _bucket_pairs(g, max_bucket),
        num_partitions,
        out_schema=pair_schema,
    )
    if _MINHASH_MATERIALIZE:
        cand = cand.materialize()

    def key_a(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_a": df["doc_a"].astype("int64"),
                "doc_b": df["doc_b"].astype("int64"),
                "__key": df["doc_a"].astype("int64"),
                "__side": np.uint8(0),
            }
        )

    def key_feat(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_a": np.int64(-1),
                "doc_b": np.int64(-1),
                "__key": df["doc_id"].astype("int64"),
                "__side": np.uint8(2),
                "sh": df["shingles"],
            }
        )

    u_a = cand.map_batches(key_a, batch_format="pandas").union(
        sh.map_batches(key_feat, batch_format="pandas")
    )

    def attach_a(g: pd.DataFrame) -> pd.DataFrame:
        if "sh" not in g.columns:
            g = g.assign(sh=None)
        fm = g["__side"] == 2
        feats = g[fm]
        mapping = dict(zip(feats["__key"], feats["sh"]))
        # cross-band distinct fused here: all copies of (a, b) share doc_a
        lhs = g[~fm].drop_duplicates(subset=["doc_a", "doc_b"])
        lhs = lhs.assign(sh_a=lhs["__key"].map(mapping))
        lhs = lhs[lhs["sh_a"].notna()]
        return lhs[["doc_a", "doc_b", "sh_a"]]

    half_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("sh_a", pa.string())]
    )
    half = hash_partitioned(u_a, ["__key"], attach_a, num_partitions, out_schema=half_schema)
    if _MINHASH_MATERIALIZE:
        half = half.materialize()

    def key_b(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_a": df["doc_a"].astype("int64"),
                "doc_b": df["doc_b"].astype("int64"),
                "sh_a": df["sh_a"],
                "__key": df["doc_b"].astype("int64"),
                "__side": np.uint8(0),
            }
        )

    def key_feat_b(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_a": np.int64(-1),
                "doc_b": np.int64(-1),
                "sh_a": "",
                "__key": df["doc_id"].astype("int64"),
                "__side": np.uint8(2),
                "sh": df["shingles"],
            }
        )

    u_b = half.map_batches(key_b, batch_format="pandas").union(
        sh.map_batches(key_feat_b, batch_format="pandas")
    )

    def attach_b_verify(g: pd.DataFrame) -> pd.DataFrame:
        if "sh" not in g.columns:
            g = g.assign(sh=None)
        fm = g["__side"] == 2
        feats = g[fm]
        mapping = dict(zip(feats["__key"], feats["sh"]))
        lhs = g[~fm]
        sh_b = lhs["__key"].map(mapping)
        ok = sh_b.notna()
        lhs, sh_b = lhs[ok], sh_b[ok]
        keep = [
            textfns.jaccard(
                set(sa.split(_SHINGLE_SEP)) if sa else set(),
                set(sb.split(_SHINGLE_SEP)) if sb else set(),
            )
            >= threshold
            for sa, sb in zip(lhs["sh_a"], sh_b)
        ]
        out = lhs.loc[keep, ["doc_a", "doc_b"]]
        return out.astype({"doc_a": "int64", "doc_b": "int64"})

    verified = hash_partitioned(
        u_b, ["__key"], attach_b_verify, num_partitions, out_schema=pair_schema
    )
    return sort_output(verified, ["doc_a", "doc_b"], pair_schema)


def simhash_dupes(
    sf_dir: str,
    max_hamming: int = 3,
    num_partitions: int = 16,
    max_bucket: int = 256,
) -> "ray.data.Dataset | pd.DataFrame":
    """SimHash near-dup pairs: 4x16-bit band buckets -> co-partitioned hamming
    verify (the signatures travel with the triples, so verification happens
    inside the bucket partition — no joins, no driver)."""
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def sig(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            if text is None:  # NULL docs never pair (SQL exclusion)
                continue
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
        if not out:  # empty row groups: pd.DataFrame([]) has no columns
            return pd.DataFrame(
                {
                    "band": pd.Series(dtype="int64"),
                    "bucket": pd.Series(dtype="int64"),
                    "doc_id": pd.Series(dtype="int64"),
                    "simhash": pd.Series(dtype="uint64"),
                }
            )
        return pd.DataFrame(out).astype({"simhash": "uint64", "bucket": "int64"})

    triples = ds.map_batches(sig, batch_format="pandas")

    def bucket_hamming_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows_a: list[int] = []
        rows_b: list[int] = []
        for _, grp in g.groupby(["band", "bucket"], sort=False):
            n = len(grp)
            if n < 2:
                continue
            recs = sorted(zip(grp["doc_id"].to_numpy(), grp["simhash"].to_numpy()))
            if n > max_bucket:
                # hot bucket: star against the min member (see _bucket_pairs)
                a, ha = recs[0]
                for j in range(1, n):
                    b_, hb = recs[j]
                    if textfns.hamming64(int(ha), int(hb)) <= max_hamming:
                        rows_a.append(int(a))
                        rows_b.append(int(b_))
                continue
            for i in range(n):
                a, ha = recs[i]
                for j in range(i + 1, n):
                    b_, hb = recs[j]
                    if textfns.hamming64(int(ha), int(hb)) <= max_hamming:
                        rows_a.append(int(a))
                        rows_b.append(int(b_))
        return pd.DataFrame(
            {
                "doc_a": pd.Series(rows_a, dtype="int64"),
                "doc_b": pd.Series(rows_b, dtype="int64"),
            }
        )

    pair_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    pairs = hash_partitioned(
        triples,
        ["band", "bucket"],
        bucket_hamming_pairs,
        num_partitions,
        out_schema=pair_schema,
    )
    deduped = distinct_rows(
        pairs, ["doc_a", "doc_b"], num_partitions, out_schema=pair_schema
    )
    return sort_output(deduped, ["doc_a", "doc_b"], pair_schema)


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.9) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs (vec_a < vec_b, cosine >= threshold).

    Numpy matmul per batch against the broadcast normalized matrix — the
    all-pairs *baseline* (oracle-checkable); the bucketed scale path is
    ``embedding_neardup_lsh``."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    if emb.empty:
        return pd.DataFrame(
            {"vec_a": pd.Series(dtype="int64"), "vec_b": pd.Series(dtype="int64")}
        )
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    unit = _unit(mat)
    unit_ref = ray.put((ids, unit))

    ds = read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:  # np.stack rejects empty input (empty row groups)
            return pd.DataFrame(
                {"vec_a": pd.Series(dtype="int64"), "vec_b": pd.Series(dtype="int64")}
            )
        all_ids, all_unit = ray.get(unit_ref)
        batch_ids = df["vec_id"].to_numpy()
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        mu = _unit(m)
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


def embedding_neardup_lsh(
    sf_dir: str,
    threshold: float = 0.9,
    num_planes: int = 12,
    seed: int = 23,
    num_partitions: int = 16,
    max_bucket: int = 4096,
) -> "ray.data.Dataset | pd.DataFrame":
    """Bucketed embedding near-dup — the 100 TB shape: random-hyperplane LSH
    codes (multi-probe via 1-bit flips) bucket the vectors, cosine verify runs
    vectorized inside each co-partitioned bucket. Only the (bucket, vec)
    tuples shuffle; recall vs the all-pairs baseline is pinned by tests."""
    probe_rows = num_planes + 1  # own bucket + all 1-bit flips

    def code_batch(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:  # np.stack rejects empty input
            return pd.DataFrame(
                {
                    "bucket": pd.Series(dtype="int64"),
                    "vec_id": pd.Series(dtype="int64"),
                    "vec": pd.Series(dtype="object"),
                }
            )
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        mu = _unit(m)
        # planes derived from (seed, dim) only — identical in every task
        planes = np.random.RandomState(seed).normal(size=(num_planes, mu.shape[1]))
        codes = (
            (mu @ planes.T > 0).astype(np.uint32)
            << np.arange(num_planes, dtype=np.uint32)
        ).sum(axis=1)
        ids = df["vec_id"].to_numpy()
        out_bucket = np.empty(len(ids) * probe_rows, dtype=np.int64)
        out_id = np.repeat(ids, probe_rows)
        out_vec = np.repeat(np.arange(len(ids)), probe_rows)
        for i, c in enumerate(codes):
            lo = i * probe_rows
            out_bucket[lo] = c
            for b in range(num_planes):
                out_bucket[lo + 1 + b] = int(c) ^ (1 << b)
        vecs = [mu[v].astype(np.float32) for v in out_vec]
        return pd.DataFrame(
            {"bucket": out_bucket, "vec_id": out_id.astype("int64"), "vec": vecs}
        )

    ds = read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    coded = ds.map_batches(code_batch, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows_a: list[np.ndarray] = []
        rows_b: list[np.ndarray] = []
        for _, grp in g.groupby("bucket", sort=False):
            grp = grp.drop_duplicates(subset=["vec_id"])
            n = len(grp)
            if n < 2:
                continue
            ids = grp["vec_id"].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            mu = np.stack(grp["vec"].to_numpy())[order].astype(np.float64)
            if n > max_bucket:
                # hot bucket: star against the min member (see _bucket_pairs)
                sims = mu[1:] @ mu[0]
                hit = sims >= threshold
                rows_a.append(np.full(int(hit.sum()), ids[0], dtype=ids.dtype))
                rows_b.append(ids[1:][hit])
                continue
            sims = mu @ mu.T
            ia, ib = np.triu_indices(n, k=1)
            hit = sims[ia, ib] >= threshold
            rows_a.append(ids[ia[hit]])
            rows_b.append(ids[ib[hit]])
        if not rows_a:
            return pd.DataFrame(
                {"vec_a": pd.Series(dtype="int64"), "vec_b": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(rows_a).astype("int64"),
                "vec_b": np.concatenate(rows_b).astype("int64"),
            }
        )

    vec_pair_schema = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())])
    pairs = hash_partitioned(
        coded, ["bucket"], bucket_pairs, num_partitions, out_schema=vec_pair_schema
    )
    deduped = distinct_rows(
        pairs, ["vec_a", "vec_b"], num_partitions, out_schema=vec_pair_schema
    )
    return sort_output(deduped, ["vec_a", "vec_b"], vec_pair_schema)


def _union_find_clusters(pairs: list[tuple[int, int]], all_ids: list[int]) -> dict[int, int]:
    """Driver-side union-find — kept ONLY as the small-scale test twin of the
    distributed ``label_propagation_clusters``."""
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
    return {i: find(i) for i in all_ids}


def label_propagation_clusters(
    pairs: "ray.data.Dataset | pd.DataFrame",
    docs: "ray.data.Dataset",
    max_rounds: int = 50,
    num_partitions: int = 8,
) -> "ray.data.Dataset | pd.DataFrame":
    """Distributed min-label propagation WITH POINTER JUMPING over the
    dup-pair graph — the 100 TB-scale connected components. Labels live in a
    Dataset keyed by doc_id; each round costs TWO task-based hash-partitioned
    exchanges (no ``Dataset.join`` — its per-round aggregator-actor pools
    cost 5-7s each at verification scale, the round-2 bottleneck):

    - exchange 1 (key = node id): the label table is the lookup side. Edge
      rows keyed by ``src`` pick up ``label[src]`` and address it to ``dst``;
      pointer rows keyed by ``label[v]`` pick up ``label[label[v]]`` and
      address it to ``v`` (pointer jumping / path halving — labels chase
      their grandparent each round, so convergence needs ~log(diameter)
      rounds instead of diameter).
    - exchange 2 (key = node id): min over {current label, neighbor
      contributions, grandparent contribution} per node -> new label table.

    Convergence is detected by the monotonically decreasing global label sum
    (one cheap aggregate per round). Partitioning assumption: edges and
    labels hash-partition by node id; no driver state beyond the scalar sum.
    """
    if isinstance(pairs, pd.DataFrame):
        pairs = ray.data.from_pandas(pairs) if len(pairs) else None

    label_schema = pa.schema([("doc_id", pa.int64()), ("label", pa.int64())])
    contrib_schema = pa.schema([("node", pa.int64()), ("cand", pa.int64())])

    labels = docs.map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "label": df["doc_id"].astype("int64")}
        ),
        batch_format="pandas",
    ).materialize()
    if pairs is not None:
        pairs = pairs.materialize()  # count() + edges both consume it
    cluster_schema = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])
    if pairs is None or pairs.count() == 0:
        return sort_output(
            labels.map_batches(
                lambda df: df.rename(columns={"label": "cluster_id"}),
                batch_format="pandas",
            ),
            ["doc_id"],
            cluster_schema,
        )

    # undirected edge list (both directions)
    edges = pairs.map_batches(
        lambda df: pd.concat(
            [
                pd.DataFrame(
                    {"src": df["doc_a"].astype("int64"), "dst": df["doc_b"].astype("int64")}
                ),
                pd.DataFrame(
                    {"src": df["doc_b"].astype("int64"), "dst": df["doc_a"].astype("int64")}
                ),
            ],
            ignore_index=True,
        ),
        batch_format="pandas",
    ).materialize()

    def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "__key": df["src"].astype("int64"),
                "node": df["dst"].astype("int64"),
                "label": np.int64(0),
                "__side": np.uint8(0),
            }
        )

    def tag_pointer(df: pd.DataFrame) -> pd.DataFrame:
        # ask for label[label[v]], addressed back to v
        return pd.DataFrame(
            {
                "__key": df["label"].astype("int64"),
                "node": df["doc_id"].astype("int64"),
                "label": np.int64(0),
                "__side": np.uint8(0),
            }
        )

    def tag_feat(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "__key": df["doc_id"].astype("int64"),
                "node": np.int64(-1),
                "label": df["label"].astype("int64"),
                "__side": np.uint8(2),
            }
        )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        fm = g["__side"] == 2
        feats = g[fm]
        mapping = pd.Series(
            feats["label"].to_numpy(), index=feats["__key"].to_numpy()
        )
        lhs = g[~fm]
        # filter-then-map: mapping with ANY missing key returns float64
        # (NaN), corrupting int64 labels above 2^53 — map only present keys
        # so the dtype stays int64 end-to-end
        sub = lhs[lhs["__key"].isin(mapping.index)]
        cand = sub["__key"].map(mapping)
        return pd.DataFrame(
            {
                "node": sub["node"].to_numpy(),
                "cand": cand.to_numpy(),
            }
        ).astype({"node": "int64", "cand": "int64"})

    def min_combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["cand"].min()
        return out.rename(columns={"node": "doc_id", "cand": "label"})

    prev_sum = labels.sum("label")
    for _ in range(max_rounds):
        requests = edges.map_batches(tag_edge, batch_format="pandas").union(
            labels.map_batches(tag_pointer, batch_format="pandas"),
            labels.map_batches(tag_feat, batch_format="pandas"),
        )
        contrib = hash_partitioned(
            requests, ["__key"], attach, num_partitions, out_schema=contrib_schema
        )
        cur = labels.map_batches(
            lambda df: pd.DataFrame(
                {"node": df["doc_id"].astype("int64"), "cand": df["label"].astype("int64")}
            ),
            batch_format="pandas",
        )
        labels = hash_partitioned(
            contrib.union(cur),
            ["node"],
            min_combine,
            num_partitions,
            out_schema=label_schema,
        ).materialize()
        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s

    # sort_output: DataFrame for output-sized results, distributed sort
    # above small_limit — Dataset.sort's ~2.6s fixed cost was pure overhead
    return sort_output(
        labels.map_batches(
            lambda df: df.rename(columns={"label": "cluster_id"}),
            batch_format="pandas",
        ),
        ["doc_id"],
        cluster_schema,
    )


def dedup_clusters(sf_dir: str, threshold: float = 0.5, k: int = 3) -> "ray.data.Dataset | pd.DataFrame":
    """Near-dup clusters over the EXACT pairwise-Jaccard baseline — an
    ORACLE TWIN, not a production operator. The pair stage
    (``ngram_jaccard_dupes``) is quadratic in corpus size by construction;
    it exists so the recursive-CTE SQL oracle can check the clustering
    exactly at verification scale.

    **Production users: call ``dedup_clusters_lsh``** — the same distributed
    label-propagation clustering fed by MinHash+LSH candidate pairs; every
    stage is a Dataset shuffle and nothing is quadratic. (The query key
    ``dedup_clusters`` is kept for driver-contract stability.)

    Output: (doc_id, cluster_id) with cluster_id = min doc_id in the
    component."""
    pairs = ngram_jaccard_dupes(sf_dir, threshold=threshold, k=k)
    docs = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return label_propagation_clusters(pairs, docs)


def dedup_clusters_lsh(
    sf_dir: str, threshold: float = 0.5, k: int = 3
) -> "ray.data.Dataset | pd.DataFrame":
    """The 100 TB clustering path end-to-end: MinHash+LSH candidate pairs
    (co-partitioned pairing + distributed verify) feed the distributed
    label propagation — every stage a Dataset, nothing on the driver.

    At high thresholds LSH recall is near-perfect, so this matches
    ``dedup_clusters`` on the test corpora (pinned by tests and by the
    committed golden at sf0.01)."""
    pairs = minhash_lsh_dupes(sf_dir, threshold=threshold, k=k)
    docs = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    # label_propagation_clusters accepts Dataset | DataFrame directly
    return label_propagation_clusters(pairs, docs)


def _flatten_words(df: pd.DataFrame, with_lens: bool = False):
    """Explode space-split words into one flat object array + parallel doc-id
    array. ``str.split(" ")`` with the explicit separator (empty text -> one
    empty word) so the SQL oracle's ``string_split(text, ' ')`` is bit-equal.
    With ``with_lens`` also returns the per-document word counts (for callers
    that need within-doc positions, e.g. ``doc_chunk_dupes``).

    NULL texts are dropped (not crashed on): the SQL-oracle rule for every
    word-based operator is ``unnest(string_split(NULL, ' '))`` = no rows, so
    a NULL document contributes no words — distinct from the empty string,
    which contributes one empty word.
    """
    if df["text"].isna().any():
        df = df[df["text"].notna()]
    words_lists = [t.split(" ") for t in df["text"].to_numpy()]
    lens = np.fromiter(
        (len(ws) for ws in words_lists), dtype=np.int64, count=len(words_lists)
    )
    flat = np.array(
        [w for ws in words_lists for w in ws], dtype=object
    )
    docs = np.repeat(df["doc_id"].to_numpy(), lens)
    if with_lens:
        return flat, docs, lens
    return flat, docs


def shingle_dupes(
    sf_dir: str, k: int = 5, min_docs: int = 2, num_partitions: int = 16
) -> "ray.data.Dataset | pd.DataFrame":
    """Verbatim word-``k``-gram overlap across documents — the exact-substring
    flavor of dedup (near-verbatim reuse that MinHash's set view misses).

    Map side: per batch, one flat object-array pass builds every consecutive
    ``k``-word shingle (elementwise concat over shifted views, windows
    crossing a doc boundary masked out), then pre-aggregates to
    (shingle, doc_id, cnt) — complete per doc because a doc never spans
    batches. One hash-partitioned exchange by ``shingle`` then counts global
    occurrences and distinct docs per shingle and keeps those seen in
    ``min_docs``+ documents. At 100 TB the exchange carries one row per
    distinct (shingle, doc) pair — the same partial-shrink-then-shuffle shape
    as ``exact_dedup``; hot shingles (boilerplate) concentrate but each
    reduces to a single output row, so skew is count-sized, not row-sized.
    """
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "shingle": pd.Series(dtype="object"),
                "doc_id": pd.Series(dtype="int64"),
                "cnt": pd.Series(dtype="int64"),
            }
        )
        if len(df) == 0:
            return empty
        w, d = _flatten_words(df)
        n = len(w)
        if n < k:
            return empty
        m = n - k + 1
        sh = w[:m]
        for j in range(1, k):
            sh = sh + (" " + w[j : m + j])  # elementwise object-str concat
        ok = d[:m] == d[k - 1 :]
        out = pd.DataFrame(
            {"shingle": sh[ok], "doc_id": d[:m][ok].astype("int64")}
        )
        return (
            out.groupby(["shingle", "doc_id"], as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        # (shingle, doc_id) rows are globally unique -> n_docs is a row count
        agg = g.groupby("shingle", as_index=False).agg(
            n_occurrences=("cnt", "sum"), n_docs=("doc_id", "size")
        )
        agg = agg[agg["n_docs"] >= min_docs]
        return agg.astype({"n_occurrences": "int64", "n_docs": "int64"})

    out_schema = pa.schema(
        [
            ("shingle", pa.string()),
            ("n_occurrences", pa.int64()),
            ("n_docs", pa.int64()),
        ]
    )
    return sort_output(
        hash_partitioned(
            ds.map_batches(partial, batch_format="pandas"),
            ["shingle"],
            per_partition,
            num_partitions,
        ),
        ["shingle"],
        out_schema,
    )


def _lev_le1(a: str, b: str) -> bool:
    """Exact edit-distance<=1 check (lengths within 1 by construction)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # lb == la + 1: b must equal a with one insertion
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def part_name_fuzzy_pairs(
    sf_dir: str, num_partitions: int = 16
) -> "ray.data.Dataset | pd.DataFrame":
    """**Fuzzy string-similarity join** — distinct name pairs at edit
    distance exactly 1, via FastSS deletion-neighborhood blocking
    (Bocek et al., 2007): two strings are within distance 1 only if their
    deletion neighborhoods D(s) = {s} ∪ {s minus one char} intersect, so
    each name emits len+1 (variant, name) keys and only names sharing a
    variant ever meet. Blocking admits false positives (e.g. "ab"/"ba"
    share both "a" and "b" at distance 2), so every candidate pair is
    verified with the exact distance check inside its variant partition.

    Scale shape: per-batch distinct names -> one hash exchange by VARIANT
    (bucket size is bounded by the distance-1 neighborhood of the variant,
    not by corpus size) -> verified pairs -> one distinct exchange by pair
    (the same pair can surface from several shared variants). Never
    quadratic in the corpus; the SQL oracle is the quadratic
    levenshtein self-join at verification scale.
    """
    ds = read_table(f"{sf_dir}/part.parquet", columns=["p_name"])

    def emit_variants(df: pd.DataFrame) -> pd.DataFrame:
        names = df["p_name"].drop_duplicates()
        var, nm = [], []
        for s in names:
            var.append(s)
            nm.append(s)
            for i in range(len(s)):
                var.append(s[:i] + s[i + 1 :])
                nm.append(s)
        return pd.DataFrame({"variant": var, "p_name": nm}).drop_duplicates()

    variants = ds.map_batches(emit_variants, batch_format="pandas")

    def pair_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out = [], []
        for _, grp in g.groupby("variant"):
            names = sorted(set(grp["p_name"]))
            if len(names) < 2:
                continue
            for i in range(len(names)):
                for j in range(i + 1, len(names)):
                    if _lev_le1(names[i], names[j]):
                        a_out.append(names[i])
                        b_out.append(names[j])
        return pd.DataFrame({"name_a": a_out, "name_b": b_out})

    # out_schema: this exchange CHAINS into distinct_rows' exchange, and the
    # 0-column empty blocks map_groups emits for empty sort ranges would
    # KeyError the next with_part once block count exceeds partitions
    pairs = hash_partitioned(
        variants,
        ["variant"],
        pair_in_bucket,
        num_partitions,
        out_schema=pa.schema([("name_a", pa.string()), ("name_b", pa.string())]),
    )
    uniq = distinct_rows(
        pairs,
        ["name_a", "name_b"],
        num_partitions,
        out_schema=pa.schema([("name_a", pa.string()), ("name_b", pa.string())]),
    )
    return sort_output(
        uniq,
        ["name_a", "name_b"],
        pa.schema([("name_a", pa.string()), ("name_b", pa.string())]),
    )


def doc_chunk_dupes(
    sf_dir: str, k: int = 8, min_docs: int = 2, num_partitions: int = 16
) -> "ray.data.Dataset | pd.DataFrame":
    """**Passage-level exact dedup** (round 5): non-overlapping ``k``-word
    chunks repeated across documents — the scalable chunk-hash approximation
    of suffix-array EXACTSUBSTR dedup (Lee et al., "Deduplicating Training
    Data Makes Language Models Better"), the form production LLM pipelines
    run when the corpus is too large for suffix arrays.

    Map side: one flat object-array pass per batch chunks every doc at fixed
    ``k``-word strides (trailing partials dropped — only FULL chunks are
    comparable across docs) and pre-aggregates to (chunk, doc_id, cnt).
    Unlike ``shingle_dupes``' sliding windows this emits n/k rows, not n —
    the exchange is k-fold slimmer, which is what makes passage dedup
    affordable at 100 TB. One hash exchange by chunk, then per-partition
    distinct-doc counting keeps chunks seen in ``min_docs``+ documents.
    Boilerplate chunks concentrate on one partition but reduce to one output
    row each — skew is count-sized.
    """
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "chunk": pd.Series(dtype="object"),
                "doc_id": pd.Series(dtype="int64"),
                "cnt": pd.Series(dtype="int64"),
            }
        )
        if len(df) == 0:
            return empty
        flat, docs, lens = _flatten_words(df, with_lens=True)
        n = len(flat)
        if n < k:
            return empty
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        pos = np.arange(n, dtype=np.int64) - starts  # position within doc
        doclen = np.repeat(lens, lens)
        # chunk anchors: stride-k positions with a FULL chunk left in the doc
        idx = np.nonzero((pos % k == 0) & (pos + k <= doclen))[0]
        if len(idx) == 0:
            return empty
        sh = flat[idx]
        for j in range(1, k):
            sh = sh + (" " + flat[idx + j])  # elementwise object-str concat
        out = pd.DataFrame({"chunk": sh, "doc_id": docs[idx].astype("int64")})
        return (
            out.groupby(["chunk", "doc_id"], as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )

    parts = ds.map_batches(partial, batch_format="pandas")

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("chunk", as_index=False).agg(
            n_docs=("doc_id", "nunique"), n_occurrences=("cnt", "sum")
        )
        agg = agg[agg["n_docs"] >= min_docs]
        return agg.astype({"n_docs": "int64", "n_occurrences": "int64"})

    out_schema = pa.schema(
        [
            ("chunk", pa.string()),
            ("n_docs", pa.int64()),
            ("n_occurrences", pa.int64()),
        ]
    )
    return sort_output(
        hash_partitioned(parts, ["chunk"], per_partition, num_partitions),
        ["chunk"],
        out_schema,
    )
