"""Similarity search over the ``embeddings`` table.

- ``knn_topk``: brute-force cosine top-k — numpy matmul per batch against a
  broadcast (``ray.put`` once) query matrix. The exact baseline.
- ``lsh_knn_topk``: random-hyperplane-bucketed approximate variant — the scale
  path: candidates only from matching LSH buckets (multi-probe), exact rerank
  inside the bucket. Recall pinned by tests against the baseline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from html_parser_ray.pipelines.shuffle import read_table


def _load_matrix(sf_dir: str):
    emb = pd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat / np.where(norms == 0, 1, norms)


def knn_topk(sf_dir: str, num_queries: int = 5, k: int = 10) -> pd.DataFrame:
    """Exact top-k neighbors for the first ``num_queries`` vec_ids.

    Output: (query_id, neighbor_id, rank) with deterministic tie-break
    (higher cosine first, then lower vec_id). Self-matches excluded.
    """
    ids, unit = _load_matrix(sf_dir)
    order = np.argsort(ids)
    qpos = order[:num_queries]
    q_ids = ids[qpos]
    q_mat = unit[qpos]
    q_ref = ray.put((q_ids, q_mat))

    ds = read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        qids, qmat = ray.get(q_ref)
        batch_ids = df["vec_id"].to_numpy()
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        mu = m / np.where(n == 0, 1, n)
        sims = qmat @ mu.T  # (q, batch)
        rows = []
        for qi, qid in enumerate(qids):
            for bi, vid in enumerate(batch_ids):
                if vid == qid:
                    continue
                rows.append(
                    {"query_id": int(qid), "neighbor_id": int(vid), "cosine": sims[qi, bi]}
                )
        out = pd.DataFrame(rows)
        # per-batch partial top-k keeps the combine tiny
        out = out.sort_values(
            ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
        )
        return out.groupby("query_id", as_index=False, group_keys=False).head(k)

    partials = ds.map_batches(score, batch_format="pandas").to_pandas()
    final = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    final = final.groupby("query_id", as_index=False, group_keys=False).head(k)
    final["rank"] = final.groupby("query_id").cumcount() + 1
    return final[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)


def lsh_knn_topk(
    sf_dir: str,
    num_queries: int = 5,
    k: int = 10,
    num_planes: int = 8,
    seed: int = 7,
) -> pd.DataFrame:
    """Approximate top-k via random-hyperplane LSH buckets + exact rerank.

    Scale path: each vector hashes to a bucket (sign pattern of ``num_planes``
    projections); queries probe their bucket and all 1-bit-flip neighbors.
    """
    ids, unit = _load_matrix(sf_dir)
    dim = unit.shape[1]
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(num_planes, dim))

    order = np.argsort(ids)
    qpos = order[:num_queries]
    q_ids = ids[qpos]
    q_mat = unit[qpos]
    q_codes = ((q_mat @ planes.T > 0).astype(np.uint32) << np.arange(num_planes, dtype=np.uint32)).sum(axis=1)
    # multi-probe: each query accepts its bucket and all 1-bit flips
    probe_sets = [
        {int(c)} | {int(c) ^ (1 << b) for b in range(num_planes)} for c in q_codes
    ]
    bc_ref = ray.put((q_ids, q_mat, q_codes, probe_sets, planes))

    ds = read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        qids, qmat, qcodes, probes, pl = ray.get(bc_ref)
        batch_ids = df["vec_id"].to_numpy()
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        mu = m / np.where(n == 0, 1, n)
        bcodes = ((mu @ pl.T > 0).astype(np.uint32) << np.arange(pl.shape[0], dtype=np.uint32)).sum(axis=1)
        rows = []
        for qi, qid in enumerate(qids):
            mask = np.isin(bcodes, list(probes[qi])) & (batch_ids != qid)
            cand = np.where(mask)[0]
            if len(cand) == 0:
                continue
            sims = mu[cand] @ qmat[qi]
            top = np.lexsort((batch_ids[cand], -sims))[:k]
            for ci in top:
                rows.append(
                    {
                        "query_id": int(qid),
                        "neighbor_id": int(batch_ids[cand[ci]]),
                        "cosine": float(sims[ci]),
                    }
                )
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine"])

    partials = ds.map_batches(score, batch_format="pandas").to_pandas()
    if partials.empty:
        return pd.DataFrame(columns=["query_id", "neighbor_id", "rank"]).astype("int64")
    final = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    final = final.groupby("query_id", as_index=False, group_keys=False).head(k)
    final["rank"] = final.groupby("query_id").cumcount() + 1
    return (
        final[["query_id", "neighbor_id", "rank"]].astype("int64").reset_index(drop=True)
    )


def embedding_label_stats(sf_dir: str) -> pd.DataFrame:
    """Groupby label: vector counts and dimensionality (integer-exact)."""
    ds = read_table(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "label": df["label"],
                "n_vecs": 1,
                "dim": [len(e) for e in df["embedding"]],
            }
        )
        return out.groupby("label", as_index=False).agg(
            n_vecs=("n_vecs", "sum"), dim=("dim", "max")
        )

    df = ds.map_batches(partial, batch_format="pandas").to_pandas()
    result = df.groupby("label", as_index=False).agg(
        n_vecs=("n_vecs", "sum"), dim=("dim", "max")
    )
    return result.sort_values("label").reset_index(drop=True)


def ivf_knn_topk(
    sf_dir: str,
    num_queries: int = 5,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 11,
    kmeans_iters: int = 10,
) -> pd.DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: k-means centroids
    (numpy Lloyd iterations on the driver over a sample — the "train once"
    step a production system does offline), vectors assigned to their nearest
    centroid, queries probe the ``nprobe`` nearest cells and rerank exactly.

    The partition assumption: cell assignment is a pure function of the
    broadcast centroids, so assignment + rerank distribute as map_batches
    with no shuffle.
    """
    ids, unit = _load_matrix(sf_dir)
    rng = np.random.RandomState(seed)
    # train centroids on (up to) 2048 sampled vectors
    sample_idx = rng.choice(len(unit), size=min(2048, len(unit)), replace=False)
    cent = unit[rng.choice(sample_idx, size=min(num_centroids, len(sample_idx)), replace=False)]
    sample = unit[sample_idx]
    for _ in range(kmeans_iters):
        assign = (sample @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n

    order = np.argsort(ids)
    qpos = order[:num_queries]
    q_ids = ids[qpos]
    q_mat = unit[qpos]
    q_cells = np.argsort(-(q_mat @ cent.T), axis=1)[:, :nprobe]
    bc = ray.put((q_ids, q_mat, q_cells, cent))

    ds = read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        qids, qmat, qcells, centroids = ray.get(bc)
        batch_ids = df["vec_id"].to_numpy()
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        mu = m / np.where(n == 0, 1, n)
        cells = (mu @ centroids.T).argmax(axis=1)
        rows = []
        for qi, qid in enumerate(qids):
            mask = np.isin(cells, qcells[qi]) & (batch_ids != qid)
            cand = np.where(mask)[0]
            if len(cand) == 0:
                continue
            sims = mu[cand] @ qmat[qi]
            top = np.lexsort((batch_ids[cand], -sims))[:k]
            for ci in top:
                rows.append(
                    {
                        "query_id": int(qid),
                        "neighbor_id": int(batch_ids[cand[ci]]),
                        "cosine": float(sims[ci]),
                    }
                )
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine"])

    partials = ds.map_batches(score, batch_format="pandas").to_pandas()
    if partials.empty:
        return pd.DataFrame(columns=["query_id", "neighbor_id", "rank"]).astype("int64")
    final = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    final = final.groupby("query_id", as_index=False, group_keys=False).head(k)
    final["rank"] = final.groupby("query_id").cumcount() + 1
    return (
        final[["query_id", "neighbor_id", "rank"]].astype("int64").reset_index(drop=True)
    )
