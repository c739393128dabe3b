"""Similarity-search example: brute-force vs LSH vs IVF top-k.

Run: python examples/similarity_search.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(smoke: bool = False) -> None:
    import numpy as np
    import pandas as pd

    from html_parser_ray.pipelines.similarity import ivf_knn_topk, knn_topk, lsh_knn_topk

    rng = np.random.RandomState(7)
    mat = rng.normal(size=(64, 16)).astype(np.float32)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(64, dtype=np.int64),
            "embedding": [list(map(float, v)) for v in mat],
            "label": np.arange(64) % 4,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(f"{d}/embeddings.parquet")
        exact = knn_topk(d, num_queries=3, k=5)
        lsh = lsh_knn_topk(d, num_queries=3, k=5, num_planes=4)
        ivf = ivf_knn_topk(d, num_queries=3, k=5, num_centroids=4, nprobe=2)
        recall = len(
            set(map(tuple, exact[["query_id", "neighbor_id"]].values.tolist()))
            & set(map(tuple, lsh[["query_id", "neighbor_id"]].values.tolist()))
        ) / len(exact)
        print(f"exact {len(exact)} rows; LSH recall {recall:.2f}; IVF {len(ivf)} rows")
        assert recall >= 0.5


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    run()
    ray.shutdown()
