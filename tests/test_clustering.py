"""Dedup clustering: union-find vs distributed label propagation parity."""

from __future__ import annotations

import pandas as pd
import pytest

from html_parser_ray.pipelines.dedup import (
    _union_find_clusters,
    label_propagation_clusters,
)


def test_union_find_basic():
    ids = [1, 2, 3, 4, 5, 6]
    pairs = [(1, 2), (2, 3), (5, 6)]
    m = _union_find_clusters(pairs, ids)
    assert m[1] == m[2] == m[3] == 1
    assert m[4] == 4
    assert m[5] == m[6] == 5


def test_union_find_chain_order_independent():
    ids = list(range(10))
    pairs = [(8, 9), (7, 8), (0, 9)]
    m = _union_find_clusters(pairs, ids)
    assert m[7] == m[8] == m[9] == m[0] == 0


def _docs_ds(ids):
    import ray.data

    return ray.data.from_pandas(pd.DataFrame({"doc_id": ids}))


def _df(out):
    return out if isinstance(out, pd.DataFrame) else out.to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_label_propagation_matches_union_find():
    ids = list(range(20))
    pairs_df = pd.DataFrame(
        {"doc_a": [0, 1, 5, 6, 10, 12], "doc_b": [1, 2, 6, 7, 11, 13]}
    )
    lp = _df(label_propagation_clusters(pairs_df, _docs_ds(ids)))
    uf = _union_find_clusters(
        list(zip(pairs_df["doc_a"], pairs_df["doc_b"])), ids
    )
    got = dict(zip(lp["doc_id"], lp["cluster_id"]))
    assert got == uf


@pytest.mark.usefixtures("ray_session")
def test_label_propagation_no_pairs():
    lp = _df(
        label_propagation_clusters(
            pd.DataFrame({"doc_a": [], "doc_b": []}), _docs_ds([3, 1, 2])
        )
    )
    assert lp["doc_id"].tolist() == [1, 2, 3]
    assert lp["cluster_id"].tolist() == [1, 2, 3]


@pytest.mark.usefixtures("ray_session")
def test_clusters_lsh_matches_exact_path(tmp_path):
    """The full LSH -> label-propagation scale path must produce the same
    clusters as the exact-pairs path on a planted-dupe corpus (high-threshold
    LSH recall is exact there)."""
    import numpy as np

    from html_parser_ray.pipelines.dedup import dedup_clusters, dedup_clusters_lsh

    rows = [
        {"doc_id": i, "text": " ".join(f"u{i}_{j}" for j in range(25))}
        for i in range(15)
    ]
    shared = " ".join(f"common{j}" for j in range(50))
    rows += [
        {"doc_id": 100, "text": shared},
        {"doc_id": 101, "text": shared + " tail"},
        {"doc_id": 102, "text": shared},
    ]
    import pandas as pd

    pd.DataFrame(rows).assign(lang="en", source="t").to_parquet(
        tmp_path / "documents.parquet"
    )
    exact = _df(dedup_clusters(str(tmp_path), threshold=0.7))
    lsh = _df(dedup_clusters_lsh(str(tmp_path), threshold=0.7))
    assert exact.values.tolist() == lsh.values.tolist()
    got = dict(zip(lsh["doc_id"], lsh["cluster_id"]))
    assert got[100] == got[101] == got[102] == 100


@pytest.mark.usefixtures("ray_session")
def test_label_propagation_chain_converges():
    """A 6-node path graph needs multiple propagation rounds (diameter > 1)."""
    ids = list(range(6))
    pairs_df = pd.DataFrame({"doc_a": [4, 3, 2, 1, 0], "doc_b": [5, 4, 3, 2, 1]})
    lp = _df(label_propagation_clusters(pairs_df, _docs_ds(ids)))
    assert lp["cluster_id"].tolist() == [0] * 6


@pytest.mark.usefixtures("ray_session")
def test_partitioned_lookup_primitive():
    """shuffle.partitioned_lookup: distributed inner lookup-join (the generic
    primitive; dtype-normalized keys, left_prep fusion, inner drop)."""
    import ray.data

    from html_parser_ray.pipelines.shuffle import partitioned_lookup

    left = ray.data.from_pandas(
        pd.DataFrame({"k": [1, 2, 2, 3, 9], "v": [10, 20, 21, 30, 90]})
    )
    right = ray.data.from_pandas(
        pd.DataFrame({"rid": [1, 2, 3, 4], "name": ["a", "b", "c", "d"]})
    )
    out = (
        partitioned_lookup(left, "k", right, "rid", "name", "nm", 4)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    assert out["nm"].tolist() == ["a", "b", "b", "c"]  # k=9 dropped (inner)
    # left_prep fuses a transform into the co-located pass
    out2 = partitioned_lookup(
        left, "k", right, "rid", "name", "nm", 4,
        left_prep=lambda df: df.drop_duplicates(subset=["k"]),
    ).to_pandas()
    assert sorted(out2["k"].astype(int).tolist()) == [1, 2, 3]


@pytest.mark.usefixtures("ray_session")
def test_partitioned_lookup_exact_above_2_53():
    """64-bit id-domain safety: a mixed-column union NaN-fills at the
    exchange concat and upcasts int64 to float64, silently corrupting ids
    and exact-cents payloads above 2^53 (the normal domain for 64-bit hash
    keys at web scale). The harmonized-columns union must keep every int64
    column exact end-to-end."""
    import ray.data

    from html_parser_ray.pipelines.shuffle import partitioned_lookup

    big = (1 << 62) + 1  # not representable in float64
    left = ray.data.from_pandas(
        pd.DataFrame({"k": [big, 5, 9], "payload": [big, 7, 8]})
    )
    right = ray.data.from_pandas(
        pd.DataFrame({"rk": [big, 5], "v": [big - 1, 20]})
    )
    out = (
        partitioned_lookup(left, "k", right, "rk", "v", "v", 4)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out.dtypes.astype(str).tolist() == ["int64"] * 3
    assert out["k"].tolist() == [5, big]
    assert out["payload"].tolist() == [7, big]
    assert out["v"].tolist() == [20, big - 1]


@pytest.mark.usefixtures("ray_session")
def test_partitioned_lookup_rejects_reserved_columns():
    import ray.data

    from html_parser_ray.pipelines.shuffle import partitioned_lookup

    left = ray.data.from_pandas(pd.DataFrame({"k": [1], "__feat": [1]}))
    right = ray.data.from_pandas(pd.DataFrame({"rk": [1], "v": [1]}))
    with pytest.raises(ValueError, match="reserved"):
        partitioned_lookup(left, "k", right, "rk", "v", "val", 2)


@pytest.mark.usefixtures("ray_session")
def test_label_propagation_exact_above_2_53():
    """Same 64-bit cliff in the clustering attach: `.map` over a mapping
    with ANY missing key returns float64, so labels above 2^53 round to the
    wrong id. Filter-then-map keeps int64 end-to-end."""
    big = 1 << 62
    ids = [big + 1, big + 3, big + 5, 7]
    pairs_df = pd.DataFrame(
        {"doc_a": [big + 1, big + 3], "doc_b": [big + 3, big + 5]}
    )
    lp = _df(label_propagation_clusters(pairs_df, _docs_ds(ids)))
    got = dict(zip(lp["doc_id"], lp["cluster_id"]))
    assert got == {big + 1: big + 1, big + 3: big + 1, big + 5: big + 1, 7: 7}
