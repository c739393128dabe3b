"""Dedup + similarity pipeline tests on a crafted corpus with known dupes.

LSH variants are pinned against the exact baselines (recall), not just run.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from html_parser_ray.functions import textfns


def _df(out):
    """Pair pipelines return Dataset | DataFrame (sort_output pulls small
    results driver-side in one execution)."""
    return out if isinstance(out, pd.DataFrame) else out.to_pandas()


def test_shingles_and_jaccard():
    a = textfns.word_shingles("a b c d e", 3)
    assert a == {"a b c", "b c d", "c d e"}
    b = textfns.word_shingles("a b c d x", 3)
    assert textfns.jaccard(a, a) == 1.0
    assert 0 < textfns.jaccard(a, b) < 1
    assert textfns.word_shingles("a b", 3) == {"a b"}
    assert textfns.word_shingles("", 3) == set()
    # 0/0 Jaccard pinned to 0.0: empty docs never pair (oracle parity — the
    # SQL shingle CTE gives empty docs a [NULL] set and NULL <> NULL)
    assert textfns.jaccard(set(), set()) == 0.0
    assert textfns.jaccard(a, set()) == 0.0


def test_minhash_estimates_jaccard():
    rng = np.random.RandomState(0)
    words = [f"w{i}" for i in range(200)]
    a = set(words[:150])
    b = set(words[50:])  # jaccard = 100/200 = 0.5
    sa = textfns.minhash_signature(a, num_hashes=256)
    sb = textfns.minhash_signature(b, num_hashes=256)
    est = float((sa == sb).mean())
    assert abs(est - 0.5) < 0.12


def test_minhash_deterministic():
    s = {"x y z", "y z w"}
    assert (textfns.minhash_signature(s) == textfns.minhash_signature(s)).all()


def test_simhash_similar_texts_close():
    t1 = "the quick brown fox jumps over the lazy dog " * 5
    t2 = t1.replace("lazy", "sleepy")
    t3 = "completely different words entirely unrelated content here now"
    h1, h2, h3 = (textfns.simhash64(t) for t in (t1, t2, t3))
    assert textfns.hamming64(h1, h2) < textfns.hamming64(h1, h3)
    assert textfns.simhash64("") == 0


def test_fingerprint_and_md5():
    assert textfns.fingerprint64("abc") != textfns.fingerprint64("abd")
    assert textfns.md5_hex("abc") == "900150983cd24fb0d6963f7d28e17f72"


def test_langid_heuristic():
    assert textfns.detect_language("the cat and the dog in the house") == "en"
    assert textfns.detect_language("le chat et la maison dans les rues") == "fr"
    assert textfns.detect_language("der Hund und die Katze ist ein Tier") == "de"
    assert textfns.detect_language("el perro y la casa es una cosa para") == "es"
    assert textfns.detect_language("这是一个中文句子这是一个中文句子") == "zh"
    assert textfns.detect_language("") == "unknown"


def test_quality_features():
    f = textfns.quality_features("The cat, and a dog!")
    assert f["n_tokens"] == 5
    assert f["n_stopwords"] == 3  # the, and, a
    assert f["n_punct"] == 2


@pytest.fixture(scope="module")
def dup_corpus(tmp_path_factory):
    """documents.parquet-shaped table with planted near-duplicates."""
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    rows = []
    for i in range(30):
        words = base.split()
        rng = np.random.RandomState(i)
        # unique filler
        extra = [f"unique{i}_{j}" for j in range(20)]
        rows.append({"doc_id": i, "text": " ".join(words + extra)})
    # planted near-dupes: 100/101 near-identical, 102 exact dupe of 100
    ndup = " ".join(f"common{j}" for j in range(60))
    rows.append({"doc_id": 100, "text": ndup})
    rows.append({"doc_id": 101, "text": ndup + " tail"})
    rows.append({"doc_id": 102, "text": ndup})
    df = pd.DataFrame(rows)
    d = tmp_path_factory.mktemp("dup")
    df.assign(
        lang="en", source="syn", n_chars=df["text"].str.len()
    ).to_parquet(d / "documents.parquet")
    return str(d)


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup_finds_exact_dupes(dup_corpus):
    from html_parser_ray.pipelines.dedup import exact_dedup

    out = exact_dedup(dup_corpus).to_pandas()
    dupes = out[out["n_docs"] > 1]
    assert len(dupes) == 1
    assert dupes.iloc[0]["keeper_doc_id"] == 100
    assert dupes.iloc[0]["n_docs"] == 2


@pytest.mark.usefixtures("ray_session")
def test_lsh_recall_matches_exact_jaccard(dup_corpus):
    from html_parser_ray.pipelines.dedup import minhash_lsh_dupes, ngram_jaccard_dupes

    exact = ngram_jaccard_dupes(dup_corpus, threshold=0.8)
    lsh = _df(minhash_lsh_dupes(dup_corpus, threshold=0.8))
    exact_pairs = set(map(tuple, exact.values.tolist()))
    lsh_pairs = set(map(tuple, lsh.values.tolist()))
    assert (100, 101) in exact_pairs
    assert (100, 102) in exact_pairs
    # LSH with 32 bands at 0.8 threshold must find all true pairs here
    assert lsh_pairs == exact_pairs


@pytest.mark.usefixtures("ray_session")
def test_simhash_finds_planted_dupes(dup_corpus):
    from html_parser_ray.pipelines.dedup import simhash_dupes

    out = _df(simhash_dupes(dup_corpus, max_hamming=6))
    pairs = set(map(tuple, out.values.tolist()))
    assert (100, 102) in pairs  # identical text -> identical simhash
    assert (100, 101) in pairs  # near-identical


@pytest.fixture(scope="module")
def emb_dir(tmp_path_factory):
    rng = np.random.RandomState(3)
    base = rng.normal(size=(40, 16)).astype(np.float32)
    # make 30/31 near-identical
    base[31] = base[30] + rng.normal(scale=0.01, size=16).astype(np.float32)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(40, dtype=np.int64),
            "embedding": [list(map(float, v)) for v in base],
            "label": np.arange(40) % 4,
        }
    )
    d = tmp_path_factory.mktemp("emb")
    df.to_parquet(d / "embeddings.parquet")
    return str(d)


@pytest.mark.usefixtures("ray_session")
def test_embedding_neardup(emb_dir):
    from html_parser_ray.pipelines.dedup import embedding_neardup_pairs

    out = embedding_neardup_pairs(emb_dir, threshold=0.99)
    assert (30, 31) in set(map(tuple, out.values.tolist()))


@pytest.mark.usefixtures("ray_session")
def test_embedding_neardup_lsh_recall(emb_dir):
    """Bucketed LSH near-dup must find every pair the all-pairs baseline
    finds at high threshold (multi-probe with 12 planes on 40 vecs)."""
    from html_parser_ray.pipelines.dedup import (
        embedding_neardup_lsh,
        embedding_neardup_pairs,
    )

    exact = embedding_neardup_pairs(emb_dir, threshold=0.99)
    lsh = _df(embedding_neardup_lsh(emb_dir, threshold=0.99))
    exact_pairs = set(map(tuple, exact.values.tolist()))
    lsh_pairs = set(map(tuple, lsh.values.tolist()))
    assert (30, 31) in lsh_pairs
    # LSH can only miss pairs (bucketing), never invent them
    assert lsh_pairs <= exact_pairs or exact_pairs == lsh_pairs
    assert len(lsh_pairs) >= len(exact_pairs) * 0.9


@pytest.mark.usefixtures("ray_session")
def test_knn_vs_bruteforce_numpy(emb_dir):
    from html_parser_ray.pipelines.similarity import knn_topk

    out = knn_topk(emb_dir, num_queries=3, k=5)
    # oracle: plain numpy
    df = pd.read_parquet(f"{emb_dir}/embeddings.parquet")
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for q in range(3):
        sims = unit @ unit[q]
        sims[q] = -2
        order = np.lexsort((np.arange(len(sims)), -sims))[:5]
        got = out[out["query_id"] == q].sort_values("rank")["neighbor_id"].tolist()
        assert got == list(order), q


@pytest.mark.usefixtures("ray_session")
def test_lsh_knn_high_recall(emb_dir):
    from html_parser_ray.pipelines.similarity import knn_topk, lsh_knn_topk

    exact = knn_topk(emb_dir, num_queries=3, k=5)
    approx = lsh_knn_topk(emb_dir, num_queries=3, k=5, num_planes=4)
    # multi-probe with 4 planes on 40 vecs: candidates cover most of the space
    inter = 0
    total = 0
    for q in range(3):
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        inter += len(e & a)
        total += len(e)
    assert inter / total >= 0.6


@pytest.mark.usefixtures("ray_session")
def test_ivf_knn_high_recall(emb_dir):
    from html_parser_ray.pipelines.similarity import ivf_knn_topk, knn_topk

    exact = knn_topk(emb_dir, num_queries=3, k=5)
    approx = ivf_knn_topk(emb_dir, num_queries=3, k=5, num_centroids=4, nprobe=2)
    inter = total = 0
    for q in range(3):
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        inter += len(e & a)
        total += len(e)
    assert inter / total >= 0.6


@pytest.mark.usefixtures("ray_session")
def test_ivf_deterministic(emb_dir):
    from html_parser_ray.pipelines.similarity import ivf_knn_topk

    a = ivf_knn_topk(emb_dir, num_queries=2, k=4)
    b = ivf_knn_topk(emb_dir, num_queries=2, k=4)
    assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
def test_hot_bucket_star_pairing(tmp_path):
    """A duplicate cluster LARGER than the hot-bucket cap (identical docs
    collide in every band, so 'other bands' cannot rescue them) must still
    connect every member via star pairs against the min doc — the round-2
    code-review found the old cap silently dropped such clusters entirely."""
    shared = " ".join(f"common{j}" for j in range(40))
    rows = [{"doc_id": i, "text": shared} for i in range(30)]
    rows.append({"doc_id": 500, "text": "totally unrelated " + "filler " * 30})
    pd.DataFrame(rows).assign(lang="en", source="t").to_parquet(
        tmp_path / "documents.parquet"
    )
    from html_parser_ray.pipelines.dedup import dedup_clusters_lsh, minhash_lsh_dupes

    out = minhash_lsh_dupes(str(tmp_path), threshold=0.9, max_bucket=8)
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    pairs = set(map(tuple, out.values.tolist()))
    # star through doc 0 connects the whole 30-doc cluster
    for b in range(1, 30):
        assert (0, b) in pairs, b
    clusters = _df(dedup_clusters_lsh(str(tmp_path), threshold=0.9))
    got = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    assert all(got[i] == 0 for i in range(30))
    assert got[500] == 500


@pytest.mark.usefixtures("ray_session")
def test_minhash_empty_corpus_and_no_dupes(tmp_path):
    """Empty-batch guard + typed empty result (Dataset|DataFrame union)."""
    rows = [{"doc_id": i, "text": f"unique {i} " + " ".join(f"w{i}_{j}" for j in range(30))} for i in range(6)]
    pd.DataFrame(rows).assign(lang="en", source="t").to_parquet(
        tmp_path / "documents.parquet"
    )
    from html_parser_ray.pipelines.dedup import minhash_lsh_dupes

    out = minhash_lsh_dupes(str(tmp_path), threshold=0.9)
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    assert list(df.columns) == ["doc_a", "doc_b"]
    assert len(df) == 0


def test_lev_le1_exactness():
    from html_parser_ray.pipelines.dedup import _lev_le1

    assert _lev_le1("abc", "abc")
    assert _lev_le1("abc", "abd")      # substitution
    assert _lev_le1("abc", "abcd")     # insertion at end
    assert _lev_le1("abc", "xabc")     # insertion at front
    assert _lev_le1("abc", "ac")       # deletion
    assert not _lev_le1("ab", "ba")    # the classic FastSS false positive
    assert not _lev_le1("abc", "axy")
    assert not _lev_le1("abc", "abcde")


@pytest.mark.usefixtures("ray_session")
def test_part_name_fuzzy_pairs_planted(tmp_path):
    import pandas as pd

    from html_parser_ray.pipelines.dedup import part_name_fuzzy_pairs

    names = [
        "red bolt", "red belt",       # substitution pair
        "blue gear", "blue gears",    # insertion pair
        "green cog",                  # isolated
        "ab", "ba",                   # blocking false positive: must NOT pair
        "red bolt",                   # duplicate name: distinct first
    ]
    pd.DataFrame({"p_name": names}).to_parquet(tmp_path / "part.parquet")
    out = part_name_fuzzy_pairs(str(tmp_path), num_partitions=4)
    import ray.data

    if isinstance(out, ray.data.Dataset):
        out = out.to_pandas()
    got = sorted(map(tuple, out[["name_a", "name_b"]].itertuples(index=False)))
    assert got == [("blue gear", "blue gears"), ("red belt", "red bolt")]


def test_hll_sketch_properties():
    import numpy as np

    from html_parser_ray.functions.sketches import (
        hll_build,
        hll_estimate,
        hll_merge,
    )

    vals = [f"user-{i}" for i in range(5000)]
    whole = hll_build(vals)
    # merge of disjoint partials == whole-build; duplicates are idempotent
    half = hll_merge(hll_build(vals[:2500]), hll_build(vals[2500:]))
    dup = hll_merge(whole, hll_build(vals[1000:4000]))
    assert (whole == half).all() and (whole == dup).all()
    # error bound: ~3.25% expected for m=1024; allow 3 sigma
    est = hll_estimate(whole)
    assert abs(est - 5000) / 5000 < 0.10, est
    # small-range linear counting stays near-exact
    small = hll_estimate(hll_build([f"u{i}" for i in range(150)]))
    assert abs(small - 150) <= 8, small


@pytest.mark.usefixtures("ray_session")
def test_events_user_hll_partition_invariance(tmp_path):
    import pandas as pd

    from html_parser_ray.pipelines.relational import events_user_hll

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "event_type": ["click"] * 600 + ["view"] * 300,
            "user_id": list(range(200)) * 3 + list(range(100)) * 3,
            "ts": [base] * 900,
        }
    )
    df.to_parquet(tmp_path / "events.parquet")
    out = events_user_hll(str(tmp_path)).set_index("event_type")
    # duplicates across rows cannot inflate the sketch (idempotent merge)
    assert abs(out.loc["click", "approx_users"] - 200) <= 15
    assert abs(out.loc["view", "approx_users"] - 100) <= 10


def test_similarity_no_driver_table_load():
    """Round-4 scale fix tripwire: similarity must never materialize the
    embeddings table on the driver (pd.read_parquet was the one true
    scale-killer left in round 3)."""
    import inspect

    from html_parser_ray.pipelines import similarity

    src = inspect.getsource(similarity)
    assert "pd.read_parquet" not in src


def test_mix64_matches_splitmix64_spec():
    """The sampling hash is splitmix64's finalizer — pin it against a pure
    python-int evaluation so numpy casting changes can't silently shift the
    kmeans sample."""
    import numpy as np

    from html_parser_ray.pipelines.similarity import _mix64

    def ref(x: int) -> int:
        m = (1 << 64) - 1
        x = (x + 0x9E3779B97F4A7C15) & m
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & m
        x ^= x >> 27
        x = (x * 0x94D049BB133111EB) & m
        x ^= x >> 31
        return x

    vals = np.array([0, 1, 2, 12345, 2**31, 2**62], dtype=np.int64)
    got = _mix64(vals)
    assert [int(v) for v in got] == [ref(int(v)) for v in vals]


def test_query_matrix_and_sample_bounded(ray_session):
    import numpy as np

    from html_parser_ray.pipelines import similarity

    sf = "/root/testdata/sf0.001"
    similarity._query_cache.clear()
    similarity._sample_cache.clear()
    ids, unit = similarity._query_matrix(sf, 5)
    import pandas as pd

    all_ids = pd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id"])[
        "vec_id"
    ].to_numpy()
    assert list(ids) == sorted(all_ids)[:5]
    assert np.allclose(np.linalg.norm(unit, axis=1), 1.0)
    sample = similarity._train_sample(sf, target=32)
    assert len(sample) <= 32
    # deterministic across calls (cache cleared)
    similarity._sample_cache.clear()
    assert np.array_equal(sample, similarity._train_sample(sf, target=32))


@pytest.mark.usefixtures("ray_session")
def test_jaccard_oracle_parity_on_irregular_whitespace(tmp_path):
    """The Jaccard family shingles over \\S+ tokens; the oracle must
    tokenize identically on tabs / newlines / double spaces (the former
    string_split(text, ' ') oracle diverged on such corpora)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod
    from html_parser_ray.pipelines.dedup import ngram_jaccard_dupes

    d = tmp_path / "sfws"
    d.mkdir()
    # docs 1 and 2 are near-identical but differ in whitespace style;
    # doc 3 is unrelated
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "alpha beta gamma delta epsilon",
                        "alpha  beta\tgamma\ndelta epsilon",
                        "zeta eta theta iota kappa",
                    ]
                ),
            }
        ),
        d / "documents.parquet",
    )
    out = ngram_jaccard_dupes(str(d))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    oracle = con.execute(entrymod.oracle_sql()["ngram_jaccard_dupes"]).df()
    pd.testing.assert_frame_equal(
        out.astype({c: oracle[c].dtype for c in oracle.columns}), oracle
    )
    # and the whitespace-insensitive pair is actually found
    assert [(1, 2)] == list(map(tuple, out.to_numpy()))


def test_minhash_rejects_indivisible_bands():
    from html_parser_ray.pipelines.dedup import minhash_lsh_dupes

    with pytest.raises(ValueError, match="divisible"):
        minhash_lsh_dupes("/root/testdata/sf0.001", num_hashes=128, bands=24)


@pytest.mark.usefixtures("ray_session")
def test_knn_and_pair_ops_survive_empty_blocks(tmp_path):
    """Empty row groups / 0-row blocks must not crash the score or pair
    UDFs (np.stack rejects empty input), and an empty table yields the
    empty result, not a KeyError."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from html_parser_ray.pipelines.dedup import embedding_neardup_pairs
    from html_parser_ray.pipelines.similarity import knn_topk

    d = tmp_path / "sfemb"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
                "label": pa.array([], pa.int32()),
            }
        ),
        d / "embeddings.parquet",
    )
    out = knn_topk(str(d))
    assert len(out) == 0
    pairs = embedding_neardup_pairs(str(d))
    assert len(pairs) == 0 and list(pairs.columns) == ["vec_a", "vec_b"]


@pytest.mark.usefixtures("ray_session")
def test_jaccard_and_simhash_empty_corpus(tmp_path):
    """A zero-row documents table returns typed empty results across the
    dedup family (the 0-column to_pandas hazard)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from html_parser_ray.pipelines.dedup import ngram_jaccard_dupes, simhash_dupes

    d = tmp_path / "sfdoc0"
    d.mkdir()
    pq.write_table(
        pa.table(
            {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
        ),
        d / "documents.parquet",
    )
    out = ngram_jaccard_dupes(str(d))
    assert len(out) == 0 and list(out.columns) == ["doc_a", "doc_b"]
    sd = simhash_dupes(str(d))
    if not isinstance(sd, pd.DataFrame):
        sd = sd.to_pandas()
    assert len(sd) == 0
