"""Round-5 directive pins (VERDICT r4 "Next round" + ADVICE):

- parquet row-group-statistics min/max (no driver-side column pull);
- the empty-block schema warning: WHY the in-partial fix is impossible
  (map_groups never calls the UDF on empty blocks) and that the targeted
  logging filter removes exactly the empty-schema variant;
- per-doc queries return Datasets (no corpus-scaled DataFrame pulls).
"""

from __future__ import annotations

import logging
import sys

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def test_parquet_column_min_max_reads_stats_only(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from html_parser_ray.pipelines.shuffle import parquet_column_min_max

    lo, hi = parquet_column_min_max(f"{SF}/documents.parquet", "doc_id")
    assert (lo, hi) == (0, 499)
    # directory form: the min/max fold must span MULTIPLE files (and the
    # overall extremes must come from different files)
    d = tmp_path / "multi"
    d.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array([40, 7, 12], pa.int64())}), d / "a.parquet")
    pq.write_table(pa.table({"doc_id": pa.array([3, 99], pa.int64())}), d / "b.parquet")
    assert parquet_column_min_max(str(d), "doc_id") == (3, 99)


def test_doc_pack_assignments_source_has_no_driver_column_pull():
    """ADVICE r4: the min/max must come from footer statistics, not a
    ``to_table(columns=['doc_id'])`` driver materialization."""
    import inspect

    from html_parser_ray.pipelines import text_analysis

    src = inspect.getsource(text_analysis.doc_pack_assignments)
    assert "to_table" not in src
    assert "parquet_column_min_max" in src


@pytest.mark.usefixtures("ray_session")
def test_map_groups_skips_empty_blocks():
    """The justification pin for the empty-block warning filter: Ray's
    map_groups NEVER calls the UDF for an empty input block, so a
    schema-stable empty frame cannot be returned from the partial. If this
    ever starts failing (Ray begins calling the UDF), the filter in
    shuffle.py can be retired in favor of typed empties from the partials."""
    import ray.data

    df = pd.DataFrame({"part": [0, 0, 1, 1], "v": [1, 2, 3, 4]})
    # 8 blocks over 2 distinct keys -> sort ranges WILL be empty
    ds = ray.data.from_pandas(df).repartition(8)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        assert len(g) > 0, "Ray started calling map_groups UDFs on empty blocks"
        return pd.DataFrame({"part": [g["part"].iloc[0]], "n": [len(g)]})

    out = (
        ds.groupby("part")
        .map_groups(fn, batch_format="pandas")
        .to_pandas()
        .sort_values("part")
        .reset_index(drop=True)
    )
    assert out["n"].tolist() == [2, 2]


@pytest.mark.usefixtures("ray_session")
def test_empty_block_schema_warning_is_filtered(caplog):
    """VERDICT r4 item 5: the `PandasBlockSchema(names=[])` warnings must be
    gone from pipeline runs. Runs a pivot (the named offender) under log
    capture and asserts no empty-schema divergence warning survives the
    filter, while the filter passes through non-empty divergences."""
    from html_parser_ray.pipelines.relational import events_type_pivot
    from html_parser_ray.pipelines.shuffle import _EmptyBlockSchemaWarningFilter

    logger_name = "ray.data._internal.execution.streaming_executor_state"
    with caplog.at_level(logging.WARNING, logger=logger_name):
        out = events_type_pivot(SF)
    assert len(out) > 0
    bad = [
        r
        for r in caplog.records
        if r.name == logger_name
        and "different schema than the previous one" in r.getMessage()
        and ("names=[], types=[]" in r.getMessage() or "new schema: None" in r.getMessage())
    ]
    assert not bad, [r.getMessage()[:200] for r in bad]

    # the filter is TARGETED: a genuine (non-empty) divergence still warns
    f = _EmptyBlockSchemaWarningFilter()
    rec = logging.LogRecord(
        logger_name, logging.WARNING, __file__, 1,
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: PandasBlockSchema(names=['a']), new "
        "schema: PandasBlockSchema(names=['b'], types=[dtype('int64')]).",
        None, None,
    )
    assert f.filter(rec) is True
    rec_empty = logging.LogRecord(
        logger_name, logging.WARNING, __file__, 1,
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: PandasBlockSchema(names=['a']), new "
        "schema: PandasBlockSchema(names=[], types=[]).",
        None, None,
    )
    assert f.filter(rec_empty) is False


@pytest.mark.usefixtures("ray_session")
def test_per_doc_queries_return_datasets_at_scale_shape():
    """VERDICT r4 item 7 tripwire: queries whose RESULT is corpus-scaled
    (per-doc rows) must stay Datasets until the harness boundary whenever
    the result exceeds the small-result pull threshold. sort_output's
    contract: Dataset for big results, DataFrame only for output-sized
    small ones — so per-doc queries must route through sort_output (or
    return a Dataset directly), never a blanket .to_pandas()."""
    import inspect

    from html_parser_ray.pipelines import dedup, text_analysis

    per_doc = [
        text_analysis.doc_quality,
        text_analysis.doc_fingerprints,
        text_analysis.doc_pack_assignments,
        text_analysis.doc_repetition_stats,
        text_analysis.quality_filter,
        dedup.exact_dedup,
        dedup.dedup_keep_first,
        dedup.dedup_clusters_lsh,
    ]
    for fn in per_doc:
        src = inspect.getsource(fn)
        returns_dataset = (
            "sort_output" in src  # Dataset above small_limit by contract
            or ".sort(" in src  # distributed sort -> Dataset
            or "ray.data.Dataset" in src
        )
        assert returns_dataset, fn.__name__
        # and no blanket driver pull of the per-doc result
        assert ".to_pandas()" not in src.split("return")[-1], fn.__name__


@pytest.mark.usefixtures("ray_session")
def test_sort_output_keeps_large_results_distributed():
    """Above small_limit, sort_output must return a Dataset (distributed
    sort), not a driver-side DataFrame."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from html_parser_ray.pipelines.shuffle import sort_output

    n = 5000
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(n)[::-1], "v": np.arange(n)})
    ).repartition(4)
    schema = pa.schema([("doc_id", pa.int64()), ("v", pa.int64())])
    out = sort_output(ds, ["doc_id"], schema, small_limit=1000)
    assert isinstance(out, ray.data.Dataset)
    head = out.take(3)
    assert [r["doc_id"] for r in head] == [0, 1, 2]


@pytest.mark.usefixtures("ray_session")
def test_tfidf_chained_exchange_survives_empty_blocks():
    """First-exchange out_schema regression: with fewer partitions than
    blocks, the term exchange emits empty sort ranges whose 0-column blocks
    previously KeyError'd the second exchange's with_part."""
    from html_parser_ray.pipelines.text_analysis import tfidf_top_terms

    base = tfidf_top_terms(SF)
    if not isinstance(base, pd.DataFrame):
        base = base.to_pandas()
    tight = tfidf_top_terms(SF, num_partitions=2)
    if not isinstance(tight, pd.DataFrame):
        tight = tight.to_pandas()
    pd.testing.assert_frame_equal(
        base.reset_index(drop=True), tight.reset_index(drop=True)
    )


@pytest.mark.usefixtures("ray_session")
def test_empty_string_text_matches_sql_token_convention(tmp_path):
    """'' splits to [''] = 1 token in BOTH python and duckdb string_split;
    the old falsy-guard counted 0 and silently shifted every downstream
    aggregate (worst: the doc_pack prefix sum moves every later pack_id)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod
    from html_parser_ray.pipelines.text_analysis import (
        doc_pack_assignments,
        doc_token_stats,
    )

    d = tmp_path / "sfe"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(["", "two words", "three little words"]),
                "lang": pa.array(["en"] * 3),
                "n_chars": pa.array([0, 9, 18], pa.int64()),
                "source": pa.array(["t"] * 3),
            }
        ),
        d / "documents.parquet",
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )

    stats = doc_token_stats(str(d))
    oracle = con.execute(entrymod.oracle_sql()["doc_token_stats"]).df()
    assert int(stats["sum_tokens"].iloc[0]) == int(oracle["sum_tokens"].iloc[0]) == 6

    packs = doc_pack_assignments(str(d), budget_tokens=4)
    if not isinstance(packs, pd.DataFrame):
        packs = packs.to_pandas()
    po = con.execute(
        "WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens "
        "FROM documents), "
        "c AS (SELECT doc_id, n_tokens, COALESCE(SUM(n_tokens) OVER ("
        "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
        "), 0) AS before FROM t) "
        "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, "
        "CAST(before // 4 AS BIGINT) AS pack_id FROM c ORDER BY doc_id"
    ).df()
    pd.testing.assert_frame_equal(
        packs.reset_index(drop=True).astype("int64"), po.astype("int64")
    )


def test_parquet_column_min_max_missing_column_degrades(tmp_path):
    """The documented contract: a column absent from the file schema returns
    (None, None) so callers fall back to a distributed aggregate — never a
    ValueError out of footer reading."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from html_parser_ray.pipelines.shuffle import parquet_column_min_max

    p = tmp_path / "t.parquet"
    pq.write_table(pa.table({"a": pa.array([1, 2, 3], pa.int64())}), p)
    assert parquet_column_min_max(str(p), "nope") == (None, None)


def test_read_blocks_unknown_layout_defers_to_ray(tmp_path):
    """A directory whose parquet files sit in subdirectories (hive layout)
    must not be pinned at min_blocks — read_blocks returns None (let Ray
    size the read) and read_table still reads the data."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from html_parser_ray.pipelines.shuffle import read_blocks, read_table

    d = tmp_path / "hive"
    (d / "part=0").mkdir(parents=True)
    pq.write_table(
        pa.table({"a": pa.array([1, 2], pa.int64())}), d / "part=0" / "x.parquet"
    )
    # nested layout is still sized (recursive glob)...
    assert read_blocks(str(d)) == 8
    # ...and a dir with no .parquet anywhere defers to Ray
    e = tmp_path / "opaque"
    e.mkdir()
    (e / "data.bin").write_bytes(b"x")
    assert read_blocks(str(e)) is None


@pytest.mark.usefixtures("ray_session")
def test_partitioned_lookup_keeps_matched_null_values_and_rejects_dup_keys():
    """Inner semantics are by KEY membership: a matched right row with a
    NULL value keeps its left rows. Duplicate right keys violate the
    documented unique-key contract and must fail loudly (last-wins would be
    nondeterministic under block arrival order)."""
    import pandas as pd
    import ray.data

    from html_parser_ray.pipelines.shuffle import partitioned_lookup

    left = ray.data.from_pandas(
        pd.DataFrame({"k": [1, 2, 3], "payload": [10, 20, 30]})
    )
    right = ray.data.from_pandas(
        pd.DataFrame({"rk": [1, 2], "v": [7.0, float("nan")]})
    )
    out = (
        partitioned_lookup(left, "k", right, "rk", "v", "val", num_partitions=2)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # k=3 unmatched -> dropped; k=2 matched with NULL value -> KEPT
    assert out["k"].tolist() == [1, 2]

    dup_right = ray.data.from_pandas(
        pd.DataFrame({"rk": [1, 1], "v": [7.0, 8.0]})
    )
    with pytest.raises(Exception, match="duplicate right-side keys"):
        partitioned_lookup(
            left, "k", dup_right, "rk", "v", "val", num_partitions=2
        ).materialize()


@pytest.mark.usefixtures("ray_session")
def test_hash_partitioned_rejects_reserved_part_column():
    import pandas as pd
    import ray.data

    from html_parser_ray.pipelines.shuffle import hash_partitioned

    ds = ray.data.from_pandas(pd.DataFrame({"part": [1, 2], "x": [3, 4]}))
    with pytest.raises(Exception, match="reserved"):
        hash_partitioned(ds, ["x"], lambda g: g, 2).materialize()


@pytest.mark.usefixtures("ray_session")
def test_curated_corpus_tolerates_null_text(tmp_path):
    """A NULL-text document must be filtered (SQL: len(string_split(NULL))
    NULL -> fails the token floor), not crash the featurize pass."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from html_parser_ray.pipelines.curation import curated_corpus

    d = tmp_path / "sfnull"
    d.mkdir()
    many = " ".join(["tok"] * 64)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array([many, None, many + " x"]),
            }
        ),
        d / "documents.parquet",
    )
    out = curated_corpus(str(d), min_tokens=40, sample_pct=100)
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    assert 2 not in set(out["doc_id"])
    assert {1, 3}.issuperset(set(out["doc_id"])) and len(out) >= 1


@pytest.mark.usefixtures("ray_session")
def test_sort_output_large_path_normalizes_empty_blocks():
    """The large path must apply the same schema guarantee as the small
    path: map_groups emits 0-row 0-COLUMN blocks for empty partitions, and
    the distributed sort must see typed blocks, not crash or drift."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from html_parser_ray.pipelines.shuffle import hash_partitioned, sort_output

    n = 4000
    ds = ray.data.from_pandas(
        pd.DataFrame({"k": np.arange(n) % 7, "v": np.arange(n)})
    ).repartition(8)

    def maybe_empty(g: pd.DataFrame) -> pd.DataFrame:
        # starve some partitions to force empty map_groups outputs
        if int(g["k"].iloc[0]) % 3 == 0:
            return g.iloc[0:0]
        return g

    parts = hash_partitioned(ds, ["k"], maybe_empty, num_partitions=12)
    schema = pa.schema([("k", pa.int64()), ("v", pa.int64())])
    out = sort_output(parts, ["v"], schema, small_limit=100)
    assert isinstance(out, ray.data.Dataset)
    rows = out.take(3)
    assert [r["v"] for r in rows] == sorted(r["v"] for r in rows)
    assert set(rows[0].keys()) == {"k", "v"}


@pytest.mark.usefixtures("ray_session")
def test_doc_pack_assignments_near_int64_ceiling(tmp_path):
    """Overflow pin (r5 differential, seed 201): range bucketing was
    ``(ids - lo) * num_ranges // span`` — multiply-before-divide, which
    wraps int64 when the id span approaches 2^63 (64-bit hash keys at web
    scale) and scatters the top ids into NEGATIVE range ids, breaking the
    prefix-sum order. The divide-first form must reproduce the serial
    layout on ids within 2^41 of the int64 ceiling."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from html_parser_ray.pipelines.text_analysis import doc_pack_assignments

    top = (1 << 63) - 1
    ids = np.array(
        [5, 11, (1 << 40) + 3, (1 << 62) + 7, top - 9, top - 2], dtype=np.int64
    )
    texts = ["a b c", "d e", "f g h i", "j", "k l m", "n o"]
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts}),
        tmp_path / "documents.parquet",
    )
    out = doc_pack_assignments(str(tmp_path), budget_tokens=4)
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    df = df.sort_values("doc_id").reset_index(drop=True)
    order = np.argsort(ids)
    ntok = np.array([len(t.split(" ")) for t in texts], dtype=np.int64)[order]
    before = np.concatenate([[0], ntok.cumsum()[:-1]])
    assert df["doc_id"].tolist() == ids[order].tolist()
    assert df["n_tokens"].tolist() == ntok.tolist()
    assert df["pack_id"].tolist() == (before // 4).tolist()


@pytest.mark.usefixtures("ray_session")
def test_knn_near_tie_order_is_float64_and_oracle_agrees(tmp_path):
    """Oracle-precision pin (r5 differential, seed 307): DuckDB's
    ``list_cosine_similarity`` accumulates in the list's ELEMENT type, so
    on the raw ``FLOAT[]`` embedding column it scores in float32 — whose
    ~6e-8 ulp can flip the true order of near-tied cosines. The engine
    upcasts to float64 before scoring (``similarity.py``), and the oracle
    SQL must state the same precision via ``CAST(... AS DOUBLE[])``.

    This test plants two neighbors whose float64 cosines to the query are
    DISTINCT but within one float32 ulp (deterministic search over a
    rotation angle), with the truly-closer neighbor carrying the HIGHER
    vec_id — so a float32 tie + id-ASC tiebreak would rank them backwards.
    It then requires (a) the engine order equals exact-rational math and
    (b) the committed oracle SQL reproduces the engine frame exactly."""
    from fractions import Fraction

    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod
    from html_parser_ray.pipelines.similarity import knn_topk

    dim = 64
    q = np.full(dim, 1.0)
    q /= np.linalg.norm(q)
    r = np.zeros(dim)
    r[0] = 1.0
    r -= r.dot(q) * q
    r /= np.linalg.norm(r)
    q32 = q.astype(np.float32)

    def cos64(v32: np.ndarray) -> float:
        a = v32.astype(np.float64)
        b = q32.astype(np.float64)
        au = a / np.sqrt((a * a).sum())
        bu = b / np.sqrt((b * b).sum())
        return float((au * bu).sum())

    base = 0.905
    planted = None
    for i in range(1, 400):
        ca, cb = base, base + i * 1e-9
        a32 = (ca * q + np.sqrt(1 - ca * ca) * r).astype(np.float32)
        b32 = (cb * q + np.sqrt(1 - cb * cb) * r).astype(np.float32)
        fa, fb = cos64(a32), cos64(b32)
        if fa != fb and np.float32(fa) == np.float32(fb):
            planted = (a32, b32) if fa > fb else (b32, a32)
            break
    assert planted is not None, "search failed to produce a float32 near-tie"
    lo32, hi32 = planted  # lo32 = truly-closer vector -> gets the HIGHER id

    # exact-rational confirmation that the float64 ordering is the true one
    def exact_cos2(v32: np.ndarray):
        av = [Fraction(float(x)) for x in v32]
        bv = [Fraction(float(x)) for x in q32]
        num = sum(x * y for x, y in zip(av, bv))
        den = sum(x * x for x in av) * sum(y * y for y in bv)
        return num * num / den, num > 0

    (c2_hi_id, pos1), (c2_lo_id, pos2) = exact_cos2(lo32), exact_cos2(hi32)
    assert pos1 and pos2 and c2_hi_id > c2_lo_id

    vecs = [q32, hi32, lo32]  # vec_id 2 (lo32) is truly closer than vec_id 1
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2], pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([0, 0, 0], pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    out = knn_topk(str(tmp_path)).reset_index(drop=True)
    q0 = out[out["query_id"] == 0]
    assert q0["neighbor_id"].tolist() == [2, 1], (
        "engine must rank by float64 cosine, not a float32 tie + id ASC"
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'embeddings.parquet'}')"
    )
    oracle = con.execute(entrymod.oracle_sql()["knn_topk"]).df()
    pd.testing.assert_frame_equal(
        out.astype({c: oracle[c].dtype for c in oracle.columns}), oracle
    )
