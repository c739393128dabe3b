"""Round-4 operators (Q5 star join, Q13 histogram, global-p95 filter, exact
DAU, inverted-index stats, JSONL source): oracle cross-check at sf0.001 — a
SECOND scale factor from the driver's sf0.01 — plus structural properties
the SQL comparison can't see (driver-pull boundedness, zero-bucket
accounting, threshold rank rule)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

NEW_QUERIES = [
    "q5_local_supplier_volume",
    "customer_order_histogram",
    "orders_above_global_p95",
    "events_daily_distinct_users",
    "term_doc_frequency",
    "html_roundtrip_extract_jsonl",
]


def _df(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


@pytest.fixture(scope="module")
def oracle_con():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", NEW_QUERIES)
def test_new_operator_matches_oracle_at_sf0001(name, oracle_con):
    import __ray_entry__ as entrymod

    mine = _df(entrymod.queries()[name](SF)).reset_index(drop=True)
    oracle = oracle_con.execute(entrymod.oracle_sql()[name]).df().reset_index(
        drop=True
    )
    mine = mine[sorted(mine.columns)]
    oracle = oracle[sorted(oracle.columns)]
    assert list(mine.columns) == list(oracle.columns)
    assert len(mine) == len(oracle), (len(mine), len(oracle))
    for c in mine.columns:
        a, b = mine[c], oracle[c]
        try:
            assert (a.to_numpy() == b.to_numpy()).all(), c
        except (TypeError, ValueError):
            assert a.astype(str).equals(b.astype(str)), c


@pytest.mark.usefixtures("ray_session")
def test_q13_zero_bucket_accounting():
    from html_parser_ray.pipelines.relational import customer_order_histogram

    hist = customer_order_histogram(SF)
    total_customers = len(pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"]))
    assert int(hist["custdist"].sum()) == total_customers
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"])
    with_orders = orders["o_custkey"].nunique()
    zero_rows = hist.loc[hist["c_count"] == 0, "custdist"]
    expected_zero = total_customers - with_orders
    if expected_zero:
        assert int(zero_rows.iloc[0]) == expected_zero
    else:
        assert zero_rows.empty


@pytest.mark.usefixtures("ray_session")
def test_p95_threshold_rank_rule():
    """The distributed histogram walk must reproduce quantile_disc's
    sorted[ceil(q*n)-1] element exactly — checked against a local sort."""
    import numpy as np

    from html_parser_ray.pipelines.relational import orders_above_global_p95

    out = orders_above_global_p95(SF)
    prices = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_totalprice"])
    cents = np.round(prices["o_totalprice"].to_numpy() * 100).astype(np.int64)
    s = np.sort(cents)
    thresh = s[int(np.ceil(0.95 * len(s))) - 1]
    assert int(out["n_orders"].sum()) == int((cents >= thresh).sum())
    assert int(out["sum_cents"].sum()) == int(cents[cents >= thresh].sum())


@pytest.mark.usefixtures("ray_session")
def test_term_doc_frequency_bounded_and_ordered():
    from html_parser_ray.pipelines.text_analysis import term_doc_frequency

    out = term_doc_frequency(SF, min_df=3, k=25)
    assert len(out) <= 25
    assert (out["df"] >= 3).all()
    # (df DESC, term ASC) total order
    key = list(zip(-out["df"], out["term"]))
    assert key == sorted(key)


@pytest.mark.usefixtures("ray_session")
def test_jsonl_shards_deterministic_and_multi_file():
    """The JSONL writer must produce multiple shards (file-per-task read
    parallelism) with stable bytes across calls."""
    import glob
    import hashlib

    from html_parser_ray.pipelines.text_analysis import (
        _corpus_cache_key,
        html_roundtrip_extract_jsonl,
    )

    _df(html_roundtrip_extract_jsonl(SF))
    # derive THIS corpus's cache dir — other harnesses (e.g. the randomized
    # differential) create sibling /tmp/graft_jsonl_* dirs for their own
    # corpora, so a glob[-1] grab can inspect the wrong one
    d = f"/tmp/graft_jsonl_{_corpus_cache_key(f'{SF}/documents.parquet')}"
    assert os.path.isdir(d)
    shards = sorted(glob.glob(os.path.join(d, "*.jsonl")))
    assert len(shards) >= 2
    before = [hashlib.md5(open(s, "rb").read()).hexdigest() for s in shards]
    _df(html_roundtrip_extract_jsonl(SF))  # cached: must not rewrite
    after = [hashlib.md5(open(s, "rb").read()).hexdigest() for s in shards]
    assert before == after


@pytest.mark.usefixtures("ray_session")
def test_distributed_quantile_disc_matches_duckdb():
    """The coarse->fine drill-down must hit quantile_disc's exact element for
    arbitrary q, including ranks on coarse-bucket boundaries and domains
    wider than one bucket."""
    import duckdb
    import numpy as np

    import ray.data

    from html_parser_ray.pipelines.relational import _distributed_quantile_disc

    rng = np.random.RandomState(3)
    # wide domain (>> 2^16) with heavy ties and outliers
    vals = np.concatenate(
        [
            rng.randint(0, 1 << 30, size=4000),
            np.repeat(rng.randint(0, 1 << 30, size=5), 200),
            np.array([0, (1 << 31) - 10]),
        ]
    ).astype(np.int64)
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": vals}))
    for q in (0.01, 0.25, 0.5, 0.9, 0.95, 0.999, 1.0):
        exp = con.execute(f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
        got = _distributed_quantile_disc(ds, lambda df: df["v"].to_numpy(), q)
        assert got == exp, (q, got, exp)
