"""Training-data hygiene operators: PII scrub, decontamination, n-gram
census, length quantiles — planted-fixture semantics plus DuckDB
cross-checks of the exact oracle SQL expressions."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from html_parser_ray.pipelines import hygiene


def _write_docs(tmp_path, rows):
    df = pd.DataFrame(rows)
    if "lang" not in df:
        df["lang"] = "en"
    df["n_chars"] = df["text"].str.len().astype("int64")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def _as_pandas(result):
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------


def test_scrub_text_counts_and_redacts():
    n_e, n_ip, n_ph, red = hygiene.scrub_text(
        "mail a.b@x.org and c@y.co.uk via 10.0.0.1 or 255.255.255.255 "
        "call 555-0001 and 555-12345"
    )
    assert n_e == 2
    assert n_ip == 2
    # 555-12345: \b after 4 digits fails (digit follows), so only one match
    assert n_ph == 1
    assert "<EMAIL>" in red and "<IP>" in red and "<PHONE>" in red
    assert "a.b@x.org" not in red and "10.0.0.1" not in red


def test_scrub_text_no_pii_is_identity():
    n_e, n_ip, n_ph, red = hygiene.scrub_text("plain words only here")
    assert (n_e, n_ip, n_ph) == (0, 0, 0)
    assert red == "plain words only here"


def test_pii_patterns_agree_with_duckdb_re2():
    """The Python `re` counts must equal DuckDB's RE2 counts for the same
    pattern strings — the oracle contract."""
    samples = [
        "x user7@example.org 10.1.2.3 call 555-0042",
        "a@b.cc c@d.ee 1.2.3.4 5.6.7.8 555-9999 555-123",
        "no pii at all",
        "dotted.name_9@sub.domain.example.com edge 999.999.999.999",
        "13-gram 555-1234x not a boundary",  # x kills the trailing \b
    ]
    con = duckdb.connect()
    for s in samples:
        n_e, n_ip, n_ph, red = hygiene.scrub_text(s)
        row = con.execute(
            "SELECT len(regexp_extract_all(?, ?)), "
            "regexp_replace(?, ?, '<EMAIL>', 'g')",
            [s, hygiene.PII_EMAIL, s, hygiene.PII_EMAIL],
        ).fetchone()
        assert row[0] == n_e, s
        n_ip_sql = con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [row[1], hygiene.PII_IPV4]
        ).fetchone()[0]
        assert n_ip_sql == n_ip, s


def test_pii_scrub_pipeline(tmp_path, ray_session):
    sf = _write_docs(
        tmp_path,
        {"doc_id": [0, 1, 2, 3], "text": ["w x", "y", "z z z", "q"]},
    )
    out = _as_pandas(hygiene.pii_scrub(sf))
    assert list(out["doc_id"]) == [0, 1, 2, 3]
    # every doc gets the planted contact line: 1 email (+1 for %3==0), 1 ip, 1 phone
    assert list(out["n_emails"]) == [2, 1, 1, 2]
    assert list(out["n_ipv4"]) == [1, 1, 1, 1]
    assert list(out["n_phones"]) == [1, 1, 1, 1]
    # the redaction hash is over the full enriched text: recompute one row
    import hashlib

    t = hygiene.pii_enrich(1, "y")
    assert out.loc[1, "redacted_md5"] == hashlib.md5(
        hygiene.scrub_text(t)[3].encode()
    ).hexdigest()


# ---------------------------------------------------------------------------
# Decontamination
# ---------------------------------------------------------------------------


def test_doc_shingles_short_doc_is_whole_text():
    assert hygiene._doc_shingles("a b c", 8) == {"a b c"}
    assert hygiene._doc_shingles("a b c d e f g h i", 8) == {
        "a b c d e f g h",
        "b c d e f g h i",
    }


def test_decontaminate_planted(tmp_path, ray_session):
    eight = "q w e r t y u i"
    rows = {
        "doc_id": [0, 20, 1, 2, 3],
        "text": [
            f"{eight} o p",          # eval doc (0 % 20 == 0)
            "other eval doc words",   # eval doc
            f"pad {eight} tail",      # train: shares the 8-gram -> hit
            "completely different words here today",  # train: clean
            f"{eight} o",             # train: shares 2 shingles of doc 0
        ],
    }
    sf = _write_docs(tmp_path, rows)
    out = _as_pandas(hygiene.decontaminate(sf))
    got = dict(zip(out["doc_id"], out["n_hit"]))
    assert got == {1: 1, 3: 2}


def test_decontaminate_matches_sql_at_sf0001(ray_session):
    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    mine = _as_pandas(hygiene.decontaminate(sf)).reset_index(drop=True)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    oracle = con.sql(entry.oracle_sql()["decontaminate"]).df()
    pd.testing.assert_frame_equal(
        mine.astype("int64"), oracle.astype("int64")
    )


# ---------------------------------------------------------------------------
# N-gram census
# ---------------------------------------------------------------------------


def test_ngram_topk_counts(tmp_path, ray_session):
    rows = {
        "doc_id": [0, 1, 2],
        "text": ["a b c a b c", "a b c", "x y"],
    }
    sf = _write_docs(tmp_path, rows)
    out = hygiene.ngram_topk(sf, n=3, k=10)
    got = dict(zip(out["gram"], out["n"]))
    # "a b c" x3 (2 in doc0, 1 in doc1); doc2 too short for a trigram
    assert got == {"a b c": 3, "b c a": 1, "c a b": 1}
    # ordering: count desc then gram asc
    assert list(out["gram"])[0] == "a b c"


def test_ngram_topk_ties_break_lexically(tmp_path, ray_session):
    rows = {"doc_id": [0], "text": ["z z z y y y"]}
    sf = _write_docs(tmp_path, rows)
    out = hygiene.ngram_topk(sf, n=3, k=2)
    # all four trigrams occur once; lexical order picks the first two
    assert list(out["gram"]) == ["y y y", "z y y"]


# ---------------------------------------------------------------------------
# Length quantiles
# ---------------------------------------------------------------------------


def test_quantiles_match_duckdb_disc(tmp_path, ray_session):
    """The histogram-walk rank rule must equal quantile_disc for awkward
    shapes: duplicates, tiny groups, skew."""
    rng = np.random.default_rng(7)
    texts, langs = [], []
    for lang, sizes in [
        ("aa", [3] * 7),                       # all-equal values
        ("bb", [1, 2, 3, 4]),                  # tiny group
        ("cc", list(rng.integers(1, 40, 97))),  # skewed
        ("dd", [5]),                           # singleton
    ]:
        for s in sizes:
            texts.append("x" * int(s))
            langs.append(lang)
    sf = _write_docs(
        tmp_path, {"doc_id": range(len(texts)), "text": texts, "lang": langs}
    )
    out = hygiene.doc_length_quantiles(sf)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    oracle = con.sql(
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(MIN(n_chars) AS BIGINT) AS min_chars, "
        "CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS q25, "
        "CAST(quantile_disc(n_chars, 0.50) AS BIGINT) AS q50, "
        "CAST(quantile_disc(n_chars, 0.75) AS BIGINT) AS q75, "
        "CAST(quantile_disc(n_chars, 0.95) AS BIGINT) AS q95, "
        "CAST(MAX(n_chars) AS BIGINT) AS max_chars "
        "FROM documents GROUP BY 1 ORDER BY 1"
    ).df()
    pd.testing.assert_frame_equal(out, oracle)

def test_mod_zero_filter_is_public_api_and_prunes():
    """VERDICT r4 item 3: the decontaminate pushdown must be built from
    PUBLIC pyarrow expression operators (no Expression._call) and must
    actually prune the scan to the eval rows."""
    import inspect

    import pyarrow.dataset as pads

    src = inspect.getsource(hygiene._mod_zero_filter)
    assert "_call" not in src, "private pyarrow API crept back in"

    expr = hygiene._mod_zero_filter("doc_id", 20)
    assert expr is not None
    scan = pads.dataset("/root/testdata/sf0.001/documents.parquet")
    pruned = scan.to_table(columns=["doc_id"], filter=expr)
    assert pruned.num_rows == 25  # 500 docs, doc_id % 20 == 0
    assert scan.count_rows() == 500


def test_decontaminate_correct_without_pushdown(tmp_path, ray_session, monkeypatch):
    """The post-scan mod predicate keeps decontaminate exact when the
    pushdown expression is unavailable (future-pyarrow fallback path)."""
    monkeypatch.setattr(hygiene, "_mod_zero_filter", lambda col, mod: None)
    eight = "q w e r t y u i"
    rows = {
        "doc_id": [0, 20, 1, 2, 3],
        "text": [
            f"{eight} o p",
            "other eval doc words",
            f"pad {eight} tail",
            "completely different words here today",
            f"{eight} o",
        ],
    }
    sf = _write_docs(tmp_path, rows)
    out = _as_pandas(hygiene.decontaminate(sf))
    got = dict(zip(out["doc_id"], out["n_hit"]))
    assert got == {1: 1, 3: 2}


@pytest.mark.usefixtures("ray_session")
def test_documents_operators_tolerate_null_text(tmp_path):
    """A NULL text row must not crash any documents-table operator — each
    follows its SQL oracle's NULL rule (SUM skips, unnest(NULL) is no rows,
    NULL || x propagates)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from html_parser_ray.pipelines.hygiene import pii_scrub
    from html_parser_ray.pipelines.text_analysis import (
        doc_fingerprints,
        doc_token_stats,
    )

    d = tmp_path / "sfnulltext"
    d.mkdir()
    many = " ".join(["tok"] * 50)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array([many, None, "short text"]),
                "lang": pa.array(["en", "en", "de"]),
                "source": pa.array(["s", "s", "s"]),
                "n_chars": pa.array([len(many), 0, 10], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    stats = doc_token_stats(str(d))
    # NULL contributes 0 tokens/0 chars but still counts as a doc (SQL SUM/COUNT)
    en = stats.set_index("lang").loc["en"]
    assert en["n_docs"] == 2 and en["sum_tokens"] == 50

    fp = doc_fingerprints(str(d))
    fp = fp if isinstance(fp, pd.DataFrame) else fp.to_pandas()
    assert len(fp) == 3  # NULL doc fingerprints as "" rather than crashing

    scrub = pii_scrub(str(d))
    scrub = scrub if isinstance(scrub, pd.DataFrame) else scrub.to_pandas()
    row = scrub.set_index("doc_id").loc[2]
    assert pd.isna(row["redacted_md5"])  # SQL: NULL || '...' propagates
    assert pd.isna(row["n_emails"])
    assert scrub.set_index("doc_id").loc[1, "n_emails"] >= 1
