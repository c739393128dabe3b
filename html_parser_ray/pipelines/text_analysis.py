"""Text-analysis pipelines over the ``documents`` table (and the HTML engine
roundtrip queries that pin the parser against a SQL oracle)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

from html_parser_ray.pipelines.shuffle import read_table, sort_output
from html_parser_ray.extract.boilerplate import extract_text_blocks
from html_parser_ray.functions import textfns
from html_parser_ray.html.document import parse_html




def _actor_slots(cap: int = 4) -> int:
    """Actor-pool size that always leaves CPUs for the read stage (an actor
    pool equal to the whole cluster deadlocks the streaming executor)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 0)) if ray.is_initialized() else 0
    except Exception:
        cpus = 0
    return max(1, min(cap, cpus - 2 if cpus > 2 else 1))


def doc_token_stats(sf_dir: str) -> pd.DataFrame:
    """Per-language token/char totals (single-space token definition so the
    SQL oracle is exact: ``len(string_split(text, ' '))``)."""
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["text", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].tolist()
        out = pd.DataFrame(
            {
                "lang": df["lang"],
                "n_docs": 1,
                # '' splits to [''] = 1 token in BOTH python and duckdb's
                # string_split — no falsy-guard (it would diverge on '')
                "sum_tokens": [
                    textfns.sql_token_count(t) for t in texts
                ],
                # SQL SUM skips NULL -> contributing 0 is value-identical
                "sum_chars": [len(t) if t is not None else 0 for t in texts],
            }
        )
        return out.groupby("lang", as_index=False).sum()

    df = ds.map_batches(partial, batch_format="pandas").to_pandas()
    result = df.groupby("lang", as_index=False).sum()
    return result.sort_values("lang").reset_index(drop=True)


def doc_quality(sf_dir: str) -> "ray.data.Dataset":
    """Per-document quality counters (integer features, SQL-mirrorable)."""
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    _EMPTY = pd.DataFrame(
        {
            "doc_id": pd.Series(dtype="int64"),
            "n_tokens": pd.Series(dtype="int64"),
            "n_stopwords": pd.Series(dtype="int64"),
            "sum_token_len": pd.Series(dtype="int64"),
        }
    )

    def feats(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:  # typed empty, not a 0-column frame
            return _EMPTY
        rows = []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            # '' -> [''] (1 token) matches string_split; None -> no tokens
            toks = text.split(" ") if text is not None else []
            rows.append(
                {
                    "doc_id": doc_id,
                    "n_tokens": len(toks),
                    "n_stopwords": sum(
                        1 for t in toks if t.lower() in textfns.STOPWORDS
                    ),
                    "sum_token_len": sum(len(t) for t in toks),
                }
            )
        return pd.DataFrame(rows)

    # stays a Dataset end-to-end (sorted for the oracle compare); rows reach
    # the driver only at the test-harness boundary
    return ds.map_batches(feats, batch_format="pandas").sort("doc_id")


def langid_counts(sf_dir: str) -> pd.DataFrame:
    """Predicted-language distribution (heuristic language ID — no SQL oracle,
    the classifier is ours)."""
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["text"])

    def predict(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"predicted_lang": [textfns.detect_language(t) for t in df["text"]], "n": 1}
        )
        return out.groupby("predicted_lang", as_index=False).sum()

    df = ds.map_batches(predict, batch_format="pandas").to_pandas()
    result = df.groupby("predicted_lang", as_index=False).sum()
    return result.sort_values("predicted_lang").reset_index(drop=True)


def doc_fingerprints(sf_dir: str) -> "ray.data.Dataset":
    """Per-document rolling-hash fingerprint + BPE-ish token count (ours —
    rows-only check)."""
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:  # typed empty (empty lists infer null-typed cols)
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "fingerprint": pd.Series(dtype="object"),
                    "bpe_tokens": pd.Series(dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                # None -> "" (documented: a NULL doc fingerprints as empty
                # rather than crashing the whole pass)
                "fingerprint": [
                    format(textfns.fingerprint64(t if t is not None else ""), "016x")
                    for t in df["text"]
                ],
                "bpe_tokens": [
                    textfns.bpe_token_count(t if t is not None else "")
                    for t in df["text"]
                ],
            }
        )

    return ds.map_batches(fp, batch_format="pandas").sort("doc_id")


# ---- HTML-engine roundtrip queries (SQL-oracle-checked parser proofs) -----

# PRECONDITION: the interpolated text is plain prose (the driver's synthetic
# documents table — no '<', '&' or markup). The roundtrip oracle is the
# ORIGINAL text, so markup-bearing text would be parsed as markup and break
# equality by design; a corpus with metacharacters needs html-escaping here
# plus the entity-decode path (which the parser tests pin separately).

_PAGE_TEMPLATE = (
    "<html><head><title>doc</title><script>var x = 1 < 2;</script></head><body>"
    "<header><nav><a href='/'>home</a><a href='/about'>about</a></nav></header>"
    "<main><article><p>{text}</p></article></main>"
    "<aside class='sidebar'><p>sidebar junk</p></aside>"
    "<footer><p>footer junk</p></footer></body></html>"
)


def _escape_text(t: str) -> str:
    """HTML-escape a document's text for synthesis into a page body.

    The roundtrip contract (extract(synthesize(text)) == text) only holds
    for arbitrary text if markup metacharacters are escaped on the way IN —
    the extraction side's entity decode undoes it on the way OUT. Without
    this, text containing ``<`` or ``&`` (ubiquitous at web scale) is
    parsed as markup and silently mangled; found by the randomized
    differential (tools/random_differential.py, seed 0)."""
    return t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _page_html(text: str) -> str:
    """THE one page-synthesis policy every roundtrip source (parquet, WARC,
    JSONL, CSV) shares — escaping included, so a policy change cannot drift
    per source."""
    return _PAGE_TEMPLATE.format(text=_escape_text(text))


def _extract_main_text(page: bytes) -> str:
    """parse -> boilerplate-strip -> joined main text: THE one extraction
    decode policy every roundtrip source (parquet, WARC, JSONL) shares, so
    a policy change cannot drift per source."""
    return b" ".join(extract_text_blocks(parse_html(page))).decode(
        "utf-8", "replace"
    )


def _corpus_cache_key(src_path: str) -> str:
    """Content fingerprint for /tmp shard caches: abs path + parquet footer
    row count + size + mtime — metadata only on the warm path. A regenerated
    corpus at the same path must not silently reuse a stale shard. Accepts a
    single file OR a directory of shard files (the 100 TB input shape): the
    fingerprint then covers every child's size+mtime, name-sorted."""
    import glob as _glob
    import hashlib as _hashlib
    import os

    import pyarrow.parquet as _pq

    paths = (
        sorted(_glob.glob(os.path.join(src_path, "*.parquet")))
        if os.path.isdir(src_path)
        else [src_path]
    )
    n_rows = sum(_pq.ParquetFile(p).metadata.num_rows for p in paths)
    sig = ";".join(
        f"{p}:{os.stat(p).st_size}:{os.stat(p).st_mtime_ns}" for p in paths
    )
    return _hashlib.md5(
        f"{os.path.abspath(src_path)}:{n_rows}:{sig}".encode()
    ).hexdigest()[:12]


class HtmlRoundtripExtract:
    """Actor stage: build a boilerplate page around each document's text, run
    the full tokenizer + DOM + boilerplate-strip, return the main text.

    The SQL oracle is simply the original text — any tokenizer, selector,
    entity or normalization bug breaks the value-hash equality.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out = []
        for t in texts:
            out.append(_extract_main_text(_page_html(t).encode("utf-8")))
        return pa.table(
            {"doc_id": batch.column("doc_id"), "main_text": pa.array(out)}
        )


def html_roundtrip_extract(sf_dir: str) -> "ray.data.Dataset":
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(
        HtmlRoundtripExtract, batch_format="pyarrow", concurrency=_actor_slots()
    )
    # actor pools complete blocks out of order under load — pin the oracle's
    # ORDER BY deterministically
    return sort_output(
        out, ["doc_id"],
        pa.schema([("doc_id", pa.int64()), ("main_text", pa.string())]),
    )


class HtmlLiCount:
    """Actor stage: synthesize a list page per row (#items = doc_id % 7 + 1),
    parse it and count ``ul > li`` matches with the selector engine."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        counts = []
        for d in doc_ids:
            n = int(d) % 7 + 1
            html = "<ul>" + "".join(f"<li>item {k}</li>" for k in range(n)) + "</ul>"
            doc = parse_html(html)
            counts.append(len(doc.query_all("ul > li")))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "li_count": pa.array(counts, type=pa.int64()),
            }
        )


def html_li_count(sf_dir: str) -> "ray.data.Dataset":
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    out = ds.map_batches(
        HtmlLiCount, batch_format="pyarrow", concurrency=_actor_slots()
    )
    return sort_output(
        out, ["doc_id"],
        pa.schema([("doc_id", pa.int64()), ("li_count", pa.int64())]),
    )


def quality_filter(sf_dir: str, min_tokens: int = 40) -> "ray.data.Dataset":
    """Quality-threshold filtering (the Dataset.filter surface): keep docs
    with at least ``min_tokens`` single-space tokens."""
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        toks = [textfns.sql_token_count(t) for t in texts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(toks, type=pa.int64()),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow")
    import pyarrow.compute as pc

    kept = scored.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("n_tokens"), min_tokens)),
        batch_format="pyarrow",
    )
    return sort_output(
        kept, ["doc_id"],
        pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64())]),
    )


_LINK_TEMPLATE = (
    "<html><body><main><article><p>{text}</p>"
    "<p>see <a href='/ref/{doc_id}' class='internal'>here</a> and "
    "<a href='https://ex.com/{doc_id}' class='external'>there</a></p>"
    "</article></main></body></html>"
)


class HtmlLinkExtract:
    """Actor stage: synthesize a page with two known links per doc, parse it
    and pull hrefs with the selector engine + attribute decoder
    (``a[href]`` matches, class-filtered)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from html_parser_ray.html.document import parse_html as _parse

        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        internal = []
        external = []
        for d, t in zip(doc_ids, texts):
            page = _LINK_TEMPLATE.format(text=_escape_text(t), doc_id=d)
            doc = _parse(page)
            ints = [
                (doc.get_attr(i, b"href") or b"").decode()
                for i in doc.query_all("a.internal[href]")
            ]
            exts = [
                (doc.get_attr(i, b"href") or b"").decode()
                for i in doc.query_all("a[href^=https]")
            ]
            internal.append(ints[0] if ints else "")
            external.append(exts[0] if exts else "")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "internal_href": pa.array(internal),
                "external_href": pa.array(external),
            }
        )


def html_link_extract(sf_dir: str) -> "ray.data.Dataset":
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(
        HtmlLinkExtract, batch_format="pyarrow", concurrency=_actor_slots()
    )
    return sort_output(
        out, ["doc_id"],
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("internal_href", pa.string()),
                ("external_href", pa.string()),
            ]
        ),
    )


def doc_repetition_stats(sf_dir: str) -> "ray.data.Dataset | pd.DataFrame":
    """Gopher-style repetition scores per document: word count, distinct-word
    count, most-frequent-word count, most-frequent-bigram count, and the
    corresponding ppm fractions (exact integer division — no float compare).

    Map-only (zero shuffles): each batch flattens its docs' words once, two
    pandas groupbys (unigram, bigram) produce the per-doc maxima, and every
    row leaves as a finished result. High repetition fractions are the
    classic crawl-quality reject signal (boilerplate, keyword stuffing); the
    thresholds belong to the caller, this operator just scores.
    """
    import numpy as np

    from html_parser_ray.pipelines.dedup import _flatten_words

    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def feats(df: pd.DataFrame) -> pd.DataFrame:
        cols = [
            "doc_id", "n_words", "n_distinct", "top_word", "top_bigram",
            "distinct_ppm", "top_word_ppm", "top_bigram_ppm",
        ]
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
        w, d = _flatten_words(df)
        wc = (
            pd.DataFrame({"doc_id": d.astype("int64"), "w": w})
            .groupby(["doc_id", "w"], as_index=False)
            .size()
        )
        uni = wc.groupby("doc_id").agg(
            n_words=("size", "sum"), n_distinct=("size", "count"),
            top_word=("size", "max"),
        )
        big = w[:-1] + (" " + w[1:]) if len(w) > 1 else np.array([], dtype=object)
        okb = d[:-1] == d[1:]
        bgc = (
            pd.DataFrame({"doc_id": d[:-1][okb].astype("int64"), "b": big[okb]})
            .groupby(["doc_id", "b"], as_index=False)
            .size()
        )
        bg = bgc.groupby("doc_id").agg(
            n_bigrams=("size", "sum"), top_bigram=("size", "max")
        )
        out = uni.join(bg, how="left").fillna(0).astype("int64").reset_index()
        out["distinct_ppm"] = (out["n_distinct"] * 1_000_000) // out["n_words"]
        out["top_word_ppm"] = (out["top_word"] * 1_000_000) // out["n_words"]
        out["top_bigram_ppm"] = (out["top_bigram"] * 1_000_000) // out[
            "n_bigrams"
        ].clip(lower=1)
        return out[cols].astype({c: "int64" for c in cols})

    # per-doc output is corpus-row-sized: stay a Dataset (sort_output pulls
    # driver-side only under its small-result threshold, else sorts
    # distributed) — never an unconditional corpus-sized to_pandas()
    out_schema = pa.schema([(c, pa.int64()) for c in [
        "doc_id", "n_words", "n_distinct", "top_word", "top_bigram",
        "distinct_ppm", "top_word_ppm", "top_bigram_ppm",
    ]])
    return sort_output(
        ds.map_batches(feats, batch_format="pandas"), ["doc_id"], out_schema
    )


def tfidf_top_terms(
    sf_dir: str, top_k: int = 3, num_partitions: int = 16
) -> "ray.data.Dataset | pd.DataFrame":
    """Per-document top-``top_k`` TF-IDF terms with an exact-integer score
    (``score_ppm = tf * 1_000_000 // df``, the rational idf variant — no
    float log, so the SQL oracle compares bit-exact).

    Two co-partitioned exchanges, the canonical TF-IDF dataflow:
    1. map-side per-doc term counts (a doc never spans batches, so tf rows
       are final) -> hash-partition by **term**: df per term is complete
       within its partition, each (doc, term, tf) row leaves annotated with
       its df — the join of tf against df costs no third exchange;
    2. hash-partition by **doc_id**: one vectorized sort + groupby-head per
       partition ranks each doc's terms (score desc, term asc).
    The exchanges carry distinct (doc, term) pairs — the operator's inherent
    output — never raw text. At 100 TB a stopword/df-cap filter between the
    stages would bound the hot-term partitions; deliberately not applied
    here so the oracle stays pure SQL.
    """
    import numpy as np

    from html_parser_ray.pipelines.shuffle import hash_partitioned

    from html_parser_ray.pipelines.dedup import _flatten_words

    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def tf_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "term": pd.Series(dtype="object"),
                    "tf": pd.Series(dtype="int64"),
                }
            )
        w, d = _flatten_words(df)
        out = (
            pd.DataFrame({"doc_id": d.astype("int64"), "term": w})
            .groupby(["doc_id", "term"], as_index=False)
            .size()
            .rename(columns={"size": "tf"})
        )
        return out.astype({"tf": "int64"})

    def annotate_df(g: pd.DataFrame) -> pd.DataFrame:
        # all rows of a term are co-located: df = rows per term (doc_id is
        # unique within a term after the per-doc groupby)
        g = g.copy()
        g["df"] = g.groupby("term")["tf"].transform("size").astype("int64")
        g["score_ppm"] = (g["tf"] * 1_000_000) // g["df"]
        return g

    def rank_per_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["doc_id", "score_ppm", "term"], ascending=[True, False, True],
            kind="mergesort",
        )
        top = g.groupby("doc_id", sort=False).head(top_k).copy()
        top["rank"] = top.groupby("doc_id").cumcount() + 1
        return top[["doc_id", "term", "tf", "df", "score_ppm", "rank"]].astype(
            {"rank": "int64"}
        )

    # out_schema on the FIRST exchange too: its map_groups emits 0-row
    # 0-column blocks for empty sort ranges, and the second exchange's
    # with_part would KeyError on them once block count exceeds partitions
    mid_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("term", pa.string()),
            ("tf", pa.int64()),
            ("df", pa.int64()),
            ("score_ppm", pa.int64()),
        ]
    )
    # materialize between the two chained exchanges: the second exchange's
    # sort sampling re-executes the whole upstream plan otherwise (same
    # measured effect as dedup's _MINHASH_MATERIALIZE, 4.13 -> 3.25s)
    with_df = hash_partitioned(
        ds.map_batches(tf_partial, batch_format="pandas"),
        ["term"],
        annotate_df,
        num_partitions,
        out_schema=mid_schema,
    ).materialize()
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("term", pa.string()),
            ("tf", pa.int64()),
            ("df", pa.int64()),
            ("score_ppm", pa.int64()),
            ("rank", pa.int64()),
        ]
    )
    return sort_output(
        hash_partitioned(with_df, ["doc_id"], rank_per_doc, num_partitions),
        ["doc_id", "rank"],
        out_schema,
    )


def doc_hash_sample(
    sf_dir: str, rate_pct: int = 10
) -> "ray.data.Dataset | pd.DataFrame":
    """Deterministic content-independent sampling: keep a document iff the
    first 8 hex digits of ``md5(doc_id)`` land under ``rate_pct`` of the
    bucket space. The standard reproducible train/eval-split primitive:
    map-only, no RNG state, any worker anywhere picks the same rows, and
    the same doc keeps its fate when the corpus is re-sharded. The bucket
    comes from the shared ``textfns.doc_sample_bucket`` primitive so this
    split and ``curated_corpus``'s sample cut agree bit-for-bit.
    """
    # n_chars is a stored column (== len(text), the generator invariant the
    # oracle shares) — reading it instead of the text column prunes the
    # dominant byte volume from the scan entirely
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        buckets = pd.Series(
            [textfns.doc_sample_bucket(i) for i in df["doc_id"]],
            index=df.index,
            dtype="int64",
        )
        out = df.loc[buckets < rate_pct, ["doc_id"]].copy()
        out["bucket"] = buckets[buckets < rate_pct]
        out["n_chars"] = df.loc[buckets < rate_pct, "n_chars"].astype("int64")
        return out

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("bucket", pa.int64()), ("n_chars", pa.int64())]
    )
    return sort_output(
        ds.map_batches(pick, batch_format="pandas"), ["doc_id"], out_schema
    )


def html_roundtrip_extract_warc(sf_dir: str) -> "ray.data.Dataset":
    """The roundtrip-extract semantics through the **WARC ingestion path**:
    documents are serialized into a per-record-gzipped WARC shard (the
    CommonCrawl form, written once per sf_dir under /tmp, deterministic
    bytes), read back with ``sources.warc.read_warc`` (file-per-task explode,
    exact Content-Length walk), and each payload runs the full tokenizer +
    DOM + boilerplate strip. The SQL oracle is the original text — so the
    WARC writer, the record walk, the gzip-member decode AND the extraction
    stack must all roundtrip exactly.
    """
    import hashlib as _hashlib
    import os

    import pyarrow.parquet as _pq

    from html_parser_ray.sources.warc import read_warc, write_warc

    src = f"{sf_dir}/documents.parquet"
    # cache key carries a CONTENT fingerprint (size + mtime + footer row
    # count — metadata only, no row bytes on the warm path), not just the
    # path — a regenerated corpus at the same path must not silently reuse
    # a stale shard
    key = _corpus_cache_key(src)
    warc_path = f"/tmp/graft_warc_{key}.warc.gz"
    if not os.path.exists(warc_path):
        # cache miss: only now pull the rows to synthesize the shard
        tbl = _pq.read_table(src, columns=["doc_id", "text"])
        recs = (
            (f"https://corpus.test/{d}", _page_html(t).encode())
            for d, t in zip(
                tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
            )
        )
        # unique temp name: two concurrent cold-cache processes must not
        # interleave writes on one inode and publish a corrupt shard
        tmp = f"{warc_path}.{os.getpid()}.part"
        write_warc(tmp, recs, gzip_records=True)
        os.replace(tmp, warc_path)

    ds = read_warc(warc_path)

    def extract_from_warc(batch: pa.Table) -> pa.Table:
        uris = batch.column("uri").to_pylist()
        payloads = batch.column("payload").to_pylist()
        ids, texts = [], []
        for u, p in zip(uris, payloads):
            ids.append(int(u.rsplit("/", 1)[1]))
            texts.append(_extract_main_text(p))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "main_text": pa.array(texts, type=pa.string()),
            }
        )

    out = ds.map_batches(extract_from_warc, batch_format="pyarrow")
    return sort_output(
        out, ["doc_id"],
        pa.schema([("doc_id", pa.int64()), ("main_text", pa.string())]),
    )


def doc_stratified_sample(
    sf_dir: str, per_group: int = 50
) -> "ray.data.Dataset | pd.DataFrame":
    """**Stratified deterministic sampling**: keep up to ``per_group``
    documents per language, chosen by md5(doc_id) order — the balanced-mix
    curation step (cap the dominant language, keep every doc of rare ones).

    Scale shape: per-group-min-N is COMBINER-FRIENDLY (the global N lowest
    hashes of a group are the N lowest of the union of per-batch N-lowest),
    so each batch forwards at most groups x N slim rows and the driver
    combine is groups x N sized — no shuffle of the corpus, no RNG state,
    re-shard-stable. The md5 order also makes the selection independent of
    row order, unlike LIMIT-per-group.
    """
    import hashlib as _hashlib

    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "lang": df["lang"].astype(str),
                "doc_id": df["doc_id"].astype("int64"),
                "h": [
                    _hashlib.md5(str(i).encode()).hexdigest()[:16]
                    for i in df["doc_id"]
                ],
            }
        )
        out = out.sort_values(["lang", "h", "doc_id"])
        return out.groupby("lang", as_index=False, sort=False).head(per_group)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    parts = parts.sort_values(["lang", "h", "doc_id"])
    top = parts.groupby("lang", as_index=False, sort=False).head(per_group)
    return (
        top[["lang", "doc_id"]]
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
        .astype({"doc_id": "int64"})
    )


def term_doc_frequency(
    sf_dir: str, min_df: int = 5, k: int = 100, num_partitions: int = 16
) -> pd.DataFrame:
    """Word-level inverted-index statistics: for each term, the document
    frequency (docs containing it) and total term frequency, keeping terms
    with ``df >= min_df`` and reporting the top ``k`` by (df DESC, term) —
    the index-build / vocabulary-pruning primitive.

    Scale shape: the classic combiner dataflow — each batch collapses its
    docs to per-term (tf, df) partials (df is an exact partial because a
    document never spans batches), ONE exchange by term completes each
    term's counts inside its partition, the df floor + per-partition top-k
    prune there (valid: terms are partition-complete), and the driver merges
    ``partitions x k`` rows.
    """
    from html_parser_ray.pipelines.shuffle import hash_partitioned

    ds = read_table(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized combiner: one explode + two value_counts (C speed) —
        # no Python per-token loop in the hot path
        exploded = df["text"].fillna("").str.split(" ").explode()
        exploded = exploded[exploded != ""]
        if exploded.empty:
            return pd.DataFrame(
                {
                    "term": pd.Series(dtype="object"),
                    "tf": pd.Series(dtype="int64"),
                    "df": pd.Series(dtype="int64"),
                }
            )
        tf = exploded.value_counts()
        # df partial: distinct (doc-row, term) pairs, then count per term
        pairs = exploded.reset_index().drop_duplicates()
        dfreq = pairs[exploded.name or "text"].value_counts()
        return pd.DataFrame(
            {
                "term": tf.index,
                "tf": tf.values.astype("int64"),
                "df": dfreq.reindex(tf.index).values.astype("int64"),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("term", as_index=False).agg(
            tf=("tf", "sum"), df=("df", "sum")
        )
        agg = agg[agg["df"] >= min_df]
        agg = agg.sort_values(["df", "term"], ascending=[False, True]).head(k)
        return agg

    parts = hash_partitioned(
        ds.map_batches(partial, batch_format="pandas"), ["term"], finish, num_partitions
    ).to_pandas()
    final = parts.sort_values(["df", "term"], ascending=[False, True]).head(k)
    return final[["term", "df", "tf"]].astype({"df": "int64", "tf": "int64"}).reset_index(
        drop=True
    )


def html_roundtrip_extract_jsonl(sf_dir: str) -> "ray.data.Dataset":
    """The roundtrip-extract semantics through the **JSONL ingestion path**
    (the third source family beside parquet and WARC): documents are
    serialized to newline-delimited JSON shards (written once per sf_dir
    under /tmp, deterministic bytes), read back with ``ray.data.read_json``
    (Arrow NDJSON reader, file-per-task), and each payload runs the full
    tokenizer + DOM + boilerplate strip. The SQL oracle is the original
    text — writer, JSON escaping, reader AND the extraction stack must
    roundtrip exactly.
    """
    import hashlib as _hashlib
    import json as _json
    import os

    import pyarrow.parquet as _pq

    src = f"{sf_dir}/documents.parquet"
    key = _corpus_cache_key(src)
    shard_dir = f"/tmp/graft_jsonl_{key}"
    marker = os.path.join(shard_dir, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(shard_dir, exist_ok=True)
        tbl = _pq.read_table(src, columns=["doc_id", "text"])  # cache miss only
        ids = tbl.column("doc_id").to_pylist()
        texts = tbl.column("text").to_pylist()
        per_shard = 200  # multiple files -> file-per-task read parallelism
        for s0 in range(0, len(ids), per_shard):
            # pid-unique tmp: concurrent cold-cache writers then each
            # os.replace byte-identical (deterministic) finals — benign
            tmp = os.path.join(
                shard_dir, f"part-{s0 // per_shard:05d}.jsonl.{os.getpid()}.part"
            )
            with open(tmp, "w", encoding="utf-8") as f:
                for d, t in zip(ids[s0 : s0 + per_shard], texts[s0 : s0 + per_shard]):
                    f.write(
                        _json.dumps(
                            {"doc_id": int(d), "html": _page_html(t)},
                            ensure_ascii=False,
                        )
                    )
                    f.write("\n")
            os.replace(tmp, tmp[: -len(f".{os.getpid()}.part")])
        with open(marker, "w") as f:
            f.write("ok")

    import glob as _glob

    ds = ray.data.read_json(sorted(_glob.glob(os.path.join(shard_dir, "*.jsonl"))))

    def extract_from_json(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        pages = batch.column("html").to_pylist()
        texts = []
        for p in pages:
            texts.append(_extract_main_text(p.encode("utf-8")))
        return pa.table(
            {
                "doc_id": pa.array([int(i) for i in ids], type=pa.int64()),
                "main_text": pa.array(texts, type=pa.string()),
            }
        )

    out = ds.map_batches(extract_from_json, batch_format="pyarrow")
    return sort_output(
        out,
        ["doc_id"],
        pa.schema([("doc_id", pa.int64()), ("main_text", pa.string())]),
    )


def doc_pack_assignments(
    sf_dir: str, budget_tokens: int = 4096, num_ranges: int = 16
) -> "ray.data.Dataset | pd.DataFrame":
    """Sequence-packing assignment: give every document the pack it starts
    in when documents are laid out in doc_id order under a fixed per-pack
    token budget — the contiguous-packing step a pretraining pipeline runs
    before tokenization (pack_id = tokens_before // budget).

    This is the **distributed global prefix sum** (scan) primitive, a shape
    none of the other operators needed: no partition key exists (the running
    total spans the WHOLE corpus in doc_id order). Two-phase scan, the
    textbook cluster form:

      1. range-partition by doc_id (uniform ranges from the table's min/max
         — token counts are computed map-side and only slim (doc_id,
         n_tokens) rows move); per-range token totals to the driver
         (num_ranges rows — bounded by construction);
      2. driver prefix-sums the range totals (num_ranges additions) and
         broadcasts the offsets; each range assigns pack_id from its local
         cumsum plus its offset, fully parallel.

    No global sort barrier, no corpus-sized driver pull; the exchange
    carries two ints per document. Token definition matches
    ``doc_token_stats`` (``len(string_split(text, ' '))``) so the DuckDB
    window-function oracle is value-exact.
    """
    from html_parser_ray.pipelines.shuffle import (
        hash_partitioned,
        parquet_column_min_max,
    )

    path = f"{sf_dir}/documents.parquet"

    # min/max from parquet ROW-GROUP STATISTICS (metadata pages only — no
    # row bytes leave storage; ADVICE r4: the previous form materialized the
    # whole doc_id column on the driver). Falls back to a distributed
    # min/max aggregate if any row group lacks stats.
    lo, hi = parquet_column_min_max(path, "doc_id")
    if lo is None:
        from ray.data.aggregate import Max, Min

        agg = read_table(path, columns=["doc_id"]).aggregate(
            Min("doc_id"), Max("doc_id")
        )
        lo, hi = agg["min(doc_id)"], agg["max(doc_id)"]
    # Python-int span/width: ids are 64-bit hash keys at web scale, so hi-lo
    # can approach 2^64 — `(ids-lo) * num_ranges` would overflow int64 into
    # negative range ids (multiply-before-divide). Divide-first by a
    # precomputed ceil width stays monotone in doc_id, and the per-row
    # subtraction itself runs in uint64 wraparound arithmetic (see slim():
    # the distance fits uint64 for any signed spread but NOT int64).
    lo, hi = int(lo), int(hi)
    span = max(1, hi - lo + 1)
    width = min(max(1, (span + num_ranges - 1) // num_ranges), (1 << 63) - 1)

    ds = read_table(path, columns=["doc_id", "text"])

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        ids = df["doc_id"].astype("int64")
        toks = [textfns.sql_token_count(t) for t in df["text"]]
        # uint64 wraparound subtraction: the true distance ids-lo is in
        # [0, span-1] < 2^64 but can exceed int64 when ids and lo sit at
        # opposite ends of the signed 64-bit hash-key domain (lo ~ -2^62,
        # ids ~ +2^62) — int64 `ids - lo` would wrap negative and break
        # range monotonicity. Reinterpreting both sides mod 2^64 makes the
        # subtraction exact for ANY signed spread.
        dist = ids.to_numpy().view(np.uint64) - np.uint64(
            lo & 0xFFFFFFFFFFFFFFFF
        )
        rng = np.minimum(
            dist // np.uint64(width), np.uint64(num_ranges - 1)
        ).astype("int64")
        return pd.DataFrame(
            {"range_id": rng, "doc_id": ids, "n_tokens": pd.Series(toks, dtype="int64")}
        )

    slim_ds = ds.map_batches(slim, batch_format="pandas").materialize()

    # phase 1: per-range totals via the COMBINER pattern — each batch
    # pre-sums to <= num_ranges rows map-side and the driver finishes the
    # sum (bounded by batches x ranges), so the full slim table never pays
    # a shuffle just to produce num_ranges numbers
    def range_total(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("range_id", as_index=False)["n_tokens"].sum()
        return agg.rename(columns={"n_tokens": "total"})

    parts = slim_ds.map_batches(range_total, batch_format="pandas").to_pandas()
    if parts.empty or "range_id" not in parts.columns:
        parts = pd.DataFrame({"range_id": [], "total": []})
    totals = (
        parts.groupby("range_id", as_index=False)["total"]
        .sum()
        .sort_values("range_id")
        .reset_index(drop=True)
    )
    offsets = {}
    acc = 0
    for r, t in zip(totals["range_id"], totals["total"]):
        offsets[int(r)] = acc
        acc += int(t)
    offsets_ref = ray.put(offsets)

    # phase 2: per-range local cumsum + broadcast offset -> pack ids (again
    # grouping inside the partition: ranges only guarantee co-location)
    def assign(g: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        offs = _ray.get(offsets_ref)
        parts = []
        for rid, gr in g.groupby("range_id"):
            gr = gr.sort_values("doc_id")
            before = gr["n_tokens"].cumsum().shift(fill_value=0) + offs[int(rid)]
            parts.append(
                pd.DataFrame(
                    {
                        "doc_id": gr["doc_id"].to_numpy(),
                        "n_tokens": gr["n_tokens"].to_numpy(),
                        "pack_id": (before // budget_tokens)
                        .astype("int64")
                        .to_numpy(),
                    }
                )
            )
        return pd.concat(parts, ignore_index=True)

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("pack_id", pa.int64())]
    )
    out = hash_partitioned(slim_ds, ["range_id"], assign, num_ranges, out_schema=out_schema)
    return sort_output(out, ["doc_id"], out_schema)


def doc_weighted_sample(
    sf_dir: str, k: int = 100
) -> "ray.data.Dataset | pd.DataFrame":
    """**Deterministic weighted sampling** (round 5): the ``k`` documents
    with the smallest ``md5(doc_id) // n_chars`` priority key — weighted
    sampling without replacement where selection odds scale with document
    length (the up-weight-long-documents curation primitive), made
    reproducible by replacing the classic Efraimidis–Spirakis ``u^(1/w)``
    float key with an exact-integer division of a 60-bit id hash
    (``textfns.doc_priority_key``). No RNG state: any worker anywhere
    computes the same key, the same doc keeps its fate across re-shards,
    and the SQL oracle reproduces the arithmetic bit-for-bit.

    Scale shape — distributed top-k, NO sort barrier, NO corpus-sized
    pull: each batch reduces to its local k smallest keys (map-side
    partial), so the driver combine is bounded by blocks x k rows — the
    same block-count-bounded min-k contract as ``similarity.py``'s query
    selection. Reads only (doc_id, n_chars): the text column never leaves
    storage.
    """
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_chars": df["n_chars"].astype("int64"),
            }
        )
        out["pkey"] = [
            textfns.doc_priority_key(i, w)
            for i, w in zip(out["doc_id"], out["n_chars"])
        ]
        return out.nsmallest(k, ["pkey", "doc_id"]).astype({"pkey": "int64"})

    # blocks x k rows — bounded driver combine, never corpus-sized
    cand = ds.map_batches(partial, batch_format="pandas").to_pandas()
    top = cand.nsmallest(k, ["pkey", "doc_id"])
    return (
        top[["doc_id", "n_chars"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "n_chars": "int64"})
    )


def html_roundtrip_extract_csv(sf_dir: str) -> "ray.data.Dataset":
    """The roundtrip-extract semantics through the **CSV ingestion path**
    (the fourth source family beside parquet, WARC and JSONL): documents
    are serialized to RFC-4180 CSV shards (written once per sf_dir under
    /tmp, deterministic bytes, QUOTE_ALL so embedded commas/quotes in
    markup survive), read back with ``ray.data.read_csv`` (Arrow CSV
    reader, file-per-task), and each payload runs the full tokenizer +
    DOM + boilerplate strip. The SQL oracle is the original text — the
    writer's quoting, the Arrow reader's unquoting AND the extraction
    stack must all roundtrip exactly.
    """
    import csv as _csv
    import glob as _glob
    import os

    import pyarrow.parquet as _pq

    src = f"{sf_dir}/documents.parquet"
    key = _corpus_cache_key(src)
    shard_dir = f"/tmp/graft_csv_{key}"
    marker = os.path.join(shard_dir, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(shard_dir, exist_ok=True)
        tbl = _pq.read_table(src, columns=["doc_id", "text"])  # cache miss only
        ids = tbl.column("doc_id").to_pylist()
        texts = tbl.column("text").to_pylist()
        per_shard = 200  # multiple files -> file-per-task read parallelism
        for s0 in range(0, len(ids), per_shard):
            # pid-unique tmp then os.replace of byte-identical finals —
            # concurrent cold-cache writers are benign (same as JSONL)
            tmp = os.path.join(
                shard_dir, f"part-{s0 // per_shard:05d}.csv.{os.getpid()}.part"
            )
            with open(tmp, "w", encoding="utf-8", newline="") as f:
                w = _csv.writer(f, quoting=_csv.QUOTE_ALL, lineterminator="\n")
                w.writerow(["doc_id", "html"])
                for d, t in zip(ids[s0 : s0 + per_shard], texts[s0 : s0 + per_shard]):
                    w.writerow([int(d), _page_html(t)])
            os.replace(tmp, tmp[: -len(f".{os.getpid()}.part")])
        with open(marker, "w") as f:
            f.write("ok")

    from pyarrow import csv as _pacsv

    # newlines_in_values: a quoted payload MAY legally contain newlines
    # (RFC 4180); Arrow's default reader rejects them, so opt in — the
    # shard writer QUOTE_ALLs every field, making this always safe
    ds = ray.data.read_csv(
        sorted(_glob.glob(os.path.join(shard_dir, "*.csv"))),
        parse_options=_pacsv.ParseOptions(newlines_in_values=True),
    )

    def extract_from_csv(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        pages = batch.column("html").to_pylist()
        texts = [_extract_main_text(p.encode("utf-8")) for p in pages]
        return pa.table(
            {
                "doc_id": pa.array([int(i) for i in ids], type=pa.int64()),
                "main_text": pa.array(texts, type=pa.string()),
            }
        )

    out = ds.map_batches(extract_from_csv, batch_format="pyarrow")
    return sort_output(
        out,
        ["doc_id"],
        pa.schema([("doc_id", pa.int64()), ("main_text", pa.string())]),
    )
