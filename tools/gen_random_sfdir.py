"""Seeded adversarial testdata generator for the randomized differential.

Synthesizes the ten contract tables (same schemas/dtypes as
/root/testdata/sf*) with value profiles the fixed testdata never
exercises, so `tools/random_differential.py` can sweep the whole oracle
contract (Ray side vs DuckDB side) over many seeds:

- heavy TIES everywhere (prices, balances, values drawn from small dyadic
  pools) — stresses every deterministic-tiebreak claim;
- all doubles are dyadic multiples of 0.25 so float SUMS are exact in any
  accumulation order (no false positives from ulp drift between Ray's
  partial-aggregation order and DuckDB's);
- duplicate (user_id, ts) event pairs and gaps exactly at common session /
  window thresholds (30 min, 1 h) — stresses > vs >= boundary semantics;
- customers with zero orders, users with a single event, nations with no
  suppliers — stresses zero-bucket / empty-group handling (Q13 etc.);
- hot keys (one user owns ~25% of events; one part in many lineitems);
- document text with empty strings, whitespace-only, unicode (CJK,
  accents, emoji, astral), and markup bait (<, &, entities) flowing into
  the HTML synthesis paths;
- negative and zero balances / values / prices;
- file row order shuffled (never key-sorted).

Deterministic from --seed. Usage:
    python tools/gen_random_sfdir.py --seed 7 --out /tmp/rdiff/seed7
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64  # embedding dim, matches testdata

EVENT_TYPES = ["error", "signup", "purchase", "view", "click"]
LANGS = ["es", "zh", "de", "fr", "en"]
SEGMENTS = ["FURNITURE", "MACHINERY", "BUILDING", "HOUSEHOLD", "AUTOMOBILE"]
STATUSES = ["F", "P", "O"]
PRIORITIES = ["3-MEDIUM", "4-NOT SPECIFIED", "5-LOW", "2-HIGH", "1-URGENT"]
PTYPES = ["ECONOMY", "PROMO", "LARGE", "MEDIUM", "STANDARD", "SMALL"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
FLAGS = ["N", "A", "R"]
LINESTATUS = ["O", "F"]

VOCAB = (
    "the fast key order sort table scan merge part window small hash join "
    "batch stream spark dup shard block actor arrow ray data".split()
)
UNICODE_WORDS = ["café", "漢字", "naïve", "\U0001f600", "Über", "ещё"]
MARKUP_BAIT = ["<b>", "&amp;", "a<b", "&#65;", "</div>", "&nbsp;", "x&y"]
# embedded newlines/CRLF/tabs/form-feeds INSIDE a document's text: stresses
# CSV quoting, JSONL string escaping, WARC content-length framing, and the
# whitespace-normalization side of the roundtrip oracle, through every
# source format
WS_BAIT = ["a\nb", "line1\r\nline2", "tab\tsep", "x\fy", "多\n行"]


def dyadic(rng: np.random.Generator, n: int, lo: float, hi: float, pool: int = 40):
    """Doubles that are multiples of 0.25 drawn from a small tied pool."""
    qlo, qhi = int(lo * 4), int(hi * 4)
    choices = rng.integers(qlo, qhi + 1, size=min(pool, qhi - qlo + 1))
    return rng.choice(choices, size=n).astype(np.float64) / 4.0


def us_ts(days: np.ndarray, micros: np.ndarray) -> pa.Array:
    base = np.datetime64("2024-01-01T00:00:00", "us")
    return pa.array(
        base + days.astype("timedelta64[D]").astype("timedelta64[us]")
        + micros.astype("timedelta64[us]"),
        type=pa.timestamp("us"),
    )


def shuffle_table(rng: np.random.Generator, t: pa.Table) -> pa.Table:
    return t.take(pa.array(rng.permutation(t.num_rows).astype(np.int64)))


def make_words(rng: np.random.Generator, n_words: int, spice: bool) -> str:
    words = list(rng.choice(VOCAB, size=n_words))
    if spice and n_words:
        k = int(rng.integers(0, 3))
        for _ in range(k):
            r = rng.random()
            pool = (
                UNICODE_WORDS
                if r < 0.4
                else MARKUP_BAIT
                if r < 0.8
                else WS_BAIT
            )
            words[int(rng.integers(0, len(words)))] = pool[
                int(rng.integers(0, len(pool)))
            ]
    return " ".join(words)


def generate(seed: int, out_dir: str, scale: float = 0.5, shards: int = 0) -> None:
    """``shards > 0`` writes each table as a DIRECTORY named
    ``{name}.parquet/`` holding ``part-{i}.parquet`` shard files (contiguous
    row slices of the shuffled order) — the layout a multi-node writer
    produces at 100 TB. The contract path ``{sf_dir}/{t}.parquet`` is
    unchanged; readers must treat it as file-or-directory."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    def write(name: str, t: pa.Table) -> None:
        t = shuffle_table(rng, t)
        path = f"{out_dir}/{name}.parquet"
        if shards <= 1:
            pq.write_table(t, path)
            return
        os.makedirs(path, exist_ok=True)
        per = -(-t.num_rows // shards)
        for i in range(shards):
            piece = t.slice(i * per, per)
            # every shard file exists even when empty: empty-shard handling
            # is part of what this layout stresses
            pq.write_table(piece, f"{path}/part-{i:03d}.parquet")

    # region / nation ---------------------------------------------------
    write(
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), type=pa.int32()),
                "r_name": REGIONS,
            }
        ),
    )
    n_nation = 25
    write(
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(n_nation), type=pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(n_nation)],
                "n_regionkey": pa.array(
                    rng.integers(0, 5, n_nation), type=pa.int32()
                ),
            }
        ),
    )

    # customer ----------------------------------------------------------
    n_cust = max(20, int(150 * scale))
    write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), type=pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                # some nations get NO customers (empty groups)
                "c_nationkey": pa.array(
                    rng.integers(0, max(2, n_nation - 5), n_cust),
                    type=pa.int32(),
                ),
                "c_acctbal": dyadic(rng, n_cust, -999.75, 9999.75),
                "c_mktsegment": list(rng.choice(SEGMENTS, n_cust)),
            }
        ),
    )

    # supplier ----------------------------------------------------------
    n_supp = max(6, int(10 * scale))
    write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(range(n_supp), type=pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(
                    rng.integers(0, n_nation, n_supp), type=pa.int32()
                ),
                "s_acctbal": dyadic(rng, n_supp, -500.0, 5000.0),
            }
        ),
    )

    # part ---------------------------------------------------------------
    n_part = max(20, int(200 * scale))
    write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(range(n_part), type=pa.int64()),
                "p_name": [make_words(rng, 3, spice=False) for _ in range(n_part)],
                "p_brand": [
                    f"Brand#{int(b)}" for b in rng.integers(1, 26, n_part)
                ],
                "p_type": list(rng.choice(PTYPES, n_part)),
                "p_size": pa.array(rng.integers(1, 51, n_part), type=pa.int32()),
                # heavy exact ties stress top-k tie-breaks
                "p_retailprice": dyadic(rng, n_part, 100.0, 2000.0, pool=12),
            }
        ),
    )

    # orders -------------------------------------------------------------
    n_ord = max(60, int(1500 * scale))
    # ~20% of customers get no orders at all (Q13 zero-bucket); one hot
    # customer owns ~10% of orders
    active = rng.permutation(n_cust)[: max(1, int(n_cust * 0.8))]
    hot_cust = int(active[0])
    custkeys = rng.choice(active, size=n_ord)
    custkeys[: n_ord // 10] = hot_cust
    odays = rng.integers(0, 2400, n_ord)
    write(
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(range(n_ord), type=pa.int64()),
                "o_custkey": pa.array(custkeys, type=pa.int64()),
                "o_orderstatus": list(rng.choice(STATUSES, n_ord)),
                "o_totalprice": dyadic(rng, n_ord, 900.0, 300000.0, pool=60),
                "o_orderdate": us_ts(
                    odays + np.datetime64("1995-01-01").astype(int)
                    - np.datetime64("2024-01-01").astype(int),
                    np.zeros(n_ord, dtype=np.int64),
                ),
                "o_orderpriority": list(rng.choice(PRIORITIES, n_ord)),
            }
        ),
    )

    # lineitem ------------------------------------------------------------
    n_li = max(200, int(6000 * scale))
    okeys = rng.integers(0, n_ord, n_li)
    partkeys = rng.integers(0, n_part, n_li)
    partkeys[: n_li // 8] = int(rng.integers(0, n_part))  # hot part
    # shipdate = orderdate of its order + lag in [-5, 200] days: some ship
    # BEFORE the order date (boundary bait for late-ship logic)
    od_by_key = odays[okeys]
    lags = rng.integers(-5, 200, n_li)
    write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(okeys, type=pa.int64()),
                "l_partkey": pa.array(partkeys, type=pa.int64()),
                "l_suppkey": pa.array(
                    rng.integers(0, n_supp, n_li), type=pa.int64()
                ),
                "l_linenumber": pa.array(
                    rng.integers(1, 8, n_li), type=pa.int32()
                ),
                "l_quantity": dyadic(rng, n_li, 1.0, 50.0, pool=10),
                "l_extendedprice": dyadic(rng, n_li, 900.0, 100000.0, pool=50),
                # discounts/taxes multiples of 0.25 would exceed 1; use /4
                # of small ints -> {0, .25, .5} is unrealistic but EXACT;
                # both engines compute identical products
                "l_discount": dyadic(rng, n_li, 0.0, 0.25, pool=2),
                "l_tax": dyadic(rng, n_li, 0.0, 0.25, pool=2),
                "l_returnflag": list(rng.choice(FLAGS, n_li)),
                "l_linestatus": list(rng.choice(LINESTATUS, n_li)),
                "l_shipdate": us_ts(
                    od_by_key + lags
                    + np.datetime64("1995-01-01").astype(int)
                    - np.datetime64("2024-01-01").astype(int),
                    np.zeros(n_li, dtype=np.int64),
                ),
            }
        ),
    )

    # events --------------------------------------------------------------
    n_ev = max(100, int(1000 * scale))
    n_users = 15
    users = rng.integers(0, n_users, n_ev)
    users[: n_ev // 4] = 0  # hot user
    users[-1] = n_users - 1  # lonely single-event user
    days = rng.integers(0, 30, n_ev)
    micros = rng.integers(0, 86_400_000_000, n_ev)
    # boundary bait: round a slice to exact hour starts, and duplicate
    # (user, ts) pairs for another slice
    hr = slice(0, n_ev // 10)
    micros[hr] = (micros[hr] // 3_600_000_000) * 3_600_000_000
    dup = slice(n_ev // 10, n_ev // 10 + n_ev // 20)
    shift = dup.stop - dup.start
    users[dup] = users[dup.start - shift : dup.start]
    days[dup] = days[dup.start - shift : dup.start]
    micros[dup] = micros[dup.start - shift : dup.start]
    # exact-gap bait: pairs separated by exactly 30min / 1h
    gap = slice(dup.stop, dup.stop + n_ev // 20)
    gshift = gap.stop - gap.start
    users[gap] = users[gap.start - gshift : gap.start]
    days[gap] = days[gap.start - gshift : gap.start]
    gaps = rng.choice([1_800_000_000, 3_600_000_000], size=gshift)
    micros[gap] = micros[gap.start - gshift : gap.start] + gaps
    carry = micros >= 86_400_000_000
    days[carry] += 1
    micros[carry] -= 86_400_000_000
    etypes = rng.choice(EVENT_TYPES, n_ev)
    vals = dyadic(rng, n_ev, -50.0, 500.0, pool=30)
    props = []
    for i in range(n_ev):
        r = rng.random()
        if r < 0.8:
            props.append('{"k": %d}' % int(rng.integers(0, 100)))
        elif r < 0.9:
            props.append(
                '{"k": %d, "j": %d}'
                % (int(rng.integers(0, 100)), int(rng.integers(0, 10)))
            )
        else:
            props.append("{}")
    write(
        "events",
        pa.table(
            {
                "event_id": pa.array(range(n_ev), type=pa.int64()),
                "ts": us_ts(days, micros),
                "user_id": pa.array(users, type=pa.int64()),
                "event_type": list(etypes),
                "value": vals,
                "props": props,
            }
        ),
    )

    # documents -----------------------------------------------------------
    n_doc = max(60, int(500 * scale))
    texts = []
    for i in range(n_doc):
        r = rng.random()
        if r < 0.02:
            texts.append("")
        elif r < 0.04:
            texts.append("   ")
        else:
            texts.append(make_words(rng, int(rng.integers(3, 120)), spice=True))
    # exact-duplicate docs (dedup bait)
    for _ in range(n_doc // 10):
        a, b = rng.integers(0, n_doc, 2)
        texts[int(a)] = texts[int(b)]
    # sparse, gappy, CLUSTERED ids — web-scale doc ids are never contiguous:
    # ~half sit in a dense low cluster (random gaps), a quarter far away near
    # 2^40 (stresses value-range partitioning skew in the prefix-sum /
    # drill-down paths, and min/max-from-statistics reads), and the top
    # quarter near 2^62 — ABOVE the float64-exact ceiling (2^53), so any
    # exchange that lets an id touch float64 (NaN-fill upcast, map-with-
    # missing) corrupts it and diverges from the oracle — with the top
    # EIGHTH pushed further, near the int64 ceiling 2^63-1 (64-bit hash
    # keys occupy the full signed-positive range at web scale; overflow in
    # range-partition width/offset arithmetic only shows there). Strictly
    # increasing keeps them unique; nonnegative keeps % semantics identical
    # between numpy and SQL (C-style vs floored mod differ on negatives —
    # negative keys are out of contract, committed testdata is nonnegative).
    gaps = rng.integers(1, 7, n_doc).astype(np.int64).cumsum()
    doc_ids = gaps.copy()
    doc_ids[n_doc // 2 :] += np.int64(1) << 40
    doc_ids[(3 * n_doc) // 4 :] += np.int64(1) << 62
    # lands in [2^63 - 2^41, 2^63 - 2^41 + 2^62-ish... ] — max id is
    # 2^62 + (2^62 - 2^41) + 6*n_doc < 2^63 - 1: no generator-side overflow
    doc_ids[(7 * n_doc) // 8 :] += (np.int64(1) << 62) - (np.int64(1) << 41)
    write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "text": texts,
                "lang": list(rng.choice(LANGS, n_doc)),
                "source": [f"src{int(s)}" for s in rng.integers(0, 20, n_doc)],
                "n_chars": pa.array(
                    [len(t) for t in texts], type=pa.int64()
                ),
            }
        ),
    )

    # embeddings ----------------------------------------------------------
    n_emb = max(60, int(500 * scale))
    centers = rng.normal(0, 1, size=(10, DIM))
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + rng.normal(0, 0.3, size=(n_emb, DIM))
    # duplicate vectors (tie bait for kNN ordering)
    for _ in range(n_emb // 10):
        a, b = rng.integers(0, n_emb, 2)
        vecs[int(a)] = vecs[int(b)]
    write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(range(n_emb), type=pa.int64()),
                "embedding": pa.array(
                    [v.astype(np.float32) for v in vecs],
                    type=pa.list_(pa.float32()),
                ),
                "label": pa.array(labels, type=pa.int32()),
            }
        ),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--scale", type=float, default=0.5)
    ap.add_argument("--shards", type=int, default=0)
    args = ap.parse_args()
    generate(args.seed, args.out, args.scale, shards=args.shards)
    print(
        f"wrote seed={args.seed} scale={args.scale} shards={args.shards} "
        f"-> {args.out}"
    )


if __name__ == "__main__":
    main()
