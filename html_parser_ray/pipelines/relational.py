"""Relational pipelines over the TPC-H-ish test tables, Ray-Data-first.

Patterns demonstrated (the ones that matter at 100 TB):
- column pruning at the read (``read_parquet(columns=[...])``);
- partial aggregation inside ``map_batches`` before a small global groupby
  (the combiner pattern — the shuffle carries pre-aggregated rows only);
- broadcast hash-join of small dimension tables via ``ray.put`` once + lookup
  inside ``map_batches`` (never a shuffle for the small side);
- hash join (``Dataset.join``) only for the genuinely big-big join;
- integer (cents / basis-point) arithmetic for money so results are
  bit-exact regardless of aggregation order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from html_parser_ray.pipelines.shuffle import read_table


def _sql_cast_int(x: np.ndarray) -> np.ndarray:
    """DuckDB ``CAST(double AS BIGINT)`` semantics: round half to EVEN
    (rint), unlike numpy's truncating ``astype`` and unlike SQL ``round()``
    which is half-away (probed: CAST 0.5->0, 1.5->2, 2.5->2, -1.5->-2;
    round(2.5)=3). Pinned by the randomized differential — seed 0 caught
    the truncation divergence, seed 1 caught the half-away overcorrection."""
    return np.rint(np.asarray(x, dtype=np.float64)).astype(np.int64)


def _cents(x: np.ndarray) -> np.ndarray:
    """Exact integer cents from a 2-decimal double (values never land on .5)."""
    return np.rint(np.asarray(x, dtype=np.float64) * 100).astype(np.int64)


def _nation_name_map(sf_dir: str) -> dict:
    """``n_nationkey -> n_name`` lookup dict — THE broadcast-dimension idiom
    (callers ``ray.put`` it once when batch UDFs need it; a driver-side
    combine can use it directly). One definition so every site probes with
    identical key types: ``.to_numpy()`` keys hash equal to plain ints, and
    the single construction point prevents the per-site drift that caused a
    dtype-probe bug in round 2."""
    nation = pd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    return dict(zip(nation["n_nationkey"].to_numpy(), nation["n_name"].tolist()))


def _final_groupby(partials: "ray.data.Dataset", keys: list[str], sums: list[str]):
    """Global combine of per-batch partial aggregates (tiny shuffle)."""
    import pandas as _pd

    def combine(df: _pd.DataFrame) -> _pd.DataFrame:
        return df.groupby(keys, as_index=False)[sums].sum()

    # partials are small: single-partition pandas combine is exact and cheap
    df = partials.to_pandas()
    return combine(df)


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-style pricing summary over lineitem (groupby + sums)."""
    ds = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "l_linestatus": df["l_linestatus"],
                # match the oracle's CAST(double AS BIGINT): half-to-even
                # rounding, not truncation — identical on the integral
                # quantities TPC-H generates, divergent on fractional ones
                # (found by the randomized differential, seeds 0 and 1)
                "sum_qty": _sql_cast_int(df["l_quantity"].to_numpy(np.float64)),
                "sum_base_cents": _cents(df["l_extendedprice"].to_numpy()),
                "sum_disc_bp": _cents(df["l_extendedprice"].to_numpy())
                * (100 - _cents(df["l_discount"].to_numpy())),
                "count_order": 1,
            }
        )
        return out.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pandas")
    result = _final_groupby(
        partials,
        ["l_returnflag", "l_linestatus"],
        ["sum_qty", "sum_base_cents", "sum_disc_bp", "count_order"],
    )
    return result.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def revenue_by_nation(sf_dir: str, num_partitions: int = 8) -> pd.DataFrame:
    """lineitem ⋈ orders (hash join) ⋈ customer ⋈ nation (broadcast lookups)
    -> revenue basis-point-cents per nation."""
    lineitem = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    # big-big: hash join on the order key
    joined = lineitem.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    # small sides: broadcast once via ray.put, read inside every batch
    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    cust_map_ref = ray.put(
        dict(zip(cust["c_custkey"].to_numpy(), cust["c_nationkey"].to_numpy()))
    )
    nation_map_ref = ray.put(_nation_name_map(sf_dir))

    def enrich_and_partial(df: pd.DataFrame) -> pd.DataFrame:
        cust_map = ray.get(cust_map_ref)
        nation_map = ray.get(nation_map_ref)
        nk = df["o_custkey"].map(cust_map)
        names = nk.map(nation_map)
        out = pd.DataFrame(
            {
                "n_name": names,
                "revenue_bp": _cents(df["l_extendedprice"].to_numpy())
                * (100 - _cents(df["l_discount"].to_numpy())),
                "lines": 1,
            }
        )
        return out.groupby("n_name", as_index=False).sum()

    partials = joined.map_batches(enrich_and_partial, batch_format="pandas")
    result = _final_groupby(partials, ["n_name"], ["revenue_bp", "lines"])
    return result.sort_values("n_name").reset_index(drop=True)


def part_type_stats(sf_dir: str) -> pd.DataFrame:
    ds = read_table(f"{sf_dir}/part.parquet", columns=["p_type", "p_size", "p_retailprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("p_type")
        out = pd.DataFrame(
            {
                "n_parts": g.size(),
                "min_size": g["p_size"].min(),
                "max_size": g["p_size"].max(),
                "sum_price_cents": g["p_retailprice"].apply(
                    lambda s: int(_cents(s.to_numpy()).sum())
                ),
            }
        ).reset_index()
        return out

    partials = ds.map_batches(partial, batch_format="pandas")
    df = partials.to_pandas()
    result = df.groupby("p_type", as_index=False).agg(
        n_parts=("n_parts", "sum"),
        min_size=("min_size", "min"),
        max_size=("max_size", "max"),
        sum_price_cents=("sum_price_cents", "sum"),
    )
    return result.sort_values("p_type").reset_index(drop=True)


def top_parts_by_price(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Global top-k: per-batch top-k then a tiny driver-side final top-k
    (no global sort shuffle)."""
    ds = read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_retailprice"])

    def batch_topk(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "p_partkey": df["p_partkey"],
                "price_cents": _cents(df["p_retailprice"].to_numpy()),
            }
        )
        return out.sort_values(
            ["price_cents", "p_partkey"], ascending=[False, True]
        ).head(k)

    partials = ds.map_batches(batch_topk, batch_format="pandas").to_pandas()
    return (
        partials.sort_values(["price_cents", "p_partkey"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def events_hourly(sf_dir: str) -> pd.DataFrame:
    ds = read_table(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "hour": df["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:00:00"),
                "n_events": 1,
                "sum_value_cents": _cents(df["value"].to_numpy()),
            }
        )
        return out.groupby(["event_type", "hour"], as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pandas")
    result = _final_groupby(
        partials, ["event_type", "hour"], ["n_events", "sum_value_cents"]
    )
    return result.sort_values(["event_type", "hour"]).reset_index(drop=True)


def supplier_balance_by_nation(sf_dir: str) -> pd.DataFrame:
    """Broadcast-join supplier -> nation, grouped account balances."""
    ds = read_table(f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"])
    nmap_ref = ray.put(_nation_name_map(sf_dir))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        nmap = ray.get(nmap_ref)
        out = pd.DataFrame(
            {
                "n_name": df["s_nationkey"].map(nmap),
                "n_suppliers": 1,
                "sum_acctbal_cents": _cents(df["s_acctbal"].to_numpy()),
            }
        )
        return out.groupby("n_name", as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pandas")
    result = _final_groupby(partials, ["n_name"], ["n_suppliers", "sum_acctbal_cents"])
    return result.sort_values("n_name").reset_index(drop=True)


def revenue_by_nation_bucketed(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """Same query as ``revenue_by_nation`` via a portable explicit
    **co-partitioned hash join** (no ``Dataset.join``): both big sides are
    tagged and unioned into one Dataset, hash-partitioned by the join key, and
    joined bucket-by-bucket inside one vectorized pandas pass per bucket
    (build dict from the orders rows, probe with the lineitem rows). Only the
    genuinely small dimension tables (customer, nation) broadcast. This is the
    pattern to reach for when hot keys need salting into sub-buckets — and the
    round-2 replacement for the round-1 variant that broadcast the entire
    orders table (VERDICT.md §wrong item 1).
    """
    from html_parser_ray.pipelines.shuffle import hash_partitioned, read_table

    lineitem = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])

    # small sides: broadcast once via ray.put (dimension tables)
    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    cust_map_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_nationkey"])))
    nation_map_ref = ray.put(_nation_name_map(sf_dir))

    # tag + align both big sides on a common schema, union, co-partition by
    # key. The probe side pre-aggregates per (batch, orderkey) BEFORE the
    # shuffle (combiner pattern): ~4 lineitem rows per order collapse to one,
    # so the exchange carries 1/4 the rows.
    def tag_lineitem(df: pd.DataFrame) -> pd.DataFrame:
        raw = pd.DataFrame(
            {
                "key": df["l_orderkey"].astype("int64"),
                "rev_bp": _cents(df["l_extendedprice"].to_numpy())
                * (100 - _cents(df["l_discount"].to_numpy())),
                "lines": np.int64(1),
            }
        )
        agg = raw.groupby("key", as_index=False).sum()
        agg["custkey"] = np.int64(-1)
        agg["side"] = np.uint8(0)
        return agg

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df["o_orderkey"].astype("int64"),
                "rev_bp": np.int64(0),
                "lines": np.int64(0),
                "custkey": df["o_custkey"].astype("int64"),
                "side": np.uint8(1),
            }
        )

    both = lineitem.map_batches(tag_lineitem, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas")
    )

    def bucket_join_partial(g: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(cust_map_ref)
        nmap = ray.get(nation_map_ref)
        build = g[g["side"] == 1]
        probe = g[g["side"] == 0]
        omap = dict(zip(build["key"], build["custkey"]))
        names = probe["key"].map(omap).map(cmap).map(nmap)
        part = pd.DataFrame(
            {
                "n_name": names,
                "revenue_bp": probe["rev_bp"].to_numpy(),
                "lines": probe["lines"].to_numpy(),
            }
        )
        return part.groupby("n_name", as_index=False).sum()

    partials = hash_partitioned(both, ["key"], bucket_join_partial, num_buckets)
    result = _final_groupby(partials, ["n_name"], ["revenue_bp", "lines"])
    return result.sort_values("n_name").reset_index(drop=True)


PRICE_BAND_EDGES = [0.0, 950.0, 1050.0, 1250.0, 1600.0, 100_000.0]


def part_price_band_stats(sf_dir: str) -> pd.DataFrame:
    """Range (interval) join: parts bucketed into half-open price bands
    ``lo <= p_retailprice < hi`` — the broadcast-interval form.

    Ray Data has no inequality join; the scale shape for a small interval
    table is a *broadcast range lookup*: the sorted band edges ship once per
    task closure (bytes, not a shuffle), each batch does ONE vectorized
    ``np.searchsorted`` over its price column, and only per-band partial
    aggregates leave the map side. A big-big range join would instead
    range-partition both sides on the interval axis; documented here as the
    partitioning assumption this operator relies on.
    """
    edges = np.asarray(PRICE_BAND_EDGES, dtype=np.float64)
    ds = read_table(f"{sf_dir}/part.parquet", columns=["p_retailprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        price = df["p_retailprice"].to_numpy(dtype=np.float64)
        band = np.searchsorted(edges, price, side="right") - 1
        ok = (band >= 0) & (band < len(edges) - 1)
        out = pd.DataFrame(
            {
                "band_id": band[ok].astype(np.int64),
                "n_parts": np.int64(1),
                "sum_price_cents": _cents(price[ok]),
            }
        )
        return out.groupby("band_id", as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pandas")
    result = _final_groupby(partials, ["band_id"], ["n_parts", "sum_price_cents"])
    result["lo"] = edges[result["band_id"].to_numpy()]
    result["hi"] = edges[result["band_id"].to_numpy() + 1]
    return (
        result[["band_id", "lo", "hi", "n_parts", "sum_price_cents"]]
        .astype({"band_id": "int64", "n_parts": "int64", "sum_price_cents": "int64"})
        .sort_values("band_id")
        .reset_index(drop=True)
    )


def events_props_key_stats(sf_dir: str) -> pd.DataFrame:
    """Semi-structured (JSON) column extraction + rollup: pull ``$.k`` out of
    the ``props`` JSON string per event and aggregate per event type.

    The extraction is one vectorized regex over the column (pandas
    ``str.extract`` runs in C) — the narrow-schema fast path for typed JSON
    fields; a general nested-JSON op would be an actor-pool stage holding a
    compiled decoder the same way the HTML stage holds its parser. Map-side
    partials carry (type, n, sum, min, max) only, so the combine is
    event-type-sized regardless of input scale.
    """
    ds = read_table(f"{sf_dir}/events.parquet", columns=["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = pd.to_numeric(
            df["props"].str.extract(r'"k"\s*:\s*(-?\d+)', expand=False)
        )
        ok = k.notna()  # rows without the field are excluded from the rollup
        out = pd.DataFrame(
            {
                "event_type": df["event_type"][ok],
                "k": k[ok].astype("int64"),
            }
        )
        return out.groupby("event_type", as_index=False).agg(
            n_events=("k", "size"), sum_k=("k", "sum"),
            min_k=("k", "min"), max_k=("k", "max"),
        )

    df = ds.map_batches(partial, batch_format="pandas").to_pandas()
    result = df.groupby("event_type", as_index=False).agg(
        n_events=("n_events", "sum"), sum_k=("sum_k", "sum"),
        min_k=("min_k", "min"), max_k=("max_k", "max"),
    )
    return (
        result.astype({c: "int64" for c in ["n_events", "sum_k", "min_k", "max_k"]})
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def top_suppliers_per_nation(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Grouped top-k: the ``k`` highest-balance suppliers per nation.

    Top-k is a combiner-friendly aggregate: the global per-group top-k is the
    top-k of the union of per-batch top-ks, so each batch forwards at most
    k rows per nation it saw and the driver combine is nations x k sized.
    The dimension names are attached in the driver combine (nations x k
    rows), so no broadcast is needed at all. Deterministic tiebreak: higher
    balance first, then lower suppkey.
    """
    ds = read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey", "s_acctbal"],
    )
    nmap = _nation_name_map(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "s_nationkey": df["s_nationkey"].astype("int64"),
                "s_suppkey": df["s_suppkey"].astype("int64"),
                "acctbal_cents": _cents(df["s_acctbal"].to_numpy()),
            }
        )
        out = out.sort_values(
            ["acctbal_cents", "s_suppkey"], ascending=[False, True]
        )
        return out.groupby("s_nationkey", as_index=False, sort=False).head(k)

    df = ds.map_batches(partial, batch_format="pandas").to_pandas()
    df = df.sort_values(["acctbal_cents", "s_suppkey"], ascending=[False, True])
    top = df.groupby("s_nationkey", as_index=False, sort=False).head(k).copy()
    # inner-join semantics (oracle: JOIN nation): orphan s_nationkey drops
    top = top[top["s_nationkey"].isin(nmap)]
    top["n_name"] = top["s_nationkey"].map(nmap)
    top["rank"] = top.groupby("s_nationkey").cumcount() + 1
    return (
        top[["n_name", "s_suppkey", "acctbal_cents", "rank"]]
        .astype({"rank": "int64"})
        .sort_values(["n_name", "rank"])
        .reset_index(drop=True)
    )


def customers_inactive_by_nation(
    sf_dir: str, cutoff: str = "2001-01-01", num_partitions: int = 16
) -> pd.DataFrame:
    """Distributed **anti-join**: customers with NO order on/after ``cutoff``,
    aggregated per nation (TPC-H Q22's shape without the phone-prefix trim).

    Ray Data has no anti-join; the scale form is the same tagged-union
    co-partitioned exchange as the bucketed join, with set-difference instead
    of probe: the filtered orders side collapses to DISTINCT custkeys inside
    each read batch (combiner — repeat orders from one customer never leave
    the batch), both sides hash-partition by custkey, and each partition drops
    the co-located customer rows whose key appears on the orders side, then
    pre-aggregates per nation. The driver combines nation-count partials
    (<= 25 x P rows). No side is broadcast: at 100 TB the active-customer set
    is itself corpus-sized.
    """
    from html_parser_ray.pipelines.shuffle import hash_partitioned

    cut = np.datetime64(cutoff)
    customer = read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )
    orders = read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )

    def tag_customer(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df["c_custkey"].astype("int64"),
                "nationkey": df["c_nationkey"].astype("int64"),
                "acctbal_cents": _cents(df["c_acctbal"].to_numpy()),
                "side": np.uint8(0),
            }
        )

    def tag_active(df: pd.DataFrame) -> pd.DataFrame:
        keys = df.loc[
            df["o_orderdate"].to_numpy() >= cut, "o_custkey"
        ].drop_duplicates()
        return pd.DataFrame(
            {
                "key": keys.astype("int64"),
                "nationkey": np.int64(-1),
                "acctbal_cents": np.int64(0),
                "side": np.uint8(1),
            }
        )

    both = customer.map_batches(tag_customer, batch_format="pandas").union(
        orders.map_batches(tag_active, batch_format="pandas")
    )

    def anti_partial(g: pd.DataFrame) -> pd.DataFrame:
        active = g.loc[g["side"] == 1, "key"]
        cust = g[g["side"] == 0]
        inactive = cust[~cust["key"].isin(active)]
        out = pd.DataFrame(
            {
                "nationkey": inactive["nationkey"].to_numpy(),
                "n_inactive": np.int64(1),
                "acctbal_cents_sum": inactive["acctbal_cents"].to_numpy(),
            }
        )
        return out.groupby("nationkey", as_index=False).sum()

    partials = hash_partitioned(both, ["key"], anti_partial, num_partitions)
    result = _final_groupby(
        partials, ["nationkey"], ["n_inactive", "acctbal_cents_sum"]
    )
    nmap = _nation_name_map(sf_dir)
    # inner-join semantics (oracle: JOIN nation): orphan nationkey drops
    result = result[result["nationkey"].isin(nmap)]
    result["n_name"] = result["nationkey"].map(nmap)
    return (
        result[["n_name", "n_inactive", "acctbal_cents_sum"]]
        .astype({"n_inactive": "int64", "acctbal_cents_sum": "int64"})
        .sort_values("n_name")
        .reset_index(drop=True)
    )


def shipping_priority(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-01",
    k: int = 10,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """TPC-H **Q3** shape: top-``k`` undelivered orders by revenue for one
    market segment — customer(filtered) ⋈ orders(filtered) ⋈ lineitem(filtered)
    with a grouped sum and a global top-k.

    Scale plan (two co-partitioned exchanges, zero broadcasts — the filtered
    customer side is 1/5 of all customers, far too big to ship to every task):
      1. lineitem rows past the ship cutoff pre-aggregate revenue per orderkey
         inside each read batch (combiner: ~4 rows -> 1), union with the slim
         filtered orders side, hash-partition by ORDERKEY, join per partition.
      2. The joined rows re-key by CUSTKEY, union with the filtered customer
         keys, hash-partition, semi-join per partition — then each partition
         forwards only its local top-k (top-k is combiner-friendly), so the
         driver combine sees <= k x P rows.
    Revenue is exact integer basis-point-cents, as everywhere in this module.
    """
    from html_parser_ray.pipelines.shuffle import hash_partitioned

    cut = np.datetime64(cutoff)
    lineitem = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    orders = read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )
    customer = read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )

    # ---- exchange 1: lineitem partials ⋈ filtered orders, by orderkey ----
    def tag_lineitem(df: pd.DataFrame) -> pd.DataFrame:
        m = df["l_shipdate"].to_numpy() > cut
        df = df[m]
        raw = pd.DataFrame(
            {
                "key": df["l_orderkey"].astype("int64"),
                "rev_bp": _cents(df["l_extendedprice"].to_numpy())
                * (100 - _cents(df["l_discount"].to_numpy())),
            }
        )
        agg = raw.groupby("key", as_index=False).sum()
        agg["custkey"] = np.int64(-1)
        # unit pinned to [us] so union blocks from both branches agree
        agg["odate"] = np.zeros(len(agg), dtype="datetime64[us]")
        agg["prio"] = ""
        agg["side"] = np.uint8(0)
        return agg

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["o_orderdate"].to_numpy() < cut]
        return pd.DataFrame(
            {
                "key": df["o_orderkey"].astype("int64"),
                "rev_bp": np.int64(0),
                "custkey": df["o_custkey"].astype("int64"),
                "odate": df["o_orderdate"].to_numpy().astype("datetime64[us]"),
                "prio": df["o_orderpriority"].astype(str),
                "side": np.uint8(1),
            }
        )

    both = lineitem.map_batches(tag_lineitem, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas")
    )

    def join_by_order(g: pd.DataFrame) -> pd.DataFrame:
        build = g[g["side"] == 1]
        probe = g[g["side"] == 0]
        # batch partials for one orderkey may arrive as several rows
        probe = probe.groupby("key", as_index=False)["rev_bp"].sum()
        merged = probe.merge(
            build[["key", "custkey", "odate", "prio"]], on="key", how="inner"
        )
        return pd.DataFrame(
            {
                "o_orderkey": merged["key"].to_numpy(),
                "revenue_bp": merged["rev_bp"].to_numpy(),
                "custkey": merged["custkey"].to_numpy(),
                "o_orderdate": merged["odate"].to_numpy(),
                "o_orderpriority": merged["prio"].to_numpy(),
            }
        )

    # out_schema: map_groups output feeds a union (exchange 2) — normalize
    # the 0-row 0-column blocks it emits for group-less input blocks, and pin
    # the timestamp unit (both tag branches emit [us]; this keeps the
    # exchange output pinned the same way)
    joined_schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("revenue_bp", pa.int64()),
            ("custkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ]
    )
    joined = hash_partitioned(
        both, ["key"], join_by_order, num_partitions, out_schema=joined_schema
    )

    # ---- exchange 2: semi-join vs the filtered customer keys, by custkey --
    def tag_joined(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["side"] = np.uint8(0)
        return df

    def tag_segment(df: pd.DataFrame) -> pd.DataFrame:
        keys = df.loc[df["c_mktsegment"] == segment, "c_custkey"]
        return pd.DataFrame(
            {
                "o_orderkey": np.int64(-1),
                "revenue_bp": np.int64(0),
                "custkey": keys.astype("int64"),
                "o_orderdate": np.zeros(len(keys), dtype="datetime64[us]"),
                "o_orderpriority": "",
                "side": np.uint8(1),
            }
        )

    both2 = joined.map_batches(tag_joined, batch_format="pandas").union(
        customer.map_batches(tag_segment, batch_format="pandas")
    )

    def semi_topk(g: pd.DataFrame) -> pd.DataFrame:
        seg = g.loc[g["side"] == 1, "custkey"]
        rows = g[g["side"] == 0]
        rows = rows[rows["custkey"].isin(seg)]
        rows = rows.sort_values(
            ["revenue_bp", "o_orderkey"], ascending=[False, True]
        ).head(k)
        return rows[
            ["o_orderkey", "revenue_bp", "o_orderdate", "o_orderpriority"]
        ]

    out_schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("revenue_bp", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ]
    )
    partials = hash_partitioned(
        both2, ["custkey"], semi_topk, num_partitions, out_schema=out_schema
    ).materialize()
    # Dataset.to_pandas() of any ZERO-ROW dataset drops the schema (0-column
    # frame) — return the typed empty instead of KeyError'ing on the sort
    if partials.count() == 0:
        return out_schema.empty_table().to_pandas()
    df = partials.to_pandas()  # <= k x P rows by construction
    return (
        df.sort_values(["revenue_bp", "o_orderkey"], ascending=[False, True])
        .head(k)
        .astype({"o_orderkey": "int64", "revenue_bp": "int64"})
        .reset_index(drop=True)
    )


def orders_rollup(sf_dir: str) -> pd.DataFrame:
    """**ROLLUP (grouping-sets) aggregate**: order counts and exact-cents
    totals at three grouping levels — (priority, status), (priority, ALL),
    (ALL, ALL) — in one pass.

    Scale shape: COUNT/SUM are distributive, so only the FINEST grouping ever
    touches the data (per-batch combiner partials -> one tiny combine at
    priority x status cardinality); the coarser rollup levels derive exactly
    from the finest level driver-side. No second scan, no extra shuffle —
    the rollup costs nothing beyond the base groupby. The rolled-up
    dimensions carry the 'ALL' sentinel (the data has no NULL keys).
    """
    ds = read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "o_orderpriority": df["o_orderpriority"].astype(str),
                "o_orderstatus": df["o_orderstatus"].astype(str),
                "n_orders": np.int64(1),
                "total_cents": _cents(df["o_totalprice"].to_numpy()),
            }
        )
        return out.groupby(
            ["o_orderpriority", "o_orderstatus"], as_index=False
        ).sum()

    finest = _final_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        ["o_orderpriority", "o_orderstatus"],
        ["n_orders", "total_cents"],
    )
    by_prio = finest.groupby("o_orderpriority", as_index=False)[
        ["n_orders", "total_cents"]
    ].sum()
    by_prio["o_orderstatus"] = "ALL"
    total = pd.DataFrame(
        {
            "o_orderpriority": ["ALL"],
            "o_orderstatus": ["ALL"],
            "n_orders": [finest["n_orders"].sum()],
            "total_cents": [finest["total_cents"].sum()],
        }
    )
    out = pd.concat([finest, by_prio, total], ignore_index=True)
    return (
        out[["o_orderpriority", "o_orderstatus", "n_orders", "total_cents"]]
        .astype({"n_orders": "int64", "total_cents": "int64"})
        .sort_values(["o_orderpriority", "o_orderstatus"])
        .reset_index(drop=True)
    )


def _balance_segments(g: pd.DataFrame):
    """Yield ``(nationkey, sorted_cents)`` per nation from one vectorized
    lexsort + segment pass — the shared scaffolding of the per-group
    holistic statistics (grouped quantiles, median+MAD). Empty partitions
    yield nothing (the shuffle.py empty-block contract)."""
    if len(g) == 0:
        return
    cents = _cents(g["s_acctbal"].to_numpy())
    nk = g["s_nationkey"].to_numpy()
    order = np.lexsort((cents, nk))
    nk, cents = nk[order], cents[order]
    starts = np.flatnonzero(np.r_[True, nk[1:] != nk[:-1]])
    ends = np.r_[starts[1:], len(nk)]
    for s, e in zip(starts, ends):
        yield int(nk[s]), cents[s:e]


def supplier_balance_quantiles_by_nation(
    sf_dir: str, num_partitions: int = 16
) -> pd.DataFrame:
    """**Grouped exact discrete quantiles** (p25/p50/p75 of supplier balance
    per nation) — the second quantile scale shape, complementing
    ``doc_length_quantiles``'s value-histogram form.

    Balances in cents are near-unique, so a value histogram would BE the
    column; the right shape when the grouping key's per-group data fits one
    partition is group-as-partition-key: hash-partition by nationkey (one
    exchange), ONE vectorized sort + ceil-rank gather per partition, output
    is nations-sized. Rank rule matches DuckDB ``quantile_disc``: the element
    at 1-based rank ``ceil(n * q)``.
    """
    from html_parser_ray.pipelines.shuffle import hash_partitioned

    supplier = read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"]
    )

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, vals in _balance_segments(g):
            n = len(vals)
            q = [
                int(vals[int(np.ceil(n * p)) - 1]) for p in (0.25, 0.5, 0.75)
            ]
            rows.append((key, n, q[0], q[1], q[2]))
        return pd.DataFrame(
            rows, columns=["nationkey", "n_suppliers", "q25", "q50", "q75"]
        ).astype("int64")

    parts = hash_partitioned(
        supplier, ["s_nationkey"], per_partition, num_partitions
    ).to_pandas()
    nmap = _nation_name_map(sf_dir)
    # inner-join semantics (oracle: FROM supplier JOIN nation) — see
    # supplier_balance_mad_by_nation: orphan s_nationkey rows drop
    parts = parts[parts["nationkey"].isin(nmap)]
    parts["n_name"] = parts["nationkey"].map(nmap)
    return (
        parts[["n_name", "n_suppliers", "q25", "q50", "q75"]]
        .sort_values("n_name")
        .reset_index(drop=True)
    )


def orders_late_ship_counts(
    sf_dir: str, cutoff: str = "2001-06-01", num_partitions: int = 16
) -> pd.DataFrame:
    """**LEFT OUTER join**: every order keeps a row whether or not it has
    lineitems shipping after ``cutoff`` — per-priority counts of orders,
    orders WITH late lines, and total late lines.

    Scale shape: the lineitem side pre-aggregates ``(orderkey -> n_late)``
    inside each batch (combiner), unions with the slim orders side, one hash
    exchange by orderkey, and each partition does a vectorized left merge
    with the nulls filled to 0 — outer semantics per partition are exact
    because co-partitioning guarantees a key's rows from BOTH sides land
    together. Per-priority partials make the driver combine priority-sized.
    """
    from html_parser_ray.pipelines.shuffle import hash_partitioned

    cut = np.datetime64(cutoff)
    orders = read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    lineitem = read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df["o_orderkey"].astype("int64"),
                "prio": df["o_orderpriority"].astype(str),
                "n_late": np.int64(0),
                "side": np.uint8(0),
            }
        )

    def tag_late(df: pd.DataFrame) -> pd.DataFrame:
        keys = df.loc[df["l_shipdate"].to_numpy() > cut, "l_orderkey"]
        agg = keys.value_counts().rename_axis("key").reset_index(name="n_late")
        return pd.DataFrame(
            {
                "key": agg["key"].astype("int64"),
                "prio": "",
                "n_late": agg["n_late"].astype("int64"),
                "side": np.uint8(1),
            }
        )

    both = orders.map_batches(tag_orders, batch_format="pandas").union(
        lineitem.map_batches(tag_late, batch_format="pandas")
    )

    def left_join_partial(g: pd.DataFrame) -> pd.DataFrame:
        late = (
            g[g["side"] == 1].groupby("key", as_index=False)["n_late"].sum()
        )
        left = g[g["side"] == 0][["key", "prio"]]
        merged = left.merge(late, on="key", how="left")
        n_late = merged["n_late"].fillna(0).astype("int64")
        out = pd.DataFrame(
            {
                "o_orderpriority": merged["prio"],
                "n_orders": np.int64(1),
                "n_with_late": (n_late > 0).astype("int64"),
                "late_lines": n_late,
            }
        )
        return out.groupby("o_orderpriority", as_index=False).sum()

    partials = hash_partitioned(both, ["key"], left_join_partial, num_partitions)
    result = _final_groupby(
        partials, ["o_orderpriority"], ["n_orders", "n_with_late", "late_lines"]
    )
    return (
        result.astype(
            {"n_orders": "int64", "n_with_late": "int64", "late_lines": "int64"}
        )
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_type_pivot(sf_dir: str, num_partitions: int = 16) -> pd.DataFrame:
    """**Pivot** (long -> wide): one row per user with a count column per
    event type — the feature-vector shape feeding a model join.

    Scale shape: the pivot's column set must be KNOWN (here the fixed
    ``EVENT_TYPES`` vocabulary — a dynamic pivot would first run a tiny
    distinct-types pass); then the whole pivot is ONE exchange by user_id
    with a vectorized crosstab per partition. Output is user-cardinality and
    streams back as a Dataset; no driver-side wide table is ever built.
    """
    from html_parser_ray.pipelines.shuffle import hash_partitioned, sort_output

    ds = read_table(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    cols = [f"n_{t}" for t in EVENT_TYPES]

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(g["user_id"], g["event_type"])
        ct = ct.reindex(columns=EVENT_TYPES, fill_value=0)
        ct.columns = cols
        out = ct.reset_index().rename(columns={"index": "user_id"})
        return out.astype({c: "int64" for c in ["user_id", *cols]})

    out_schema = pa.schema(
        [("user_id", pa.int64())] + [(c, pa.int64()) for c in cols]
    )
    return sort_output(
        hash_partitioned(
            ds, ["user_id"], per_partition, num_partitions, out_schema=out_schema
        ),
        ["user_id"],
        out_schema,
    )


def events_user_hll(sf_dir: str, p: int = 10) -> pd.DataFrame:
    """Approximate DISTINCT users per event type via **mergeable HLL
    partials** (functions/sketches.py) — the 100 TB distinct-count shape: an
    exact distinct shuffles every key, an HLL partial is m one-byte
    registers per (batch, group), and the combine merges registers with
    elementwise max (commutative + idempotent), so the exchange is
    O(types x m) no matter how many rows flow through. md5-based hashing
    makes the estimate deterministic across processes and partitionings;
    the golden oracle (independent non-importing twin) pins the exact
    value, and the unit test bounds the error vs the true count.
    """
    from html_parser_ray.functions.sketches import (
        hll_build,
        hll_estimate,
        hll_merge,
    )

    ds = read_table(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, g in df.groupby("event_type"):
            regs = hll_build(g["user_id"].to_numpy(), p=p)
            rows.append((t, regs.tobytes()))
        return pd.DataFrame(rows, columns=["event_type", "regs"])

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = []
    for t, g in parts.groupby("event_type"):
        merged = None
        for blob in g["regs"]:
            regs = np.frombuffer(blob, dtype=np.uint8)
            merged = regs if merged is None else hll_merge(merged, regs)
        out.append((t, hll_estimate(merged)))
    return (
        pd.DataFrame(out, columns=["event_type", "approx_users"])
        .astype({"approx_users": "int64"})
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def q5_local_supplier_volume(sf_dir: str, region: str = "ASIA") -> pd.DataFrame:
    """TPC-H Q5 shape: revenue per nation within one region where the
    customer and the line's supplier share the nation ("local supplier
    volume"). Six tables; integer-exact basis-point revenue.

    Scale shape: ONE co-partitioned exchange joins the two big tables
    (lineitem pre-filtered to the needed columns, orders pre-filtered by
    date) on l_orderkey == o_orderkey; the four dimension tables (customer,
    supplier, nation, region) are genuinely small and broadcast once via
    ``ray.put`` — the canonical star-join plan at 100 TB (fact-fact
    co-partition + dimension broadcast, never a fact-table shuffle per dim).
    """
    from html_parser_ray.pipelines.shuffle import hash_partitioned

    nation = pd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    reg = pd.read_parquet(f"{sf_dir}/region.parquet")
    rkeys = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    region_nations = nation[nation["n_regionkey"].isin(rkeys)]
    nat_names = dict(zip(region_nations["n_nationkey"], region_nations["n_name"]))
    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    supp = pd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    cust_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_nationkey"])))
    supp_ref = ray.put(dict(zip(supp["s_suppkey"], supp["s_nationkey"])))
    names_ref = ray.put(nat_names)

    lineitem = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    orders = read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])

    def tag_line(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df["l_orderkey"].astype("int64"),
                "suppkey": df["l_suppkey"].astype("int64"),
                "rev_bp": _cents(df["l_extendedprice"].to_numpy())
                * (100 - _cents(df["l_discount"].to_numpy())),
                "custkey": np.int64(-1),
                "side": np.uint8(0),
            }
        )

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df["o_orderkey"].astype("int64"),
                "suppkey": np.int64(-1),
                "rev_bp": np.int64(0),
                "custkey": df["o_custkey"].astype("int64"),
                "side": np.uint8(1),
            }
        )

    u = lineitem.map_batches(tag_line, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        custmap = ray.get(cust_ref)
        suppmap = ray.get(supp_ref)
        names = ray.get(names_ref)
        build = g[g["side"] == 1]
        probe = g[g["side"] == 0]
        if build.empty or probe.empty:
            return pd.DataFrame({"n_name": pd.Series(dtype="object"),
                                 "revenue_bp": pd.Series(dtype="int64")})
        o_cust = dict(zip(build["key"], build["custkey"]))
        ck = probe["key"].map(o_cust)
        c_nat = ck.map(custmap)
        s_nat = probe["suppkey"].map(suppmap)
        keep = (c_nat == s_nat) & c_nat.map(names).notna()
        kept = probe[keep]
        if kept.empty:
            return pd.DataFrame({"n_name": pd.Series(dtype="object"),
                                 "revenue_bp": pd.Series(dtype="int64")})
        out = pd.DataFrame(
            {"n_name": c_nat[keep].map(names), "revenue_bp": kept["rev_bp"]}
        )
        return out.groupby("n_name", as_index=False).sum()

    parts = hash_partitioned(u, ["key"], join_bucket, 16).to_pandas()
    if parts.empty:
        return pd.DataFrame({"n_name": pd.Series(dtype="object"),
                             "revenue_bp": pd.Series(dtype="int64")})
    final = parts.groupby("n_name", as_index=False).sum()
    final = final.sort_values(
        ["revenue_bp", "n_name"], ascending=[False, True]
    ).reset_index(drop=True)
    return final.astype({"revenue_bp": "int64"})


def customer_order_histogram(sf_dir: str, num_partitions: int = 16) -> pd.DataFrame:
    """TPC-H Q13 shape: distribution of customers by how many orders they
    placed, INCLUDING the zero-order bucket (the left-join-then-double-
    aggregate classic).

    Scale shape: orders exchange once by ``o_custkey`` (per-batch combiner
    pre-counts), each partition reduces its customers to a (c_count ->
    customers) mini-histogram plus an exact distinct-customer tally (exact
    because the key is partition-complete), and the driver merges
    histogram-sized partials. The zero bucket is total customers (a metadata
    count) minus customers seen in orders — the customer table itself never
    shuffles.
    """
    from html_parser_ray.pipelines.shuffle import hash_partitioned

    total_customers = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).count()
    orders = read_table(f"{sf_dir}/orders.parquet", columns=["o_custkey"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("o_custkey", as_index=False).size()
        return agg.rename(columns={"size": "n"})

    def histogram(g: pd.DataFrame) -> pd.DataFrame:
        per_cust = g.groupby("o_custkey")["n"].sum()
        h = per_cust.value_counts()
        return pd.DataFrame(
            {"c_count": h.index.astype("int64"), "custdist": h.values.astype("int64")}
        )

    parts = hash_partitioned(
        orders.map_batches(partial, batch_format="pandas"),
        ["o_custkey"],
        histogram,
        num_partitions,
    ).to_pandas()
    final = (
        parts.groupby("c_count", as_index=False)["custdist"].sum()
        if not parts.empty
        else pd.DataFrame({"c_count": [], "custdist": []})
    )
    with_orders = int(final["custdist"].sum()) if len(final) else 0
    zero = total_customers - with_orders
    if zero > 0:
        final = pd.concat(
            [final, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True,
        )
    final = final.astype({"c_count": "int64", "custdist": "int64"})
    return final.sort_values(
        ["custdist", "c_count"], ascending=[False, False]
    ).reset_index(drop=True)


def _distributed_quantile_disc(
    ds: "ray.data.Dataset",
    values_fn,
    q: float,
    shift: int = 16,
    num_partitions: int = 8,
) -> int:
    """Exact discrete quantile (DuckDB ``quantile_disc``: sorted value at
    position ceil(q*n)-1) over a Dataset, with DRIVER PULLS BOUNDED AT ANY
    DOMAIN SIZE — the two-level histogram drill-down:

    1. coarse pass: per-batch counts of ``value >> shift`` buckets, one
       exchange by bucket — the driver walk sees at most
       domain/2^shift rows;
    2. fine pass: exact value counts restricted to the single bucket that
       contains the target rank — at most 2^shift rows.

    Two streaming passes instead of one, in exchange for never pulling a
    full distinct-value histogram (60M+ rows for cents prices at 100 TB).
    ``values_fn(df) -> int64 ndarray`` extracts the value column.
    """
    from html_parser_ray.pipelines.shuffle import hash_partitioned

    def agg_counts(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("v", as_index=False)["n"].sum()

    def coarse_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = pd.Series(values_fn(df) >> shift).value_counts()
        return pd.DataFrame(
            {"v": c.index.astype("int64"), "n": c.values.astype("int64")}
        )

    coarse = hash_partitioned(
        ds.map_batches(coarse_partial, batch_format="pandas"),
        ["v"],
        agg_counts,
        num_partitions,
    ).to_pandas()
    coarse = coarse.sort_values("v").reset_index(drop=True)
    total = int(coarse["n"].sum())
    rank = int(np.ceil(q * total)) - 1
    cum = coarse["n"].cumsum()
    hit = int(cum.searchsorted(rank, side="right"))
    bucket = int(coarse["v"].iloc[hit])
    rank_in_bucket = rank - (int(cum.iloc[hit - 1]) if hit > 0 else 0)

    def fine_partial(df: pd.DataFrame) -> pd.DataFrame:
        vals = values_fn(df)
        vals = vals[(vals >> shift) == bucket]
        if len(vals) == 0:
            return pd.DataFrame(
                {"v": pd.Series(dtype="int64"), "n": pd.Series(dtype="int64")}
            )
        c = pd.Series(vals).value_counts()
        return pd.DataFrame(
            {"v": c.index.astype("int64"), "n": c.values.astype("int64")}
        )

    fine = hash_partitioned(
        ds.map_batches(fine_partial, batch_format="pandas"),
        ["v"],
        agg_counts,
        num_partitions,
    ).to_pandas()
    fine = fine.sort_values("v").reset_index(drop=True)
    fcum = fine["n"].cumsum()
    return int(fine["v"].iloc[int(fcum.searchsorted(rank_in_bucket, side="right"))])


def orders_above_global_p95(sf_dir: str, q: float = 0.95) -> pd.DataFrame:
    """Two-phase global-percentile filter: compute the exact discrete p95 of
    order value over the WHOLE table, then aggregate the orders at or above
    it per priority — the "top-spend tail" report.

    Scale shape: the exact quantile comes from a COARSE-then-FINE histogram
    drill-down, so the driver pull is bounded at ANY value-domain size
    (never the distinct-value histogram itself): pass 1 counts coarse
    buckets (value >> shift) — at most 2^16 rows reach the driver; the
    bucket containing the target rank is found by a cumulative walk; pass 2
    counts exact values INSIDE that one bucket only (<= 2^shift rows).
    The final phase streams the table once more with the broadcast
    threshold. ``quantile_disc`` semantics match DuckDB:
    sorted[ceil(q*n)-1].
    """
    orders = read_table(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice", "o_orderpriority"]
    )

    thresh = _distributed_quantile_disc(
        orders, lambda df: _cents(df["o_totalprice"].to_numpy()), q
    )

    def above(df: pd.DataFrame) -> pd.DataFrame:
        cents = _cents(df["o_totalprice"].to_numpy())
        keep = cents >= thresh
        out = pd.DataFrame(
            {"o_orderpriority": df["o_orderpriority"][keep], "cents": cents[keep]}
        )
        if out.empty:
            return pd.DataFrame(
                {
                    "o_orderpriority": pd.Series(dtype="object"),
                    "n_orders": pd.Series(dtype="int64"),
                    "sum_cents": pd.Series(dtype="int64"),
                }
            )
        g = out.groupby("o_orderpriority", as_index=False).agg(
            n_orders=("cents", "size"), sum_cents=("cents", "sum")
        )
        return g

    parts = orders.map_batches(above, batch_format="pandas").to_pandas()
    final = parts.groupby("o_orderpriority", as_index=False).agg(
        n_orders=("n_orders", "sum"), sum_cents=("sum_cents", "sum")
    )
    return (
        final.astype({"n_orders": "int64", "sum_cents": "int64"})
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )


def events_daily_distinct_users(sf_dir: str, num_partitions: int = 8) -> pd.DataFrame:
    """Per-day EXACT distinct users + event counts — the daily-active-users
    report, distributed without a corpus-sized distinct.

    Scale shape: each batch collapses to distinct (day, user) pairs carrying
    a partial event count (the combiner), one exchange by day co-locates a
    day's pairs, and each partition finishes with an exact ``nunique`` —
    the exchange carries at most (days x users) slim rows, not events.
    """
    from html_parser_ray.pipelines.shuffle import hash_partitioned

    ds = read_table(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].dt.strftime("%Y-%m-%d")
        g = (
            pd.DataFrame({"day": day, "user_id": df["user_id"].astype("int64")})
            .groupby(["day", "user_id"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return g

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("day").agg(
            n_users=("user_id", "nunique"), n_events=("n", "sum")
        )
        return agg.reset_index()

    parts = hash_partitioned(
        ds.map_batches(partial, batch_format="pandas"), ["day"], finish, num_partitions
    ).to_pandas()
    return (
        parts.astype({"n_users": "int64", "n_events": "int64"})
        .sort_values("day")
        .reset_index(drop=True)
    )


def orders_cube(sf_dir: str) -> pd.DataFrame:
    """**CUBE (all grouping sets) aggregate**: order counts and exact-cents
    totals at all four levels of (priority, status) — (p, s), (p, ALL),
    (ALL, s), (ALL, ALL) — in one pass.

    Same scale shape as ``orders_rollup``: COUNT/SUM are distributive, so
    only the FINEST grouping touches the data (per-batch combiner partials
    -> one tiny combine at priority x status cardinality); every coarser
    set derives exactly from the finest level driver-side. CUBE adds the
    (ALL, status) set ROLLUP omits — still zero extra scans or shuffles.
    """
    ds = read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "o_orderpriority": df["o_orderpriority"].astype(str),
                "o_orderstatus": df["o_orderstatus"].astype(str),
                "n_orders": np.int64(1),
                "total_cents": _cents(df["o_totalprice"].to_numpy()),
            }
        )
        return out.groupby(
            ["o_orderpriority", "o_orderstatus"], as_index=False
        ).sum()

    finest = _final_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        ["o_orderpriority", "o_orderstatus"],
        ["n_orders", "total_cents"],
    )
    sums = ["n_orders", "total_cents"]
    by_prio = finest.groupby("o_orderpriority", as_index=False)[sums].sum()
    by_prio["o_orderstatus"] = "ALL"
    by_status = finest.groupby("o_orderstatus", as_index=False)[sums].sum()
    by_status["o_orderpriority"] = "ALL"
    total = pd.DataFrame(
        {
            "o_orderpriority": ["ALL"],
            "o_orderstatus": ["ALL"],
            "n_orders": [finest["n_orders"].sum()],
            "total_cents": [finest["total_cents"].sum()],
        }
    )
    out = pd.concat([finest, by_prio, by_status, total], ignore_index=True)
    return (
        out[["o_orderpriority", "o_orderstatus", "n_orders", "total_cents"]]
        .astype({"n_orders": "int64", "total_cents": "int64"})
        .sort_values(["o_orderpriority", "o_orderstatus"])
        .reset_index(drop=True)
    )


def orders_bloom_semi_join(
    sf_dir: str, segment: str = "BUILDING", num_partitions: int = 16
) -> pd.DataFrame:
    """**Bloom-filtered semi-join** (round 5): orders whose customer sits in
    one market segment, aggregated per priority — through a Bloom pre-filter
    + exact co-partitioned verify.

    The 100 TB join strategy this demonstrates: broadcasting the build
    side's EXACT key set costs 8+ bytes per key (unbounded as the build side
    grows); a Bloom filter is a FIXED 16 KiB bit array whose map-side
    partials merge with bitwise OR (commutative — ``functions/sketches.py``),
    so the probe side drops non-candidates map-only BEFORE the one exchange,
    and the exact co-partitioned semi-join (``partitioned_lookup``) then
    shuffles only the survivors. False positives cost a little verify work;
    false negatives are impossible, so the result is EXACT — same oracle as
    the plain semi-join.
    """
    from html_parser_ray.functions.sketches import (
        bloom_add_many_int64,
        bloom_contains_many_int64,
        bloom_merge,
        bloom_new,
    )
    from html_parser_ray.pipelines.shuffle import partitioned_lookup

    cust_path = f"{sf_dir}/customer.parquet"
    # materialize once: the bloom partials AND the verify keys both read
    # the build side (two lazy executions would scan the file twice)
    build = read_table(cust_path, columns=["c_custkey", "c_mktsegment"]).materialize()

    def bloom_partial(df: pd.DataFrame) -> pd.DataFrame:
        bits = bloom_new()
        keys = df.loc[df["c_mktsegment"] == segment, "c_custkey"].to_numpy()
        bloom_add_many_int64(bits, keys)
        return pd.DataFrame({"bits": [bits.tobytes()]})

    # one 16 KiB partial per block -> OR-combine on the driver (bounded by
    # the BLOCK COUNT, not by the number of keys) -> broadcast once
    parts = build.map_batches(bloom_partial, batch_format="pandas").to_pandas()
    bloom = bloom_new()
    for blob in parts["bits"]:
        bloom = bloom_merge(bloom, np.frombuffer(blob, dtype=np.uint8))
    bloom_ref = ray.put(bloom)

    orders = read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority", "o_totalprice"],
    )

    def prefilter(df: pd.DataFrame) -> pd.DataFrame:
        bits = ray.get(bloom_ref)
        # vectorized probe: the pre-filter stays numpy end-to-end (a per-row
        # Python md5 here would cost more than the exchange it avoids)
        mask = bloom_contains_many_int64(bits, df["o_custkey"].to_numpy())
        sub = df[mask]
        return pd.DataFrame(
            {
                "o_custkey": sub["o_custkey"].astype("int64"),
                "o_orderpriority": sub["o_orderpriority"],
                "cents": _cents(sub["o_totalprice"].to_numpy()),
            }
        )

    survivors = orders.map_batches(prefilter, batch_format="pandas")

    # exact verify: co-partitioned semi-join of the SURVIVORS only (the
    # exact set is never broadcast — at scale it doesn't fit; the exchange
    # carries candidates, already bloom-shrunk to ~the true matches)
    def seg_keys(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["c_mktsegment"] == segment]
        return pd.DataFrame(
            {"c_custkey": sub["c_custkey"].astype("int64"), "one": np.uint8(1)}
        )

    seg_ds = build.map_batches(seg_keys, batch_format="pandas")
    verified = partitioned_lookup(
        survivors, "o_custkey", seg_ds, "c_custkey", "one", "__m", num_partitions
    )

    def agg_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "o_orderpriority" not in df.columns:
            # partitioned_lookup's exchange can emit 0-column empty blocks
            # for empty sort ranges — return the typed empty partial
            return pd.DataFrame(
                {
                    "o_orderpriority": pd.Series(dtype="object"),
                    "n_orders": pd.Series(dtype="int64"),
                    "sum_cents": pd.Series(dtype="int64"),
                }
            )
        return df.groupby("o_orderpriority", as_index=False).agg(
            n_orders=("cents", "size"), sum_cents=("cents", "sum")
        )

    parts2 = verified.map_batches(agg_partial, batch_format="pandas").to_pandas()
    out = (
        parts2.groupby("o_orderpriority", as_index=False)[["n_orders", "sum_cents"]]
        .sum()
        .astype({"n_orders": "int64", "sum_cents": "int64"})
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    return out


def events_value_outliers(sf_dir: str, z: int = 3) -> pd.DataFrame:
    """**Per-group z-score outlier filter in EXACT integer arithmetic**
    (round 5): events whose value sits more than ``z`` population standard
    deviations from their event type's mean.

    ``|x - mean| > z*std`` is algebraically ``(n*x - S)^2 > z^2*(n*Q - S^2)``
    with S = sum, Q = sum of squares — all integers on cents, so the filter
    is bit-exact against the SQL oracle (no float std/mean round-trip).
    Shape: map-side moment partials (n, S, Q — three ints per (batch,
    group)), driver combine in arbitrary-precision Python ints (group count
    is the bound, not rows), broadcast, then one map-only filter pass. The
    per-row side needs ``(n*x - S)^2`` to fit int64; groups too big for that
    fall back to an exact per-row Python-int path (documented bound: fine
    through sf100; shard the moments beyond that).
    """
    path = f"{sf_dir}/events.parquet"
    ds = read_table(path, columns=["event_id", "event_type", "value"])

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        cents = _cents(df["value"].to_numpy())
        g = pd.DataFrame({"t": df["event_type"], "c": cents})
        rows = []
        for t, sub in g.groupby("t"):
            c = sub["c"].to_numpy()
            # per-batch sumsq fits int64 (rows_per_batch * max_cents^2)
            rows.append((t, len(c), int(c.sum()), int((c * c).sum())))
        return pd.DataFrame(rows, columns=["t", "n", "s", "q"])

    parts = ds.map_batches(moments, batch_format="pandas").to_pandas()
    stats: dict[str, tuple[int, int, int]] = {}
    for t, sub in parts.groupby("t"):
        n = int(sub["n"].sum())
        s = int(sub["s"].sum())  # Python ints: exact at any magnitude
        q = int(sub["q"].sum())
        thresh = z * z * (n * q - s * s)  # exact, arbitrary precision
        stats[str(t)] = (n, s, thresh)
    stats_ref = ray.put(stats)

    out_schema = pa.schema(
        [("event_id", pa.int64()), ("event_type", pa.string()), ("cents", pa.int64())]
    )

    def filt(df: pd.DataFrame) -> "pa.Table":
        st = ray.get(stats_ref)
        cents = _cents(df["value"].to_numpy())
        ids = df["event_id"].to_numpy()
        out_id, out_t, out_c = [], [], []
        for t, idx in df.groupby("event_type").indices.items():
            n, s, thresh = st[str(t)]
            c = cents[idx]
            # |d| = |n*c - s| <= n*max|c| + |s|; vectorize iff d^2 fits int64
            d_bound = n * int(np.abs(c).max(initial=0)) + abs(s)
            if d_bound < 3_037_000_499:  # isqrt(2^63 - 1)
                d = n * c.astype(np.int64) - s
                mask = d * d > min(thresh, (1 << 63) - 1)
            else:  # exact arbitrary-precision fallback for huge groups
                mask = np.fromiter(
                    ((n * int(x) - s) ** 2 > thresh for x in c),
                    dtype=bool,
                    count=len(c),
                )
            for j in np.nonzero(mask)[0]:
                out_id.append(int(ids[idx[j]]))
                out_t.append(t)
                out_c.append(int(c[j]))
        # Arrow output: exact nbytes sizing (an empty pandas block with an
        # object column trips Ray's np.vectorize size estimator) and a
        # schema-stable empty block for free.
        return pa.table(
            {"event_id": out_id, "event_type": out_t, "cents": out_c},
            schema=out_schema,
        )

    from html_parser_ray.pipelines.shuffle import sort_output

    return sort_output(ds.map_batches(filt, batch_format="pandas"), ["event_id"], out_schema)


PROFILE_COLUMNS = ["event_id", "event_type", "props", "ts", "user_id", "value"]


def events_profile(sf_dir: str, num_partitions: int = 16) -> pd.DataFrame:
    """**Distributed table profiler** (round 5): per-column row count, null
    count and EXACT distinct count over the events table — the schema-audit
    pass a training-data pipeline runs before ingesting a new source.

    Scale shape: ONE melt exchange does everything. Each batch melts — in
    ARROW format, where nulls are validity bits and a nullable int64 column
    can never silently promote to float64 the way a per-block pandas
    conversion does (that promotion made the distinct key block-dependent:
    the same value hashed differently depending on whether its block held a
    null) — to slim ``(column_id, key_i64, key_str)`` rows: the int64
    bit-view for numeric/timestamp columns (8 bytes, no float formatting)
    and the raw string otherwise. Floats are canonicalized to SQL DISTINCT
    semantics first (-0.0 -> 0.0 merge, one NaN bit pattern; Arrow
    null_count already matches SQL's NaN-is-a-value rule). One hash
    partition per (cid, keys) then emits ``(cid, nd, n_seen)`` partials —
    distincts AND non-null counts from the same exchange; n_rows comes from
    dataset metadata. The driver combine is bounded by partitions x
    columns, never by rows. A zero-row table yields the same
    all-zeros-per-column rows the SQL aggregate does.
    """
    from html_parser_ray.pipelines.shuffle import hash_partitioned

    path = f"{sf_dir}/events.parquet"
    ds = read_table(path, columns=PROFILE_COLUMNS)
    n_rows = ds.count()  # metadata-only

    def melt(batch: "pa.Table") -> "pa.Table":
        cids: list[np.ndarray] = []
        keys_i: list[np.ndarray] = []
        keys_s: list[list] = []
        for cid, c in enumerate(PROFILE_COLUMNS):
            col = batch.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            col = col.drop_null()  # validity nulls only — NaN stays (SQL rule)
            if pa.types.is_floating(col.type):
                v = col.to_numpy(zero_copy_only=False).astype(np.float64, copy=True)
                v = v + 0.0  # IEEE: -0.0 + 0.0 == +0.0 -> signed-zero merge
                v[np.isnan(v)] = np.nan  # one canonical NaN bit pattern
                ki = v.view(np.int64)
                ks = [""] * len(ki)
            elif pa.types.is_timestamp(col.type):
                ki = col.to_numpy(zero_copy_only=False).view(np.int64)
                ks = [""] * len(ki)
            elif pa.types.is_integer(col.type):
                # astype, not view: sub-64-bit ints would byte-pack under a
                # raw view; astype is value-preserving (and a bijective wrap
                # for uint64), so distinct counts stay exact at every width
                ki = col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
                ks = [""] * len(ki)
            else:
                ks = col.to_pylist()
                ki = np.zeros(len(ks), dtype=np.int64)
            cids.append(np.full(len(ki), cid, dtype=np.int64))
            keys_i.append(np.asarray(ki, dtype=np.int64))
            keys_s.append(ks)
        return pa.table(
            {
                "cid": pa.array(np.concatenate(cids) if cids else [], type=pa.int64()),
                "key_i": pa.array(
                    np.concatenate(keys_i) if keys_i else [], type=pa.int64()
                ),
                "key_s": pa.array(
                    [x for part in keys_s for x in part], type=pa.string()
                ),
            }
        )

    melted = ds.map_batches(melt, batch_format="pyarrow")

    def distinct_partial(g: pd.DataFrame) -> pd.DataFrame:
        seen = g.groupby("cid", as_index=False).size().rename(columns={"size": "n_seen"})
        nd = (
            g.drop_duplicates()
            .groupby("cid", as_index=False)
            .size()
            .rename(columns={"size": "nd"})
        )
        return seen.merge(nd, on="cid")

    part_schema = pa.schema(
        [("cid", pa.int64()), ("n_seen", pa.int64()), ("nd", pa.int64())]
    )
    parts = hash_partitioned(
        melted, ["cid", "key_i", "key_s"], distinct_partial, num_partitions,
        out_schema=part_schema,
    ).to_pandas()
    if parts.empty or "cid" not in parts.columns:
        # empty source: Dataset.to_pandas() drops the schema of a zero-row
        # dataset (shuffle.py note) — rebuild the typed empty
        parts = pd.DataFrame({"cid": [], "n_seen": [], "nd": []})
    agg = parts.groupby("cid")[["n_seen", "nd"]].sum()

    rows = []
    for cid, c in enumerate(PROFILE_COLUMNS):
        n_seen = int(agg["n_seen"].get(cid, 0))
        nd = int(agg["nd"].get(cid, 0))
        rows.append((c, n_rows, n_rows - n_seen, nd))
    return pd.DataFrame(
        rows, columns=["col_name", "n_rows", "n_null", "n_distinct"]
    ).astype(
        {"n_rows": "int64", "n_null": "int64", "n_distinct": "int64"}
    ).sort_values("col_name").reset_index(drop=True)


def events_purchase_no_click_days(
    sf_dir: str, num_partitions: int = 16
) -> "ray.data.Dataset | pd.DataFrame":
    """**Distributed set operation (EXCEPT DISTINCT)** over a composite key:
    the ``(user_id, day)`` pairs with a purchase but no click that day — the
    "converted without engagement" audit, i.e.
    ``SELECT user, day WHERE purchase EXCEPT SELECT user, day WHERE click``.

    Scale shape — ONE exchange of pre-deduplicated slim rows: each batch
    filters to the two relevant event types, tags the side bit (purchase=1,
    click=0) and emits per-batch-distinct ``(user_id, day, side)`` triples
    (the combiner pattern: the shuffle carries at most 2 rows per key per
    batch, never events). Hash-partitioning by the composite key co-locates
    both sides of each pair, so the per-partition verdict (``min(side) ==
    max(side) == 1`` — has a purchase row, has no click row) is globally
    exact. INTERSECT / UNION DISTINCT fall out of the same partials by
    changing only the verdict predicate. Per-partition memory is
    distinct-keys/P; nothing corpus-sized touches the driver.
    """
    from html_parser_ray.pipelines.shuffle import hash_partitioned, sort_output

    ds = read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        keep = (et == "purchase") | (et == "click")
        sub = df[keep]
        # dedupe on the compact (int64, datetime64[D], uint8) columns FIRST;
        # stringize only the distinct rows (shrink-early: one 'YYYY-MM-DD'
        # allocation per distinct key, not per event)
        compact = pd.DataFrame(
            {
                "user_id": sub["user_id"].to_numpy().astype("int64"),
                "day_d": sub["ts"].to_numpy("datetime64[us]").astype(
                    "datetime64[D]"
                ),
                "side": (sub["event_type"].to_numpy() == "purchase").astype(
                    np.uint8
                ),
            }
        ).drop_duplicates()
        return pd.DataFrame(
            {
                "user_id": compact["user_id"].to_numpy(),
                # pandas upcasts datetime64[D] to [s]/[ns] inside the frame;
                # re-truncate so str() stays the bare 'YYYY-MM-DD'
                "day": compact["day_d"].to_numpy().astype("datetime64[D]").astype(str),
                "side": compact["side"].to_numpy(),
            }
        )

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["user_id", "day"])["side"].agg(["min", "max"]).reset_index()
        keep = agg[(agg["min"] == 1) & (agg["max"] == 1)]
        return (
            keep[["user_id", "day"]]
            .astype({"user_id": "int64", "day": "object"})
            .reset_index(drop=True)
        )

    tagged = ds.map_batches(tag, batch_format="pandas")
    out_schema = pa.schema([("user_id", pa.int64()), ("day", pa.string())])
    return sort_output(
        hash_partitioned(tagged, ["user_id", "day"], per_partition, num_partitions),
        ["user_id", "day"],
        out_schema,
    )


def events_type_mode_user(
    sf_dir: str, num_partitions: int = 8
) -> "ray.data.Dataset | pd.DataFrame":
    """**Mode (most-frequent value) per group**: for every event type, the
    user with the most events, ties broken by the smaller ``user_id`` — a
    holistic aggregate (no constant-size partial exists for argmax-of-count,
    unlike sum/min/max).

    Scale shape — two-phase count-then-argmax in ONE exchange: map-side
    combiners pre-aggregate each batch to ``(event_type, user_id, cnt)``
    (the shuffle carries pairs, not events), hash-partitioning by
    ``event_type`` co-locates every pair of a type, and the per-partition
    pass finishes the count sum and takes the argmax with the deterministic
    tiebreak. Per-partition memory is (type, user) pairs / P. Skew note: a
    single hot event_type concentrates its PAIRS (already combined — bounded
    by distinct users, not events) in one partition; salting by
    ``user_id % k`` with a second tiny argmax pass is the documented hot-key
    escape hatch, unnecessary at the tested cardinalities.
    """
    from html_parser_ray.pipelines.shuffle import hash_partitioned, sort_output

    ds = read_table(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # dtype-normalize BEFORE the exchange (per-block pandas conversion of
        # a nullable int64 block yields float64 — mixed partial dtypes would
        # hash to different partitions; a null user_id raises loudly here
        # instead of silently dropping the NULL group the SQL oracle keeps)
        slim = pd.DataFrame(
            {
                "event_type": df["event_type"].to_numpy(),
                "user_id": df["user_id"].to_numpy().astype("int64"),
            }
        )
        out = slim.groupby(["event_type", "user_id"], as_index=False).size()
        return out.rename(columns={"size": "cnt"})

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        full = g.groupby(["event_type", "user_id"], as_index=False)["cnt"].sum()
        full = full.sort_values(
            ["event_type", "cnt", "user_id"], ascending=[True, False, True]
        )
        top = full.groupby("event_type", as_index=False).head(1)
        return pd.DataFrame(
            {
                "event_type": top["event_type"].to_numpy(),
                "mode_user": top["user_id"].to_numpy().astype("int64"),
                "n_events": top["cnt"].to_numpy().astype("int64"),
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("mode_user", pa.int64()),
            ("n_events", pa.int64()),
        ]
    )
    return sort_output(
        hash_partitioned(partials, ["event_type"], per_partition, num_partitions),
        ["event_type"],
        out_schema,
    )


def nation_supplier_names(
    sf_dir: str, num_partitions: int = 8
) -> "ray.data.Dataset | pd.DataFrame":
    """**Order-sensitive aggregate** (``string_agg(s_name, ',' ORDER BY
    s_name)`` per nation): the concatenated, name-ordered supplier roster of
    every nation — the aggregate family where ORDER inside the group is part
    of the result, so unordered partial-merge (the sum/min/max combiner
    trick) cannot apply.

    Scale shape: hash-partition suppliers by ``s_nationkey`` (ONE exchange of
    (nationkey, name) pairs; every nation's suppliers co-locate), one sorted
    vectorized join per partition, nation names attached from a broadcast
    ``ray.put`` dict (the dimension never shuffles). Result rows are
    group-sized; per-partition memory is suppliers/P. At extreme group sizes
    an ordered aggregate inherently holds one group's values at once — the
    documented bound (suppliers per nation), the same one the SQL engine
    pays.
    """
    from html_parser_ray.pipelines.shuffle import hash_partitioned, sort_output

    supplier = read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_name"]
    )
    nation_map_ref = ray.put(_nation_name_map(sf_dir))

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        nmap = ray.get(nation_map_ref)
        # SQL parity: string_agg skips NULL values; the inner JOIN drops
        # suppliers whose nationkey has no nation row
        g = g[g["s_name"].notna()]
        g = g[g["s_nationkey"].isin(nmap)]
        g = g.sort_values(["s_nationkey", "s_name"])
        agg = (
            g.groupby("s_nationkey")["s_name"]
            .agg(names=",".join, n_suppliers="size")
            .reset_index()
        )
        return pd.DataFrame(
            {
                "n_name": agg["s_nationkey"].map(nmap),
                "names": agg["names"],
                "n_suppliers": agg["n_suppliers"].astype("int64"),
            }
        )

    out_schema = pa.schema(
        [
            ("n_name", pa.string()),
            ("names", pa.string()),
            ("n_suppliers", pa.int64()),
        ]
    )
    return sort_output(
        hash_partitioned(supplier, ["s_nationkey"], per_partition, num_partitions),
        ["n_name"],
        out_schema,
    )


def orders_above_customer_avg(
    sf_dir: str, num_partitions: int = 16
) -> "ray.data.Dataset | pd.DataFrame":
    """**Decorrelated correlated subquery** (round 5): orders whose total
    price strictly exceeds their own customer's average order price — the
    canonical ``WHERE x > (SELECT AVG(..) .. WHERE correlated)`` shape,
    decorrelated into an aggregate + self-join as modern planners do.

    Scale shape — ONE exchange, ZERO joins: hash-partition orders by
    ``o_custkey``; every customer's orders co-locate, so the per-customer
    aggregate AND the filter both happen inside one vectorized pass
    (``groupby(...).transform`` for count/sum, then an exact integer
    comparison ``cents * n > sum_cents`` — no float average round-trip).
    The exchange carries only (orderkey, custkey, cents) slim rows; skew
    bound = orders of the single largest customer.
    """
    ds = read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].astype("int64"),
                "o_custkey": df["o_custkey"].astype("int64"),
                "cents": _cents(df["o_totalprice"].to_numpy()),
            }
        )

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("o_custkey")["cents"]
        n = grp.transform("count").to_numpy().astype("int64")
        s = grp.transform("sum").to_numpy().astype("int64")
        c = g["cents"].to_numpy()
        # c*n fits int64 comfortably (cents < 6e7, n < 1e5 per customer)
        return g[c * n > s]

    out_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()), ("cents", pa.int64())]
    )
    from html_parser_ray.pipelines.shuffle import hash_partitioned, sort_output

    return sort_output(
        hash_partitioned(
            ds.map_batches(slim, batch_format="pandas"),
            ["o_custkey"],
            per_partition,
            num_partitions,
        ),
        ["o_orderkey"],
        out_schema,
    )


def _pareto_front_block(g: pd.DataFrame) -> pd.DataFrame:
    """Exact 2-D skyline of one block: rows not strictly dominated on
    (minimize cents, maximize psize). Dominance keeps ties: two identical
    points never eliminate each other. One sort + two vectorized maxes."""
    if len(g) == 0:
        return g
    g = g.sort_values(["cents", "psize"], ascending=[True, False]).reset_index(
        drop=True
    )
    cents = g["cents"].to_numpy()
    size = g["psize"].to_numpy()
    # per-equal-cents-group max size, then running max over STRICTLY
    # cheaper groups: dominated iff size < own-group max (same price,
    # bigger size exists) or size <= best strictly-cheaper size
    new_grp = np.ones(len(g), dtype=bool)
    new_grp[1:] = cents[1:] != cents[:-1]
    grp_id = np.cumsum(new_grp) - 1
    starts = np.nonzero(new_grp)[0]
    # sorted desc within group -> each group's max size is its first element
    grp_firsts = size[starts]
    grp_max = grp_firsts[grp_id]
    prev_best = np.empty(len(starts), dtype="int64")
    prev_best[0] = np.iinfo("int64").min
    if len(starts) > 1:
        np.maximum.accumulate(grp_firsts[:-1], out=prev_best[1:])
    prev_strict = prev_best[grp_id]
    keep = (size >= grp_max) & (size > prev_strict)
    return g[keep]


def part_pareto_front(sf_dir: str) -> "ray.data.Dataset | pd.DataFrame":
    """**Skyline (Pareto front) operator** (round 5): parts not dominated on
    (minimize retail price, maximize size) — the multi-criteria shortlist
    query relational engines express as an anti-``NOT EXISTS`` self-join
    (quadratic if executed naively).

    Scale shape — block-local skyline then a front-of-fronts pass, ZERO
    all-to-all shuffles: each block reduces to its local Pareto front
    (strict domination is transitive, so any point eliminated locally is
    also dominated by some SURVIVOR of its block — the union of local
    fronts provably contains the global front); the union (expected
    O(log n) per block on non-adversarial data) repartitions to one block
    for the exact final pass. Never corpus-quadratic, never driver-side.
    """
    ds = read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size", "p_retailprice"]
    )

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "p_partkey": df["p_partkey"].astype("int64"),
                "cents": _cents(df["p_retailprice"].to_numpy()),
                "psize": df["p_size"].astype("int64"),
            }
        )

    local = ds.map_batches(slim, batch_format="pandas").map_batches(
        _pareto_front_block, batch_format="pandas"
    )
    # front-of-fronts: tiny by construction; repartition(1) rebuilds clean
    # blocks (and at true scale this pass is still one small task)
    final = local.repartition(1).map_batches(
        _pareto_front_block, batch_format="pandas"
    )
    out_schema = pa.schema(
        [("p_partkey", pa.int64()), ("cents", pa.int64()), ("psize", pa.int64())]
    )
    from html_parser_ray.pipelines.shuffle import sort_output

    return sort_output(final, ["p_partkey"], out_schema)


def events_user_day_activity(
    sf_dir: str, num_partitions: int = 16
) -> "ray.data.Dataset | pd.DataFrame":
    """**FULL OUTER join** (round 5): per-(user, day) purchase counts
    full-outer-joined with per-(user, day) click counts — every context
    that has EITHER side keeps a row, missing sides coalesce to 0. This
    completes the join family (inner, left-outer in
    ``orders_late_ship_counts``, semi via Bloom, anti in
    ``customers_inactive_by_nation``, as-of, band).

    Scale shape — map-side combiners then ONE exchange: each batch
    pre-counts (user, day, side) so only slim partial-count rows move,
    one hash exchange by ``user_id`` co-locates every context's both
    sides, and the per-partition pivot (side -> column, fillna 0) realizes
    outer semantics exactly because co-partitioning guarantees a key's
    rows from BOTH sides land together. Output is contexts-sized.
    """
    from html_parser_ray.pipelines.shuffle import hash_partitioned, sort_output
    from html_parser_ray.pipelines.temporal import _ts_us, _US_PER_S

    ds = read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["event_type"].isin(("purchase", "click"))
        d = df.loc[keep]
        out = pd.DataFrame(
            {
                "user_id": d["user_id"].astype("int64"),
                "day": _ts_us(d["ts"]) // (86_400 * _US_PER_S),
                "is_purchase": (d["event_type"] == "purchase").to_numpy(),
            }
        )
        return (
            out.groupby(["user_id", "day", "is_purchase"], as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
            .astype({"cnt": "int64"})
        )

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:  # schema-stable empty partial (shuffle.py contract)
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "day": pd.Series(dtype="int64"),
                    "n_purchases": pd.Series(dtype="int64"),
                    "n_clicks": pd.Series(dtype="int64"),
                }
            )
        agg = g.groupby(["user_id", "day", "is_purchase"], as_index=False)[
            "cnt"
        ].sum()
        wide = agg.pivot_table(
            index=["user_id", "day"],
            columns="is_purchase",
            values="cnt",
            fill_value=0,
            aggfunc="sum",
        ).reset_index()
        # a partition may see only one side globally — make both columns total
        for side in (False, True):
            if side not in wide.columns:
                wide[side] = 0
        return pd.DataFrame(
            {
                "user_id": wide["user_id"].astype("int64"),
                "day": wide["day"].astype("int64"),
                "n_purchases": wide[True].astype("int64"),
                "n_clicks": wide[False].astype("int64"),
            }
        )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("day", pa.int64()),
            ("n_purchases", pa.int64()),
            ("n_clicks", pa.int64()),
        ]
    )
    return sort_output(
        hash_partitioned(
            ds.map_batches(partial, batch_format="pandas"),
            ["user_id"],
            per_partition,
            num_partitions,
        ),
        ["user_id", "day"],
        out_schema,
    )


def supplier_balance_mad_by_nation(
    sf_dir: str, num_partitions: int = 16
) -> pd.DataFrame:
    """**Robust statistics: median + MAD per group** (round 5) — the
    outlier-resistant spread measure (median absolute deviation from the
    median) quality pipelines prefer over stddev on heavy-tailed data.
    MAD is doubly holistic (a median OF deviations from a median), so no
    mergeable partial exists — the correct distributed shape is the same
    group-as-partition-key co-location ``supplier_balance_quantiles_by_nation``
    uses: hash-partition by nationkey (one exchange), then per partition a
    vectorized segment pass computes both medians per nation. Integer
    cents keep every median an exact ``x.0``/``x.5`` double, so the DuckDB
    compare is bit-exact with no float-sum drift.
    """
    from html_parser_ray.pipelines.shuffle import hash_partitioned

    supplier = read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"]
    )

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, seg in _balance_segments(g):
            vals = seg.astype("float64")
            med = float(np.median(vals))  # sorted already; exact .0/.5
            mad = float(np.median(np.abs(vals - med)))
            rows.append((key, len(vals), med, mad))
        return pd.DataFrame(
            rows, columns=["nationkey", "n_suppliers", "median_cents", "mad_cents"]
        ).astype(
            {
                "nationkey": "int64",
                "n_suppliers": "int64",
                "median_cents": "float64",
                "mad_cents": "float64",
            }
        )

    parts = hash_partitioned(
        supplier, ["s_nationkey"], per_partition, num_partitions
    ).to_pandas()
    nmap = _nation_name_map(sf_dir)
    # inner-join semantics (oracle: FROM supplier JOIN nation): a supplier
    # with an orphan s_nationkey must drop, not surface as a NaN-named row
    parts = parts[parts["nationkey"].isin(nmap)]
    parts["n_name"] = parts["nationkey"].map(nmap)
    return (
        parts[["n_name", "n_suppliers", "median_cents", "mad_cents"]]
        .sort_values("n_name")
        .reset_index(drop=True)
    )


def _two_limb_double(x: int) -> float:
    """int -> double with a PINNED rounding sequence shared with the SQL
    oracle. DuckDB's ``CAST(HUGEINT AS DOUBLE)`` is NOT correctly rounded
    above 2^53 (probed: ~1% of random 64-90-bit ints differ from Python's
    correctly-rounded ``float(int)`` by 1 ulp), so bit-exact parity cannot
    go through a plain cast once moments outgrow int64. Both sides instead
    evaluate the same two-limb expression — high = |x| >> 32 (one
    correctly-rounded int64->double conversion), low = |x| & 0xFFFFFFFF
    (exact in double), then high * 2^32 (exact: power-of-two scale) + low
    (one rounding) — an identical operation tree, hence identical doubles,
    for any |x| < 2^95. Probed over 4,000 random 10-94-bit ints and 1,500
    full corr-expression evaluations: 0 mismatches."""
    q, r = abs(x) >> 32, abs(x) & 0xFFFFFFFF
    s = -1.0 if x < 0 else 1.0
    return s * (float(q) * 4294967296.0 + float(r))


def events_hour_value_corr(sf_dir: str) -> pd.DataFrame:
    """**Distributed bivariate statistics** (round 5, third batch): per
    event type, the Pearson correlation and least-squares regression line
    (slope + intercept) of event value in cents against hour-of-day — the
    "does value drift across the day" audit a pipeline runs before trusting
    time-of-day-based sampling. The aggregate family is new to the contract:
    BIVARIATE sufficient statistics (six moments), where everything before
    the final scalar math is commutative integer addition.

    Scale shape: map-side moment partials inside ``map_batches`` — one slim
    (group, n, Sx, Sy, Sxx, Syy, Sxy) row per (batch, group) — then a
    driver combine in arbitrary-precision Python ints bounded by
    groups x blocks, never rows. ZERO exchanges. Bit-exactness vs the SQL
    oracle: moments are exact integers on both sides (per-batch sumsq fits
    int64 under the same documented bound as ``events_value_outliers``;
    hour <= 23 keeps the x moments tiny), and every int -> double crossing
    uses the pinned two-limb sequence (``_two_limb_double``) so the float
    expressions match bit-for-bit with no tolerance. Degenerate groups
    (zero variance on either axis, e.g. a single event or constant values)
    yield SQL NULLs via the same CASE guards the oracle uses.
    """
    import math

    path = f"{sf_dir}/events.parquet"
    ds = read_table(path, columns=["event_type", "ts", "value"])

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        y = _cents(df["value"].to_numpy())
        x = df["ts"].dt.hour.to_numpy().astype(np.int64)
        rows = []
        for t, idx in df.groupby("event_type").indices.items():
            xi, yi = x[idx], y[idx]
            rows.append(
                (
                    t,
                    len(idx),
                    int(xi.sum()),
                    int(yi.sum()),
                    int((xi * xi).sum()),
                    int((yi * yi).sum()),
                    int((xi * yi).sum()),
                )
            )
        return pd.DataFrame(
            rows, columns=["t", "n", "sx", "sy", "sxx", "syy", "sxy"]
        )

    parts = ds.map_batches(moments, batch_format="pandas").to_pandas()
    out = []
    for t, sub in parts.groupby("t"):
        n = int(sub["n"].sum())
        sx, sy = int(sub["sx"].sum()), int(sub["sy"].sum())
        sxx, syy = int(sub["sxx"].sum()), int(sub["syy"].sum())
        sxy = int(sub["sxy"].sum())
        num = n * sxy - sx * sy  # exact, arbitrary precision
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        corr = (
            _two_limb_double(num)
            / math.sqrt(_two_limb_double(vx) * _two_limb_double(vy))
            if vx > 0 and vy > 0
            else None
        )
        slope = _two_limb_double(num) / _two_limb_double(vx) if vx > 0 else None
        intercept = (
            (_two_limb_double(sy) - slope * _two_limb_double(sx))
            / _two_limb_double(n)
            if slope is not None
            else None
        )
        out.append((str(t), n, corr, slope, intercept))
    return (
        pd.DataFrame(
            out,
            columns=[
                "event_type",
                "n_events",
                "corr_hour_value",
                "slope_cents_per_hour",
                "intercept_cents",
            ],
        )
        .astype({"n_events": "int64"})
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def balance_band_intersect(
    sf_dir: str, num_partitions: int = 16
) -> "ray.data.Dataset | pd.DataFrame":
    """**INTERSECT DISTINCT over a composite key** (round 5, third batch):
    the (nationkey, $1000-acctbal-band) combinations that occur in BOTH the
    supplier and customer tables — completing the set-operation family next
    to ``nation_supplier_names``'s EXCEPT DISTINCT. The useful real-world
    shape: "which (segment, bucket) cells does every source cover", the
    coverage-matrix question asked before stratifying a joint sample.

    Scale shape: each side melts in ``map_batches`` to slim per-batch
    DISTINCT (key, side-bit) partials — the exchange carries at most
    2 x |distinct cells| x blocks rows, never the input — then ONE hash
    exchange on the composite key; each co-located group emits its key iff
    both side-bits are present. Band edges are bit-deterministic: both
    sides compute ``floor(x / 1000.0)`` with the same IEEE divide + floor,
    so a balance landing on an edge bands identically in Ray and DuckDB.
    """
    from html_parser_ray.pipelines.shuffle import hash_partitioned, sort_output

    def melt(col_nk: str, col_bal: str, side: int):
        def _m(df: pd.DataFrame) -> pd.DataFrame:
            band = np.floor(df[col_bal].to_numpy(dtype=np.float64) / 1000.0)
            out = pd.DataFrame(
                {
                    "nationkey": df[col_nk].to_numpy().astype(np.int64),
                    "band": band.astype(np.int64),
                    "side": np.int64(side),
                }
            )
            return out.drop_duplicates()  # per-batch distinct: slim partials

        return _m

    supplier = read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"]
    ).map_batches(melt("s_nationkey", "s_acctbal", 0), batch_format="pandas")
    customer = read_table(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_acctbal"]
    ).map_batches(melt("c_nationkey", "c_acctbal", 1), batch_format="pandas")

    out_schema = pa.schema([("nationkey", pa.int64()), ("band", pa.int64())])

    def both_sides(g: pd.DataFrame) -> pd.DataFrame:
        hit = g.groupby(["nationkey", "band"])["side"].nunique()
        keys = hit[hit == 2].index
        return pd.DataFrame(
            {
                "nationkey": [k[0] for k in keys],
                "band": [k[1] for k in keys],
            },
            dtype="int64",
        )

    inter = hash_partitioned(
        supplier.union(customer),
        ["nationkey", "band"],
        both_sides,
        num_partitions,
        out_schema=out_schema,
    )
    return sort_output(inter, ["nationkey", "band"], out_schema)
