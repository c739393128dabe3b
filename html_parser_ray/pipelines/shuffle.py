"""Distributed shuffle primitives shared by the dedup / windowed pipelines.

The core pattern is **hash-partition + per-partition vectorized combine**:
rows get a low-cardinality ``part = hash(keys) % P`` column inside
``map_batches``, then ``groupby("part").map_groups(fn)`` co-locates each
partition and runs one *vectorized* pandas combine per partition. This keeps
every combine distributed (the driver never materializes data) while avoiding
the two Ray Data groupby failure modes measured on this corpus:

- direct ``groupby(high-cardinality key)`` → sort-based shuffle over every
  distinct key (55.5s vs 0.3s for the partitioned form on 200k rows, 16 parts);
- ``map_groups`` over tiny per-key groups → one Python dispatch per group.

At cluster scale P should be ≈ 2-4× total cores; each partition must fit one
worker's heap (the combine input is the partial rows, already shrunk by any
per-batch pre-aggregation).
"""

from __future__ import annotations

import os
from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

DEFAULT_PARTITIONS = 16


class _EmptyBlockSchemaWarningFilter:
    """Drop Ray's cosmetic "RefBundle with a different schema" warning for
    EMPTY blocks only (``names=[], types=[]`` / ``new schema: None``).

    Ray's sort-based shuffle materializes empty ranges as 0-row 0-COLUMN
    pandas blocks *inside* the sort/map_groups operators, and the executor
    warns on every such bundle. No user code can prevent it: map_groups
    never calls the UDF for an empty block (pinned by
    tests/test_round5_directives.py::test_map_groups_skips_empty_blocks),
    so "return a typed empty frame from the partial" cannot fire, and a
    downstream ``map_batches`` normalizer runs only AFTER the warning was
    already emitted. Every consumer edge in this repo normalizes the empty
    blocks themselves (``_schema_normalizer`` / ``sort_output``); the
    warning is noise for a handled condition. Genuine schema divergences
    (two non-empty schemas disagreeing) still warn.
    """

    def filter(self, record) -> bool:  # logging.Filter protocol
        msg = record.getMessage()
        if "different schema than the previous one" not in msg:
            return True
        return not (
            "names=[], types=[]" in msg
            or "new schema: None" in msg
            # a zero-column arrow schema renders as the empty string, so the
            # message reads "... new schema: . This may lead ..."
            or "new schema: ." in msg
        )


def _install_empty_block_warning_filter() -> None:
    import logging

    logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    )
    if not any(
        isinstance(f, _EmptyBlockSchemaWarningFilter) for f in logger.filters
    ):
        logger.addFilter(_EmptyBlockSchemaWarningFilter())


_install_empty_block_warning_filter()


def read_blocks(
    path: str, min_blocks: int = 8, target_block_bytes: int = 64 << 20
) -> int:
    """Size-aware read parallelism (``override_num_blocks`` for the read).

    Ray's groupby/sort exchange cost scales with the INPUT BLOCK COUNT, not
    the data size (measured: 64 blocks -> 1.2-1.6s per exchange, 16 blocks ->
    0.3-0.5s, for the same 160k tiny rows) — the default reader splits small
    parquet files into ~64 blocks and every downstream exchange pays per-block
    sampling/sort/scheduling overhead. Pick the block count from the actual
    file bytes instead: one block per ``target_block_bytes`` (64 MB of
    parquet ≈ a few hundred MB in memory), floored at ``min_blocks`` so small
    inputs still use the pool. At 100 TB this returns the same many-blocks
    answer as the default; at verification scale it cuts the fixed exchange
    cost ~4x. The floor moved 16 -> 8 in round 5 after an interleaved A/B at
    32 CPUs (simhash 1.46-1.57 -> 1.22-1.48s, revenue_bucketed 1.07-1.18 ->
    0.88-0.95s, q1 0.46 -> 0.41-0.45s, nothing slower): these inputs are
    exchange-bound, not read-bound, so fewer blocks = less per-block
    sampling/scheduling overhead with no read-parallelism cost.
    """
    import glob
    import os

    paths = [path]
    if os.path.isdir(path):
        paths = glob.glob(os.path.join(path, "*.parquet")) or glob.glob(
            os.path.join(path, "**", "*.parquet"), recursive=True
        )
    if not paths:
        # unknown layout (hive dirs, non-.parquet suffixes): read_parquet can
        # still read it, but we can't size it — let Ray pick the block count
        # rather than pinning a huge input at min_blocks
        return None
    try:
        total = sum(os.path.getsize(p) for p in paths)
    except OSError:
        return min_blocks
    return int(max(min_blocks, -(-total // target_block_bytes)))


def read_table(
    path: str, columns: list[str] | None = None, min_blocks: int = 8
) -> "ray.data.Dataset":
    """``read_parquet`` with size-aware block count (see ``read_blocks``) —
    use for any read that feeds a hash-partitioned exchange."""
    nb = read_blocks(path, min_blocks)
    if nb is None:
        return ray.data.read_parquet(path, columns=columns)
    return ray.data.read_parquet(path, columns=columns, override_num_blocks=nb)


def parquet_column_min_max(path: str, col: str):
    """(min, max) of ``col`` across a parquet file or directory, read from
    ROW-GROUP STATISTICS only (footer metadata — no row bytes touched).
    Returns ``(None, None)`` when any row group lacks min/max stats, so
    callers can fall back to a distributed aggregate."""
    import glob
    import os

    import pyarrow.parquet as pq

    paths = (
        glob.glob(os.path.join(path, "*.parquet")) if os.path.isdir(path) else [path]
    )
    lo = hi = None
    for p in paths:
        md = pq.ParquetFile(p).metadata
        if col not in md.schema.names:
            # documented contract: degrade to the caller's distributed
            # aggregate rather than dying in footer reading
            return None, None
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return None, None
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    return lo, hi


def join_partitions(requested: int | None = None) -> int:
    """Partition count for ``Dataset.join``: the hash-shuffle aggregator pool
    holds one actor per partition, so a count above the session's CPUs
    deadlocks scheduling on small clusters (observed: 16 partitions on a
    4-CPU pytest session hang forever). Cap at the CPU count."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 0)) if ray.is_initialized() else 0
    except Exception:
        cpus = 0
    cap = max(2, cpus or 2)
    return min(requested or DEFAULT_PARTITIONS, cap)


def with_part(df: pd.DataFrame, key_cols: list[str], num_partitions: int) -> pd.DataFrame:
    """Add the deterministic hash-partition column (stable across processes:
    ``hash_pandas_object`` uses a fixed hash key, no PYTHONHASHSEED)."""
    if "part" in df.columns:
        # the bookkeeping column is reserved: assign() would silently
        # clobber a business column and _run would strip it — fail loudly
        raise ValueError(
            "hash_partitioned input already has a 'part' column (reserved "
            "for the exchange bookkeeping); rename it before partitioning"
        )
    h = pd.util.hash_pandas_object(df[key_cols], index=False)
    return df.assign(part=(h % num_partitions).astype("int64"))


def hash_partitioned(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_partitions: int = DEFAULT_PARTITIONS,
    out_schema: "pa.Schema | None" = None,
) -> "ray.data.Dataset":
    """Apply ``fn`` once per hash partition of ``key_cols`` (all rows sharing
    a key value are guaranteed co-located in one call). ``fn`` receives and
    returns pandas; the bookkeeping ``part`` column is stripped before ``fn``.

    ``out_schema``: pass the pyarrow schema of ``fn``'s output when the result
    feeds ``Dataset.join``/``union`` — Ray's ``map_groups`` machinery emits
    0-row 0-COLUMN blocks for group-less input blocks, and the join
    aggregator's block builder cannot unify those with real blocks
    ("No match ... FieldRef" inside pyarrow). The normalizer rewrites empty
    blocks to typed empties and casts real ones (metadata-only, zero-copy).
    """

    def _add(df: pd.DataFrame) -> pd.DataFrame:
        return with_part(df, key_cols, num_partitions)

    def _run(g: pd.DataFrame) -> pd.DataFrame:
        # reset_index: a filtered/deduped frame keeps its original index, and
        # pandas->Arrow conversion of a non-default index can add a phantom
        # __index_level_0__ column on non-empty blocks (schema drift)
        return fn(g.drop(columns=["part"])).reset_index(drop=True)

    out = (
        ds.map_batches(_add, batch_format="pandas")
        .groupby("part")
        .map_groups(_run, batch_format="pandas")
    )
    if out_schema is not None:
        out = out.map_batches(_schema_normalizer(out_schema), batch_format="pyarrow")
    return out


def _schema_normalizer(out_schema: "pa.Schema"):
    import pyarrow as pa

    empty = out_schema.empty_table()

    def norm(t: "pa.Table") -> "pa.Table":
        if t.num_columns == 0:
            return empty
        return t.select(out_schema.names).cast(out_schema)

    return norm


def partitioned_lookup(
    left: "ray.data.Dataset",
    key_col: str,
    right: "ray.data.Dataset",
    right_key: str,
    value_col: str,
    new_col: str,
    num_partitions: int = DEFAULT_PARTITIONS,
    left_prep: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
) -> "ray.data.Dataset":
    """Distributed inner lookup-join: attach ``right[value_col]`` to ``left``
    rows by key, built from union + hash-partitioned per-partition merge.
    ``left_prep`` runs on the co-located left rows before the probe (e.g. a
    drop_duplicates whose subset is co-located by the key — fusing a distinct
    pass into the lookup's shuffle instead of paying its own barrier).

    Both sides hash-partition by their key (union co-locates them), then one
    vectorized pandas map per partition builds the dict from the (unique-key)
    right rows and probes with the left rows. Left rows without a match drop
    (inner semantics). This costs one task-based sort shuffle — measured ~5x
    cheaper than ``Dataset.join`` at small-result scale, where the join's
    per-partition aggregator ACTOR pool startup dominates (5-7s per join for
    256-row joins at 32 CPUs).

    Both union branches emit IDENTICAL column sets (typed sentinel fills for
    the other side's columns): a mixed-column union NaN-fills at the
    exchange's concat and silently upcasts int64 to float64, corrupting ids
    and exact-cents columns above 2^53 — the normal id domain for 64-bit
    hash keys at web scale.
    """
    import pyarrow as pa

    def _typed_empty(ds: "ray.data.Dataset") -> pd.DataFrame:
        sch = ds.schema()
        base = getattr(sch, "base_schema", sch)
        if isinstance(base, pa.Schema):
            return base.empty_table().to_pandas()
        return pd.DataFrame(
            {n: pd.Series(dtype=t) for n, t in zip(base.names, base.types)}
        )

    l_tmpl = _typed_empty(left)
    for reserved in ("__key", "__feat"):
        if reserved in l_tmpl.columns:
            raise ValueError(
                f"partitioned_lookup: left input has a {reserved!r} column "
                "(reserved for the exchange bookkeeping); rename it first"
            )
    v_dtype = _typed_empty(right)[value_col].dtype
    left_cols = [c for c in l_tmpl.columns if c != new_col]
    l_dtypes = l_tmpl.dtypes

    def _fill(n: int, dtype) -> np.ndarray:
        if dtype == object:
            return np.full(n, "", dtype=object)
        return np.zeros(n, dtype)

    # __key MUST be one dtype on both sides: hash_pandas_object hashes the
    # raw representation, so int64(101) and float64(101.0) land in different
    # partitions
    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = {c: df[c] for c in left_cols}
        out[new_col] = _fill(len(df), v_dtype)
        out["__key"] = df[key_col].astype("int64")
        out["__feat"] = np.uint8(0)
        return pd.DataFrame(out)

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        out = {c: _fill(n, l_dtypes[c]) for c in left_cols}
        out[new_col] = df[value_col].to_numpy()
        out["__key"] = df[right_key].astype("int64").to_numpy()
        out["__feat"] = np.full(n, 1, dtype=np.uint8)
        return pd.DataFrame(out)

    u = left.map_batches(tag_left, batch_format="pandas").union(
        right.map_batches(tag_right, batch_format="pandas")
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if "__feat" in g.columns:
            fm = g["__feat"] == 1
        else:
            fm = pd.Series(False, index=g.index)
        feats = g[fm]
        lhs = g[~fm].drop(columns=["__feat"], errors="ignore")
        # columns that belong to the left side: everything the right tag
        # didn't introduce
        lhs = lhs.drop(columns=[new_col], errors="ignore")
        if left_prep is not None:
            lhs = left_prep(lhs)
        if len(feats) and feats["__key"].duplicated().any():
            # the docstring's (unique-key) contract — last-wins would return
            # silently unstable results under block arrival order
            raise ValueError(
                "partitioned_lookup: duplicate right-side keys (the right "
                "table must be unique on its key; drop_duplicates it first)"
            )
        mapping = dict(zip(feats["__key"], feats[new_col])) if len(feats) else {}
        # inner semantics by KEY MEMBERSHIP, not value-notna: a matched right
        # row whose value is NULL keeps its left rows (as SQL would)
        lhs = lhs[lhs["__key"].isin(mapping)]
        lhs = lhs.assign(**{new_col: lhs["__key"].map(mapping)})
        return lhs.drop(columns=["__key"])

    return hash_partitioned(u, ["__key"], merge, num_partitions)


def sort_output(
    ds: "ray.data.Dataset",
    keys: list[str],
    out_schema: "pa.Schema",
    small_limit: int = 200_000,
):
    """Deterministic ordering + schema guarantee for a RESULT dataset.

    Ray's ``Dataset.sort`` pays ~2.6s of boundary-sampling/merge machinery
    regardless of size — absurd for an output-sized pair list. Materialize
    (results are output-sized by construction), then: empty -> typed
    zero-row pandas frame (``Dataset.to_pandas()`` of ANY empty dataset
    yields a 0-column frame, so a Dataset cannot represent the empty result
    faithfully — callers must accept ``Dataset | DataFrame``); small ->
    pull the output-sized frame and sort it driver-side (ONE dataset
    execution; the former repartition(1)+map_batches form paid a second
    full execution, ~1s of fixed cost per query); genuinely large -> the
    real distributed sort.

    ``GRAFT_SORT_SMALL_LIMIT`` (env) overrides ``small_limit`` at call
    time. This is the corpus-scaled-result tripwire's lever
    (tests/test_entry_contract.py): setting it to 0 forces EVERY result
    through the distributed-sort large path, proving each per-row-output
    query (a) returns a Dataset at the harness boundary — nothing
    downstream assumes a DataFrame — and (b) produces the identical
    ordered table on the scale path as on the driver-pull path."""
    env = os.environ.get("GRAFT_SORT_SMALL_LIMIT")
    if env is not None:
        try:
            small_limit = int(env)
        except ValueError:
            pass  # a garbage override must not take down the query
    m = ds.materialize()
    n = m.count()
    if n == 0:
        return out_schema.empty_table().to_pandas()
    if n <= small_limit:
        tbl = pa.Table.from_pandas(m.to_pandas(), preserve_index=False)
        tbl = tbl.select(out_schema.names).cast(out_schema)
        return tbl.to_pandas().sort_values(keys).reset_index(drop=True)
    # large path: the same schema guarantee as the small path — normalize
    # empty/upcast blocks (map_groups emits 0-column blocks for empty sort
    # ranges) BEFORE the distributed sort sees them
    return m.map_batches(
        _schema_normalizer(out_schema), batch_format="pyarrow"
    ).sort(keys)


def distinct_rows(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    num_partitions: int = DEFAULT_PARTITIONS,
    out_schema: "pa.Schema | None" = None,
) -> "ray.data.Dataset":
    """Distributed DISTINCT over ``key_cols`` (exact: co-partitioned drop_duplicates)."""
    return hash_partitioned(
        ds,
        key_cols,
        lambda g: g.drop_duplicates(subset=key_cols),
        num_partitions,
        out_schema=out_schema,
    )
