"""The flagship extraction pipeline: interleaved corpus -> ordered span table.

Dataset-level composition (no raw Ray tasks anywhere):

    read (parquet/lance)                      # streaming blocks
      -> [optional] flat_map-style split       # span-boundary fragments
      -> map_batches(ExtractSpansBatch, ...)   # actor pool, zero-copy Arrow
      -> [optional] groupby(doc_id) reassemble # only shuffle, output-sized
      -> write_parquet / caller consumption

Default path has ZERO shuffles: one streaming actor-pool transform. The split
path trades one hash shuffle of the (much smaller) extracted output for
straggler-free handling of multi-MB documents; choose it when the corpus has a
pathological giant-document tail.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

import ray.data

from html_parser_ray.stages.extract_stage import ExtractFragmentsBatch, ExtractSpansBatch
from html_parser_ray.stages.split import reassemble_group, split_batch


def _default_concurrency() -> int:
    """Actor-pool size for the CPU-bound extract stage: total CPUs minus a
    reserve for the read/write stages. Sizing the pool to ALL CPUs starves the
    upstream read tasks (actors hold their CPU for life) and can stall the
    whole pipeline — measured 10x wall-time degradation in local tests."""
    import os

    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 0)) if ray.is_initialized() else 0
    except Exception:
        cpus = 0
    # GRAFT_MAX_SLOTS caps the pool on hosts whose advertised CPUs exceed
    # the effective parallel units. Default 24 = the r5 steady-state sweep
    # optimum for THIS stage at 32 CPUs (bench.py run_extraction_bench:
    # html-only 350k docs/s at 24 slots vs 291k at the old ramp-regime 16;
    # past 24 the read stage starves) — the bench and the shipped pipeline
    # deliberately share one knob and one default so the recorded headline
    # is measured at the concurrency users actually get.
    cap = int(os.environ.get("GRAFT_MAX_SLOTS", "24"))
    return max(2, min(cpus - 2, cap))


def read_corpus(path: str, file_format: str = "parquet", **kwargs) -> "ray.data.Dataset":
    """Read the interleaved corpus. Lance when available (the production
    format per input_hint), parquet for the sandbox tests."""
    if file_format == "lance":
        return ray.data.read_lance(path, **kwargs)
    return ray.data.read_parquet(path, **kwargs)


def build_extraction_pipeline(
    ds: "ray.data.Dataset",
    *,
    split_giant_docs: bool = False,
    split_max_bytes: int = 1_000_000,
    split_max_spans: int = 64,
    concurrency: int | tuple[int, int] | None = None,
    # 256 = the r4 probe-calibrated throughput peak (BENCH/BASELINE.md §7:
    # 150-155k calibrated docs/s vs 116k at 512, 96-118k at 64-192)
    batch_size: int = 256,
    emit_metrics: bool = False,
    extractor_kwargs: dict[str, Any] | None = None,
    # >0 spawns that many LayoutCacheShard actors (stages/layout_cache.py)
    # so each distinct media_ref is PDF-decoded once cluster-wide instead of
    # once per extract actor (measured 3.3x fewer decodes on the bench
    # corpus — BENCH/BASELINE.md §11). Only meaningful with the real decode
    # branch on; ignored when layout_pdf_decode=False.
    shared_layout_cache: int = 0,
) -> "ray.data.Dataset":
    """Compose the extraction pipeline over an input Dataset.

    The default path is fully lazy (streaming). The split path executes the
    read+split+extract eagerly ONCE (``materialize()``) and pins the
    output-sized extracted table in the object store, so its two consumers
    (single-fragment passthrough, multi-fragment reassembly) don't each
    re-execute the extraction; the store spills if the output exceeds
    memory. ``emit_metrics`` is not supported on the split path (the column
    would be lost in reassembly) — it warns and drops the flag.
    """
    kwargs = dict(extractor_kwargs or {})
    kwargs["emit_metrics"] = emit_metrics
    if concurrency is None:
        concurrency = _default_concurrency()

    if shared_layout_cache > 0 and kwargs.get("layout_pdf_decode", True):
        from html_parser_ray.stages.layout_cache import create_layout_cache

        kwargs["layout_cache_shards"] = create_layout_cache(
            shared_layout_cache,
            model_name=kwargs.get("layout_model", "layout-stub-v0"),
        )

    if not split_giant_docs:
        return ds.map_batches(
            ExtractSpansBatch,
            fn_constructor_kwargs=kwargs,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    if emit_metrics:
        import warnings

        warnings.warn(
            "emit_metrics is not supported with split_giant_docs "
            "(the metrics column would be lost in reassembly); dropping it",
            stacklevel=2,
        )
    kwargs["emit_metrics"] = False
    frags = ds.map_batches(
        split_batch,
        fn_kwargs={"max_bytes": split_max_bytes, "max_spans": split_max_spans},
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    extracted = frags.map_batches(
        ExtractFragmentsBatch,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    ).materialize()
    # Only multi-fragment docs need the reassembly shuffle; single-fragment
    # rows (the overwhelming majority) pass straight through. materialize()
    # pins the extracted output once so the two consumers below don't
    # re-execute the extraction — output-sized, the same data the groupby
    # would otherwise shuffle in full.
    import pyarrow.compute as pc

    def singles_only(batch):
        out = batch.filter(pc.equal(batch.column("n_frags"), 1))
        return out.drop_columns(["frag_seq", "n_frags"])

    def multis_only(batch):
        return batch.filter(pc.greater(batch.column("n_frags"), 1))

    from html_parser_ray.stages.extract_stage import OUT_SCHEMA

    def normalize(batch: pa.Table) -> pa.Table:
        # map_groups emits 0-row 0-COLUMN blocks for group-less input
        # blocks (most multis blocks are empty — multi-frag docs are rare);
        # rewrite them to the typed empty so downstream join/union/to_pandas
        # consumers never see a schema-less block
        if batch.num_columns == 0:
            return OUT_SCHEMA.empty_table()
        return batch.select(OUT_SCHEMA.names).cast(OUT_SCHEMA)

    singles = extracted.map_batches(singles_only, batch_format="pyarrow")
    multis = (
        extracted.map_batches(multis_only, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(reassemble_group, batch_format="pyarrow")
        .map_batches(normalize, batch_format="pyarrow")
    )
    return singles.union(multis)


def run_extraction(
    input_path: str,
    output_path: str | None = None,
    file_format: str = "parquet",
    **pipeline_kwargs,
):
    """Read -> extract -> (optionally) write partitioned parquet; returns the
    lazy Dataset when no output path is given."""
    ds = read_corpus(input_path, file_format=file_format)
    out = build_extraction_pipeline(ds, **pipeline_kwargs)
    if output_path is not None:
        out.write_parquet(output_path)
        return None
    return out
