"""Extraction metrics rollup — the distributed analog of the reference's
ParseInstrumentationStats (ref: src/debug/instrumentation.zig:19-50) rolled up
per partition instead of per call.

The extract stage (``emit_metrics=True``) attaches a per-document metrics
struct; this module reduces it batch-locally (combiner pattern) and returns
one totals row plus optional per-partition rows keyed by the checkpoint
partitioner.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def rollup_metrics(extracted, by_partition: int | None = None):
    """Aggregate the ``metrics`` column of an extraction output Dataset.

    Returns a pyarrow Table: one row of totals (``partition_id = -1``) or one
    row per partition when ``by_partition`` (a partition count) is given.
    """
    from html_parser_ray.state.checkpoint import partition_of

    def partial(batch: pa.Table) -> pa.Table:
        m = batch.column("metrics")
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        fields = {
            name: m.field(name)
            for name in ("spans_in", "spans_out", "html_bytes", "parse_errors")
        }
        if by_partition:
            parts = [
                partition_of(d, by_partition)
                for d in batch.column("doc_id").to_pylist()
            ]
        else:
            parts = [-1] * batch.num_rows
        import collections

        acc: dict[int, list[int]] = collections.defaultdict(lambda: [0, 0, 0, 0, 0])
        spans_in = fields["spans_in"].to_pylist()
        spans_out = fields["spans_out"].to_pylist()
        html_bytes = fields["html_bytes"].to_pylist()
        errs = fields["parse_errors"].to_pylist()
        for p, si, so, hb, er in zip(parts, spans_in, spans_out, html_bytes, errs):
            a = acc[p]
            a[0] += 1
            a[1] += si or 0
            a[2] += so or 0
            a[3] += hb or 0
            a[4] += er or 0
        keys = sorted(acc)
        return pa.table(
            {
                "partition_id": pa.array(keys, type=pa.int32()),
                "docs": pa.array([acc[k][0] for k in keys], type=pa.int64()),
                "spans_in": pa.array([acc[k][1] for k in keys], type=pa.int64()),
                "spans_out": pa.array([acc[k][2] for k in keys], type=pa.int64()),
                "html_bytes": pa.array([acc[k][3] for k in keys], type=pa.int64()),
                "parse_errors": pa.array([acc[k][4] for k in keys], type=pa.int64()),
            }
        )

    partials = extracted.map_batches(partial, batch_format="pyarrow")
    combined: dict[int, list[int]] = {}
    for batch in partials.iter_batches(batch_format="pyarrow", batch_size=4096):
        for row in batch.to_pylist():
            a = combined.setdefault(row["partition_id"], [0, 0, 0, 0, 0])
            a[0] += row["docs"]
            a[1] += row["spans_in"]
            a[2] += row["spans_out"]
            a[3] += row["html_bytes"]
            a[4] += row["parse_errors"]
    keys = sorted(combined)
    return pa.table(
        {
            "partition_id": pa.array(keys, type=pa.int32()),
            "docs": pa.array([combined[k][0] for k in keys], type=pa.int64()),
            "spans_in": pa.array([combined[k][1] for k in keys], type=pa.int64()),
            "spans_out": pa.array([combined[k][2] for k in keys], type=pa.int64()),
            "html_bytes": pa.array([combined[k][3] for k in keys], type=pa.int64()),
            "parse_errors": pa.array([combined[k][4] for k in keys], type=pa.int64()),
        }
    )
