"""Ray Data stages for span extraction.

``ExtractSpansBatch`` is a callable CLASS for
``ds.map_batches(ExtractSpansBatch, batch_format="pyarrow", concurrency=N)``:
expensive setup (selector cache, heuristic tables, layout model) happens once
per actor in ``__init__``; ``__call__`` processes one Arrow batch. HTML parsing
is inherently per-document, so the per-row loop lives inside the actor over a
zero-copy Arrow batch; everything batch-shaped (schema assembly, offsets) stays
in Arrow.
"""

from __future__ import annotations

import pyarrow as pa

from html_parser_ray.extract.boilerplate import ExtractConfig
from html_parser_ray.extract.extractor import SpanExtractor
from html_parser_ray.sources.corpus import SPAN_STRUCT

OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans_out", pa.list_(SPAN_STRUCT)),
    ]
)

METRICS_STRUCT = pa.struct(
    [
        ("spans_in", pa.int32()),
        ("spans_out", pa.int32()),
        ("html_bytes", pa.int64()),
        ("parse_errors", pa.int32()),
    ]
)


class ExtractSpansBatch:
    """Actor-pool extraction stage (input_hint schema in, spans_out schema out).

    Parameters are plain values (passed via ``fn_constructor_kwargs``) so the
    actor constructs its own state — nothing heavy is captured in the closure.
    """

    def __init__(
        self,
        max_link_density: float = 0.5,
        min_text_len: int = 1,
        layout_model: str = "layout-stub-v0",
        drop_whitespace_text: bool = False,
        emit_metrics: bool = False,
    ) -> None:
        cfg = ExtractConfig(
            max_link_density=max_link_density, min_text_len=min_text_len
        )
        self.extractor = SpanExtractor(
            config=cfg,
            layout_model=layout_model,
            drop_whitespace_text=drop_whitespace_text,
        )
        self.emit_metrics = emit_metrics

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id")
        spans_col = batch.column("spans")
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        # columnar access: flatten the list<struct> once, slice per row by
        # offsets — avoids per-span dict materialization (to_pylist)
        flat = spans_col.flatten()
        in_kinds = flat.field("kind").to_pylist()
        # zero-copy string -> binary cast: the extractor is byte-oriented, so
        # hand it UTF-8 bytes directly instead of decoded Python strs
        in_texts = flat.field("text").cast(pa.binary()).to_pylist()
        in_media = flat.field("media_ref").to_pylist()
        offsets = spans_col.offsets.to_pylist()
        base = offsets[0]

        ex = self.extractor
        o_kind: list[str] = []
        o_text: list[str] = []
        o_media: list[str] = []
        o_off: list[int] = []
        out_offsets = [0]
        metrics: list[dict] = []
        for ri in range(len(spans_col)):
            lo, hi = offsets[ri] - base, offsets[ri + 1] - base
            before_in = ex.stats.spans_in
            before_err = ex.stats.parse_errors
            before_bytes = ex.stats.html_bytes
            k, t, m, o = ex.extract_columns(
                in_kinds[lo:hi], in_texts[lo:hi], in_media[lo:hi]
            )
            o_kind.extend(k)
            o_text.extend(t)
            o_media.extend(m)
            o_off.extend(o)
            out_offsets.append(len(o_kind))
            if self.emit_metrics:
                metrics.append(
                    {
                        "spans_in": ex.stats.spans_in - before_in,
                        "spans_out": len(k),
                        "html_bytes": ex.stats.html_bytes - before_bytes,
                        "parse_errors": ex.stats.parse_errors - before_err,
                    }
                )

        # output texts are UTF-8 bytes; cast binary -> string validates UTF-8
        # at C speed (inputs are Arrow strings, so this cannot fail for them;
        # entity decode only emits valid UTF-8 scalars)
        text_arr = pa.array(o_text, type=pa.binary()).cast(pa.string())
        struct_arr = pa.StructArray.from_arrays(
            [
                pa.array(o_kind, type=pa.string()),
                text_arr,
                pa.array(o_media, type=pa.string()),
                pa.array(o_off, type=pa.int32()),
            ],
            fields=list(SPAN_STRUCT),
        )
        spans_out = pa.ListArray.from_arrays(
            pa.array(out_offsets, type=pa.int32()), struct_arr
        )
        cols = {"doc_id": doc_ids, "spans_out": spans_out}
        if self.emit_metrics:
            cols["metrics"] = pa.array(metrics, type=METRICS_STRUCT)
        return pa.table(cols)


class ExtractFragmentsBatch(ExtractSpansBatch):
    """Same extraction over split fragments: passes the fragment bookkeeping
    columns (``frag_seq``, ``n_frags``) through for ordered reassembly."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        out = super().__call__(
            batch.select(["doc_id", "spans"])
        )
        for name in ("frag_seq", "n_frags"):
            out = out.append_column(name, batch.column(name))
        return out
