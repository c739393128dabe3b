"""Per-document span extraction: interleaved input spans -> ordered output spans.

Input row shape (BASELINE.json input_hint):
``doc_id: str, spans: list[{kind, text, media_ref, offset}]`` with
``kind in {"text", "html", "media"}``.

Output row: ``doc_id, spans_out: list[{kind, text, media_ref, offset}]`` where
- ``text`` spans pass through with whitespace-normalized text;
- ``html`` spans tokenize + parse + boilerplate-strip into one output span per
  kept text block, text equal to the reference-semantics normalized innerText;
- ``media`` spans route through the layout branch (stubbed) and pass their
  media_ref through with layout metadata as text.

Output ``offset`` renumbers 0..k-1 in document order (input order of spans,
block order within an html span) — the per-row invariant the north rule pins.
"""

from __future__ import annotations

from dataclasses import dataclass
import json

from html_parser_ray.extract.boilerplate import ExtractConfig, extract_text_blocks
from html_parser_ray.extract.fused import extract_blocks_fused
from html_parser_ray.extract.layout import LayoutParser
from html_parser_ray.html.document import parse_html
from html_parser_ray.html.text import normalize_bytes


@dataclass
class ExtractStats:
    docs: int = 0
    spans_in: int = 0
    spans_out: int = 0
    html_bytes: int = 0
    parse_errors: int = 0
    # batches where the native batched path raised and the stage degraded to
    # the Python path — a perf cliff that must stay observable, not silent
    native_fallbacks: int = 0


class SpanExtractor:
    """Stateful per-document extractor: selector cache, heuristic config and
    the layout parser live for the actor's lifetime (ref analog:
    cached-selector API src/html/document.zig:366-368 + §2.5 actor state)."""

    def __init__(
        self,
        config: ExtractConfig | None = None,
        layout_model: str = "layout-stub-v0",
        drop_whitespace_text: bool = False,
        use_fused: bool = True,
        layout_pdf_decode: bool = True,
        layout_memo: bool = True,
    ) -> None:
        self.config = config or ExtractConfig()
        self.layout = LayoutParser(
            layout_model, pdf_decode=layout_pdf_decode, memo=layout_memo
        )
        self.drop_whitespace_text = drop_whitespace_text
        # fused single-pass tokenize+strip (~1.35x) — byte-identical to the
        # DOM path (tests/test_fused_parity.py); DOM path kept as the oracle
        self.use_fused = use_fused
        # native C fast path (another ~5x per core): only for the DEFAULT
        # config; byte-parity pinned by tests/test_native_parity.py; any
        # unavailability (no compiler) silently keeps the Python fused path
        self._native = None
        if use_fused and self.config == ExtractConfig():
            from html_parser_ray.native import get_native_extractor

            self._native = get_native_extractor()
        self.stats = ExtractStats()

    def extract_columns(
        self, kinds: list[str], texts: list[bytes], media_refs: list[str]
    ) -> tuple[list[str], list[bytes], list[str], list[int]]:
        """Columnar fast path: one document's parallel input span columns in,
        parallel output columns (kind, text_bytes, media_ref, offset) out.

        ``texts`` are UTF-8 BYTES (Arrow's native string representation cast
        to binary upstream) — the engine is byte-oriented throughout, so no
        str round-trip happens on the hot path. Output texts are UTF-8 bytes
        too; the batch stage casts back to an Arrow string column.
        """
        st = self.stats
        st.docs += 1
        st.spans_in += len(kinds)
        o_kind: list[str] = []
        o_text: list[bytes] = []
        o_media: list[str] = []
        for kind, text, media_ref in zip(kinds, texts, media_refs):
            if kind == "text":
                norm = normalize_bytes(text or b"")
                if norm:
                    o_kind.append("text")
                    o_text.append(norm)
                    o_media.append("")
            elif kind == "html":
                raw = text or b""
                st.html_bytes += len(raw)
                try:
                    blocks = None
                    if self._native is not None:
                        blocks = self._native(raw, self.drop_whitespace_text)
                    if blocks is None:
                        if self.use_fused:
                            blocks = extract_blocks_fused(
                                raw, self.config, self.drop_whitespace_text
                            )
                        else:
                            doc = parse_html(raw, self.drop_whitespace_text)
                            blocks = extract_text_blocks(doc, self.config)
                except Exception:
                    st.parse_errors += 1
                    blocks = []
                for blk in blocks:
                    o_kind.append("text")
                    o_text.append(blk)
                    o_media.append("")
            elif kind == "media":
                ref = media_ref or ""
                meta = self.layout.parse(ref)
                o_kind.append("media")
                o_text.append(json.dumps(meta, sort_keys=True).encode("utf-8"))
                o_media.append(ref)
            # unknown kinds are dropped deterministically
        st.spans_out += len(o_kind)
        return o_kind, o_text, o_media, list(range(len(o_kind)))

    def extract_document(self, spans: list[dict]) -> list[dict]:
        """Ordered output span list for one document's input span list
        (row-oriented convenience wrapper over the columnar path)."""
        spans = spans or []
        k, t, m, o = self.extract_columns(
            [s["kind"] for s in spans],
            [(s.get("text") or "").encode("utf-8") for s in spans],
            [s.get("media_ref") or "" for s in spans],
        )
        return [
            {"kind": kk, "text": tt.decode("utf-8", "replace"), "media_ref": mm, "offset": oo}
            for kk, tt, mm, oo in zip(k, t, m, o)
        ]
