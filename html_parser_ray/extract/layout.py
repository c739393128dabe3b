"""PDF / layout-parse branch for media spans.

A real deployment loads a layout model (PDF parser, OCR, layout transformer)
once per actor and runs it per media_ref. Those libraries are not in this
container, so the decode step is STUBBED behind a deterministic fake; the
Ray-side plumbing (actor state, batch signature, output schema) is real and
tested. Swap ``LayoutParser.parse`` for a real implementation without touching
the pipeline.
"""

from __future__ import annotations

import hashlib


class LayoutParser:
    """Load-once layout parser state (classic actor-pool ``__init__`` state).

    ``model_name`` stands in for a model checkpoint path; construction is the
    expensive step a map_batches actor performs once.
    """

    def __init__(self, model_name: str = "layout-stub-v0") -> None:
        self.model_name = model_name
        # deterministic stub "model": a keyed hash
        self._key = hashlib.sha256(model_name.encode()).digest()[:8]

    def parse(self, media_ref: str) -> dict:
        """STUB: returns deterministic fake layout metadata for ``media_ref``.

        A real implementation would fetch the blob and run PDF/layout parsing.
        """
        h = hashlib.sha256(self._key + media_ref.encode()).hexdigest()
        return {
            "media_ref": media_ref,
            "layout_model": self.model_name,
            "layout_fingerprint": h[:16],
            "num_pages": (int(h[:4], 16) % 32) + 1,
        }
