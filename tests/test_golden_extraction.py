"""Golden regression pin: the extraction semantics over the pinned synthetic
corpus (seed 42, 100 docs) must stay byte-stable across rounds.

If an intentional semantic change lands (new boilerplate heuristics, different
normalization), recompute the hash with the snippet in this docstring and
update GOLDEN alongside the change — never silently.

    import hashlib, json
    from html_parser_ray.sources.corpus import generate_documents
    from html_parser_ray.extract.extractor import SpanExtractor
    rows = generate_documents(100, seed=42).to_pylist()
    ex = SpanExtractor(); h = hashlib.sha256()
    for r in rows:
        out = ex.extract_document(r["spans"])
        h.update(r["doc_id"].encode())
        h.update(json.dumps(out, sort_keys=True, ensure_ascii=False).encode())
    print(h.hexdigest())
"""

from __future__ import annotations

import hashlib
import json

from html_parser_ray.extract.extractor import SpanExtractor
from html_parser_ray.sources.corpus import generate_documents

# round 3: media spans now carry REAL PDF layout metadata (num_pages /
# n_text_spans / n_rects / text_chars from the byte-level parse in
# functions/pdfcodec.py) instead of the keyed-hash stub; the synth blob
# store assembles from a cached template pool (fetch is I/O in production,
# so the stand-in must be cheap) — deliberate semantics changes, hash
# recomputed with the docstring snippet
GOLDEN = "7a8fc0687749f51e88349983c1c47eeba4c0ef986999ed61b677b041fc96b309"


def test_extraction_golden_hash():
    rows = generate_documents(100, seed=42).to_pylist()
    ex = SpanExtractor()
    h = hashlib.sha256()
    for r in rows:
        out = ex.extract_document(r["spans"])
        h.update(r["doc_id"].encode())
        h.update(json.dumps(out, sort_keys=True, ensure_ascii=False).encode())
    assert h.hexdigest() == GOLDEN
