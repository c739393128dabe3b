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

GOLDEN = "ffd9af70964deaf03a26781556d5b129808250235474bb6beca3de2b97e5a9fa"


def test_extraction_golden_hash():
    rows = generate_documents(100, seed=42).to_pylist()
    ex = SpanExtractor()
    h = hashlib.sha256()
    for r in rows:
        out = ex.extract_document(r["spans"])
        h.update(r["doc_id"].encode())
        h.update(json.dumps(out, sort_keys=True, ensure_ascii=False).encode())
    assert h.hexdigest() == GOLDEN
