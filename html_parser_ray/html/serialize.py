"""HTML re-serialization of a parsed subtree.

Parity with the reference's raw-state serializer (ref: src/html/node.zig
174-187, 262-375): text nodes emit verbatim source bytes, elements emit
``<name`` + attributes + ``>``, children, and a close tag unless void. In this
functional engine attributes are never materialized in place, so the raw
branch (preserve original ``name=value`` text verbatim including quotes,
ref: src/html/node.zig:344-351) always applies; boolean attributes emit as
bare names.

Tag-name case parity: the reference lowercases only the first 8 bytes of a
tag name in place during the scan (ref: src/html/parser.zig:144-151), so its
serializer emits ``lower(first 8) + original tail``. This serializer
reconstructs exactly that from the name span — the round-1 "fully lowercased
>8-byte names" divergence is closed.
"""

from __future__ import annotations

from html_parser_ray.html.tables import IDENT_CHAR_SET, WHITESPACE_SET, skip_ws
from html_parser_ray.html.tokenizer import KIND_DOCUMENT, KIND_ELEMENT, KIND_TEXT
from html_parser_ray.html.tags import VOID_TAGS


def _write_attrs(out: bytearray, source: bytes, start: int, end: int) -> None:
    # ref: src/html/node.zig:313-375 (raw branch only; no NUL wire states)
    i = start
    while i < end:
        i = skip_ws(source, i, end)
        if i >= end:
            return
        c = source[i]
        if c == 0x3E or c == 0x2F:  # '>' '/'
            return
        name_start = i
        while i < end and source[i] in IDENT_CHAR_SET:
            i += 1
        if i == name_start:
            i += 1
            continue
        name = source[name_start:i]
        if i >= end:
            out += b" " + name
            return
        delim = source[i]
        if delim == 0x3D:  # '=' -> verbatim raw attribute text
            j = skip_ws(source, i + 1, end)
            if j >= end:
                out += b" " + source[name_start:j]
                return
            vc = source[j]
            if vc == 0x3E or vc == 0x2F:
                nxt = j
            elif vc in (0x27, 0x22):
                k = source.find(bytes((vc,)), j + 1, end)
                nxt = k + 1 if k >= 0 else end
            else:
                k = j
                while k < end:
                    b2 = source[k]
                    if b2 == 0x3E or b2 == 0x2F or b2 in WHITESPACE_SET:
                        break
                    k += 1
                nxt = k
            out += b" " + source[name_start:nxt]
            i = nxt
            continue
        if delim == 0x3E or delim == 0x2F:
            out += b" " + name
            return
        out += b" " + name
        i += 1


def write_node(doc, index: int, out: bytearray, self_only: bool = False) -> None:
    kind = doc.kind[index]
    if kind == KIND_TEXT:
        out += doc.source[doc.name_start[index] : doc.name_end[index]]
        return
    if kind == KIND_DOCUMENT:
        _write_children(doc, index, out)
        return
    name = doc.name[index]
    # reference-exact serialized name: the in-place parser lowercases only
    # the first min(8, len) name bytes (parser.zig:144-151), leaving any tail
    # case intact — reconstruct that from the span over immutable source
    raw = doc.source[doc.name_start[index] : doc.name_end[index]]
    ser_name = name if len(raw) <= 8 else raw[:8].lower() + raw[8:]
    out += b"<" + ser_name
    _write_attrs(out, doc.source, doc.name_end[index], doc.attr_end[index])
    out += b">"
    if name not in VOID_TAGS and not self_only:
        _write_children(doc, index, out)
        out += b"</" + ser_name + b">"


def _write_children(doc, parent_idx: int, out: bytearray) -> None:
    # ref: src/html/node.zig:297-311 — preorder walk with subtree jumps
    end = doc.subtree_end[parent_idx]
    idx = parent_idx + 1
    n = len(doc.kind)
    while idx <= end and idx < n:
        if doc.parent[idx] != parent_idx:
            idx += 1
            continue
        write_node(doc, idx, out)
        nxt = doc.subtree_end[idx] + 1
        idx = nxt if nxt > idx else idx + 1


def to_html(doc, index: int = 0) -> bytes:
    """Serialize node ``index`` (document root by default) and its subtree."""
    out = bytearray()
    write_node(doc, index, out)
    return bytes(out)
