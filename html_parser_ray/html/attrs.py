"""Functional attribute parsing over the raw tag byte region.

The reference parses attributes lazily and *destructively* (NUL-marker wire
format, ref: src/html/attr_inline.zig:29-103, 336-450). This engine scans the
same byte region functionally: attribute names are runs of identifier chars,
values follow ``=`` (quoted / naked / empty), everything else is a boolean
attribute. Values entity-decode on read. First matching name wins.

Scan-state quirks preserved from the reference:
- a ``>`` or ``/`` byte in name position ends the scan
  (ref: src/html/attr_inline.zig:49-50);
- naked values terminate at whitespace, ``>`` or ``/`` — so an unquoted URL
  value stops at its first slash (ref: src/html/attr_inline.zig:323-327);
- whitespace may precede a quoted/naked value after ``=``
  (ref: src/html/attr_inline.zig:305-306);
- an unterminated quoted value runs to the end of the tag region.
"""

from __future__ import annotations

from html_parser_ray.html import entities
from html_parser_ray.html.tables import IDENT_CHAR_SET, WHITESPACE_SET, skip_ws


def iter_attrs(source: bytes, start: int, end: int):
    """Yield ``(name_bytes, value_bytes_or_None, value_raw_span)`` over the
    attr region ``source[start:end]``.

    ``value`` is the *raw* (undecoded) value bytes, or None for boolean
    attributes. Callers decode on demand.
    """
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
            yield name, None
            return
        delim = source[i]
        if delim == 0x3D:  # '='
            # value: skip ws, then quoted / naked / empty
            j = skip_ws(source, i + 1, end)
            if j >= end:
                yield name, b""
                return
            vc = source[j]
            if vc == 0x3E or vc == 0x2F:
                yield name, b""
                i = j
                continue
            if vc == 0x27 or vc == 0x22:  # quote
                k = source.find(bytes((vc,)), j + 1, end)
                if k < 0:
                    yield name, source[j + 1 : end]
                    return
                yield name, source[j + 1 : k]
                i = k + 1
                continue
            k = j
            while k < end:
                b = source[k]
                if b == 0x3E or b == 0x2F or b in WHITESPACE_SET:
                    break
                k += 1
            if k == j:
                yield name, b""
            else:
                yield name, source[j:k]
            i = k
            continue
        if delim == 0x3E or delim == 0x2F:
            yield name, None
            return
        # whitespace or any other byte: boolean attribute
        yield name, None
        i += 1


def get_attr_value(source: bytes, start: int, end: int, name: bytes) -> bytes | None:
    """Decoded value of the first attribute matching ``name``
    (ASCII case-insensitive; ref: src/html/attr_inline.zig:35-103).

    Boolean attributes return ``b""`` (present, empty), absent returns None.
    """
    want = name.lower()
    for attr_name, raw in iter_attrs(source, start, end):
        if attr_name.lower() == want:
            if raw is None or not raw:
                return b""
            return entities.decode(raw)
    return None


def collect_attrs(source: bytes, start: int, end: int) -> dict[bytes, bytes]:
    """All attributes as a dict (first occurrence wins), values decoded.

    One-pass analog of collectSelectedValues (ref:
    src/html/attr_inline.zig:106-185) generalized to every attribute; used by
    the matcher's per-node memo.
    """
    out: dict[bytes, bytes] = {}
    for attr_name, raw in iter_attrs(source, start, end):
        key = attr_name.lower()
        if key in out:
            continue
        out[key] = entities.decode(raw) if raw else b""
    return out
