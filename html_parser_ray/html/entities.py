"""HTML entity decoding with the reference's deliberately small entity set.

Only five named entities (``amp lt gt quot apos``) and numeric references
(``&#dd;`` / ``&#xhh;``, capped at U+10FFFF) decode; anything else — unknown
names, unterminated references, overlong numbers, surrogate codepoints — passes
through verbatim (ref: src/html/entities.zig:75-136).
"""

from __future__ import annotations

_NAMED = {
    b"amp;": (5, b"&"),
    b"lt;": (4, b"<"),
    b"gt;": (4, b">"),
    b"quot;": (6, b'"'),
    b"apos;": (6, b"'"),
}

_HEX_DIGITS = frozenset(b"0123456789abcdefABCDEF")
_DEC_DIGITS = frozenset(b"0123456789")


def decode_entity_prefix(buf: bytes, i: int) -> tuple[int, bytes] | None:
    """Try to decode one entity at ``buf[i]`` (which must be ``&``).

    Returns ``(consumed, decoded_bytes)`` or None when the prefix is not a
    valid entity (ref: src/html/entities.zig:75-91; requires >= 4 bytes
    remaining, so e.g. a trailing ``&lt`` without ``;`` passes through).
    """
    n = len(buf)
    if n - i < 4 or buf[i] != 0x26:  # '&'
        return None
    nxt = buf[i + 1]
    if nxt == 0x23:  # '#'
        return _decode_numeric(buf, i)
    for name, (consumed, out) in _NAMED.items():
        if buf.startswith(name, i + 1):
            return consumed, out
    return None


def _decode_numeric(buf: bytes, i: int) -> tuple[int, bytes] | None:
    # ref: src/html/entities.zig:101-127 — value accumulates with an overflow
    # guard against 0x10FFFF; empty digits, missing ';' or invalid digit reject.
    n = len(buf)
    j = i + 2
    base = 10
    digits = _DEC_DIGITS
    if j < n and buf[j] in (0x78, 0x58):  # 'x' / 'X'
        base = 16
        digits = _HEX_DIGITS
        j += 1
    start = j
    value = 0
    while j < n and buf[j] != 0x3B:  # ';'
        c = buf[j]
        if c not in digits:
            return None
        d = int(chr(c), base)
        value = value * base + d
        if value > 0x10FFFF:
            return None
        j += 1
    if j == start or j >= n or buf[j] != 0x3B:
        return None
    try:
        out = chr(value).encode("utf-8")
    except (UnicodeEncodeError, ValueError):
        # surrogates (U+D800-DFFF) cannot encode — reject like utf8Encode does
        return None
    return j + 1 - i, out


def decode(buf: bytes) -> bytes:
    """Decode all entities in ``buf`` (functional analog of decodeInPlace,
    ref: src/html/entities.zig:36-73)."""
    amp = buf.find(b"&")
    if amp < 0:
        return buf
    out = bytearray(buf[:amp])
    i = amp
    n = len(buf)
    while i < n:
        amp = buf.find(b"&", i)
        if amp < 0:
            out += buf[i:]
            break
        out += buf[i:amp]
        decoded = decode_entity_prefix(buf, amp)
        if decoded is not None:
            consumed, db = decoded
            out += db
            i = amp + consumed
        else:
            out.append(0x26)
            i = amp + 1
    return bytes(out)
