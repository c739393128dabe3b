"""Byte-class tables and ASCII helpers for HTML tokenization.

Semantics mirror the reference's 256-entry lookup tables
(ref: src/html/tables.zig:24-104): HTML whitespace is exactly
``' ', '\\n', '\\r', '\\t', '\\x0c'``; tag-name state consumes everything that is
not whitespace, ``/``, ``>`` or NUL (so ``<`` is a legal tag-name byte — the
``<div<div>`` quirk); identifier chars are ``[A-Za-z_:0-9.-]``.

Implementation is Python-idiomatic: compiled regexes and ``bytes`` methods
(both run at C speed) instead of per-byte loops.
"""

from __future__ import annotations

import re

# HTML whitespace (ref: src/html/tables.zig:25-27)
WHITESPACE = b" \n\r\t\x0c"
WHITESPACE_SET = frozenset(WHITESPACE)

# Identifier chars (ref: src/html/tables.zig:30-37): start [A-Za-z_:],
# continuation adds [0-9.-]
IDENT_START_SET = frozenset(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_:"
)
IDENT_CHAR_SET = IDENT_START_SET | frozenset(b"0123456789-.")

# Tag-name state: continue until whitespace, '/', '>' or NUL
# (ref: src/html/tables.zig:41-43)
RE_TAG_NAME = re.compile(rb"[^ \n\r\t\x0c/>\x00]*")
# Scan to tag end candidates: '>' or a quote (ref: src/html/scanner.zig:23-48)
RE_GT_OR_QUOTE = re.compile(rb"[>\"']")
# One-or-more HTML whitespace
RE_WS = re.compile(rb"[ \n\r\t\x0c]+")
# Runs of HTML whitespace for normalization
RE_WS_RUN = re.compile(rb"[ \n\r\t\x0c]+")
RE_WS_RUN_STR = re.compile(r"[ \n\r\t\x0c]+")
# Attribute name: one-or-more ident chars
RE_IDENT = re.compile(rb"[A-Za-z_:][A-Za-z_:0-9.\-]*")
RE_IDENT_RUN = re.compile(rb"[A-Za-z_:0-9.\-]+")


def skip_ws(buf: bytes, i: int, end: int | None = None) -> int:
    """Return the first index >= i whose byte is not HTML whitespace."""
    if end is None:
        end = len(buf)
    while i < end and buf[i] in WHITESPACE_SET:
        i += 1
    return i


def eql_ignore_case(a: bytes, b: bytes) -> bool:
    """ASCII case-insensitive equality (ref: src/html/tables.zig:67-73)."""
    return a.lower() == b.lower()


def starts_with_ignore_case(hay: bytes, needle: bytes) -> bool:
    """ASCII case-insensitive prefix check (ref: src/html/tables.zig:76-79)."""
    return hay[: len(needle)].lower() == needle.lower()


def trim_ascii_ws(b: bytes) -> bytes:
    """Trim HTML whitespace from both ends (ref: src/html/tables.zig:82-88)."""
    return b.strip(WHITESPACE)


def token_includes(value: bytes, token: bytes) -> bool:
    """True when ``token`` is a whitespace-separated token of ``value``
    (ref: src/html/tables.zig:91-104). Exact (case-sensitive) token match.
    """
    if not token:
        return False
    if token not in value:
        # a token is always a substring: the C-speed scan short-circuits the
        # regex split on the (common) miss
        return False
    # Note: not bytes.split() — Python's default split also treats \x0b as
    # whitespace, HTML's five-char set does not.
    return token in RE_WS_RUN.split(value)
