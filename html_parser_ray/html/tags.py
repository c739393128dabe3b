"""Tag classification sets and optional-close (implicit closure) tables.

Mirrors the reference's ``(len, first-8-bytes-key)`` dispatch tables
(ref: src/html/tags.zig:27-313) as plain frozensets over full lowercase names —
Python interned-bytes comparison is the idiomatic equivalent of the packed-u64
key trick, with identical semantics (the reference compares the first 8 bytes
via key and the tail case-insensitively, i.e. full case-insensitive equality).
"""

from __future__ import annotations

# HTML void tags (ref: src/html/tags.zig:102-126)
VOID_TAGS = frozenset(
    b"area base br col embed hr img input link meta param source track wbr".split()
)

# Text-only tags closed by an explicit matching end tag
# (ref: src/html/tags.zig:129-136; intentionally includes title/textarea)
RAWTEXT_TAGS = frozenset(b"script style title textarea".split())

PLAINTEXT_TAG = b"plaintext"

SVG_TAG = b"svg"

# Open tags that may be implicitly closed by a following tag
# (ref: src/html/tags.zig:210-233)
IMPLICIT_CLOSE_SOURCES = frozenset(
    b"p li dt dd tr td th head option".split()
)

# Tags that close an open <p> (ref: src/html/tags.zig:258-313)
_P_CLOSERS = frozenset(
    (
        b"p hr h1 h2 h3 h4 h5 h6 dl ol ul div nav pre form main aside table "
        b"footer header address article section fieldset blockquote"
    ).split()
)

# new_tag -> set of open tags it implicitly closes
# (ref: src/html/tags.zig:236-256)
def should_implicitly_close(open_tag: bytes, new_tag: bytes) -> bool:
    """True when seeing ``<new_tag>`` implicitly closes an open ``open_tag``."""
    if open_tag == b"p":
        return new_tag in _P_CLOSERS
    if open_tag == b"li":
        return new_tag == b"li"
    if open_tag in (b"dt", b"dd"):
        return new_tag in (b"dt", b"dd")
    if open_tag == b"tr":
        return new_tag == b"tr"
    if open_tag in (b"td", b"th"):
        return new_tag in (b"td", b"th")
    if open_tag == b"head":
        return new_tag == b"body"
    if open_tag == b"option":
        return new_tag == b"option"
    return False


# Fast precheck: tags that can possibly trigger implicit closes
# (ref: src/html/tags.zig:144-207)
MAY_TRIGGER_IMPLICIT_CLOSE = frozenset(
    (
        b"p li dt dd tr td th hr h1 h2 h3 h4 h5 h6 dl ol ul div nav pre "
        b"body form main aside table option footer header address article "
        b"section fieldset blockquote"
    ).split()
)
