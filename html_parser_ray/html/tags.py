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

# open_tag -> frozenset of new tags that implicitly close it
# (ref: src/html/tags.zig:236-256); dict+set form = one lookup per stack probe
IMPLICIT_CLOSERS: dict[bytes, frozenset] = {
    b"p": _P_CLOSERS,
    b"li": frozenset((b"li",)),
    b"dt": frozenset((b"dt", b"dd")),
    b"dd": frozenset((b"dt", b"dd")),
    b"tr": frozenset((b"tr",)),
    b"td": frozenset((b"td", b"th")),
    b"th": frozenset((b"td", b"th")),
    b"head": frozenset((b"body",)),
    b"option": frozenset((b"option",)),
}


def should_implicitly_close(open_tag: bytes, new_tag: bytes) -> bool:
    """True when seeing ``<new_tag>`` implicitly closes an open ``open_tag``."""
    closers = IMPLICIT_CLOSERS.get(open_tag)
    return closers is not None and new_tag in closers


# Fast precheck: tags that can possibly trigger implicit closes
# (ref: src/html/tags.zig:144-207)
MAY_TRIGGER_IMPLICIT_CLOSE = frozenset(
    (
        b"p li dt dd tr td th hr h1 h2 h3 h4 h5 h6 dl ol ul div nav pre "
        b"body form main aside table option footer header address article "
        b"section fieldset blockquote"
    ).split()
)

# One-lookup dispatch for the tokenizer hot path: a single dict hit replaces
# five set-membership tests per opening tag; flags == 0 (the common case:
# span/a/b/em/...) short-circuits every special branch.
FLAG_VOID = 1
FLAG_RAWTEXT = 2
FLAG_SVG = 4
FLAG_PLAINTEXT = 8
FLAG_MAY_TRIGGER = 16

TAG_FLAGS: dict[bytes, int] = {}
for _t in VOID_TAGS:
    TAG_FLAGS[_t] = TAG_FLAGS.get(_t, 0) | FLAG_VOID
for _t in RAWTEXT_TAGS:
    TAG_FLAGS[_t] = TAG_FLAGS.get(_t, 0) | FLAG_RAWTEXT
TAG_FLAGS[SVG_TAG] = TAG_FLAGS.get(SVG_TAG, 0) | FLAG_SVG
TAG_FLAGS[PLAINTEXT_TAG] = TAG_FLAGS.get(PLAINTEXT_TAG, 0) | FLAG_PLAINTEXT
for _t in MAY_TRIGGER_IMPLICIT_CLOSE:
    TAG_FLAGS[_t] = TAG_FLAGS.get(_t, 0) | FLAG_MAY_TRIGGER
del _t
