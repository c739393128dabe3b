"""Whitespace normalization and subtree text extraction.

Normalization semantics (ref: src/html/node.zig:203-260): runs of HTML
whitespace collapse to a single ``' '``, leading whitespace is dropped, and a
trailing run is dropped because the pending space is only emitted when a
non-whitespace byte follows. The ``(pending_space, wrote_any)`` state carries
*across text-node boundaries* within one ``inner_text`` call
(ref: src/html/document.zig:1113-1126 pins "A <b></b>   B" -> "A B").
"""

from __future__ import annotations

from html_parser_ray.html import entities
from html_parser_ray.html.tables import RE_WS_RUN, WHITESPACE

# fast-path prechecks (one C-speed scan each): a segment with no non-space
# whitespace, no double space and no boundary space is already normalized;
# adding '&' to the class also clears it for entity decode
_RE_NEEDS_NORM = __import__("re").compile(rb"[\n\r\t\x0c]|  ")
_RE_NEEDS_WORK = __import__("re").compile(rb"[&\n\r\t\x0c]|  ")


class NormState:
    """Cross-segment whitespace normalization state."""

    __slots__ = ("pending_space", "wrote_any")

    def __init__(self) -> None:
        self.pending_space = False
        self.wrote_any = False


def normalize_segment(out: bytearray, seg: bytes, state: NormState) -> None:
    """Append ``seg`` to ``out`` with whitespace normalization, carrying state.

    Vectorized equivalent of the reference's per-byte state machine
    (ref: src/html/node.zig:246-260): split the segment on whitespace runs and
    join the non-empty tokens, tracking boundary whitespace explicitly.
    """
    if not seg:
        return
    leading_ws = seg[0] in WHITESPACE
    trailing_ws = seg[-1] in WHITESPACE
    if not leading_ws and not trailing_ws and _RE_NEEDS_NORM.search(seg) is None:
        # already normalized: single internal spaces only
        if state.pending_space and state.wrote_any:
            out += b" "
        out += seg
        state.wrote_any = True
        state.pending_space = False
        return
    tokens = [t for t in RE_WS_RUN.split(seg) if t]
    if not tokens:
        # all-whitespace segment only arms the pending space
        state.pending_space = True
        return
    if leading_ws:
        state.pending_space = True
    if state.pending_space and state.wrote_any:
        out += b" "
    out += b" ".join(tokens)
    state.wrote_any = True
    state.pending_space = trailing_ws


def normalize_bytes(seg: bytes) -> bytes:
    """One-shot normalization of a standalone byte string."""
    out = bytearray()
    normalize_segment(out, seg, NormState())
    return bytes(out)


def decode_normalize_segment(out: bytearray, seg: bytes, state: NormState) -> None:
    """Entity-decode then normalize ``seg`` into ``out``
    (ref: src/html/node.zig:524-542, appendDecodedNormalizedSegment).

    Decoding before normalizing is equivalent to the reference's interleaved
    walk: decoded entity bytes feed the same normalization state machine (a
    decoded ``&#x20;`` counts as whitespace there too, since normalization runs
    over the decoded bytes).
    """
    if (
        seg
        and seg[0] != 0x20
        and seg[-1] != 0x20
        and _RE_NEEDS_WORK.search(seg) is None
    ):
        # no entities, no whitespace work: append directly
        if state.pending_space and state.wrote_any:
            out += b" "
        out += seg
        state.wrote_any = True
        state.pending_space = False
        return
    normalize_segment(out, entities.decode(seg), state)


def inner_text(doc, index: int, normalize: bool = True) -> bytes:
    """Decoded subtree text of node ``index``
    (ref: src/html/node.zig:135-171, innerTextOwned).

    Preorder scan of ``(index, subtree_end]``; text nodes concatenate in
    document order; entity decode always applies; normalization optional with
    cross-node state.
    """
    kind = doc.kind
    out = bytearray()
    if kind[index] == 2:  # text node
        seg = doc.source[doc.name_start[index] : doc.name_end[index]]
        if normalize:
            decode_normalize_segment(out, seg, NormState())
        else:
            out += entities.decode(seg)
        return bytes(out)

    state = NormState()
    end = doc.subtree_end[index]
    src = doc.source
    ns, ne = doc.name_start, doc.name_end
    n = len(kind)
    i = index + 1
    while i <= end and i < n:
        if kind[i] == 2:
            seg = src[ns[i] : ne[i]]
            if normalize:
                decode_normalize_segment(out, seg, state)
            else:
                out += entities.decode(seg)
        i += 1
    return bytes(out)
