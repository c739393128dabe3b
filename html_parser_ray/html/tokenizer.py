"""Permissive single-pass HTML tokenizer + index-linked tree builder.

Re-expresses the reference's parse loop (ref: src/html/parser.zig:41-72) over
immutable bytes: nodes append in document preorder into parallel Python lists
(the functional analog of the reference's contiguous node array,
ref: src/html/document.zig:56-73), with ``subtree_end`` closing scopes exactly
as the in-place parser does.

Behavior pinned to the reference:
- text runs end at ``<``; a lone trailing ``<`` is consumed silently
  (ref: src/html/parser.zig:52-56);
- tag names may contain ``<`` (``<div<div>`` keeps it, ref: src/root.zig:72-85)
  and whitespace may follow ``<`` before the name;
- quote-aware tag-end scan (ref: src/html/scanner.zig:23-48);
- void tags self-close; ``/>`` does NOT self-close non-void, non-svg tags;
- raw-text tags (script/style/title/textarea) hold one opaque text child up to
  a case-insensitive ``</name [ws] >`` close, else to EOF
  (ref: src/html/parser.zig:480-524);
- ``<plaintext>`` swallows the rest of the input;
- ``<svg>`` subtrees are skipped: element + one opaque text child, nested svg
  depth-counted, quoted ``<svg`` bait ignored (ref: src/html/scanner.zig:62-123);
- comments ``<!-- -->`` (incl. the ``<!-->`` short form), ``<!...>`` and
  ``<? ?>`` are skipped without emitting nodes (ref: src/html/parser.zig:424-470);
- optional-close table for p/li/dt/dd/tr/td/th/head/option
  (ref: src/html/tags.zig:236-256);
- closing tags match the nearest open element by case-insensitive name,
  popping everything above it; unmatched closes are ignored
  (ref: src/html/parser.zig:296-365).

Tag-name storage note: names are stored fully lowercased, where the reference
lowercases only the first 8 bytes in place. Comparison semantics are identical
(ref compares the tail case-insensitively); the serializer reconstructs the
reference's exact ``lower(first 8) + original tail`` output from the name
span (serialize.py), so no observable divergence remains.
"""

from __future__ import annotations

from html_parser_ray.html import tags
from html_parser_ray.html.tables import (
    RE_GT_OR_QUOTE,
    RE_TAG_NAME,
    WHITESPACE_SET,
    skip_ws,
)

KIND_DOCUMENT = 0
KIND_ELEMENT = 1
KIND_TEXT = 2

INVALID = 0xFFFFFFFF

# hot-path locals for the one-lookup tag dispatch (tags.TAG_FLAGS)
_TAG_FLAGS = tags.TAG_FLAGS
_F_VOID = tags.FLAG_VOID
_F_RAWTEXT = tags.FLAG_RAWTEXT
_F_SVG = tags.FLAG_SVG
_F_PLAINTEXT = tags.FLAG_PLAINTEXT
_F_TRIGGER = tags.FLAG_MAY_TRIGGER
_IMPLICIT_CLOSERS = tags.IMPLICIT_CLOSERS

_RE_WS_ONLY = __import__("re").compile(rb"[ \n\r\t\x0c]*\Z")


def _find_tag_end_respect_quotes(buf: bytes, start: int) -> int | None:
    """Index of the closing ``>`` from ``start``, skipping quoted regions
    (ref: src/html/scanner.zig:23-48). None when unterminated."""
    i = start
    n = len(buf)
    while True:
        m = RE_GT_OR_QUOTE.search(buf, i)
        if m is None:
            return None
        j = m.start()
        c = buf[j]
        if c == 0x3E:  # '>'
            return j
        q = buf.find(bytes((c,)), j + 1)
        if q < 0:
            return None
        i = q + 1
        if i >= n:
            return None


def _is_explicit_self_closing(buf: bytes, start: int, gt_index: int) -> bool:
    """``.../>`` detection with optional whitespace before ``>``
    (ref: src/html/scanner.zig:52-57)."""
    if gt_index == 0 or gt_index >= len(buf) or buf[gt_index] != 0x3E:
        return False
    j = gt_index
    while j > start and buf[j - 1] in WHITESPACE_SET:
        j -= 1
    return j > start and buf[j - 1] == 0x2F


def _find_svg_subtree_end(buf: bytes, start: int) -> int | None:
    """Scan past a matching ``</svg>`` counting nested svg blocks
    (ref: src/html/scanner.zig:62-123). Returns index after the closing ``>``.
    """
    depth = 1
    i = start
    n = len(buf)
    while i < n:
        lt = buf.find(b"<", i)
        if lt < 0 or lt + 1 >= n:
            return None
        k = skip_ws(buf, lt + 1)
        if k >= n:
            return None
        c = buf[k]
        if c == 0x21:  # '!'
            if k + 2 < n and buf[k + 1] == 0x2D and buf[k + 2] == 0x2D:
                j = k + 3
                while j + 2 < n:
                    dash = buf.find(b"-", j)
                    if dash < 0:
                        return None
                    if dash + 2 < n and buf[dash + 1] == 0x2D and buf[dash + 2] == 0x3E:
                        i = dash + 3
                        break
                    j = dash + 1
                else:
                    return None
            else:
                gt = buf.find(b">", k + 1)
                if gt < 0:
                    return None
                i = gt + 1
        elif c == 0x3F:  # '?'
            gt = buf.find(b">", k + 1)
            if gt < 0:
                return None
            i = gt + 1
        elif c == 0x2F:  # '/'
            j = skip_ws(buf, k + 1)
            name_m = RE_TAG_NAME.match(buf, j)
            j2 = name_m.end()
            gt = buf.find(b">", j2)
            if gt < 0:
                return None
            if buf[j:j2].lower() == b"svg":
                depth -= 1
                if depth == 0:
                    return gt + 1
            i = gt + 1
        else:
            name_m = RE_TAG_NAME.match(buf, k)
            j = name_m.end()
            if j == k:
                i = lt + 1
                continue
            gt = _find_tag_end_respect_quotes(buf, j)
            if gt is None:
                return None
            if buf[k:j].lower() == b"svg" and not _is_explicit_self_closing(buf, j, gt):
                depth += 1
            i = gt + 1
    return None


def _find_rawtext_close(buf: bytes, tag_name: bytes, start: int):
    """Find case-insensitive ``</tag [ws] >`` tolerating ``<`` in content
    (ref: src/html/parser.zig:480-524). Returns (content_end, close_end)."""
    n = len(buf)
    j = buf.find(b"<", start)
    tag_len = len(tag_name)
    if j < 0 or tag_len == 0:
        return None
    lower = tag_name.lower()
    while j >= 0 and j + 3 < n:
        if buf[j + 1] != 0x2F:
            j = buf.find(b"<", j + 1)
            continue
        name_m = RE_TAG_NAME.match(buf, j + 2)
        k = name_m.end()
        name = buf[j + 2 : k]
        if len(name) != tag_len or name.lower() != lower:
            j = buf.find(b"<", j + 1)
            continue
        k = skip_ws(buf, k)
        if k >= n or buf[k] != 0x3E:
            j = buf.find(b"<", j + 1)
            continue
        return j, k + 1
    return None


class _Builder:
    """Node-array builder shared by the tokenizer (per-parse scratch)."""

    __slots__ = (
        "kind", "name", "name_start", "name_end", "attr_end",
        "parent", "prev_sibling", "last_child", "subtree_end", "stack",
    )

    def __init__(self) -> None:
        self.kind: list[int] = []
        # lowercased tag name for elements (None for document/text); the
        # Python-interned analog of the reference's canonicalized first-8-bytes
        # key (ref: src/html/tags.zig:7-21)
        self.name: list[bytes | None] = []
        self.name_start: list[int] = []
        self.name_end: list[int] = []
        self.attr_end: list[int] = []
        self.parent: list[int] = []
        self.prev_sibling: list[int] = []
        self.last_child: list[int] = []
        self.subtree_end: list[int] = []
        self.stack: list[int] = [0]

    def append(self, kind: int, parent: int) -> int:
        """Append one node, linking element children (ref: src/html/parser.zig:382-406)."""
        idx = len(self.kind)
        self.kind.append(kind)
        self.name.append(None)
        self.name_start.append(0)
        self.name_end.append(0)
        self.attr_end.append(0)
        self.parent.append(parent)
        self.prev_sibling.append(INVALID)
        self.last_child.append(INVALID)
        self.subtree_end.append(idx)
        if parent != INVALID and kind == KIND_ELEMENT:
            lc = self.last_child[parent]
            if lc != INVALID:
                self.prev_sibling[idx] = lc
            self.last_child[parent] = idx
        return idx


def tokenize(source: bytes, drop_whitespace_text: bool = False) -> _Builder:
    """Parse ``source`` into node arrays. ``drop_whitespace_text`` mirrors the
    reference's only live ParseOptions knob (ref: src/html/document.zig:48)."""
    b = _Builder()
    n = len(source)
    # node 0: document (ref: src/html/parser.zig:31-35)
    b.append(KIND_DOCUMENT, INVALID)
    stack = b.stack
    i = 0
    find = source.find
    kinds = b.kind

    # local bindings for the hot text-append path (one function call saved
    # per text node; text nodes are ~half of all nodes)
    l_kind = b.kind
    l_name = b.name
    l_ns = b.name_start
    l_ne = b.name_end
    l_attr = b.attr_end
    l_parent = b.parent
    l_prev = b.prev_sibling
    l_last = b.last_child
    l_sub = b.subtree_end

    while i < n:
        if source[i] != 0x3C:  # not '<' -> text run
            start = i
            lt = find(b"<", i)
            i = lt if lt >= 0 else n
            if i == start:
                continue
            if drop_whitespace_text:
                seg = source[start:i]
                if (
                    seg[0] in WHITESPACE_SET
                    and seg[-1] in WHITESPACE_SET
                    and _RE_WS_ONLY.match(seg)
                ):
                    continue
            # inlined text-node append (no sibling links for text,
            # ref: src/html/parser.zig:384 build_links only for elements)
            idx = len(l_kind)
            l_kind.append(KIND_TEXT)
            l_name.append(None)
            l_ns.append(start)
            l_ne.append(i)
            l_attr.append(0)
            l_parent.append(stack[-1])
            l_prev.append(INVALID)
            l_last.append(INVALID)
            l_sub.append(idx)
            continue

        if i + 1 >= n:
            i += 1
            continue

        c = source[i + 1]
        if c == 0x2F:  # '/': closing tag
            # inlined fast path: fused name match + top-of-stack close
            fused = _RE_FUSED_CLOSE.match(source, i + 2)
            if fused is not None and len(stack) > 1:
                top = stack[-1]
                if l_name[top] == fused.group(1).lower():
                    stack.pop()
                    l_sub[top] = len(l_kind) - 1
                    i = fused.end()
                    continue
            i = _parse_closing_tag(b, source, i)
        elif c == 0x3F:  # '?': processing instruction
            i = _skip_pi(source, i)
        elif c == 0x21:  # '!'
            if i + 3 < n and source[i + 2] == 0x2D and source[i + 3] == 0x2D:
                i = _skip_comment(source, i)
            else:
                i = _skip_bang(source, i)
        else:
            i = _parse_opening_tag(b, source, i)

    # close residual open elements (ref: src/html/parser.zig:74-82)
    last = len(kinds) - 1
    while len(stack) > 1:
        idx = stack.pop()
        b.subtree_end[idx] = last
    b.subtree_end[0] = last
    return b


def _skip_comment(source: bytes, i: int) -> int:
    # ref: src/html/parser.zig:424-446
    n = len(source)
    i += 4
    if i < n and source[i] == 0x3E:  # "<!-->"
        return i + 1
    j = i
    while j + 2 < n:
        dash = source.find(b"-", j)
        if dash < 0:
            return n
        if dash + 2 < n and source[dash + 1] == 0x2D and source[dash + 2] == 0x3E:
            return dash + 3
        j = dash + 1
    return n


def _skip_bang(source: bytes, i: int) -> int:
    # ref: src/html/parser.zig:448-452
    gt = source.find(b">", i + 2)
    return gt + 1 if gt >= 0 else len(source)


def _skip_pi(source: bytes, i: int) -> int:
    # ref: src/html/parser.zig:454-470
    n = len(source)
    j = i + 2
    while j + 1 < n:
        q = source.find(b"?", j)
        if q < 0:
            return n
        if q + 1 < n and source[q + 1] == 0x3E:
            return q + 2
        j = q + 1
    return n


_RE_FUSED_CLOSE = __import__("re").compile(
    rb"([^ \n\r\t\x0c/>\x00]+)[ \n\r\t\x0c]*>"
)


def _parse_closing_tag(b: _Builder, source: bytes, i: int) -> int:
    # ref: src/html/parser.zig:296-365
    n = len(source)

    fused = _RE_FUSED_CLOSE.match(source, i + 2)
    if fused is not None:
        close_name = fused.group(1).lower()
        i = fused.end()
    else:
        i += 2
        if i < n and source[i] in WHITESPACE_SET:  # rare: '</ div'
            i = skip_ws(source, i)
        m = RE_TAG_NAME.match(source, i)
        name_end = m.end()
        close_name = source[i:name_end].lower()
        gt = source.find(b">", name_end)
        i = gt + 1 if gt >= 0 else n
        if not close_name:
            return i

    stack = b.stack
    names = b.name
    # fast path: top of stack matches
    if len(stack) > 1:
        top = stack[-1]
        if names[top] == close_name:
            stack.pop()
            b.subtree_end[top] = len(b.kind) - 1
            return i

    found = -1
    for s in range(len(stack) - 1, 0, -1):
        if names[stack[s]] == close_name:
            found = s
            break
    if found > 0:
        last = len(b.kind) - 1
        while len(stack) > found:
            idx = stack.pop()
            b.subtree_end[idx] = last
    return i


_RE_FUSED_TAG = __import__("re").compile(
    # one C-level match for the common case: name + attr region (quoted values
    # may contain '>') + terminating '>'. Falls back to the general scanner
    # when unmatched (leading whitespace, unterminated tag, '<' in attrs).
    # The name group is ATOMIC ((?>...), maximal munch): the reference scans
    # the name with TagNameCharTable and never gives bytes back
    # (src/html/parser.zig:142, src/html/tables.zig:41), but a backtracking
    # name group let inputs like <v' <>'> re-split as name=v + quoted attr
    # ' <>' — moving the tag end AND the tag identity vs the reference
    # (found by a 100k-case parity soak; pinned in
    # tests/test_extraction_hypothesis.py::test_atomic_name_parity_regressions).
    rb"((?>[^ \n\r\t\x0c/>\x00]+))((?:[^<>\"']|\"[^\"]*\"|'[^']*')*)>"
)


def _parse_opening_tag(b: _Builder, source: bytes, i: int) -> int:
    # ref: src/html/parser.zig:135-294
    n = len(source)

    fused = _RE_FUSED_TAG.match(source, i + 1)
    if fused is not None:
        name_start = i + 1
        name_end = fused.end(1)
        tag_name = source[name_start:name_end].lower()
        gt = fused.end() - 1
        attr_end = gt
        i = fused.end()
        flags = _TAG_FLAGS.get(tag_name, 0)
        if not flags & ~_F_TRIGGER:
            # plain element (flags 0: span/a/b/em/...; or trigger-only:
            # div/p/li/...): no void/rawtext/svg/plaintext behavior —
            # run the optional-close loop if needed, then inline append+push
            stack = b.stack
            if flags and len(stack) > 1:
                # optional-close loop (ref: src/html/parser.zig:367-380)
                closers = _IMPLICIT_CLOSERS
                while len(stack) > 1:
                    top = stack[-1]
                    cset = closers.get(b.name[top])
                    if cset is None or tag_name not in cset:
                        break
                    stack.pop()
                    b.subtree_end[top] = len(b.kind) - 1
            parent = stack[-1]
            kinds = b.kind
            idx = len(kinds)
            kinds.append(KIND_ELEMENT)
            b.name.append(tag_name)
            b.name_start.append(name_start)
            b.name_end.append(name_end)
            b.attr_end.append(attr_end)
            b.parent.append(parent)
            b.prev_sibling.append(b.last_child[parent])
            b.last_child.append(INVALID)
            b.subtree_end.append(idx)
            b.last_child[parent] = idx
            stack.append(idx)
            return i
        return _open_tag_body(
            b, source, tag_name, name_start, name_end, name_end, attr_end, gt, i
        )

    i += 1
    if source[i] in WHITESPACE_SET:  # rare: '<  div'
        i = skip_ws(source, i)
    m = RE_TAG_NAME.match(source, i)
    name_start = i
    name_end = m.end()
    if name_end == name_start:
        # malformed tag: consume one byte (ref: src/html/parser.zig:154-159)
        return min(i + 1, n)
    tag_name = source[name_start:name_end].lower()
    i = name_end

    attr_start = i
    if i < n and source[i] == 0x3E:
        gt = i
        attr_end = i
        i += 1
    else:
        found_gt = _find_tag_end_respect_quotes(source, i)
        if found_gt is not None:
            gt = found_gt
            attr_end = found_gt
            i = found_gt + 1
        else:
            gt = n
            attr_end = n
            i = n
    if i == n and attr_end < i:
        attr_end = i
    return _open_tag_body(
        b, source, tag_name, name_start, name_end, attr_start, attr_end, gt, i
    )


def _open_tag_body(
    b: _Builder,
    source: bytes,
    tag_name: bytes,
    name_start: int,
    name_end: int,
    attr_start: int,
    attr_end: int,
    gt: int,
    i: int,
) -> int:
    """Shared opening-tag handling after the name/attr-region scan: implicit
    closures, svg/plaintext/rawtext branches, node append, stack push.

    (Implicit closures run here — after the tag-end scan — where the
    reference runs them just before it; the two orderings are equivalent
    because closure application only touches the open-element stack, which
    tag-end scanning never reads.)
    """
    n = len(source)
    stack = b.stack
    flags = _TAG_FLAGS.get(tag_name, 0)
    if flags & _F_TRIGGER and len(stack) > 1:
        # optional-close loop (ref: src/html/parser.zig:367-380)
        closers = _IMPLICIT_CLOSERS
        while len(stack) > 1:
            top = stack[-1]
            cset = closers.get(b.name[top])
            if cset is None or tag_name not in cset:
                break
            stack.pop()
            b.subtree_end[top] = len(b.kind) - 1

    self_close = bool(flags & _F_VOID)

    if flags & _F_SVG:
        # opaque svg subtree (ref: src/html/parser.zig:193-236)
        svg_self_close = _is_explicit_self_closing(source, attr_start, gt)
        parent = stack[-1]
        idx = b.append(KIND_ELEMENT, parent)
        b.name[idx] = tag_name
        b.name_start[idx] = name_start
        b.name_end[idx] = name_end
        b.attr_end[idx] = attr_end
        if svg_self_close:
            return i
        content_start = i
        close_end = _find_svg_subtree_end(source, i)
        if close_end is not None:
            content_end = close_end
            while content_end > content_start and source[content_end - 1] != 0x3C:
                content_end -= 1
            if content_end > content_start:
                t = b.append(KIND_TEXT, idx)
                b.name_start[t] = content_start
                b.name_end[t] = content_end - 1
            b.subtree_end[idx] = len(b.kind) - 1
            return close_end
        if n > content_start:
            t = b.append(KIND_TEXT, idx)
            b.name_start[t] = content_start
            b.name_end[t] = n
        b.subtree_end[idx] = len(b.kind) - 1
        return n

    # inlined element append + sibling linking (hot path)
    parent = stack[-1]
    kinds = b.kind
    idx = len(kinds)
    kinds.append(KIND_ELEMENT)
    b.name.append(tag_name)
    b.name_start.append(name_start)
    b.name_end.append(name_end)
    b.attr_end.append(attr_end)
    b.parent.append(parent)
    lc = b.last_child[parent]
    b.prev_sibling.append(lc)  # INVALID when no prior element child
    b.last_child.append(INVALID)
    b.subtree_end.append(idx)
    b.last_child[parent] = idx

    if not self_close and flags & _F_PLAINTEXT:
        # rest of input is one text child (ref: src/html/parser.zig:244-257)
        if n > i:
            t = b.append(KIND_TEXT, idx)
            b.name_start[t] = i
            b.name_end[t] = n
        b.subtree_end[idx] = len(b.kind) - 1
        return n

    if not self_close and flags & _F_RAWTEXT:
        # opaque raw-text content (ref: src/html/parser.zig:259-286)
        content_start = i
        close = _find_rawtext_close(source, tag_name, i)
        if close is not None:
            content_end, close_end = close
            if content_end > content_start:
                t = b.append(KIND_TEXT, idx)
                b.name_start[t] = content_start
                b.name_end[t] = content_end
            b.subtree_end[idx] = len(b.kind) - 1
            return close_end
        if n > content_start:
            t = b.append(KIND_TEXT, idx)
            b.name_start[t] = content_start
            b.name_end[t] = n
        b.subtree_end[idx] = len(b.kind) - 1
        return n

    if self_close:
        return i

    stack.append(idx)
    return i
