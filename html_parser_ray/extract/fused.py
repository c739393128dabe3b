"""Fused single-pass tokenize + boilerplate-strip for the extraction hot path.

``extract_blocks_fused(source, cfg)`` produces byte-identical output to
``extract_text_blocks(parse_html(source), cfg)`` (pinned by
tests/test_fused_parity.py over every corpus family and the tokenizer edge
fixtures) without materializing the DOM: the parse loop is the same permissive
state machine as html/tokenizer.py (same fused regexes, same implicit-closure
and unmatched-close stack discipline — see the line-by-line refs there), but
the only state kept is the open-element NAME stack plus three extraction
watermarks:

- ``drop_depth``   — open dropped elements (tag or class/id verdict); while
  nonzero, nothing is emitted and no further drop checks run (the DOM walk
  jumps those subtrees, so check-parity holds);
- ``block_stack``  — owner ids of open block elements (innermost = current
  text owner, exactly the walk's subtree-window stack);
- ``link_depth``   — open ``<a>`` elements (text inside counts toward link
  density).

This mirrors the reference's architecture (everything fused into one pass
over the bytes, ref: src/html/parser.zig:41-72) and is why it exists: the
two-pass parse-then-walk form costs ~1.35x more per byte. The DOM path stays
the source of truth for the query engine and the parity oracle.
"""

from __future__ import annotations

from html_parser_ray.extract.boilerplate import (
    BLOCK_TAGS,
    LINK_TAG,
    ExtractConfig,
    _region_marks_boilerplate,
)
from html_parser_ray.html import tags
from html_parser_ray.html.text import NormState, decode_normalize_segment
from html_parser_ray.html.tokenizer import (
    _RE_FUSED_CLOSE,
    _RE_FUSED_TAG,
    _RE_WS_ONLY,
    _find_rawtext_close,
    _find_svg_subtree_end,
    _find_tag_end_respect_quotes,
    _is_explicit_self_closing,
    _skip_bang,
    _skip_comment,
    _skip_pi,
)
from html_parser_ray.html.tables import RE_TAG_NAME, WHITESPACE_SET, skip_ws

_TAG_FLAGS = tags.TAG_FLAGS
_F_VOID = tags.FLAG_VOID
_F_RAWTEXT = tags.FLAG_RAWTEXT
_F_SVG = tags.FLAG_SVG
_F_PLAINTEXT = tags.FLAG_PLAINTEXT
_F_TRIGGER = tags.FLAG_MAY_TRIGGER
_IMPLICIT_CLOSERS = tags.IMPLICIT_CLOSERS

# stack-entry marks (what to undo on pop)
_M_NONE = 0
_M_DROP = 1
_M_BLOCK = 2
_M_LINK = 3


def extract_blocks_fused(
    source: bytes,
    cfg: ExtractConfig | None = None,
    drop_whitespace_text: bool = False,
) -> list[bytes]:
    """Main-content text blocks of ``source`` in document order (one pass)."""
    if cfg is None:
        cfg = ExtractConfig()
    n = len(source)
    drop_tags = cfg.drop_tags
    drop_subs = cfg.drop_class_substrings
    drop_toks = cfg.drop_class_tokens
    region_marks = _region_marks_boilerplate
    block_tags = BLOCK_TAGS

    names: list[bytes] = []  # open-element name stack
    marks: list[int] = []  # parallel undo marks
    drop_depth = 0
    link_depth = 0
    block_stack: list[int] = []  # open block owner ids

    order: list[int] = []
    texts_by_owner: dict[int, list[tuple[int, int, bool]]] = {}
    owner_seq = 0  # synthetic owner ids in open order (document order)

    def emit(start: int, end: int) -> None:
        owner = block_stack[-1] if block_stack else 0
        got = texts_by_owner.get(owner)
        if got is None:
            texts_by_owner[owner] = got = []
            order.append(owner)
        got.append((start, end, link_depth > 0))

    i = 0
    find = source.find
    while i < n:
        if source[i] != 0x3C:  # text run (ref: tokenizer.py text branch)
            start = i
            lt = find(b"<", i)
            i = lt if lt >= 0 else n
            if i == start:
                continue
            if drop_depth == 0:
                if drop_whitespace_text:
                    seg = source[start:i]
                    if (
                        seg[0] in WHITESPACE_SET
                        and seg[-1] in WHITESPACE_SET
                        and _RE_WS_ONLY.match(seg)
                    ):
                        continue
                emit(start, i)
            continue

        if i + 1 >= n:
            i += 1
            continue

        c = source[i + 1]
        if c == 0x2F:  # closing tag
            fused = _RE_FUSED_CLOSE.match(source, i + 2)
            if fused is not None:
                close_name = fused.group(1).lower()
                i = fused.end()
            else:
                j = i + 2
                if j < n and source[j] in WHITESPACE_SET:
                    j = skip_ws(source, j)
                m = RE_TAG_NAME.match(source, j)
                name_end = m.end()
                close_name = source[j:name_end].lower()
                gt = find(b">", name_end)
                i = gt + 1 if gt >= 0 else n
                if not close_name:
                    continue
            # nearest-open match, pop everything above (ref: parser.zig:296-365)
            if names and names[-1] == close_name:
                names.pop()
                mk = marks.pop()
                if mk:
                    if mk == _M_BLOCK:
                        block_stack.pop()
                    elif mk == _M_DROP:
                        drop_depth -= 1
                    else:
                        link_depth -= 1
                continue
            found = -1
            for s in range(len(names) - 1, -1, -1):
                if names[s] == close_name:
                    found = s
                    break
            if found >= 0:
                while len(names) > found:
                    names.pop()
                    mk = marks.pop()
                    if mk:
                        if mk == _M_BLOCK:
                            block_stack.pop()
                        elif mk == _M_DROP:
                            drop_depth -= 1
                        else:
                            link_depth -= 1
            continue
        if c == 0x3F:  # PI
            i = _skip_pi(source, i)
            continue
        if c == 0x21:  # '!'
            if i + 3 < n and source[i + 2] == 0x2D and source[i + 3] == 0x2D:
                i = _skip_comment(source, i)
            else:
                i = _skip_bang(source, i)
            continue

        # opening tag (ref: tokenizer.py _parse_opening_tag)
        fused = _RE_FUSED_TAG.match(source, i + 1)
        if fused is not None:
            name_start = i + 1
            name_end = fused.end(1)
            tag_name = source[name_start:name_end].lower()
            attr_start = name_end
            gt = fused.end() - 1
            attr_end = gt
            i = fused.end()
        else:
            j = i + 1
            if source[j] in WHITESPACE_SET:
                j = skip_ws(source, j)
            m = RE_TAG_NAME.match(source, j)
            name_start = j
            name_end = m.end()
            if name_end == name_start:
                i = min(j + 1, n)
                continue
            tag_name = source[name_start:name_end].lower()
            attr_start = name_end
            j = name_end
            if j < n and source[j] == 0x3E:
                gt = j
                attr_end = j
                i = j + 1
            else:
                found_gt = _find_tag_end_respect_quotes(source, j)
                if found_gt is not None:
                    gt = found_gt
                    attr_end = found_gt
                    i = found_gt + 1
                else:
                    gt = n
                    attr_end = n
                    i = n

        flags = _TAG_FLAGS.get(tag_name, 0)

        if flags & _F_TRIGGER and names:
            # optional-close loop (ref: parser.zig:367-380)
            closers = _IMPLICIT_CLOSERS
            while names:
                cset = closers.get(names[-1])
                if cset is None or tag_name not in cset:
                    break
                names.pop()
                mk = marks.pop()
                if mk:
                    if mk == _M_BLOCK:
                        block_stack.pop()
                    elif mk == _M_DROP:
                        drop_depth -= 1
                    else:
                        link_depth -= 1

        # extraction verdict for this element (only outside dropped subtrees,
        # matching the DOM walk's subtree jumps)
        dropped = False
        if drop_depth == 0:
            if tag_name in drop_tags:
                dropped = True
            elif attr_end > attr_start:
                region = source[attr_start:attr_end]
                rl = region.lower()
                if (b"class" in rl or b"id" in rl) and region_marks(
                    region, drop_subs, drop_toks
                ):
                    dropped = True

        if flags & _F_SVG:
            # opaque svg subtree (never emits: svg is dropped or opaque —
            # the DOM walk sees one text child under <svg>; when svg is NOT
            # dropped that child has no block/link semantics of its own)
            svg_self_close = _is_explicit_self_closing(source, attr_start, gt)
            if svg_self_close:
                continue
            content_start = i
            close_end = _find_svg_subtree_end(source, i)
            if close_end is not None:
                content_end = close_end
                while content_end > content_start and source[content_end - 1] != 0x3C:
                    content_end -= 1
                if content_end > content_start and drop_depth == 0 and not dropped:
                    emit(content_start, content_end - 1)
                i = close_end
            else:
                if n > content_start and drop_depth == 0 and not dropped:
                    emit(content_start, n)
                i = n
            continue

        self_close = flags & _F_VOID

        if not self_close and flags & _F_PLAINTEXT:
            # rest of input is one text child (ref: parser.zig:244-257)
            if n > i and drop_depth == 0 and not dropped:
                emit(i, n)
            i = n
            continue

        if not self_close and flags & _F_RAWTEXT:
            content_start = i
            close = _find_rawtext_close(source, tag_name, i)
            if close is not None:
                content_end, close_end = close
                if content_end > content_start and drop_depth == 0 and not dropped:
                    emit(content_start, content_end)
                i = close_end
            else:
                if n > content_start and drop_depth == 0 and not dropped:
                    emit(content_start, n)
                i = n
            continue

        if self_close:
            continue

        # push with the undo mark
        if dropped:
            drop_depth += 1
            mark = _M_DROP
        elif drop_depth == 0 and tag_name in block_tags:
            owner_seq += 1
            block_stack.append(owner_seq)
            mark = _M_BLOCK
        elif drop_depth == 0 and tag_name == LINK_TAG:
            link_depth += 1
            mark = _M_LINK
        else:
            mark = _M_NONE
        names.append(tag_name)
        marks.append(mark)

    # EOF: residual opens need no unwinding (text already attributed)
    return _emit_blocks(source, order, texts_by_owner, cfg)


def _emit_blocks(
    source: bytes,
    order: list[int],
    texts_by_owner: dict[int, list[tuple[int, int, bool]]],
    cfg: ExtractConfig,
) -> list[bytes]:
    """Identical tail to extract_text_blocks: normalize per owner, apply
    length + link-density thresholds, emit in first-text order."""
    blocks: list[bytes] = []
    for owner in order:
        out = bytearray()
        link_out = bytearray()
        state = NormState()
        link_state = NormState()
        for start, end, in_link in texts_by_owner[owner]:
            seg = source[start:end]
            decode_normalize_segment(out, seg, state)
            if in_link:
                decode_normalize_segment(link_out, seg, link_state)
        total = len(out)
        if total < cfg.min_text_len:
            continue
        if total > 0 and len(link_out) / total > cfg.max_link_density:
            continue
        blocks.append(bytes(out))
    return blocks
