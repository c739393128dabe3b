"""Document: the parsed, index-linked columnar DOM and its query surface.

One ``Document`` per HTML input. Nodes live in parallel arrays in document
preorder (the functional analog of the reference's contiguous node records,
ref: src/html/document.zig:56-73): ``first_child`` is derivable as ``index+1``
and ``next_sibling`` as ``subtree_end+1``, exactly as the reference documents.

Query acceleration mirrors the reference's per-document lazy id/tag indexes
(ref: src/html/document.zig:570-714) with Python dicts; the duplicate-id
fall-back-to-scan semantics (ref: src/selector/matcher.zig:186-198) are
preserved by the matcher.
"""

from __future__ import annotations

from functools import lru_cache

from html_parser_ray.html import attrs as attrs_mod
from html_parser_ray.html import text as text_mod
from html_parser_ray.html.tokenizer import (
    INVALID,
    KIND_DOCUMENT,
    KIND_ELEMENT,
    KIND_TEXT,
    tokenize,
)


_EMPTY_ATTRS: dict = {}


class Document:
    """Parsed HTML document over immutable source bytes."""

    __slots__ = (
        "source", "kind", "name", "name_start", "name_end", "attr_end",
        "parent", "prev_sibling", "last_child", "subtree_end",
        "_attr_cache", "_id_index", "_tag_index", "_class_index",
    )

    def __init__(self, source: bytes, builder) -> None:
        self.source = source
        self.kind = builder.kind
        self.name = builder.name
        self.name_start = builder.name_start
        self.name_end = builder.name_end
        self.attr_end = builder.attr_end
        self.parent = builder.parent
        self.prev_sibling = builder.prev_sibling
        self.last_child = builder.last_child
        self.subtree_end = builder.subtree_end
        self._attr_cache: dict[int, dict[bytes, bytes]] = {}
        self._id_index: dict[bytes, int] | None = None
        self._tag_index: dict[bytes, list[int]] = {}
        self._class_index: dict[bytes, list[int]] = {}

    def __len__(self) -> int:
        return len(self.kind)

    # ---- attributes ------------------------------------------------------

    def attrs(self, index: int) -> dict[bytes, bytes]:
        """All decoded attributes of element ``index`` (memoized per node —
        the analog of the matcher's AttrProbe/CollectedAttrs memo,
        ref: src/selector/matcher.zig:446-543)."""
        cached = self._attr_cache.get(index)
        if cached is None:
            start, end = self.name_end[index], self.attr_end[index]
            if end <= start:
                cached = _EMPTY_ATTRS
            else:
                cached = attrs_mod.collect_attrs(self.source, start, end)
            self._attr_cache[index] = cached
        return cached

    def get_attr(self, index: int, name: bytes) -> bytes | None:
        """Decoded attribute value, case-insensitive name, first wins."""
        if self.kind[index] != KIND_ELEMENT:
            return None
        return self.attrs(index).get(name.lower())

    # ---- navigation (element-only, ref: src/html/document.zig:716-770) ---

    def parent_element(self, index: int) -> int | None:
        p = self.parent[index]
        if p == INVALID or p == 0:
            return None
        return p

    def prev_element_sibling(self, index: int) -> int | None:
        # prev_sibling chain links elements only (ref: src/html/parser.zig:394-403)
        prev = self.prev_sibling[index]
        if prev == INVALID:
            return None
        return prev

    def next_element_sibling(self, index: int) -> int | None:
        # ref: src/html/document.zig:747-762 — scan from subtree_end+1 while
        # parent matches; a non-text non-element never occurs (only 3 kinds)
        if self.kind[index] != KIND_ELEMENT:
            return None
        parent = self.parent[index]
        if parent == INVALID:
            return None
        n = len(self.kind)
        cand = self.subtree_end[index] + 1
        while cand < n:
            if self.parent[cand] != parent:
                return None
            if self.kind[cand] == KIND_ELEMENT:
                return cand
            cand += 1
        return None

    def first_element_child(self, index: int) -> int | None:
        # preorder: children start at index+1 (ref: src/html/document.zig:717-744)
        n = len(self.kind)
        cand = index + 1
        while cand < n and self.kind[cand] == KIND_TEXT:
            cand += 1
        if cand < n and self.parent[cand] == index and self.kind[cand] == KIND_ELEMENT:
            return cand
        return None

    def children(self, index: int):
        """Direct element children in document order."""
        c = self.first_element_child(index)
        while c is not None:
            yield c
            c = self.next_element_sibling(c)

    def element_position(self, index: int) -> int:
        """1-based position among element siblings (for :nth-child,
        ref: src/selector/matcher.zig:331-339)."""
        pos = 1
        prev = self.prev_sibling[index]
        while prev != INVALID:
            pos += 1
            prev = self.prev_sibling[prev]
        return pos

    # ---- text ------------------------------------------------------------

    def inner_text(self, index: int, normalize: bool = True) -> str:
        return text_mod.inner_text(self, index, normalize).decode(
            "utf-8", errors="replace"
        )

    def inner_text_bytes(self, index: int, normalize: bool = True) -> bytes:
        return text_mod.inner_text(self, index, normalize)

    def tag_name(self, index: int) -> str:
        nm = self.name[index]
        return nm.decode("ascii", errors="replace") if nm else ""

    # ---- lookup helpers --------------------------------------------------

    def find_first_tag(self, name: bytes) -> int | None:
        """First element whose tag equals ``name`` case-insensitively
        (ref: src/html/document.zig:500-508)."""
        want = name.lower()
        names = self.name
        for i in range(1, len(self.kind)):
            if names[i] == want:
                return i
        return None

    def html(self) -> int | None:
        return self.find_first_tag(b"html")

    def head(self) -> int | None:
        return self.find_first_tag(b"head")

    def body(self) -> int | None:
        return self.find_first_tag(b"body")

    # ---- query accel (ref: src/html/document.zig:570-714) ----------------

    def id_index(self) -> dict[bytes, int]:
        """Lazy id -> first element index map. Duplicate ids keep the first
        occurrence; the matcher falls back to scan when the hit fails other
        predicates (ref: src/selector/matcher.zig:186-198)."""
        if self._id_index is None:
            idx: dict[bytes, int] = {}
            for i in range(1, len(self.kind)):
                if self.kind[i] != KIND_ELEMENT:
                    continue
                v = self.attrs(i).get(b"id")
                if v:
                    idx.setdefault(v, i)
            self._id_index = idx
        return self._id_index

    def tag_index(self, tag: bytes) -> list[int]:
        """Lazy per-tag candidate list (ref: src/html/document.zig:619-670)."""
        got = self._tag_index.get(tag)
        if got is None:
            names = self.name
            got = [i for i in range(1, len(self.kind)) if names[i] == tag]
            self._tag_index[tag] = got
        return got

    def class_index(self, cls: bytes) -> list[int]:
        """Lazy per-class candidate list, preorder. BEYOND-reference accel
        (the reference budgets only id/tag indexes): candidates still pass
        the full matcher, and membership uses the same decoded-attr +
        ws-token test the matcher applies, so output equals the scan's. The
        build decodes each element's attrs once — exactly the work a single
        scan-path query pays anyway — so it is free for one-shot queries and
        amortized for repeats."""
        got = self._class_index.get(cls)
        if got is None:
            from html_parser_ray.html.tables import token_includes

            kind = self.kind
            got = []
            for i in range(1, len(kind)):
                if kind[i] != KIND_ELEMENT:
                    continue
                c = self.attrs(i).get(b"class")
                if c is not None and token_includes(c, cls):
                    got.append(i)
            self._class_index[cls] = got
        return got

    def class_index_if_built(self, cls: bytes) -> "list[int] | None":
        """The class index only if a prior query already built it — lets
        early-exit paths (query_one) use the accel on repeat queries without
        paying the full O(doc) build on a one-shot lookup."""
        return self._class_index.get(cls)

    # ---- selector API (delegates to the matcher) -------------------------

    def query_all(self, selector: str, scope_root: int | None = None) -> list[int]:
        from html_parser_ray.selector.matcher import query_all

        return query_all(self, _compile_cached(selector), scope_root)

    def query_one(self, selector: str, scope_root: int | None = None) -> int | None:
        sel = _compile_cached(selector)
        # cached-query hot shape (single tagged codegen'd compound, no
        # scope): run the predicate loop directly over the tag candidates —
        # same semantics as the matcher's tag-accel branch, three fewer
        # interpreter frames per call (selector/codegen.py sets the plan)
        if scope_root is None:
            fast = getattr(sel, "_fast_single", None)
            if fast is not None:
                tag, pred = fast
                for idx in self.tag_index(tag):
                    if pred(self, idx):
                        return idx
                return None
        from html_parser_ray.selector.matcher import query_one

        return query_one(self, sel, scope_root)

    def matches(self, index: int, selector: str, scope_root: int | None = None) -> bool:
        from html_parser_ray.selector.matcher import matches_selector_at

        return matches_selector_at(self, _compile_cached(selector), index, scope_root)

    def explain(self, selector: str, scope_root: int | None = None):
        """Debug query: first match + near-miss report
        (ref: queryOneRuntimeDebug, src/html/document.zig:382-384)."""
        from html_parser_ray.selector.debug import explain_first_match

        return explain_first_match(self, _compile_cached(selector), scope_root)

    # ---- serialization convenience (ref: src/html/node.zig:174-187) ------

    def outer_html(self, index: int) -> bytes:
        from html_parser_ray.html.serialize import to_html

        return to_html(self, index)

    def inner_html(self, index: int) -> bytes:
        from html_parser_ray.html.serialize import _write_children

        out = bytearray()
        _write_children(self, index, out)
        return bytes(out)


@lru_cache(maxsize=512)
def _compile_cached(selector: str):
    """Process-wide compiled-selector cache — the analog of the reference's
    cached-selector API (ref: src/html/document.zig:366-368) held as actor
    state in pipeline stages."""
    from html_parser_ray.selector.compiler import compile_selector

    return compile_selector(selector)


def parse_html(source: bytes | str, drop_whitespace_text: bool = False) -> Document:
    """Parse HTML bytes into a Document (ref: src/html/document.zig:352-357).

    ``drop_whitespace_text`` mirrors the reference's ``fastest`` profile knob
    (drop all-whitespace text nodes at parse time).
    """
    if isinstance(source, str):
        source = source.encode("utf-8")
    return Document(source, tokenize(source, drop_whitespace_text))
